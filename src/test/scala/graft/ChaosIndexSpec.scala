package graft

import graft.core.KillPoint
import graft.sim.{Ivf, Pq}
import graft.text.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shared kill-point crash harness for the OTHER three log-structured
  * persisted indexes (ChaosStoreSpec covers the bucketed store,
  * ChaosLshSpec the LSH index): BM25 (4 append jobs + pointer swap), IVF
  * (2 + swap), IVF-PQ (2 + swap). For every family the same contract is
  * driven through [[graft.core.KillPoint]]:
  *
  *   1. a crash at EVERY pre-swap seam leaves the batch invisible — the
  *      probe reads exactly the pre-batch result, even with the torn
  *      partial appends of SEVERAL crashed attempts on disk;
  *   2. redelivering the batch (at-least-once) converges the probe to the
  *      fresh full-corpus rebuild, bit-identically — the gen-partitioned
  *      dynamic-overwrite layout replaces each crashed attempt's partial
  *      rows instead of duplicating them;
  *   3. a crash AFTER the swap leaves the batch fully visible, and
  *      re-applying the committed gen is a guarded no-op (re-running BM25's
  *      stats delta after commit would corrupt the corpus constants).
  */
class ChaosIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private final class Kill extends RuntimeException("injected crash")

  private def tmp(p: String) = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory(p)).toString

  private def killAt(step: String)(body: => Unit): Unit = {
    KillPoint.hook = s => if (s == step) throw new Kill
    try intercept[Kill](body)
    finally KillPoint.hook = _ => ()
  }

  /** One index family under test. `probe` must be an exact function of the
    * LIVE corpus so maintained ≡ rebuilt is a bit-identical comparison. */
  private case class Family(
      name: String,
      preSwapSteps: Seq[String],
      postSwapStep: String,
      applyBatch: Long => Unit, // gen => apply upserts+deletes at gen
      probe: () => Seq[String],
      rebuiltProbe: () => Seq[String])

  // ---- fixtures ----------------------------------------------------------

  // vectors: 8 dims from the deterministic mixer; init = ids not % 3,
  // batch upserts = ids % 3 (new) plus MOVED vectors for two existing ids,
  // deletes = two other existing ids
  private def vec(id: Long, salt: Long): Seq[Double] =
    (0 until 8).map(d => ((ZipfCorpus.mix(id * 31 + d * 7 + salt) >>> 40).toInt
      % 1000).toDouble / 250.0)

  private val allIds = (0L until 60L).toSeq
  private val initIds = allIds.filter(_ % 3 != 0)
  private val newIds = allIds.filter(_ % 3 == 0)
  private val movedIds = initIds.filter(_ % 7 == 1).take(2).toSet
  private val deletedIds = initIds.filter(_ % 7 == 2).take(2)

  // salt ONLY the explicitly moved ids — the batch's upserted version and
  // the rebuild oracle must agree on exactly which vectors moved
  private def vecDf(ids: Seq[Long], salted: Set[Long] = Set.empty): DataFrame =
    ids.map(i => (i, vec(i, if (salted(i)) 99L else 0L)))
      .toDF("id", "vec")

  private def upsertVecs = vecDf(newIds ++ movedIds.toSeq.sorted, movedIds)
  private def deleteVecs = deletedIds.toDF("id")
  private def finalVecs = vecDf(
    (initIds.filterNot(deletedIds.contains) ++ newIds).sorted, movedIds)

  private def queries = vecDf(Seq(1000L, 1001L, 1002L))

  // documents: family-structured corpus; the batch rewrites some docs
  // (changing lengths → avgdl and df move) and deletes others
  private def docText(i: Long, v: Int): String = {
    val extra = if (v > 0) " rewritten with an appended clause" else ""
    s"shared retrieval corpus sentence number ${i % 5} keeps term mass " +
      s"stable while doc $i varies its tail$extra"
  }
  private val docInit = initIds.map(i => (i, docText(i, 0)))
  private def docUpserts = (newIds.map(i => (i, docText(i, 0))) ++
    movedIds.map(i => (i, docText(i, 1)))).toDF("doc_id", "text")
  private def docFinal = (initIds.filterNot(deletedIds.contains)
    .map(i => (i, docText(i, if (movedIds.contains(i)) 1 else 0))) ++
    newIds.map(i => (i, docText(i, 0)))).toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // ---- the harness -------------------------------------------------------

  private def exercise(fam: Family): Unit = {
    val pre = fam.probe()
    assert(pre.nonEmpty, s"${fam.name}: pre-batch probe must be non-empty")

    // crash at EVERY pre-swap seam, accumulating torn partial appends
    for (step <- fam.preSwapSteps) {
      killAt(step)(fam.applyBatch(1L))
      assert(fam.probe() == pre,
        s"${fam.name}: batch must stay invisible after crash at '$step'")
    }

    // redelivery converges to the fresh rebuild despite the torn attempts
    fam.applyBatch(1L)
    val maintained = fam.probe()
    assert(maintained != pre, s"${fam.name}: the batch must change the probe")
    assert(maintained == fam.rebuiltProbe(),
      s"${fam.name}: maintained probe must equal the fresh rebuild")

    // post-swap crash: already visible; re-apply of a committed gen = no-op
    killAt(fam.postSwapStep)(fam.applyBatch(2L))
    val afterCommit = fam.probe()
    fam.applyBatch(2L) // redelivery of the COMMITTED gen
    assert(fam.probe() == afterCommit,
      s"${fam.name}: re-applying a committed gen must be a no-op")
  }

  test("BM25 index: every kill point, redelivery ≡ rebuild, committed re-apply no-op") {
    val idx = Retrieval.buildIndex(docInit.toDF("doc_id", "text"),
      "text", "doc_id", tmp("graft_chaos_bm25"), numBuckets = 8)
    val rebuilt = Retrieval.buildIndex(docFinal, "text", "doc_id",
      tmp("graft_chaos_bm25_oracle"), numBuckets = 8)
    def q(i: Retrieval.InvertedIndex) =
      rows(Retrieval.bm25(spark, i, "shared corpus rewritten tail", k = 10))
    // gen-2 batch: delete one more doc (exercises the post-swap contract)
    val extraDel = initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)
    exercise(Family("bm25",
      Seq("bm25.postings", "bm25.doclen", "bm25.tombstones", "bm25.stats"),
      "bm25.committed",
      gen => Retrieval.updateIndex(idx,
        if (gen == 1L) docUpserts else docUpserts.limit(0),
        "text", "doc_id",
        if (gen == 1L) deletedIds.toDF("doc_id") else extraDel.toDF("doc_id"),
        gen),
      () => q(idx),
      () => q(rebuilt)))
  }

  test("BM25 compaction: a crash after ANY swap leaves probes identical") {
    // compacted rows keep the pre-compaction MAX gen, so after any prefix
    // of the staged swaps the surviving tombstones cannot kill them and a
    // not-yet-swapped table still reads its live rows through the horizon
    // — every kill point must leave probe results unchanged, and a re-run
    // completes the compaction
    val idx = Retrieval.buildIndex(docInit.toDF("doc_id", "text"),
      "text", "doc_id", tmp("graft_chaos_bm25c"), numBuckets = 8)
    Retrieval.updateIndex(idx, docUpserts, "text", "doc_id",
      deletedIds.toDF("doc_id"), gen = 1L)
    def q() = rows(Retrieval.bm25(spark, idx, "shared corpus rewritten tail", k = 10))
    val before = q()
    for (step <- Seq("bm25.compact.postings", "bm25.compact.doclen",
        "bm25.compact.stats")) {
      killAt(step)(Retrieval.compact(spark, idx))
      assert(q() == before,
        s"probe must be unchanged after compaction crash at '$step'")
    }
    Retrieval.compact(spark, idx)
    assert(q() == before, "completed compaction must preserve probes")
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(idx.tombstoneDir)))
  }

  test("LSH compaction: a crash after ANY swap leaves probes identical") {
    import graft.dedup.LshIndex
    val init = docInit.toDF("doc_id", "text")
    val idx = LshIndex.build(init, "text", "doc_id",
      tmp("graft_chaos_lshc"), threshold = 0.5, numHashes = 16, bands = 4,
      nPartitions = 4)
    LshIndex.applyBatch(idx, docUpserts, "text", "doc_id",
      deletedIds.toDF("doc_id"), gen = 1L)
    val probe = docFinal.limit(10)
    def q() = rows(LshIndex.pairsFor(idx, probe, "text", "doc_id")
      .select(col("id_a"), col("id_b")))
    val before = q()
    assert(before.nonEmpty, "the shared-sentence corpus must pair")
    for (step <- Seq("lsh.compact.bands", "lsh.compact.sets",
        "lsh.compact.tombstones")) {
      killAt(step)(LshIndex.compact(spark, idx))
      graft.ops.Caches.release()
      assert(q() == before,
        s"probe must be unchanged after compaction crash at '$step'")
    }
    LshIndex.compact(spark, idx)
    graft.ops.Caches.release()
    assert(q() == before, "completed compaction must preserve probes")
  }

  test("IVF index: every kill point, redelivery ≡ rebuild, committed re-apply no-op") {
    val idx = Ivf.buildIndex(vecDf(initIds), "id", "vec",
      tmp("graft_chaos_ivf"), nCells = 4, iters = 1)
    val rebuilt = Ivf.buildIndexWith(idx.centroids, finalVecs, "id", "vec",
      tmp("graft_chaos_ivf_oracle"))
    def q(i: Ivf.Index) =
      rows(Ivf.probe(i, queries, "id", "vec", k = 5, nProbe = 4))
    val extraDel = initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)
    exercise(Family("ivf",
      Seq("ivf.assign", "ivf.tombstones"),
      "ivf.committed",
      gen => Ivf.updateIndex(idx,
        if (gen == 1L) upsertVecs else upsertVecs.limit(0),
        "id", "vec",
        if (gen == 1L) deleteVecs else extraDel.toDF("id"),
        gen),
      () => { val r = q(idx); graft.ops.Caches.release(); r },
      () => { val r = q(rebuilt); graft.ops.Caches.release(); r }))
  }

  test("IVF compaction: crash prefixes probe identically; a torn swap self-heals") {
    val idx = Ivf.buildIndex(vecDf(initIds), "id", "vec",
      tmp("graft_chaos_ivfc"), nCells = 4, iters = 1)
    Ivf.updateIndex(idx, upsertVecs, "id", "vec", deleteVecs, gen = 1L)
    def q() = {
      val r = rows(Ivf.probe(idx, queries, "id", "vec", k = 5, nProbe = 4))
      graft.ops.Caches.release(); r
    }
    val before = q()
    // crash INSIDE the swap (old dir renamed aside, new not yet in): the
    // directory is momentarily missing — the next compact heals it first
    killAt("dirswap.aside")(Ivf.compact(spark, idx))
    Ivf.compact(spark, idx)
    assert(q() == before, "healed + completed compaction must preserve probes")
    // crash AFTER the swap, before the pointer normalize
    Ivf.updateIndex(idx, upsertVecs.limit(0), "id", "vec",
      initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)
        .toDF("id"), gen = 2L)
    val afterDel = q()
    killAt("ivf.compact.assign")(Ivf.compact(spark, idx))
    assert(q() == afterDel, "post-swap crash prefix must probe identically")
    Ivf.compact(spark, idx)
    assert(q() == afterDel)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(idx.tombstoneDir)),
      "the swap retires tombstones atomically with the rows")
  }

  test("IVF-PQ compaction: crash prefixes probe identically") {
    val init = vecDf(initIds)
    val cents = Ivf.buildIndex(init, "id", "vec",
      tmp("graft_chaos_pqc_cents"), nCells = 4, iters = 1).centroids
    val cbs = Pq.fixedCodebooks(init, "id", "vec", m = 4, k = 8)
    val dir = tmp("graft_chaos_pqc")
    Pq.buildCodeIndex(init, "id", "vec", cents, cbs, dir)
    Pq.updateCodeIndex(dir, cents, cbs, upsertVecs, "id", "vec",
      deleteVecs, gen = 1L)
    def q() = rows(Pq.probeCodeIndex(queries, "id", "vec", cents, cbs, dir,
      nProbe = 4, k = 5))
    val before = q()
    killAt("dirswap.aside")(Pq.compactCodeIndex(spark, dir))
    Pq.compactCodeIndex(spark, dir) // heals, completes
    assert(q() == before)
    Pq.updateCodeIndex(dir, cents, cbs, upsertVecs.limit(0), "id", "vec",
      initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)
        .toDF("id"), gen = 2L)
    val afterDel = q()
    for (step <- Seq("ivfpq.compact.codes", "ivfpq.compact.tombstones")) {
      killAt(step)(Pq.compactCodeIndex(spark, dir))
      assert(q() == afterDel,
        s"probe must be unchanged after compaction crash at '$step'")
    }
    Pq.compactCodeIndex(spark, dir)
    assert(q() == afterDel)
  }

  test("BM25 compaction keeps zero-token docs: rewrite gen covers BOTH tables") {
    // a zero-token doc emits a dl=0 doclen row + a tombstone at its batch
    // gen but NO postings rows, so max(postings.gen) < max(doclen.gen);
    // a rewrite gen derived from postings alone would park the doclen row
    // BELOW its own tombstone horizon in the crash window before tombstone
    // cleanup, and the next compact would recompute N/avgdl without it —
    // permanently skewing every BM25 score
    val idx = Retrieval.buildIndex(docInit.toDF("doc_id", "text"),
      "text", "doc_id", tmp("graft_bm25_zerotok"), numBuckets = 8)
    val zeroDoc = Seq((9000L, "")).toDF("doc_id", "text")
    Retrieval.updateIndex(idx, zeroDoc, "text", "doc_id",
      Seq.empty[Long].toDF("doc_id"), gen = 1L)
    val rebuilt = Retrieval.buildIndex(
      docInit.toDF("doc_id", "text").unionByName(zeroDoc), "text", "doc_id",
      tmp("graft_bm25_zerotok_oracle"), numBuckets = 8)
    def q(i: Retrieval.InvertedIndex) =
      rows(Retrieval.bm25(spark, i, "shared corpus sentence tail", k = 10))
    assert(q(idx) == q(rebuilt), "pre-compaction: N includes the empty doc")
    // crash AFTER the doclen swap with the tombstones still on disk
    killAt("bm25.compact.doclen")(Retrieval.compact(spark, idx))
    assert(q(idx) == q(rebuilt), "crash prefix must probe identically")
    // the re-run recomputes the corpus constants from the live dl rows
    Retrieval.compact(spark, idx)
    assert(q(idx) == q(rebuilt),
      "post-compaction N/avgdl must still count the zero-token doc")
  }

  test("compaction never regresses the committed pointer (deletes-only final batch)") {
    import graft.core.GenPointer
    import graft.dedup.LshIndex
    // after a deletes-only batch at gen 2 (tombstones only, zero data rows
    // at 2) every live row sits at gen <= 1 — a compact that recommits
    // max(live gen) would move the pointer BACK to 1, breaking the
    // redelivered-committed-gen short-circuit
    val extraDel = initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)

    val bm = Retrieval.buildIndex(docInit.toDF("doc_id", "text"),
      "text", "doc_id", tmp("graft_ptr_bm25"), numBuckets = 8)
    Retrieval.updateIndex(bm, docUpserts, "text", "doc_id",
      deletedIds.toDF("doc_id"), gen = 1L)
    Retrieval.updateIndex(bm, docUpserts.limit(0), "text", "doc_id",
      extraDel.toDF("doc_id"), gen = 2L)
    Retrieval.compact(spark, bm)
    assert(GenPointer.committed(bm.dir) == 2L, "bm25 pointer regressed")

    val lsh = LshIndex.build(docInit.toDF("doc_id", "text"), "text", "doc_id",
      tmp("graft_ptr_lsh"), threshold = 0.5, numHashes = 16, bands = 4,
      nPartitions = 4)
    LshIndex.applyBatch(lsh, docUpserts, "text", "doc_id",
      deletedIds.toDF("doc_id"), gen = 1L)
    LshIndex.applyBatch(lsh, docUpserts.limit(0), "text", "doc_id",
      extraDel.toDF("doc_id"), gen = 2L)
    LshIndex.compact(spark, lsh)
    graft.ops.Caches.release()
    assert(GenPointer.committed(lsh.dir) == 2L, "lsh pointer regressed")

    val ivf = Ivf.buildIndex(vecDf(initIds), "id", "vec",
      tmp("graft_ptr_ivf"), nCells = 4, iters = 1)
    Ivf.updateIndex(ivf, upsertVecs, "id", "vec", deleteVecs, gen = 1L)
    Ivf.updateIndex(ivf, upsertVecs.limit(0), "id", "vec",
      extraDel.toDF("id"), gen = 2L)
    Ivf.compact(spark, ivf)
    assert(GenPointer.committed(ivf.assignDir) == 2L, "ivf pointer regressed")
    // the short-circuit the pointer protects: redelivering gen 2 after the
    // compact must remain a no-op (probe unchanged)
    val after = rows(Ivf.probe(ivf, queries, "id", "vec", k = 5, nProbe = 4))
    graft.ops.Caches.release()
    Ivf.updateIndex(ivf, upsertVecs.limit(0), "id", "vec",
      extraDel.toDF("id"), gen = 2L)
    val redelivered = rows(Ivf.probe(ivf, queries, "id", "vec", k = 5, nProbe = 4))
    graft.ops.Caches.release()
    assert(redelivered == after, "redelivered committed gen must stay a no-op")

    val init = vecDf(initIds)
    val cents = Ivf.buildIndex(init, "id", "vec",
      tmp("graft_ptr_pq_cents"), nCells = 4, iters = 1).centroids
    val cbs = Pq.fixedCodebooks(init, "id", "vec", m = 4, k = 8)
    val pqDir = tmp("graft_ptr_pq")
    Pq.buildCodeIndex(init, "id", "vec", cents, cbs, pqDir)
    Pq.updateCodeIndex(pqDir, cents, cbs, upsertVecs, "id", "vec",
      deleteVecs, gen = 1L)
    Pq.updateCodeIndex(pqDir, cents, cbs, upsertVecs.limit(0), "id", "vec",
      extraDel.toDF("id"), gen = 2L)
    Pq.compactCodeIndex(spark, pqDir)
    assert(GenPointer.committed(pqDir) == 2L, "ivfpq pointer regressed")
  }

  test("IVF-PQ code index: every kill point, redelivery ≡ rebuild, committed re-apply no-op") {
    val init = vecDf(initIds)
    val cents = Ivf.buildIndex(init, "id", "vec",
      tmp("graft_chaos_ivfpq_cents"), nCells = 4, iters = 1).centroids
    val cbs = Pq.fixedCodebooks(init, "id", "vec", m = 4, k = 8)
    val dir = tmp("graft_chaos_ivfpq")
    Pq.buildCodeIndex(init, "id", "vec", cents, cbs, dir)
    val dir2 = tmp("graft_chaos_ivfpq_oracle")
    Pq.buildCodeIndex(finalVecs, "id", "vec", cents, cbs, dir2)
    def q(d: String) = rows(Pq.probeCodeIndex(queries, "id", "vec",
      cents, cbs, d, nProbe = 4, k = 5))
    val extraDel = initIds.filterNot(deletedIds.contains).filter(_ % 7 == 3).take(1)
    exercise(Family("ivfpq",
      Seq("ivfpq.codes", "ivfpq.tombstones"),
      "ivfpq.committed",
      gen => Pq.updateCodeIndex(dir, cents, cbs,
        if (gen == 1L) upsertVecs else upsertVecs.limit(0),
        "id", "vec",
        if (gen == 1L) deleteVecs else extraDel.toDF("id"),
        gen),
      () => q(dir),
      () => q(dir2)))
  }
}
