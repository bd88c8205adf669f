package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-duplicate index with incremental maintenance —
  * the online counterpart of [[DocDedup.nearDupPairs]]: a corpus is indexed
  * ONCE, and each change batch is deduplicated against the index without
  * rescanning or re-signing the corpus. The batch-vs-index pairs union the
  * build-time pairs to exactly the full-recompute pair set (the banding is
  * deterministic per document, so a pair shares a band bucket regardless of
  * when each side was indexed — recall is identical to the one-shot path).
  *
  * Same log-structured design as [[graft.sim.Ivf]]: appends carry a
  * generation stamp, upserted/deleted ids gain an (id, upto_gen) tombstone,
  * and probes resolve both with one broadcast join against the
  * control-sized tombstone set; rebuild is the compaction.
  *
  * Scale shape: both persisted tables are hash-partitioned (`bp` =
  * bucket hash mod nPartitions for band buckets, `ip` = id hash mod
  * nPartitions for shingle sets), so a batch probe statically prunes to the
  * partitions its own band buckets / candidate ids land in — IO is
  * proportional to the batch's bucket footprint, never the corpus. The
  * partition key sets are control data (≤ nPartitions ints), collected like
  * Ivf's probed cells.
  *
  * Reference scope: the reference engine has no similarity search; this is
  * part of the training-data extension surface (its incremental SHAPE —
  * derive only what a change batch touches — is A3/A5's contract,
  * processor.py:99-158).
  */
object LshIndex {

  /** Handle to a built index. `threshold`/`numHashes`/`bands`/`shingleN`
    * are fixed at build time — probes and updates must agree with them. */
  final case class Index(dir: String, threshold: Double, numHashes: Int,
                         bands: Int, shingleN: Int, nPartitions: Int) {
    def bandsDir: String = s"$dir/bands"
    def setsDir: String = s"$dir/sets"
    def tombstoneDir: String = s"$dir/_tombstones"
  }

  /** Crash contract. A change batch touches THREE directories (band rows,
    * set rows, tombstones) as independent append jobs; without a commit
    * marker a crash mid-batch leaves torn cross-table state — band rows
    * whose shingle sets are missing silently DROP near-dup pairs. The
    * `_gens` pointer closes that: appends stamp their generation, the
    * pointer advances (atomic tmp+move) only after ALL of the batch's
    * appends finished, and every read filters `gen <= committed` /
    * `upto_gen <= committed`. Any crash before the pointer swap leaves the
    * batch INVISIBLE — the index reads as its pre-batch self, and
    * redelivering the batch at the same generation is idempotent (probes
    * `distinct()` pair output, duplicate appended rows change nothing).
    * [[build]] is the cold-start exception: it OVERWRITES in place, so a
    * crash mid-build needs a re-run — the reference's resync contract
    * (resync.py:91-128); steady-state [[applyBatch]] is the crash-atomic
    * path. Pointer absent (pre-pointer index dirs) = everything visible. */
  private def committedGen(idx: Index): Long =
    graft.core.GenPointer.committed(idx.dir)

  private def commitGen(idx: Index, gen: Long): Unit =
    graft.core.GenPointer.commit(idx.dir, gen)

  /** TEST SEAM — batch apply reports "appended" (all three append jobs
    * done, pointer not yet swapped) and "committed"; a throwing hook
    * simulates a crash at that point (ChaosLshSpec). No-op in production. */
  private[graft] var onApplyStep: String => Unit = _ => ()

  private def bp(bucket: org.apache.spark.sql.Column, n: Int) =
    pmod(bucket, lit(n.toLong)).cast("int")
  private def ip(id: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(id), lit(n.toLong)).cast("int")

  /** (id, band, bucket) + (id, shingle set) for one document frame, both
    * derived from a single shingle/signature computation. */
  private def signed(docs: DataFrame, textCol: String, idCol: String,
                     idx: Index): (DataFrame, DataFrame) = {
    val sets = DocDedup.shingleSets(docs, textCol, idCol, idx.shingleN)
    val sigs = sets.withColumn("__sig",
      DocDedup.minhashSignatureOfSets(col("__sh"), idx.numHashes))
    (DocDedup.bandedBuckets(sigs, idx.bands, idx.numHashes / idx.bands), sets)
  }

  /** The two table writes are independent jobs — submit them concurrently
    * (Spark schedules jobs from separate threads fine; the executors
    * interleave their stages). Callers passing CACHED frames should
    * materialize them first so the concurrent jobs hit the cache instead
    * of racing to compute the signatures twice. */
  private def writeBatch(banded: DataFrame, sets: DataFrame, idx: Index,
                         gen: Long, mode: String): Unit =
    runParallel(Seq(
      // one shuffle task per output partition dir (an unnumbered
      // repartition inherits spark.sql.shuffle.partitions — extra tasks
      // are pure per-write overhead for a nPartitions-dir layout).
      // gen is a PARTITION column (bp=…/gen=…): an append-mode change
      // batch writes in dynamic-overwrite mode instead, REPLACING its own
      // gen subdirectories — redelivering a crashed batch leaves no
      // duplicate rows (the probes' distinct() already kept OUTPUT correct
      // under duplicates; this keeps the intermediate candidate work and
      // the stored bytes from inflating too — same layout as Ivf/Pq/BM25)
      () => banded
        .withColumn("gen", lit(gen))
        .withColumn("bp", bp(col("__bucket"), idx.nPartitions))
        .repartition(idx.nPartitions, col("bp"))
        .write.mode(if (mode == "append") "overwrite" else mode)
        .partitionBy("bp", "gen")
        .option("partitionOverwriteMode",
          if (mode == "append") "dynamic" else "static")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(idx.bandsDir),
      () => sets
        .withColumn("gen", lit(gen))
        .withColumn("ip", ip(col("__id"), idx.nPartitions))
        .repartition(idx.nPartitions, col("ip"))
        .write.mode(if (mode == "append") "overwrite" else mode)
        .partitionBy("ip", "gen")
        .option("partitionOverwriteMode",
          if (mode == "append") "dynamic" else "static")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(idx.setsDir)))

  private def runParallel(jobs: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.sequence(jobs.map(j => Future(j()))),
      scala.concurrent.duration.Duration.Inf)
    ()
  }

  /** Index `docs` under `dir` (generation 0). Re-building over an existing
    * index resets it completely: the parquet overwrites replace bands/sets,
    * and stale tombstones are cleared explicitly — they live in a sibling
    * dir the overwrite never touches, and a leftover (id, upto_gen) from a
    * previous life would silently kill the rebuilt gen-0 rows of that id. */
  def build(docs: DataFrame, textCol: String, idCol: String, dir: String,
            threshold: Double, numHashes: Int = 32, bands: Int = 8,
            shingleN: Int = 3, nPartitions: Int = 64): Index = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val idx = Index(dir, threshold, numHashes, bands, shingleN, nPartitions)
    deleteDir(idx.tombstoneDir)
    val (banded0, sets0) = signed(docs, textCol, idCol, idx)
    // cache + materialize once: the two concurrent writes would otherwise
    // each recompute the shingle/signature pass from scratch
    val banded = graft.ops.Caches.track(banded0)
    val sets = graft.ops.Caches.track(sets0)
    banded.count()
    writeBatch(banded, sets, idx, gen = 0L, mode = "overwrite")
    commitGen(idx, 0L)
    idx
  }

  /** [[build]] + the build-time verified pair set, from ONE signing pass:
    * the signed frames are cached, written to the index, and fed to the
    * same self-join + exact-Jaccard verify as [[DocDedup.nearDupPairs]] —
    * a bootstrap dedup run would otherwise shingle the corpus twice. */
  def buildWithPairs(docs: DataFrame, textCol: String, idCol: String,
                     dir: String, threshold: Double, numHashes: Int = 32,
                     bands: Int = 8, shingleN: Int = 3, nPartitions: Int = 64,
                     maxBucketSize: Int = Int.MaxValue): (Index, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val idx = Index(dir, threshold, numHashes, bands, shingleN, nPartitions)
    deleteDir(idx.tombstoneDir) // rebuild resets the horizon (see build)
    val (banded0, sets0) = signed(docs, textCol, idCol, idx)
    val banded = graft.ops.Caches.track(banded0)
    val sets = graft.ops.Caches.track(sets0)
    banded.count() // fill both caches once before the concurrent writes
    writeBatch(banded, sets, idx, gen = 0L, mode = "overwrite")
    commitGen(idx, 0L)
    (idx, DocDedup.pairsFromSigned(banded, sets, threshold, maxBucketSize))
  }

  private def writeTombstones(idx: Index, upserts: DataFrame,
                              deletes: DataFrame, idCol: String, gen: Long): Unit =
    upserts.select(col(idCol).as("__id"))
      .unionByName(deletes.select(col(idCol).as("__id")))
      .distinct()
      .withColumn("upto_gen", lit(gen))
      .write.mode("overwrite").partitionBy("upto_gen")
      .option("partitionOverwriteMode", "dynamic")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(idx.tombstoneDir)

  /** Apply one change batch WITHOUT touching existing index rows: sign the
    * upserts, append their band/set rows at `gen`, and tombstone
    * upserted ∪ deleted ids at `gen` (an upsert's OLD signature may occupy
    * different buckets — the horizon kills it wherever it lives). `gen`
    * must increase per batch. `deletes` is an id-only frame (`idCol`). */
  /** True when `gen` is at-or-below the committed pointer: redelivering a
    * COMMITTED batch must not write (its rows are already visible; the
    * dynamic-overwrite replace would be harmless, but skipping keeps the
    * at-least-once fast path write-free, like Ivf/Pq/Retrieval). */
  private def alreadyCommitted(idx: Index, gen: Long): Boolean = {
    val c = committedGen(idx)
    c != Long.MaxValue && c >= gen
  }

  def applyBatch(idx: Index, upserts: DataFrame, textCol: String, idCol: String,
                 deletes: DataFrame, gen: Long): Unit = {
    if (alreadyCommitted(idx, gen)) return
    val (banded0, sets0) = signed(upserts, textCol, idCol, idx)
    // cache + materialize once — the concurrent writes must not re-sign
    val banded = graft.ops.Caches.track(banded0)
    val sets = graft.ops.Caches.track(sets0)
    banded.count()
    runParallel(Seq(
      () => writeBatch(banded, sets, idx, gen, mode = "append"),
      () => writeTombstones(idx, upserts, deletes, idCol, gen)))
    onApplyStep("appended")
    commitGen(idx, gen) // the batch becomes visible HERE, atomically
    onApplyStep("committed")
  }

  /** [[applyBatch]] + the batch's near-dup pairs against the index, from ONE
    * signing pass — the steady-state shape of an online dedup pipeline:
    * every change batch is indexed AND deduplicated in the same job. */
  def applyBatchWithPairs(idx: Index, upserts: DataFrame, textCol: String,
                          idCol: String, deletes: DataFrame, gen: Long,
                          maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val (banded0, sets0) = signed(upserts, textCol, idCol, idx)
    val banded = graft.ops.Caches.track(banded0)
    val sets = graft.ops.Caches.track(sets0)
    banded.count() // fill both caches once before the concurrent writes
    // a redelivered COMMITTED batch skips the writes but still answers
    // with its pair set — the caller's dedup decision needs it either way
    if (!alreadyCommitted(idx, gen)) {
      runParallel(Seq(
        () => writeBatch(banded, sets, idx, gen, mode = "append"),
        () => writeTombstones(idx, upserts, deletes, idCol, gen)))
      onApplyStep("appended")
      commitGen(idx, gen) // the batch becomes visible HERE, atomically
      onApplyStep("committed")
    }
    pairsForSigned(idx, banded, sets, maxBucketSize)
  }

  /** Rows surviving the tombstone horizon AND the committed-generation
    * pointer: row.gen ≤ committed (uncommitted appends of a torn batch
    * stay invisible — see the crash contract above) and row.gen ≥
    * max(upto_gen ≤ committed) of its id (no tombstone → survives).
    * Tombstones are control-sized → broadcast. */
  private def liveRows(idx: Index, rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    val committed = committedGen(idx)
    val visible =
      if (committed == Long.MaxValue) rows
      else rows.filter(col("gen") <= committed)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(idx.tombstoneDir)))
      visible
    else {
      val horizon = spark.read.parquet(idx.tombstoneDir)
        .filter(col("upto_gen") <= committed)
        .groupBy(col("__id")).agg(max(col("upto_gen")).as("__upto"))
      visible.join(broadcast(horizon), Seq("__id"), "left")
        .filter(col("__upto").isNull || col("gen") >= col("__upto"))
        .drop("__upto")
    }
  }

  /** Compact the log: rewrite both tables keeping only rows that survive
    * the tombstone horizon, collapse them to one generation (the current
    * maximum, so post-compaction batches keep stamping increasing gens),
    * and clear the tombstones. Equivalent to a fresh [[build]] of the live
    * corpus WITHOUT re-signing any document — compaction is pure IO over
    * the surviving rows. Steady state alternates cheap [[applyBatch]]
    * appends with an occasional compact, exactly like
    * [[graft.sim.Ivf.updateIndex]] vs rebuild.
    *
    * Single-writer maintenance op (same contract as the bucketed store's
    * vacuum): no concurrent probe/apply may run during the directory swap.
    */
  def compact(spark: SparkSession, idx: Index): Unit = {
    // repair any prior crashed swap before reading (DirSwap's contract)
    Seq(idx.bandsDir, idx.setsDir).foreach(graft.core.DirSwap.heal)
    val bands = liveRows(idx, spark.read.parquet(idx.bandsDir))
    val sets = liveRows(idx, spark.read.parquet(idx.setsDir))
    val gen = bands.agg(coalesce(max(col("gen")), lit(0L))).head().getLong(0)
    val staging = idx.copy(dir = idx.dir + "__compacting")
    // writeBatch re-derives gen/bp/ip; localCheckpoint materializes the
    // surviving rows BEFORE their source directories are replaced
    writeBatch(bands.drop("gen", "bp").localCheckpoint(true),
      sets.drop("gen", "ip").localCheckpoint(true), staging, gen, "overwrite")
    // crash consistency at each swap boundary (ChaosIndexSpec): compacted
    // rows keep the MAX generation, so with tombstones still present the
    // horizon (upto_gen <= max) passes them, and an un-swapped table still
    // reads its live rows — every prefix of the swaps probes identically
    replaceDir(staging.bandsDir, idx.bandsDir)
    graft.core.KillPoint("lsh.compact.bands")
    replaceDir(staging.setsDir, idx.setsDir)
    graft.core.KillPoint("lsh.compact.sets")
    deleteDir(idx.tombstoneDir)
    graft.core.KillPoint("lsh.compact.tombstones")
    deleteDir(staging.dir)
    // atLeast: a deletes-only final batch leaves max(live gen) < committed;
    // never regress the pointer (redelivery short-circuit contract)
    graft.core.GenPointer.commitAtLeast(idx.dir, gen)
  }

  private def deleteDir(dir: String): Unit =
    graft.core.TempDirs.deleteRecursively(java.nio.file.Paths.get(dir))

  private def replaceDir(src: String, dst: String): Unit =
    graft.core.DirSwap.swap(src, dst)

  /** Near-dup pairs between `batch` and the CURRENT index contents (which,
    * after [[applyBatch]], include the batch itself — so batch×batch pairs
    * come out too). Candidates from the band-bucket join are verified with
    * exact Jaccard over the stored shingle sets; output is canonical
    * (id_a < id_b, jaccard), disjoint from pre-batch build-time pairs.
    *
    * IO: the index band read is pruned to the batch's own `bp` partitions,
    * the set read to the candidates' `ip` partitions; the batch side of
    * both joins is broadcast. `maxBucketSize` caps degenerate buckets
    * exactly as in [[DocDedup.nearDupPairs]] (the cap applies to the joint
    * batch+index bucket population). */
  def pairsFor(idx: Index, batch: DataFrame, textCol: String, idCol: String,
               maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val (banded0, sets) = signed(batch, textCol, idCol, idx)
    pairsForSigned(idx, graft.ops.Caches.track(banded0),
      graft.ops.Caches.track(sets), maxBucketSize)
  }

  private def pairsForSigned(idx: Index, batchBanded: DataFrame,
      batchSets: DataFrame, maxBucketSize: Int): DataFrame = {
    val spark = batchBanded.sparkSession
    val bps: Seq[Int] = batchBanded
      .select(bp(col("__bucket"), idx.nPartitions).as("bp"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val idxBanded0 = liveRows(idx,
      spark.read.parquet(idx.bandsDir).filter(col("bp").isin(bps: _*)))
    // cap on the joint population of each touched bucket: union the batch
    // side in (it is also physically in the index after applyBatch, but the
    // pruned read and this union see the same rows exactly once after the
    // anti-self filter below)
    val idxBanded =
      if (maxBucketSize == Int.MaxValue) idxBanded0
      else DocDedup.capBuckets(idxBanded0, maxBucketSize)

    val cands = broadcast(batchBanded
        .select(col("__id").as("__qid"), col("__band"), col("__bucket")))
      .join(idxBanded, Seq("__band", "__bucket"))
      .filter(col("__qid") =!= col("__id"))
      .select(least(col("__qid"), col("__id")).as("id_a"),
        greatest(col("__qid"), col("__id")).as("id_b"),
        col("__id").as("__iid"))
      .distinct()

    val ips: Seq[Int] = cands
      .select(ip(col("__iid"), idx.nPartitions).as("ip"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val idxSets = liveRows(idx,
      spark.read.parquet(idx.setsDir).filter(col("ip").isin(ips: _*)))
      .select(col("__id"), col("__sh"))

    // shingle sets for both pair sides: the batch side from the cached
    // frame, the index side from the pruned store (a batch id resolves from
    // either — coalesce keeps one)
    val withSets = cands
      .join(broadcast(batchSets
        .select(col("__id").as("id_a"), col("__sh").as("__ba"))), Seq("id_a"), "left")
      .join(broadcast(batchSets
        .select(col("__id").as("id_b"), col("__sh").as("__bb"))), Seq("id_b"), "left")
      .join(idxSets.select(col("__id").as("id_a"), col("__sh").as("__ia")),
        Seq("id_a"), "left")
      .join(idxSets.select(col("__id").as("id_b"), col("__sh").as("__ib")),
        Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("__ba"), col("__ia")).as("__sa"),
        coalesce(col("__bb"), col("__ib")).as("__sb"))

    withSets
      .withColumn("jaccard", DocDedup.jaccardSets(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= idx.threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .distinct()
  }
}
