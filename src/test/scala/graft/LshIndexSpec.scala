package graft

import graft.dedup.{DocDedup, LshIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents").select("doc_id", "text").cache()

  private def tmpDir(): String = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory("graft_lshspec")).toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet

  private def fullPairs(corpus: DataFrame): Set[(Long, Long, Double)] =
    pairSet(DocDedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.8))

  private val emptyIds = Seq.empty[Long].toDF("doc_id")

  test("build + applyBatch + probe reproduces the one-shot pair set exactly") {
    val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val idx = LshIndex.build(init, "text", "doc_id", tmpDir(), threshold = 0.8)
    LshIndex.applyBatch(idx, batch, "text", "doc_id", emptyIds, gen = 1L)

    val all = fullPairs(docs)
    assert(all.nonEmpty, "corpus must contain near-dup pairs for this test to bite")
    val initPairs = fullPairs(init)
    val probed = pairSet(LshIndex.pairsFor(idx, batch, "text", "doc_id"))
    assert(probed.intersect(initPairs).isEmpty,
      "probe pairs must all touch the batch")
    assert(probed.union(initPairs) == all)
  }

  test("upserting changed text supersedes old signatures wherever they lived") {
    // rewrite some indexed docs to near-copies of OTHER docs: old pairs must
    // die, new cross-pairs must appear — exactly as a fresh rebuild sees it
    val upsertIds = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select("doc_id").as[Long].collect().toSet
    val donors = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .orderBy(col("doc_id")).limit(upsertIds.size)
      .select("text").as[String].collect()
    val rewrites = upsertIds.toSeq.sorted.zip(donors).map {
      case (id, donor) => (id, donor + " tail")
    }.toDF("doc_id", "text")
    val current = docs.filter(!col("doc_id").isin(upsertIds.toSeq: _*))
      .unionByName(rewrites)

    val idx = LshIndex.build(docs, "text", "doc_id", tmpDir(), threshold = 0.8)
    LshIndex.applyBatch(idx, rewrites, "text", "doc_id", emptyIds, gen = 1L)

    val buildPairs = fullPairs(docs)
    val maintained = buildPairs
      .filterNot(p => upsertIds(p._1) || upsertIds(p._2))
      .union(pairSet(LshIndex.pairsFor(idx, rewrites, "text", "doc_id")))
    assert(maintained == fullPairs(current))
    assert(maintained != buildPairs, "the rewrite must actually change the pair set")
  }

  test("deletes tombstone every band and set row of the id") {
    val all = fullPairs(docs)
    val someA = all.head._1
    val deleted = Seq(someA).toDF("doc_id")
    val idx = LshIndex.build(docs, "text", "doc_id", tmpDir(), threshold = 0.8)
    LshIndex.applyBatch(idx, deleted.limit(0).withColumn("text", lit("")),
      "text", "doc_id", deleted, gen = 1L)

    // a probe with the survivor corpus as batch must surface no pair that
    // touches the deleted id (its rows are dead under the horizon)
    val probe = pairSet(LshIndex.pairsFor(idx,
      docs.filter(col("doc_id") =!= someA), "text", "doc_id"))
    assert(probe.forall(p => p._1 != someA && p._2 != someA))
    assert(probe == fullPairs(docs.filter(col("doc_id") =!= someA)))
  }

  test("sign-once buildWithPairs/applyBatchWithPairs equal the two-call forms") {
    val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val (idx, initPairs) = LshIndex.buildWithPairs(init, "text", "doc_id",
      tmpDir(), threshold = 0.8)
    val probed = pairSet(LshIndex.applyBatchWithPairs(idx, batch, "text",
      "doc_id", emptyIds, gen = 1L))
    assert(pairSet(initPairs) == fullPairs(init))
    assert(probed.union(pairSet(initPairs)) == fullPairs(docs))
  }

  test("compact collapses generations, clears tombstones, preserves probes") {
    val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val idx = LshIndex.build(init, "text", "doc_id", tmpDir(), threshold = 0.8)
    val delIds = init.select("doc_id").orderBy("doc_id").limit(5)
      .as[Long].collect().toSeq
    LshIndex.applyBatch(idx, batch, "text", "doc_id",
      delIds.toDF("doc_id"), gen = 1L)
    val before = pairSet(LshIndex.pairsFor(idx, batch, "text", "doc_id"))

    LshIndex.compact(spark, idx)

    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(idx.tombstoneDir)), "tombstones must be cleared")
    val bands = spark.read.parquet(idx.bandsDir)
    assert(bands.select("gen").distinct().count() == 1,
      "generations must collapse to one")
    assert(bands.filter(col("__id").isin(delIds: _*)).count() == 0,
      "deleted ids must be physically gone")
    assert(pairSet(LshIndex.pairsFor(idx, batch, "text", "doc_id")) == before)

    // the log keeps working after compaction: a further upsert batch at a
    // higher gen supersedes its compacted rows and probes identically
    LshIndex.applyBatch(idx, batch, "text", "doc_id", emptyIds, gen = 2L)
    assert(pairSet(LshIndex.pairsFor(idx, batch, "text", "doc_id")) == before)
  }

  test("rebuilding over an existing index clears stale tombstones") {
    val dir = tmpDir()
    val idx = LshIndex.build(docs, "text", "doc_id", dir, threshold = 0.8)
    val victim = fullPairs(docs).head._1
    LshIndex.applyBatch(idx, docs.filter(col("doc_id") === victim),
      "text", "doc_id", emptyIds, gen = 1L) // tombstones the victim at gen 1
    // re-index the same corpus from scratch into the same directory: the
    // gen-0 rows of the victim must NOT be killed by the stale tombstone
    val idx2 = LshIndex.build(docs, "text", "doc_id", dir, threshold = 0.8)
    val probe = pairSet(LshIndex.pairsFor(idx2,
      docs.filter(col("doc_id") === victim), "text", "doc_id"))
    assert(probe.exists(p => p._1 == victim || p._2 == victim),
      "rebuilt rows of a previously-tombstoned id must be live")
  }

  test("probe reads are partition-pruned to the batch's bucket partitions") {
    val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(col("doc_id") === docs.select(min("doc_id"))
      .as[Long].head())
    val idx = LshIndex.build(init, "text", "doc_id", tmpDir(), threshold = 0.8)
    LshIndex.applyBatch(idx, batch, "text", "doc_id", emptyIds, gen = 1L)
    val plan = LshIndex.pairsFor(idx, batch, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "band read must carry partition filters")
    // one doc → at most `bands` band buckets → at most that many of the 64
    // bp partitions may be read (IN for small sets, INSET for larger)
    val bpFilter = "bp#\\d+ (?:IN \\(([^)]+)\\)|INSET ([^\\)\\]]+))".r
      .findFirstMatchIn(plan)
    assert(bpFilter.isDefined, s"no bp partition filter in plan")
    val n = Option(bpFilter.get.group(1)).getOrElse(bpFilter.get.group(2))
      .split(",").length
    assert(n <= idx.bands, s"probe read $n bp partitions for a 1-doc batch")
  }
}
