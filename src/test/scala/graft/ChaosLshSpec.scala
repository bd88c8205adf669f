package graft

import graft.dedup.LshIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash contract of the persisted LSH index: a change batch appends to
  * THREE directories, so without the committed-generation pointer a crash
  * mid-batch would leave torn cross-table state (band rows without their
  * shingle sets silently DROP pairs). These tests kill the apply at the
  * seam and assert: before the pointer swap the batch is INVISIBLE (the
  * index reads as its pre-batch self), after it the batch is fully
  * visible, and redelivering the same generation — the at-least-once feed
  * contract — converges to exactly the one-shot rebuild's pair set. */
class ChaosLshSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private final class Kill extends RuntimeException("injected crash")

  private def tmp(p: String) = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory(p)).toString

  // tiny corpus with engineered near-dups: each family of 3 shares a long
  // sentence, with one-token perturbations — Jaccard above 0.8 in-family
  private def corpus: DataFrame = (0L until 30L).map { i =>
    val fam = i / 3
    val tail = (i % 3) match {
      case 0 => ""
      case 1 => " extra"
      case _ => " extra more"
    }
    (i, s"family $fam shares this quite long deterministic sentence " +
      s"with enough shingle mass to stay similar under perturbation$tail")
  }.toDF("doc_id", "text")

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("crash between append and commit leaves the batch invisible; redelivery converges") {
    val init = corpus.filter(col("doc_id") % 3 =!= 0)
    val batch = corpus.filter(col("doc_id") % 3 === 0)
    val dir = tmp("graft_lsh_chaos")
    val (idx, initPairs0) = LshIndex.buildWithPairs(init, "text", "doc_id", dir,
      threshold = 0.8, numHashes = 16, bands = 4, nPartitions = 4)
    val initPairs = pairsOf(initPairs0)

    val probeBefore = pairsOf(LshIndex.pairsFor(idx, batch, "text", "doc_id"))
    assert(probeBefore.nonEmpty, "families must pair across init")

    // crash AFTER all three appends, BEFORE the pointer swap
    LshIndex.onApplyStep = s => if (s == "appended") throw new Kill
    intercept[Kill] {
      LshIndex.applyBatch(idx, batch, "text", "doc_id",
        deletes = batch.select(col("doc_id")).limit(0), gen = 1L)
    }
    LshIndex.onApplyStep = _ => ()

    // the torn batch is INVISIBLE: probing yields exactly the pre-crash view
    val probeAfterCrash = pairsOf(LshIndex.pairsFor(idx, batch, "text", "doc_id"))
    assert(probeAfterCrash == probeBefore,
      "uncommitted appends must not change probe results")

    // redelivery at the SAME generation (at-least-once feed): apply again,
    // then the live pair set must equal the one-shot rebuild of everything
    val batchPairs = pairsOf(LshIndex.applyBatchWithPairs(idx, batch, "text",
      "doc_id", deletes = batch.select(col("doc_id")).limit(0), gen = 1L))
    val (_, rebuilt) = LshIndex.buildWithPairs(corpus, "text", "doc_id",
      tmp("graft_lsh_oracle"), threshold = 0.8, numHashes = 16, bands = 4,
      nPartitions = 4)
    assert(initPairs ++ batchPairs == pairsOf(rebuilt),
      "converged pairs must equal the one-shot rebuild despite duplicate appends")
  }

  test("crash after the pointer swap: batch already visible, re-apply idempotent") {
    val init = corpus.filter(col("doc_id") % 3 =!= 0)
    val batch = corpus.filter(col("doc_id") % 3 === 0)
    val dir = tmp("graft_lsh_chaos2")
    val (idx, initPairs0) = LshIndex.buildWithPairs(init, "text", "doc_id", dir,
      threshold = 0.8, numHashes = 16, bands = 4, nPartitions = 4)

    LshIndex.onApplyStep = s => if (s == "committed") throw new Kill
    intercept[Kill] {
      LshIndex.applyBatch(idx, batch, "text", "doc_id",
        deletes = batch.select(col("doc_id")).limit(0), gen = 1L)
    }
    LshIndex.onApplyStep = _ => ()

    // visible already — and a second (redelivered) apply changes nothing
    val once = pairsOf(LshIndex.pairsFor(idx, batch, "text", "doc_id"))
    val again = pairsOf(LshIndex.applyBatchWithPairs(idx, batch, "text",
      "doc_id", deletes = batch.select(col("doc_id")).limit(0), gen = 1L))
    assert(again == once, "re-applied committed batch must be idempotent")
    val (_, rebuilt) = LshIndex.buildWithPairs(corpus, "text", "doc_id",
      tmp("graft_lsh_oracle2"), threshold = 0.8, numHashes = 16, bands = 4,
      nPartitions = 4)
    assert(pairsOf(initPairs0) ++ once == pairsOf(rebuilt))
  }

  test("a torn single-table append beyond the pointer stays invisible") {
    val init = corpus
    val dir = tmp("graft_lsh_chaos3")
    val idx = LshIndex.build(init, "text", "doc_id", dir,
      threshold = 0.8, numHashes = 16, bands = 4, nPartitions = 4)
    val probe = corpus.filter(col("doc_id") < 6)
    val before = pairsOf(LshIndex.pairsFor(idx, probe, "text", "doc_id"))

    // simulate a crash that finished ONLY the bands append of some future
    // batch: copy existing band rows re-stamped at an uncommitted gen
    val poison = spark.read.parquet(idx.bandsDir)
      .withColumn("gen", lit(99L))
    poison.write.mode("append").partitionBy("bp", "gen").parquet(idx.bandsDir)

    val after = pairsOf(LshIndex.pairsFor(idx, probe, "text", "doc_id"))
    assert(after == before, "rows beyond the committed pointer must be ignored")
  }
}
