package graft

import graft.core.MrSchema
import graft.incr.{BucketedRun, BucketedStateStore}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-then-REDELIVERED interleavings for the point-addressed PUT
  * surface (putBlob / putSubresource) — the round-8 gen-partition bugs
  * were exactly this class: crash coverage alone proves the batch stays
  * invisible, but at-least-once delivery then REPLAYS the same batchId
  * against whatever the crash left behind. For every durability seam of
  * the manifest commit (staged tmp files, snapshot move, pointer swap,
  * post-swap) the matrix here kills the writer, RE-OPENS the store from
  * disk (the in-memory handle died with the process), redelivers the
  * identical batch, and requires the final payload + revision + committed
  * pointer to be bit-identical to the crash-free run. */
class ChaosPutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private final class Kill extends RuntimeException("injected crash")

  private def emptySeq = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField(MrSchema.SourceType, StringType),
      StructField(MrSchema.SourceId, StringType),
      StructField("seq", LongType))))

  private def blobStore(root: String): BucketedStateStore = {
    val store = new BucketedStateStore(root, 8)
    val docs = Seq(("a", "old-a".getBytes("UTF-8")),
      ("b", "old-b".getBytes("UTF-8"))).toDF("id", "payload")
    store.initialize(Map(
      "documents" -> (docs: DataFrame, "id"),
      BucketedRun.SeqTable -> (emptySeq: DataFrame, MrSchema.SourceId)))
    store
  }

  private def structStore(root: String): BucketedStateStore = {
    val store = new BucketedStateStore(root, 8)
    val docs = Seq(("a", 10L, "a@old"), ("b", 20L, "b@old"))
      .toDF("id", "nation", "email")
      .select(col("id"), struct(col("nation"), col("email")).as("private"))
    store.initialize(Map(
      "persons" -> (docs: DataFrame, "id"),
      BucketedRun.SeqTable -> (emptySeq: DataFrame, MrSchema.SourceId)))
    store
  }

  private def stateOf(store: BucketedStateStore, table: String,
                      probe: DataFrame => Seq[String]): (Seq[String], Map[String, Long], Option[Long]) = (
    probe(store.table(spark, table)),
    store.table(spark, BucketedRun.SeqTable)
      .select(col(MrSchema.SourceId), col("seq"))
      .as[(String, Long)].collect().toMap,
    store.committedBatch)

  /** The four durability seams of one commit, in order: the snapshot tmp
    * write, the snapshot move, the manifest tmp write, the pointer swap
    * (post-swap = the batch is already committed when the crash hits). */
  private val Seams = Seq("tmp-written:_manifest.b1", "snapshot-written",
    "tmp-written:_manifest", "pointer-swapped")

  private def exercise(mkStore: String => BucketedStateStore, table: String,
                       put: (BucketedStateStore, Long) => Unit,
                       probe: DataFrame => Seq[String]): Unit = {
    // the crash-free oracle
    val cleanRoot = Files.createTempDirectory("graft_put_clean").toString
    val clean = mkStore(cleanRoot)
    put(clean, 1L)
    val want = stateOf(new BucketedStateStore(cleanRoot, 8), table, probe)

    for (seam <- Seams) {
      val root = Files.createTempDirectory(s"graft_put_$seam").toString
      val store = mkStore(root)
      store.onCommitStep = s => if (s == seam) throw new Kill
      intercept[Kill](put(store, 1L))
      // the writer process died: reopen from disk and REDELIVER the batch
      val reopened = new BucketedStateStore(root, 8)
      if (seam != "pointer-swapped")
        assert(reopened.committedBatch.contains(0L),
          s"$seam: a pre-swap crash must leave the batch invisible")
      put(reopened, 1L) // same batchId — a committed batch must no-op
      assert(stateOf(new BucketedStateStore(root, 8), table, probe) == want,
        s"$seam: redelivered state must equal the crash-free run")
    }
  }

  test("putBlob: crash at every commit seam, redelivery converges exactly") {
    exercise(blobStore, "documents",
      (st, b) => BucketedRun.putBlob(spark, st, "documents", "b", "payload",
        "new-b".getBytes("UTF-8"), expectedSeq = 0L, newSeq = 5L, batchId = b),
      df => df.select(col("id"), col("payload").cast("string"))
        .as[(String, String)].collect().map(_.toString).toSeq.sorted)
  }

  test("putSubresource: crash at every commit seam, redelivery converges exactly") {
    exercise(structStore, "persons",
      (st, b) => BucketedRun.putSubresource(spark, st, "persons", "a",
        "private", """{"nation": 99, "email": "a@new"}""",
        expectedSeq = 0L, newSeq = 3L, batchId = b),
      df => df.select(col("id"), col("private.nation"), col("private.email"))
        .as[(String, Long, String)].collect().map(_.toString).toSeq.sorted)
  }
}
