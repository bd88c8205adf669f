package graft

import graft.core.MrSchema
import graft.incr.{BucketedRun, BucketedStateStore}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Blob-file subresource PUT (`update_file`, clients/qvarn.py:193-200):
  * the (type, id, subresource)-addressed write with the revision/CAS
  * check — 409 (WriteConflict) on a stale revision without mutating
  * anything, 404 (NoSuchResource) on a missing row, atomic blob+revision
  * commit, and exactly-once replay of a committed batch id. */
class BlobPutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def blobOf(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def newStore(): BucketedStateStore = {
    val store = new BucketedStateStore(
      Files.createTempDirectory("graft_blob").toString, 8)
    val docs = Seq(("a", blobOf("old-a")), ("b", blobOf("old-b")),
      ("c", blobOf("old-c"))).toDF("id", "payload")
    val emptySeq = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(MrSchema.SourceType, StringType),
        StructField(MrSchema.SourceId, StringType),
        StructField("seq", LongType))))
    store.initialize(Map(
      "documents" -> (docs: DataFrame, "id"),
      BucketedRun.SeqTable -> (emptySeq: DataFrame, MrSchema.SourceId)))
    store
  }

  private def payloads(store: BucketedStateStore): Map[String, String] =
    store.table(spark, "documents")
      .select(col("id"), col("payload").cast("string"))
      .as[(String, String)].collect().toMap

  private def revisions(store: BucketedStateStore): Map[String, Long] =
    store.table(spark, BucketedRun.SeqTable)
      .select(col(MrSchema.SourceId), col("seq"))
      .as[(String, Long)].collect().toMap

  test("put writes the blob and advances the revision in one commit") {
    val store = newStore()
    BucketedRun.putBlob(spark, store, "documents", "b", "payload",
      blobOf("new-b"), expectedSeq = 0L, newSeq = 5L, batchId = 1L)
    assert(payloads(store) ==
      Map("a" -> "old-a", "b" -> "new-b", "c" -> "old-c"))
    assert(revisions(store) == Map("b" -> 5L))
    // a second write must present the CURRENT revision
    BucketedRun.putBlob(spark, store, "documents", "b", "payload",
      blobOf("newer-b"), expectedSeq = 5L, newSeq = 6L, batchId = 2L)
    assert(payloads(store)("b") == "newer-b")
    assert(revisions(store) == Map("b" -> 6L))
  }

  test("stale revision raises WriteConflict and mutates NOTHING") {
    val store = newStore()
    BucketedRun.putBlob(spark, store, "documents", "a", "payload",
      blobOf("new-a"), expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    val before = (payloads(store), revisions(store), store.committedBatch)
    val ex = intercept[BucketedRun.WriteConflict] {
      BucketedRun.putBlob(spark, store, "documents", "a", "payload",
        blobOf("stale"), expectedSeq = 0L, newSeq = 2L, batchId = 2L)
    }
    assert(ex.conflicts == Seq(("documents", "a", 0L, 1L)))
    assert((payloads(store), revisions(store), store.committedBatch) == before)
    // an unwritten id expecting a nonzero revision conflicts with actual 0
    val ex2 = intercept[BucketedRun.WriteConflict] {
      BucketedRun.putBlob(spark, store, "documents", "c", "payload",
        blobOf("x"), expectedSeq = 3L, newSeq = 4L, batchId = 2L)
    }
    assert(ex2.conflicts == Seq(("documents", "c", 3L, 0L)))
  }

  test("missing resource raises NoSuchResource; a PUT never creates the row") {
    val store = newStore()
    intercept[BucketedRun.NoSuchResource] {
      BucketedRun.putBlob(spark, store, "documents", "nope", "payload",
        blobOf("x"), expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    }
    assert(payloads(store).keySet == Set("a", "b", "c"))
    assert(revisions(store).isEmpty)
  }

  test("replayed committed batch id is a no-op (exactly-once)") {
    val store = newStore()
    BucketedRun.putBlob(spark, store, "documents", "a", "payload",
      blobOf("v1"), expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    // the redelivered batch carries the SAME write; re-applying must not
    // even reach the CAS (which would now conflict on expectedSeq = 0)
    BucketedRun.putBlob(spark, store, "documents", "a", "payload",
      blobOf("v1"), expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    assert(payloads(store)("a") == "v1")
    assert(revisions(store) == Map("a" -> 1L))
  }

  // ---- dict-subpath PUT (putSubresource) — the STRUCT twin -------------

  private def newStructStore(): BucketedStateStore = {
    val store = new BucketedStateStore(
      Files.createTempDirectory("graft_sub").toString, 8)
    val docs = Seq(("a", 10L, "a@old"), ("b", 20L, "b@old"))
      .toDF("id", "nation", "email")
      .select(col("id"),
        struct(col("nation"), col("email")).as("private"))
    val emptySeq = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(MrSchema.SourceType, StringType),
        StructField(MrSchema.SourceId, StringType),
        StructField("seq", LongType))))
    store.initialize(Map(
      "persons" -> (docs: DataFrame, "id"),
      BucketedRun.SeqTable -> (emptySeq: DataFrame, MrSchema.SourceId)))
    store
  }

  private def sideDocs(store: BucketedStateStore): Map[String, (Long, String)] =
    store.table(spark, "persons")
      .select(col("id"), col("private.nation"), col("private.email"))
      .as[(String, Long, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("putSubresource: CAS, 404-never-creates, one-swap commit, replay no-op") {
    val store = newStructStore()
    BucketedRun.putSubresource(spark, store, "persons", "a", "private",
      """{"nation": 99, "email": "a@new"}""",
      expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    assert(sideDocs(store) == Map("a" -> ((99L, "a@new")), "b" -> ((20L, "b@old"))))
    assert(revisions(store) == Map("a" -> 1L))
    // stale revision: 409 and NOTHING mutates
    val before = (sideDocs(store), revisions(store), store.committedBatch)
    val ex = intercept[BucketedRun.WriteConflict] {
      BucketedRun.putSubresource(spark, store, "persons", "a", "private",
        """{"nation": 0, "email": "stale"}""",
        expectedSeq = 0L, newSeq = 2L, batchId = 2L)
    }
    assert(ex.conflicts == Seq(("persons", "a", 0L, 1L)))
    assert((sideDocs(store), revisions(store), store.committedBatch) == before)
    // 404: a subresource PUT never creates the parent
    intercept[BucketedRun.NoSuchResource] {
      BucketedRun.putSubresource(spark, store, "persons", "ghost", "private",
        """{"nation": 1, "email": "x"}""",
        expectedSeq = 0L, newSeq = 1L, batchId = 2L)
    }
    assert(sideDocs(store).keySet == Set("a", "b"))
    // replay of the committed batch id: no-op, never reaches the CAS
    BucketedRun.putSubresource(spark, store, "persons", "a", "private",
      """{"nation": 99, "email": "a@new"}""",
      expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    assert(sideDocs(store)("a") == ((99L, "a@new")))
    assert(revisions(store) == Map("a" -> 1L))
  }

  test("putSubresource contract: malformed payload and non-struct column fail loud") {
    val store = newStructStore()
    // FAILFAST: a malformed payload must throw, not null the side-document
    intercept[Exception] {
      BucketedRun.putSubresource(spark, store, "persons", "a", "private",
        """{"nation": not-json""",
        expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    }
    assert(sideDocs(store)("a") == ((10L, "a@old")), "failed PUT must not mutate")
    intercept[IllegalArgumentException] { // id is not a struct column
      BucketedRun.putSubresource(spark, store, "persons", "a", "id",
        """{"x": 1}""", expectedSeq = 0L, newSeq = 1L, batchId = 1L)
    }
  }

  test("contract violations fail loud: revision regression, non-binary column") {
    val store = newStore()
    BucketedRun.putBlob(spark, store, "documents", "a", "payload",
      blobOf("v1"), expectedSeq = 0L, newSeq = 7L, batchId = 1L)
    intercept[IllegalArgumentException] { // newSeq must advance
      BucketedRun.putBlob(spark, store, "documents", "a", "payload",
        blobOf("v2"), expectedSeq = 7L, newSeq = 7L, batchId = 2L)
    }
    intercept[IllegalArgumentException] { // id is not a blob column
      BucketedRun.putBlob(spark, store, "documents", "a", "id",
        blobOf("v2"), expectedSeq = 7L, newSeq = 8L, batchId = 2L)
    }
  }
}
