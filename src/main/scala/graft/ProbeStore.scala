package graft

import graft.core._
import graft.incr.{BucketedRun, BucketedStateStore, Change, IncrementalRun}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Store-scale probe: the durable bucketed store's core claim is that a
  * point operation (a small applyChanges batch, a putBlob, a scoped bucket
  * read) costs IO proportional to its TOUCHED BUCKETS — rows/buckets per
  * bucket — never to the table. The sf0.1 gate can't see this (the fixed
  * open/manifest/commit overhead of ~1-2 s dominates those numbers), so
  * this probe measures the claim directly over a (rows, buckets) matrix:
  *
  *   (1×, 64)  → baseline bucket size
  *   (10×, 64) → 10× bucket size: a point op rewrites a 10× bucket —
  *               expected to degrade ~linearly (the "buckets must scale
  *               with the table" half of the claim)
  *   (10×, 640) → bucket size back at baseline: point ops should return
  *               to ≈(1×, 64) cost (the "IO tracks touched buckets" half)
  *
  * `tableAsOf` (a FULL snapshot read) is recorded for contrast — it is
  * expected to track table size at every bucket count.
  *
  *   runMain graft.ProbeStore [sfDir] [scale,buckets ...]
  */
object ProbeStore {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cells: Seq[(Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val Array(a, b) = s.split(","); (a.toInt, b.toInt)
      } else Seq((1, 64), (10, 64), (10, 640))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val d = (System.nanoTime() - t0) / 1e9
      println(f"[probe-store] $label%-40s $d%.2f s")
      d
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")

    for ((scale, buckets) <- cells) {
      println(s"--- rows ${scale}x, buckets $buckets")
      val docs = (0 until scale).map(i => base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).cast("string").as("id"),
          col("source").as("k"), col("n_chars").cast("double").as("v"),
          encode(col("text"), "UTF-8").as("payload")))
        .reduce(_.unionByName(_))
        .localCheckpoint(true)
      println(s"[probe-store] corpus rows: ${docs.count()}")

      // --- MR store: initialize, then a FIXED 20-point-update batch
      val pipeline = Pipeline(
        maps = Seq(MapSpec("src", "m", 1, idCol = "id",
          fn = MapFns.item("k", Some("v"), idCol = "id"))),
        reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))
      val sources: IncrementalRun.Sources = _ => docs
      val mrStore = new BucketedStateStore(
        TempDirs.register(java.nio.file.Files
          .createTempDirectory(s"graft_ps_mr_${scale}_$buckets")).toString,
        buckets)
      t("initialize (full recompute, ∝ corpus)") {
        BucketedRun.initialize(pipeline, sources, mrStore)
      }
      val pointIds = docs.select(col("id")).as[String].head(20).toSeq
      val pointBatch = pointIds.zipWithIndex.map { case (id, i) =>
        Change(i + 1L, Change.Updated, "src", id)
      }
      t("applyChanges: 20 point updates (∝ touched buckets)") {
        BucketedRun.applyChanges(spark, pipeline, sources, mrStore,
          pointBatch, batchTimestampNs = 1L, batchId = 1L)
      }
      t("readBuckets: ONE bucket of 'r' (∝ bucket)") {
        mrStore.readBuckets(spark, "r", Seq(0)).count()
      }

      // --- doc store: putBlob + tableAsOf over the same matrix
      val emptySeq = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(MrSchema.SourceType, StringType),
          StructField(MrSchema.SourceId, StringType),
          StructField("seq", LongType))))
      val docStore = new BucketedStateStore(
        TempDirs.register(java.nio.file.Files
          .createTempDirectory(s"graft_ps_doc_${scale}_$buckets")).toString,
        buckets)
      t("doc-store initialize (∝ corpus)") {
        docStore.initialize(Map(
          "documents" -> (docs.select(col("id"), col("payload")): DataFrame, "id"),
          BucketedRun.SeqTable -> (emptySeq: DataFrame, MrSchema.SourceId)))
      }
      t("putBlob: one id (∝ touched bucket)") {
        BucketedRun.putBlob(spark, docStore, "documents", pointIds.head,
          "payload", Array[Byte](1, 2, 3), expectedSeq = 0L, newSeq = 1L,
          batchId = 1L)
      }
      t("tableAsOf: full snapshot read (∝ table — the contrast row)") {
        docStore.tableAsOf(spark, "documents",
          docStore.committedBatch.get).count()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
