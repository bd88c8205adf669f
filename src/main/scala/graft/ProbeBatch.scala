package graft

import graft.core._
import graft.incr.{BucketedRun, BucketedStateStore, Change, IncrementalRun}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the distributed large-batch path: apply the same
  * one-third-of-corpus change batch through
  * [[BucketedRun.applyChangesDistributed]] at 1× and 10× corpus size
  * (10× = the sf corpus unioned with 9 id-shifted copies — same key
  * distribution, 10× rows) and report wall times. The claim under test:
  * batch cost tracks the BATCH and its touched buckets, not the corpus —
  * so 10× corpus with a 10× batch should scale ~linearly on 32 cores,
  * with no driver collect growing past bucket ids.
  */
object ProbeBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-batch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pipeline = Pipeline(
      maps = Seq(MapSpec("src", "m", 1, idCol = "id",
        fn = MapFns.item("k", Some("v"), idCol = "id"))),
      reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source").as("k"),
        col("n_chars").cast("double").as("v"))

    for (scale <- scales) {
      println(s"--- scale ${scale}x")
      val src = (0 until scale).map(i =>
          base.select((col("doc_id") + lit(i.toLong * 10000000L)).cast("string").as("id"),
            col("k"), col("v")))
        .reduce(_.unionByName(_))
        .localCheckpoint(true)
      println(s"[probe-batch] corpus rows: ${src.count()}")
      val sources: IncrementalRun.Sources = _ => src
      val store = new BucketedStateStore(
        graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory(s"graft_pb$scale")).toString, 64)
      t(s"initialize (recompute + write)") {
        BucketedRun.initialize(pipeline, sources, store)
      }
      // one third of all ids change (an after-downtime backlog)
      val changes = src.filter(abs(hash(col("id"))) % 3 === 0)
        .select(col("id"))
        .withColumn("seq", monotonically_increasing_id() + 1)
        .select(col("seq"), lit(Change.Updated).as("change"),
          lit("src").as("resourceType"), col("id").as("resourceId"))
        .as[Change].localCheckpoint(true)
      println(s"[probe-batch] batch rows: ${changes.count()}")
      t(s"applyChangesDistributed") {
        BucketedRun.applyChangesDistributed(pipeline, sources, store,
          changes, batchTimestampNs = 1L, batchId = 1L)
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
