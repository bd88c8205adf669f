package graft

import graft.dedup.{DocDedup, LshIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the incremental LSH dedup flow — profiling aid for
  * the heaviest bench query (`dedup_minhash_incr`). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (0 until 3).foreach { round =>
      println(s"--- round $round")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val tmp = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_prof")).toString
      val (idx, initPairs) = t("buildWithPairs (write only)") {
        LshIndex.buildWithPairs(init, "text", "doc_id", tmp, threshold = 0.8,
          numHashes = 32, bands = 8, nPartitions = 16, maxBucketSize = 10000)
      }
      t("initPairs action") { initPairs.count() }
      val probe = t("applyBatchWithPairs (write)") {
        LshIndex.applyBatchWithPairs(idx, batch, "text", "doc_id",
          deletes = batch.select(col("doc_id")).limit(0), gen = 1L,
          maxBucketSize = 10000)
      }
      t("probe action") { probe.count() }
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
