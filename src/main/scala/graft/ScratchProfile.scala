package graft

import graft.incr._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the bucketed incremental batch path. */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { t0 =>
          println(f"PROF   job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val q = SparkEntry.queries
    // warm-up JIT + parquet reader
    q("a6_reduce_sum")(spark, dir).count()

    for (i <- 1 to 4) {
      val df = time(s"incr_update apply$i") { q("incr_update")(spark, dir) }
      time(s"incr_update read$i") { df.count() }
      graft.ops.Caches.release(); spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
