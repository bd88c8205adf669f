package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time breakdown of a named SparkEntry query: prints every
  * Spark job the query triggers (description, stage count, duration) so a
  * multi-action query's cost distributes to the action that pays it.
  * Usage: runMain graft.ProbeJobs <sfDir> <name> [rounds=2] */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val rounds = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(js.stageInfos.map(_.name).distinct.mkString(" | ")
            .take(160))
        starts.put(js.jobId, (System.nanoTime(), desc, js.stageIds.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc, nst) =>
          val dt = (System.nanoTime() - t0) / 1e9
          lines.add(f"[job] ${je.jobId}%4d $dt%7.2f s  stages=$nst%-3d $desc")
        }
      }
    })

    (0 until rounds).foreach { r =>
      lines.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(300)
      println(s"--- $name round $r: total ${f"$total%.2f"} s (n=$n)")
      lines.forEach(l => println(l))
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      spark.streams.resetTerminated()
      System.gc()
    }
    spark.stop()
  }
}
