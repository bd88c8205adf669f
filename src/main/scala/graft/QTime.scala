package graft

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing: run the named SparkEntry queries N times each
  * against a scale dir, mirroring Bench's session config. Usage:
  *   runMain graft.QTime <sfDir> <name> [name...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc() // let ContextCleaner reap orphaned checkpoint blocks
        f"$dt%.2fs(n=$n)"
      }
      println(s"QTIME $name: ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
