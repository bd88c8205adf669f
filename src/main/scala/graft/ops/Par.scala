package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy narrow stages.
  *
  * A small parquet table arrives as one input partition, so an expensive
  * per-row stage (MinHash/SimHash signatures, media decode) runs on one
  * core no matter how many executors exist. When the input looks smaller
  * than the cluster's default parallelism, repartition up; when it already
  * has enough (the 100 TB case), this is a no-op — no gratuitous shuffle.
  *
  * The estimate is PLAN-FREE: input-file count from the scan metadata and
  * the optimizer's size statistics, never `df.rdd` — the RDD probe used
  * previously instantiated a second physical plan per call (planning every
  * dedup/decode input twice and sidestepping AQE).
  */
object Par {
  private val SplitBytes = 128L * 1024 * 1024 // spark.sql.files.maxPartitionBytes default

  def ensure(df: DataFrame, min: Int = 0): DataFrame = {
    val target = if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    // file count is a sound lower-bound proxy even for tiny files: Spark's
    // packing charges openCostInBytes (4 MB) per file and sizes splits by
    // bytes-per-core, so `files >= target` yields ≈target scan partitions
    // rather than collapsing many small files into one
    val files = try df.inputFiles.length.toLong catch { case _: Throwable => 0L }
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits =
      math.max(files, (bytes / SplitBytes).min(BigInt(Int.MaxValue)).toLong)
    if (estSplits >= target) df else df.repartition(target)
  }
}
