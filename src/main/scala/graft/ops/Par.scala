package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy narrow stages.
  *
  * A small parquet table arrives as one input partition, so an expensive
  * per-row stage (MinHash/SimHash signatures, media decode) runs on one
  * core no matter how many executors exist. When the input has fewer
  * partitions than the cluster's default parallelism, repartition up;
  * when it already has enough (the 100 TB case), this is a no-op — no
  * gratuitous shuffle.
  */
object Par {
  def ensure(df: DataFrame, min: Int = 0): DataFrame = {
    val target = if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
