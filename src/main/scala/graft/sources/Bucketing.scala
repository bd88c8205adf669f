package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed tables — the shuffle-elimination pattern
  * for the engine's recurring `_mr_key` joins at 100 TB.
  *
  * Every incremental batch joins the map table on the same key; writing the
  * persisted state bucketed by that key means the join/groupBy reuses the
  * on-disk clustering instead of re-shuffling terabytes per batch. Spark
  * needs catalog tables for bucket metadata, so these helpers go through
  * `saveAsTable` (the in-memory/Hive catalog both work).
  */
object Bucketing {

  /** Persist `df` clustered and sorted by `keys` into `buckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket keys. With equal
    * bucket counts Spark plans a sort-merge join with NO exchange on either
    * side (verified in the spec by asserting the plan is exchange-free). */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
