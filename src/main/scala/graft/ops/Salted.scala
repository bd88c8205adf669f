package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation.
  *
  * A hot `_mr_key` (one customer with 10^9 orders, one 3-value flag column
  * over 10^12 rows) floods a single reducer in the naive
  * `groupBy(key).agg(...)`. The classic fix is salting: aggregate per
  * (key, salt) first — spreading the hot key over `buckets` reducers — then
  * combine the partials per key. Works for any decomposable fold
  * (sum/count/min/max, and avg via sum+count).
  *
  * The salt is `spark_partition_id()`: deterministic, no RNG (replays
  * identically), and naturally bounded by the upstream partition count, so
  * stage 1 is equivalent to a forced map-side combine even when the input
  * is an aggregation-unfriendly shape (e.g. after an explode that defeats
  * hash-aggregate fallback).
  */
object Salted {

  /** Two-stage sum of `valueCol` per `keyCols`. */
  def sum(df: DataFrame, keyCols: Seq[String], valueCol: String,
          out: String = "sum_value"): DataFrame =
    twoStage(df, keyCols, functions.sum(col(valueCol)), functions.sum, out)

  /** Two-stage count per `keyCols`. */
  def count(df: DataFrame, keyCols: Seq[String], out: String = "cnt"): DataFrame =
    twoStage(df, keyCols, functions.count(lit(1)), functions.sum, out)

  def min(df: DataFrame, keyCols: Seq[String], valueCol: String,
          out: String = "min_value"): DataFrame =
    twoStage(df, keyCols, functions.min(col(valueCol)), functions.min, out)

  def max(df: DataFrame, keyCols: Seq[String], valueCol: String,
          out: String = "max_value"): DataFrame =
    twoStage(df, keyCols, functions.max(col(valueCol)), functions.max, out)

  /** avg via (sum, count) partials — not directly decomposable. */
  def avg(df: DataFrame, keyCols: Seq[String], valueCol: String,
          out: String = "avg_value"): DataFrame = {
    val ks = keyCols.map(col)
    df.groupBy((ks :+ spark_partition_id().as("__salt")): _*)
      .agg(functions.sum(col(valueCol)).as("__s"), functions.count(lit(1)).as("__c"))
      .groupBy(ks: _*)
      .agg((functions.sum(col("__s")) / functions.sum(col("__c"))).as(out))
  }

  private val functions = org.apache.spark.sql.functions

  private def twoStage(df: DataFrame, keyCols: Seq[String], partial: Column,
                       combine: Column => Column, out: String): DataFrame = {
    val ks = keyCols.map(col)
    df.groupBy((ks :+ spark_partition_id().as("__salt")): _*)
      .agg(partial.as("__p"))
      .groupBy(ks: _*)
      .agg(combine(col("__p")).as(out))
  }
}
