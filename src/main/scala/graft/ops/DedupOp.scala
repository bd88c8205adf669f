package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A12 — dedup-to-newest: when several rows share a key, keep the one with
  * the greatest timestamp (reference `_get_and_ensure_single_resource`,
  * processor.py:181-189; CHANGES.rst:47-52).
  *
  * Spark-first: a `row_number` window partitioned by the key. At scale this
  * is a single shuffle on the key (same partitioning the surrounding
  * reduce already uses, so AQE can often reuse the exchange); `tieBreakers`
  * make the survivor deterministic when timestamps collide.
  */
object DedupOp {
  def newestWins(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 tieBreakers: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol).desc +: tieBreakers.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
