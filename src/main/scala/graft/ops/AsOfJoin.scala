package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the single right row with
  * the same key and the greatest right event time ≤ the left event time
  * (inclusive), optionally within a tolerance horizon.
  *
  * Spark has no built-in as-of join (the brief's canonical example of an
  * operator to re-express), and the naive formulation — a range join
  * `l.ts >= r.ts` plus a per-left-row max — is a cartesian-per-key
  * explosion: O(|L|·|R|) pairs per key before the max prunes them. This
  * implementation is the scale-correct UNION + WINDOW form:
  *
  *   1. tag right rows (side 0) and left rows (side 1) into one frame;
  *   2. one shuffle+sort per key ordered by (ts, side);
  *   3. running `last(payload, ignoreNulls)` carries the latest right
  *      payload forward onto every left row — O(|L|+|R|) total work,
  *      ONE exchange, no join explosion, AQE-skew-splittable like any
  *      window. At equal timestamps side 0 sorts first, so a left row
  *      matches a right row with exactly its timestamp (inclusive).
  *
  * Ties among right rows at the same (key, ts) are broken by the LAST
  * payload in sort order — supply a `tieBreak` column to make that
  * deterministic when right event times can collide.
  */
object AsOfJoin {

  /** @param payload   right columns to attach (null when no match)
    * @param tolerance max allowed `leftTs - rightTs` (same unit as the ts
    *                  columns); matches older than this are nulled out
    * @param tieBreak  extra right-side sort column for equal-ts ties
    * @return left rows + payload columns + `asof_ts` (matched right time)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String],
           tolerance: Option[Long] = None,
           tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("asof_ts"), "left already has asof_ts")
    require(payload.forall(p => !leftCols.contains(p)),
      "payload column names must not collide with left columns — alias the right side first")

    // struct-typed null literals need the concrete schema of each side
    val lrowType = left.select(struct(leftCols.map(col): _*).as("s")).schema.head.dataType
    val rpCols = struct((col(rightTs).cast("long").as("__rts") +:
      payload.map(col)): _*)
    val rpType = right.select(rpCols.as("s")).schema.head.dataType
    val tb = tieBreak.map(col).getOrElse(lit(0L))

    val r = right.select(col(key).as("__k"), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__side"), tb.cast("long").as("__tb"), rpCols.as("__rp"),
      lit(null).cast(lrowType).as("__lrow"))
    val l = left.select(col(key).as("__k"), col(leftTs).cast("long").as("__ts"),
      lit(1).as("__side"), lit(0L).as("__tb"), lit(null).cast(rpType).as("__rp"),
      struct(leftCols.map(col): _*).as("__lrow"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val gated = tolerance match {
      case Some(t) => carried.withColumn("__m",
        when(col("__ts") - col("__m.__rts") <= t, col("__m")))
      case None => carried
    }
    gated.select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      (col("__m.__rts").as("asof_ts") +:
        payload.map(p => col(s"__m.$p").as(p))): _*)
  }
}
