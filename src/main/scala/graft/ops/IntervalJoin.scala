package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left row with the right rows whose
  * event time falls in `[leftTs + lower, leftTs + upper]` (inclusive),
  * optionally also matching equi keys.
  *
  * Spark plans a raw `l.ts BETWEEN r.ts - u AND r.ts - l` predicate as a
  * broadcast-nested-loop or a sort-merge join whose range filter runs
  * AFTER the pairing — with no equi key that is O(|L|·|R|), and even with
  * one it degrades on hot keys. The scale-correct form BUCKETIZES time:
  *
  *   1. choose bucket width W = upper - lower + 1 (the window length, so
  *      any window spans at most two buckets);
  *   2. right rows land in bucket floor(rts / W) — one row, one bucket;
  *   3. each left row EXPLODES to the ≤ 2 candidate buckets its window
  *      `[lts+lower, lts+upper]` overlaps;
  *   4. equi-join on (keys…, bucket) — a plain shuffled hash join — then
  *      the exact range predicate prunes the candidates.
  *
  * Each true pair is produced exactly once (the right row's bucket is
  * unique), the join is a real equi-join (AQE-skewable, broadcastable),
  * and candidate inflation is bounded: ≤ 2× the left side plus the
  * false-positive fraction of the two-bucket span.
  *
  * This is the interval-join shape stream processors build natively
  * (e.g. Flink's IntervalJoinOperator buckets by key and time range);
  * Spark has no such operator, so we express it as relational algebra.
  */
object IntervalJoin {

  /** @param keys   equi-key column names present on BOTH sides ("" = none)
    * @param lower  window start offset, added to the left timestamp
    * @param upper  window end offset, inclusive; must be >= lower
    * @return left rows joined to matching right rows (inner); columns =
    *         left columns ++ right columns (caller aliases collisions away)
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   lower: Long, upper: Long): DataFrame = {
    require(upper >= lower, s"empty window: [$lower, $upper]")
    require(keys.forall(k => left.columns.contains(k) && right.columns.contains(k)),
      s"equi keys ${keys.mkString(", ")} must exist on both sides")
    val dup = left.columns.toSeq.diff(keys).intersect(right.columns.toSeq.diff(keys))
    require(dup.isEmpty,
      s"column collision between sides: ${dup.mkString(", ")} — alias first")

    val w = upper - lower + 1
    // integral `div`, NOT floating division: event times are ~1e18 ns/us and
    // a double mangles them above 2^53 (same pitfall as the hourly windows).
    // Truncating div == floor for the non-negative domain timestamps live in.
    val r = right.withColumn("__rb", expr(s"`$rightTs` div ${w}L"))
    val l = left
      .withColumn("__lo", col(leftTs) + lower)
      .withColumn("__hi", col(leftTs) + upper)
      .withColumn("__lb", explode(array_distinct(
        array(expr(s"__lo div ${w}L"), expr(s"__hi div ${w}L")))))

    // drop the right side's copy of each equi key (same value by the join)
    keys.foldLeft(
      l.join(r, keys.map(k => l(k) === r(k)).fold(col("__lb") === col("__rb"))(_ && _))
        .filter(col(rightTs).between(col("__lo"), col("__hi"))))(
      (df, k) => df.drop(r(k)))
      .drop("__lo", "__hi", "__lb", "__rb")
  }
}
