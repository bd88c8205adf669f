package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming event analytics: watermarked tumbling-window
  * aggregation over an event stream.
  *
  * The reference has no event-time semantics (late data is handled by
  * re-fetching current state, SURVEY §1.3); this is the Spark-native
  * extension for the `events` stream table: `readStream` → watermark →
  * `window()` group → append-mode sink. Late events beyond the watermark
  * are dropped and windows finalize exactly once — state store size stays
  * bounded by (watermark / window) × keys regardless of stream length,
  * which is what makes the operator viable on an unbounded 100 TB feed.
  *
  * Works identically on batch DataFrames (watermark is a no-op there), so
  * the same code serves the backfill and the live path.
  */
object EventWindows {

  /** Attach an exact event-time column `__et` from the long-ns `tsCol`.
    * MUST be integral `div`: `/` on longs goes through DOUBLE, and ~1.7e18
    * ns exceeds a double's 53 significand bits — FP division lands ±1 µs
    * off the true microsecond (observed against the integer oracle). */
  private def withEventTime(events: DataFrame, tsCol: String): DataFrame =
    events.withColumn("__ns", col(tsCol))
      .withColumn("__et", expr("timestamp_micros(__ns div 1000)"))
      .drop("__ns")

  /** Gap-based SESSION windows per key: a session extends while the next
    * event arrives within `gap` of the latest event INCLUSIVE (Spark merges
    * touching session windows, so an event exactly `gap` later still joins;
    * only a strictly larger silence opens a new session). Works on batch frames and on
    * streams (pass a watermark there — Spark's session-window state then
    * finalizes and evicts sessions whose gap has passed the watermark).
    * Output: (key, session_start_us, n_events, sum_value). */
  def sessionAgg(events: DataFrame, tsCol: String, keyCol: String,
                 gap: String, watermark: Option[String] = None): DataFrame = {
    val et = withEventTime(events, tsCol)
    val wm = watermark.map(et.withWatermark("__et", _)).getOrElse(et)
    wm.groupBy(col(keyCol), session_window(col("__et"), gap).as("sess"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(keyCol), unix_micros(col("sess.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
  }

  /** Tumbling-window counts + sums per event type.
    *
    * @param events    streaming or batch frame with `tsCol` (long ns) and
    *                  `event_type`, `value` columns
    * @param watermark max lateness, e.g. "2 hours"
    * @param window    tumbling window width, e.g. "1 hour"
    */
  def typedWindowAgg(events: DataFrame, tsCol: String,
                     watermark: String, window: String): DataFrame =
    events
      .transform(withEventTime(_, tsCol))
      .withWatermark("__et", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("__et"), window).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
}
