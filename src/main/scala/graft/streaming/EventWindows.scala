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

  /** ns-since-epoch long → event-time timestamp column. */
  def eventTime(tsNs: Column): Column =
    timestamp_micros((tsNs / lit(1000L)).cast("long"))

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
      .withColumn("__et", eventTime(col(tsCol)))
      .withWatermark("__et", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("__et"), window).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
}
