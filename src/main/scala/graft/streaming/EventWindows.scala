package graft.streaming

import graft.incr.BucketedStateStore
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /** Upsert one UPDATE-mode micro-batch of an aggregation into the durable
    * bucketed store: read only the buckets the batch's keys hash into,
    * replace those keys' rows, publish in one atomic manifest swap under
    * `batchId`. Exactly-once is scoped PER TABLE via a progress marker
    * committed in the same swap as the data — the store-global committed
    * pointer would falsely skip a second query's batches (its ids restart
    * at 0) when several tables share one store. A replayed id for THIS
    * table is a no-op; a fresh table always applies. Key column `__k` is
    * derived from `keyExpr` and travels with the stored rows. */
  /** Integer EWMA smoothing + spike counting over per-key time series:
    * s_t = (s_{t-1} + x_t) div 2 (half-life-one-step exponential
    * smoother in pure integer halving), spikes where x_t > 4·s_{t-1}
    * (and s_{t-1} > 0 so the first bucket never self-flags). Sequential
    * state cannot be a window sum, so the fold runs IN-ROW over each
    * key's collected series — bounded by the retention window, not
    * corpus size — with (smoothed, spikes) bit-packed into one long
    * (smoothed < 2^43 headroom, spikes < 2^20), which is the exact fold
    * an external engine replays with list_reduce. Input: (keyCol,
    * ordCol, cntCol) rows; output: (keyCol, n_buckets, ewma_final,
    * n_spikes). */
  def ewmaSpikes(buckets: DataFrame, keyCol: String, ordCol: String,
                 cntCol: String): DataFrame = {
    val mask = (1L << 20) - 1
    val series = buckets.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(ordCol), col(cntCol))))
        .as("__xs"))
    val folded = aggregate(
      transform(col("__xs"), x => x.getField(cntCol)),
      lit(0L),
      (acc, x) => {
        val sPrev = shiftright(acc, 20)
        val spikes = acc.bitwiseAND(lit(mask))
        val sNew = shiftright(sPrev + x, 1)
        val spiked = when(sPrev > 0 && x > sPrev * 4, 1L).otherwise(0L)
        shiftleft(sNew, 20) + spikes + spiked
      })
    // packing invariant enforced, not assumed: smoothed ≤ max(x) by the
    // halving recurrence and spikes ≤ n_buckets, so guarding the inputs
    // (max bucket count < 2^43, series length < 2^20) guards both fields;
    // overflow would corrupt Spark and any external replay IDENTICALLY, so
    // the oracle gate could never catch it — fail loud here instead
    val maxCnt = coalesce(
      array_max(transform(col("__xs"), x => x.getField(cntCol))), lit(0L))
    val nBuckets = size(col("__xs")).cast("long")
    val guarded = when(
      nBuckets >= lit(1L << 20) || maxCnt >= lit(1L << 43),
      raise_error(format_string(
        "ewmaSpikes packing overflow: n_buckets=%d max_cnt=%d " +
          "(limits 2^20 buckets, 2^43 per-bucket count)",
        nBuckets, maxCnt)).cast("long")
    ).otherwise(folded)
    series.select(col(keyCol),
      nBuckets.as("n_buckets"),
      shiftright(guarded, 20).as("ewma_final"),
      guarded.bitwiseAND(lit(mask)).as("n_spikes"))
  }

  def upsertBatch(store: BucketedStateStore, table: String, keyExpr: Column,
                  batch: Dataset[Row], batchId: Long): Unit = {
    val progressKey = s"drain.$table"
    if (store.meta(progressKey).map(_.toLong).exists(_ >= batchId)) return
    val spark = batch.sparkSession
    graft.core.BatchConf.withBatchTuning(spark) {
      val rows = batch.withColumn("__k", keyExpr).localCheckpoint(true)
      if (!rows.isEmpty) {
        val touched = rows.select(store.bucketOf(col("__k")).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val merged =
          if (store.tableNames.contains(table)) {
            // changed keys replace their old aggregate row; untouched
            // BUCKETS never leave the manifest, untouched keys inside
            // touched buckets carry over via the anti-join
            store.readBuckets(spark, table, touched)
              .join(rows.select(col("__k")), Seq("__k"), "left_anti")
              .unionByName(rows)
          } else rows
        store.stageBuckets(table, touched, merged, batchId, "__k")
      }
      store.setMeta(progressKey, batchId.toString)
      store.commit(batchId)
    }
  }

  /** Drain a watermarked streaming aggregation into the bucketed store in
    * UPDATE output mode — the production sink shape: each micro-batch
    * carries only the keys whose aggregate changed, per-batch IO tracks
    * that changed key set, and the result lives durably in the store
    * instead of accumulating in driver memory the way a complete-mode
    * memory sink does. Blocks until the AvailableNow drain finishes. */
  def drainToStore(agg: DataFrame, store: BucketedStateStore, table: String,
                   keyExpr: Column): Unit = {
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch { (ds: Dataset[Row], id: Long) =>
        upsertBatch(store, table, keyExpr, ds, id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The stored table without the derived key column. */
  def storedTable(spark: SparkSession, store: BucketedStateStore,
                  table: String): DataFrame =
    store.table(spark, table).drop("__k")
}
