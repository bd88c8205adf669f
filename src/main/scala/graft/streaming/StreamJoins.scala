package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM joins — both sides unbounded, neither fits anywhere: the
  * join must buffer candidate rows in the state store and evict them once
  * the watermark proves no future match can arrive. Spark's stream-stream
  * inner join supports exactly this when both sides carry watermarks and
  * the join condition bounds event-time distance; state per side is then
  * O(rows within the watermark+window horizon), independent of stream
  * length — the only formulation of a two-sided join that survives an
  * unbounded 100 TB feed.
  *
  * The reference joins by re-fetching current state per notification
  * (SURVEY §3.1) — no event-time pairing exists there; this is the
  * Spark-native extension, the streaming analog of
  * [[graft.ops.IntervalJoin]].
  */
object StreamJoins {

  /** Inner-join two event frames as REAL file streams: right rows pair
    * with left rows of the same `key` whose event time satisfies
    * `rightTs ∈ [leftTs, leftTs + window]` (inclusive — the batch
    * interval-join semantics). Both sides are staged to disk, replayed
    * through `readStream`, joined with per-side watermarks, and drained
    * append-mode; the result equals the batch join exactly.
    *
    * Column names across the two sides must be disjoint apart from `key`
    * (the right copy is dropped). Timestamp columns are long microseconds.
    *
    * `stage = false` skips writing the input files — the caller staged
    * identical frames into the dirs earlier (several joins over the same
    * feeds then share one staged copy; the per-call cost is the real
    * stream-stream state-store work, not re-staging fixtures).
    */
  def intervalJoinDrained(left: DataFrame, right: DataFrame, key: String,
                          leftTs: String, rightTs: String, window: String,
                          watermarkDelay: String,
                          leftDir: String, rightDir: String,
                          stage: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    if (stage) {
      StatefulSessions.stageOrderedFiles(spark, Paths.get(leftDir), left, Seq.empty)
      StatefulSessions.stageOrderedFiles(spark, Paths.get(rightDir), right, Seq.empty)
    }

    graft.core.BatchConf.withBatchTuning(spark) {
      val l = spark.readStream.schema(left.schema)
        .option("pathGlobFilter", "*.parquet").parquet(leftDir)
        .withColumn("__lt", expr(s"timestamp_micros(`$leftTs`)"))
        .withWatermark("__lt", watermarkDelay)
      val r = spark.readStream.schema(right.schema)
        .option("pathGlobFilter", "*.parquet").parquet(rightDir)
        .withColumnRenamed(key, "__rk")
        .withColumn("__rt", expr(s"timestamp_micros(`$rightTs`)"))
        .withWatermark("__rt", watermarkDelay)

      val joined = l.join(r,
        col(key) === col("__rk") &&
          col("__rt") >= col("__lt") &&
          col("__rt") <= col("__lt") + expr(s"INTERVAL $window"))
        .drop("__rk", "__lt", "__rt")
      StatefulSessions.drainAppendToFrame(joined, "stream_join")
    }
  }

  /** LEFT-OUTER stream-stream interval join: matches emit like the inner
    * join; an UNMATCHED left row emits null-extended only once the
    * watermark proves no matching right row can still arrive (the state
    * store evicts it). Under an AvailableNow drain the final watermark is
    * `min(max leftTs, max rightTs) − delay`, so unmatched rows whose
    * window is still open at stream end stay buffered and do NOT emit —
    * exactly the durable semantics a resumed stream needs (they emit when
    * later data advances the watermark). The drained frame is therefore
    * the inner matches plus null rows for lefts whose window closed under
    * the final watermark — a deterministic, oracle-checkable set. */
  def intervalJoinLeftOuterDrained(left: DataFrame, right: DataFrame, key: String,
                                   leftTs: String, rightTs: String, window: String,
                                   watermarkDelay: String,
                                   leftDir: String, rightDir: String,
                                   stage: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    if (stage) {
      StatefulSessions.stageOrderedFiles(spark, Paths.get(leftDir), left, Seq.empty)
      StatefulSessions.stageOrderedFiles(spark, Paths.get(rightDir), right, Seq.empty)
    }

    graft.core.BatchConf.withBatchTuning(spark) {
      val l = spark.readStream.schema(left.schema)
        .option("pathGlobFilter", "*.parquet").parquet(leftDir)
        .withColumn("__lt", expr(s"timestamp_micros(`$leftTs`)"))
        .withWatermark("__lt", watermarkDelay)
      val r = spark.readStream.schema(right.schema)
        .option("pathGlobFilter", "*.parquet").parquet(rightDir)
        .withColumnRenamed(key, "__rk")
        .withColumn("__rt", expr(s"timestamp_micros(`$rightTs`)"))
        .withWatermark("__rt", watermarkDelay)

      val joined = l.join(r,
        col(key) === col("__rk") &&
          col("__rt") >= col("__lt") &&
          col("__rt") <= col("__lt") + expr(s"INTERVAL $window"),
        "left_outer")
        .drop("__rk", "__lt", "__rt")
      StatefulSessions.drainAppendToFrame(joined, "stream_left_join")
    }
  }
}
