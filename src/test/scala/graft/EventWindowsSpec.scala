package graft

import graft.streaming.EventWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked windowed aggregation: append-mode finalization, late-data
  * drop, and batch/stream parity. */
class EventWindowsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val H = 3600L * 1000000000L // 1 hour in ns

  test("ewmaSpikes: truncated-halving recurrence and spike rule, hand-checked") {
    // series A: 8, 4, 100, 2 → s: 0→4→4→52→27; spike at 100 (100 > 4·4);
    // 8 never self-flags (s_prev = 0); 2 is not > 4·52
    // series B: single bucket → s = x div 2, no spikes
    val rows = Seq(
      ("A", 1L, 8L), ("A", 2L, 4L), ("A", 3L, 100L), ("A", 4L, 2L),
      ("B", 9L, 7L)).toDF("k", "o", "c")
    val out = EventWindows.ewmaSpikes(rows, "k", "o", "c")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 4L, 27L, 1L)))
    assert(out("B") == (("B", 1L, 3L, 0L)))
    // order comes from the ord column, not input order
    val shuffled = EventWindows.ewmaSpikes(rows.orderBy(rand(7)), "k", "o", "c")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(shuffled == out)
  }

  test("windows finalize after the watermark passes; late events are dropped") {
    val mem = MemoryStream[(Long, String, Double)](spark)
    val agg = EventWindows.typedWindowAgg(
      mem.toDF().toDF("ts", "event_type", "value"),
      "ts", watermark = "30 minutes", window = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()

    // hour-0 events, then an hour-2 event that advances the watermark past
    // the end of hour 0 → hour-0 window finalizes
    mem.addData((1L * H / 4, "click", 1.0), (2L * H / 4, "click", 2.0))
    q.processAllAvailable()
    mem.addData((2L * H + H / 4, "click", 7.0))
    q.processAllAvailable()
    // a late hour-0 event beyond the watermark must be dropped
    mem.addData((3L * H / 4, "click", 100.0))
    q.processAllAvailable()
    mem.addData((4L * H, "view", 1.0)) // advance further: nothing re-emits for hour 0
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .select(unix_timestamp(col("window_start")).as("start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    // hour-0 window emitted once, WITHOUT the late 100.0 event
    assert(out.contains((0L, "click", 2L, 3.0)))
    assert(!out.exists { case (s, t, _, v) => s == 0L && t == "click" && v != 3.0 })
  }

  test("session windows run STREAMING: sessions finalize once the gap passes the watermark") {
    val M = 60L * 1000 * 1000 * 1000 // one minute in ns
    val mem = MemoryStream[(Long, Long, String, Double)](spark)
    val agg = EventWindows.sessionAgg(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"),
      "ts", "user_id", gap = "10 minutes", watermark = Some("10 minutes"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    // two events 5min apart -> one open session for user 1
    mem.addData((0L, 1L, "e", 1.0), (5L * M, 1L, "e", 2.0))
    q.processAllAvailable()
    // an event far later advances the watermark past the session's gap:
    // the first session finalizes and emits exactly once
    mem.addData((60L * M, 1L, "e", 4.0))
    q.processAllAvailable()
    mem.addData((120L * M, 1L, "e", 8.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out")
      .select(col("user_id"), col("session_start_us"), col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 0L, 2L, 3.0)),
      s"first session must finalize once the watermark passes its gap: $out")
    assert(out.contains((1L, 60L * M / 1000, 1L, 4.0)))
    spark.catalog.dropTempView("sess_out")
  }

  test("session windows merge within the gap and split at exactly the gap") {
    val M = 60L * 1000 * 1000 * 1000 // one minute in ns
    val U = 1000L // one µs in ns
    val rows = Seq(
      // user 1: events at 0, +9min, +18min, +28min — ONE session: the
      // 28min event lands exactly at the gap boundary, and Spark merges
      // touching session windows (inclusive gap)
      (0L, 1L, 1.0), (9L * M, 1L, 2.0), (18L * M, 1L, 4.0), (28L * M, 1L, 8.0),
      // user 1: one µs BEYOND the gap after 28min — new session
      (38L * M + U, 1L, 32.0),
      // user 2: single event
      (5L * M, 2L, 16.0)
    ).map { case (ts, u, v) => (ts, u, "e", v) }.toDF("ts", "user_id", "event_type", "value")
    val out = EventWindows.sessionAgg(rows, "ts", "user_id", gap = "10 minutes")
      .select(col("user_id"), col("session_start_us"), col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 0L, 4L, 15.0),
      (1L, (38L * M + U) / 1000, 1L, 32.0),
      (2L, 5L * M / 1000, 1L, 16.0)))
  }

  test("same operator runs in batch mode (backfill parity)") {
    val batch = Seq(
      (1L * H / 4, "click", 1.0), (2L * H / 4, "click", 2.0),
      (2L * H + H / 4, "view", 7.0)
    ).toDF("ts", "event_type", "value")
    val out = EventWindows.typedWindowAgg(batch, "ts", "30 minutes", "1 hour")
      .select(unix_timestamp(col("window_start")).as("s"), col("event_type"),
        col("cnt"), col("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(out == Set((0L, "click", 2L, 3.0), (2 * 3600L, "view", 1L, 7.0)))
  }

  test("update-mode drain upserts into the bucketed store across micro-batches") {
    val mem = MemoryStream[(Long, String, Double)](spark)
    val agg = EventWindows.typedWindowAgg(
      mem.toDF().toDF("ts", "event_type", "value"),
      "ts", watermark = "2 hours", window = "1 hour")
    val store = new graft.incr.BucketedStateStore(
      java.nio.file.Files.createTempDirectory("graft_upsert_spec").toString,
      numBuckets = 4)
    val key = concat_ws("|",
      unix_timestamp(col("window_start")).cast("string"), col("event_type"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        EventWindows.upsertBatch(store, "hourly", key, ds, id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()

    def stored(): Set[(Long, String, Long, Double)] =
      EventWindows.storedTable(spark, store, "hourly")
        .select(unix_timestamp(col("window_start")).as("start"), col("event_type"),
          col("cnt"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet

    // batch 1: two hour-0 clicks
    mem.addData((1L * H / 4, "click", 1.0), (2L * H / 4, "click", 2.0))
    q.processAllAvailable()
    assert(stored() == Set((0L, "click", 2L, 3.0)))

    // batch 2: an UPDATE to hour-0 click (same key — the aggregate moves,
    // not appends) plus a brand-new hour-1 view key
    mem.addData((3L * H / 4, "click", 4.0), (H + H / 4, "view", 7.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    assert(stored() == Set((0L, "click", 3L, 7.0), (3600L, "view", 1L, 7.0)),
      "updated key must replace its row; untouched keys carry over")

    // replaying an already-committed batch id is a no-op (exactly-once)
    val before = store.committedBatch
    val replay = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      EventWindows.storedTable(spark, store, "hourly").drop("__k").schema)
    EventWindows.upsertBatch(store, "hourly", key, replay, before.get)
    assert(stored() == Set((0L, "click", 3L, 7.0), (3600L, "view", 1L, 7.0)))

    // a SECOND query draining another table into the same store restarts
    // its batch ids at 0 — the per-table progress marker must not skip it
    val fresh = Seq((0L, "x", 1L, 2.0)).toDF("start", "event_type", "cnt", "sum_value")
      .select(expr("timestamp_seconds(start)").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
    EventWindows.upsertBatch(store, "hourly2",
      concat_ws("|", unix_timestamp(col("window_start")).cast("string"),
        col("event_type")), fresh, batchId = 0L)
    assert(EventWindows.storedTable(spark, store, "hourly2").count() == 1,
      "a new table's first drain batch must apply despite the global pointer")
    // and a replay of that same (table, batch) is still a no-op
    EventWindows.upsertBatch(store, "hourly2",
      concat_ws("|", unix_timestamp(col("window_start")).cast("string"),
        col("event_type")), fresh, batchId = 0L)
    assert(EventWindows.storedTable(spark, store, "hourly2").count() == 1)
  }
}
