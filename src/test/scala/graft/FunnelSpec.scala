package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** First-touch funnel semantics: stage advancement windows are measured
  * from the timestamp that ADVANCED the user (not any later occurrence),
  * window boundaries are inclusive, and order matters. */
class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val H = 3600L // a 1-hour window in "seconds" units

  test("stage advancement: inclusive window, first-touch, order-sensitive") {
    val events = Seq(
      // u1: clean conversion inside both windows
      (1L, 0L, "signup"), (1L, 100L, "view"), (1L, 200L, "purchase"),
      // u2: view exactly at the window boundary (inclusive) — advances
      (2L, 0L, "signup"), (2L, H, "view"), (2L, H + H, "purchase"),
      // u3: view too late — no stage 2, and its purchase cannot count
      (3L, 0L, "signup"), (3L, H + 1, "view"), (3L, H + 2, "purchase"),
      // u4: purchase BEFORE the view — order matters, stalls at view
      (4L, 0L, "signup"), (4L, 50L, "purchase"), (4L, 100L, "view"),
      // u5: no signup at all — never enters the funnel
      (5L, 0L, "view"), (5L, 10L, "purchase"),
      // u6: first-touch — the SECOND view is in-window but the clock runs
      // from the FIRST qualifying view, so the late purchase misses
      (6L, 0L, "signup"), (6L, 10L, "view"), (6L, 3000L, "view"),
      (6L, 10L + H + 1, "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"), withinUs = H)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    graft.ops.Caches.release()
    assert(out == Seq(
      (0, "signup", 5L),   // u1, u2, u3, u4, u6
      (1, "view", 4L),     // u3 missed the window
      (2, "purchase", 2L), // u1, u2; u4 out of order; u6 first-touch clock
    ))
  }

  test("funnel counts are monotone non-increasing on the real event log") {
    val ev = sf("events").withColumn("us",
      unix_micros(col("ts").cast("timestamp")))
    val out = Funnel.funnel(ev, "user_id", "us", "event_type",
      Seq("signup", "view", "purchase"), withinUs = 3600000000L)
      .as[(Int, String, Long)].collect().sortBy(_._1).map(_._3).toSeq
    graft.ops.Caches.release()
    assert(out.size == 3 && out == out.sorted.reverse)
  }
}
