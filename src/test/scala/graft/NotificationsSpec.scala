package graft

import graft.incr.{Change, FailedChange, Notifications, RetryLedger}
import org.scalatest.funsuite.AnyFunSuite

/** The notification queue as a queryable frame (listeners.py:37-40,
  * tests/test_notifications.py:19-77): rows mirror the ledger's pending
  * retries (with backoff-gate timestamps) and dead letters, and the
  * published gate is exactly the instant [[RetryLedger.due]] opens. */
class NotificationsSpec extends AnyFunSuite with SparkTestBase {

  private def chg(seq: Long, kind: String = Change.Updated) =
    Change(seq, kind, "docs", s"id$seq")

  test("frame lists pending retries with gates and dead letters with null bookkeeping") {
    val led = new RetryLedger(maxRetries = 2)
    val all = Seq(chg(1, Change.Created), chg(2), chg(3, Change.Deleted))
    // batch 1 at t=100: 1 succeeds, 2 and 3 fail -> pending retries=0
    led.record(all, all.filter(_.seq >= 2), Nil, now = 100L)
    // batch 2 at t=500 (gates open at 350): 2 succeeds, 3 fails again
    val due = led.due(500L)
    assert(due.map(_.change.seq).sorted == Seq(2L, 3L))
    led.record(due.map(_.change), due.map(_.change).filter(_.seq == 3), due, 500L)

    val rows = Notifications.frame(spark, led.pending, led.deadLetters)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(rows == Set(("pending", 3L, "deleted", "docs", "id3")))

    val p = Notifications.frame(spark, led.pending, led.deadLetters)
      .filter("state = 'pending'").collect().head
    assert(p.getInt(5) == 1)        // one retry burned
    assert(p.getLong(6) == 100L)    // first failure timestamp is kept
    assert(p.getLong(7) == 1600L)   // gate = first + backoff(1) = 100 + 1500

    // the published gate IS due()'s boundary
    assert(led.due(1599L).isEmpty)
    assert(led.due(1600L).map(_.change.seq) == Seq(3L))

    // batch 3 at t=1600: the due retry fails -> exhausts maxRetries, dead
    val due3 = led.due(1600L)
    led.record(due3.map(_.change), due3.map(_.change), due3, 1600L)
    val d = Notifications.frame(spark, led.pending, led.deadLetters).collect()
    assert(d.length == 1)
    assert(d.head.getString(0) == "dead")
    assert(d.head.getLong(1) == 3L)
    assert(d.head.isNullAt(5) && d.head.isNullAt(6) && d.head.isNullAt(7))
  }

  test("frame survives a ledger persistence round-trip") {
    val led = new RetryLedger(maxRetries = 3)
    val cs = Seq(chg(10), chg(11, Change.Created))
    led.record(cs, cs, Nil, now = 42L)
    val restored = RetryLedger.restore(3, led.serialize)
    val a = Notifications.frame(spark, led.pending, led.deadLetters)
      .collect().map(_.toSeq).toSet
    val b = Notifications.frame(spark, restored.pending, restored.deadLetters)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 2)
  }

  test("gate arithmetic for a fresh failure uses backoff(0)") {
    val f = FailedChange(chg(7), retries = 0, firstFailedAtMs = 900L)
    val row = Notifications.frame(spark, Seq(f), Nil).collect().head
    assert(row.getLong(7) == 1150L) // 900 + backoff(0) = 250
  }
}
