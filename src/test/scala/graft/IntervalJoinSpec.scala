package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketized interval join: inclusive bounds, exactly-once pairing across
  * bucket boundaries, equivalence with the naive range join, and the
  * equi-join plan shape. */
class IntervalJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val signups = Seq((1L, 100L, 10L), (2L, 100L, 95L), (3L, 200L, 10L))
    .toDF("sid", "uid", "sts")
  private val errors = Seq(
    (100L, 12L, "a"), (100L, 20L, "b"), (100L, 21L, "c"),   // uid 100
    (100L, 95L, "d"), (100L, 104L, "e"), (100L, 106L, "f"),
    (200L, 15L, "g"), (999L, 11L, "h")).toDF("uid2", "ets", "tag")
    .withColumnRenamed("uid2", "uid")

  private def got(lower: Long, upper: Long) =
    IntervalJoin.intervalJoin(signups, errors, Seq("uid"),
      "sts", "ets", lower, upper)
      .select("sid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("inclusive window [ts, ts+10] with per-key matching") {
    assert(got(0L, 10L) == Set(
      (1L, "a"), (1L, "b"),          // 12, 20 in [10,20]; 21 out
      (2L, "d"), (2L, "e"),          // 95, 104 in [95,105]; 106 out
      (3L, "g")))                    // uid 200; uid 999 never matches
  }

  test("negative lower bound looks backward") {
    // sid 1: [8,12] hits ets 12; sid 2: [93,97] hits ets 95
    assert(got(-2L, 2L) == Set((1L, "a"), (2L, "d")))
  }

  test("pairs spanning a bucket boundary appear exactly once") {
    val out = IntervalJoin.intervalJoin(signups, errors, Seq("uid"),
      "sts", "ets", 0L, 10L).select("sid", "tag").collect()
    assert(out.length == out.distinct.length)
  }

  test("equals the naive range join on random data") {
    val l = spark.range(200).select(col("id").as("lid"),
      pmod(hash(col("id")), lit(5)).cast("long").as("k"),
      pmod(hash(col("id") * 7), lit(1000)).cast("long").as("lts"))
    val r = spark.range(300).select(col("id").as("rid"),
      pmod(hash(col("id") + 13), lit(5)).cast("long").as("k"),
      pmod(hash(col("id") * 3 + 1), lit(1000)).cast("long").as("rts"))
    val naive = l.join(r.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("rts").between(col("lts") - 7, col("lts") + 31))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketized = IntervalJoin.intervalJoin(l, r, Seq("k"), "lts", "rts", -7L, 31L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketized == naive && naive.nonEmpty)
  }

  test("plan is an equi join, not a nested-loop or cartesian product") {
    val plan = IntervalJoin.intervalJoin(signups, errors, Seq("uid"),
      "sts", "ets", 0L, 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("rejects colliding column names") {
    intercept[IllegalArgumentException] {
      IntervalJoin.intervalJoin(signups, signups, Seq("uid"), "sts", "sts", 0L, 1L)
    }
  }
}
