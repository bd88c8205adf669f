package graft

import graft.ops.AsOfJoin
import graft.plans.AsOfJoinNative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-plan as-of join ([[AsOfJoinNative]]: logical node + strategy
  * + merge exec) must be semantically identical to the oracle-checked
  * union+window form ([[AsOfJoin]]) — on the fixtures, on randomized
  * corpora with key/ts collisions, under tolerance, and on self-joins. */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString()).sorted.toSeq

  test("physical plan contains the custom merge exec, no window, no union") {
    val ev = sf("events").withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("vus"), col("value").as("view_value"),
        col("event_id").as("vid"))
    val out = AsOfJoinNative.asOf(
      ev.select(col("event_id"), col("user_id"), col("us")), views,
      "user_id", "us", "vus", Seq("view_value"), tieBreak = Some("vid"))
    // string match: AdaptiveSparkPlanExec hides its subtree from
    // TreeNode.exists until the final plan materializes
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin "), s)
    assert(!s.contains("Window"), "window machinery must be gone")
    assert(!s.contains("Union"), "union padding must be gone")
    // each side shuffles only its own columns (the union form pads every
    // row with a null struct of the other side)
    assert(s.contains("Exchange hashpartitioning(user_id") &&
      s.contains("Exchange hashpartitioning(__rk"), s)
  }

  test("native as-of equals the union+window form on the events fixture") {
    val ev = sf("events").withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("vus"), col("value").as("view_value"),
        col("event_id").as("vid"))
    val l = ev.select(col("event_id"), col("user_id"), col("us"))
    val native = AsOfJoinNative.asOf(l, views, "user_id", "us", "vus",
      Seq("view_value"), tieBreak = Some("vid"))
    val algebraic = AsOfJoin.asOf(l, views, "user_id", "us", "vus",
      Seq("view_value"), tieBreak = Some("vid"))
    assert(canon(native) == canon(algebraic))
    assert(native.count() == l.count()) // left-outer cardinality
  }

  test("equivalence on randomized corpora with ties, tolerance, empty keys") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nl = 80 + rnd.nextInt(60)
      val nr = 60 + rnd.nextInt(60)
      // small key/ts domains force same-key same-ts collisions
      val left = (1 to nl).map(i =>
        (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(20).toLong))
        .toDF("lid", "k", "lts")
      val right = (1 to nr).map(i =>
        (i.toLong, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(20).toLong,
          rnd.nextInt(1000).toDouble))
        .toDF("rid", "k", "rts", "pay")
        .select(col("k"), col("rts"), col("pay"), col("rid"))
      for (tol <- Seq(None, Some(3L))) {
        val native = AsOfJoinNative.asOf(left, right, "k", "lts", "rts",
          Seq("pay"), tolerance = tol, tieBreak = Some("rid"))
        val algebraic = AsOfJoin.asOf(left, right, "k", "lts", "rts",
          Seq("pay"), tolerance = tol, tieBreak = Some("rid"))
        assert(canon(native) == canon(algebraic), s"trial $trial tol $tol")
      }
      // string keys drive the exec's generic-ordering path
      val lStr = left.withColumn("k", concat(lit("k"), col("k")))
      val rStr = right.withColumn("k", concat(lit("k"), col("k")))
      assert(canon(AsOfJoinNative.asOf(lStr, rStr, "k", "lts", "rts",
          Seq("pay"), tieBreak = Some("rid"))) ==
        canon(AsOfJoin.asOf(lStr, rStr, "k", "lts", "rts",
          Seq("pay"), tieBreak = Some("rid"))), s"trial $trial string keys")
    }
  }

  test("unmatched left rows carry nulls; tolerance nulls stale matches") {
    val left = Seq(
      (1L, 1L, 10L), // stale: 10 - 5 = 5 > tolerance 4 → nulled
      (2L, 2L, 10L), // no right rows for key 2
      (3L, 1L, 3L),  // right ts 5 > left ts 3: no backward match
      (4L, 1L, 7L),  // fresh: 7 - 5 = 2 ≤ 4 → matched
      (5L, 1L, 5L),  // inclusive boundary: rts == lts matches
    ).toDF("lid", "k", "lts")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rts", "pay")
    val out = AsOfJoinNative.asOf(left, right, "k", "lts", "rts", Seq("pay"),
      tolerance = Some(4L))
      .select("lid", "asof_ts", "pay").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, None, None),
      (2L, None, None),
      (3L, None, None),
      (4L, Some(5L), Some(1.0)),
      (5L, Some(5L), Some(1.0)),
    ))
    // and the algebraic form agrees row for row
    val algebraic = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pay"),
      tolerance = Some(4L))
      .select("lid", "asof_ts", "pay").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out == algebraic)
  }
}
