package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backward as-of join: inclusive matching, tolerance horizon, tie
  * breaking, equivalence with the naive range-join formulation, and the
  * single-exchange plan shape. */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "qts", "px")
  private val trades = Seq(
    ("A", 9L), ("A", 10L), ("A", 25L), ("A", 31L),
    ("B", 14L), ("B", 99L), ("C", 50L)).toDF("sym", "tts")

  private def got(tol: Option[Long] = None) =
    AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"), tol)
      .select("sym", "tts", "asof_ts", "px").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

  test("backward inclusive match with nulls before first quote") {
    assert(got() == Set(
      ("A", 9L, None, None),                // before any quote
      ("A", 10L, Some(10L), Some(1.0)),     // equal ts matches (inclusive)
      ("A", 25L, Some(20L), Some(2.0)),
      ("A", 31L, Some(30L), Some(3.0)),
      ("B", 14L, None, None),
      ("B", 99L, Some(15L), Some(9.0)),
      ("C", 50L, None, None)))              // key absent from right
  }

  test("tolerance nulls out stale matches") {
    val t = got(tol = Some(10L))
    assert(t.contains(("B", 99L, None, None)))      // 84 ticks stale
    assert(t.contains(("A", 25L, Some(20L), Some(2.0)))) // 5 ticks: kept
  }

  test("equals the naive range-join + argmax formulation") {
    val naive = trades.as("l").join(quotes.as("r"),
        col("l.sym") === col("r.sym") && col("l.tts") >= col("r.qts"), "left")
      .groupBy(col("l.sym").as("sym"), col("l.tts").as("tts"))
      .agg(max_by(struct(col("r.qts"), col("r.px")), col("r.qts")).as("m"))
      .select(col("sym"), col("tts"), col("m.qts").as("asof_ts"), col("m.px").as("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(got() == naive)
  }

  test("equals the naive formulation on hash-random data") {
    val l = spark.range(300).select(col("id").as("lid"),
      pmod(hash(col("id")), lit(7)).cast("long").as("k"),
      pmod(hash(col("id") * 5), lit(500)).cast("long").as("lts"))
    val r = spark.range(200).select(col("id").as("rid"),
      pmod(hash(col("id") + 3), lit(7)).cast("long").as("k"),
      pmod(hash(col("id") * 11 + 1), lit(500)).cast("long").as("rts"),
      (col("id") % 97).cast("double").as("px"))
    // ties on (k, rts) are possible in hashed data — pin them with rid
    val mine = AsOfJoin.asOf(l, r.withColumnRenamed("k", "k"), "k",
        "lts", "rts", Seq("px"), tieBreak = Some("rid"))
      .select("lid", "asof_ts", "px").collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    val naive = l.join(r, l("k") === r("k") && col("lts") >= col("rts"), "left")
      .groupBy(col("lid"))
      .agg(max_by(struct(col("rts"), col("rid"), col("px")),
        struct(col("rts"), col("rid"))).as("m"))
      .select(col("lid"), col("m.rts").as("asof_ts"), col("m.px").as("px"))
      .collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(mine == naive && mine.exists(_._2.isDefined))
  }

  test("equal-ts right ties resolve to the greatest tieBreak value") {
    val dupQuotes = Seq(("A", 10L, 1.0, 1L), ("A", 10L, 7.0, 2L))
      .toDF("sym", "qts", "px", "qid")
    val r = AsOfJoin.asOf(Seq(("A", 11L)).toDF("sym", "tts"), dupQuotes,
      "sym", "tts", "qts", Seq("px"), tieBreak = Some("qid"))
    assert(r.select("px").as[Double].head() == 7.0)
  }

  test("plan has exactly one exchange — no join explosion") {
    val plan = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("hashpartitioning".r.findAllIn(plan).size >= 1)
    assert(!plan.contains("SortMergeJoin"))
  }
}
