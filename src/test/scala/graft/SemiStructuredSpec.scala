package graft

import graft.sources.SemiStructured
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemiStructuredSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("parseJson extracts typed fields and nulls malformed rows") {
    val rows = Seq(
      (1L, """{"k": 42, "tag": "a"}"""),
      (2L, """{"k": 7}"""),
      (3L, """not json at all"""),
      (4L, """{"k": "not an int"}"""),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "js")
    val out = SemiStructured.parseJson(rows, "js", "k INT, tag STRING", as = "p")
      .select(col("id"), col("p.k"), col("p.tag"))
      .as[(Long, Option[Int], Option[String])].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Some(42), Some("a"))))
    assert(out(2L) == ((2L, Some(7), None)))
    assert(out(3L)._2.isEmpty && out(3L)._3.isEmpty)
    assert(out(4L)._2.isEmpty, "type-mismatched field parses to null")
    assert(out(5L)._2.isEmpty)
  }

  test("jsonField stays a narrow expression over the events table") {
    val ev = sf("events")
    val k = SemiStructured.jsonField(col("props"), "k INT", "k")
    val n = ev.filter(k.isNotNull).count()
    assert(n > 0 && n <= ev.count())
    val plan = ev.select(k.as("k")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), "extraction must not shuffle")
  }
}
