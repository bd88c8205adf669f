package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interchange formats (sources/Formats): JSONL/CSV/ORC round-trips must
  * be bit-exact — on the real corpus AND on hostile content (separators,
  * quotes, newlines, unicode) — and the hive-partitioned layout must show
  * plan-time directory pruning, not just a correct answer. */
class FormatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory(p)).toString

  private val ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING"

  test("jsonl / csv / orc round-trip the sf0.001 corpus bit-exactly") {
    val docs = sf("documents").select("doc_id", "text", "lang", "source")
    val want = docs.as[(Long, String, String, String)].collect().toSet
    assert(want.nonEmpty)

    val j = tmp("graft_fmt_j"); Formats.writeJsonl(docs, j, 4)
    assert(Formats.readJsonl(spark, j, ddl)
      .as[(Long, String, String, String)].collect().toSet == want)

    val c = tmp("graft_fmt_c"); Formats.writeCsv(docs, c, 4)
    assert(Formats.readCsv(spark, c, ddl)
      .as[(Long, String, String, String)].collect().toSet == want)

    val o = tmp("graft_fmt_o"); Formats.writeOrc(docs, o, 4)
    assert(Formats.readOrc(spark, o, ddl)
      .as[(Long, String, String, String)].collect().toSet == want)
  }

  test("jsonl and csv survive hostile text: separators, quotes, newlines, unicode") {
    val hostile = Seq(
      (1L, "a,b,\"c\" and ,,", "en", "s1"),
      (2L, "line1\nline2\r\nline3", "fr", "s2"),
      (3L, "tab\there; semi", "de", "s3"),
      (4L, "日本語のテキスト émigré €/±", "ja", "s4"),
      (5L, "  leading and trailing  ", "en", "s5"))
      .toDF("doc_id", "text", "lang", "source")
    val want = hostile.as[(Long, String, String, String)].collect().toSet

    val j = tmp("graft_fmt_hj"); Formats.writeJsonl(hostile, j, 2)
    assert(Formats.readJsonl(spark, j, ddl)
      .as[(Long, String, String, String)].collect().toSet == want)

    // quote-all write + multiLine read: embedded newlines/quotes survive
    val c = tmp("graft_fmt_hc"); Formats.writeCsv(hostile, c, 2)
    assert(Formats.readCsv(spark, c, ddl)
      .as[(Long, String, String, String)].collect().toSet == want)
  }

  test("partitionBy layout prunes directories at plan time") {
    val d = tmp("graft_fmt_part")
    Formats.writePartitioned(sf("events"), d, Seq("event_type"))

    val q = Formats.readPartitioned(spark, d)
      .filter(col("event_type") === "error")
    val plan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (plan-time directory
    // pruning), NOT as a post-scan row filter
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("(event_type"), "equality predicate must prune")

    // and the pruned read is still the right answer
    val want = sf("events").filter(col("event_type") === "error").count()
    assert(q.count() == want && want > 0)

    // partition column round-trips as a (string) column
    assert(q.select("event_type").distinct().as[String].collect().toSeq == Seq("error"))
  }
}
