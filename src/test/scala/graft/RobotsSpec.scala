package graft

import graft.text.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 core semantics of the robots gate: parse shape, the
  * most-specific-rule rank (longest prefix, Allow wins ties), default
  * allow, and the broadcast-join evaluation plan. */
class RobotsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val robots = Seq(
    ("a.com",
      "User-agent: *\n# comment\nDisallow: /x/\nALLOW: /x/ok/\n" +
        "disallow:   /y\nDisallow: /wild/*\nAllow: /end$\nDisallow:\n"),
    ("b.com", "User-agent: *\nAllow: /x/\nDisallow: /x/\n")
  ).toDF("host", "robots_txt")

  test("parse: case-insensitive directives, wildcards and empties drop") {
    val rules = Robots.parseRules(robots).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rules == Set(
      ("a.com", "/x/", false), ("a.com", "/x/ok/", true),
      ("a.com", "/y", false),
      ("b.com", "/x/", true), ("b.com", "/x/", false)))
  }

  test("longest match wins; Allow wins equal-length ties; default allow") {
    val urls = Seq(
      (1L, "https://a.com/x/private"),   // /x/ disallow
      (2L, "https://a.com/x/ok/file"),   // /x/ok/ allow beats /x/
      (3L, "https://a.com/yes"),         // /y prefix-matches /yes: disallow
      (4L, "https://a.com/free"),        // no rule: default allow
      (5L, "https://b.com/x/tie"),       // equal length: Allow wins
      (6L, "https://c.com/x/anything")   // unknown host: default allow
    ).toDF("doc_id", "url")
    val got = Robots.filterUrls(urls, robots)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(got(1L) == ((false, Some("/x/"))))
    assert(got(2L) == ((true, Some("/x/ok/"))))
    assert(got(3L) == ((false, Some("/y"))))
    assert(got(4L) == ((true, None)))
    assert(got(5L) == ((true, Some("/x/"))))
    assert(got(6L) == ((true, None)))
  }

  test("evaluation joins with a broadcast, never shuffling the URL side") {
    val urls = Seq((1L, "https://a.com/x/p")).toDF("doc_id", "url")
    val plan = Robots.filterUrls(urls, robots)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
