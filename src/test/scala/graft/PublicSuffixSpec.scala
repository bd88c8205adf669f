package graft

import graft.text.PublicSuffix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** eTLD+1 resolution over the pinned suffix table: multi-label rules,
  * the PSL default rule, platform registries, and degenerate hosts. */
class PublicSuffixSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def reg(hosts: String*): Seq[String] =
    hosts.toDF("h").select(PublicSuffix.registrableDomain(col("h")))
      .as[String].collect().toSeq

  test("multi-label suffixes take three labels; subdomains roll up") {
    assert(reg("blog.example.co.uk", "www.example.co.uk", "example.co.uk")
      == Seq("example.co.uk", "example.co.uk", "example.co.uk"))
    assert(reg("a.b.deep.site.com.au") == Seq("site.com.au"))
    assert(reg("user.github.io", "www.user.github.io")
      == Seq("user.github.io", "user.github.io"))
  }

  test("single-label and unknown TLDs take two labels (default rule)") {
    assert(reg("www.example.com", "example.com", "cdn.assets.site0.net")
      == Seq("example.com", "example.com", "site0.net"))
    assert(reg("host.unknowntld") == Seq("host.unknowntld"))
    assert(reg("a.b.c.weirdzone") == Seq("c.weirdzone"))
  }

  test("short hosts pass through") {
    assert(reg("localhost", "com", "co.uk")
      == Seq("localhost", "com", "co.uk"))
  }

  test("the oracle replay uses the identical table") {
    // the SQL literal must carry every rule, in the pinned order
    val lit = PublicSuffix.sqlListLiteral
    assert(PublicSuffix.MultiLabel.forall(s => lit.contains(s"'$s'")))
    assert(lit.count(_ == ',') == PublicSuffix.MultiLabel.size - 1)
  }
}
