package graft

import graft.ops.{QvarnSearch, QvarnUrl}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The URL-path and Django-keyword search front ends (vendor
  * list_resource.py:196-262, clients/qvarn.py:211-273) parsed onto the
  * QvarnSearch combinators. */
class QvarnUrlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val people = Seq(
    ("p1", "Alice", 30, true, "green/blue"),
    ("p2", "BOB", 25, false, "red"),
    ("p3", "bob", 40, true, "Green")
  ).toDF("id", "name", "age", "active", "color")

  // ---- token decoding -----------------------------------------------------

  test("unquote decodes percent escapes, leaves '+' and malformed escapes alone") {
    assert(QvarnUrl.unquote("Brand%2313") == "Brand#13")
    assert(QvarnUrl.unquote("a%2Fb") == "a/b")
    assert(QvarnUrl.unquote("a+b") == "a+b") // path convention, not query-string
    assert(QvarnUrl.unquote("100%") == "100%")
    assert(QvarnUrl.unquote("%zz") == "%zz")
    assert(QvarnUrl.unquote("%C3%A4iti") == "äiti") // multi-byte UTF-8 run
    assert(QvarnUrl.unquote("snow☃%21") == "snow☃!")
  }

  // ---- URL path form ------------------------------------------------------

  test("full resource path and bare criteria both parse; default is ids-only") {
    val a = QvarnUrl.urlSearch(people, "/people/search/exact/name/bob")
    val b = QvarnUrl.urlSearch(people, "exact/name/bob")
    assert(a.columns.toSeq == Seq("id"))
    assert(a.as[String].collect().sorted.toSeq == Seq("p2", "p3"))
    assert(b.as[String].collect().sorted.toSeq == Seq("p2", "p3"))
  }

  test("slash inside a percent-encoded value survives the split") {
    val ids = QvarnUrl.urlSearch(people, "/search/exact/color/green%2Fblue")
    assert(ids.as[String].collect().toSeq == Seq("p1"))
  }

  test("typed coercion: int columns compare numerically, bools parse") {
    // '9' < '10' numerically but not lexicographically — the int column wins
    assert(QvarnUrl.urlSearch(people, "/search/gt/age/9").count() == 3)
    assert(QvarnUrl.urlSearch(people, "/search/exact/active/True")
      .as[String].collect().sorted.toSeq == Seq("p1", "p3"))
  }

  test("show collects fields plus id; show_all returns whole rows") {
    val shown = QvarnUrl.urlSearch(people, "/search/exact/name/alice/show/age/show/color")
    assert(shown.columns.toSeq == Seq("id", "age", "color"))
    val all = QvarnUrl.urlSearch(people, "/search/exact/name/alice/show_all")
    assert(all.columns.toSeq == people.columns.toSeq)
  }

  test("sort + limit + offset in URL order") {
    val rows = QvarnUrl.urlSearch(people, "/search/sort/age/offset/1/limit/1/show_all")
    assert(rows.select("id").as[String].collect().toSeq == Seq("p1"))
  }

  test("error taxonomy matches the server") {
    intercept[QvarnSearch.BadSearchCondition] {
      QvarnUrl.parse(people, "/search/between/age/1/2")
    }
    intercept[QvarnSearch.BadSearchCondition] {
      QvarnUrl.parse(people, "/search/exact/name") // operator starved of operands
    }
    intercept[QvarnSearch.BadSearchCondition] {
      QvarnUrl.parse(people, "/search/exact/name/x/show")
    }
    intercept[QvarnUrl.BadLimitValue] {
      QvarnUrl.parse(people, "/search/sort/age/limit/abc")
    }
    intercept[QvarnUrl.BadOffsetValue] {
      QvarnUrl.parse(people, "/search/sort/age/offset/-1")
    }
    intercept[QvarnSearch.LimitWithoutSortError] {
      QvarnUrl.urlSearch(people, "/search/limit/5")
    }
  }

  test("URL form ≡ combinator form") {
    val viaUrl = QvarnUrl.urlSearch(
      people, "/search/contains/name/O/ne/color/red/sort/age/show_all")
    val viaApi = QvarnSearch(people).contains("name", "O").notEqual("color", "red")
      .sort("age").result()
    assert(viaUrl.collect().toSeq == viaApi.collect().toSeq)
  }

  // ---- Django keyword form ------------------------------------------------

  test("bare key means exact; values are stringified; case-insensitive") {
    val ids = QvarnUrl.paramSearch(people, Seq("name" -> "ALICE")).result()
    assert(ids.as[String].collect().toSeq == Seq("p1"))
  }

  test("multi-value tuple ANDs one condition per element on the same field") {
    // name must contain both 'b' and 'o' somewhere (clients/qvarn.py:263-270)
    val ids = QvarnUrl.paramSearch(people, Seq("name__contains" -> Seq("b", "o"))).result()
    assert(ids.as[String].collect().sorted.toSeq == Seq("p2", "p3"))
  }

  test("numeric ops through the keyword form; show projects fields") {
    val df = QvarnUrl.paramSearch(
      people, Seq("age__ge" -> 30, "active" -> true), show = Seq("name")).result()
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.select("id").as[String].collect().sorted.toSeq == Seq("p1", "p3"))
  }

  test("invalid keys raise") {
    intercept[QvarnSearch.BadSearchCondition] {
      QvarnUrl.paramSearch(people, Seq("a__b__c" -> 1))
    }
    intercept[QvarnSearch.BadSearchCondition] {
      QvarnUrl.paramSearch(people, Seq("age__between" -> 1))
    }
  }

  test("property: client-rendered URLs round-trip through the parser") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    // the client's quote(safe='') — EVERY non-unreserved byte escapes
    // (qvarn_client.py:243-246)
    def quote(s: String): String =
      s.getBytes("UTF-8").map { b =>
        val ascii = b >= 0
        if (ascii && (b.toChar.isLetterOrDigit || "-._~".contains(b.toChar)))
          b.toChar.toString
        else f"%%${b & 0xff}%02X"
      }.mkString

    val genOp = Gen.oneOf("exact", "ne", "gt", "ge", "lt", "le", "contains", "startswith")
    val genField = Gen.oneOf("name", "age", "active", "color")
    val genValue = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("a/b c%d+e"), // slash, space, percent, plus
      Gen.const("Brand#13"),
      Gen.const("日本語"),
      Gen.const("30"),
      Gen.const("true"))
    val genCond = Gen.zip(genOp, genField, genValue)
    val genConds = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genCond))

    (0 until 60).foreach { i =>
      val conds = genConds(Gen.Parameters.default, Seed(i.toLong)).get
      val url = "/people/search/" +
        conds.map { case (op, f, v) => s"$op/$f/${quote(v)}" }.mkString("/") +
        "/show_all"
      val viaUrl = QvarnUrl.urlSearch(people, url)
      val viaApi = conds.foldLeft(QvarnSearch(people)) { case (q, (op, f, v)) =>
        q.urlCond(op, f, v)
      }.showAll.result()
      val a = viaUrl.collect().map(_.toString).sorted.toSeq
      val b = viaApi.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"mismatch for $url")
    }
  }

  test("nested-field resolution works through the URL surface") {
    val nested = people.groupBy(col("active"))
      .agg(collect_list(struct(col("id"), col("name"))).as("members"))
      .withColumn("gid", col("active").cast("string"))
    val hit = QvarnUrl.urlSearch(nested, "/search/exact/name/BOB/show/active", idField = "gid")
    assert(hit.columns.toSeq == Seq("gid", "active"))
    assert(hit.count() == 2) // 'bob' and 'BOB' live in different groups
  }

  test("subresource stitching: struct on show_all, null when absent, off on show") {
    // subpath side-docs for p1 and p3 only (p2 has no side-doc)
    val side = Seq(("p1", "a@x.io", "123"), ("p3", "b@x.io", "456"))
      .toDF("id", "email", "phone")
    val full = QvarnUrl.parse(people, "/people/search/gt/age/20/show_all")
      .withSubresource("contact", side).result()
    assert(full.columns.toSeq == people.columns.toSeq :+ "contact")
    val byId = full.collect().map(r => r.getAs[String]("id") -> r).toMap
    val c1 = byId("p1").getAs[org.apache.spark.sql.Row]("contact")
    assert(c1.getAs[String]("email") == "a@x.io" && c1.getAs[String]("phone") == "123")
    assert(byId("p2").isNullAt(byId("p2").fieldIndex("contact")),
      "a parent without a side-doc must carry a NULL struct")
    // a show projection suppresses subresources, like the reference client
    // (subresources only attach on full-document reads, clients/qvarn.py:294-311)
    val shown = QvarnUrl.parse(people, "/people/search/gt/age/20/show/name")
      .withSubresource("contact", side).result()
    assert(shown.columns.toSeq == Seq("id", "name"))
    // stitching joins AFTER limit: only returned docs fetch side-docs
    val limited = QvarnUrl.parse(people,
        "/people/search/gt/age/20/sort/age/limit/1/show_all")
      .withSubresource("contact", side).result()
    assert(limited.count() == 1)
  }

  test("blob subresource GET: binary column as hex, text fallback, errors") {
    val withBlob = people.withColumn("avatar",
      encode(concat(col("name"), lit("!")), "UTF-8"))
    // point GET through the URL path surface (clients/qvarn.py:120-122)
    val got = QvarnUrl.getBlob(withBlob, "/people/p1/avatar")
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(("p1",
      "Alice!".getBytes("UTF-8").map("%02X".format(_)).mkString)))
    // a non-binary column serves its UTF-8 bytes
    val txt = QvarnUrl.getBlob(withBlob, "/people/p2/name")
      .as[(String, String)].collect()
    assert(txt.toSeq == Seq(("p2",
      "BOB".getBytes("UTF-8").map("%02X".format(_)).mkString)))
    // unknown id: empty frame (the reference 404s; the batched frame is empty)
    assert(QvarnUrl.getBlob(withBlob, "/people/nope/avatar").count() == 0)
    // unknown column and malformed path fail loud
    intercept[IllegalArgumentException](
      QvarnUrl.getBlob(withBlob, "/people/p1/missing").collect())
    intercept[QvarnSearch.BadSearchCondition](
      QvarnUrl.getBlob(withBlob, "avatar"))
    // blob() also batches over a search result
    val many = QvarnSearch(withBlob).gt("age", 20).blob("avatar")
    assert(many.count() == 3 && many.columns.toSeq == Seq("id", "blob_hex"))
  }

  test("get_version: one row in the vendored server's /version shape") {
    // get_version (clients/qvarn.py:144-146) fetches GET /version — the
    // server answers {api:{version}, implementation:{name, version}}
    // (qvarn-backend:30-39); the engine's metadata probe mirrors it
    val v = QvarnUrl.getVersion(spark)
    assert(v.count() == 1)
    assert(v.columns.toSeq == Seq("api", "implementation"))
    val row = v.selectExpr("api.version", "implementation.name",
      "implementation.version").as[(String, String, String)].head()
    assert(row == (QvarnUrl.ApiVersion, "graft", QvarnUrl.ImplementationVersion))
  }
}
