package graft

import graft.ops.QvarnSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B1-B11 — Qvarn search semantics (vendor read_only.py:74-268,
  * qvarn_client.py:185-246). */
class QvarnSearchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val people = Seq(
    ("p1", "Alice", 30, Seq("Helsinki", "Espoo"), Seq(("Card", Seq("a@x", "b@x"))), "F"),
    ("p2", "BOB", 25, Seq("Vilnius"), Seq(("card", Seq("c@x"))), "M"),
    ("p3", "bob", 40, Seq[String](), Seq[(String, Seq[String])](), "M")
  ).toDF("id", "name", "age", "cities", "cards", "sex")
    .withColumn("cards", transform(col("cards"),
      c => struct(c.getField("_1").as("kind"), c.getField("_2").as("emails"))))

  test("B1 exact is case-insensitive on strings") {
    val ids = QvarnSearch(people).exact("name", "bob").result()
      .select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("p2", "p3"))
  }

  test("B2 ne case-folds too") {
    val ids = QvarnSearch(people).notEqual("name", "ALICE").result()
      .select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("p2", "p3"))
  }

  test("B3 ordered compares") {
    assert(QvarnSearch(people).gt("age", 25).result().count() == 2)
    assert(QvarnSearch(people).ge("age", 25).le("age", 30).result().count() == 2)
  }

  test("B4/B5 contains + startswith case-insensitive") {
    assert(QvarnSearch(people).contains("name", "LIC").result().count() == 1)
    assert(QvarnSearch(people).startswith("name", "bo").result().count() == 2)
  }

  test("B6 bare field resolves into array-of-strings columns") {
    val ids = QvarnSearch(people).exact("cities", "espoo").result()
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("p1"))
  }

  test("B6 bare field resolves two levels deep (array of structs with list)") {
    // 'kind' lives inside cards[].kind; 'emails' inside cards[].emails[]
    assert(QvarnSearch(people).exact("kind", "CARD").result().count() == 2)
    val ids = QvarnSearch(people).exact("emails", "C@X").result()
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("p2"))
  }

  test("B6 a field present at several sites matches when ANY site matches") {
    // 'kind' exists top-level AND inside cards[].kind; sites OR together
    // (Qvarn ORs the per-table conditions, read_only.py:205-224)
    val df = people.withColumn("kind", when(col("id") === "p3", lit("Gold")))
    val ids = QvarnSearch(df).exact("kind", "gold").result()
      .select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("p3")) // top-level site
    val ids2 = QvarnSearch(df).exact("kind", "card").result()
      .select("id").as[String].collect().sorted
    assert(ids2.toSeq == Seq("p1", "p2")) // nested site
  }

  test("B6 subpath (struct) fields resolve like side documents") {
    // Qvarn subpaths are dict side-documents (SURVEY §1.1) — a struct column
    val df = people.withColumn("private",
      struct(concat(col("name"), lit("@mail")).as("email")))
    val ids = QvarnSearch(df).exact("email", "ALICE@mail").result()
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("p1"))
  }

  test("B7 repeated conditions on one field AND together") {
    val ids = QvarnSearch(people).contains("name", "b").contains("name", "o").result()
      .select("id").as[String].collect().sorted
    assert(ids.toSeq == Seq("p2", "p3"))
  }

  test("B8 show projects id + named fields") {
    val df = QvarnSearch(people).exact("sex", "m").show("age").result()
    assert(df.columns.toSeq == Seq("id", "age"))
  }

  test("B9 sort on a list field sorts by first element") {
    val ids = QvarnSearch(people).sort("cities").result()
      .select("id").as[String].collect()
    // null/empty-array first element sorts first (nulls first like SQL ASC)
    assert(ids.last == "p2") // "Vilnius" > "Helsinki"
  }

  test("B9 sort on a field inside an array of structs uses the first struct") {
    // child-table sort = list_pos 0: order people by cards[0].kind, then id.
    // p3 has no cards → null kind → sorts first (ASC nulls first).
    val ids = QvarnSearch(people).sort("kind", "id").result()
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("p3", "p1", "p2")) // null, "Card", "card"
  }

  test("B10 limit without sort raises") {
    assertThrows[QvarnSearch.LimitWithoutSortError] {
      QvarnSearch(people).limit(1).result()
    }
    val two = QvarnSearch(people).sort("id").offset(1).limit(2).result()
      .select("id").as[String].collect()
    assert(two.toSeq == Seq("p2", "p3"))
  }

  test("B11 search_one: exactly-one semantics") {
    assert(QvarnSearch(people).exact("name", "alice").searchOne().getAs[String]("id") == "p1")
    assertThrows[QvarnSearch.NotFoundError] {
      QvarnSearch(people).exact("name", "zed").searchOne()
    }
    assertThrows[QvarnSearch.MultipleFoundError] {
      QvarnSearch(people).exact("name", "bob").searchOne()
    }
  }

  test("B11 search_one with default: None on zero matches, raise on several") {
    assert(QvarnSearch(people).exact("name", "zed").searchOneOption().isEmpty)
    assert(QvarnSearch(people).exact("name", "alice").searchOneOption()
      .map(_.getAs[String]("id")).contains("p1"))
    assertThrows[QvarnSearch.MultipleFoundError] {
      QvarnSearch(people).exact("name", "bob").searchOneOption()
    }
  }

  test("exact on booleans and ints does not case-fold") {
    val df = Seq(("a", true, 1), ("b", false, 2)).toDF("id", "flag", "n")
    assert(QvarnSearch(df).exact("flag", true).result().count() == 1)
    assert(QvarnSearch(df).exact("n", 2).result().count() == 1)
  }
}
