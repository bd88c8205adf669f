package graft

import graft.ops.DataQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def results(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("clean corpus passes every documents constraint") {
    val r = results(DataQuality.documentsSuite(sf("documents")))
    assert(r.size == 7)
    assert(r.forall(_._2._2 == 1L), s"failures: ${r.filter(_._2._2 == 0L)}")
    assert(r("row_count")._1 > 0)
  }

  test("injected violations are counted exactly") {
    val base = sf("documents").limit(20).cache()
    val n = base.count()
    val dirty = base
      // duplicate three ids, null out two texts, one invalid lang,
      // two mismatched n_chars, one negative n_chars
      .unionByName(base.limit(3))
      .unionByName(base.limit(2).withColumn("text", lit(null: String)))
      .withColumn("lang",
        when(col("doc_id") === base.head().getLong(0), lit("xx"))
          .otherwise(col("lang")))
    val r = results(DataQuality.documentsSuite(dirty))
    assert(r("row_count")._1 == (n + 5).toDouble)
    assert(r("doc_id_dups") == (5.0, 0L)) // 3 dup rows + 2 null-text dups
    assert(r("text_empty")._1 == 2.0 && r("text_empty")._2 == 0L)
    // the two null-text rows also fail the n_chars == length(text) check?
    // no: length(NULL) is NULL, != is NULL -> not counted (same as SQL)
    assert(r("n_chars_mismatch")._1 == 0.0)
    assert(r("lang_invalid")._1 >= 1.0 && r("lang_invalid")._2 == 0L)
  }

  test("referential orphans: clean joins pass, injected orphans counted") {
    val li = sf("lineitem")
    val ord = sf("orders")
    val clean = results(DataQuality.referentialSuite(Seq(
      ("lineitem->orders", li, "l_orderkey", ord, "o_orderkey")))
      .select(col("relation"), col("orphans"), col("pass")))
    assert(clean("lineitem->orders") == (0.0, 1L))
    // drop half the parents -> orphans appear, count is exact
    val half = ord.filter(col("o_orderkey") % 2 === 0)
    val expected = li.join(half.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_anti").count()
    val broken = results(DataQuality.referentialSuite(Seq(
      ("lineitem->orders", li, "l_orderkey", half, "o_orderkey"))))
    assert(broken("lineitem->orders") == (expected.toDouble, 0L))
    assert(expected > 0)
  }

  test("null foreign keys count as orphans") {
    val child = Seq(Some(1L), Some(2L), None).toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val r = results(DataQuality.referentialSuite(Seq(
      ("c->p", child, "k", parent, "p"))))
    assert(r("c->p") == (1.0, 0L))
  }
}
