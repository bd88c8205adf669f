package graft

import graft.dedup.DocDedup
import graft.functions.{GraftFunctions, KernelSubstitution}
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[KernelSubstitution]] optimizer rule: declarative built-in forms
  * (the portable HOF dot fold, the intersect/union Jaccard) must be
  * rewritten to the native kernels in the optimized plan, with values
  * identical to the un-rewritten forms on every edge the built-ins define —
  * null arrays, null elements, empty arrays, ragged lengths. */
class KernelSubstitutionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def withoutRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == KernelSubstitution)
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def optimizedString(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // --------------------------------------------------------------- dot

  private val vecRows: Seq[(Option[Seq[Option[Float]]], Option[Seq[Option[Float]]])] = Seq(
    (Some(Seq(Some(1f), Some(2f), Some(3f))), Some(Seq(Some(4f), Some(5f), Some(6f)))),
    (Some(Seq(Some(1f), None, Some(3f))), Some(Seq(Some(4f), Some(5f), Some(6f)))), // null elem
    (Some(Seq(Some(1f), Some(2f))), Some(Seq(Some(4f), Some(5f), Some(6f)))),       // ragged
    (Some(Seq.empty), Some(Seq.empty)),                                             // empty
    (None, Some(Seq(Some(1f)))),                                                    // null array
  )

  // a parquet round-trip: literal LocalRelations constant-fold clean away
  // in the optimizer, which would vacuously "pass" any plan assertion
  private def viaParquet(df: DataFrame): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("ksub").toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private lazy val vecDf = viaParquet(vecRows.toDF("a", "b")
    .withColumn("ord", monotonically_increasing_id()))
    .orderBy("ord")

  test("HOF dot fold is rewritten to graft_dot") {
    val df = vecDf.select(Similarity.dotHof(col("a"), col("b")).as("d"))
    val plan = optimizedString(df)
    assert(plan.contains("graft_dot"), s"expected graft_dot in:\n$plan")
    assert(!plan.contains("aggregate("), s"fold should be gone:\n$plan")
    withoutRule {
      val bare = optimizedString(
        vecDf.select(Similarity.dotHof(col("a"), col("b")).as("d")))
      assert(!bare.contains("graft_dot"), "rule leaked into a bare session")
    }
  }

  test("rewritten dot equals the un-rewritten fold on every edge case") {
    val q = () => vecDf.select(Similarity.dotHof(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val rewritten = q()
    val reference = withoutRule(q())
    assert(rewritten == reference)
    // and the expected values, independently: only the clean row folds
    assert(rewritten == Seq(Some(32.0), None, None, Some(0.0), None))
  }

  test("a double-array fold (casts simplified away) is still rewritten") {
    val df = viaParquet(Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b"))
      .select(Similarity.dotHof(col("a"), col("b")).as("d"))
    assert(optimizedString(df).contains("graft_dot"))
    assert(df.as[Double].head() == 11.0)
  }

  test("non-dot folds are left alone") {
    // same shape, but a sum of maxes — must NOT be confused for a dot
    val df = vecDf.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => greatest(x.cast("double"), y.cast("double"))),
      lit(0.0), (acc, e) => acc + e).as("m"))
    assert(!optimizedString(df).contains("graft_dot"))
  }

  // --------------------------------------------------------------- jaccard

  private val setRows: Seq[(Option[Seq[Option[String]]], Option[Seq[Option[String]]])] = Seq(
    (Some(Seq(Some("a"), Some("b"), Some("b"))), Some(Seq(Some("b"), Some("c")))),
    (Some(Seq(Some("a"), None)), Some(Seq(None, Some("b")))), // null elements are set members
    (Some(Seq.empty), Some(Seq.empty)),                       // 0/0 → 0.0 by the guard
    (None, Some(Seq(Some("a")))),                             // null array → null
    (Some(Seq(Some("x"))), Some(Seq(Some("x")))),
  )

  private lazy val setDf = viaParquet(setRows.toDF("a", "b")
    .withColumn("ord", monotonically_increasing_id()))
    .orderBy("ord")

  test("intersect/union Jaccard is rewritten to graft_jaccard") {
    val df = setDf.select(DocDedup.jaccardSetsHof(col("a"), col("b")).as("j"))
    val plan = optimizedString(df)
    assert(plan.contains("graft_jaccard"), s"expected graft_jaccard in:\n$plan")
    assert(!plan.contains("array_intersect"), s"pair should be gone:\n$plan")
  }

  test("rewritten jaccard equals the un-rewritten built-ins on every edge case") {
    val q = () => setDf.select(DocDedup.jaccardSetsHof(col("a"), col("b")).as("j"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val rewritten = q()
    val reference = withoutRule(q())
    assert(rewritten == reference)
    assert(rewritten == Seq(Some(1.0 / 3), Some(1.0 / 3), Some(0.0), None, Some(1.0)))
  }

  test("an asymmetric intersect/union pair is left alone") {
    // intersect(a,b) but union(a,c): not a Jaccard — must not rewrite
    val df = setDf.withColumn("c", array(lit("z")))
      .select((size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("c"))).cast("double")).as("x"))
    assert(!optimizedString(df).contains("graft_jaccard"))
  }

  test("rule fires on real corpus shingle sets with identical results") {
    val docs = sf("documents").limit(200)
      .select(col("doc_id"), array_distinct(DocDedup.shingles(col("text"), 3)).as("sh"))
    val pairs = docs.as("l").join(docs.as("r"),
      col("l.doc_id") < col("r.doc_id") && col("l.doc_id") % 13 === 0)
    val hof = pairs.select(col("l.doc_id"), col("r.doc_id"),
      DocDedup.jaccardSetsHof(col("l.sh"), col("r.sh")).as("j"))
    assert(optimizedString(hof).contains("graft_jaccard"))
    val kern = pairs.select(col("l.doc_id"), col("r.doc_id"),
      DocDedup.jaccardSets(col("l.sh"), col("r.sh")).as("j"))
    assert(hof.collect().toSeq.sortBy(_.toString()) ==
      kern.collect().toSeq.sortBy(_.toString()))
  }
}
