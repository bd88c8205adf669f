package graft

import graft.sim.Similarity
import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: multiple [[graft.functions.VectorDot]] kernels in ONE
  * generated function must compile. `cosine` expands to three `graft_dot`
  * calls in a single projection; with fixed local names (`n`/`s`/`i`) janino
  * failed with "Redefinition of local variable" and the whole stage silently
  * fell back to interpreted mode — the flagship kernel disabled codegen at
  * its own primary call sites. */
class CodegenSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  test("a projection with three graft_dot calls stays in whole-stage codegen") {
    val df = sf("embeddings").select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val subtrees = codegenStringSeq(df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected a WholeStageCodegen subtree")
    // every generated subtree must actually compile (stats are unavailable
    // (-1) exactly when janino rejected the source and Spark would fall back)
    subtrees.foreach { case (_, code, stats) =>
      assert(stats.maxMethodCodeSize > 0,
        s"whole-stage codegen failed to compile:\n$code")
    }
    // the dot kernel really is inlined more than once in one function
    val code = subtrees.map(_._2).mkString("\n")
    assert("dotS_\\d+".r.findAllIn(code).toSet.size >= 2,
      "expected >=2 distinct freshName'd dot accumulators in one subtree")
  }

  test("graft_nfc normalizes decomposed text, fast-paths composed text") {
    val decomposed = "caf\u0065\u0301 no\u0065\u0308l"
    val composed = java.text.Normalizer.normalize(
      decomposed, java.text.Normalizer.Form.NFC)
    assert(decomposed != composed) // the fixture really is decomposed
    val out = Seq(decomposed, composed, "plain ascii")
      .toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .as[String].collect()
    assert(out(0) == composed, "decomposed input must compose")
    assert(out(1) == composed, "composed input must pass through unchanged")
    assert(out(2) == "plain ascii")
    // null safety through the expression path
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_nfc", col("s"))).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("cosine over codegen equals the interpreted value (fallback disabled)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = sf("embeddings").limit(16)
        .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
        .as[Double].collect()
      assert(out.nonEmpty && out.forall(c => math.abs(c - 1.0) < 1e-9))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("lshBucket kernel matches the HOF form on ragged vectors too") {
    val dim = 8
    val rows = Seq(
      Array.fill(8)(0.5f),            // exact length
      Array.fill(5)(1.0f),            // shorter than dim -> bucket 0 (HOF null-pad)
      Array.fill(11)(-0.25f),         // longer than dim -> hash-of-null coefficient
      Array.empty[Float]
    ).zipWithIndex.map { case (v, i) => (i, v) }
    val df = rows.toDF("id", "v")
    val out = df.select(
      Similarity.lshBucket(col("v"), dim, nBits = 6, seed = 3).as("native"),
      Similarity.lshBucketHof(col("v"), dim, nBits = 6, seed = 3).as("hof"))
      .as[(Long, Long)].collect()
    assert(out.length == rows.length && out.forall { case (n, h) => n == h })
  }
}
