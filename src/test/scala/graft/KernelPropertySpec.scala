package graft

import graft.dedup.DocDedup
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels vs their composed-HOF references:
  * one generated batch, one Spark query per kernel, bitwise equality on
  * every row. Inputs include unicode, empty strings, duplicates and empty
  * arrays — the places hand-written hash/set code goes wrong. */
class KernelPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.const("日本語のテキスト"),
    Gen.const("años über émigré"),
    Gen.oneOf("the", "a", "of", "and", "dup", "dup"))
  private val genArr: Gen[Seq[String]] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, genStr))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("graft_minhash / graft_jaccard == HOF forms on generated input") {
    val rows = samples(Gen.zip(genArr, genArr), 150)
    val df = rows.toDF("a", "b")
      .select(array_distinct(col("a")).as("a"), array_distinct(col("b")).as("b"))

    val mh = df.select(
      DocDedup.minhashSignatureOfSets(col("a"), 16).as("n"),
      DocDedup.minhashSignatureOfSetsHof(col("a"), 16).as("h"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(mh.length == rows.length && mh.forall { case (n, h) => n == h })

    val jc = df.select(
      DocDedup.jaccardSets(col("a"), col("b")).as("n"),
      DocDedup.jaccardSetsHof(col("a"), col("b")).as("h"))
      .as[(Double, Double)].collect()
    assert(jc.length == rows.length && jc.forall { case (n, h) => n == h })
  }

  test("simhashMd5 kernel == HOF form == plain-Scala md5 reference on generated text") {
    val texts = samples(genArr, 120).map(_.mkString(" "))
    val got = texts.toDF("text")
      .select(DocDedup.simhashMd5(col("text"))).as[Long].collect().toSeq
    assert(got == texts.map(TestRefs.simhashMd5))
    val hof = texts.toDF("text")
      .select(DocDedup.simhashMd5Hof(col("text"))).as[Long].collect().toSeq
    assert(hof == got)
  }

  test("rollingHashMd5 kernel == HOF form == plain-Scala reference on generated text") {
    val texts = samples(genArr, 120).map(_.mkString(" "))
    val got = texts.toDF("text")
      .select(graft.text.TextFunctions.rollingHashMd5(col("text")))
      .as[String].collect().toSeq
    assert(got == texts.map(t => TestRefs.rollingMd5(t)))
    val hof = texts.toDF("text")
      .select(graft.text.TextFunctions.rollingHashMd5Hof(col("text")))
      .as[String].collect().toSeq
    assert(hof == got)
  }

  test("graft_simhash == HOF on token arrays (same tokenization)") {
    // drive both through identical token arrays (no re-tokenization skew)
    val toks = samples(genArr, 150).filter(_.nonEmpty)
    val df = toks.toDF("t")
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val tokHashes = transform(col("t"), t => xxhash64(t))
    val votes = aggregate(tokHashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    val hof = aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
    val out = df.select(call_function("graft_simhash", col("t")).as("n"), hof.as("h"))
      .as[(Long, Long)].collect()
    assert(out.length == toks.length && out.forall { case (n, h) => n == h })
  }

  test("graft_lshbucket == HOF on generated full-dim vectors") {
    val genVec: Gen[Seq[Float]] = Gen.listOfN(16,
      Gen.chooseNum(-1000, 1000).map(_ / 997.0f))
    val vecs = samples(genVec, 120)
    val df = vecs.toDF("v")
    val out = df.select(
      Similarity.lshBucket(col("v"), 16, nBits = 9, seed = 3).as("n"),
      Similarity.lshBucketHof(col("v"), 16, nBits = 9, seed = 3).as("h"))
      .as[(Long, Long)].collect()
    assert(out.length == vecs.length && out.forall { case (n, h) => n == h })
  }
}
