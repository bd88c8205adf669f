package graft

import graft.text.Probe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProbeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")
  private lazy val w = Probe.fit(docs, "text", "doc_id")

  test("fit solves the normal equations exactly (BigInt residual check)") {
    // Recompute moments in plain Scala and check A·(detAi) = det·b exactly
    // (Cramer's identity), i.e. the solve is the true LS solution
    val rows = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    val feats = rows.map { case (_, text, lang) =>
      val t = text.trim.toLowerCase
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
      (BigInt(toks.length), BigInt(toks.count(stop)), BigInt(if (lang == "en") 1 else 0))
    }
    val n = BigInt(feats.length)
    val s1 = feats.map(_._1).sum; val s2 = feats.map(_._2).sum
    val s11 = feats.map(f => f._1 * f._1).sum
    val s12 = feats.map(f => f._1 * f._2).sum
    val s22 = feats.map(f => f._2 * f._2).sum
    val sy = feats.map(_._3).sum
    val sy1 = feats.map(f => f._3 * f._1).sum
    val sy2 = feats.map(f => f._3 * f._2).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)
    val det1 = n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    val det2 = n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)
    assert(det != 0)
    // Cramer identity rows: A · [det0, det1, det2]ᵀ = det · b
    assert(n * det0 + s1 * det1 + s2 * det2 == det * sy)
    assert(s1 * det0 + s11 * det1 + s12 * det2 == det * sy1)
    assert(s2 * det0 + s12 * det1 + s22 * det2 == det * sy2)
    // and the distributed fit nano-truncates the same rationals
    assert(w.w0Nano == (det0 * BigInt(1000000000L) / det).toLong)
    assert(w.w1Nano == (det1 * BigInt(1000000000L) / det).toLong)
    assert(w.w2Nano == (det2 * BigInt(1000000000L) / det).toLong)
    assert(w.n == feats.length.toLong)
  }

  test("fit is partitioning-invariant (moments are abelian sums)") {
    val w2 = Probe.fit(docs.repartition(7, col("doc_id")), "text", "doc_id")
    assert(w2 == w)
  }

  test("the probe separates better than chance on its training signal") {
    val c = Probe.confusion(Probe.score(docs, w, "text", "doc_id"))
      .as[(Long, Long, Long, Long)].collect()(0)
    val (tp, fp, fn, tn) = c
    assert(tp + fp + fn + tn == w.n)
    // accuracy strictly above the majority-class baseline would be too
    // strong for 2 cheap features; require better than coin flip
    assert((tp + tn).toDouble / w.n > 0.5)
  }

  test("maintained moments equal the rebuild exactly (create/update/delete)") {
    val phantoms = docs.filter(col("doc_id") % 7 === 1)
      .withColumn("text", concat(col("text"), lit(" zzzphantom")))
    val boot = Probe.moments(
      docs.filter(col("doc_id") % 3 =!= 0).unionByName(phantoms), "text", "doc_id")
    val maintained = boot +
      Probe.moments(docs.filter(col("doc_id") % 3 === 0), "text", "doc_id") -
      Probe.moments(phantoms, "text", "doc_id")
    assert(maintained == Probe.moments(docs, "text", "doc_id"))
    assert(Probe.solve(maintained) == w)
  }

  test("empty-batch moments are the fold identity") {
    val zero = Probe.moments(docs.filter(lit(false)), "text", "doc_id")
    assert(zero == Probe.Moments(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val m = Probe.moments(docs, "text", "doc_id")
    assert(m + zero == m && m - zero == m)
  }

  test("calibration: bands partition the corpus and reconcile with totals") {
    val scored = Probe.score(docs, w, "text", "doc_id")
    val cal = Probe.calibration(scored)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // bands are 0..9, lower bounds strictly increasing, sizes/positives
    // reconcile with the corpus
    assert(cal.map(_._1).forall(b => b >= 0 && b <= 9))
    assert(cal.map(_._2).sliding(2).forall { case Array(a, b) => a < b })
    assert(cal.map(_._3).sum == docs.count())
    val totalPos = scored.agg(sum(col("y"))).head().getLong(0)
    assert(cal.map(_._4).sum == totalPos)
    // a perfectly separated scored frame pins the rate extremes: y
    // follows the score, so low bands are all-negative, high all-positive
    val sep = Seq.tabulate(100)(i =>
      (i.toLong, i.toLong * 10000000L, if (i >= 50) 1L else 0L))
      .toDF("doc_id", "pred_nano", "y")
    val cs = Probe.calibration(sep)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(cs.map(_._1).toSeq == (0L to 9L) && cs.forall(_._3 == 10L))
    assert(cs.take(5).forall(_._5 == 0.0) && cs.drop(5).forall(_._5 == 1.0))
  }

  test("score is a stateless narrow projection (no shuffle in the plan)") {
    val plan = Probe.score(docs, w, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
