package graft

import graft.sim.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("powerIterate recovers the dominant eigenvector of a known matrix") {
    // [[2,1],[1,2]]: eigenvalues 3 (v=(1,1)/√2) and 1
    val g = Seq(Seq(2.0, 1.0), Seq(1.0, 2.0))
    val v = Pca.powerIterate(g, iters = 30)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(v(0) - s) < 1e-12 && math.abs(v(1) - s) < 1e-12)
    // diagonal: axis-aligned dominant direction, sign fixed positive
    val d = Pca.powerIterate(Seq(Seq(5.0, 0.0), Seq(0.0, 1.0)), iters = 5)
    assert(d == Seq(1.0, 0.0))
  }

  test("sign convention: first nonzero coordinate is positive") {
    // dominant eigenvector of [[4,-2],[-2,4]] is (1,-1)/√2 (λ=6); the
    // iteration may land on either sign — the fix pins the first coord > 0
    val v = Pca.powerIterate(Seq(Seq(4.0, -2.0), Seq(-2.0, 4.0)), iters = 40)
    assert(v(0) > 0 && v(1) < 0)
    assert(math.abs(v(0) + v(1)) < 1e-12)
  }

  test("pc1 projection matches a driver-side replay on real embeddings") {
    val emb = sf("embeddings")
    val (mu, v1) = Pca.fitPc1(emb, "vec_id", "embedding", iters = 8)
    assert(mu.size == 64 && v1.size == 64)
    // unit eigenvector
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-9)
    val got = Pca.pc1ProjectionWith(emb, "vec_id", "embedding", mu, v1)
      .as[(Long, Double)].collect().toMap
    val raw = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    raw.foreach { case (id, x) =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += (x(i) - mu(i)) * v1(i); i += 1 }
      val want = BigDecimal(acc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want, s"id=$id")
    }
    // centered projections must (approximately) sum to zero: Σ(x−μ)·v =
    // (Σx − nμ)·v and μ is the (quantized) mean
    assert(math.abs(got.values.sum) < 1e-2 * raw.length)
  }

  test("integer moments: maintained state equals a from-scratch build exactly") {
    val emb = sf("embeddings")
    val full = Pca.momentDeltas(emb, "embedding", 64)
      .as[(Int, Long)].collect().toMap
    // build from a corrupted split (half missing, scaled phantoms), then
    // converge with one delta batch
    val phantoms = emb.filter(col("vec_id") % 4 === 1)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(0.25f)))
    val merged = Pca.mergeMoments(
        Pca.mergeMoments(
          Pca.momentDeltas(emb.filter(col("vec_id") % 2 === 0), "embedding", 64),
          Pca.momentDeltas(phantoms, "embedding", 64)),
        Pca.momentDeltas(emb.filter(col("vec_id") % 2 === 1), "embedding", 64),
        Pca.momentDeltas(phantoms, "embedding", 64, sign = -1))
      .as[(Int, Long)].collect().toMap
    // phantom cells cancel to exact zero; live cells match bit for bit
    assert(full.keySet.forall(k => merged.getOrElse(k, 0L) == full(k)))
    assert(merged.keySet.forall(k => full.getOrElse(k, 0L) == merged(k)))
  }

  test("moment fit agrees with the direct fit's dominant direction") {
    val emb = sf("embeddings")
    val (_, vDirect) = Pca.fitPc1(emb, "vec_id", "embedding", iters = 8)
    val moments = Pca.momentDeltas(emb, "embedding", 64)
      .as[(Int, Long)].collect().toSeq
    val (muM, vM) = Pca.fitFromMoments(moments, 64)
    assert(muM.size == 64 && vM.size == 64)
    assert(math.abs(vM.map(x => x * x).sum - 1.0) < 1e-9)
    // the two models quantize differently (6-decimal vs micro-integer),
    // so directions agree to high — not bit — precision
    val cos = vDirect.zip(vM).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"cos=$cos")
    // and the projection replays driver-side exactly
    val got = Pca.pc1ProjectionMoments(emb, "vec_id", "embedding", muM, vM)
      .as[(Long, Double)].collect().toMap
    val raw = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    raw.foreach { case (id, x) =>
      var acc = 0.0
      var i = 0
      while (i < 64) {
        val q = BigDecimal(x(i) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        acc += (q - muM(i)).toDouble * vM(i)
        i += 1
      }
      val want = BigDecimal(acc / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want, s"id=$id")
    }
  }

  test("pc1 captures at least as much variance as any coordinate axis") {
    val emb = sf("embeddings")
    val (mu, v1) = Pca.fitPc1(emb, "vec_id", "embedding", iters = 8)
    val raw = emb.select(transform(col("embedding"), _.cast("double")))
      .as[Seq[Double]].collect()
    def variance(proj: Seq[Double] => Double): Double = {
      val vals = raw.map(proj)
      val m = vals.sum / vals.length
      vals.map(v => (v - m) * (v - m)).sum / vals.length
    }
    val pcVar = variance(x => (0 until 64).map(i => (x(i) - mu(i)) * v1(i)).sum)
    val axisVars = (0 until 64).map(d => variance(x => x(d)))
    assert(pcVar >= axisVars.max - 1e-9,
      s"pc1 var $pcVar < best axis ${axisVars.max}")
  }
}
