package graft

import graft.sim.KmeansPar
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-means|| seeding: the oversampling rounds must find every
  * well-separated mode (the failure mode of naive min-id seeding), the
  * whole path is deterministic (md5-derandomized), and candidate volume
  * stays control-sized. */
class KmeansParSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Three tight, well-separated clusters of 40 points each on distinct
    * axes, 64-dim. Naive "first k ids" seeding would put all three seeds
    * in cluster 0 (ids are cluster-contiguous); k-means|| must not. */
  private def modes() = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(64)(0.0f)
      v(c * 20) = 10.0f
      v(c * 20 + 1) = 0.1f * (i % 7) // small within-cluster spread
      (c * 40L + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("three separated modes → three pure cells") {
    val df = modes()
    val assign = KmeansPar.cluster(df, "vec_id", "embedding", k = 3)
      .as[(Long, Int)].collect().toMap
    // each true cluster maps to EXACTLY one cell, and the cells differ
    val byCluster = (0 until 3).map { c =>
      (0 until 40).map(i => assign(c * 40L + i)).distinct
    }
    assert(byCluster.forall(_.size == 1),
      s"cluster split across cells: $byCluster")
    assert(byCluster.flatten.distinct.size == 3,
      s"clusters merged into one cell: $byCluster")
  }

  test("lightweight coreset: cost-aware draws, exact weights, determinism") {
    val df = modes()
    val cs = KmeansPar.lightweightCoreset(df, "vec_id", "embedding", m = 30)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(cs.nonEmpty && cs.length <= 120)
    assert(cs.forall(_._2 > 0))
    // unbiasedness sanity: Σ weights estimates n (loose band — one draw)
    val wSum = cs.map(_._2).sum / 1e9
    assert(wSum > 120 * 0.3 && wSum < 120 * 3.0, s"weight mass $wSum")
    // deterministic replay
    val cs2 = KmeansPar.lightweightCoreset(df, "vec_id", "embedding", m = 30)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(cs.toSeq == cs2.toSeq)
    // cost-aware: a sampled far-from-mean point carries LESS weight than
    // a sampled near-the-mean point (q higher → weight lower). modes()
    // clusters sit at different distances only via their axes; craft an
    // explicit contrast instead: 39 points at the mean, one far outlier
    val contrast = ((0L until 39L).map { i =>
      val v = Array.fill(64)(0.0f); v(0) = 1.0f; (i, v.toSeq)
    } :+ {
      val v = Array.fill(64)(0.0f); v(40) = 1.0f; (39L, v.toSeq)
    }).toDF("vec_id", "embedding")
    val cw = KmeansPar.lightweightCoreset(contrast, "vec_id", "embedding",
      m = 20, salt = "coreset-contrast").as[(Long, Long)].collect().toMap
    if (cw.contains(39L) && cw.exists(_._1 < 39L)) {
      val near = cw.filter(_._1 < 39L).values.head
      assert(cw(39L) < near, s"outlier weight ${cw(39L)} !< near $near")
    }
    // degenerate corpus (φ=0): uniform draw, exactly n/m weight each,
    // and the keep set replays the EXACT md5 rule the DuckDB oracle
    // mirrors (u20('coreset:'||id) · n < m · 2²⁰) — the two engines'
    // φ=0 branches must pick the same rows
    val flat = (0L until 50L).map(i => (i, Seq.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val fw = KmeansPar.lightweightCoreset(flat, "vec_id", "embedding", m = 10)
      .as[(Long, Long)].collect()
    assert(fw.nonEmpty && fw.forall(_._2 == 50L * 1000000000L / 10L))
    def u20(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"coreset:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(5), 16)
    val expect = (0L until 50L).filter(i => u20(i) * 50L < 10L * (1L << 20))
    assert(fw.map(_._1).sorted.toSeq == expect)
  }

  test("coreset-trained k-means recovers separated modes from the sample") {
    val df = modes()
    val assign = KmeansPar.coresetKmeans(df, "vec_id", "embedding",
        k = 3, m = 40)
      .as[(Long, Int)].collect().toMap
    assert(assign.size == 120)
    // training saw only the weighted coreset, yet the full-corpus
    // assignment must still split the three true modes into pure,
    // distinct cells
    val byCluster = (0 until 3).map { c =>
      (0 until 40).map(i => assign(c * 40L + i)).distinct
    }
    assert(byCluster.forall(_.size == 1), s"cluster split: $byCluster")
    assert(byCluster.flatten.distinct.size == 3, s"merged: $byCluster")
    // deterministic
    val again = KmeansPar.coresetKmeans(df, "vec_id", "embedding",
        k = 3, m = 40)
      .as[(Long, Int)].collect().toMap
    assert(again == assign)
  }

  test("seeding is deterministic and control-sized") {
    val df = modes()
    val s1 = KmeansPar.seed(df, "vec_id", "embedding", k = 3)
    val s2 = KmeansPar.seed(df, "vec_id", "embedding", k = 3)
    assert(s1 == s2)
    assert(s1.size <= 3 && s1.nonEmpty)
    assert(s1.map(_._1) == s1.map(_._1).sorted)
    // a degenerate corpus (all identical vectors): cost 0 everywhere
    // after the seed, so no candidate is ever sampled — one cell
    val flat = (0L until 10L).map(i => (i, Seq.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val sf = KmeansPar.seed(flat, "vec_id", "embedding", k = 3)
    assert(sf.size == 1)
  }
}
