package graft

import graft.sim.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val emb = sf("embeddings")
  private lazy val cbs = Pq.fixedCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)

  private def vecsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap

  test("encode matches a plain-Scala reference (argmin, lowest-code ties)") {
    val vecs = vecsOf(emb)
    val got = Pq.encode(emb, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    def ref(v: Seq[Double]): Seq[Int] = cbs.zipWithIndex.map { case (cb, mi) =>
      val subv = v.slice(mi * 8, mi * 8 + 8)
      cb.zipWithIndex.map { case (c, j) =>
        (subv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, j)
      }.min._2
    }
    vecs.foreach { case (id, v) => assert(got(id) == ref(v), s"vec $id") }
  }

  test("the first 16 vectors encode to themselves (zero quantization error)") {
    val got = Pq.encode(emb, "vec_id", "embedding", cbs)
      .filter(col("vec_id") < 16).as[(Long, Seq[Int])].collect().toMap
    // seed vector j IS sub-centroid j in every subspace
    got.foreach { case (id, codes) =>
      assert(codes.forall(_ == id.toInt), s"vec $id got $codes")
    }
  }

  test("ADC top-k achieves reasonable recall vs exact L2 top-k") {
    val vecs = vecsOf(emb)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val k = 5
    // trained codebooks: near-uniform synthetic embeddings quantize poorly
    // under raw first-16 seeds (the fixed variant exists for the oracle,
    // not for recall); two Lloyd iterations roughly double recall here
    val trained = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
    val adc = Pq.adcTopK(emb, queries, "vec_id", "embedding", trained, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val qids = vecs.keys.filter(_ % 50 == 0)
    val recalls = qids.toSeq.map { qid =>
      val qv = vecs(qid)
      val exact = (vecs - qid).toSeq.map { case (id, v) =>
        (qv.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, id)
      }.sorted.take(k).map(_._2).toSet
      adc(qid).intersect(exact).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@$k = $mean")
    // and every ADC list has exactly k ranked rows
    assert(adc.values.forall(_.size == k))
  }

  test("trained codebooks do not regress quantization error vs fixed seeds") {
    val vecs = vecsOf(emb)
    def mse(c: Pq.Codebooks): Double = {
      val codes = Pq.encode(emb, "vec_id", "embedding", c)
        .as[(Long, Seq[Int])].collect().toMap
      vecs.map { case (id, v) =>
        c.zipWithIndex.map { case (cb, mi) =>
          val subv = v.slice(mi * 8, mi * 8 + 8)
          subv.zip(cb(codes(id)(mi))).map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }.sum / vecs.size
    }
    val trained = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val (f, t) = (mse(cbs), mse(trained))
    assert(t <= f * 1.0001, s"trained mse $t vs fixed $f")
  }
}
