package graft

import graft.sim.{Ivf, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: training determinism, index shape, recall vs brute force. */
class IvfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val emb = sf("embeddings")

  test("training is deterministic and yields nCells centroids of full dim") {
    val c1 = Ivf.train(emb, "vec_id", "embedding", nCells = 8, iters = 2)
      .select(col("cell"), col("centroid")).as[(Int, Seq[Double])].collect().sortBy(_._1)
    val c2 = Ivf.train(emb, "vec_id", "embedding", nCells = 8, iters = 2)
      .select(col("cell"), col("centroid")).as[(Int, Seq[Double])].collect().sortBy(_._1)
    assert(c1.length == 8 && c1.forall(_._2.length == 64))
    assert(c1.toSeq == c2.toSeq)
  }

  test("IVF top-k beats the probed fraction: recall@5 >= 0.4 probing 1/4 of cells") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(emb, q, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall")
    // every query returns at most k rows
    assert(ivf.groupBy(_._1).forall(_._2.size <= 5))
  }
}
