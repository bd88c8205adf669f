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

  test("incremental maintenance: update batch probe equals a fresh rebuild's probe") {
    // fixed centroids (production retrains rarely; maintenance never does)
    val cents = Ivf.train(emb, "vec_id", "embedding", nCells = 8, iters = 2)
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)

    val corpus0 = emb.filter(col("vec_id") < 400)
    // the batch: 10 updated vectors (content moved -> may change cell),
    // 20 inserts, 10 deletes
    val updated = emb.filter(col("vec_id") < 10)
      .withColumn("embedding", reverse(col("embedding")))
    val inserts = emb.filter(col("vec_id") >= 400 && col("vec_id") < 420)
    val deletes = emb.filter(col("vec_id") >= 390 && col("vec_id") < 400)
      .select(col("vec_id"))
    val corpus1 = corpus0
      .filter(col("vec_id") >= 10 && col("vec_id") < 390)
      .unionByName(updated).unionByName(inserts)

    val dirA = java.nio.file.Files.createTempDirectory("graft_ivf_incr").toString
    val indexA = Ivf.buildIndexWith(cents, corpus0, "vec_id", "embedding", dirA)
    Ivf.updateIndex(indexA, updated.unionByName(inserts), "vec_id", "embedding",
      deletes, gen = 1L)

    val dirB = java.nio.file.Files.createTempDirectory("graft_ivf_rebuild").toString
    val indexB = Ivf.buildIndexWith(cents, corpus1, "vec_id", "embedding", dirB)

    val q = emb.filter(col("vec_id") % 50 === 0)
    def rows(ix: Ivf.Index) =
      Ivf.probe(ix, q, "vec_id", "embedding", k = 5, nProbe = 3)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 9), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(indexA) == rows(indexB),
      "maintained index must probe identically to a rebuild over the same corpus")
    // deleted ids are gone, inserted ids reachable
    val all = spark.read.parquet(indexA.assignDir)
    assert(all.filter(col("neighbor_id") === 395).count() == 1,
      "the stale row still exists on disk (log-structured)")
    val probedAll = Ivf.probe(indexA, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 1000, nProbe = 8)
    assert(probedAll.filter(col("neighbor_id").isin(390 to 399: _*)).count() == 0)
    graft.ops.Caches.release()
  }

  test("build once / probe twice: probes share the persisted index and prune to probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    val index = Ivf.buildIndex(emb, "vec_id", "embedding", dir, nCells = 16, iters = 2)
    assert(index.nCells == 16)
    // the persisted assignment has one directory per non-empty cell
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 16)

    val q1 = emb.filter(col("vec_id") % 50 === 0)
    val q2 = emb.filter(col("vec_id") % 50 === 1)
    val r1 = Ivf.probe(index, q1, "vec_id", "embedding", k = 5, nProbe = 4)
    val r2 = Ivf.probe(index, q2, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(r1.count() > 0 && r2.count() > 0)
    // probe plans read the assignment with a partition filter on cell —
    // never the corpus: the scan carries PartitionFilters over `cell`
    val plan1 = r1.queryExecution.executedPlan.toString
    assert(plan1.contains("PartitionFilters") && plan1.contains("cell"),
      s"probe should partition-prune the assignment read:\n$plan1")
    graft.ops.Caches.release()
  }
}
