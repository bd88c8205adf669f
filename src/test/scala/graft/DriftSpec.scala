package graft

import graft.sim.Similarity
import graft.text.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift monitors: identical slices must report exactly zero shift on
  * every dimension/term, and a constructed shift must surface at the top
  * of the ranking. */
class DriftSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("embedding drift is identically zero between equal slices") {
    val e = sf("embeddings").select(col("vec_id"), col("embedding"))
    val doubled = e.unionByName(
      e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val out = Similarity.dimensionDrift(doubled, "embedding",
      isA = col("vec_id") < 1000000L, topK = 64)
      .select("delta_micro").as[Long].collect().toSeq
    assert(out.nonEmpty && out.forall(_ == 0L))
  }

  test("token drift is identically zero between equal slices") {
    val d = sf("documents").select(col("doc_id"), col("text"))
    val doubled = d.unionByName(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val out = Curation.tokenDrift(doubled, "text",
      isA = col("doc_id") < 1000000L, topK = 1000)
      .select("lr_micro").as[Long].collect().toSeq
    graft.ops.Caches.release()
    assert(out.nonEmpty && out.forall(_ == 0L))
  }

  test("an injected shift ranks first in both monitors") {
    // text: slice B gets a flood of one synthetic token
    val d = sf("documents").select(col("doc_id"), col("text"))
    val flooded = d.unionByName(Seq.fill(50)(("zzmarker " * 20).trim)
      .zipWithIndex.map { case (t, i) => (2000000L + i, t) }.toDF("doc_id", "text"))
    val topTerm = Curation.tokenDrift(flooded, "text",
      isA = col("doc_id") < 2000000L, topK = 1)
      .select("term").as[String].collect().head
    graft.ops.Caches.release()
    assert(topTerm == "zzmarker")
    // embeddings: slice B shifted on one dimension
    val e = sf("embeddings").select(col("vec_id"), col("embedding"))
    val shifted = e.unionByName(e.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 7, x + 10.0f).otherwise(x)).as("embedding")))
    val topDim = Similarity.dimensionDrift(shifted, "embedding",
      isA = col("vec_id") < 1000000L, topK = 1)
      .select("dim").as[Int].collect().head
    assert(topDim == 7)
  }
}
