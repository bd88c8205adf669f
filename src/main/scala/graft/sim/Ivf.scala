package graft.sim

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors — the second scale
  * path next to [[Similarity.lshTopK]].
  *
  * Train: a few Lloyd iterations of k-means over the corpus, entirely in
  * DataFrame algebra (no MLlib, no RNG — centroid seeds are an id-ordered
  * stride so runs are reproducible). Centroids are always BROADCAST — the
  * corpus is never shuffled during training; assignment is a narrow map.
  *
  * Search: score the query against the nCells centroids, probe the nProbe
  * best cells, exact-cosine only within probed cells. Cost per query ~
  * (nProbe / nCells) of the corpus — tune both for the recall/latency
  * target; at 100 TB the assignment (id, cell) table is written bucketed by
  * cell so a probe is a partition-pruned read, not a scan.
  */
object Ivf {

  private def cos(a: Column, b: Column): Column = {
    val d = Similarity.dot(a, b)
    val den = sqrt(Similarity.dot(a, a)) * sqrt(Similarity.dot(b, b))
    when(den === 0, lit(0.0)).otherwise(d / den)
  }

  /** Deterministic k-means: returns (cell, centroid array<double>). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            nCells: Int, iters: Int = 2): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val vecs = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v")).cache()
    val n = vecs.count()
    val stride = math.max(1, n / nCells)
    // seed: every stride-th vector in id order
    val w = Window.orderBy(col("__id"))
    var centroids = vecs.withColumn("__rn", row_number().over(w) - 1)
      .filter(col("__rn") % stride === 0)
      .limit(nCells)
      .select((col("__rn") / stride).cast("int").as("cell"), col("__v").as("centroid"))

    for (_ <- 0 until iters) {
      val assigned = assign(vecs, centroids)
      // element-wise mean per cell: posexplode → avg → re-assemble in order
      centroids = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy(col("cell"), col("__pos"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ps"))
        .select(col("cell"), transform(col("__ps"), p => p.getField("__m")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment: (id, vec, cell). Centroids broadcast. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .groupBy(col("__id"))
      .agg(
        max_by(col("cell"), cos(col("__v"), col("centroid"))).as("cell"),
        first(col("__v")).as("__v"))

  /** ANN top-k: probe the `nProbe` best cells per query, exact cosine within.
    * Output: (query_id, neighbor_id, cosine, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nCells: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val centroids = train(corpus, idCol, vecCol, nCells, iters).cache()
    val cvecs = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val cells = assign(cvecs, centroids)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"), col("cell"))

    // per query: rank all centroids, keep nProbe probes
    val qw = Window.partitionBy(col("query_id")).orderBy(col("__cscore").desc)
    val probes = queries
      .select(col(idCol).as("query_id"), transform(col(vecCol), _.cast("double")).as("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__cscore", cos(col("__qv"), col("centroid")))
      .withColumn("__cr", row_number().over(qw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cos(col("__qv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
