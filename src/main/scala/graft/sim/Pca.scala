package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over an embedding column — the
  * linear-algebra curation primitive (dominant-direction removal /
  * ABTT-style de-biasing, SemDeDup preprocessing, variance probes).
  *
  * Shape: the centered Gram matrix `G = Σ (x−μ)(x−μ)ᵀ` is computed
  * DISTRIBUTED (one scan; per-row outer product flattened to a d²-array,
  * element-wise summed with map-side partial aggregation — d² entries of
  * aggregation state, independent of row count), then collected: at d=64
  * it is 4096 doubles of CONTROL data, like ANN centroids. The power
  * iteration runs driver-side on the collected matrix.
  *
  * Reproducibility: μ and G are quantized (round 6) after their
  * distributed sums — that crushes merge-order ulps, the only
  * nondeterministic FP in the pipeline. The power iteration itself uses
  * index-ordered folds (matvec j-ascending, norm i-ascending), an op
  * sequence an external engine can replay EXACTLY — so the eigenvector,
  * and therefore every projection, is bit-identical with no further
  * rounding. */
object Pca {

  /** Per-dimension means, quantized: Seq of d doubles. */
  private[graft] def meansQuantized(vecs: DataFrame): Seq[Double] = {
    import vecs.sparkSession.implicits._
    vecs.select(posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy(col("__i")).agg(round(avg(col("__x")), 6).as("__m"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2).toSeq
  }

  /** Centered Gram entries, quantized: row-major d×d. */
  private[graft] def gramQuantized(vecs: DataFrame, mu: Seq[Double]): Seq[Seq[Double]] = {
    import vecs.sparkSession.implicits._
    val muLit = typedlit(mu)
    val centered = transform(col("__v"),
      (x, i) => x - element_at(muLit, i + lit(1)))
    val d = mu.size
    val flat = vecs
      .select(flatten(transform(centered,
        xi => transform(centered, xj => xi * xj))).as("__op"))
      .select(posexplode(col("__op")).as(Seq("__k", "__p")))
      .groupBy(col("__k")).agg(round(sum(col("__p")), 6).as("__g"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    flat.grouped(d).map(_.toSeq).toSeq
  }

  /** Power iteration with index-ordered folds; starts from e₀ and fixes
    * the sign so the first nonzero coordinate is positive. */
  private[graft] def powerIterate(g: Seq[Seq[Double]], iters: Int): Seq[Double] = {
    val d = g.size
    var v = Seq.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val y = g.map { row =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += row(j) * v(j); j += 1 } // j-ascending fold
        acc
      }
      var n2 = 0.0
      var i = 0
      while (i < d) { n2 += y(i) * y(i); i += 1 }       // i-ascending fold
      val nrm = math.sqrt(n2)
      v = y.map(_ / nrm)
    }
    val lead = v.find(_ != 0.0).getOrElse(1.0)
    if (lead < 0) v.map(x => -x) else v
  }

  /** Fit: (μ, v₁) — both control data (d and d doubles). Train once,
    * project many. */
  def fitPc1(corpus: DataFrame, idCol: String, vecCol: String,
             iters: Int = 8): (Seq[Double], Seq[Double]) = {
    val vecs = corpus
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val mu = meansQuantized(vecs)
    (mu, powerIterate(gramQuantized(vecs, mu), iters))
  }

  /** (idCol, pc1) — the projection of each (centered) embedding on the
    * dominant eigenvector. The eigenvector and means ride as literals, so
    * the projection is a narrow expression: no join, no shuffle. */
  def pc1ProjectionWith(corpus: DataFrame, idCol: String, vecCol: String,
                        mu: Seq[Double], v1: Seq[Double]): DataFrame = {
    val vecs = corpus
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val muLit = typedlit(mu)
    val vLit = typedlit(v1)
    // index-ordered fold, the same op sequence as the oracle's list_reduce
    val proj = aggregate(
      zip_with(col("__v"), sequence(lit(1), lit(mu.size)),
        (x, i) => (x - element_at(muLit, i)) * element_at(vLit, i)),
      lit(0.0), (acc, t) => acc + t)
    vecs.select(col(idCol), round(proj, 6).as("pc1"))
  }

  def pc1Projection(corpus: DataFrame, idCol: String, vecCol: String,
                    iters: Int = 8): DataFrame = {
    val (mu, v1) = fitPc1(corpus, idCol, vecCol, iters)
    pc1ProjectionWith(corpus, idCol, vecCol, mu, v1)
  }
}
