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

  // ---- incrementally-maintainable fit via EXACT INTEGER moments --------
  //
  // The sufficient statistics of a PCA fit — (n, Σx, Σxxᵀ) — are an
  // abelian group, so the fit is incrementally maintainable the same way
  // the engine maintains word counts or HLL registers: a change batch
  // ADDS its vectors' moments and RETRACTS deleted vectors' moments, no
  // corpus re-read. To make maintained ≡ rebuilt EXACT (not
  // approximately: FP sums depend on merge order), vectors quantize to
  // integer micro-units (×10⁶) first; every moment is then an exact
  // BIGINT sum, identical under any batch/merge order, and the derived
  // model (floored integer means, integer centered scatter) is
  // bit-reproducible cross-engine with no rounding anywhere. Magnitudes:
  // Q entries ≤ n·10¹²·max|x|² — BIGINT-safe through ~10⁶ rows of
  // unit-scale vectors; a larger corpus moves the moment columns to
  // DECIMAL(38,0) unchanged.

  private val M = 1000000L

  private def microVec(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * M).cast("long"))

  /** Integer micro-unit moment deltas of a vector set, `sign`-scaled,
    * as (k, v) rows: k ∈ [0, d²) = row-major Σqᵢqⱼ, k ∈ [d², d²+d) =
    * Σqᵢ, k = d²+d = count. One narrow explode + one groupBy. */
  def momentDeltas(corpus: DataFrame, vecCol: String, d: Int,
                   sign: Int = 1): DataFrame = {
    val q = microVec(col(vecCol))
    corpus.select(posexplode(concat(
        flatten(transform(q, qi => transform(q, qj => qi * qj))),
        q, array(lit(1L)))).as(Seq("k", "__v")))
      .groupBy(col("k")).agg((sum(col("__v")) * sign).as("v"))
  }

  /** Fold moment deltas: exact integer addition per cell. */
  def mergeMoments(deltas: DataFrame*): DataFrame =
    deltas.reduce(_.unionByName(_))
      .groupBy(col("k")).agg(sum(col("v")).as("v"))

  /** Fit (μ_micro, v₁) from collected moments (d²+d+1 longs — control
    * data): TRUNCATED integer means (toward zero — the semantics both
    * JVM `/` and an external engine's integer `//` share; floor division
    * would disagree on negative sums), integer centered scatter
    * C = Q − S·μᵀ − μ·Sᵀ + n·μμᵀ, then the usual index-ordered power
    * iteration on C as doubles (exact long→double, |C| < 2⁵³). */
  def fitFromMoments(moments: Seq[(Int, Long)], d: Int,
                     iters: Int = 8): (Seq[Long], Seq[Double]) = {
    val m = moments.toMap
    val n = m(d * d + d)
    require(n > 0, "empty moment state")
    val s = (0 until d).map(i => m(d * d + i))
    val mu = s.map(x => x / n)
    val g = (0 until d).map { i =>
      (0 until d).map { j =>
        (m(i * d + j) - s(i) * mu(j) - mu(i) * s(j)
          + n * mu(i) * mu(j)).toDouble
      }.toSeq
    }.toSeq
    (mu, powerIterate(g, iters))
  }

  /** Projection under the moment-fit model: centered in exact micro
    * integers, index-ordered fold against v₁ literals, one division at
    * the end. Narrow — no join, no shuffle. */
  def pc1ProjectionMoments(corpus: DataFrame, idCol: String, vecCol: String,
                           muMicro: Seq[Long], v1: Seq[Double]): DataFrame = {
    val muLit = typedlit(muMicro)
    val vLit = typedlit(v1)
    val centered = transform(microVec(col(vecCol)),
      (x, i) => (x - element_at(muLit, i + lit(1))).cast("double")
        * element_at(vLit, i + lit(1)))
    val proj = aggregate(centered, lit(0.0), (a, b) => a + b)
    corpus.select(col(idCol), round(proj / lit(1e6), 6).as("pc1"))
  }
}
