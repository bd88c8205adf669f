package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-means|| seeding (Bahmani et al., VLDB 2012) — the SCALABLE
  * initialization k-means needs at corpus size: instead of k sequential
  * corpus scans (k-means++, inherently serial) it oversamples ~l·k
  * candidates in a constant number of DISTRIBUTED rounds, weights them by
  * their attraction counts, and reduces to k seeds — here by the greedy
  * weight-ranked rule, followed by one quantized Lloyd polish.
  *
  * Every stochastic choice is DERANDOMIZED into md5 arithmetic and every
  * cost into exact integers, so the whole seeding — including which
  * candidates each sampling round picks — replays bit-for-bit in an
  * external engine:
  *
  *  - cost(x, C) = ⌊(1 − maxSim(x, C)) · 10⁶⌋ as a LONG (micro-units;
  *    the max-similarity double is identical cross-engine because the
  *    dot folds are index-ordered, so the floor is too);
  *  - φ = Σ cost is an order-free integer sum;
  *  - x is sampled iff u20(x, round) · φ < l · cost(x) · 2²⁰, where u20
  *    is the first 5 md5 hex digits of (salt:round:id) — the comparison
  *    runs in decimal(38,0)/HUGEINT, exact at any corpus size;
  *  - candidates order by id, weights break ties by id, cells are the
  *    weight-rank order.
  *
  * Scale shape: each round is one narrow corpus scan (literal centroid
  * set, no join, no shuffle beyond the two scalar aggregates); candidates
  * are control data (expected l per round, independent of corpus size);
  * the final assignment is [[Ivf.assignCells]]'s narrow projection. */
object KmeansPar {

  /** Expected-size-l·rounds candidate seed set, reduced to ≤ k weighted
    * seeds, then polished with `polishIters` quantized Lloyd passes.
    * Returns (cell, centroid) with cells 0..k−1 in weight-rank order. */
  def seed(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
           rounds: Int = 2, oversample: Int = 2, polishIters: Int = 1,
           salt: String = "kmpar"): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && rounds >= 1 && oversample >= 1, "bad k-means|| params")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import corpus.sparkSession.implicits._
    val l = oversample.toLong * k
    val vecs = corpus.select(col(idCol).cast("long").as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v")).cache()

    // seed candidate: the smallest-id vector (same convention as
    // Ivf.trainQuantized — deterministic, no hash involved)
    var cand: Seq[(Long, Seq[Double])] = vecs.orderBy(col("__id")).limit(1)
      .as[(Long, Seq[Double])].collect().toSeq

    for (r <- 1 to rounds) {
      val cents = cand.sortBy(_._1).zipWithIndex
        .map { case ((_, v), i) => i -> v }
      val withCost = vecs
        .withColumn("__n", sqrt(Similarity.dot(col("__v"), col("__v"))))
        .withColumn("__c", greatest(lit(0L),
          floor((lit(1.0) - Ivf.bestSim(col("__v"), col("__n"),
            Ivf.centLit(cents))) * lit(1000000.0)).cast("long")))
      // φ: exact integer sum — order-free, so reproducible anywhere
      val phi = withCost.agg(coalesce(sum(col("__c")), lit(0L)))
        .head().getLong(0)
      if (phi > 0) {
        // sample x iff u20 · φ < l · cost(x) · 2^20 — all-integer in
        // decimal(38,0), exact at any corpus size (no double ratios)
        val u20 = conv(substring(md5(concat(lit(s"$salt:r$r:"),
          col("__id").cast("string"))), 1, 5), 16, 10).cast("long")
        val dec = "decimal(38,0)"
        val picked = withCost
          .filter(u20.cast(dec) * lit(BigDecimal(phi)).cast(dec) <
            lit(BigDecimal(l) * BigDecimal(1L << 20)).cast(dec) *
              col("__c").cast(dec))
          .select(col("__id"), col("__v"))
          .as[(Long, Seq[Double])].collect().toSeq
        val have = cand.map(_._1).toSet
        cand = cand ++ picked.filterNot(p => have(p._1))
      }
    }

    // weight candidates by attraction count (nearest candidate, ties →
    // larger index — nearestCell's convention), then keep the k heaviest
    // (ties → smaller id); cells are the weight-rank order
    val candIdx = cand.sortBy(_._1).zipWithIndex
      .map { case ((id, v), i) => (i, id, v) }
    val weights = vecs
      .withColumn("__n", sqrt(Similarity.dot(col("__v"), col("__v"))))
      .select(Ivf.nearestCell(col("__v"), col("__n"),
        Ivf.centLit(candIdx.map(c => c._1 -> c._3))).as("cand"))
      .groupBy(col("cand")).agg(count(lit(1)).as("w"))
      .as[(Int, Long)].collect().toMap
    val top = candIdx
      .map { case (i, id, v) => (weights.getOrElse(i, 0L), id, v) }
      .sortBy { case (w, id, _) => (-w, id) }
      .take(k)
      .zipWithIndex.map { case ((_, _, v), cell) => cell -> v }

    val polished = (0 until polishIters).foldLeft(top) { (c, _) =>
      Ivf.lloydQuantizedOnce(vecs.select(col("__id"), col("__v")), c)
    }
    vecs.unpersist(blocking = false)
    polished
  }

  /** k-means|| end to end: seed, polish, assign. Output (idCol, cell). */
  def cluster(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
              rounds: Int = 2, oversample: Int = 2,
              polishIters: Int = 1): DataFrame =
    Ivf.assignCells(corpus, idCol, vecCol,
      seed(corpus, idCol, vecCol, k, rounds, oversample, polishIters))

  /** Weighted k-means trained ON the lightweight coreset — the payoff of
    * coresets: cluster structure learned from a control-sized weighted
    * sample (the coreset provably preserves k-means cost), then ONE
    * distributed assignment pass over the full corpus. The training loop
    * runs on the driver because the coreset fits anywhere BY
    * CONSTRUCTION; the corpus is touched exactly twice (coreset scan +
    * final assignment), vs one scan per Lloyd iteration for full k-means.
    *
    * Externally reproducible end to end: the coreset is [[lightweightCoreset]]'s
    * exact draw; seeds are the k smallest-id coreset points; assignment
    * sims fold index-ordered over the ORIGINAL doubles (max sim, ties →
    * larger cell — cellScores' rule); and each weighted mean is the
    * INTEGER ladder ⌊Σ(w_nano·x_micro) / Σw_nano⌋ with x_micro =
    * ⌊x·10⁶⌋ — order-free integer sums, so the oracle unrolls the same
    * iterations bit for bit. */
  def coresetKmeans(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, m: Int, iters: Int = 2,
                    salt: String = "coreset"): DataFrame = {
    require(k >= 1 && iters >= 0, "bad coreset-kmeans params")
    import corpus.sparkSession.implicits._
    // control-sized by construction — the collects ARE the design
    val weights: Map[Long, Long] = lightweightCoreset(
        corpus, idCol, vecCol, m, salt)
      .select(col(idCol).cast("long"), col("weight_nano"))
      .as[(Long, Long)].collect().toMap
    require(weights.nonEmpty, "empty coreset")
    val pts: Seq[(Long, Long, Seq[Double])] = corpus
      .select(col(idCol).cast("long").as("__id"),
        transform(col(vecCol), _.cast("double")).as("__v"))
      .filter(col("__id").isin(weights.keys.toSeq: _*))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, weights(id), v) }
      .sortBy(_._1).toSeq

    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j) * b(j); j += 1 }
      s
    }
    def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
    // nearest centroid, cellScores' exact rule: max sim, ties → larger
    // cell (ascending scan with >=), den==0 → sim 0
    def nearest(v: Seq[Double], vn: Double,
                cents: Seq[(Int, Seq[Double])]): Int = {
      var bestCell = cents.head._1
      var bestSim = Double.NegativeInfinity
      for ((cell, cv) <- cents.sortBy(_._1)) {
        val den = vn * norm(cv)
        val s = if (den == 0) 0.0 else dot(v, cv) / den
        if (s >= bestSim) { bestSim = s; bestCell = cell }
      }
      bestCell
    }

    // Gonzalez farthest-point seeding over the coreset (deterministic
    // k-center: start at the smallest id, repeatedly add the point with
    // the LOWEST max-similarity to the current seeds, ties → smallest
    // id) — id-ordered seeding would put all k seeds in whatever cluster
    // owns the low ids; farthest-point provably 2-approximates k-center
    // and spreads the seeds across modes
    var seeds: Vector[(Long, Long, Seq[Double])] = Vector(pts.head)
    while (seeds.size < k && seeds.size < pts.size) {
      val chosen = seeds.map(_._1).toSet
      val next = pts.filterNot(p => chosen(p._1)).map { p =>
        val vn = norm(p._3)
        val closest = seeds.map { s =>
          val den = vn * norm(s._3)
          if (den == 0) 0.0 else dot(p._3, s._3) / den
        }.max
        (closest, p)
      }.minBy { case (ms, p) => (ms, p._1) }._2
      seeds :+= next
    }
    var cents: Seq[(Int, Seq[Double])] = seeds
      .zipWithIndex.map { case ((_, _, v), i) => i -> v }
    val micro = pts.map { case (id, w, v) =>
      (id, w, v.map(x => math.floor(x * 1000000.0).toLong))
    }
    for (_ <- 0 until iters) {
      val assigned = pts.zip(micro).map { case ((_, _, v), (_, w, xm)) =>
        (nearest(v, norm(v), cents), w, xm)
      }
      cents = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (cell, rows) =>
          val wSum = rows.map(r => BigInt(r._2)).sum
          val dims = rows.head._3.indices.map { j =>
            val s = rows.map(r => BigInt(r._2) * BigInt(r._3(j))).sum
            // BigInt / truncates toward zero — DuckDB // and Spark div too
            (s / wSum).toLong / 1000000.0
          }
          cell -> dims.toSeq
      }
    }
    Ivf.assignCells(corpus, idCol, vecCol, cents)
  }

  /** Lightweight coreset sampling (Bachem, Lucic & Krause, KDD 2018):
    * a weighted subsample that provably preserves k-means cost — the
    * corpus-reduction step that lets cluster structure be trained on a
    * control-sized set. Sampling probability q(x) = 1/(2n) + c(x)/(2φ)
    * mixes uniform mass with cost mass around the corpus MEAN (one scan,
    * no seeding rounds); each kept point carries weight 1/(m·q).
    *
    * Derandomized and exact like [[seed]]: c(x) = ⌊(1 − sim(x, μ̄))·10⁶⌋
    * against the 6-decimal-quantized mean (the cross-engine pin), φ and
    * n are exact integer aggregates, and the draw keeps x iff
    * u20 · 2nφ < m · (φ + n·c) · 2²⁰ in decimal(38,0)/HUGEINT. The
    * emitted weight is the integer nano ladder
    * ⌊2nφ·10⁹ / (m·(φ + n·c))⌋ — so the whole sample, weights included,
    * replays externally. Output: (idCol, weight_nano), a pure filter +
    * projection over one corpus scan. */
  def lightweightCoreset(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, salt: String = "coreset"): DataFrame = {
    require(m >= 1, "coreset size must be >= 1")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    import corpus.sparkSession.implicits._
    val vecs = corpus.select(col(idCol), col(idCol).cast("long").as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v")).cache()
    // quantized corpus mean — same 6-decimal pin as the Lloyd means
    val mean: Seq[Double] = vecs
      .select(posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy(col("__pos")).agg(round(avg(col("__x")), 6).as("__m"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2).toSeq
    val withCost = vecs
      .withColumn("__n", sqrt(Similarity.dot(col("__v"), col("__v"))))
      .withColumn("__c", greatest(lit(0L),
        floor((lit(1.0) - Ivf.bestSim(col("__v"), col("__n"),
          Ivf.centLit(Seq(0 -> mean)))) * lit(1000000.0)).cast("long")))
    val (n, phi) = withCost
      .agg(count(lit(1)), coalesce(sum(col("__c")), lit(0L)))
      .as[(Long, Long)].head()
    vecs.unpersist(blocking = false)
    if (n == 0) return corpus.sparkSession.emptyDataFrame
      .withColumn(idCol, lit(0L)).withColumn("weight_nano", lit(0L))
      .limit(0)
    // φ = 0 (all points at the mean) degrades to uniform: q = 1/n —
    // the same formula with the cost term vanishing
    val u20 = conv(substring(md5(concat(lit(s"$salt:"),
      col("__id").cast("string"))), 1, 5), 16, 10).cast("long")
    val dec = "decimal(38,0)"
    val two20 = BigDecimal(1L << 20)
    if (phi == 0) {
      val keep = u20.cast(dec) * lit(BigDecimal(n)).cast(dec) <
        lit(BigDecimal(m) * two20).cast(dec)
      withCost.filter(keep)
        .select(col(idCol),
          lit((BigInt(n) * BigInt(1000000000L) / BigInt(m)).toLong)
            .as("weight_nano"))
    } else {
      val qDen = lit(BigDecimal(2) * BigDecimal(n) * BigDecimal(phi)).cast(dec)
      val qNum = (lit(BigDecimal(phi)).cast(dec) +
        lit(BigDecimal(n)).cast(dec) * col("__c").cast(dec))
      val keep = u20.cast(dec) * qDen <
        lit(BigDecimal(m) * two20).cast(dec) * qNum
      // `div` (not `/`): decimal `/` rounds at a fixed scale before any
      // floor, which can disagree with an exact integer division by one
      // ulp at .000000-boundaries; `div` truncates exactly, matching
      // DuckDB's `//` on HUGEINT (all operands positive here)
      withCost.filter(keep)
        .select(col(idCol),
          call_function("div",
            qDen * lit(BigDecimal(1000000000L)).cast(dec),
            lit(BigDecimal(m)).cast(dec) * qNum).cast("long")
            .as("weight_nano"))
    }
  }
}
