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
}
