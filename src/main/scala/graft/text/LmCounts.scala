package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model COUNT TABLES with Kneser–Ney smoothing — the
  * batch substrate a KenLM-style corpus LM is estimated from (Kneser &
  * Ney 1995; Heafield 2011). [[Curation.lmScore]] scores documents against
  * raw trigram frequencies; this builds the properly-smoothed conditional
  * tables themselves: interpolated absolute discounting, where the backoff
  * mass goes to the CONTINUATION distribution (how many distinct left
  * contexts a word follows) rather than raw unigram frequency.
  *
  * Shape at scale: n-gram extraction is a narrow adjacency zip over each
  * document's token array (no per-position window shuffle); the single
  * corpus-scale exchange per order is the n-gram count groupBy (map-side
  * combined). The marginal tables — context totals c(·), fan-outs N1+,
  * continuation fan-ins — are vocab-scale GROUP BYs over the n-gram-type
  * table, and their joins back are AQE-broadcast at any realistic
  * vocabulary. Top-k outputs are TakeOrdered, never a global sort.
  *
  * Determinism: every probability is a fixed-order arithmetic tree over
  * integer counts (no FP accumulation across rows), so the rounded values
  * hash-match an external SQL oracle replaying the same expression.
  *
  * Reference scope: extension surface — qvarn-mr has no text analytics
  * (opaque JSON values, func.py:34-43).
  */
object LmCounts {

  /** Bigram TYPE table with interpolated-KN probabilities, FULL (no
    * top-k): (w1, w2, cnt, p_kn) with discount `d`, p_kn rounded to 6.
    *
    *   p_kn(w2|w1) = (c(w1,w2) − d)/c(w1,·)
    *               + d·N1+(w1,·)/c(w1,·) · N1+(·,w2)/|bigram types|
    */
  def knBigramTable(docs: DataFrame, textCol: String,
                    d: Double = 0.75): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val bigrams = docs
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (l, r) => struct(l.as("w1"), r.as("w2")))).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    val cached = graft.ops.Caches.track(bigrams)
    // vocab-scale marginals over bigram TYPES: rows of `cached` are unique
    // per (w1, w2), so count(*) per side IS the distinct fan-out/fan-in
    val left = cached.groupBy(col("w1"))
      .agg(sum(col("cnt")).as("__c_left"), count(lit(1)).as("__n_follow"))
    val cont = cached.groupBy(col("w2")).agg(count(lit(1)).as("__n_prec"))
    val types = cached.count().toDouble
    cached
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .select(col("w1"), col("w2"), col("cnt"),
        round((col("cnt") - lit(d)) / col("__c_left")
          + lit(d) * col("__n_follow") / col("__c_left")
            * (col("__n_prec") / lit(types)), 6).as("p_kn"))
  }

  /** Top-`k` bigrams of [[knBigramTable]] by count (ties → w1, w2). */
  def knBigrams(docs: DataFrame, textCol: String,
                k: Int = 100, d: Double = 0.75): DataFrame =
    knBigramTable(docs, textCol, d)
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)

  /** Interpolated trigram KN, top `k` by count:
    * (w1, w2, w3, cnt, p_kn). The highest order discounts raw counts and
    * interpolates with the CONTINUATION-smoothed bigram model (the
    * published [[knBigramTable]] values — rounded once there, reused
    * verbatim here, so the composition is reproducible cross-engine):
    *
    *   p_kn(w3|w1,w2) = (c(w1w2w3) − d)/c(w1,w2,·)
    *                  + d·N1+(w1,w2,·)/c(w1,w2,·) · p_kn(w3|w2)
    *
    * Every adjacent (w2,w3) inside a trigram is itself a corpus bigram,
    * so the backoff join always matches. */
  def knTrigrams(docs: DataFrame, textCol: String,
                 k: Int = 100, d: Double = 0.75): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val n3 = size(toks) - 2
    val tris = docs
      .select(explode(zip_with(
        zip_with(
          slice(toks, lit(1), n3),
          slice(toks, lit(2), n3),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(toks, lit(3), n3),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3")))).as("__t"))
      .groupBy(col("__t.w1").as("w1"), col("__t.w2").as("w2"),
        col("__t.w3").as("w3"))
      .agg(count(lit(1)).as("cnt"))
    val cached = graft.ops.Caches.track(tris)
    val ctx = cached.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("__c_ctx"), count(lit(1)).as("__n_follow"))
    val lower = knBigramTable(docs, textCol, d)
      .select(col("w1").as("w2"), col("w2").as("w3"), col("p_kn").as("__pb"))
    cached
      .join(ctx, Seq("w1", "w2"))
      .join(lower, Seq("w2", "w3"))
      .select(col("w1"), col("w2"), col("w3"), col("cnt"),
        round((col("cnt") - lit(d)) / col("__c_ctx")
          + lit(d) * col("__n_follow") / col("__c_ctx") * col("__pb"),
          6).as("p_kn"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"), col("w3"))
      .limit(k)
  }
}
