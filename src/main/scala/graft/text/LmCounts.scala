package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model COUNT TABLES with Kneser–Ney smoothing — the
  * batch substrate a KenLM-style corpus LM is estimated from (Kneser &
  * Ney 1995; Heafield 2011). [[Curation.lmScore]] scores documents against
  * raw trigram frequencies; this builds the properly-smoothed conditional
  * table itself: interpolated absolute discounting, where the backoff mass
  * goes to the CONTINUATION distribution (how many distinct left contexts
  * a word follows) rather than raw unigram frequency.
  *
  * Shape at scale: bigram extraction is a narrow adjacency zip over each
  * document's token array (no per-position window shuffle); the single
  * corpus-scale exchange is the (w1, w2) count groupBy (map-side
  * combined). The marginal tables — left totals c(w1,·), fan-out
  * N1+(w1,·), continuation fan-in N1+(·,w2) — are vocab-scale GROUP BYs
  * over the bigram-type table, and their joins back are AQE-broadcast at
  * any realistic vocabulary. The top-k is TakeOrdered, never a global
  * sort.
  *
  * Determinism: every probability is a fixed-order arithmetic tree over
  * integer counts (no FP accumulation across rows), so the rounded values
  * hash-match an external SQL oracle replaying the same expression.
  *
  * Reference scope: extension surface — qvarn-mr has no text analytics
  * (opaque JSON values, func.py:34-43).
  */
object LmCounts {

  /** Interpolated-KN bigram table, top `k` bigrams by count:
    * (w1, w2, cnt, p_kn) with discount `d`.
    *
    *   p_kn(w2|w1) = (c(w1,w2) − d)/c(w1,·)
    *               + d·N1+(w1,·)/c(w1,·) · N1+(·,w2)/|bigram types|
    */
  def knBigrams(docs: DataFrame, textCol: String,
                k: Int = 100, d: Double = 0.75): DataFrame = {
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
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
