package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model COUNT TABLES with Kneser–Ney smoothing — the
  * batch substrate a KenLM-style corpus LM is estimated from (Kneser &
  * Ney 1995; Heafield 2011). [[Curation.lmScore]] scores documents against
  * raw trigram frequencies; this builds the properly-smoothed conditional
  * tables themselves: interpolated absolute discounting (discount fixed at
  * 3/4 — see below), where the backoff mass goes to the CONTINUATION
  * distribution (how many distinct left contexts a word follows) rather
  * than raw unigram frequency.
  *
  * Shape at scale: n-gram extraction is a narrow adjacency zip over each
  * document's token array (no per-position window shuffle); the single
  * corpus-scale exchange per order is the n-gram count groupBy (map-side
  * combined). The marginal tables — context totals c(·), fan-outs N1+,
  * continuation fan-ins — are vocab-scale GROUP BYs over the n-gram-type
  * table, and their joins back are AQE-broadcast at any realistic
  * vocabulary. Top-k outputs are TakeOrdered, never a global sort.
  *
  * Determinism — the INTEGER NANO-UNIT ladder: probabilities are derived
  * bottom-up as integer nano-units (×10⁹) with pure integer arithmetic
  * and floor division (`DIV`), never FP rounding:
  *
  *   pcont(w2)        = N1+(·,w2)·G  DIV  |bigram types|
  *   pb(w2|w1)        = ((4c−3)·G + 3·N1+(w1,·)·pcont)  DIV  4c(w1,·)
  *   p3(w3|w1,w2)     = ((4c−3)·G + 3·N1+(w1w2,·)·pb)   DIV  4c(w1w2,·)
  *
  * (G = 10⁹; 4·(c − 3/4) = 4c − 3 keeps the 3/4 discount integral.)
  * A conventional `round(x, 6)` formulation here is NOT reproducible:
  * these probabilities are rationals whose exact values frequently land
  * on .5 decimal boundaries (the once-rounded backoff term puts them on
  * the 10⁻⁶ grid), and engines disagree on boundary doubles — observed
  * 7/16k disagreements at sf0.01. Integer floor division has no
  * boundary; both engines produce the same BIGINT, and the published
  * double is `nano / 10⁹` of identical integers. Quantization error is
  * < 2 nano per value. Numerator magnitudes stay < ~10¹⁴ for any
  * realistic count profile (BIGINT-safe; a 10²⁰-token corpus would move
  * this ladder to DECIMAL(38,0) in both engines unchanged).
  *
  * Reference scope: extension surface — qvarn-mr has no text analytics
  * (opaque JSON values, func.py:34-43).
  */
object LmCounts {

  private val G = 1000000000L

  /** Integer division on longs (Spark's built-in `div` — IntegralDivide,
    * exact). Operands here are positive, so truncation and floor agree —
    * and agree with an external engine's `//`. */
  private def idiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** (w1, w2, cnt) bigram counts of a doc set, `sign`-scaled — like
    * [[Bpe.wordCounts]], the additive unit of n-gram state: counts are
    * an abelian group, so incremental/streaming maintenance is delta
    * folding, never a corpus re-read. */
  def bigramCounts(docs: DataFrame, textCol: String,
                   sign: Int = 1): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (l, r) => struct(l.as("w1"), r.as("w2")))).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg((count(lit(1)) * sign).as("cnt"))
  }

  /** Fold bigram-count deltas: sum per type, drop retracted-to-zero. */
  def mergeBigramCounts(deltas: DataFrame*): DataFrame =
    deltas.reduce(_.unionByName(_))
      .groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0)

  /** Bigram TYPE table with interpolated-KN probabilities in integer
    * nano-units, FULL: (w1, w2, cnt, __pb_nano: long). Public so a
    * caller can PERSIST the estimated model once and serve the
    * bigram/trigram/scoring queries from it (estimate once, serve
    * many — the BM25/ANN index pattern). */
  def bigramNano(docs: DataFrame, textCol: String): DataFrame =
    bigramNanoFromCounts(bigramCounts(docs, textCol))

  /** Same ladder from an explicit (maintained) count table — estimation
    * cost is vocab-scale, so maintenance only keeps counts current. */
  def bigramNanoFromCounts(bigrams: DataFrame): DataFrame = {
    val cached = graft.ops.Caches.track(bigrams)
    // vocab-scale marginals over bigram TYPES: rows of `cached` are unique
    // per (w1, w2), so count(*) per side IS the distinct fan-out/fan-in
    val left = cached.groupBy(col("w1"))
      .agg(sum(col("cnt")).as("__c_left"), count(lit(1)).as("__n_follow"))
    val cont = cached.groupBy(col("w2")).agg(count(lit(1)).as("__n_prec"))
    val types = cached.count()
    val pcont = idiv(col("__n_prec") * lit(G), lit(types))
    cached
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .select(col("w1"), col("w2"), col("cnt"),
        // floor at 1 nano: a context with >~2.5e8 count and a rare
        // continuation would otherwise quantize to 0 → ln(0) = -Inf in
        // knScore. 1 nano keeps the ladder log-safe at any corpus size.
        greatest(idiv((col("cnt") * 4 - 3) * lit(G)
            + lit(3) * col("__n_follow") * pcont,
          col("__c_left") * 4), lit(1L)).as("__pb_nano"))
  }

  /** Bigram KN table, FULL: (w1, w2, cnt, p_kn) — p_kn is the nano
    * integer published as a double (exact 9-decimal fixed point). */
  def knBigramTable(docs: DataFrame, textCol: String): DataFrame =
    bigramNano(docs, textCol)
      .select(col("w1"), col("w2"), col("cnt"),
        (col("__pb_nano") / lit(1e9)).as("p_kn"))

  /** Top-`k` bigrams of [[knBigramTable]] by count (ties → w1, w2). */
  def knBigrams(docs: DataFrame, textCol: String, k: Int = 100): DataFrame =
    knBigramTable(docs, textCol)
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)

  /** Top-`k` KN bigrams estimated from a MAINTAINED count table. */
  def knBigramsFromCounts(bigrams: DataFrame, k: Int = 100): DataFrame =
    bigramNanoFromCounts(bigrams)
      .select(col("w1"), col("w2"), col("cnt"),
        (col("__pb_nano") / lit(1e9)).as("p_kn"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)

  /** Per-document trigram structs: (idCol, w1, w2, w3) — one narrow
    * adjacency zip per row. */
  private def docTrigrams(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // clamp: a 1-token doc (or whitespace text tokenizing to [""]) gives
    // size-2 = -1, and Slice throws on negative length — yield [] instead
    val n3 = greatest(size(toks) - 2, lit(0))
    docs.select(col(idCol), explode(zip_with(
        zip_with(
          slice(toks, lit(1), n3),
          slice(toks, lit(2), n3),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(toks, lit(3), n3),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3")))).as("__t"))
      .select(col(idCol), col("__t.w1").as("w1"), col("__t.w2").as("w2"),
        col("__t.w3").as("w3"))
  }

  /** FULL trigram-type table in nano-units: (w1, w2, w3, cnt,
    * __p3_nano). The top order discounts raw counts and interpolates
    * into the bigram nano ladder; every adjacent (w2,w3) inside a
    * trigram is itself a corpus bigram, so the backoff join is total. */
  def trigramNano(docs: DataFrame, textCol: String): DataFrame =
    trigramNanoFrom(docs, textCol, bigramNano(docs, textCol))

  /** Same, reusing an already-estimated (e.g. persisted) bigram nano
    * table for the backoff level. */
  def trigramNanoFrom(docs: DataFrame, textCol: String,
                      bigramNanoTable: DataFrame): DataFrame = {
    val tris = graft.ops.Caches.track(
      docTrigrams(docs.withColumn("__discard", lit(0)), textCol, "__discard")
        .groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("cnt")))
    val ctx = tris.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("__c_ctx"), count(lit(1)).as("__n_follow"))
    val lower = bigramNanoTable
      .select(col("w1").as("w2"), col("w2").as("w3"),
        col("__pb_nano").as("__pb"))
    tris
      .join(ctx, Seq("w1", "w2"))
      .join(lower, Seq("w2", "w3"))
      .select(col("w1"), col("w2"), col("w3"), col("cnt"),
        // same 1-nano floor as the bigram level (log-safety at scale)
        greatest(idiv((col("cnt") * 4 - 3) * lit(G)
            + lit(3) * col("__n_follow") * col("__pb"),
          col("__c_ctx") * 4), lit(1L)).as("__p3_nano"))
  }

  /** FULL trigram table: (w1, w2, w3, cnt, p_kn). */
  def knTrigramTable(docs: DataFrame, textCol: String): DataFrame =
    trigramNano(docs, textCol)
      .select(col("w1"), col("w2"), col("w3"), col("cnt"),
        (col("__p3_nano") / lit(1e9)).as("p_kn"))

  /** Top-`k` trigrams by count (ties → words). */
  def knTrigrams(docs: DataFrame, textCol: String, k: Int = 100): DataFrame =
    knTrigramTable(docs, textCol)
      .orderBy(col("cnt").desc, col("w1"), col("w2"), col("w3"))
      .limit(k)

  /** Good–Turing count-of-counts table over unigram frequencies — the
    * other classical smoothing substrate (Good 1953): N_r = number of
    * word types occurring exactly r times, with the adjusted count
    * r* = (r+1)·N_{r+1}/N_r where N_{r+1} exists (null on the tail).
    * r* rides the integer nano ladder (floor division — these small-
    * integer ratios hit decimal rounding boundaries constantly).
    * Corpus-scale word count, then count-distribution-scale (tiny)
    * aggregation and a self-join on r+1. */
  def countOfCounts(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__r"))
    val byR = graft.ops.Caches.track(
      words.groupBy(col("__r").as("r")).agg(count(lit(1)).as("n_types")))
    val next = byR.select((col("r") - 1).as("r"), col("n_types").as("__n_next"))
    byR.join(next, Seq("r"), "left")
      .select(col("r"), col("n_types"),
        (idiv((col("r") + 1) * col("__n_next") * lit(G), col("n_types"))
          / lit(1e9)).as("r_star"))
  }

  /** Per-document negative log-likelihood under the SMOOTHED trigram
    * model — the properly-backed-off upgrade of [[Curation.lmScore]]'s
    * raw-frequency score: (idCol, n_tri, kn_nll) for docs with ≥3
    * tokens. The corpus is self-scored, so every doc trigram exists in
    * the model table and the join is total.
    *
    * Reproducibility: ln runs on the identical `nano/10⁹` doubles and
    * quantizes to integer nano-units per trigram BEFORE the per-doc sum,
    * so aggregation is exact integer addition under any merge order; the
    * single division at the end is deterministic from identical
    * integers. */
  def knScore(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    knScoreFrom(docs, textCol, idCol, trigramNano(docs, textCol))

  /** Same, scoring against an already-estimated (persisted) trigram
    * nano model. */
  def knScoreFrom(docs: DataFrame, textCol: String, idCol: String,
                  trigramNanoTable: DataFrame): DataFrame = {
    val model = trigramNanoTable
      .select(col("w1"), col("w2"), col("w3"),
        (col("__p3_nano") / lit(1e9)).as("__p"))
    docTrigrams(docs, textCol, idCol)
      .join(model, Seq("w1", "w2", "w3"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(round(log(col("__p")) * lit(1e9)).cast("long")).as("__nano"))
      .select(col(idCol), col("n_tri"),
        round(-(col("__nano") / (col("n_tri") * lit(1e9))), 6).as("kn_nll"))
  }

  /** Publish a (persisted) bigram nano model as the user-facing table:
    * top-`k` by count, p_kn as the exact 9-decimal double. */
  def publishBigrams(bigramNanoTable: DataFrame, k: Int): DataFrame =
    bigramNanoTable
      .select(col("w1"), col("w2"), col("cnt"),
        (col("__pb_nano") / lit(1e9)).as("p_kn"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)

  /** Publish a (persisted) trigram nano model: top-`k` by count. */
  def publishTrigrams(trigramNanoTable: DataFrame, k: Int): DataFrame =
    trigramNanoTable
      .select(col("w1"), col("w2"), col("w3"), col("cnt"),
        (col("__p3_nano") / lit(1e9)).as("p_kn"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"), col("w3"))
      .limit(k)
}
