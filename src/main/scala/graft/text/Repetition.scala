package graft.text

import graft.dedup.DocDedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals: the "repetitious document"
  * family of filters a pretraining pipeline applies after language-ID and
  * before dedup (Rae et al. 2021 §A1.1 — fraction of the document taken by
  * its most frequent word / n-gram, fraction of duplicate n-grams).
  *
  * Everything is a composed native expression over ONE tokenization per row
  * (the single-element `transform` bind — see
  * [[TextFunctions]]), so the whole gate stays a narrow codegen'd
  * projection: no shuffle, no UDF, column-pruned scan. The top-word /
  * top-bigram counts are O(distinct × n) per document — word-count-bounded
  * driver-free compute that scales linearly with corpus size.
  *
  * All ratios are exact IEEE divisions of integer counts, so every signal
  * is hash-checkable against an external SQL oracle.
  *
  * Reference scope: the qvarn-mr engine has no text analytics (its values
  * are opaque JSON — func.py:34-43); this family is part of the
  * training-data extension surface.
  */
object Repetition {

  /** Signals struct: `n_words`, `top_word_frac` (occurrences of the most
    * frequent word / word count), `top_bigram_frac` (same over word
    * 2-grams), `dup_trigram_frac` (1 − distinct/total word 3-grams).
    * Documents too short for an n-gram level score 0.0 there. */
  def signals(text: Column): Column =
    element_at(transform(array(TextFunctions.tokens(text)), toks => {
      val nw = size(toks)
      def topFrac(grams: Column, total: Column): Column = {
        val top = array_max(transform(array_distinct(grams),
          g => size(filter(grams, t => t === g))))
        top.cast("double") / total
      }
      val bigramFrac = when(nw >= 2,
        topFrac(DocDedup.shinglesOfTokens(toks, 2), nw - 1)).otherwise(lit(0.0))
      val trigrams = DocDedup.shinglesOfTokens(toks, 3)
      val dupTrigramFrac = when(nw >= 3,
        lit(1.0) - size(array_distinct(trigrams)).cast("double") / (nw - 2))
        .otherwise(lit(0.0))
      struct(
        nw.cast("long").as("n_words"),
        topFrac(toks, nw).as("top_word_frac"),
        bigramFrac.as("top_bigram_frac"),
        dupTrigramFrac.as("dup_trigram_frac"))
    }), 1)

  /** The repetition gate: true iff every signal is at or below its
    * threshold. Defaults are tuned so a natural corpus splits (Gopher's
    * published thresholds are corpus-specific; these are calibrated to the
    * synthetic tables' small-vocabulary regime). */
  def keep(sig: Column,
           maxTopWordFrac: Double = 0.12,
           maxTopBigramFrac: Double = 0.08,
           maxDupTrigramFrac: Double = 0.05): Column =
    sig.getField("top_word_frac") <= maxTopWordFrac &&
      sig.getField("top_bigram_frac") <= maxTopBigramFrac &&
      sig.getField("dup_trigram_frac") <= maxDupTrigramFrac

  /** Per-document signal table: (idCol, n_words, top_word_frac,
    * top_bigram_frac, dup_trigram_frac, keep). */
  def signalTable(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sig = signals(col(textCol))
    docs.select(col(idCol), sig.as("__sig"))
      .select(col(idCol),
        col("__sig.n_words").as("n_words"),
        col("__sig.top_word_frac").as("top_word_frac"),
        col("__sig.top_bigram_frac").as("top_bigram_frac"),
        col("__sig.dup_trigram_frac").as("dup_trigram_frac"),
        keep(col("__sig")).as("keep"))
  }

  /** Corpus-informed rarity statistics: join each token occurrence against
    * the corpus-wide document-frequency table and fold back to one row per
    * document — the two-pass (corpus stats → per-doc score) shape every
    * statistical quality classifier uses.
    *
    * Output: (idCol, n_tok, sum_df, n_rare) where `sum_df` is the sum over
    * token occurrences of the token's document frequency and `n_rare`
    * counts occurrences of tokens appearing in ≤ `rareMaxDf` documents.
    * All-integer outputs — exact at any scale, order-independent.
    *
    * The df table is vocabulary-sized (≪ corpus at any scale — Heaps' law)
    * and BROADCAST, so the corpus side is scanned once, exploded, hash-
    * joined in place and partially aggregated map-side before the single
    * per-doc count shuffle. */
  def docFreqStats(docs: DataFrame, textCol: String, idCol: String,
                   rareMaxDf: Long): DataFrame = {
    val occ = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__word"))
    val df = docs
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("__word"))
      .groupBy(col("__word"))
      .agg(count(lit(1)).as("__df"))
    occ.join(broadcast(df), "__word")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("__df")).as("sum_df"),
        sum(when(col("__df") <= rareMaxDf, 1L).otherwise(0L)).as("n_rare"))
  }

  /** N-gram NOVELTY per document — the memorization/diversity signal: the
    * fraction of a doc's distinct word trigrams that appear in NO other
    * document (trigram document frequency 1). High-novelty docs carry
    * unique content; near-zero novelty marks template/boilerplate bodies
    * the span-level dedup gates then confirm. Shape: one distinct
    * (doc, trigram) shuffle, a trigram-df aggregation, one join back —
    * all corpus-linear, no pair joins. Novelty is a nano-ladder integer
    * division (engine-exact); docs with fewer than 3 words report 0/0
    * with novelty 0. Output: (idCol, n_tri, n_novel, novelty). */
  /** Distinct (key, word-trigram) pairs — the shared substrate of the
    * novelty reports. */
  private def distinctTrigrams(docs: DataFrame, textCol: String,
                               keyCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(keyCol), toks.as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(keyCol), explode(transform(
        sequence(lit(1), size(col("__t")) - 2),
        i => concat_ws(" ",
          element_at(col("__t"), i),
          element_at(col("__t"), i + 1),
          element_at(col("__t"), i + 2)))).as("__g"))
      .distinct()
  }

  def ngramNovelty(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tris = distinctTrigrams(docs, textCol, idCol)
    // (trigram, salt) re-key for AQE skew-splittability — see
    // Curation.dupSpans: a trigram shared by a large fraction of docs is
    // a corpus-scale hot key in the join-back
    val df3 = tris
      .groupBy(col("__g"), pmod(xxhash64(col("__g")), lit(16)).as("__z"))
      .agg(count(lit(1)).as("__df"))
      .drop("__z")
    val per = tris.join(df3, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_tri"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("__n_novel"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("__n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("__n_tri"), lit(0L)) > 0,
          call_function("div", col("__n_novel") * lit(1000000000L),
            col("__n_tri")) / lit(1e9))
          .otherwise(lit(0.0)).as("novelty"))
  }

  /** SOURCE-level novelty — the mixture-decision counterpart of
    * [[ngramNovelty]]: per source, the fraction of its distinct word
    * trigrams appearing in NO other source. A high-novelty source adds
    * content the mix does not already have; a near-zero one is mostly
    * redundant with the rest (the complement of the sketch-estimated
    * overlap family). Same corpus-linear shape, grouped one level up.
    * Output: (keyCol, n_tri, n_novel, novelty). */
  def sourceNovelty(docs: DataFrame, textCol: String,
                    sourceCol: String): DataFrame = {
    val tris = distinctTrigrams(docs, textCol, sourceCol)
    val sc = tris.groupBy(col("__g")).agg(count(lit(1)).as("__sc"))
    tris.join(sc, "__g")
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("__sc") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col(sourceCol), col("n_tri"), col("n_novel"),
        (call_function("div", col("n_novel") * lit(1000000000L),
          col("n_tri")) / lit(1e9)).as("novelty"))
  }
}
