package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the missing piece between the
  * corpus and every token-count / packing / mixing operator downstream:
  * learn the merge table from the corpus itself (Sennrich et al. 2016),
  * then encode with it.
  *
  * Spark-first shape, built around the classic BPE observation that
  * training state is the WORD-frequency table, not the corpus:
  *
  *   - one corpus-scale pass collapses the corpus to (word, count) —
  *     a groupBy with map-side combine; vocabulary grows ~O(corpus^0.7)
  *     (Heaps' law), so everything after is vocab-scale, not corpus-scale;
  *   - each merge round is one vocab-scale pair-count aggregation
  *     (explode adjacent symbol pairs → groupBy → sum(word count)) plus a
  *     TakeOrdered top-1 — per-partition top-k merged on the driver, never
  *     a global sort;
  *   - the winning pair is CONTROL data (two strings); applying it is a
  *     narrow string `replace` over the word table — no shuffle, and the
  *     8 rounds' replaces stack into one codegen'd projection;
  *   - encoding a document ([[encodedLength]]) replays the learned merges
  *     as literals inside a `transform` lambda — a pure narrow projection
  *     over the corpus, embarrassingly parallel at any scale.
  *
  * Determinism (the oracle seam): a word's symbol sequence is serialized
  * as `' ' + symbols.mkString("  ") + ' '` — every symbol bounded by
  * spaces on both sides (symbols themselves are space-free by
  * tokenization). A merge (L, R) is then EXACTLY the literal string
  * replacement `" L  R " → " LR "`: leftmost non-overlapping scan =
  * BPE's left-to-right greedy application ("a a a a" merges to
  * "aa aa", "a a a" to "aa a"), and both Spark's `replace` and an
  * external engine's `replace` implement the same scan, so the whole
  * training run — counts, tie-breaks (count desc, then lexicographic),
  * merge application — is bit-identical cross-engine. No RNG, no FP.
  *
  * Reference scope: qvarn-mr has no tokenizer (values are opaque JSON —
  * func.py:34-43); this is training-data extension surface next to
  * [[TextFunctions.subwordTokens]]'s static regex proxy.
  */
object Bpe {

  /** One merge: rank (1-based), the two symbols, and the weighted pair
    * count that won the round. */
  final case class Merge(rank: Int, lhs: String, rhs: String, cnt: Long)

  /** `' ' + chars("  ") + ' '` — the space-delimited symbol serialization
    * of a word (initial state: one symbol per character). */
  private def charSeq(word: Column): Column =
    concat(lit(" "),
      array_join(regexp_extract_all(word, lit("."), lit(0)), "  "),
      lit(" "))

  /** (word, count) of a doc set, scaled by `sign` — the additive unit of
    * word-frequency state. `sign = -1` retracts a doc set, so incremental
    * maintenance is union + sum (counts are an abelian group; the word
    * table needs no log replay, just delta folding). */
  def wordCounts(docs: DataFrame, textCol: String, sign: Int = 1): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg((count(lit(1)) * sign).as("__cnt"))

  /** Fold word-count deltas: sum per word, drop retracted-to-zero words. */
  def mergeCounts(deltas: DataFrame*): DataFrame =
    deltas.reduce(_.unionByName(_))
      .groupBy(col("__w")).agg(sum(col("__cnt")).as("__cnt"))
      .filter(col("__cnt") > 0)

  /** The (serialized symbol sequence, word count) table — the ONLY
    * corpus-scale pass of training. */
  private[text] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    serialize(wordCounts(docs, textCol))

  private def serialize(counts: DataFrame): DataFrame =
    counts.select(charSeq(col("__w")).as("__seq"), col("__cnt"))

  /** Adjacent-pair weighted counts of a word table: (lhs, rhs, cnt).
    * `size(syms) >= 1` always (split of "" is [""]), so the slice length
    * `size - 1` is never negative. */
  private[text] def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(trim(col("__seq")), "  ")
    words
      .select(col("__cnt"), syms.as("__s"))
      .select(col("__cnt"), explode(zip_with(
        slice(col("__s"), lit(1), size(col("__s")) - 1),
        slice(col("__s"), lit(2), size(col("__s")) - 1),
        (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("__p"))
      .groupBy(col("__p.lhs").as("lhs"), col("__p.rhs").as("rhs"))
      .agg(sum(col("__cnt")).as("cnt"))
  }

  /** Learn `nMerges` merges. The returned list is the tokenizer model —
    * control data (a few strings per rank). */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    learnFromCounts(wordCounts(docs, textCol), nMerges)

  /** Learn from an explicit (word, count) table — the entry point for
    * incrementally-maintained word-frequency state: training cost is
    * vocab-scale either way, so maintenance only has to keep the COUNTS
    * current, never re-reads the corpus. */
  def learnFromCounts(counts: DataFrame, nMerges: Int): Seq[Merge] = {
    import counts.sparkSession.implicits._
    // hold the CACHED frame in its own val: `words` is reassigned to a
    // derived plan each round, and unpersisting the derivative would not
    // sameResult-match the cached base — the cache would leak per call
    val base = serialize(counts).cache()
    var words = base
    base.count() // materialize the one corpus pass before iterating
    val learned = Seq.newBuilder[Merge]
    try {
      for (r <- 1 to nMerges) {
        val top = pairCounts(words)
          .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
          .limit(1)
          .as[(String, String, Long)].collect()
        if (top.nonEmpty) {
          val (l, ri, c) = top.head
          learned += Merge(r, l, ri, c)
          // narrow; rounds stack into one collapsed projection over the
          // cached base — vocab-scale work per round either way
          words = words.withColumn("__seq",
            replace(col("__seq"), lit(s" $l  $ri "), lit(s" $l$ri ")))
        }
      }
    } finally base.unpersist(blocking = false)
    learned.result()
  }

  /** The learned merge table as a frame: (merge_rank, lhs, rhs, cnt). */
  def mergeTable(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    import docs.sparkSession.implicits._
    learn(docs, textCol, nMerges)
      .map(m => (m.rank, m.lhs, m.rhs, m.cnt))
      .toDF("merge_rank", "lhs", "rhs", "cnt")
  }

  /** Per-document length in TRAINED-tokenizer tokens: apply the merges
    * (rank order) to every word's symbol string, count surviving symbols.
    * Pure narrow projection — merges ride as literals, the per-word
    * symbol count folds with `aggregate`, no join, no shuffle. */
  def encodedLength(docs: DataFrame, textCol: String, idCol: String,
                    merges: Seq[Merge]): DataFrame = {
    val encodeWord: Column => Column = w =>
      merges.foldLeft(charSeq(w)) { (s, m) =>
        replace(s, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} "))
      }
    val perWord: Column => Column = w => size(split(trim(encodeWord(w)), "  "))
    docs.select(col(idCol),
      aggregate(TextFunctions.tokens(col(textCol)), lit(0L),
        (acc, w) => acc + perWord(w).cast("long")).as("n_bpe"))
  }
}
