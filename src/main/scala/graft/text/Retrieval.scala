package graft.text

import graft.dedup.DocDedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval and term-weighting over the one-tokenization stream —
  * the lookup side of a training-data pipeline (inspect what's in the
  * corpus, rank documents against probe queries, compare sources).
  *
  * Scale shape shared by all three operators:
  *
  *   - term statistics (document frequency) are VOCABULARY-sized — Heaps'
  *     law keeps them ≪ corpus at any scale — so they broadcast;
  *   - per-(doc, term) weights need exactly one shuffle (the doc-term
  *     count), partially aggregated map-side;
  *   - floating-point scores that would be SUMMED across rows are fixed to
  *     integer micro-units per contribution first, so the fold is exact
  *     integer addition — same result under any partitioning, and the
  *     DuckDB oracle re-derives it bit-for-bit.
  *
  * No reference analogue (qvarn-mr has no text retrieval); the BM25
  * formulation is the standard Robertson/Sparck-Jones one.
  */
object Retrieval {

  /** Per-document term counts from one tokenization pass. */
  private def docTerms(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Vocabulary-sized document-frequency table. */
  private def docFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

  // ------------------------------------------------------------- TF-IDF

  /** Top-`k` TF-IDF terms per document: `tf * ln((N+1)/(df+1))` (smoothed),
    * ranked per doc with a deterministic (score desc, term asc) tie-break.
    * The score is one multiplication per (doc, term) — no float summation
    * anywhere — and the per-doc top-k runs as a WindowGroupLimit pushdown,
    * never a full sort. Output: (doc, term, tf, df, score_micro, rank)
    * with the score in integer micro-units. */
  def tfidfTopK(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val n = docs.count() // corpus size: one number, driver-side
    val weighted = docTerms(docs, textCol, idCol)
      .join(broadcast(docFreq(docs, textCol, idCol)), "term")
      .withColumn("score_micro",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)) * 1e6).cast("long"))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score_micro").desc, col("term"))
    weighted
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc").as(idCol), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rank"))
  }

  // ------------------------------------------------------------- BM25

  /** A persisted inverted index: postings hash-partitioned by term bucket so
    * a query reads only its terms' buckets (the IVF build/probe pattern
    * applied to text), with doc length denormalized onto each posting (no
    * per-query join against a doc-stats table) and the vocabulary-sized df
    * dictionary + corpus constants alongside. */
  final case class InvertedIndex(dir: String, numBuckets: Int, nDocs: Long, avgDlMicro: Long) {
    def postingsDir: String = s"$dir/postings"
    def dictDir: String = s"$dir/dict"
  }

  /** Build the index at `dir`: postings (term, doc, tf, dl) partitioned by
    * `pmod(hash(term), numBuckets)`; dictionary (term, df). One tokenization,
    * two shuffles (doc-term count, df count) — both map-side combined. */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String,
                 dir: String, numBuckets: Int = 64): InvertedIndex = {
    val dl = docs.select(col(idCol).as("doc"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
    val postings = docTerms(docs, textCol, idCol)
      .join(dl, "doc") // doc-keyed join; both sides shuffle on doc once
      .withColumn("bucket", pmod(hash(col("term")), lit(numBuckets)))
    postings
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    docFreq(docs, textCol, idCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/dict")
    val row = dl.agg(count(lit(1)), sum(col("dl"))).collect()(0)
    val (n, sumDl) = (row.getLong(0), row.getLong(1))
    // avgdl in micro-units: exact integer arithmetic end to end
    InvertedIndex(dir, numBuckets, n, sumDl * 1000000L / n)
  }

  /** BM25-ranked top-`k` documents for `query`. The query's terms hash to a
    * handful of buckets, so the probe is a statically partition-pruned read
    * of those directories — never a corpus or full-postings scan. Per-term
    * contributions round to integer micro-units before the per-doc sum, so
    * ranking is exact under any partitioning. Ties break (score desc, doc
    * asc). Output: (doc, score_micro, n_terms, rank). */
  def bm25(spark: SparkSession, index: InvertedIndex, query: String, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.trim.split("\\s+").toSeq.distinct.filter(_.nonEmpty)
    require(terms.nonEmpty, "empty query")
    // bucket ids via Spark's own hash() on a terms-literal frame (a local
    // job over a handful of rows) — guaranteed identical to the build-time
    // partitioning, no reimplementation of Spark's murmur3 on the driver
    val buckets = {
      import spark.implicits._
      terms.toDF("term")
        .select(pmod(hash(col("term")), lit(index.numBuckets)).as("b"))
        .collect().map(_.getInt(0)).toSeq.distinct
    }
    // partition value filter → PartitionFilters in the scan, static pruning
    val postings = spark.read.parquet(index.postingsDir)
      .filter(col("bucket").isin(buckets.distinct: _*))
      .filter(col("term").isin(terms: _*))
    val dict = spark.read.parquet(index.dictDir)
      .filter(col("term").isin(terms: _*))
    val n = index.nDocs.toDouble
    val avgDl = index.avgDlMicro.toDouble / 1e6
    val idf = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgDl)))
    val contrib = postings.join(broadcast(dict), "term")
      .withColumn("c_micro", round(idf * tfNorm * 1e6).cast("long"))
    val scored = contrib.groupBy(col("doc"))
      .agg(sum(col("c_micro")).as("score_micro"), count(lit(1)).as("n_terms"))
    val w = Window.orderBy(col("score_micro").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------------- source overlap

  /** Pairwise n-gram overlap between corpus slices (e.g. sources): for each
    * unordered slice pair, the count of shared distinct n-grams and the
    * Jaccard in micro-units — the inter-source duplication diagnostic that
    * tells you two crawls fed you the same content before you pay for
    * cross-source dedup. One distinct-shingle shuffle + one equi-join on
    * the shingle; output is slices², i.e. tiny. */
  def sourceOverlap(docs: DataFrame, textCol: String, sliceCol: String,
                    n: Int = 5): DataFrame = {
    val slices = docs
      .select(col(sliceCol).as("slice"),
        explode(array_distinct(DocDedup.shingles(col(textCol), n))).as("__sh"))
      .distinct()
    val sizes = slices.groupBy(col("slice")).agg(count(lit(1)).as("n_grams"))
    val a = slices.select(col("slice").as("slice_a"), col("__sh"))
    val bb = slices.select(col("slice").as("slice_b"), col("__sh"))
    val shared = a.join(bb, "__sh")
      .filter(col("slice_a") < col("slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("slice").as("slice_a"), col("n_grams").as("na"))), "slice_a")
      .join(broadcast(sizes.select(col("slice").as("slice_b"), col("n_grams").as("nb"))), "slice_b")
      .withColumn("union_grams", col("na") + col("nb") - col("shared"))
      // `div`, not `/`: Spark's Divide is double division, whose
      // round-to-nearest can disagree with integer floor near a boundary
      .withColumn("jaccard_micro", expr("(shared * 1000000) div union_grams"))
      .select(col("slice_a"), col("slice_b"), col("shared"), col("union_grams"),
        col("jaccard_micro"))
  }
}
