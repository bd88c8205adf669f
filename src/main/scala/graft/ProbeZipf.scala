package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Zipfian-vocabulary corpus + scale probes for the text
  * family. The driver fixtures have 31 DISTINCT words at every scale
  * factor, so every "distinct-word-scale / Heaps-bounded / broadcast
  * join-back" claim (Unigram, Bpe, HeavyHitters, BM25 postings, shingle
  * distributions) was untested where it matters: this harness synthesizes
  * a ~10⁵-distinct-word corpus with a realistic rank-frequency law and
  * re-runs those paths at two corpus sizes, printing wall times and the
  * OBSERVED plan decisions (does the encode join-back stay broadcast?
  * does it flip to shuffle cleanly?).
  *
  * Determinism: every sample derives from splitmix64 of (docId, position)
  * — no RNG state, so the corpus is identical across runs, partitionings,
  * and JVMs; UnigramSpec pins bake-off constants derived from it.
  */
object ZipfCorpus {

  /** splitmix64 — the standard 64-bit finalizer (public domain constant
    * set; same mixer Spark's xxhash uses internally for avalanche). */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val syllables: Array[String] = {
    // onsets include clusters and the vowels pair with optional codas, so
    // the 2-4-char substring space is RICH (a pure CV grid caps distinct
    // pieces at a few thousand and makes greedy longest-match trivially
    // optimal — measured on the first fixture revision)
    val onset = Array("b", "d", "k", "l", "m", "n", "p", "r", "s", "t",
      "st", "tr", "ch", "pl", "gr")
    val rhyme = Array("a", "e", "i", "o", "u", "an", "er", "in", "on", "us")
    for (c <- onset; v <- rhyme) yield c + v // 150 syllables, 2-4 chars
  }
  private val suffixes = Array("", "s", "ing", "tion", "ed", "al")

  /** Injective rank → word. Base-150 syllable encoding keeps the HEAD
    * short and the tail growing logarithmically (rank 10⁵ → 2-3
    * syllables), matching the natural-language length-frequency
    * correlation; rank-hashed SUFFIXES create the crossing pieces
    * (\"-ing\", \"-tion\") where greedy longest-match genuinely diverges
    * from the Viterbi optimum, and every 17th rank doubles into a compound
    * (the Viterbi round-count stressor). */
  def wordFor(rank: Long): String = {
    def enc(r0: Long): String = {
      var r = r0
      val sb = new StringBuilder
      do { sb.append(syllables((r % 150).toInt)); r /= 150 } while (r > 0)
      sb.toString
    }
    val base = enc(rank) + suffixes(((mix(rank * 13 + 5) >>> 41) % 6).toInt)
    if (rank % 17 == 0) base + enc(mix(rank) >>> 47) else base
  }

  /** Zipf(s≈1) rank sample over [0, vocab): inverse-CDF via rank =
    * floor(vocab^u) with u uniform from the hash — P(rank = r) ∝ 1/r. */
  def zipfRank(h: Long, vocab: Int): Long = {
    val u = (h >>> 11).toDouble / (1L << 53).toDouble // [0, 1)
    math.min(vocab - 1L, math.exp(u * math.log(vocab.toDouble)).toLong - 1L)
      .max(0L)
  }

  /** The corpus: `nDocs` documents over a `vocab`-word Zipfian vocabulary,
    * 40-119 words each, in the driver fixture's documents schema
    * (doc_id, text, lang, source, n_chars). Distributed generation —
    * spark.range partitions the id space; each row derives only from its
    * own id. */
  def corpus(spark: SparkSession, nDocs: Long, vocab: Int): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).as[Long].mapPartitions { it =>
      it.map { id =>
        // every 229th doc is a NEAR-COPY of its predecessor (same sampled
        // words + a 4-token id-specific tail) so the near-dup verify stage
        // has real work at every corpus size, not just candidate hashing
        val contentId = if (id % 229 == 0 && id > 0) id - 1 else id
        val nw = 40 + (mix(contentId * 31 + 7) >>> 40).toInt % 80
        val words = new Array[String](nw)
        var i = 0
        while (i < nw) {
          words(i) = wordFor(zipfRank(mix(contentId * 1000003L + i), vocab))
          i += 1
        }
        val tail =
          if (contentId != id)
            (0 until 4).map(j => wordFor(zipfRank(mix(id * 7919L + j), vocab)))
          else Seq.empty
        val text = (words ++ tail).mkString(" ")
        (id, text, "en", "src" + (id % 20), text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }
}

/** Scale probes over [[ZipfCorpus]] — run with
  * `sbt "runMain graft.ProbeZipf [nDocsSmall nDocsLarge vocab]"`.
  * Results are recorded in PLANS.md. */
object ProbeZipf {
  def main(args: Array[String]): Unit = {
    val nSmall = if (args.length > 0) args(0).toLong else 30000L
    val nLarge = if (args.length > 1) args(1).toLong else 300000L
    val vocab = if (args.length > 2) args(2).toInt else 120000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-zipf] $label%-42s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def joinKind(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      val kinds = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .filter(p.contains)
      if (kinds.isEmpty) "no-join" else kinds.mkString("+")
    }

    for (n <- Seq(nSmall, nLarge)) {
      println(s"--- corpus n=$n vocab=$vocab")
      val dir = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory(s"graft_zipf$n")).toString
      t("generate + write parquet") {
        ZipfCorpus.corpus(spark, n, vocab)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      val wc = graft.text.Bpe.wordCounts(docs, "text")
      val nDistinct = t("distinct words (Heaps probe)")(wc.count())
      println(s"[probe-zipf]   distinct words: $nDistinct")

      // unigram family at a REALISTIC inventory (8k multis + alphabet)
      val uvocab = t("unigram learn (vocabMulti=8192)")(
        graft.text.Unigram.learnFromCounts(wc, vocabMulti = 8192))
      println(s"[probe-zipf]   inventory size: ${uvocab.size}")
      val enc = graft.text.Unigram.encodedLength(docs, "text", "doc_id", uvocab)
      val vitTotal = t("unigram Viterbi encode (distinct-word DP)")(
        enc.agg(sum(col("n_tokens"))).head().getLong(0))
      println(s"[probe-zipf]   encode join-back: ${joinKind(enc)}")
      val encG = graft.text.Unigram.encodedLengthGreedy(docs, "text", "doc_id", uvocab)
      val greedyTotal = t("wordpiece greedy encode")(
        encG.agg(sum(col("n_tokens"))).head().getLong(0))
      println(s"[probe-zipf]   viterbi tokens=$vitTotal greedy=$greedyTotal " +
        f"fertility gap=${(greedyTotal - vitTotal).toDouble / vitTotal * 100}%.3f%%")
      // per-DISTINCT-word gap: where greedy's longest-match is a real trap
      locally {
        val costMap = uvocab.map(p =>
          p.piece -> (graft.text.Unigram.CostBase + p.rank)).toMap
        val pieceSet = uvocab.map(_.piece).toSet
        val gapWords = graft.text.Bpe.wordCounts(docs, "text")
          .select(col("__w")).as[String](org.apache.spark.sql.Encoders.STRING)
          .mapPartitions(ws => ws.map { w =>
            val v = graft.text.Unigram.encodeWord(w, costMap) /
              graft.text.Unigram.CostBase
            val g = graft.text.Unigram.encodeWordGreedy(w, pieceSet)
            if (g > v) 1L else 0L
          })(org.apache.spark.sql.Encoders.scalaLong)
          .reduce(_ + _)
        println(s"[probe-zipf]   distinct words where greedy > viterbi: $gapWords")
      }

      // the id data product + sharded packing at distinct-word scale
      val gids = graft.text.Unigram.greedyIds(docs, "text", "doc_id", uvocab)
      val packed = graft.text.Pack.packTokenIds(gids, "doc_id", "ids",
        seqLen = 2048, nShards = 32, eosId = 0)
      val (nSeqs, nTok) = t("greedy ids + pack (2048-token seqs, 32 shards)") {
        val r = packed.agg(count(lit(1)), sum(col("n_ids"))).head()
        (r.getLong(0), r.getLong(1))
      }
      println(s"[probe-zipf]   packed sequences: $nSeqs ($nTok tokens)")

      val merges = t("BPE learn (8 merges)")(
        graft.text.Bpe.learn(docs, "text", nMerges = 8))
      println(s"[probe-zipf]   merges: ${merges.map(m => m.lhs + "+" + m.rhs).mkString(", ")}")
      t("BPE encode") {
        graft.text.Bpe.encodedLength(docs, "text", "doc_id", merges)
          .agg(sum(col("n_bpe"))).head().getLong(0)
      }

      val hh = t("heavy hitters (>= 1/1000, MG capacity 2048)") {
        graft.text.HeavyHitters.frequentTerms(docs, "text", 1L, 1000L, 2048)
          .collect()
      }
      println(s"[probe-zipf]   heavy hitters: ${hh.length}")

      val idx = t("BM25 index build") {
        graft.text.Retrieval.buildIndex(docs, "text", "doc_id",
          s"$dir/bm25", numBuckets = 64)
      }
      t("BM25 query (5 terms, top-10)") {
        graft.text.Retrieval.bm25(spark, idx,
          Seq(ZipfCorpus.wordFor(0), ZipfCorpus.wordFor(3),
            ZipfCorpus.wordFor(17), ZipfCorpus.wordFor(4999),
            ZipfCorpus.wordFor(vocab - 2)).mkString(" "),
          k = 10).collect()
      }

      val pairs = t("minhash near-dup pairs (t=0.8)") {
        graft.dedup.DocDedup.nearDupPairs(docs, "text", "doc_id", 0.8).count()
      }
      println(s"[probe-zipf]   near-dup pairs: $pairs")
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
