package graft.dedup

import graft.functions.GraftFunctions
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for a pretraining-data pipeline, at three rigor
  * levels: exact (hash), near-dup via MinHash+LSH banding, near-dup via
  * SimHash hamming buckets, and exact n-gram Jaccard verification.
  *
  * Scale design (100 TB of documents):
  *   - exact dedup = one hash-partitioned `groupBy` on a 128-bit content
  *     fingerprint — the only full shuffle, and it shuffles fingerprints,
  *     not documents;
  *   - MinHash signatures are a narrow projection (k=`numHashes` xxhash64
  *     passes over the shingle array, all native expressions — no UDF, no
  *     MLlib vector boxing);
  *   - LSH banding turns the quadratic all-pairs problem into
  *     `explode(bands)` + self-join on (band, bandHash) — candidate pairs
  *     only ever co-shuffle shingle SETS (computed once per doc, never
  *     re-derived from text per pair) of docs that share a band bucket;
  *   - rows-per-band defaults to 4: with 2 the bucket key is too weak and
  *     random low-similarity pairs flood the verify stage (measured 25×
  *     slowdown at sf0.1);
  *   - candidates are verified with exact Jaccard over the precomputed
  *     shingle sets before anything is dropped (no silent false positives).
  */
object DocDedup {

  /** Word n-gram shingles of the document (deterministic, lowercased).
    *
    * The tokenization is bound ONCE per row by threading it through a
    * single-element `transform` lambda: higher-order functions are
    * interpreted (no codegen, no common-subexpression elimination), so
    * referencing the raw `split()` expression from inside the per-shingle
    * lambda would re-run the regex split PER SHINGLE — O(tokens²) per
    * document (measured 3.0 s → 0.35 s on the sf0.1 corpus scan). A lambda
    * variable is an O(1) slot read. */
  def shingles(text: Column, n: Int = 3): Column =
    element_at(transform(array(TextFunctions.tokens(text)),
      toks => shinglesOfTokens(toks, n)), 1)

  /** Shingles over an already-bound token-array column. */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Exact dedup: keep one survivor per content fingerprint (smallest id). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    docs.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** (id, distinct shingle set) — the shared input of signature, banding and
    * verification. Computed exactly once per document. */
  private[dedup] def shingleSets(docs: DataFrame, textCol: String, idCol: String,
                          shingleN: Int): DataFrame =
    graft.ops.Par.ensure(docs.select(col(idCol).as("__id"), col(textCol)))
      .select(col("__id"),
        array_distinct(shingles(col(textCol), shingleN)).as("__sh"))

  /** k MinHash values over a shingle-set column: min over shingles of
    * xxhash64(shingle, seed_i). Native one-pass kernel
    * ([[graft.functions.MinHashSig]]); [[minhashSignatureOfSetsHof]] is the
    * bit-identical composed-HOF formulation kept as the spec cross-check. */
  def minhashSignatureOfSets(sh: Column, numHashes: Int): Column = {
    GraftFunctions.register(SparkSession.active)
    call_function("graft_minhash", sh, lit(numHashes))
  }

  /** Interpreted-HOF MinHash (reference semantics for the native kernel). */
  def minhashSignatureOfSetsHof(sh: Column, numHashes: Int): Column = {
    val seeds = array((0 until numHashes).map(lit(_)): _*)
    aggregate(sh, array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc, seeds, (a, seed) => least(a, xxhash64(s, seed))))
  }

  /** k MinHash values of the document text (convenience form). */
  def minhashSignature(text: Column, numHashes: Int = 32, shingleN: Int = 3): Column =
    minhashSignatureOfSets(array_distinct(shingles(text, shingleN)), numHashes)

  /** Exact Jaccard over two precomputed shingle-set columns. Native
    * single-pass kernel ([[graft.functions.JaccardSim]]) — the interpreted
    * `array_intersect`/`array_union` pair builds two scratch hash sets and
    * two result arrays per candidate pair. */
  def jaccardSets(sa: Column, sb: Column): Column = {
    GraftFunctions.register(SparkSession.active)
    call_function("graft_jaccard", sa, sb)
  }

  /** Built-in-functions Jaccard (reference semantics for the kernel). */
  def jaccardSetsHof(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Exact Jaccard similarity between the shingle sets of two text columns.
    * For pair-join use, prefer precomputing the sets once (nearDupPairs). */
  def jaccard(textA: Column, textB: Column, shingleN: Int = 3): Column =
    jaccardSets(array_distinct(shingles(textA, shingleN)),
      array_distinct(shingles(textB, shingleN)))

  /** Drop bucket groups larger than `cap` — a window count instead of a
    * groupBy+join: one shuffle on the same bucket key the candidate join
    * shuffles on anyway. */
  private[dedup] def capBuckets(banded: DataFrame, cap: Int,
                         keys: Seq[String] = Seq("__band", "__bucket")): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    banded.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  /** LSH banding candidates over precomputed (id, shingle set, signature). */
  private[dedup] def bandedBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("__id"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("__sig"), b * rows + 1, lit(rows))).as("bucket"))
      )).as("__b"))
      .select(col("__id"), col("__b.band").as("__band"), col("__b.bucket").as("__bucket"))

  /** LSH candidate pairs: docs sharing any (band, bandHash) bucket. */
  def lshCandidates(
      docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = shingleSets(docs, textCol, idCol, shingleN)
      .withColumn("__sig", minhashSignatureOfSets(col("__sh"), numHashes))
    val banded = // both join sides read this; released via Caches.release()
      graft.ops.Caches.track(bandedBuckets(sigs, bands, numHashes / bands))
    banded.alias("a").join(banded.alias("b"),
        col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Near-dup pairs: MinHash-LSH candidates verified with exact Jaccard over
    * the precomputed shingle sets (one shingle computation per doc, total).
    *
    * `maxBucketSize` (opt-in; default unlimited = exact w.r.t. the LSH
    * recall contract): a band bucket shared by m docs contributes m²/2
    * candidate pairs, so one degenerate bucket — a boilerplate shingle block
    * across millions of docs — can dominate the whole job at corpus scale.
    * Buckets above the cap are dropped BEFORE the self-join; this is the
    * standard explicit approximation, not a silent truncation: pairs inside
    * a dropped bucket are only lost if they share no other surviving band
    * (probability (1-s^rows)^(bands-1) for similarity s). */
  def nearDupPairs(
      docs: DataFrame, textCol: String, idCol: String, threshold: Double,
      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // The shingle-set and banded-bucket frames are each read from BOTH sides
    // of the candidate self-join (and `sets` again by the verify stage) —
    // cache them so shingling/MinHash run once per document, not once per
    // plan reference. At cluster scale these are the materialized signature
    // index a dedup pipeline persists anyway. Tracked in [[graft.ops.Caches]]
    // (the result is lazy, so the caller triggers the action and then calls
    // Caches.release()).
    val sets = graft.ops.Caches.track(shingleSets(docs, textCol, idCol, shingleN))
    val sigs = sets.withColumn("__sig", minhashSignatureOfSets(col("__sh"), numHashes))
    val banded = graft.ops.Caches.track(bandedBuckets(sigs, bands, numHashes / bands))
    pairsFromSigned(banded, sets, threshold, maxBucketSize)
  }

  /** Near-dup pairs ACROSS two document sets — the cross-set variant of
    * [[nearDupPairs]] (fuzzy benchmark DECONTAMINATION is the canonical
    * use: corpus documents that are near-duplicates of an eval-suite
    * document leak the benchmark even when no exact n-gram survives
    * paraphrase). Both sides sign once; candidates come from the
    * (band, bucket) equi-join with the probe side BROADCAST (an eval
    * suite is control-sized next to a corpus), then exact-Jaccard
    * verification. The corpus side's hot buckets cap exactly as in the
    * self-join path. Identity pairs are kept — a probe document present
    * verbatim in the corpus IS the contamination signal. Output:
    * (id_a = corpus id, id_b = probe id, jaccard). */
  def crossNearDupPairs(
      docs: DataFrame, probe: DataFrame, textCol: String, idCol: String,
      threshold: Double, numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sets = graft.ops.Caches.track(shingleSets(docs, textCol, idCol, shingleN))
    val banded0 = bandedBuckets(
      sets.withColumn("__sig", minhashSignatureOfSets(col("__sh"), numHashes)),
      bands, rows)
    val banded =
      if (maxBucketSize == Int.MaxValue) banded0
      else graft.ops.Caches.track(capBuckets(banded0, maxBucketSize))
    val psets = graft.ops.Caches.track(
      shingleSets(probe, textCol, idCol, shingleN))
    val pbanded = bandedBuckets(
      psets.withColumn("__sig", minhashSignatureOfSets(col("__sh"), numHashes)),
      bands, rows)
    val cands = banded.alias("a")
      .join(broadcast(pbanded.alias("p")),
        col("a.__band") === col("p.__band") &&
          col("a.__bucket") === col("p.__bucket"))
      .select(col("a.__id").as("id_a"), col("p.__id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sa")), "id_a")
      .join(broadcast(psets.select(col("__id").as("id_b"), col("__sh").as("__sb"))), "id_b")
      .withColumn("jaccard", jaccardSets(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Verified near-dup pairs from ALREADY-computed (and cached) banded
    * buckets + shingle sets — the self-join + exact-Jaccard verify stage of
    * [[nearDupPairs]], factored out so callers that already hold the signed
    * frames (e.g. [[LshIndex.buildWithPairs]], which also writes them to the
    * persisted index) don't re-shingle the corpus. */
  private[dedup] def pairsFromSigned(banded0: DataFrame, sets: DataFrame,
      threshold: Double, maxBucketSize: Int): DataFrame = {
    // the capped frame is itself read twice by the self-join; cache it too —
    // otherwise each side re-runs the capBuckets window shuffle
    val banded =
      if (maxBucketSize == Int.MaxValue) banded0
      else graft.ops.Caches.track(capBuckets(banded0, maxBucketSize))
    val cands = banded.alias("a").join(banded.alias("b"),
        col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sa")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sb")), "id_b")
      .withColumn("jaccard", jaccardSets(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Cross-engine md5 MinHash: hash i of a shingle set is the min over
    * shingles of the first-8-hex-digit u32 of md5("i:shingle") — any
    * engine with md5 reproduces the signature bit for bit. 16 md5 per
    * shingle makes this the SAMPLE-SIZED formulation ([[lshTune]]); the
    * xxhash64 kernel ([[minhashSignatureOfSets]]) remains the corpus
    * throughput path. Empty sets sign as 2^32 (above any u32). */
  def minhashSignatureMd5(sh: Column, numHashes: Int): Column = {
    val seeds = array((0 until numHashes).map(lit(_)): _*)
    aggregate(sh, array_repeat(lit(4294967296L), numHashes),
      (acc, s) => zip_with(acc, seeds, (a, seed) =>
        least(a, conv(substring(
          md5(concat(seed.cast("string"), lit(":"), s)), 1, 8), 16, 10)
          .cast("long"))))
  }

  /** LSH banding TUNER: measured precision/recall of candidate
    * generation for each (bands, rows) split of the signature, against
    * exact all-pairs ground truth — ON A DETERMINISTIC SAMPLE. This is
    * how the production (bands, rows) knob is chosen: the S-curve says
    * more bands → recall up / precision down, and this measures the
    * actual operating points on the corpus's own similarity
    * distribution. The sample is the `sampleSize` docs with the SMALLEST
    * md5 draws (bottom-k, a TakeOrdered — an ABSOLUTE size, because a
    * rate-based sample makes the all-pairs stage quadratic in corpus
    * size; bottom-k keeps the tuner O(sampleSize²) at ANY scale). The
    * deployed pipeline keeps the xxhash kernel. Docs with no shingles
    * are excluded (they carry no signal and would bucket-collide
    * vacuously). Output one row per choice: (bands, rows_per_band,
    * n_candidates, n_true, n_hits, precision, recall) — counts exact,
    * ratios truncating nano. */
  def lshTune(docs: DataFrame, textCol: String, idCol: String,
              threshold: Double, numHashes: Int, bandChoices: Seq[Int],
              sampleSize: Int, shingleN: Int = 3): DataFrame = {
    require(bandChoices.nonEmpty && bandChoices.forall(b =>
      b > 0 && numHashes % b == 0), "each bands choice must divide numHashes")
    val sample = docs
      .withColumn("__u",
        graft.text.Curation.hashUniform(col(idCol), "graft-lshtune"))
      .orderBy(col("__u"), col(idCol)).limit(sampleSize)
      .drop("__u")
    val sets = graft.ops.Caches.track(
      shingleSets(sample, textCol, idCol, shingleN)
        .filter(size(col("__sh")) > 0))
    val sigs = graft.ops.Caches.track(sets.select(col("__id"),
      minhashSignatureMd5(col("__sh"), numHashes).as("__sig")))
    // exact ground truth: all pairs WITHIN the sample
    val pairs = graft.ops.Caches.track(
      sets.select(col("__id").as("id_a"), col("__sh").as("__sa"))
        .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sb")),
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          jaccardSets(col("__sa"), col("__sb")).as("__j")))
    val nTrue = pairs.filter(col("__j") >= threshold)
      .agg(count(lit(1)).as("n_true"))
    val perConfig = bandChoices.map { b =>
      val r = numHashes / b
      val bandRows = sigs.select(col("__id"),
        explode(transform(sequence(lit(0), lit(b - 1)),
          k => struct(k.as("k"),
            array_join(transform(slice(col("__sig"), k * r + 1, lit(r)),
              _.cast("string")), ",").as("key")))).as("bk"))
        .select(col("__id"), col("bk.k").as("k"), col("bk.key").as("key"))
      val cand = graft.ops.Caches.track(
        bandRows.alias("x").join(bandRows.alias("y"),
          col("x.k") === col("y.k") && col("x.key") === col("y.key") &&
            col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
        .distinct())
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      val nh = cand.join(pairs, Seq("id_a", "id_b"))
        .filter(col("__j") >= threshold)
        .agg(count(lit(1)).as("n_hits"))
      nc.crossJoin(nh).select(lit(b).as("bands"),
        lit(r).as("rows_per_band"), col("n_candidates"), col("n_hits"))
    }.reduce(_.unionByName(_))
    perConfig.crossJoin(nTrue)
      .select(col("bands"), col("rows_per_band"),
        col("n_candidates"), col("n_true"), col("n_hits"),
        when(col("n_candidates") > 0,
          call_function("div", col("n_hits") * lit(1000000000L),
            col("n_candidates")) / lit(1e9)).otherwise(lit(0.0))
          .as("precision"),
        when(col("n_true") > 0,
          call_function("div", col("n_hits") * lit(1000000000L),
            col("n_true")) / lit(1e9)).otherwise(lit(0.0))
          .as("recall"))
  }

  /** 64-bit SimHash over token hashes: sign-sum of each bit position.
    * Native one-pass kernel ([[graft.functions.SimHash64]]);
    * [[simhashHof]] is the bit-identical HOF formulation (spec cross-check). */
  def simhash(text: Column): Column = {
    GraftFunctions.register(SparkSession.active)
    call_function("graft_simhash", TextFunctions.tokens(text))
  }

  /** Interpreted-HOF SimHash (reference semantics for the native kernel). */
  def simhashHof(text: Column): Column = {
    val tokHashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    // votes[i] += (h & mask_i) != 0 ? 1 : -1, one walk over the tokens
    val votes = aggregate(tokHashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    // simhash bit i = sign of votes[i]
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Cross-engine SimHash: per-token bits come from the token's md5 hex
    * nibbles instead of xxhash64, so any engine with md5 reproduces the
    * signature bit-for-bit (the DuckDB oracle does — xxhash64 exists only
    * here). Bit j (0..63, MSB-first) of a token = bit (3 - j%4) of nibble
    * j/4 of md5(token); signature bit j = strict majority of ones across
    * tokens. Native one-pass kernel ([[graft.functions.SimHashMd5]]);
    * [[simhashMd5Hof]] is the bit-identical HOF formulation (spec
    * cross-check). The xxhash64 kernel ([[simhash]]) is still ~2× faster
    * (no per-token digest); prefer it when nothing outside Spark needs to
    * re-derive the signature. */
  def simhashMd5(text: Column): Column = {
    GraftFunctions.register(SparkSession.active)
    call_function("graft_simhash_md5", TextFunctions.tokens(text))
  }

  /** Interpreted-HOF md5 SimHash (reference semantics for the kernel). */
  def simhashMd5Hof(text: Column): Column = {
    val hexes = transform(TextFunctions.tokens(text), t => md5(t))
    val bitsOf = (hex: Column) =>
      flatten(transform(sequence(lit(0), lit(15)), i => {
        val nib = conv(hex.substr(i + 1, lit(1)), 16, 10).cast("int")
        array((3 to 0 by -1).map(b => shiftright(nib, b).bitwiseAND(lit(1))): _*)
      }))
    val counts = aggregate(hexes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    val n = size(hexes)
    val bits = transform(counts, c => when(c * 2 > n, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4×16-bit chunks (a pair within
    * hamming distance ≤ maxDist for maxDist < 4 must agree on at least one
    * chunk — pigeonhole), verify with full hamming distance.
    *
    * `maxBucketSize` caps a degenerate chunk bucket (short/empty documents
    * hash alike, so one hot 16-bit chunk key is m²/2 candidate pairs at
    * corpus scale) — same explicit-approximation contract as
    * [[nearDupPairs]]: a pair inside a dropped bucket survives only via one
    * of its other three chunks. NOTE the default CAPS (approximate):
    * SimHash's 16-bit chunk keys collide on boilerplate far more readily
    * than MinHash band keys, so the safe-by-default choice differs from
    * [[nearDupPairs]] (default uncapped = exact w.r.t. the blocking).
    * Pass `Int.MaxValue` for exactness. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String, maxDist: Int = 3,
                   maxBucketSize: Int = 10000,
                   sigFn: Column => Column = simhash): DataFrame = {
    val sig = graft.ops.Par.ensure(docs.select(col(idCol).as("__id"), col(textCol)))
      .select(col("__id"), sigFn(col(textCol)).as("__sh"))
    val chunked0 = sig.select(col("__id"), col("__sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("__sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("__c"))
      .select(col("__id"), col("__sh"), col("__c.chunk").as("__chunk"), col("__c.key").as("__key"))
    val capped =
      if (maxBucketSize == Int.MaxValue) chunked0
      else capBuckets(chunked0, maxBucketSize, Seq("__chunk", "__key"))
    // both sides of the candidate self-join read this; Caches.release() frees it
    val chunked = graft.ops.Caches.track(capped)
    chunked.alias("a").join(chunked.alias("b"),
        col("a.__chunk") === col("b.__chunk") &&
        col("a.__key") === col("b.__key") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        hamming(col("a.__sh"), col("b.__sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
