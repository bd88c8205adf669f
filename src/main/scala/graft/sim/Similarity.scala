package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), pretraining-pipeline style.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the full corpus scan; one narrow pass + a per-query top-k.
  * Scale path: random-hyperplane LSH — bucket corpus and queries by the
  * sign pattern of `nBits` fixed pseudo-random hyperplanes, probe only
  * matching buckets (hamming-adjacent buckets for recall), so a 100 TB
  * corpus is touched only where it can possibly be close.
  *
  * All vector math is composed `zip_with`/`aggregate` expressions in double
  * precision — no UDF, no MLlib Vector boxing, codegen-friendly.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double.
    * Resolves to the native codegen [[graft.functions.VectorDot]] — callers
    * must have run [[graft.functions.GraftFunctions.register]] (every
    * DataFrame-taking entry point here does so). Same element order as the
    * interpreted `aggregate(zip_with(...))` fold, so values are identical. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Portable HOF fallback with identical semantics (no registration). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Pairwise cosine from precomputed norms: same FP expression tree as
    * [[cosine]] (dot / (na*nb)) but the norms are evaluated once per row
    * instead of once per pair. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine top-k: for every query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Queries are broadcast —
    * the corpus is scanned exactly once regardless of k; norms precomputed
    * per row, not per pair. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Per-DIMENSION distribution drift between two embedding slices — the
    * "did my embedding space move" monitor between corpus snapshots,
    * model versions, or data sources: mean of every dimension on each
    * side, ranked by the absolute mean shift. One posexplode + one
    * (dim)-keyed aggregate — 64×tasks partial rows whatever the corpus
    * size — and an integer-micro shift key so the ranking is exact
    * cross-engine. Output: (dim, mean_a, mean_b, delta_micro), top
    * `topK` by |delta| (ties: dim asc). */
  def dimensionDrift(embeddings: DataFrame, vecCol: String, isA: Column,
                     topK: Int = 10): DataFrame = {
    val x = embeddings.select(isA.as("__a"),
      posexplode(col(vecCol)).as(Seq("dim", "__x")))
    val m = x.groupBy(col("dim")).agg(
      avg(when(col("__a"), col("__x"))).as("__ma"),
      avg(when(!col("__a"), col("__x"))).as("__mb"))
    m.select(col("dim"),
        round(col("__ma"), 6).as("mean_a"), round(col("__mb"), 6).as("mean_b"),
        round((col("__ma") - col("__mb")) * 1e6).cast("long").as("delta_micro"))
      .orderBy(abs(col("delta_micro")).desc, col("dim"))
      .limit(topK)
  }

  /** Sign-pattern bucket id from `nBits` deterministic pseudo-random
    * hyperplanes. Hyperplane i's component j is a fixed hash-derived value
    * in [-1, 1] — reproducible across runs and engines with no RNG. `seed`
    * selects an independent hyperplane family (multi-table LSH). Native
    * one-pass kernel ([[graft.functions.LshBucketExpr]]); [[lshBucketHof]]
    * is the bit-identical composed formulation (spec cross-check). */
  def lshBucket(vec: Column, dim: Int, nBits: Int = 12, seed: Int = 0): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_lshbucket", vec, lit(dim), lit(nBits), lit(seed))
  }

  /** md5-derived hyperplane components — the cross-engine-reproducible LSH
    * family (same role as the md5 SimHash/rolling-hash kernels): component
    * (i, j) is the first 16 bits of md5("lsh:seed:i:j") mapped into [-1, 1].
    * Hyperplanes are CONTROL data (nBits × dim doubles), computed once on
    * the driver and inlined as literals, so bucket assignment stays a
    * narrow codegen'd projection — and an external engine can re-derive
    * the exact same family from its own md5. */
  def md5Hyperplanes(dim: Int, nBits: Int, seed: Int = 0): Seq[Seq[Double]] =
    (0 until nBits).map { i =>
      (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lsh:$seed:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val v = ((h(0) & 0xFF) << 8) | (h(1) & 0xFF) // first 4 hex nibbles
        ((v % 1001) - 500) / 500.0
      }
    }

  /** Sign-pattern bucket id over the md5 hyperplane family. Bit-for-bit
    * reproducible in any engine with md5 + an ordered fold (the DuckDB
    * oracle re-derives it); [[lshBucket]] stays the xxhash64 throughput
    * path. */
  def lshBucketMd5(vec: Column, dim: Int, nBits: Int = 8, seed: Int = 0): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    val planes = md5Hyperplanes(dim, nBits, seed)
    val v = transform(vec, _.cast("double"))
    (0 until nBits).map { i =>
      when(dot(v, typedlit(planes(i))) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Interpreted-HOF LSH bucket (reference semantics for the kernel). */
  def lshBucketHof(vec: Column, dim: Int, nBits: Int = 12, seed: Int = 0): Column = {
    val bits = (0 until nBits).map { i =>
      // h_i · v  with  h_i[j] = (xxhash64(seed + i, j) % 1001) / 1000.0
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, j) => x.cast("double") *
            ((xxhash64(lit(seed + i), j) % 1001L).cast("double") / 1000.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via hyperplane-LSH buckets: `nTables` independent hyperplane
    * families; per table, probe the query's bucket plus all buckets within
    * hamming distance 1; exact cosine + top-k inside the probed union.
    * Recall grows as 1-(1-p)^nTables for per-table hit rate p; each table
    * touches ~(nBits+1)/2^nBits of the corpus per query. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nBits: Int = 12, nTables: Int = 2): DataFrame =
    lshTopKWith(corpus, queries, idCol, vecCol, k, nBits,
      (0 until nTables).map { t =>
        t -> ((v: Column) => lshBucket(v, dim, nBits, seed = t * nBits))
      })

  /** md5-family twin of [[lshTopK]] — identical probe structure (per table,
    * the query's bucket plus every single-bit flip ⇒ candidates are exactly
    * the pairs within hamming 1 in SOME table) over [[lshBucketMd5]]'s
    * cross-engine-reproducible hyperplanes. Given the data, the candidate
    * set and therefore the exact-cosine top-k are deterministic — an
    * external engine re-derives the same hyperplanes from its own md5 and
    * reproduces the result bit-for-bit (the DuckDB oracle does). xxhash64
    * [[lshTopK]] stays the throughput default. */
  def lshTopKMd5(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nBits: Int = 8, nTables: Int = 2): DataFrame =
    lshTopKWith(corpus, queries, idCol, vecCol, k, nBits,
      (0 until nTables).map { t =>
        t -> ((v: Column) => lshBucketMd5(v, dim, nBits, seed = t * nBits))
      })

  /** Per-pair LSH candidate stream for NESTED table-count lanes: the same
    * probe structure as [[lshTopKMd5]] over `nTables` md5 tables, returning
    * (query_id, neighbor_id, cosine, min_table) where `min_table` is the
    * LOWEST table index in which the pair collides within hamming 1. Table
    * seeds are `t * nBits`, so a t-table configuration's tables are exactly
    * the first t of an nTables run — `min_table < t` reproduces
    * [[lshTopKMd5]]'s candidate set for t tables verbatim, and ONE corpus
    * signature + probe-join pass prices every nested lane (the recall
    * dashboard previously re-scanned and re-joined per configuration).
    * [[DedupSimSpec]] pins the lane slices against the per-lane runs. */
  def lshCandidatesMd5(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, dim: Int, nBits: Int,
                       nTables: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val tableBuckets = (0 until nTables).map { t =>
      t -> ((v: Column) => lshBucketMd5(v, dim, nBits, seed = t * nBits))
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"),
        explode(array(tableBuckets.map { case (t, b) =>
          struct(lit(t).as("t"), b(col(vecCol)).as("b"))
        }: _*)).as("__tb"))
      .select(col("neighbor_id"), col("__cv"), col("__cn"),
        col("__tb.t").as("__t"), col("__tb.b").as("__bucket"))
    def probesOf(bucket: Column): Seq[Column] =
      bucket +: (0 until nBits).map(i => bucket.bitwiseXOR(shiftleft(lit(1L), i)))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
          norm(col(vecCol)).as("__qn"),
          explode(array(tableBuckets.flatMap { case (t, b) =>
            probesOf(b(col(vecCol))).map(p => struct(lit(t).as("t"), p.as("b")))
          }: _*)).as("__tp"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          col("__tp.t").as("__t"), col("__tp.b").as("__probe")))
    q.alias("q").join(c.alias("c"),
        col("q.__t") === col("c.__t") &&
        col("q.__probe") === col("c.__bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"),
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("cosine"))
      .agg(min(col("q.__t")).as("min_table"))
  }

  /** Exact-cosine top-k within a [[lshCandidatesMd5]] slice — the same
    * window as [[lshTopKWith]]'s final step, over `min_table < tables`. */
  def lshTopKFromCandidates(cand: DataFrame, tables: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.filter(col("min_table") < tables)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  private def lshTopKWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nBits: Int,
      tableBuckets: Seq[(Int, Column => Column)]): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"),
        explode(array(tableBuckets.map { case (t, b) =>
          struct(lit(t).as("t"), b(col(vecCol)).as("b"))
        }: _*)).as("__tb"))
      .select(col("neighbor_id"), col("__cv"), col("__cn"),
        col("__tb.t").as("__t"), col("__tb.b").as("__bucket"))
    // per table: the bucket itself + each single-bit flip
    def probesOf(bucket: Column): Seq[Column] =
      bucket +: (0 until nBits).map(i => bucket.bitwiseXOR(shiftleft(lit(1L), i)))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
          norm(col(vecCol)).as("__qn"),
          explode(array(tableBuckets.flatMap { case (t, b) =>
            probesOf(b(col(vecCol))).map(p => struct(lit(t).as("t"), p.as("b")))
          }: _*)).as("__tp"))
        .select(col("query_id"), col("__qv"), col("__qn"),
          col("__tp.t").as("__t"), col("__tp.b").as("__probe")))
    val scored = q.alias("q").join(c.alias("c"),
        col("q.__t") === col("c.__t") &&
        col("q.__probe") === col("c.__bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, via LSH
    * buckets (pairs must share a bucket) + exact cosine verify. Approximate
    * (single-table LSH misses cross-bucket pairs) — the scale path; use
    * [[bruteForcePairs]] when exact output is required. */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, nBits: Int = 8): DataFrame =
    cosineNearDupPairsWith(corpus, idCol, vecCol, threshold,
      v => lshBucket(v, dim, nBits))

  /** md5-family twin of [[cosineNearDupPairs]]: same bucket-then-verify
    * shape over [[lshBucketMd5]]'s reproducible hyperplanes, so the
    * returned pair set is an exact function of the data (oracle-checkable);
    * the xxhash64 variant stays the throughput default. */
  def cosineNearDupPairsMd5(
      corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, nBits: Int = 8, seed: Int = 0): DataFrame =
    cosineNearDupPairsWith(corpus, idCol, vecCol, threshold,
      v => lshBucketMd5(v, dim, nBits, seed))

  private def cosineNearDupPairsWith(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bucketOf: Column => Column): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"),
      bucketOf(col(vecCol)).as("__bucket"))
    val a = c.alias("a")
    val b = c.alias("b")
    a.join(b, col("a.__bucket") === col("b.__bucket") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        cosinePre(col("a.__v"), col("b.__v"), col("a.__n"), col("b.__n")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs cosine above `threshold` (quadratic baseline). */
  /** SemDeDup-style cell-scoped near-duplicate pairs (Abbas et al. 2023):
    * exact cosine pairs computed only WITHIN each cluster cell of a
    * partitioned embedding space. `assigned` is the (id, cell) frame of a
    * trained cell assignment ([[graft.sim.Ivf.assignCells]]); the
    * quadratic verify runs per cell, so cost is Σ|cell|² instead of the
    * corpus², and the one equi-join exchange is on the cell key —
    * AQE-skewable, broadcastable per side, never a global nested loop.
    * Recall is by construction scoped to co-located vectors (the SemDeDup
    * premise: semantic duplicates share a cluster); [[bruteForcePairs]]
    * stays the global-exact anchor. Output: (id_a < id_b, cell, cosine). */
  def cellScopedPairs(
      assigned: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      cellCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"))
      .join(assigned.select(col(idCol).as("__id"), col(cellCol).as("__cell")),
        Seq("__id"))
    val a = c.alias("a")
    val b = c.alias("b")
    a.join(b, col("a.__cell") === col("b.__cell") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__cell").as("cell"),
        cosinePre(col("a.__v"), col("b.__v"), col("a.__n"), col("b.__n")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Sign bits of vector components `lo until hi`, packed little-endian
    * into one long (bit `i - lo` set iff component `i` > 0). Components are
    * compared to zero exactly, so the packing is an exact function of the
    * stored floats — reproducible in any engine. `hi - lo` ≤ 63 keeps the
    * sum inside a signed long with no overflow games. */
  def signBits(vec: Column, lo: Int, hi: Int): Column = {
    require(hi - lo > 0 && hi - lo <= 63, s"signBits range must be 1..63 bits, got ${hi - lo}")
    // static unroll with integer literal masks: no HOF (stays inside
    // whole-stage codegen), no transcendental round-trip
    (lo until hi).map { i =>
      when(element_at(vec, i + 1) > 0, lit(1L << (i - lo))).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Binary (sign) quantization + EXACT Hamming top-k — the classic
    * 32×-compressed embedding search: each vector's sign pattern packs into
    * two 32-bit words (64 dims → 8 bytes), distance is two XOR+popcount ops
    * per pair, and the corpus side scans ONLY the packed words (8 bytes/row
    * instead of 256). Unlike the LSH/IVF paths this is approximate only in
    * the REPRESENTATION — given the packed bits the top-k is exact and
    * integer-valued, so the whole query is oracle-checkable bit-for-bit.
    * Ties (Hamming is coarse) break by neighbor id. */
  def hammingTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(dim % 2 == 0 && dim <= 64, s"hammingTopK packs dim/2-bit halves, got dim=$dim")
    val half = dim / 2
    def packed(df: DataFrame, idAs: String, pref: String) =
      df.select(col(idCol).as(idAs),
        signBits(col(vecCol), 0, half).as(pref + "0"),
        signBits(col(vecCol), half, dim).as(pref + "1"))
    val q = broadcast(packed(queries, "query_id", "__q"))
    val c = packed(corpus, "neighbor_id", "__c")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        (bit_count(col("__q0").bitwiseXOR(col("__c0"))) +
          bit_count(col("__q1").bitwiseXOR(col("__c1")))).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("hamming"), col("rank"))
  }

  /** Matryoshka-style two-stage retrieval: stage 1 ranks by cosine on the
    * PREFIX `prefixDim` components only (MRL-trained embeddings front-load
    * information, so the prefix is a cheap coarse scorer — the corpus-wide
    * pass touches prefixDim/dim of the data), keeping `m` candidates per
    * query; stage 2 re-reads ONLY those m rows' full vectors (a semi-join
    * back into the corpus — at scale a pruned point-read, never a second
    * scan-wide vector pass) and re-ranks them by exact full-dim cosine.
    * Both stages' scores are double dot-products in element order, so the
    * composite is deterministic and oracle-checkable end to end. */
  def mrlTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      prefixDim: Int, m: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    require(m >= k, s"rerank pool m=$m must be >= k=$k")
    def prefix(c: Column) = slice(c, 1, prefixDim)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      prefix(col(vecCol)).as("__qp"), norm(prefix(col(vecCol))).as("__qpn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      prefix(col(vecCol)).as("__cp"), norm(prefix(col(vecCol))).as("__cpn"))
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("__coarse").desc, col("neighbor_id"))
    val cand = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("__coarse", cosinePre(col("__qp"), col("__cp"), col("__qpn"), col("__cpn")))
      .withColumn("__crk", row_number().over(coarseW))
      .filter(col("__crk") <= m)
      .select(col("query_id"), col("neighbor_id"))
    val full = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val qFull = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), norm(col(vecCol)).as("__qn")))
    val rerankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(full, Seq("neighbor_id"))
      .join(qFull, Seq("query_id"))
      .withColumn("cosine", cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(rerankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  def bruteForcePairs(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      partitions: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n"))
    // left side repartitioned: the nested-loop join otherwise inherits the
    // scan's single input partition → one-core quadratic
    val a = c.repartition(partitions).alias("a")
    val b = c.alias("b")
    a.join(b, col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        cosinePre(col("a.__v"), col("b.__v"), col("a.__n"), col("b.__n")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
