package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale estimation and pre-filtering primitives: a KMV distinct
  * sketch, a Bloom-filter decontamination pre-pass, and a deterministic
  * global shuffle order. The reference engine never needs these (it holds
  * the full id list in RAM, README.rst:30-33); at 100 TB they are what
  * replaces "collect and look": cardinalities come from a k-row sketch,
  * membership from a broadcast-free bitset literal, and training order
  * from a rank that never sees a single-partition sort.
  *
  * Everything is md5-derived and engine-reproducible — no RNG, no
  * xxhash — so each operator is hash-checked end-to-end against an
  * external SQL oracle, false positives and all.
  */
object Sketches {

  // ---------------------------------------------------------------- KMV distinct

  /** K-minimum-values distinct-count sketch per group: keep each group's
    * `k` smallest [[Curation.hashUniform]] draws over the DISTINCT values;
    * the estimator is `(k-1) / u_k` (u_k = the kth smallest draw as a
    * uniform in (0,1)), exact when a group has fewer than `k` distinct
    * values. Standard KMV (Bar-Yossef et al. 2002); mergeable by
    * construction — the union's sketch is the k smallest of the
    * concatenation, so per-partition sketches combine without rescans.
    *
    * Shape at scale: the distinct is a shuffle of (group, 8-byte draw) —
    * never the values themselves — and the rank-≤-k filter compiles to a
    * WindowGroupLimit, so each map task forwards at most k draws per
    * group before the shuffle. Output: (groupCol, n_kept, est_distinct).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column, k: Int,
                  salt: String = "graft-kmv"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val draws = df.select(col(groupCol), Curation.hashUniform(value, salt).as("__u"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__u"))
    draws.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__u")).as("__uk"))
      .select(col(groupCol), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise((lit(k) - 1).cast("double") / col("__uk")), 4)
          .as("est_distinct"))
  }

  /** MERGE of per-group KMV sketches into ONE global estimate — the
    * property that makes KMV a distributed aggregate: the union of the
    * groups' k-minimum draw sets contains the global k minimum distinct
    * draws (a draw outside every group's bottom-k cannot be in the global
    * bottom-k), so re-taking the k smallest of the merged sets IS the
    * direct global sketch, exactly. The merge input is k×groups rows —
    * control data; this is how a 100 TB per-shard sketch pass folds into
    * one corpus cardinality without a second scan. Output: one row
    * (n_kept, est_distinct). */
  def kmvMerge(df: DataFrame, groupCol: String, value: Column, k: Int,
               salt: String = "graft-kmv"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val draws = df.select(col(groupCol), Curation.hashUniform(value, salt).as("__u"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__u"))
    val sketches = draws.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    // the same value in two groups draws the same u — merged sets dedup
    sketches.select(col("__u")).distinct().orderBy(col("__u")).limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("__u")).as("__uk"))
      .select(col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise((lit(k) - 1).cast("double") / col("__uk")), 4)
          .as("est_distinct"))
  }

  /** Theta-style SET ALGEBRA over the per-group KMV sketches: pairwise
    * intersection / union / Jaccard estimates between groups, computed
    * entirely from the k-row sketches — the 100 TB replacement for an
    * exact cross-source overlap join (which shuffles every key). The
    * convention: a full sketch's threshold θ is its kth smallest draw
    * (θ = 1 when the group has fewer than k distinct values — the sketch
    * is exhaustive and estimates are exact); for a pair, θ = min(θ_A,
    * θ_B), the intersection estimate is |{u ∈ S_A ∩ S_B : u ≤ θ}| / θ,
    * and the union estimate re-takes the k smallest of S_A ∪ S_B (the KMV
    * merge property). Same value → same md5 draw in every group, so
    * sketch membership IS value membership.
    *
    * Shape at scale: one distinct + map-side WindowGroupLimit builds the
    * sketches (k×groups rows — control data); every pairwise join below
    * that touches only sketch rows. Output: (src_a, src_b, n_common,
    * est_intersect, est_union, est_jaccard, est_only_a, est_only_b),
    * one row per unordered pair — the differences estimate |A\B| and
    * |B\A| from each side's below-θ draw count minus the common count.
    */
  def kmvIntersect(df: DataFrame, groupCol: String, value: Column, k: Int,
                   salt: String = "graft-kmv"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val draws = df.select(col(groupCol), Curation.hashUniform(value, salt).as("__u"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__u"))
    // the ONE corpus-scale pass; every consumer below reuses the cached
    // k×groups sketch (without the cache the distinct+WindowGroupLimit
    // subtree is re-planned into each of the four consumers — harmless at
    // test scale, four corpus scans at 100 TB)
    val sk = graft.ops.Caches.track(
      draws.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn"))
    // per-group θ: kth smallest draw, or 1.0 when the sketch is exhaustive
    val stats = sk.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(col("__u")).as("__uk"))
      .select(col(groupCol),
        when(col("__n") < k, lit(1.0)).otherwise(col("__uk")).as("__theta"))
    val pairs = stats.select(col(groupCol).as("src_a"), col("__theta").as("__ta"))
      .crossJoin(stats.select(col(groupCol).as("src_b"), col("__theta").as("__tb")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        least(col("__ta"), col("__tb")).as("__th"))
    // common draws: same value hashes to the same u in both sketches
    val common = sk.select(col(groupCol).as("src_a"), col("__u"))
      .join(sk.select(col(groupCol).as("src_b"), col("__u")), Seq("__u"))
      .filter(col("src_a") < col("src_b"))
    val cj = pairs.join(common, Seq("src_a", "src_b"), "left")
      .groupBy(col("src_a"), col("src_b"), col("__th"))
      .agg(count(when(col("__u") <= col("__th"), 1)).as("n_common"))
    // union sketch per pair: k smallest of the two sketches' merged draws
    val un = pairs.select(col("src_a"), col("src_b"))
      .join(sk, col(groupCol) === col("src_a") || col(groupCol) === col("src_b"))
      .select(col("src_a"), col("src_b"), col("__u")).distinct()
    val wu = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("__u"))
    val ue = un.withColumn("__rn", row_number().over(wu)).filter(col("__rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("__nu"), max(col("__u")).as("__uku"))
      .select(col("src_a"), col("src_b"),
        when(col("__nu") < k, col("__nu").cast("double"))
          .otherwise(lit(k - 1).cast("double") / col("__uku")).as("__eu"))
    // set DIFFERENCE |A\B| and |B\A|: below θ every draw of A's sketch is
    // a sample of A, so |A\B| ≈ (|{u ∈ S_A : u ≤ θ}| − n_common)/θ — no
    // extra joins, just each side's below-θ draw count per pair
    val na = pairs
      .join(sk.select(col(groupCol).as("src_a"), col("__u")), Seq("src_a"))
      .filter(col("__u") <= col("__th"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("__na"))
    val nb = pairs
      .join(sk.select(col(groupCol).as("src_b"), col("__u")), Seq("src_b"))
      .filter(col("__u") <= col("__th"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("__nb"))
    // raw (unrounded) estimates feed the Jaccard so rounding never compounds
    val rawInt = when(col("__th") < 1.0,
      col("n_common").cast("double") / col("__th"))
      .otherwise(col("n_common").cast("double"))
    // a side can have zero below-θ draws (θ came from the other sketch):
    // left join + 0 — n_common is then 0 too, so the difference stays ≥ 0
    def rawDiff(side: String) = when(col("__th") < 1.0,
      (coalesce(col(side), lit(0L)) - col("n_common")).cast("double")
        / col("__th"))
      .otherwise((coalesce(col(side), lit(0L)) - col("n_common"))
        .cast("double"))
    cj.join(ue, Seq("src_a", "src_b"))
      .join(na, Seq("src_a", "src_b"), "left")
      .join(nb, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(rawInt, 4).as("est_intersect"),
        round(col("__eu"), 4).as("est_union"),
        round(rawInt / col("__eu"), 4).as("est_jaccard"),
        round(rawDiff("__na"), 4).as("est_only_a"),
        round(rawDiff("__nb"), 4).as("est_only_b"))
  }

  // ------------------------------------------------------- bottom-k quantiles

  /** Deterministic MERGEABLE quantile sketch: each group keeps the `k`
    * rows with the smallest md5-uniform draw (a uniform sample without
    * replacement — "bottom-k by hash"), and quantiles are EXACT order
    * statistics over that sample: the ceil(q·n)-th smallest value, an
    * integer pick with no interpolation, so an external engine reproduces
    * it bit-for-bit (engines disagree on interpolated quantiles).
    *
    * Mergeable by construction, like [[kmvDistinct]]: the bottom-k of a
    * union is contained in the union of the parts' bottom-ks, so
    * per-shard samples fold into exact global samples without a rescan —
    * the property that turns a 100 TB quantile pass into one map-side
    * sketch per shard plus a control-sized merge. The rank-≤-k filter
    * compiles to a map-side WindowGroupLimit.
    *
    * Output: (groupCol, n_sample, p50, p90). */
  def bottomKQuantiles(df: DataFrame, groupCol: String, value: Column,
                       idCol: String, k: Int,
                       salt: String = "graft-quant"): DataFrame = {
    require(k >= 1, "bottom-k needs k >= 1")
    val sample = bottomKSample(df, groupCol, value, idCol, k, salt)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sample"),
        sort_array(collect_list(col("__v"))).as("__vs"))
    quantilePicks(sample)
  }

  /** Global quantiles by MERGING the per-group bottom-k samples: re-take
    * the global bottom-k of the union of per-group samples (each row keeps
    * its draw), then pick the same exact order statistics — one row
    * (n_sample, p50, p90), equal to running the sketch over the whole
    * table directly. */
  def bottomKQuantilesMerged(df: DataFrame, groupCol: String, value: Column,
                             idCol: String, k: Int,
                             salt: String = "graft-quant"): DataFrame = {
    val merged = bottomKSample(df, groupCol, value, idCol, k, salt)
      .orderBy(col("__u"), col("__id")).limit(k)
    quantilePicks(merged
      .agg(count(lit(1)).as("n_sample"),
        sort_array(collect_list(col("__v"))).as("__vs")))
  }

  private def bottomKSample(df: DataFrame, groupCol: String, value: Column,
                            idCol: String, k: Int, salt: String): DataFrame = {
    val draws = df.select(col(groupCol), value.cast("long").as("__v"),
      col(idCol).cast("string").as("__id"),
      Curation.hashUniform(col(idCol), salt).as("__u"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__u"), col("__id"))
    draws.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
  }

  // ceil(q·n) as pure integer arithmetic — ceil(a/b) = (a+b-1) div b —
  // because double `ceil(0.9 * n)` sits exactly on FP rounding boundaries
  private def quantilePicks(grouped: DataFrame): DataFrame =
    grouped
      .withColumn("p50", element_at(col("__vs"),
        expr("(n_sample + 1) div 2").cast("int")))
      .withColumn("p90", element_at(col("__vs"),
        expr("(n_sample * 9 + 9) div 10").cast("int")))
      .drop("__vs")

  // ---------------------------------------------------------------- HLL distinct

  /** HyperLogLog geometry: p = 8 → m = 256 registers (~6.5% relative
    * error), register width capped at rho = 33 (32 hash bits + 1). Chosen
    * so a per-group sketch is 256 small ints — control data at any corpus
    * size — and every arithmetic step below stays EXACT-integer until the
    * final estimator division, which is what lets an external SQL oracle
    * reproduce the estimate bit-for-bit. */
  val HllRegisters = 256
  private val HllAlphaM2: Double = // alpha_256 * m^2 (Flajolet et al. 2007)
    0.7213 / (1 + 1.079 / HllRegisters) * HllRegisters * HllRegisters

  /** Per-row (register, rho) from the md5 draw: register = the first byte
    * of the digest, rho = 1 + leading zero BITS of the next 32 (all derived
    * from hex-character arithmetic — `ltrim(_, '0')` counts zero nibbles,
    * a 4-way CASE counts the bits inside the first non-zero nibble — the
    * exact identity the DuckDB oracle re-derives). */
  private def hllRegRho(value: Column, salt: String): (Column, Column) = {
    val h = md5(concat(lit(salt + ":"), value.cast("string")))
    val reg = conv(substring(h, 1, 2), 16, 10).cast("int")
    val tail = substring(h, 3, 8)
    val zeroNibbles = lit(8) - length(ltrim(tail, "0"))
    val nib = conv(tail.substr(zeroNibbles + 1, lit(1)), 16, 10).cast("int")
    val rho = when(zeroNibbles === 8, lit(33))
      .otherwise(zeroNibbles * 4 + 1 +
        when(nib >= 8, 0).when(nib >= 4, 1).when(nib >= 2, 2).otherwise(3))
    (reg, rho)
  }

  /** Max-rho registers per (group, register) — the mergeable sketch state.
    * Duplicate values land on identical (register, rho), so no distinct
    * pass is needed (HLL is insensitive to multiplicity — the property
    * KMV has to buy with a distinct shuffle). The only exchange is the
    * (group, reg) partial-max aggregate: each map task forwards ≤ 256
    * rows per group whatever the corpus size. */
  def hllSketch(df: DataFrame, groupCols: Seq[Column], value: Column,
                salt: String = "graft-hll"): DataFrame = {
    val (reg, rho) = hllRegRho(value, salt)
    df.filter(value.isNotNull)
      .select(groupCols :+ reg.as("__reg") :+ rho.as("__rho"): _*)
      .groupBy(groupCols :+ col("__reg"): _*)
      .agg(max(col("__rho")).as("__mx"))
  }

  /** Fold a register set (one group of [[hllSketch]] rows) into the HLL
    * estimate. The harmonic-mean denominator `sum(2^-M_j)` is computed as
    * the INTEGER `sum(2^(33-M_j))` scaled by 2^-33 afterwards — long
    * addition commutes, so the estimate is independent of partitioning and
    * row order (a plain double sum here would be FP-order-dependent and
    * unhashable). Small-range correction (E ≤ 2.5m with empty registers →
    * linear counting) as in the original paper. */
  private def hllEstimate(sketch: DataFrame, groupCols: Seq[Column]): DataFrame = {
    val m = HllRegisters
    val agged = sketch.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n_set"),
      sum(call_function("shiftleft", lit(1L), lit(33) - col("__mx"))).as("__isum"))
    val zeros = lit(m) - col("n_set")
    val isum = col("__isum") + zeros.cast("long") * (1L << 33)
    val raw = lit(HllAlphaM2 * math.pow(2.0, 33)) / isum.cast("double")
    val est = when(raw <= 2.5 * m && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    agged.select(groupCols ++ Seq(col("n_set"), round(est, 4).as("est_distinct")): _*)
  }

  /** Fold an ALREADY-BUILT register table ((group…, __reg, __mx) rows —
    * e.g. persisted shard sketches merged by register-wise max) into
    * per-group estimates. This is the incremental-maintenance entry: new
    * data unions its batch sketch with the stored registers and re-folds —
    * no rescan of anything already sketched. */
  def hllFold(sketch: DataFrame, groupCols: Seq[Column]): DataFrame =
    hllEstimate(sketch, groupCols)

  /** Per-group HLL distinct-count estimate: (group, n_set, est_distinct). */
  def hllDistinct(df: DataFrame, groupCol: String, value: Column,
                  salt: String = "graft-hll"): DataFrame =
    hllEstimate(hllSketch(df, Seq(col(groupCol)), value, salt), Seq(col(groupCol)))

  /** MERGE of per-group HLL sketches into ONE global estimate — register-
    * wise max is the HLL union, exactly: max is associative/commutative,
    * so folding the groups' registers equals sketching the concatenation
    * directly (the oracle computes the direct global sketch; merged must
    * hash-match it). This is the shape a 100 TB per-shard cardinality pass
    * folds through: shard sketches are 256 ints each, the merge input is
    * control data, no second corpus scan. */
  def hllMerge(df: DataFrame, groupCol: String, value: Column,
               salt: String = "graft-hll"): DataFrame = {
    val perGroup = hllSketch(df, Seq(col(groupCol)), value, salt)
    val merged = perGroup.groupBy(col("__reg")).agg(max(col("__mx")).as("__mx"))
    hllEstimate(merged, Seq.empty)
  }

  // ---------------------------------------------------------------- count-min

  /** Count-min geometry: d = 4 hash rows × w = 1024 columns. Error bound:
    * overestimate ≤ 2·N/w with probability 1 − (1/2)^4 per query (Cormode
    * & Muthukrishnan 2005); never an underestimate. 4096 counters — the
    * whole sketch is control data at any corpus size. */
  val CmsRows = 4
  val CmsCols = 1024

  /** Row-`r` column of a value: md5 hex nibbles 6-8 of the salted digest
    * mod w — the same 10-bit slice identity as the DSIR feature hash, so
    * an external engine re-derives every cell without a bigint hex parse. */
  private def cmsCol(value: Column, r: Int, salt: String): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:$r:"), value.cast("string"))), 6, 3),
      16, 10).cast("long"), lit(CmsCols.toLong))

  /** The (r, c, cnt) counter table over every occurrence of `value` (a
    * frequency sketch, so NO distinct pass — multiplicity is the point).
    * One shuffle of (r, c) pairs partially aggregated map-side: each task
    * forwards at most d×w = 4096 rows whatever the corpus size. Counters
    * ADD cell-wise, so per-shard sketches merge by summing the same
    * (r, c) keys — asserted against the direct build in SketchesSpec. */
  def cmsSketch(df: DataFrame, value: Column,
                salt: String = "graft-cms"): DataFrame =
    df.filter(value.isNotNull)
      .select(posexplode(array((0 until CmsRows).map(r => cmsCol(value, r, salt)): _*))
        .as(Seq("r", "c")))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for a control-sized probe set: min over the
    * d rows of each probe's counter (absent cell = 0). The sketch side is
    * ≤ 4096 rows — broadcast — so probing is join-free from the corpus's
    * point of view. Output: (probe column, est_cnt); `est_cnt ≥` the true
    * count always, with the CMS overestimate bound. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String,
                  salt: String = "graft-cms"): DataFrame = {
    val pv = col(valueCol)
    probes
      .select(pv, posexplode(array((0 until CmsRows).map(r => cmsCol(pv, r, salt)): _*))
        .as(Seq("r", "c")))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(pv)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  // ---------------------------------------------------------------- Bloom decon

  /** Bloom geometry: m = 2^16 bits (1024 longs, an 8 KiB plan literal),
    * kHash = 4 positions per key — ~0.24% false-positive rate at the
    * benchmark-scale fills this is built for (n/m = 0.05). */
  val BloomBits = 1 << 16
  val BloomHashes = 4

  /** The `kHash` bit positions of one key: the md5 hex digest split into
    * 8-char slices, each reduced mod 2^16 (= its last 4 nibbles — the
    * identity an external engine reproduces nibble-by-nibble). */
  def bloomPositions(key: Column): Seq[Column] = {
    val h = md5(key.cast("string"))
    (0 until BloomHashes).map { j =>
      pmod(conv(substring(h, j * 8 + 1, 8), 16, 10).cast("long"), lit(BloomBits.toLong))
    }
  }

  /** Build a Bloom bitset (as longs) from the DISTINCT values of `key` in
    * `df` — driver-side by design: the build side of a decontamination
    * sweep is the benchmark set, control-sized next to the corpus. */
  def bloomBuild(df: DataFrame, key: Column): Array[Long] = {
    val pos = df.select(explode(array(bloomPositions(key): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val bits = new Array[Long](BloomBits / 64)
    pos.foreach { p => bits(p.toInt >> 6) |= 1L << (p.toInt & 63) }
    bits
  }

  /** True iff every bit position of `key` is set in `bits` — membership
    * with the filter's false-positive rate, zero false negatives. The
    * bitset rides in the plan as an array literal, so the probe is a pure
    * narrow expression: no join, no broadcast exchange, nothing to
    * shuffle — the cheapest possible corpus-side pre-pass.
    *
    * The md5 digest is bound ONCE through a single-element `transform`
    * lambda (the [[TextFunctions]] `withTokens` trick): the four position
    * reads reference the lambda slot instead of re-hashing the key — the
    * predicate pushed through the explode otherwise inlines `md5(key)`
    * into every position subtree. */
  def bloomMaybeContains(bits: Array[Long], key: Column): Column = {
    val bitsLit = typedLit(bits.toSeq)
    element_at(transform(array(md5(key.cast("string"))), h => {
      (0 until BloomHashes).map { j =>
        val p = pmod(conv(substring(h, j * 8 + 1, 8), 16, 10).cast("long"),
          lit(BloomBits.toLong))
        val word = element_at(bitsLit, (p / 64).cast("int") + 1)
        call_function("shiftright", word, (p % 64).cast("int"))
          .bitwiseAND(lit(1L)) === 1
      }.reduce(_ && _)
    }), 1)
  }

  /** Bloom-filter decontamination pre-pass: documents whose distinct word
    * `n`-grams MAY overlap the benchmark set, with the per-doc count of
    * flagged n-grams. Supersets [[Curation.contamination]]'s exact output
    * (no false negatives); run the exact join on this pass's survivors
    * only — at corpus scale that turns a full-corpus semi-join into a
    * filter that drops ~all of the corpus before any exchange. */
  def contaminationBloom(docs: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int = 5): DataFrame = {
    import graft.dedup.DocDedup
    val benchSh = benchmark
      .select(explode(array_distinct(DocDedup.shingles(col(textCol), n))).as("__g"))
      .distinct()
    val bits = bloomBuild(benchSh, col("__g"))
    docs.select(col(idCol),
        explode(array_distinct(DocDedup.shingles(col(textCol), n))).as("__g"))
      .filter(bloomMaybeContains(bits, col("__g")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_maybe"))
  }

  // ---------------------------------------------------------------- global order

  /** Deterministic global training order: every id gets a unique dense
    * position `0..n-1` by rank of its [[Curation.hashUniform]] draw — the
    * reproducible full-corpus shuffle a training run reads back in range
    * slices. Same id, same position, at any partitioning or cluster size.
    *
    * No single-partition sort: draws bucket into `nShards` contiguous
    * hash ranges, a first narrow pass counts each shard (the only job
    * that materializes early), and position = shard's cumulative offset +
    * rank within the shard — a window over at most 1/nShards of the data
    * per group. The classic two-pass rank (zipWithIndex's shape) kept
    * declarative; shard counts are nShards driver-side longs. */
  /** CURRICULUM order — [[globalOrder]] generalized with a leading integer
    * priority: dense positions 0..n−1 where lower `priority` groups come
    * first and order WITHIN a group is the reproducible md5 shuffle
    * (training curricula: high-quality buckets first, unbiased within).
    * Same no-single-partition-sort shape: ranks run per (priority, shard)
    * hash slice, the (priority, shard) counts are control data, and the
    * cumulative offsets ride as ONE map literal. Output:
    * (id, priority, pos). */
  def curriculumOrder(docs: DataFrame, idCol: String, priority: Column,
                      nShards: Int = 16,
                      salt: String = "graft-curriculum"): DataFrame = {
    val u = Curation.hashUniform(col(idCol), salt)
    val base = docs.select(col(idCol), priority.cast("int").as("__p"), u.as("__u"),
      least(floor(u * nShards).cast("int"), lit(nShards - 1)).as("__sh"))
    val countOf = base.groupBy(col("__p"), col("__sh"))
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val keys = countOf.keys.toSeq.sorted // (priority, shard) lexicographic
    val offsets = keys.scanLeft(0L)((acc, k) => acc + countOf(k)).dropRight(1)
    val offMap = typedLit(keys.zip(offsets)
      .map { case ((p, sh), o) => s"$p:$sh" -> o }.toMap)
    val w = Window.partitionBy(col("__p"), col("__sh"))
      .orderBy(col("__u"), col(idCol))
    base.withColumn("pos", row_number().over(w).cast("long") +
        element_at(offMap, concat_ws(":", col("__p"), col("__sh"))) - 1)
      .select(col(idCol), col("__p").as("priority"), col("pos"))
  }

  def globalOrder(docs: DataFrame, idCol: String, nShards: Int = 64,
                  salt: String = "graft-shuffle"): DataFrame = {
    val u = Curation.hashUniform(col(idCol), salt)
    val base = docs.select(col(idCol), u.as("__u"),
      least(floor(u * nShards).cast("int"), lit(nShards - 1)).as("__sh"))
    val countOf = base.groupBy(col("__sh")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // shard -> cumulative offset as ONE array literal indexed by __sh
    // (a when-chain here nests nShards cases deep — at large user-chosen
    // nShards that blows up codegen and planning for no benefit)
    val offsets = (0 until nShards)
      .scanLeft(0L)((acc, s) => acc + countOf.getOrElse(s, 0L)).dropRight(1)
    val offCol = element_at(typedLit(offsets), col("__sh") + 1)
    val w = Window.partitionBy(col("__sh")).orderBy(col("__u"), col(idCol))
    base.withColumn("pos", row_number().over(w).cast("long") + offCol - 1)
      .select(col(idCol), col("pos"))
  }
}
