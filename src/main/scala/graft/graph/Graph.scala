package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over item co-occurrence — the "market basket" family a
  * corpus/behavior pipeline derives from transactional fact tables
  * (lineitem: parts per order; events: items per user): thresholded
  * co-occurrence edges, degrees, association rules, per-node triangle
  * counts, and an unrolled PageRank power iteration.
  *
  * Scale design (100 TB):
  *  - Pair generation is ONE shuffle of two projected columns
  *    (group → sorted item set), then a bounded in-row pair expansion —
  *    per-group cost is C(k,2) with k = items-per-group, which fact tables
  *    bound structurally (TPC-H: ≤ 7 parts/order generated, ≤ 17 observed
  *    with duplicates collapsed; a pipeline would cap k defensively). No
  *    self-join: the naive `t JOIN t ON group` shuffles the table twice and
  *    re-materializes every pair instance through the join.
  *  - The support threshold prunes the edge set BEFORE any downstream
  *    consumer: at sf0.1 ~1.2M distinct pairs collapse to ~3.9k edges with
  *    support ≥ 2 (random co-occurrence almost never repeats), so triangle
  *    joins and rank iterations run on the support-filtered core, not the
  *    raw pair cloud. This is the same shape at any scale: support scales
  *    with data volume while noise pairs stay at support 1.
  *  - Triangle enumeration uses the a<b orientation (each triangle counted
  *    once, the standard forward-edge algorithm), joining the thresholded
  *    edge list with itself on equi-keys only — sort-merge/broadcast
  *    friendly, never a theta-join.
  *  - PageRank iterations shuffle only (node, contribution) pairs; degrees
  *    and ranks live in slim two-column frames, and each unrolled iteration
  *    is a plain equi-join + partial-aggregated sum. Caching the
  *    symmetrized edge list reuses one exchange across all iterations.
  */
object Graph {

  /** Distinct items per group as a sorted array — the single shuffle all
    * pair derivations share. */
  private def groupedItems(facts: DataFrame, groupCol: String,
                           itemCol: String): DataFrame =
    facts.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .groupBy(col("g"))
      .agg(sort_array(collect_set(col("i"))).as("items"))

  /** Co-occurrence edges (p1 < p2, support = #groups containing both),
    * support-thresholded. Output: (p1, p2, support). */
  def coOccurrenceEdges(facts: DataFrame, groupCol: String, itemCol: String,
                        minSupport: Long = 2L): DataFrame = {
    val pairs = groupedItems(facts, groupCol, itemCol)
      // in-row pair expansion: for each position i, pair items(i) with every
      // later item — flatten(transform×2) keeps it a narrow expression
      .select(explode(flatten(transform(col("items"),
        (x, i) => transform(slice(col("items"), i + lit(2),
            greatest(size(col("items")) - i - 1, lit(0))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .select(col("pr.p1"), col("pr.p2"))
    pairs.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Undirected degree per node of a (p1, p2) edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("p1"), col("p2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** Association rules p1 → p2 AND p2 → p1 for each thresholded edge:
    * support (joint groups / total groups), confidence (joint /
    * antecedent's groups), lift (confidence / consequent's base rate).
    * `itemGroups` = per-item distinct-group counts; `nGroups` = total
    * distinct groups (control scalar). Rounded to 6 for cross-engine
    * comparability. */
  def basketRules(edges: DataFrame, itemGroups: DataFrame,
                  nGroups: Long): DataFrame = {
    val both = edges.select(col("p1").as("ante"), col("p2").as("cons"), col("support"))
      .unionAll(edges.select(col("p2").as("ante"), col("p1").as("cons"), col("support")))
    both
      .join(itemGroups.select(col("item").as("ante"), col("n_groups").as("na")), "ante")
      .join(itemGroups.select(col("item").as("cons"), col("n_groups").as("nc")), "cons")
      .select(col("ante"), col("cons"),
        round(col("support").cast("double") / nGroups, 6).as("support"),
        round(col("support").cast("double") / col("na"), 6).as("confidence"),
        round((col("support").cast("double") / col("na")) /
          (col("nc").cast("double") / nGroups), 6).as("lift"))
  }

  /** Per-item distinct-group counts (the antecedent base rates). */
  def itemGroupCounts(facts: DataFrame, groupCol: String,
                      itemCol: String): DataFrame =
    facts.select(col(itemCol).as("item"), col(groupCol).as("g"))
      .distinct()
      .groupBy(col("item")).agg(count(lit(1)).as("n_groups"))

  /** k-core membership (Seidman 1983): iteratively peel nodes of degree
    * < k until fixpoint — the standard web/co-occurrence-graph denoising
    * gate (spam and long-tail fringe live outside the core). Each round
    * is one degree aggregation plus two anti-joins over the SHRINKING
    * edge list; `localCheckpoint` truncates the per-round lineage (the
    * Components loop's discipline), and the round count is bounded by the
    * peeling depth, not |V| — on power-law graphs a handful of rounds.
    * The only driver decision per round is an isEmpty probe (control
    * data). Returns surviving nodes with their final in-core degree.
    *
    * Round bound: every round that is not already the fixpoint removes at
    * least one node, so |V| + 1 rounds ALWAYS converge — `maxRounds <= 0`
    * (the default) derives that structural guarantee from the graph (one
    * count job) instead of trusting a tuning constant; deep-peel shapes
    * (long chains peel from the ends, ~|V|/2 rounds at k=2) terminate
    * instead of aborting. A caller replaying against an external engine
    * with a PINNED round count (the driver oracle peels exactly 20) passes
    * it explicitly: overshooting a fixpoint is identity, so both engines
    * agree whenever the peel converges within the pinned bound — and a
    * graph that peels deeper aborts LOUDLY here rather than surfacing as
    * an opaque value mismatch in the downstream hash gate. */
  def kCore(edges: DataFrame, k: Long, maxRounds: Int = 0): DataFrame = {
    var cur = edges.select(col("p1"), col("p2")).localCheckpoint()
    val bound =
      if (maxRounds > 0) maxRounds
      else (degrees(cur).count() + 1L).min(Int.MaxValue.toLong).toInt
    var rounds = 0
    var converged = false
    while (!converged && rounds < bound) {
      val low = degrees(cur).filter(col("degree") < k)
      if (low.isEmpty) converged = true
      else {
        cur = cur
          .join(low.select(col("node").as("p1")), Seq("p1"), "left_anti")
          .join(low.select(col("node").as("p2")), Seq("p2"), "left_anti")
          .select(col("p1"), col("p2"))
          .localCheckpoint()
      }
      rounds += 1
    }
    require(converged, s"k-core did not converge in $bound rounds" +
      (if (maxRounds > 0) " (graph peels deeper than the caller-pinned bound)"
       else " (impossible: the derived |V|+1 bound is structural)"))
    degrees(cur)
  }

  /** Per-node triangle counts, DEGREE-ORIENTED (Chiba–Nishizeki / the
    * standard power-law fix): every edge directs from its (degree, id)-
    * smaller endpoint to the larger, so each node's FORWARD degree is
    * bounded by O(√m) regardless of its raw degree — a celebrity node
    * with a million neighbors emits wedges only toward the handful of
    * nodes ranked above it, instead of deg² wedge pairs serializing one
    * task. Each triangle {x ≺ y ≺ z} is found exactly once as the wedge
    * (x→y, x→z) closed by the oriented edge (y→z) — the unordered wedge
    * self-join emits both (y,z) and (z,y), and exactly one matches the
    * closing edge's orientation. Equi-joins only; value-oriented input
    * (p1 < p2) is NOT assumed by the math, only by [[degrees]]. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("p1"), col("p2"))
    val deg = degrees(e)
    val withDeg = e
      .join(deg.select(col("node").as("p1"), col("degree").as("__d1")), "p1")
      .join(deg.select(col("node").as("p2"), col("degree").as("__d2")), "p2")
    // (degree, id) order: ties on degree break by node id
    val firstIsSmaller = col("__d1") < col("__d2") ||
      (col("__d1") === col("__d2") && col("p1") < col("p2"))
    val o = withDeg.select(
      when(firstIsSmaller, col("p1")).otherwise(col("p2")).as("src"),
      when(firstIsSmaller, col("p2")).otherwise(col("p1")).as("dst"))
    val tri = o.as("xy")
      .join(o.as("xz"),
        col("xy.src") === col("xz.src") && col("xy.dst") =!= col("xz.dst"))
      .join(o.as("yz"),
        col("yz.src") === col("xy.dst") && col("yz.dst") === col("xz.dst"))
      .select(col("xy.src").as("a"), col("xy.dst").as("b"), col("xz.dst").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Common-neighbor (Jaccard) node similarity — the link-prediction
    * primitive: for node pairs sharing ≥ `minCommon` neighbors,
    * |N(a)∩N(b)| / |N(a)∪N(b)|. Wedge enumeration through the shared
    * neighbor (equi-join on the middle node), then degrees fill in the
    * union size — never an all-pairs comparison; per-node cost is bounded
    * by its degree squared, which the support threshold already bounds. */
  def commonNeighborSim(edges: DataFrame, minCommon: Long = 2L,
                        maxDegree: Long = Long.MaxValue): DataFrame = {
    val sym = edges.select(col("p1").as("src"), col("p2").as("dst"))
      .unionAll(edges.select(col("p2").as("src"), col("p1").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // wedge cost through a shared neighbor n is deg(n)² — a celebrity
    // node makes the middle-node join quadratic. `maxDegree` drops hub
    // nodes from the NEIGHBOR role only (the LSH maxBucketSize
    // discipline): pairs a–b whose ONLY witnesses were dropped hubs are
    // missed — the documented recall trade; a hub shared by everyone
    // carries almost no Jaccard signal anyway. Degrees in the union-size
    // arithmetic stay UNCAPPED, so surviving pairs score exactly.
    val asNeighbor =
      if (maxDegree == Long.MaxValue) sym
      else sym.join(
        broadcast(deg.filter(col("deg") > maxDegree)
          .select(col("src").as("dst"))), Seq("dst"), "left_anti")
    val common = asNeighbor.select(col("src").as("a"), col("dst").as("n"))
      .join(asNeighbor.select(col("src").as("b"), col("dst").as("n")), "n")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    common
      .join(deg.select(col("src").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("src").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("common"),
        round(col("common").cast("double") /
          (col("da") + col("db") - col("common")), 6).as("jaccard"))
  }

  /** PageRank on the undirected graph of `edges`, `iters` unrolled power
    * iterations (damping 0.85, rank seeded at 1.0 per node so values stay
    * O(1)). Every node in a thresholded edge list has degree ≥ 1, so there
    * are no dangling nodes by construction.
    *
    * The whole iteration runs in integer NANO-units (`pr_nano` BIGINT,
    * shares via `div`, damping as 85 div 100): BIGINT sums are associative,
    * so the result is bit-identical under ANY shuffle/merge order AND
    * across engines — no round-to-N-decimals fragility anywhere in the
    * loop. Output: (node, pr) with pr = pr_nano/1e9 rounded to 6 (an exact
    * final mapping, not an error absorber). */
  def pageRank(edges: DataFrame, iters: Int = 3, salt: Int = 1): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // symmetrize and attach source degrees ONCE (cached: every iteration
    // reuses the same exchange instead of re-deriving edge+degree)
    val sym = edges.select(col("p1").as("src"), col("p2").as("dst"))
      .unionAll(edges.select(col("p2").as("src"), col("p1").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // tracked, not bare-cached: the returned frame is lazy, so the cache
    // must outlive this call — Caches.release() (harness/caller boundary)
    // reclaims it instead of leaking one edge+degree frame per invocation.
    //
    // salt > 1 = power-law skew immunity: the edges⋈ranks join otherwise
    // serializes a celebrity src's whole edge list on one reducer every
    // iteration. Edges carry z = hash(dst) mod salt and get CACHED in
    // (src, z) layout, ranks explode salt× (node-scale — cheap), and the
    // per-iteration join clusters on (src, z): the hot node's edges
    // spread over `salt` reducers, the edge table still never
    // re-exchanges across iterations, and the integer-nano arithmetic
    // keeps the result BIT-IDENTICAL for any salt (GraphSpec pins it).
    val joined = sym.join(deg, "src").select(col("src"), col("dst"), col("deg"))
    val symDeg = graft.ops.Caches.track(
      if (salt == 1) joined
      else joined
        .withColumn("__z", pmod(xxhash64(col("dst")), lit(salt.toLong)).cast("int"))
        .repartition(col("src"), col("__z")))
    val joinKeys = if (salt == 1) Seq("src") else Seq("src", "__z")
    var pr = deg.select(col("src").as("node"), lit(1000000000L).as("pr_nano"))
    for (_ <- 0 until iters) {
      val ranks0 = pr.withColumnRenamed("node", "src")
      val ranks =
        if (salt == 1) ranks0
        else ranks0.withColumn("__z",
          explode(sequence(lit(0), lit(salt - 1))))
      val contrib = symDeg
        .join(ranks, joinKeys)
        .groupBy(col("dst"))
        .agg(sum(expr("pr_nano div deg")).as("in_nano"))
      pr = contrib.select(col("dst").as("node"),
        (lit(150000000L) + expr("(85 * in_nano) div 100")).as("pr_nano"))
    }
    pr.select(col("node"),
      round(col("pr_nano").cast("double") / 1e9, 6).as("pr"))
  }
}
