package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-dup RESOLUTION: candidate pairs → connected components → one
  * survivor per cluster. [[DocDedup.nearDupPairs]] (and the SimHash /
  * embedding variants) emit verified duplicate PAIRS; to actually drop
  * documents the pairs must first be closed transitively (A near-dups B,
  * B near-dups C ⇒ {A,B,C} is one cluster even when (A,C) fell under the
  * threshold) and then each cluster reduced to a representative.
  *
  * Components by iterative min-label propagation in pure DataFrame algebra
  * (no GraphX dependency, no RDDs):
  *   - every node starts labeled with itself;
  *   - each round takes the min label over direct neighbors (one join +
  *     partial-aggregated groupBy on the edge set) AND the label of the
  *     node's current label (pointer jumping — one self-join on the node
  *     set). Neighbor propagation alone needs O(diameter) rounds; pointer
  *     jumping halves label-chain depth each round, so together they
  *     converge in O(log n) joins even on path-shaped clusters;
  *   - convergence is detected with one cheap agg per round: labels only
  *     ever decrease, so the summed label hashes change whenever any label
  *     moved. A sum collision WOULD stop the loop early, so two
  *     independently-seeded 64-bit hash sums are compared (both colliding
  *     on the same round is ~2^-128 — beyond cosmic-ray territory).
  *
  * Scale: the node set is the docs that appear in at least one near-dup
  * pair — a small fraction of the corpus — and every shuffle here is over
  * (id, label) pairs, never documents. Each round is localCheckpoint-
  * truncated so chained rounds keep constant-size plans.
  */
object Components {

  /** (id, cluster) for every node that appears in `pairs`; `cluster` is the
    * smallest id in the node's connected component.
    *
    * Hybrid execution: the edge set is counted first (one job against the
    * cached frame that every path materializes anyway). At or below
    * `driverEdgeLimit` edges — megabytes, the same control-data regime as
    * collected centroids or touched-bucket sets — the closure runs as a
    * single collect + union-find on the driver: the O(log n) distributed
    * loop's per-round fixed job cost (2 joins + fingerprint probe × ~3-5
    * rounds) buys nothing on a graph that fits in one task. Above the
    * limit the label-propagation loop below is the scale path; both paths
    * are property-tested equal. Integral id types only on the driver path
    * (near-dup ids are longs everywhere here); anything else always runs
    * distributed. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 0,
                          driverEdgeLimit: Long = 500000L): DataFrame = {
    // undirected edge set, both directions (distinct: band dedup upstream
    // usually already did this, but correctness must not depend on it)
    val edges = pairs.select(col(aCol).as("__src"), col(bCol).as("__dst"))
      .unionByName(pairs.select(col(bCol).as("__src"), col(aCol).as("__dst")))
      .distinct()
    graft.ops.Caches.track(edges)

    val spark = pairs.sparkSession
    val idType = edges.schema("__src").dataType
    val integralIds = idType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // FUSED size probe + collect: limit(driverEdgeLimit+1).collect() in ONE
    // job — at most `limit` rows back means the probe already holds the
    // COMPLETE edge set (the previous count-then-collect shape paid the
    // pipeline in the count and a second job for the collect). The decision
    // unit is unchanged: distinct directed edges vs driverEdgeLimit. A
    // probe overflow (limit+1 rows) is discarded and the loop below runs
    // against the cached edge frame. driverEdgeLimit <= 0 (graph_components'
    // forced-distributed knob) skips the probe entirely.
    if (integralIds && driverEdgeLimit > 0) {
      import spark.implicits._
      val cap = math.min(driverEdgeLimit, (Int.MaxValue - 2).toLong).toInt + 1
      val probe = edges.select(col("__src").cast("long"), col("__dst").cast("long"))
        .limit(cap).as[(Long, Long)].collect()
      // STRICTLY fewer rows than requested proves the probe holds the
      // complete edge set even when cap clamped below driverEdgeLimit+1
      // (a Long limit near Int.MaxValue would otherwise accept a
      // TRUNCATED probe and union-find a partial graph)
      if (probe.length < cap) {
        driverPathCount.incrementAndGet()
        return driverUnionFind(probe).toSeq.toDF("id", "cluster")
          .select(col("id").cast(idType), col("cluster").cast(idType).as("cluster"))
      }
    }
    // distributed path: one count job against the tracked cache, sizing
    // the LOG-SCALED iteration bound below
    val nEdges = edges.count()
    // tiny-data loop: every round shuffles (id, label) pairs of the
    // near-dup node set — AQE's per-stage job splitting and the session's
    // shuffle width only add fixed overhead here (same rationale as
    // BucketedRun's batch body; BatchConf serializes tuned bodies because
    // the settings are session-global)
    graft.core.BatchConf.withBatchTuning(spark) {

    // localCheckpoint (not cache) per round: the round plan references the
    // previous labels frame three times (neighbor join + the jump
    // self-join), so an uncheckpointed loop nests the logical plan 3× per
    // round and Catalyst analysis alone goes exponential. Checkpointing
    // truncates to the materialized RDD; blocks are reaped by the
    // ContextCleaner once the driver GCs the handles (same pattern and
    // caveat as IncrementalRun's batch truncation).
    // Init label = min(id, min neighbor) — one aggregation that already
    // converges star- and clique-shaped clusters (the common near-dup
    // shapes), leaving the loop one confirming round.
    // lazy localCheckpoint: the convergence fingerprint right after is the
    // materializing action, so checkpoint + probe cost ONE job per round
    var labels = edges.groupBy(col("__src").as("id"))
      .agg(min(col("__dst")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("label"))
      .localCheckpoint(false)
    // decimal sums: ANSI mode would throw on long overflow of summed
    // hashes; two differently-keyed sums so a single-sum collision cannot
    // falsely signal convergence
    def fingerprint(df: DataFrame): (java.math.BigDecimal, java.math.BigDecimal) = {
      val r = df.agg(
        sum(xxhash64(col("id"), col("label")).cast("decimal(38,0)")),
        sum(xxhash64(lit("cc2"), col("label"), col("id")).cast("decimal(38,0)"))).head()
      (r.getDecimal(0), r.getDecimal(1))
    }
    var fp = fingerprint(labels)

    // pointer jumping halves label-chain depth per round, so convergence is
    // O(log n); maxIters <= 0 (the default) derives the cap from the graph
    // — 2·log2(nodes) + 8 rounds (nodes <= 2·edges, generous 2× headroom
    // over the halving argument) — instead of a fixed constant that a deep
    // adversarial shape could exceed. Non-convergence within the cap now
    // FAILS (require below) rather than silently returning a partial
    // labeling that downstream survivor selection would treat as truth.
    val iterBound =
      if (maxIters > 0) maxIters
      else 2 * (64 - java.lang.Long.numberOfLeadingZeros(2 * nEdges + 2)) + 8
    var converged = false
    var iter = 0
    while (!converged && iter < iterBound) {
      // min label among direct neighbors
      val viaNeighbors = edges
        .join(labels, col("__dst") === col("id"))
        .groupBy(col("__src").as("nid")).agg(min(col("label")).as("nlab"))
        .select(col("nid"), col("nlab"))
      // pointer jumping: the label of my label
      val viaJump = labels.select(col("id").as("jid"), col("label").as("jkey"))
        .join(labels.select(col("id").as("lid"), col("label").as("jlab")),
          col("jkey") === col("lid"))
        .select(col("jid"), col("jlab"))
      val next = labels
        .join(viaNeighbors, col("id") === col("nid"), "left")
        .join(viaJump, col("id") === col("jid"), "left")
        .select(col("id"),
          least(col("label"), col("nlab"), col("jlab")).as("label"))
        .localCheckpoint(false) // materialized by the fingerprint probe
      val nextFp = fingerprint(next)
      converged = nextFp == fp
      fp = nextFp
      labels = next
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $iterBound rounds " +
        s"($nEdges directed edges) — partial labels would silently " +
        "mis-cluster; raise maxIters explicitly if the shape is legitimate")
    labels.select(col("id"), col("label").as("cluster"))
    }
  }

  /** Test probe: executions of the driver union-find shortcut — lets specs
    * assert a query advertised as distributed actually ran the
    * star-contraction loop (GraphSpec) without parsing executed plans. */
  private[graft] val driverPathCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Min-representative union-find (union attaches the larger root under
    * the smaller, so every root IS its component's min id; iterative find
    * with path compression — no recursion, safe on long chains). */
  private[dedup] def driverUnionFind(es: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { x = p; p = parent.getOrElse(x, x) }
      var y = x0
      while (y != x) { val py = parent.getOrElse(y, y); parent(y) = x; y = py }
      x
    }
    es.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val out = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (a, b) =>
      if (!out.contains(a)) out(a) = find(a)
      if (!out.contains(b)) out(b) = find(b)
    }
    out.toMap
  }

  /** INCREMENTAL component maintenance: fold NEW edges into an EXISTING
    * labeling without replaying historical edges. Each prior component
    * contracts to its (id, cluster) star edges — a spanning subgraph with
    * the same connectivity — so CC over (stars ∪ delta) equals CC over
    * (all old edges ∪ delta) exactly, and cluster ids (component minima)
    * can only merge downward. The incremental input is |labels| + |delta|
    * rows, never the historical pair set: the shape a rolling 100 TB dedup
    * keeps per batch. Property-tested equal to the full recompute. */
  def incrementalComponents(prevLabels: DataFrame, newPairs: DataFrame,
                            aCol: String = "id_a", bCol: String = "id_b"): DataFrame =
    connectedComponents(
      newPairs.select(col(aCol), col(bCol)).unionByName(
        prevLabels.select(col("id").as(aCol), col("cluster").as(bCol))),
      aCol, bCol)

  /** [[survivors]] against an already-computed component map. */
  def survivorsFromLabels(docs: DataFrame, idCol: String,
                          labels: DataFrame): DataFrame = {
    val cc = labels
      .select(col("id").as("__cc_id"), col("cluster").as("__cc_cluster"))
    docs.join(cc, docs(idCol) === col("__cc_id"), "left")
      .filter(col("__cc_id").isNull || col("__cc_cluster") === docs(idCol))
      .drop("__cc_id", "__cc_cluster")
  }

  /** Drop every non-representative member of each near-dup cluster: a doc
    * survives iff it is in no pair (singleton) or is its cluster's smallest
    * id. Keeps `docs`' full schema. */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String = "id_a", bCol: String = "id_b"): DataFrame =
    // the component map is tiny next to the corpus (only docs with a
    // near-dup appear), but data-dependent — AQE sees its runtime size at
    // the join and picks broadcast when it fits
    survivorsFromLabels(docs, idCol, connectedComponents(pairs, aCol, bCol))

  /** Resolution that keeps the BEST cluster member rather than the smallest
    * id: per cluster the doc maximizing `key(docs)` wins, ties broken by
    * smallest id — the FineWeb/RefinedWeb convention of keeping the longest
    * (or highest-quality-scored) copy of a near-dup family instead of an
    * arbitrary one. `key` must be an integral column (exact cross-engine
    * argmax; a double key's ties are platform-shaped).
    *
    * Plan shape: the component map covers only docs that appear in a pair,
    * so the winner aggregate runs over that small set — one groupBy on
    * cluster ids — and joins back to the corpus exactly like [[survivors]]
    * (AQE broadcasts the map when it fits). Keeps `docs`' full schema. */
  def survivorsByKey(docs: DataFrame, idCol: String, pairs: DataFrame,
                     key: DataFrame => Column,
                     aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__cc_id"), col("cluster").as("__cc_cluster"))
    val members = docs.join(labels, docs(idCol) === col("__cc_id"))
    // argmax(key) with min-id tie-break as one min(struct(-key, id)):
    // integral key ⇒ negation is exact and the struct order IS the rank
    val winners = members
      .groupBy(col("__cc_cluster"))
      .agg(min(struct((-key(docs)).as("__nk"), docs(idCol).cast("long").as("__id")))
        .as("__best"))
      .select(col("__best.__id").as("__win_id"))
    val winSet = winners.select(col("__win_id"))
    docs.join(labels, docs(idCol) === col("__cc_id"), "left")
      .join(winSet, docs(idCol) === col("__win_id"), "left")
      .filter(col("__cc_id").isNull || col("__win_id").isNotNull)
      .drop("__cc_id", "__cc_cluster", "__win_id")
  }
}
