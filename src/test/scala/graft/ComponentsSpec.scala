package graft

import graft.dedup.Components
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components + survivor resolution over near-dup pair sets. */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def cc(ps: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponents(pairs(ps: _*), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("clique, path and separate clusters all label to the component min") {
    val labels = cc(
      // clique {1,2,3}
      (1L, 2L), (2L, 3L), (1L, 3L),
      // separate pair {10, 11}
      (11L, 10L),
      // path 20-21-22-23-24 (transitivity: no direct 20-24 pair)
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L))
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
    graft.ops.Caches.release()
  }

  test("a long path converges within the O(log n) round budget") {
    // path of 40 nodes: diameter 39 — pure neighbor propagation would need
    // ~39 rounds; pointer jumping must close it within the default 25.
    // driverEdgeLimit = 0 pins the DISTRIBUTED loop (the default would
    // route a graph this small to the driver union-find)
    val ps = (0L until 39L).map(i => (i, i + 1))
    val labels = Components
      .connectedComponents(pairs(ps: _*), "id_a", "id_b", driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 40 && labels.values.forall(_ == 0L))
    graft.ops.Caches.release()
  }

  test("driver union-find path and distributed loop agree on every shape") {
    val shapes = Seq(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (11L, 10L),
        (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)),
      (0L until 39L).map(i => (i, i + 1)),
      Seq((5L, 5L))) // self-loop degenerate
    shapes.foreach { ps =>
      val viaDriver = Components
        .connectedComponents(pairs(ps: _*), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val viaLoop = Components
        .connectedComponents(pairs(ps: _*), "id_a", "id_b", driverEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == viaLoop, s"paths diverge on $ps")
    }
    graft.ops.Caches.release()
  }

  test("random pair sets match a union-find reference") {
    // deterministic pseudo-random edges (no RNG): node ids and endpoints
    // derived from a hash mix — mixes cliques, chains and singletons
    def mix(i: Long): Long = {
      var x = i * 0x9E3779B97F4A7C15L
      x ^= x >>> 32; x.abs
    }
    val n = 60
    val edges = (0 until 90).map { i =>
      (mix(i) % n, mix(i * 7 + 3) % n)
    }.filter { case (a, b) => a != b }

    def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min id of the component
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.toSeq.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
    }

    val got = cc(edges: _*)
    assert(got == unionFind(edges))
    graft.ops.Caches.release()
  }

  test("incremental merge over star-contracted labels equals the full recompute") {
    def mix(i: Long): Long = {
      var x = i * 0x9E3779B97F4A7C15L
      x ^= x >>> 32; x.abs
    }
    import spark.implicits._
    for (trial <- 0 until 3) {
      val n = 40 + trial * 13
      val all = (0 until 70).map { i =>
        (mix(i + trial * 1000) % n, mix(i * 7 + 3 + trial) % n)
      }.filter { case (a, b) => a != b }
      // arbitrary split: old batch vs delta (delta may merge old components)
      val (oldE, newE) = all.splitAt(all.length / 2)
      val labels0 = graft.dedup.Components.connectedComponents(
        oldE.toDF("id_a", "id_b"), "id_a", "id_b")
      val merged = graft.dedup.Components.incrementalComponents(
        labels0, newE.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val full = graft.dedup.Components.connectedComponents(
        all.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(merged == full, s"trial $trial")
      graft.ops.Caches.release()
    }
  }

  test("survivors keep singletons and the smallest id per cluster, full schema") {
    val docs = Seq(
      (1L, "a"), (2L, "a'"), (3L, "a''"), // cluster -> keep 1
      (7L, "unique"),                     // singleton -> keep
      (10L, "b"), (11L, "b'")             // cluster -> keep 10
    ).toDF("doc_id", "text")
    val out = Components.survivors(docs, "doc_id",
      pairs((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 7L, 10L))
    graft.ops.Caches.release()
  }

  test("survivorsByKey keeps the best-keyed member, ties to smallest id") {
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "a"),  // cluster: 2 wins on length
      (7L, "unique"),                       // singleton -> keep
      (10L, "bb"), (11L, "bb"), (12L, "b")  // tie 10 vs 11 -> smaller id 10
    ).toDF("doc_id", "text")
    val out = Components.survivorsByKey(docs, "doc_id",
      pairs((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)),
      d => length(d("text")).cast("long"))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 7L, 10L))
    graft.ops.Caches.release()
  }

  test("survivorsByKey with id as the inverted key equals min-id survivors") {
    val docs = sf("documents").limit(200).cache()
    val ps = graft.dedup.DocDedup.nearDupPairs(docs, "text", "doc_id",
      threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
      .cache()
    val byKey = Components.survivorsByKey(docs, "doc_id", ps,
      d => -d("doc_id")) // "best" = smallest id, so both paths must agree
      .select("doc_id").as[Long].collect().sorted.toSeq
    val classic = Components.survivors(docs, "doc_id", ps)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byKey == classic)
    ps.unpersist(); docs.unpersist()
    graft.ops.Caches.release()
  }
}
