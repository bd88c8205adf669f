package graft

import graft.graph.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // facts: group -> items; (1,2) co-occurs 3×, (2,3) 2×, (1,3) 1×
  private def facts = Seq(
    ("g1", 1L), ("g1", 2L), ("g1", 3L),
    ("g2", 1L), ("g2", 2L),
    ("g3", 2L), ("g3", 3L),
    ("g4", 1L), ("g4", 2L), ("g4", 2L) // duplicate item in one group
  ).toDF("g", "item")

  test("coOccurrenceEdges counts distinct-per-group pairs and thresholds") {
    val e = Graph.coOccurrenceEdges(facts, "g", "item", minSupport = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(e == Set((1L, 2L, 3L), (2L, 3L, 2L)))
    // support 1 pairs appear when the threshold admits them
    val all = Graph.coOccurrenceEdges(facts, "g", "item", minSupport = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 2L, 3L), (2L, 3L, 2L), (1L, 3L, 1L)))
  }

  test("degrees sum to twice the edge count") {
    val e = Graph.coOccurrenceEdges(facts, "g", "item", minSupport = 1L)
    val d = Graph.degrees(e).as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(d.values.sum == 2 * e.count())
  }

  test("kCore: clique survives, chain peels, cascade reaches fixpoint") {
    // 4-clique {1,2,3,4} (degree 3 each) + pendant chain 4-5-6: k=3 keeps
    // exactly the clique, and the chain must peel in CASCADE (removing 6
    // makes 5 low, removing 5 drops the 4-5 edge) — two rounds, not one
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("p1", "p2")
    val core = Graph.kCore(e, k = 3L).as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // every surviving node's IN-CORE degree meets k by definition
    assert(core.values.forall(_ >= 3L))
    // k above the max degree peels everything
    assert(Graph.kCore(e, k = 10L).isEmpty)
    // k=1 keeps the whole graph
    assert(Graph.kCore(e, k = 1L).count() == 6L)
  }

  test("triangleCounts finds each triangle once, credited to all corners") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
      .toDF("p1", "p2")
    // triangles: (1,2,3) and (2,3,4)
    val tc = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(tc == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("degree-oriented triangles match brute force on a hub graph with ties") {
    // hub 0 connected to 1..8; ring 1-2-3-...-8-1; plus chord (1,5):
    // triangles = the 8 hub-ring wedges (0,i,i+1) — a shape where the
    // old value-orientation emits deg(hub)² wedges from the hub and the
    // degree orientation emits only the ring nodes' forward pairs
    val ring = (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1))
    val hub = (1L to 8L).map(i => (0L, i))
    val edges = (hub ++ ring ++ Seq((1L, 5L))).toDF("p1", "p2")
    def brute(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keys.toSeq.sorted
      val tris = for {
        a <- nodes; b <- nodes if a < b && adj(a)(b)
        c <- nodes if b < c && adj(a)(c) && adj(b)(c)
      } yield Seq(a, b, c)
      tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    }
    val want = brute(hub ++ ring ++ Seq((1L, 5L)))
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("commonNeighborSim maxDegree drops hub-witnessed pairs, keeps exact scores") {
    // hub 0 adjacent to everyone; 1-2 and 3-4 also share non-hub witnesses
    val edges = ((1L to 6L).map(i => (0L, i)) ++
      Seq((1L, 5L), (2L, 5L), (1L, 6L), (2L, 6L))).toDF("p1", "p2")
    val full = Graph.commonNeighborSim(edges, minCommon = 1L)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    // capped at 5: the hub (degree 6) leaves the NEIGHBOR role; pairs
    // whose only witness was the hub (e.g. 3-4) vanish, pairs with
    // non-hub witnesses (1-2 via 5 and 6) survive with exact jaccard
    val capped = Graph.commonNeighborSim(edges, minCommon = 1L, maxDegree = 5L)
    val cappedPairs = capped.select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(full.contains((3L, 4L)) && !cappedPairs.contains((3L, 4L)))
    assert(cappedPairs.contains((1L, 2L)))
    val row = capped.filter(col("a") === 1L && col("b") === 2L)
      .select(col("common"), col("jaccard")).head()
    // witnesses 5,6 (hub dropped); degrees stay UNCAPPED: deg(1)=deg(2)=3
    assert(row.getLong(0) == 2L)
    assert(row.getDouble(1) == math.rint(2.0 / (3 + 3 - 2) * 1e6) / 1e6)
  }

  test("pageRank is bit-identical under any salt (skew immunity is free)") {
    val edges = ((1L to 9L).map(i => (0L, i)) ++
      Seq((1L, 2L), (3L, 4L), (5L, 6L))).toDF("p1", "p2")
    val base = Graph.pageRank(edges, iters = 3)
      .as[(Long, Double)].collect().toMap
    for (s <- Seq(2, 4, 7)) {
      val salted = Graph.pageRank(edges, iters = 3, salt = s)
        .as[(Long, Double)].collect().toMap
      assert(salted == base, s"salt=$s diverged")
    }
  }

  test("pageRank is exactly 1.0 on a regular graph and matches brute force") {
    // 4-cycle: every node degree 2, uniform start -> stationary at 1.0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("p1", "p2")
    val pr = Graph.pageRank(cyc, iters = 3).as[(Long, Double)].collect().toMap
    assert(pr.values.forall(_ == 1.0))

    // star 0-(1,2,3): brute-force the integer recurrence
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("p1", "p2")
    val got = Graph.pageRank(star, iters = 2).as[(Long, Double)].collect().toMap
    def step(c: Long, l: Long): (Long, Long) = {
      val cIn = 3L * (l / 1L)   // three leaves, each degree 1
      val lIn = c / 3L          // center degree 3
      (150000000L + 85L * cIn / 100L, 150000000L + 85L * lIn / 100L)
    }
    val (c1, l1) = step(1000000000L, 1000000000L)
    val (c2, l2) = step(c1, l1)
    def r6(nano: Long): Double = // same HALF_UP rule as Spark's round()
      BigDecimal(nano, 9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L) == r6(c2))
    assert(got(1L) == r6(l2))
    assert(got(1L) == got(2L) && got(2L) == got(3L))
  }

  test("basketRules: confidence/lift hand-check on the fixture") {
    val e = Graph.coOccurrenceEdges(facts, "g", "item", minSupport = 2L)
    val ig = Graph.itemGroupCounts(facts, "g", "item")
    assert(ig.as[(Long, Long)].collect().toMap == Map(1L -> 3L, 2L -> 4L, 3L -> 2L))
    val rules = Graph.basketRules(e, ig, nGroups = 4L)
      .select(col("ante"), col("cons"), col("support"), col("confidence"), col("lift"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // 1 -> 2: joint 3, n(1)=3, n(2)=4, N=4: conf 1.0, lift 1.0/(4/4)=1.0
    assert(rules((1L, 2L)) == ((0.75, 1.0, 1.0)))
    // 2 -> 1: joint 3, n(2)=4: conf 0.75, lift 0.75/(3/4)=1.0
    assert(rules((2L, 1L)) == ((0.75, 0.75, 1.0)))
    // 3 -> 2: joint 2, n(3)=2: conf 1.0, lift 1.0
    assert(rules((3L, 2L)) == ((0.5, 1.0, 1.0)))
    // every edge yields both directions
    assert(rules.size == 2 * e.count())
  }

  test("commonNeighborSim: wedge hand-check") {
    // square 1-2-3-4-1: opposite corners share exactly their 2 neighbors
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("p1", "p2")
    val sim = Graph.commonNeighborSim(sq, minCommon = 2L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // N(1)={2,4}, N(3)={2,4}: common 2, union 2+2-2=2 -> jaccard 1.0
    assert(sim == Map((1L, 3L) -> ((2L, 1.0)), (2L, 4L) -> ((2L, 1.0))))
    // adjacent corners share no common neighbor >= 2 -> absent
    assert(!sim.contains((1L, 2L)))
  }

  test("edge derivation never self-joins the fact table (one shuffle in)") {
    val plan = Graph.coOccurrenceEdges(facts, "g", "item").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("kCore: adversarial deep peel — a 140-node path at k=2 empties past the old 64-round cap") {
    // a path peels only from its two ends, so n nodes need ~n/2 rounds:
    // 140 nodes ≈ 70 rounds — deeper than any fixed constant cap a dense
    // power-law graph would suggest. The derived |V|+1 bound terminates.
    val path = (1L until 140L).map(i => (i, i + 1)).toDF("p1", "p2")
    assert(Graph.kCore(path, k = 2L).isEmpty) // no 2-core in a tree
    // a cycle of the same size IS its own 2-core: peel converges round 1
    val cycle = ((1L until 140L).map(i => (i, i + 1)) :+ (1L, 140L))
      .toDF("p1", "p2")
    assert(Graph.kCore(cycle, k = 2L).count() == 140L)
  }

  test("kCore: caller-pinned bound fails LOUD exactly past the peel depth") {
    // a 10-node path at k=2 peels both ends for 5 rounds and confirms the
    // (empty) fixpoint on round 6: pinning the bound at 6 converges,
    // pinning at 5 must abort with the documented message — never return a
    // partial peel the oracle gate would only catch as an opaque mismatch
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("p1", "p2")
    assert(Graph.kCore(path, k = 2L, maxRounds = 6).isEmpty)
    val ex = intercept[IllegalArgumentException] {
      Graph.kCore(path, k = 2L, maxRounds = 5).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents: adversarial 200-node path converges under the derived log bound") {
    // worst-case diameter for min-label propagation; pointer jumping keeps
    // rounds logarithmic, so the derived 2·log2(n)+8 cap must suffice on
    // the DISTRIBUTED path (driverEdgeLimit = 0)
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("p1", "p2")
    val labels = graft.dedup.Components
      .connectedComponents(path, "p1", "p2", driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 200 && labels.values.forall(_ == 1L))
  }

  test("connectedComponents: an insufficient pinned cap fails LOUD, not a partial labeling") {
    val path = (1L until 50L).map(i => (i, i + 1)).toDF("p1", "p2")
    val ex = intercept[IllegalArgumentException] {
      graft.dedup.Components
        .connectedComponents(path, "p1", "p2", maxIters = 1,
          driverEdgeLimit = 0L)
        .count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("graph_components executes the distributed CC loop, not the driver shortcut") {
    // two components: {1,2,3} path-shaped and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("p1", "p2")
    val before = graft.dedup.Components.driverPathCount.get()
    val distributed = graft.dedup.Components
      .connectedComponents(edges, "p1", "p2", driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(graft.dedup.Components.driverPathCount.get() == before,
      "driverEdgeLimit = 0 must bypass the driver union-find")
    // and the shortcut, when taken, agrees and bumps the probe
    val viaDriver = graft.dedup.Components
      .connectedComponents(edges, "p1", "p2")
      .as[(Long, Long)].collect().toMap
    assert(graft.dedup.Components.driverPathCount.get() == before + 1)
    assert(distributed == viaDriver)
    assert(distributed == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
