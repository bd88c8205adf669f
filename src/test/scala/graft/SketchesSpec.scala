package graft

import graft.text.{Curation, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")

  // ------------------------------------------------------------------ KMV

  test("per-source histograms merge to the global histogram by addition") {
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .select(least((graft.text.TextFunctions.tokenCount(col("text"))
        .cast("long") / 16).cast("long"), lit(63L)).as("bin"))
      .groupBy("bin").count().as[(Long, Long)].collect().toMap
    val whole = hist(docs)
    val merged = docs.select(col("source")).distinct().as[String].collect()
      .map(s => hist(docs.filter(col("source") === s)))
      .foldLeft(Map.empty[Long, Long]) { (acc, h) =>
        (acc.keySet ++ h.keySet).map(k =>
          k -> (acc.getOrElse(k, 0L) + h.getOrElse(k, 0L))).toMap
      }
    assert(whole == merged && whole.values.sum == docs.count())
  }

  test("merged per-group KMV sketches equal the direct global sketch exactly") {
    val merged = graft.text.Sketches
      .kmvMerge(docs, "source", col("text"), k = 16)
      .as[(Long, Double)].collect().head
    val direct = graft.text.Sketches
      .kmvDistinct(docs.withColumn("__g", lit("all")), "__g", col("text"), k = 16)
      .select(col("n_kept"), col("est_distinct"))
      .as[(Long, Double)].collect().head
    assert(merged == direct)
    // and merging a SINGLE group is the identity
    val one = graft.text.Sketches
      .kmvMerge(docs.withColumn("__g", lit("all")), "__g", col("text"), k = 16)
      .as[(Long, Double)].collect().head
    assert(one == direct)
  }

  test("kmvIntersect: exhaustive sketches are exact; estimates track truth") {
    // constructed overlap: A = 0..59, B = 40..99 (overlap 20), C disjoint
    val rows = (0 until 60).map(i => ("A", s"v$i")) ++
      (40 until 100).map(i => ("B", s"v$i")) ++
      (0 until 30).map(i => ("C", s"w$i"))
    val df = rows.toDF("source", "text")
    // k above every cardinality → θ = 1 everywhere → exact set algebra,
    // including the differences (|A\B| = 40, |B\A| = 40, C fully novel)
    val exact = Sketches.kmvIntersect(df, "source", col("text"), k = 512)
      .as[(String, String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(exact(("A", "B")) == (("A", "B", 20L, 20.0, 100.0, 0.2, 40.0, 40.0)))
    assert(exact(("A", "C")) == (("A", "C", 0L, 0.0, 90.0, 0.0, 60.0, 30.0)))
    assert(exact(("B", "C")) == (("B", "C", 0L, 0.0, 90.0, 0.0, 60.0, 30.0)))

    // sketched (k = 32 < cardinalities): estimates within loose KMV error
    val est = Sketches.kmvIntersect(df, "source", col("text"), k = 32)
      .as[(String, String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val (_, _, _, ei, eu, ej, da, db) = est(("A", "B"))
    assert(ei > 5.0 && ei < 60.0, s"intersect estimate off: $ei")
    assert(eu > 50.0 && eu < 200.0, s"union estimate off: $eu")
    assert(ej > 0.04 && ej < 0.6, s"jaccard estimate off: $ej")
    assert(da > 10.0 && da < 120.0 && db > 10.0 && db < 120.0,
      s"difference estimates off: $da / $db")
    assert(est(("A", "C"))._4 == 0.0 && est(("B", "C"))._4 == 0.0)

    // determinism under repartitioning
    val re = Sketches.kmvIntersect(df.repartition(13), "source", col("text"), k = 32)
      .as[(String, String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(re == est)
  }

  // ------------------------------------------------------------------ HLL

  test("merged per-group HLL sketches equal the direct global sketch exactly") {
    val merged = Sketches.hllMerge(docs, "source", col("text"))
      .as[(Long, Double)].collect().head
    val direct = Sketches.hllDistinct(docs.withColumn("__g", lit("all")), "__g", col("text"))
      .select(col("n_set"), col("est_distinct"))
      .as[(Long, Double)].collect().head
    assert(merged == direct)
  }

  test("hllDistinct estimates within HLL error bounds, multiplicity-insensitive") {
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("n")).as[(String, Long)].collect().toMap
    val est = Sketches.hllDistinct(docs, "source", col("text"))
      .select(col("source"), col("est_distinct"))
      .as[(String, Double)].collect().toMap
    assert(est.keySet == exact.keySet)
    // m=256 → ~6.5% stderr; allow 4 sigma plus linear-counting slack
    est.foreach { case (s, e) =>
      val n = exact(s).toDouble
      assert(math.abs(e - n) <= math.max(4, 0.26 * n),
        s"source $s: est $e vs exact $n")
    }
    // duplicating every row must not move a single register or estimate
    val doubled = Sketches.hllDistinct(docs.union(docs), "source", col("text"))
      .select(col("source"), col("est_distinct"))
      .as[(String, Double)].collect().toMap
    assert(doubled == est)
  }

  test("hllDistinct is stable under repartitioning (determinism)") {
    val a = Sketches.hllDistinct(docs, "source", col("text"))
      .collect().map(_.toString()).sorted.toSeq
    val b = Sketches.hllDistinct(docs.repartition(13), "source", col("text"))
      .collect().map(_.toString()).sorted.toSeq
    assert(a == b)
  }

  test("hll linear-counting regime: tiny cardinalities stay near-exact") {
    val tiny = docs.limit(10).withColumn("__g", lit("tiny"))
    val est = Sketches.hllDistinct(tiny, "__g", col("text"))
      .select(col("est_distinct")).as[Double].collect().head
    val exact = tiny.select(countDistinct(col("text"))).as[Long].collect().head
    assert(math.abs(est - exact) <= 1.0, s"est $est vs exact $exact")
  }

  // ------------------------------------------------------------------ CMS

  test("count-min never underestimates and bounds the overestimate") {
    val toks = docs.select(explode(
      graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val sketch = Sketches.cmsSketch(toks, col("tok"))
    val exact = toks.groupBy(col("tok")).count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val probes = (exact.keys.take(30).toSeq :+ "zzz_unseen").toDF("term")
    val est = Sketches.cmsEstimate(sketch, probes, "term")
      .as[(String, Long)].collect().toMap
    est.foreach { case (term, e) =>
      val t = exact.getOrElse(term, 0L)
      assert(e >= t, s"$term: est $e < true $t")
      // 2N/w bound holds per row with p >= 1/2; min over 4 rows makes a
      // violation p <= 1/16 per probe — use 8N/w as a hard spec ceiling
      assert(e - t <= math.max(4, 8 * n / Sketches.CmsCols), s"$term: est $e vs $t")
    }
    assert(est("zzz_unseen") >= 0)
  }

  test("CMS inner product never underestimates the join size, bounded above") {
    val a = sf("orders").select(col("o_custkey").as("k"))
    val b = sf("customer").select(col("c_custkey").as("k"))
    val skA = Sketches.cmsSketch(a, col("k")).withColumnRenamed("cnt", "ca")
    val skB = Sketches.cmsSketch(b, col("k")).withColumnRenamed("cnt", "cb")
    val est = skA.join(skB, Seq("r", "c"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip"))).as[Long].collect().head
    val tru = a.join(b, Seq("k")).count()
    val na = a.count(); val nb = b.count()
    assert(est >= tru, s"est $est < true $tru")
    // CMS bound: overestimate ≤ 2·|A|·|B|/w per row with p ≥ 1/2; min over
    // 4 rows — use 8·|A|·|B|/w as the hard spec ceiling
    assert(est - tru <= math.max(8, 8L * na * nb / Sketches.CmsCols),
      s"est $est vs true $tru (na=$na nb=$nb)")
  }

  test("per-source CMS sketches merge by cell-wise addition to the global sketch") {
    val bySrc = docs.select(col("source"), explode(
      graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val direct = Sketches.cmsSketch(bySrc, col("tok"))
      .as[(Int, Long, Long)].collect()
      .map { case (r, c, cnt) => (r, c) -> cnt }.toMap
    val merged = docs.select(col("source")).distinct().as[String].collect()
      .map(s => Sketches.cmsSketch(bySrc.filter(col("source") === s), col("tok"))
        .as[(Int, Long, Long)].collect())
      .foldLeft(Map.empty[(Int, Long), Long]) { (acc, cells) =>
        cells.foldLeft(acc) { case (a, (r, c, cnt)) =>
          a + ((r, c) -> (a.getOrElse((r, c), 0L) + cnt)) }
      }
    assert(merged == direct)
  }

  test("kmvDistinct is exact below k and within KMV error bounds above it") {
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("n"))
      .as[(String, Long)].collect().toMap
    // k above every group size -> the sketch degenerates to the exact count
    val ks = Sketches.kmvDistinct(docs, "source", col("text"), k = 100000)
      .as[(String, Long, Double)].collect()
    ks.foreach { case (src, kept, est) =>
      assert(kept == exact(src) && est == exact(src).toDouble,
        s"below-k sketch must be exact for $src")
    }
    // k = 64: standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    val est = Sketches.kmvDistinct(docs, "source", col("text"), k = 64)
      .as[(String, Long, Double)].collect()
    est.foreach { case (src, kept, e) =>
      val n = exact(src)
      if (n >= 64) {
        assert(kept == 64)
        assert(math.abs(e - n) / n < 0.51, s"$src: est $e vs exact $n")
      }
    }
  }

  test("kmvDistinct is stable under repartitioning (determinism)") {
    val a = Sketches.kmvDistinct(docs, "source", col("text"), k = 32)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Sketches.kmvDistinct(docs.repartition(13), "source", col("text"), k = 32)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  // ---------------------------------------------------------------- Bloom

  test("bloom membership has zero false negatives and reproduces positions") {
    val keys = (1 to 500).map(i => s"key-$i").toDF("k")
    val bits = Sketches.bloomBuild(keys, col("k"))
    val probeIn = keys.filter(Sketches.bloomMaybeContains(bits, col("k"))).count()
    assert(probeIn == 500, "every inserted key must probe positive")
    // false-positive rate at this fill is bounded (~(1-e^(-kn/m))^k ~ 0.008%)
    val others = (1 to 20000).map(i => s"other-$i").toDF("k")
    val fp = others.filter(Sketches.bloomMaybeContains(bits, col("k"))).count()
    assert(fp < 60, s"false-positive rate out of range: $fp / 20000")
  }

  test("contaminationBloom supersets exact contamination, hit counts dominate") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = Curation.contamination(docs, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    val bloom = Sketches.contaminationBloom(docs, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (id, nExact) =>
      assert(bloom.contains(id), s"doc $id: exact hit missing from bloom pass")
      assert(bloom(id) >= nExact, s"doc $id: bloom count below exact count")
    }
  }

  // --------------------------------------------------------- global order

  test("curriculumOrder: priorities first, md5 shuffle within, dense permutation") {
    val withP = docs.select(col("doc_id"), (col("doc_id") % 3).cast("int").as("p"))
    val out = Sketches.curriculumOrder(withP, "doc_id", col("p"), nShards = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._3).toSeq
    val n = withP.count()
    // dense permutation 0..n-1
    assert(out.map(_._3) == (0L until n).toSeq)
    // priorities are non-decreasing along the position stream
    assert(out.map(_._2) == out.map(_._2).sorted)
    // within a priority, order equals the flat (u, id) rank
    val flat = withP.select(col("doc_id"), col("p"),
        Curation.hashUniform(col("doc_id"), "graft-curriculum").as("u"))
      .as[(Long, Int, Double)].collect()
      .sortBy(t => (t._2, t._3, t._1)).map(_._1).toSeq
    assert(out.map(_._1) == flat)
    // stable under repartitioning and shard-count changes
    val again = Sketches.curriculumOrder(withP.repartition(7), "doc_id",
      col("p"), nShards = 9).as[(Long, Int, Long)].collect().sortBy(_._3).toSeq
    assert(again == out)
  }

  test("globalOrder is a dense permutation equal to the flat global rank") {
    val out = Sketches.globalOrder(docs, "doc_id", nShards = 8)
      .as[(Long, Long)].collect()
    val n = docs.count()
    assert(out.length == n)
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq, "positions must be dense 0..n-1")
    // reference: single-expression global rank (fine at test scale)
    val ref = docs.select(col("doc_id"),
        Curation.hashUniform(col("doc_id"), "graft-shuffle").as("u"))
      .withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("u"), col("doc_id"))).cast("long") - 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    out.foreach { case (id, pos) => assert(ref(id) == pos, s"doc $id rank mismatch") }
  }

  test("globalOrder is stable under repartitioning and shard-count changes") {
    val a = Sketches.globalOrder(docs, "doc_id", nShards = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sketches.globalOrder(docs.repartition(17), "doc_id", nShards = 32)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "order must not depend on partitioning or shard count")
  }

  test("bottom-k quantiles: exact order stats, merge ≡ direct, bounded plan") {
    val rows = (1L to 500L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", i * 7 % 997))
    val df = rows.toDF("id", "grp", "v")
    val sk = Sketches.bottomKQuantiles(df, "grp", col("v"), "id", k = 32)
    // the rank-<=k filter must compile to a map-side WindowGroupLimit
    assert(sk.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val got = sk.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // independent Scala oracle: same md5 ladder, bottom-32 by (u, id),
    // exact integer ceil-index picks
    def u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-quant:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
        .toDouble / 4294967296.0
    }
    val expect = rows.groupBy(_._2).map { case (g, rs) =>
      val sample = rs.sortBy(r => (u(r._1), r._1.toString)).take(32).map(_._3).sorted
      val n = sample.length
      g -> (n.toLong, sample((n + 1) / 2 - 1), sample((9 * n + 9) / 10 - 1))
    }
    assert(got == expect)

    // merge property: global sketch from per-group samples equals the
    // direct sketch over the whole table under one constant group
    val merged = Sketches.bottomKQuantilesMerged(df, "grp", col("v"), "id", 32)
      .as[(Long, Long, Long)].collect().toSeq
    val direct = Sketches.bottomKQuantiles(
        df.withColumn("g", lit("all")), "g", col("v"), "id", 32)
      .select(col("n_sample"), col("p50"), col("p90"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(merged == direct, "merged bottom-k must equal the direct sketch")
  }

  test("corpus_zipf: exact head fit matches a plain-Scala recomputation") {
    val zipf = SparkEntry.queries("corpus_zipf")
    val got = zipf(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()(0)
    // plain-Scala replay: token counts → (cnt desc, token) head → floor-log2
    // points → exact 2-var normal equations with truncated division
    val counts = docs.select(col("text")).as[String].collect()
      .flatMap(t0 => { val t = t0.trim.toLowerCase
        if (t.isEmpty) Array("") else t.split("\\s+") })
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val top = counts.sortBy { case (tok, c) => (-c, tok) }.take(1024)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (BigInt(63 - java.lang.Long.numberOfLeadingZeros(i + 1L)),
        BigInt(63 - java.lang.Long.numberOfLeadingZeros(c))) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val det = n * sxx - sx * sx
    assert(det != 0)
    val nano = BigInt(1000000000L)
    val expected = (((n * sxy - sx * sy) * nano / det).toLong,
      ((sy * sxx - sx * sxy) * nano / det).toLong, pts.size.toLong)
    assert(got == expected)
    // the head selection must plan as a per-partition top-k, not a
    // vocab-wide single-partition sort
    val plan = zipf(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
