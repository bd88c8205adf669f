package graft

import graft.dedup.DocDedup
import graft.sim.Similarity
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline ops: dedup family, similarity search, text stats. */
class DedupSimSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")
  private lazy val emb = sf("embeddings")
  graft.functions.GraftFunctions.register(spark)

  test("crossNearDupPairs vs the corpus itself reproduces the self-join pair set") {
    val self = DocDedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val cross = DocDedup.crossNearDupPairs(docs, docs, "text", "doc_id",
        threshold = 0.8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // every document pairs with itself (jaccard 1)
    assert(cross.count { case (a, b) => a == b } == docs.count())
    // orientation-normalized non-identity pairs equal the self-join set
    val norm = cross.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }
    assert(norm == self && self.nonEmpty)
  }

  test("native graft_dot is bit-identical to the HOF fold (same element order)") {
    val out = emb.limit(64).select(
      Similarity.dot(col("embedding"), col("embedding")).as("native"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("hof"))
      .as[(Double, Double)].collect()
    assert(out.nonEmpty && out.forall { case (n, h) => n == h })
  }

  test("simhashMd5 matches the plain-Scala md5 reference bit for bit") {
    val texts = Seq("Hello World", "a b c d e f", "the quick brown fox",
      "singletoken", "x 1 2 y", "")
    val got = texts.toDF("text")
      .select(DocDedup.simhashMd5(col("text"))).as[Long].collect().toSeq
    assert(got == texts.map(TestRefs.simhashMd5))
  }

  test("native minhash/simhash/jaccard kernels are bit-identical to the HOF forms") {
    val sets = docs.select(col("doc_id"),
      array_distinct(DocDedup.shingles(col("text"))).as("sh"))
    val mh = sets.select(
      DocDedup.minhashSignatureOfSets(col("sh"), 32).as("native"),
      DocDedup.minhashSignatureOfSetsHof(col("sh"), 32).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(mh.nonEmpty && mh.forall { case (n, h) => n == h })

    val sh = docs.select(
      DocDedup.simhash(col("text")).as("native"),
      DocDedup.simhashHof(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    assert(sh.nonEmpty && sh.forall { case (n, h) => n == h })

    val pairs = sets.limit(40).select(col("doc_id").as("id_a"), col("sh").as("sa"))
      .crossJoin(sets.limit(40).select(col("doc_id").as("id_b"), col("sh").as("sb")))
    val jc = pairs.select(
      DocDedup.jaccardSets(col("sa"), col("sb")).as("native"),
      DocDedup.jaccardSetsHof(col("sa"), col("sb")).as("hof"))
      .as[(Double, Double)].collect()
    assert(jc.nonEmpty && jc.forall { case (n, h) => n == h })

    val lb = emb.select(
      Similarity.lshBucket(col("embedding"), 64, nBits = 10, seed = 7).as("native"),
      Similarity.lshBucketHof(col("embedding"), 64, nBits = 10, seed = 7).as("hof"))
      .as[(Long, Long)].collect()
    assert(lb.nonEmpty && lb.forall { case (n, h) => n == h })
  }

  test("exact dedup keeps one survivor per normalized content") {
    val d = Seq(
      (1L, "hello  world foo"),
      (2L, "Hello world FOO"), // same after normalize
      (3L, "something else entirely")
    ).toDF("doc_id", "text")
    val out = DocDedup.exact(d, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L)) // smallest id survives
  }

  test("MinHash+LSH near-dup pairs == all exact-Jaccard pairs above threshold") {
    // ground truth: quadratic exact jaccard on the sf0.001 documents table
    // (shingle sets precomputed once per doc — per-pair recompute is ~20×)
    val sets = docs.select(col("doc_id"),
      array_distinct(DocDedup.shingles(col("text"))).as("sh"))
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sa")).repartition(8)
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("j", DocDedup.jaccardSets(col("sa"), col("sb")))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = DocDedup.nearDupPairs(docs, "text", "doc_id", 0.8, numHashes = 32, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")
    assert(lsh == truth)
  }

  test("lshTune: md5 signature reference, S-curve monotonicity, bounds") {
    // md5 MinHash matches a plain-Scala recomputation bit for bit
    val two = docs.limit(2)
    val spark2 = two.select(col("doc_id"),
        DocDedup.shingles(col("text")).as("sh"))
      .withColumn("sig", DocDedup.minhashSignatureMd5(
        array_distinct(col("sh")), 4))
      .select(col("doc_id"), col("sh"), col("sig"))
      .as[(Long, Seq[String], Seq[Long])].collect()
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    for ((_, sh, sig) <- spark2; i <- 0 until 4)
      assert(sig(i) == sh.distinct.map(x => u32(s"$i:$x")).min)

    // tuner invariants on the corpus sample: hits bounded by both counts,
    // candidates and recall monotone non-decreasing in the band count
    // (finer bands can only add collisions)
    val tune = DocDedup.lshTune(docs, "text", "doc_id", threshold = 0.8,
        numHashes = 16, bandChoices = Seq(2, 4, 8), sampleSize = 256)
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(tune.map(_._1).toSeq == Seq(2, 4, 8))
    for ((b, r, nc, nt, nh, p, rec) <- tune) {
      assert(b * r == 16 && nh <= nc && nh <= nt)
      assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
    }
    assert(tune.map(_._3).sliding(2).forall { case Array(a, b) => a <= b })
    assert(tune.map(_._7).sliding(2).forall { case Array(a, b) => a <= b })
  }

  test("LSH bucket cap drops degenerate buckets explicitly, keeps the rest") {
    // five identical docs share every band bucket (bucket size 5); one
    // distinct near-dup pair (6,7) sits in buckets of size 2
    val rows = (1L to 5L).map(i => (i, "the same boilerplate block of text repeated " +
      "across many documents word for word")) ++ Seq(
      (6L, "an actually unique document about spark shuffles and parquet files"),
      (7L, "an actually unique document about spark shuffles and parquet data"))
    val d = rows.toDF("doc_id", "text")
    val all = DocDedup.nearDupPairs(d, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all.contains((6L, 7L)) && all.size == 11) // C(5,2) + (6,7)
    val capped = DocDedup.nearDupPairs(d, "text", "doc_id", threshold = 0.5,
      maxBucketSize = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((6L, 7L))) // boilerplate buckets dropped, real pair kept
  }

  test("SimHash: identical docs at distance 0; pairs are verified candidates") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark and parquet files here")
    ).toDF("doc_id", "text")
    val pairs = DocDedup.simhashPairs(d, "text", "doc_id", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("brute-force top-k: k rows per query, correctly ranked") {
    val q = emb.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 4)
    val per = out.groupBy("query_id").count().select("count").as[Long].collect()
    assert(per.forall(_ == 4) && per.length == 3)
    // rank 1 has the max cosine within each query group
    val r = out.select("query_id", "cosine", "rank").as[(Long, Double, Int)].collect()
      .groupBy(_._1)
    r.values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sortBy(-(_: Double)).toSeq)
    }
  }

  test("LSH ANN top-k achieves reasonable recall@5 vs brute force") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // bucket count must fit the corpus: 2^6 = 64 buckets for 500 vectors
    val ann1 = Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5,
      nBits = 6, nTables = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann3 = Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 5,
      nBits = 6, nTables = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val r1 = (ann1 intersect exact).size.toDouble / exact.size
    val r3 = (ann3 intersect exact).size.toDouble / exact.size
    // floors sit just under the MEASURED values (0.30 / 0.68 — exact: the
    // md5 hyperplanes and the fixture are deterministic), so a real
    // banding/bucketing regression fails the suite instead of sliding
    // under a lax 15% bar
    assert(r1 >= 0.25, s"recall@5 single-table = $r1 (measured 0.30)")
    assert(r3 >= r1, s"multi-table recall ($r3) must not regress single-table ($r1)")
    assert(r3 >= 0.6, s"recall@5 with 3 tables = $r3 (measured 0.68)")
  }

  test("LSH-bucketed cosine near-dup pairs: subset of brute force, usable recall") {
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.4, nBits = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "every LSH pair must be a verified true pair")
    // single-table hyperplane LSH theory: a pair at cosine c collides with
    // P = (1 - acos(c)/pi)^nBits; at the 0.4 threshold that is ~0.25 for
    // nBits=3 (higher for closer pairs) — assert a safety margin below it
    val recall = lsh.size.toDouble / exact.size
    // candidate-subset property (every pair verified true) is asserted
    // above; the floor sits just under the measured 0.242 (deterministic)
    // so banding regressions in embed_cos_neardup_lsh's substrate fail here
    assert(recall >= 0.2, s"recall = $recall (measured 0.242)")
  }

  test("md5-family ANN twins (the oracle-checked query paths): verified subsets + recall") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val md5 = Similarity.lshTopKMd5(emb, q, "vec_id", "embedding", dim = 64,
        k = 5, nBits = 8, nTables = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val r = (md5 intersect exact).size.toDouble / exact.size
    assert(r >= 0.2, s"md5 lshTopK recall@5 = $r")

    val exactP = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val md5P = Similarity.cosineNearDupPairsMd5(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.4, nBits = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(md5P.subsetOf(exactP), "every md5-LSH pair must be a verified true pair")
    val rp = md5P.size.toDouble / exactP.size
    assert(rp >= 0.15, s"md5 near-dup recall = $rp")
    info(s"md5 twins: topk recall=$r, pair recall=$rp")
  }

  test("lshCandidatesMd5 lane slices reproduce per-lane lshTopKMd5 exactly") {
    // the r13 recall-dashboard optimization: one 4-table candidate pass,
    // nested lanes sliced by min_table — must equal the per-lane runs
    val q = emb.filter(col("vec_id") % 50 === 0)
    val cand = Similarity.lshCandidatesMd5(emb, q, "vec_id", "embedding",
      dim = 64, nBits = 8, nTables = 4).cache()
    try {
      for (tb <- Seq(1, 2, 4)) {
        val sliced = Similarity.lshTopKFromCandidates(cand, tables = tb, k = 5)
          .select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
        val direct = Similarity.lshTopKMd5(emb, q, "vec_id", "embedding",
            dim = 64, k = 5, nBits = 8, nTables = tb)
          .select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
        assert(sliced === direct, s"tables=$tb lane mismatch")
      }
    } finally cand.unpersist()
  }

  test("cell-scoped pairs (SemDeDup) equal brute force restricted to co-celled pairs") {
    val cents = emb.orderBy(col("vec_id")).limit(4)
      .select(org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")))
      .as[Seq[Double]].collect().toSeq.zipWithIndex.map { case (v, i) => i -> v }
    val assigned = graft.sim.Ivf.assignCells(emb, "vec_id", "embedding", cents)
    val cellOf = assigned.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val scoped = Similarity.cellScopedPairs(assigned, emb, "vec_id", "embedding",
      "cell", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(scoped == exact.filter { case (a, b) => cellOf(a) == cellOf(b) },
      "cell-scoped must be exactly the co-celled slice of the exact pair set")
    // determinism under repartitioning
    val scoped2 = Similarity.cellScopedPairs(assigned.repartition(7), emb.repartition(5),
      "vec_id", "embedding", "cell", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(scoped2 == scoped)
  }

  test("cosine is exact: parallel vectors → 1.0, orthogonal → 0.0") {
    val d = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)), (3L, Array(0.0f, 5.0f))
    ).toDF("id", "v")
    val out = d.alias("a").join(d.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Similarity.cosine(col("a.v"), col("b.v")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(out((1L, 3L))) < 1e-12)
  }

  test("text functions: tokens, counts, language id on fixtures") {
    val d = Seq(
      (1L, "the cat is on the mat and the dog is in the house"),
      (2L, "el perro y el gato de la casa que los vio"),
      (3L, ""),
      (4L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.langId(col("text")).as("lang")).as[(Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((13, "en")))
    assert(out(2L) == ((11, "es")))
    assert(out(3L) == ((0, "und")))
    assert(out(4L) == ((3, "und")))
  }

  test("multimodal: decode features shape and determinism") {
    val d = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .withColumn("blob", encode(col("text"), "UTF-8"))
    val out = graft.multimodal.Multimodal.decodeFeatures(d, "doc_id", "blob")
      .select("doc_id", "byte_len", "mean_byte").as[(Long, Long, Double)].collect()
      .map { case (id, n, m) => id -> ((n, m)) }.toMap
    assert(out(1L) == ((3L, ('a' + 'b' + 'c') / 3.0)))
    assert(out(2L) == ((0L, 0.0)))
  }
}
