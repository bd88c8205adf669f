package graft

import graft.text.{Bpe, LmCounts}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Plain-Scala BPE reference: greedy left-to-right merge application
    * over symbol vectors, weighted pair counting over a word-frequency
    * map — the classic algorithm, no string-serialization tricks. */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var tbl: Map[Vector[String], Long] =
      words.toSeq.map { case (w, c) =>
        w.map(_.toString).toVector -> c
      }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        tbl = tbl.toSeq.map { case (syms, c) => refApply(syms, l, r) -> c }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("greedy runs: 'a a a a' merges to [aa, aa], 'a a a' to [aa, a]") {
    val docs = Seq("aaaa aaa").toDF("text")
    val m = Bpe.learn(docs, "text", nMerges = 1)
    assert(m.map(x => (x.lhs, x.rhs, x.cnt)) == Seq(("a", "a", 5L)))
    // after merging (a,a): aaaa -> [aa][aa], aaa -> [aa][a]; next round's
    // top pair is (aa, aa) count 1 vs (aa, a) count 1 -> tie, lexicographic
    val m2 = Bpe.learn(docs, "text", nMerges = 2)
    assert(m2(1).lhs == "aa" && Set("a", "aa").contains(m2(1).rhs))
    assert(m2.map(x => (x.lhs, x.rhs, x.cnt)) ==
      refLearn(Map("aaaa" -> 1L, "aaa" -> 1L), 2).zipWithIndex.map(_._1))
  }

  test("learned merges match the plain-Scala reference on real documents") {
    val docs = sf("documents")
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val want = refLearn(words, 8)
    val got = Bpe.learn(docs, "text", nMerges = 8)
      .map(m => (m.lhs, m.rhs, m.cnt))
    assert(got == want)
  }

  test("encodedLength matches a per-doc reference replay") {
    val docs = sf("documents").limit(50).cache()
    val merges = Bpe.learn(sf("documents"), "text", nMerges = 8)
    val got = Bpe.encodedLength(docs, "text", "doc_id", merges)
      .as[(Long, Long)].collect().toMap
    val raw = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    raw.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val n = toks.map { w =>
        var syms = w.map(_.toString).toVector
        merges.foreach(m => syms = refApply(syms, m.lhs, m.rhs))
        // empty word serializes to one empty symbol, matching split("")
        math.max(syms.length, 1)
      }.sum
      assert(got(id) == n.toLong, s"doc=$id")
    }
  }

  test("merges strictly reduce (or keep) total encoded length") {
    val docs = sf("documents")
    val m8 = Bpe.learn(docs, "text", nMerges = 8)
    val len0 = Bpe.encodedLength(docs, "text", "doc_id", Nil)
      .agg(sum("n_bpe")).head().getLong(0)
    val len8 = Bpe.encodedLength(docs, "text", "doc_id", m8)
      .agg(sum("n_bpe")).head().getLong(0)
    // each merge with pair count c removes exactly c symbols corpus-wide
    assert(len0 - len8 == m8.map(_.cnt).sum)
  }

  test("maintained word counts train the same merges as a fresh rebuild") {
    val docs = sf("documents")
    val phantoms = docs.filter(col("doc_id") % 5 === 2)
      .withColumn("text", concat(col("text"), lit(" qqphantom qqphantom")))
    // state missing half the corpus and polluted with phantoms...
    val state = Bpe.mergeCounts(
      Bpe.wordCounts(docs.filter(col("doc_id") % 2 === 0), "text"),
      Bpe.wordCounts(phantoms, "text"))
    // ...converged by one delta batch (add the other half, retract phantoms)
    val merged = Bpe.mergeCounts(
      state,
      Bpe.wordCounts(docs.filter(col("doc_id") % 2 === 1), "text"),
      Bpe.wordCounts(phantoms, "text", sign = -1))
    assert(Bpe.learnFromCounts(merged, 6) == Bpe.learn(docs, "text", 6))
    // and the retraction really removed the phantom word entirely
    assert(merged.filter(col("__w") === "qqphantom").count() == 0)
  }

  test("trigram KN: positive, context mass bounded, backoff join total") {
    val tri = LmCounts.knTrigrams(sf("documents"), "text", k = 500)
      .as[(String, String, String, Long, Double)].collect()
    assert(tri.nonEmpty)
    assert(tri.forall(_._5 > 0))
    tri.groupBy(t => (t._1, t._2)).foreach { case (ctx, rows) =>
      val s = rows.map(_._5).sum
      assert(s <= 1.0 + rows.length * 5e-7 + 1e-9, s"context $ctx sums to $s")
    }
    // top-k is deterministic: strictly ordered by (cnt desc, words)
    val keys = tri.map(t => (-t._4, t._1, t._2, t._3)).toSeq
    assert(keys == keys.sorted)
  }

  test("bigram counts: signed-delta maintenance equals a fresh build") {
    val docs = sf("documents")
    val phantoms = docs.filter(col("doc_id") % 6 === 3)
      .withColumn("text", concat(col("text"), lit(" zz qq zz")))
    val direct = LmCounts.bigramCounts(docs, "text")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val merged = LmCounts.mergeBigramCounts(
        LmCounts.mergeBigramCounts(
          LmCounts.bigramCounts(docs.filter(col("doc_id") % 2 === 0), "text"),
          LmCounts.bigramCounts(phantoms, "text")),
        LmCounts.bigramCounts(docs.filter(col("doc_id") % 2 === 1), "text"),
        LmCounts.bigramCounts(phantoms, "text", sign = -1))
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(merged == direct)
    assert(!merged.contains(("zz", "qq")))
  }

  test("persisted nano model serves the same tables as direct estimation") {
    val docs = sf("documents")
    val dir = java.nio.file.Files.createTempDirectory("kn_model_spec").toString
    LmCounts.bigramNano(docs, "text").write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val viaModel = LmCounts.publishBigrams(stored, k = 50)
      .as[(String, String, Long, Double)].collect().toSeq
    val direct = LmCounts.knBigrams(docs, "text", k = 50)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(viaModel == direct)
    // trigram level built FROM the stored bigram table == built fresh
    val triStored = LmCounts.publishTrigrams(
        LmCounts.trigramNanoFrom(docs, "text", stored), k = 50)
      .as[(String, String, String, Long, Double)].collect().toSeq
    val triDirect = LmCounts.knTrigrams(docs, "text", k = 50)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(triStored == triDirect)
  }

  test("knScore: total trigram coverage, strictly positive NLL") {
    val docs = sf("documents")
    val got = LmCounts.knScore(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // every p_kn < 1 (the interpolation is a strict convex-deficient mix),
    // so -avg(ln p) > 0
    assert(got.forall(_._3 > 0))
    // the model join is total: per doc, n_tri == max(len - 2, 0), and
    // docs under 3 tokens are absent
    val want = docs.select(col("doc_id"),
        greatest(size(split(lower(trim(col("text"))), "\\s+")) - 2, lit(0)))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (id, n, _) => assert(n == want(id).toLong, s"doc=$id") }
    assert(got.length == want.count(_._2 > 0))
  }

  test("KN bigram probabilities are positive and a context's mass stays below 1") {
    val kn = LmCounts.knBigrams(sf("documents"), "text", k = 1000)
      .as[(String, String, Long, Double)].collect()
    assert(kn.nonEmpty)
    assert(kn.forall(_._4 > 0))
    // per left context, the sum over OBSERVED w2 must stay <= 1 (the
    // remaining mass backs off to unseen continuations); each p_kn is
    // rounded to 6 decimals, so allow up to half-ulp (5e-7) per row
    kn.groupBy(_._1).foreach { case (w1, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1.0 + rows.length * 5e-7 + 1e-9, s"context $w1 sums to $s")
    }
  }
}
