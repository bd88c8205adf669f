package graft

import graft.sim.Similarity
import graft.text.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sign-bit Hamming search, Matryoshka prefix re-rank, duplicate-passage
  * removal. */
class BinaryMrlScrubSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val emb = sf("embeddings")

  test("signBits packing matches a plain-Scala sign fold") {
    val rows = emb.filter(col("vec_id") < 32)
      .select(col("embedding"),
        Similarity.signBits(col("embedding"), 0, 32).as("h0"),
        Similarity.signBits(col("embedding"), 32, 64).as("h1"))
      .as[(Seq[Float], Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, h0, h1) =>
      def ref(lo: Int, hi: Int) = (lo until hi).foldLeft(0L)((acc, i) =>
        acc + (if (v(i) > 0f) 1L << (i - lo) else 0L))
      assert(h0 == ref(0, 32) && h1 == ref(32, 64))
    }
  }

  test("hammingTopK distance equals the naive sign-mismatch count") {
    val corpus = emb.filter(col("vec_id") < 100)
    val q = emb.filter(col("vec_id") < 3)
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val got = Similarity.hammingTopK(corpus, q, "vec_id", "embedding", dim = 64, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 15)
    got.foreach { case (qid, nid, h) =>
      val d = vecs(qid).zip(vecs(nid)).count { case (a, b) => (a > 0f) != (b > 0f) }
      assert(h == d, s"query $qid neighbor $nid")
    }
  }

  test("mrlTopK with the full prefix and full pool equals bruteForceTopK") {
    val q = emb.filter(col("vec_id") % 100 === 0)
    val m = emb.count().toInt
    val mrl = Similarity.mrlTopK(emb, q, "vec_id", "embedding",
        prefixDim = 64, m = m, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(mrl.nonEmpty && mrl == bf)
  }

  test("mrlTopK re-ranks its candidate pool by exact full-dim cosine") {
    val q = emb.filter(col("vec_id") === 0)
    val out = Similarity.mrlTopK(emb, q, "vec_id", "embedding",
        prefixDim = 16, m = 25, k = 25)
      .select(col("rank"), col("cosine")).as[(Int, Double)].collect().sortBy(_._1)
    assert(out.length == 25)
    // ranks are a strict cosine descent (ties broken by id keep order valid)
    assert(out.sliding(2).forall { case Array((_, a), (_, b)) => a >= b })
  }

  test("scrubDupSpans keeps a shared passage only at its first occurrence") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"), // passages: a..j | k l
      (2L, "a b c d e f g h i j z z"), // shares passage 0 with doc 1
      (3L, "unique words only here")
    ).toDF("doc_id", "text")
    val out = Curation.scrubDupSpans(docs, "text", "doc_id", span = 10)
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_chunks"), col("n_removed"), col("text_scrubbed"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 0L, "a b c d e f g h i j k l"),
      (2L, 2L, 1L, "z z"),
      (3L, 1L, 0L, "unique words only here")))
  }

  test("scrubDupSpans leaves exactly one copy of fully duplicated docs") {
    val docs = Seq((5L, "x y"), (6L, "x y"), (7L, "x y")).toDF("doc_id", "text")
    val out = Curation.scrubDupSpans(docs, "text", "doc_id", span = 10)
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_removed"), col("text_scrubbed"))
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((5L, 0L, "x y"), (6L, 1L, ""), (7L, 1L, "")))
  }
}
