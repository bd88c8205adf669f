package graft

import graft.text.{Pack, Unigram}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-length token-sequence packing: conservation, order, shard
  * boundaries inside one partition, and agreement with a plain-Scala
  * reference packer. */
class PackSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def refPack(docs: Seq[(Long, Seq[Int])], seqLen: Int, nShards: Int,
                      eos: Int): Map[(Int, Long), Seq[Int]] = {
    val out = scala.collection.mutable.Map.empty[(Int, Long), Seq[Int]]
    for (shard <- 0 until nShards) {
      val stream = docs.filter(_._1 % nShards == shard).sortBy(_._1)
        .flatMap { case (_, ids) => ids :+ eos }
      stream.grouped(seqLen).zipWithIndex.foreach { case (seq, i) =>
        out((shard, i.toLong)) = seq
      }
    }
    out.toMap
  }

  private def docs(n: Int): Seq[(Long, Seq[Int])] =
    (0 until n).map { i =>
      val len = 3 + (ZipfCorpus.mix(i.toLong * 7 + 1) >>> 60).toInt // 3-18
      (i.toLong, (0 until len).map(j =>
        1 + ((ZipfCorpus.mix(i.toLong * 131 + j) >>> 48) % 500).toInt))
    }

  test("packTokenIds equals the reference packer exactly (8 shards, 32-token seqs)") {
    val d = docs(60)
    val got = Pack.packTokenIds(d.toDF("doc_id", "ids"), "doc_id", "ids",
        seqLen = 32, nShards = 8, eosId = 0)
      .as[(Int, Long, Int, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val want = refPack(d, 32, 8, 0)
    assert(got == want)
    // conservation: every id + one EOS per doc survives, nothing more
    assert(got.values.map(_.size).sum == d.map(_._2.size + 1).sum)
    // at most one partial sequence per shard, and n_ids is honest
    val partials = got.filter(_._2.size < 32)
    assert(partials.keys.map(_._1).toSeq.distinct.size == partials.size)
  }

  test("shard boundaries inside ONE partition restart the packer state") {
    // nShards > partitions forces several shards through the same task:
    // the packer must reset (seq_idx, buffer) at each boundary
    val d = docs(40)
    val got = Pack.packTokenIds(
        d.toDF("doc_id", "ids").repartition(2), "doc_id", "ids",
        seqLen = 16, nShards = 5, eosId = 0)
      .as[(Int, Long, Int, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got == refPack(d, 16, 5, 0))
    // every shard's sequence ids are dense from 0
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val idxs = ks.map(_._2).toSeq.sorted
      assert(idxs == (0L until idxs.size.toLong))
    }
  }

  test("greedyIds: word walk matches encodeWordGreedy counts and doc order") {
    val corpus = Seq((10L, "aa b aab"), (11L, "b aa"), (12L, "aab aab b"))
      .toDF("doc_id", "text")
    val vocab = Seq(Unigram.Piece(1, "aa", 9L), Unigram.Piece(2, "b", 5L),
      Unigram.Piece(3, "a", 4L), Unigram.Piece(4, "aab", 3L))
    val got = Unigram.greedyIds(corpus, "text", "doc_id", vocab)
      .as[(Long, Seq[Int])].collect().toMap
    // greedy longest-match: "aa"->[1], "b"->[2], "aab"->[4] (3-match wins)
    assert(got == Map(10L -> Seq(1, 2, 4), 11L -> Seq(2, 1),
      12L -> Seq(4, 4, 2)))
    // id count per word agrees with the count-only walk
    val ranks = vocab.map(p => p.piece -> p.rank).toMap
    for (w <- Seq("aa", "b", "aab", "aabaab"))
      assert(Unigram.encodeWordGreedyIds(w, ranks).size ==
        Unigram.encodeWordGreedy(w, ranks.keySet))
  }
}
