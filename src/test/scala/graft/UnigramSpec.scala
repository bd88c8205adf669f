package graft

import graft.text.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("encodeWord: Viterbi minimum equals brute-force enumeration") {
    // tiny inventory; ranks deliberately NOT length-ordered
    val vocab = Map(
      "a" -> (Unigram.CostBase + 3), "b" -> (Unigram.CostBase + 4),
      "ab" -> (Unigram.CostBase + 1), "ba" -> (Unigram.CostBase + 2),
      "aba" -> (Unigram.CostBase + 5))
    def brute(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { l =>
        vocab.get(w.take(l)).map(_ + brute(w.drop(l)))
      }.min
    for (w <- Seq("", "a", "ab", "aba", "abab", "baab", "aaaa", "ababab"))
      assert(Unigram.encodeWord(w, vocab) == brute(w), s"word $w")
    // piece count dominates: "aba" decodes as 1 piece (rank 5), never
    // the cheaper-rank 2-piece split ab+a (ranks 1+3)
    assert(Unigram.encodeWord("aba", vocab) == Unigram.CostBase + 5)
    // among equal-length segmentations the cheaper ranks win:
    // abab = ab+ab (1+1) beats a+bab? (no bab) and aba+b (5+4)
    assert(Unigram.encodeWord("abab", vocab) == 2 * Unigram.CostBase + 2)
    // unsegmentable throws (no 'c')
    intercept[IllegalArgumentException](Unigram.encodeWord("ac", vocab))
  }

  test("learn: single-char coverage, (cnt DESC, piece) ranking, determinism") {
    val docs = Seq(
      (1L, "aa aa ab"), (2L, "aa ab ba"), (3L, "zzzz")).toDF("doc_id", "text")
    val vocab = Unigram.learn(docs, "text", vocabMulti = 64)
    val byPiece = vocab.map(p => p.piece -> p).toMap
    // every character of the corpus is present as a single
    for (c <- Seq("a", "b", "z")) assert(byPiece.contains(c))
    // counts are word-occurrence weighted: "aa" word occurs 3×, each
    // occurrence contributes substrings a,a,aa → piece "aa" cnt ≥ 3
    assert(byPiece("aa").cnt >= 3)
    // ranks are dense, 1-based, ordered by (cnt DESC, piece ASC)
    val sorted = vocab.sortBy(_.rank)
    assert(sorted.map(_.rank) == (1 to vocab.size))
    assert(sorted.sliding(2).forall { case Seq(x, y) =>
      x.cnt > y.cnt || (x.cnt == y.cnt && x.piece < y.piece)
    })
    // deterministic under repartitioning
    val again = Unigram.learn(docs.repartition(7), "text", vocabMulti = 64)
    assert(again == vocab)
  }

  test("encodedLength: hand-checked costs on a tiny corpus") {
    val docs = Seq((1L, "aa aa b"), (2L, "ab")).toDF("doc_id", "text")
    val vocab = Unigram.learn(docs, "text", vocabMulti = 64)
    val cost = vocab.map(p => p.piece -> (Unigram.CostBase + p.rank)).toMap
    val out = Unigram.encodedLength(docs, "text", "doc_id", vocab)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1: aa(1 piece) + aa + b(1 piece); doc 2: ab(1 piece)
    val cAA = cost("aa") % Unigram.CostBase
    val cB = cost("b") % Unigram.CostBase
    val cAB = cost("ab") % Unigram.CostBase
    assert(out(1L) == (3L, 2 * cAA + cB))
    assert(out(2L) == (1L, cAB))
    // stable under repartitioning
    val re = Unigram.encodedLength(docs.repartition(5), "text", "doc_id", vocab)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(re == out)
  }

  test("property: Viterbi equals brute force on random vocab/word draws") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = Seq("a", "b", "c")
    val genWord = Gen.chooseNum(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    // random multi-piece inventory over the alphabet; singles always in
    val genMultis = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(2, 4).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf(alpha)).map(_.mkString))))
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    val cases = samples(Gen.zip(genMultis, Gen.listOfN(8, genWord)), 60)
    for (((multis, words), i) <- cases.zipWithIndex) {
      val pieces = (alpha ++ multis).distinct
      // arbitrary deterministic ranks: order by (length desc, piece)
      val cost = pieces.sorted.zipWithIndex
        .map { case (p, r) => p -> (Unigram.CostBase + r + 1) }.toMap
      def brute(w: String): Long =
        if (w.isEmpty) 0L
        else (1 to math.min(Unigram.MaxPieceLen, w.length)).flatMap { l =>
          cost.get(w.take(l)).map(_ + brute(w.drop(l)))
        }.min
      for (w <- words)
        assert(Unigram.encodeWord(w, cost) == brute(w), s"case $i word '$w'")
    }
  }

  test("greedy longest-match: hand checks, never fewer pieces than Viterbi") {
    // greedy suboptimality witness: with {a, b, aa, bbb, aab}, the word
    // "aabbb" greedy-segments aab|b|b (3 pieces — the longest first match
    // strands the tail) while Viterbi finds aa|bbb (2)
    val vocab = Map(
      "a" -> (Unigram.CostBase + 1), "b" -> (Unigram.CostBase + 2),
      "aa" -> (Unigram.CostBase + 3), "bbb" -> (Unigram.CostBase + 4),
      "aab" -> (Unigram.CostBase + 5))
    val pieces = vocab.keySet
    assert(Unigram.encodeWordGreedy("aabbb", pieces) == 3L)
    assert(Unigram.encodeWord("aabbb", vocab) / Unigram.CostBase == 2L)
    assert(Unigram.encodeWordGreedy("", pieces) == 0L)
    assert(Unigram.encodeWordGreedy("aa", pieces) == 1L)
    intercept[IllegalArgumentException](Unigram.encodeWordGreedy("ax", pieces))

    // on the real corpus: greedy token count >= Viterbi, per document
    val docs = sf("documents")
    val v = Unigram.learn(docs, "text", vocabMulti = 64)
    val opt = Unigram.encodedLength(docs, "text", "doc_id", v)
      .select(col("doc_id"), col("n_tokens").as("n_opt"))
    val greedy = Unigram.encodedLengthGreedy(docs, "text", "doc_id", v)
    val worse = greedy.join(opt, "doc_id")
      .filter(col("n_tokens") < col("n_opt")).count()
    assert(worse == 0, "greedy can never use fewer pieces than Viterbi")
  }

  test("property: training is invariant to ANY signed-delta decomposition") {
    // the maintained ≡ rebuilt claim, not just for one fixed split: word
    // counts are an abelian group, so ANY batch decomposition — including
    // phantom docs added then retracted — must fold to the same state and
    // therefore the same trained inventory (BPE shares this backbone)
    import graft.text.Bpe
    val docs = sf("documents").limit(120).cache()
    try {
      val direct = Unigram.learn(docs, "text", vocabMulti = 32)
      for (seed <- 1 to 4) {
        val part = (col("doc_id") * 2654435761L + seed) % 3
        val batches = (0 to 2).map(i =>
          Bpe.wordCounts(docs.filter(pmod(part, lit(3)) === i), "text"))
        val phantom = docs.limit(17)
          .withColumn("text", concat(col("text"), lit(s" zz$seed")))
        val folded = Bpe.mergeCounts(
          batches :+ Bpe.wordCounts(phantom, "text")
                  :+ Bpe.wordCounts(phantom, "text", sign = -1): _*)
        assert(Unigram.learnFromCounts(folded, vocabMulti = 32) == direct,
          s"seed $seed")
      }
    } finally docs.unpersist(blocking = false)
  }

  test("corpus run: tokens never exceed chars, vocab bounded") {
    val docs = sf("documents")
    val vocab = Unigram.learn(docs, "text", vocabMulti = 64)
    assert(vocab.size <= 64 + vocab.count(_.piece.length == 1))
    val out = Unigram.encodedLength(docs, "text", "doc_id", vocab)
    val bad = out.join(docs, "doc_id")
      .filter(col("n_tokens") > col("n_chars")).count()
    assert(bad == 0, "a word never takes more pieces than characters")
    assert(out.count() == docs.count())
  }
}
