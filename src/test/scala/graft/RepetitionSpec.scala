package graft

import graft.text.{Curation, Repetition}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")

  test("repetition signals match hand-computed values on crafted docs") {
    val rows = Seq(
      (1L, "a a a a"),                   // one word repeated
      (2L, "a b c d"),                   // all distinct
      (3L, "x y x y x y"),               // repeated bigram "x y"
      (4L, "w"),                         // too short for any n-gram
      (5L, "p q r p q r p q r")          // repeated trigram
    ).toDF("doc_id", "text")
    val out = Repetition.signalTable(rows, "text", "doc_id")
      .as[(Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    // doc 1: 4 words, top word 4/4, bigrams all "a a" (3/3), trigrams dup 1 - 1/2
    assert(out(1L) == ((1L, 4L, 1.0, 1.0, 0.5, false)))
    // doc 2: no repetition anywhere
    assert(out(2L)._3 == 0.25)        // top word 1/4
    assert(out(2L)._4 == 1.0 / 3)     // every bigram unique: 1/(n-1)
    assert(out(2L)._5 == 0.0)
    // doc 3: "x" appears 3/6; "x y" appears 3/5
    assert(out(3L)._3 == 0.5 && out(3L)._4 == 3.0 / 5)
    // doc 4: single word — n-gram signals are 0, top word 1/1
    assert(out(4L) == ((4L, 1L, 1.0, 0.0, 0.0, false)))
    // doc 5: 9 words, trigram "p q r" repeats: distinct 3 of 7 → 1 - 3/7
    assert(math.abs(out(5L)._5 - (1.0 - 3.0 / 7)) < 1e-15)
  }

  test("repetition gate splits the synthetic corpus both ways") {
    val kept = Repetition.signalTable(docs, "text", "doc_id")
      .groupBy(col("keep")).count()
      .as[(Boolean, Long)].collect().toMap
    assert(kept.getOrElse(true, 0L) > 0, "gate must keep some docs")
    assert(kept.getOrElse(false, 0L) > 0, "gate must drop some docs")
    assert(kept(true) > kept(false), "most docs should pass")
  }

  test("ngramNovelty: hand-checked trigram df=1 fractions") {
    val docs = Seq(
      (1L, "a b c d"), // trigrams {a b c, b c d}: "b c d" unique → 1/2
      (2L, "a b c"),   // {a b c}: shared with doc 1 → 0/1
      (3L, "x y")      // < 3 words → 0/0, novelty 0.0
    ).toDF("doc_id", "text")
    val out = Repetition.ngramNovelty(docs, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0L, 0.0)))
    assert(out(3L) == ((3L, 0L, 0L, 0.0)))
    // repeated trigram inside ONE doc counts once (distinct per doc):
    // "a b c a b c" yields {a b c, b c a, c a b}; "a b c" has df 2, the
    // other two are unique → 2/3 on the truncating nano ladder
    val dup = Seq((1L, "a b c a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val o2 = Repetition.ngramNovelty(dup, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(o2(1L) == ((1L, 3L, 2L, 0.666666666)) && o2(2L) == ((2L, 1L, 0L, 0.0)))
  }

  test("docFreqStats integer outputs reconcile with a driver-side recompute") {
    val sample = docs.limit(50).cache()
    val stats = Repetition.docFreqStats(sample, "text", "doc_id", rareMaxDf = 50L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val local = sample.select("doc_id", "text").as[(Long, String)].collect()
    val dfMap = local.flatMap { case (id, t) =>
      t.trim.toLowerCase.split("\\s+").distinct.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    local.foreach { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+")
      val (n, sumDf, nRare) = stats(id) match { case (_, a, b, c) => (a, b, c) }
      assert(n == toks.length)
      assert(sumDf == toks.map(dfMap).sum)
      assert(nRare == toks.count(w => dfMap(w) <= 50L))
    }
    sample.unpersist()
  }

  test("mixToBudget fills each source greedily, honors overrides, is partition-stable") {
    val budgets = Map("src0" -> 10000000L, "src1" -> 0L)
    val out = Curation.mixToBudget(docs, "doc_id", "text", "source",
      budgets, defaultBudget = 800L)
    val rows = out.as[(Long, String, Long, Long)].collect()
    val bySrc = rows.groupBy(_._2)

    // src1 dropped entirely; src0 keeps every doc
    assert(!bySrc.contains("src1"))
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySrc("src0").length == src0Total)
    // every capped source stops once the budget line is crossed: the last
    // kept doc STARTS before 800, all earlier cum sums stay under it
    bySrc.view.filterKeys(s => s != "src0").foreach { case (_, docsOf) =>
      val sorted = docsOf.sortBy(_._4)
      sorted.init.foreach { case (_, _, n, cum) => assert(cum - n < 800L) }
      assert(sorted.last._4 - sorted.last._3 < 800L)
      assert(sorted.last._4 >= 800L || docsOf.length == 25,
        "either budget exhausted or source exhausted")
    }
    // deterministic under repartitioning
    val again = Curation.mixToBudget(docs.repartition(13), "doc_id", "text",
      "source", budgets, defaultBudget = 800L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(again == rows.toSet)
  }

  test("mix fill shards the running sum — no whole-source window") {
    // unbounded budget keeps every row, so cum_tok must be the EXACT
    // per-source prefix sum in (u, id) order — validating the exclusive
    // shard-offset arithmetic end to end
    val out = Curation.mixToBudget(docs, "doc_id", "text", "source",
      Map.empty, defaultBudget = Long.MaxValue / 4)
    val plan = out.queryExecution.executedPlan.toString()
    // the window partitions by (source, shard), never source alone: a
    // real corpus is 80%+ one crawl and a whole-source window is one task
    assert(plan.contains("__sh"), plan)
    out.as[(Long, String, Long, Long)].collect().groupBy(_._2)
      .foreach { case (src, docsOf) =>
        var acc = 0L
        docsOf.sortBy(_._4).foreach { case (_, _, n, cum) =>
          acc += n
          assert(cum == acc, s"source $src: gap in prefix sums at cum=$cum")
        }
      }
  }
}
