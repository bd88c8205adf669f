package graft

import graft.text.{HeavyHitters, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = sf("documents")

  /** Exact reference: plain full groupBy count + threshold. */
  private def exact(num: Long, den: Long): Map[String, Long] =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
      .pipe { m =>
        val n = m.values.sum
        m.filter { case (_, c) => c * den >= n * num }
      }

  private implicit class Piped[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  test("frequentTerms is EXACT: equals the full groupBy-count result") {
    val got = HeavyHitters.frequentTerms(docs, "text", num = 1, den = 100)
      .as[(String, Long)].collect().toMap
    assert(got == exact(1, 100))
    assert(got.nonEmpty)
  }

  test("result is partition-invariant") {
    val a = HeavyHitters.frequentTerms(docs.repartition(13), "text", 1, 100)
      .as[(String, Long)].collect().toMap
    val b = HeavyHitters.frequentTerms(docs.coalesce(1), "text", 1, 100)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("tight capacity near the recall bound still yields the exact answer") {
    // den=100 with the smallest legal capacity: the MG guarantee is what
    // keeps this exact — candidates may be few, but never miss a qualifier
    val got = HeavyHitters.frequentTerms(docs, "text", 1, 100, capacity = 100)
      .as[(String, Long)].collect().toMap
    assert(got == exact(1, 100))
  }

  test("capacity at or below den is refused (recall would be unsound)") {
    assertThrows[IllegalArgumentException](
      HeavyHitters.frequentTerms(docs, "text", 1, 100, capacity = 99))
  }

  test("Misra–Gries summary: never misses a term above n/(k+1), never exceeds k keys") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val n = 500 + rng.nextInt(1500)
      val zipfish = Seq.fill(n) {
        val r = rng.nextInt(100)
        if (r < 40) "hot" + rng.nextInt(3)
        else if (r < 70) "warm" + rng.nextInt(10)
        else "cold" + rng.nextInt(500)
      }
      val k = 1 + rng.nextInt(30)
      val kept = HeavyHitters.misraGries(zipfish.iterator, k).toSet
      assert(kept.size <= k)
      val counts = zipfish.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val mustKeep = counts.filter(_._2 > n.toDouble / (k + 1)).keySet
      assert(mustKeep.subsetOf(kept),
        s"MG(k=$k) missed ${mustKeep -- kept} over n=$n")
    }
  }
}
