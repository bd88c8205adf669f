package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT frequent-terms ("heavy hitters") with a Misra–Gries candidate
  * pre-pass — the vocabulary/top-term primitive of a corpus pipeline
  * (stop-list mining, vocab seeding, spam-token detection).
  *
  * Why not a plain `groupBy(term).count()`: on web-scale text the term
  * domain is heavy-tailed and effectively unbounded (typos, urls, ids), so
  * even with map-side partial aggregation the shuffle carries one row per
  * DISTINCT term per map partition — the long tail IS the shuffle. The
  * Misra–Gries summary (capacity k) bounds each partition's contribution to
  * k candidate terms regardless of its vocabulary, with the classic
  * guarantee: a term dropped by every partition summary has global count
  * ≤ N/(k+1) (undercount of an MG summary over n items is ≤ n/(k+1);
  * summing over partitions, Σ n_p = N). So for a threshold of N·f with
  * f > 1/(k+1), candidates ⊇ all qualifying terms — zero false negatives —
  * and one exact recount of ONLY the candidate terms makes the result
  * exact, false positives dropped. The recount's shuffle is bounded by
  * |candidates| ≤ partitions·k rows.
  *
  * This is one of the rare justified `mapPartitions` seams (per-partition
  * imperative state that no Catalyst aggregate expresses); everything
  * around it stays declarative and codegen'd.
  *
  * Reference scope: training-data extension surface (the reference engine
  * has no frequency analytics; its `count` reduce, func.py:46-47, is A11).
  */
object HeavyHitters {

  /** Misra–Gries summary of one iterator: at most `capacity` surviving
    * keys. Decrement-all-on-overflow is amortized O(1) per item (each
    * overflow event consumes `capacity`+1 earlier increments). */
  private[graft] def misraGries(it: Iterator[String], capacity: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < capacity => counts.update(t, 1L)
        case None =>
          // decrement every counter; evict zeros (the "shared" decrement)
          val dead = List.newBuilder[String]
          counts.foreach { case (k, c) =>
            if (c == 1L) dead += k else counts.update(k, c - 1)
          }
          dead.result().foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** Terms whose corpus-wide count is ≥ `num`/`den` of all tokens, with
    * their EXACT counts. Requires den < capacity+1 (the MG recall bound);
    * the threshold compare is integer arithmetic (`cnt·den ≥ N·num`), so
    * the result is bit-stable and oracle-checkable.
    *
    * Plan shape: one narrow pass computes N and the MG candidates (two
    * jobs over the same scan); the recount semi-joins the token stream
    * against the broadcast candidate set BEFORE its only shuffle. */
  def frequentTerms(docs: DataFrame, textCol: String,
                    num: Long, den: Long, capacity: Int = 1024): DataFrame = {
    require(num > 0 && den > 0, "threshold fraction must be positive")
    require(den < capacity + 1L,
      s"MG recall needs capacity+1 > den (got capacity=$capacity, den=$den): " +
        "a term at exactly the threshold could be dropped by every summary")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
    // N without an explode pass: token-array length summed per doc — a
    // narrow single-row agg over the same scan the passes below tokenize
    val total = docs.agg(
      coalesce(sum(size(TextFunctions.tokens(col(textCol)))), lit(0L)))
      .head().getLong(0)
    val candidates: Dataset[String] =
      toks.as[String].mapPartitions(it => misraGries(it, capacity))(
        org.apache.spark.sql.Encoders.STRING)
        .distinct()
    toks.join(broadcast(candidates.toDF("term")), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den >= lit(total) * num)
  }
}
