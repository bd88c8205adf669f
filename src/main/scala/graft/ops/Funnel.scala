package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion funnel over an event log: users advance a stage
  * when their FIRST occurrence of the next event type falls within
  * `withinUs` of the timestamp that advanced them to the current stage
  * (first-touch attribution — the standard product-analytics funnel).
  *
  * Shape at scale: each stage is one keyed min-aggregate joined to the
  * previous stage's (user, ts) frame — map-side-combined, user-keyed
  * shuffles only, no windows, no sessionization state. The per-stage
  * frames are pinned ([[Caches]]) because each feeds both the next stage's
  * join and its own count. All arithmetic is integer timestamps, so stage
  * counts are exact under any partitioning. */
object Funnel {

  /** @return one row per step: (step, event_type, n_users). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], withinUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = Caches.track(events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t")))
    val stages = scala.collection.mutable.ArrayBuffer((steps.head, cur))
    for (step <- steps.tail) {
      val nxt = Caches.track(events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(cur, Seq("__u"))
        .filter(col("__ts") >= col("__t") && col("__ts") - col("__t") <= withinUs)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t")))
      stages += ((step, nxt))
      cur = nxt
    }
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(name).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
  }
}
