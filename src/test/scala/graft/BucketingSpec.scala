package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: same-bucketed tables join with no shuffle on
  * either side. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("co-bucketed tables join without an exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      Bucketing.writeBucketed(a, "bspec_a", buckets = 4, keys = Seq("k"))
      Bucketing.writeBucketed(b, "bspec_b", buckets = 4, keys = Seq("k"))

      val joined = Bucketing.cobucketedJoin(spark, "bspec_a", "bspec_b", Seq("k"))
      assert(joined.count() == 1000)

      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // contrast: the same join on unbucketed frames shuffles both sides
      val plain = a.join(b, Seq("k"))
      assert(plain.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bspec_a")
      spark.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }
}
