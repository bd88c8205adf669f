package graft

import graft.functions.GraftExtensions
import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.functions.GraftExtensions` deployment
  * path: a session BUILT with the extensions has every graft_* kernel,
  * the kernel-substitution rule, and the as-of strategy — with no runtime
  * `register()` call anywhere. (The runtime twin is exercised throughout
  * the rest of the suite.) */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private def withExtSession[A](body: SparkSession => A): A = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // reuses the running SparkContext; a FRESH session state built with
    // the injected extensions (getOrCreate would otherwise return the
    // shared suite session and silently skip the extensions)
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try body(s2)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("kernels callable from SQL with zero runtime registration") {
    withExtSession { s2 =>
      val row = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  graft_jaccard(array('a','b'), array('b','c')) AS j,
                  graft_nfc('plain') AS n""").head()
      assert(row.getDouble(0) == 11.0)
      assert(math.abs(row.getDouble(1) - 1.0 / 3) < 1e-12)
      assert(row.getString(2) == "plain")
    }
  }

  test("the injected optimizer rule rewrites the HOF dot fold") {
    withExtSession { s2 =>
      val df = s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(8)
        .select(Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      // values equal the explicit-kernel spelling computed on the shared
      // (runtime-registered) session
      graft.functions.GraftFunctions.register(spark)
      val viaKernel = sf("embeddings").limit(8)
        .select(call_function("graft_dot", col("embedding"), col("embedding")))
        .collect().map(_.getDouble(0)).sorted.toSeq
      assert(df.collect().map(_.getDouble(0)).sorted.toSeq == viaKernel)
    }
  }

  test("the injected planner strategy plans the as-of node") {
    withExtSession { s2 =>
      import s2.implicits._
      val left = Seq((1L, 1L, 10L)).toDF("lid", "k", "lts")
      val right = Seq((1L, 5L, 1.0)).toDF("k", "rts", "pay")
      val out = graft.plans.AsOfJoinNative.asOf(
        left, right, "k", "lts", "rts", Seq("pay"))
      assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin "))
      assert(out.count() == 1)
    }
  }
}
