package graft

import graft.core._
import graft.incr._
import graft.ops.MapOp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A16/A17/A20 — resync + handler-version registry
  * (reference resync.py:15-128, tests/scripts/test_worker.py:87-258). */
class ResyncSpec extends AnyFunSuite with SparkTestBase {
  import MrSchema._
  import spark.implicits._

  private def specV(v: Int, value: String = "v") =
    MapSpec("src", "m", v, idCol = "id", fn = MapFns.item("k", Some(value), idCol = "id"))

  test("A16: skip-if-same-version keeps current rows, re-maps stale ones") {
    val data = Seq(("a", "k1", 1.0), ("b", "k2", 2.0), ("c", "k3", 3.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    // old table: a+b at v2 already, c at v1 with a WRONG value (stale fn)
    val v2 = specV(2)
    val old = MapOp(v2, data.filter(col("id") =!= "c"))
      .unionByName(MapOp(specV(1), data.filter(col("id") === "c"))
        .withColumn(Value, lit(-99.0)))
    val out = Resync.resyncMap(v2, sources, old)
    val vals = out.select(col(SourceId), col(Value), col(Version))
      .as[(String, Double, Int)].collect().toSet
    assert(vals == Set(("a", 1.0, 2), ("b", 2.0, 2), ("c", 3.0, 2)))
  }

  test("A20 registry: changed handlers detected per (source,target); bump clears") {
    val p = Pipeline(
      maps = Seq(specV(3)),
      reduces = Seq(ReduceSpec("m", "r", 2, ExprReduce(sum))))
    val (m0, r0) = HandlerRegistry.empty.changed(p)
    assert(m0 == Seq("m") && r0 == Seq("r"))
    val reg = HandlerRegistry.empty.bumped(p)
    val (m1, r1) = reg.changed(p)
    assert(m1.isEmpty && r1.isEmpty)
    // bumping the map handler version marks it changed again
    val p2 = Pipeline(
      maps = Seq(specV(4)),
      reduces = Seq(ReduceSpec("m", "r", 2, ExprReduce(sum))))
    val (m2, r2) = reg.changed(p2)
    assert(m2 == Seq("m") && r2.isEmpty)
  }

  test("A16+A17: resyncChanged brings a stale state to the recompute fixpoint") {
    val data = Seq(("a", "k1", 1.0), ("b", "k1", 2.0), ("c", "k2", 3.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    val pOld = Pipeline(
      maps = Seq(specV(1)),
      reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))
    val reg = HandlerRegistry.empty.bumped(pOld)
    val stOld = IncrementalRun.recompute(pOld, sources)
    // new config: map handler emits v*10 (version bump → full resync)
    val pNew = Pipeline(
      maps = Seq(MapSpec("src", "m", 2, idCol = "id",
        fn = df => df.select(col("k").as(Key), (col("v") * 10).as(Value), col("id")))),
      reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))
    val (st1, reg1) = Resync.resyncChanged(pNew, sources, stOld, reg, timestampNs = 5L)
    val got = st1("r").select(col(Key), col(Value)).as[(String, Double)].collect().toMap
    assert(got == Map("k1" -> 30.0, "k2" -> 30.0))
    assert(reg1.changed(pNew)._1.isEmpty)
  }
}
