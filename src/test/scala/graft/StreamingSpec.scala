package graft

import graft.core._
import graft.incr._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A2/A18/A23 — orchestrator as Structured Streaming (worker.py:66-89) with
  * MemoryStream change feeds, drain-and-exit trigger, retry/dead-letter. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import MrSchema._
  import spark.implicits._

  private val pipeline = Pipeline(
    maps = Seq(MapSpec("src", "m", 1, idCol = "id",
      fn = MapFns.item("k", Some("v"), idCol = "id"))),
    reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))

  private def reduced(st: MrState): Map[String, Double] =
    st("r").select(col(Key), col(Value)).as[(String, Double)].collect().toMap

  test("A2/A23: MemoryStream of changes drains through foreachBatch (AvailableNow)") {
    var data: DataFrame = Seq(("a", "k1", 1.0), ("b", "k2", 2.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    val engine = new StreamingEngine(pipeline, sources,
      IncrementalRun.recompute(pipeline, sources).checkpointed)

    val mem = MemoryStream[Change](spark)
    data = Seq(("a", "k1", 4.0), ("b", "k2", 2.0), ("c", "k2", 10.0)).toDF("id", "k", "v")
    mem.addData(Change(1, Change.Updated, "src", "a"), Change(2, Change.Created, "src", "c"))
    val q = engine.start(mem.toDS(), availableNow = true)
    q.awaitTermination(60000)
    assert(reduced(engine.currentState) == Map("k1" -> 4.0, "k2" -> 12.0))

    // a second drain picks up later notifications incl. deletes
    data = Seq(("a", "k1", 4.0), ("c", "k2", 10.0)).toDF("id", "k", "v")
    mem.addData(Change(3, Change.Deleted, "src", "b"))
    val q2 = engine.start(mem.toDS(), availableNow = true)
    q2.awaitTermination(60000)
    assert(reduced(engine.currentState) == Map("k1" -> 4.0, "k2" -> 10.0))
  }

  test("A18: failing batch retries then dead-letters; engine keeps running") {
    var failures = 0
    val data = Seq(("a", "k1", 1.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = { name =>
      if (name == "src" && failures > 0) { failures -= 1; sys.error("transient store error") }
      data
    }
    val engine = new StreamingEngine(pipeline, _ => data,
      IncrementalRun.recompute(pipeline, _ => data).checkpointed, maxRetries = 2)

    // transient failure: 2 failures < maxRetries+1 attempts → succeeds
    failures = 2
    val e2 = new StreamingEngine(pipeline, sources,
      IncrementalRun.recompute(pipeline, _ => data).checkpointed, maxRetries = 2)
    e2.processBatch(Seq(Change(1, Change.Updated, "src", "a")).toDS(), batchId = 0)
    assert(e2.deadLetters.isEmpty)

    // persistent failure: exhausts retries → dead-letter, no throw
    failures = 1000
    e2.processBatch(Seq(Change(2, Change.Updated, "src", "a")).toDS(), batchId = 1)
    assert(e2.deadLetters.map(_._1) == List(1L))
    assert(engine.deadLetters.isEmpty)
  }
}
