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

  /** A map fn that poisons rows with negative v — failure fires at
    * evaluation time, so only batches touching a poison row fail. */
  private val poisonPipeline = Pipeline(
    maps = Seq(MapSpec("src", "m", 1, idCol = "id",
      fn = df => df.select(col("k").as(Key),
        when(col("v") < 0, raise_error(lit("poison record")))
          .otherwise(col("v")).as(Value),
        col("id")))),
    reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))

  test("A18: a poison record dead-letters alone on the 0.25/1.5s schedule; siblings apply") {
    @volatile var now = 0L
    var data = Seq(("a", "k1", 1.0), ("b", "k2", 2.0), ("p", "k3", 5.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    val engine = new StreamingEngine(poisonPipeline, sources,
      IncrementalRun.recompute(poisonPipeline, sources).checkpointed,
      maxRetries = 2, clock = () => now)

    // batch of 3 changes, 1 poison: the 2 good records must apply
    data = Seq(("a", "k1", 10.0), ("b", "k2", 20.0), ("p", "k3", -1.0)).toDF("id", "k", "v")
    engine.processBatch(Seq(
      Change(1, Change.Updated, "src", "a"),
      Change(2, Change.Updated, "src", "b"),
      Change(3, Change.Updated, "src", "p")), batchId = 0)
    assert(reduced(engine.currentState) == Map("k1" -> 10.0, "k2" -> 20.0, "k3" -> 5.0),
      "good siblings apply; the poison record's old output stays")
    assert(engine.pending.map(_.change.resourceId) == Seq("p"))
    assert(engine.deadLetters.isEmpty)

    // before the 0.25s gate the failure is not retried
    now = 100
    engine.processBatch(Seq.empty, batchId = 1)
    assert(engine.pending.head.retries == 0)

    // first retry at >=0.25s fails -> one retry used
    now = 300
    engine.processBatch(Seq.empty, batchId = 2)
    assert(engine.pending.head.retries == 1 && engine.deadLetters.isEmpty)

    // second gate is 1.5s from the FIRST failure, not from the last retry
    now = 1000
    engine.processBatch(Seq.empty, batchId = 3)
    assert(engine.pending.head.retries == 1)

    // the queryable notification queue reflects the live ledger: one
    // pending row whose gate is first-failure + backoff(1) = 0 + 1500
    val nq = engine.notifications(spark).collect()
    assert(nq.length == 1)
    assert(nq.head.getString(0) == "pending" && nq.head.getString(4) == "p")
    assert(nq.head.getInt(5) == 1 && nq.head.getLong(7) == 1500L)

    // second retry fails -> dropped to the dead-letter log
    now = 1600
    engine.processBatch(Seq.empty, batchId = 4)
    assert(engine.pending.isEmpty)
    assert(engine.deadLetters.map(_.resourceId) == List("p"))
    assert(reduced(engine.currentState) == Map("k1" -> 10.0, "k2" -> 20.0, "k3" -> 5.0))
  }

  test("A18: a newer succeeded change supersedes an older pending failure") {
    @volatile var now = 0L
    // the poison map fn fails while v < 0; id p starts poisoned
    var data = Seq(("p", "k1", -1.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    val engine = new StreamingEngine(poisonPipeline, sources,
      IncrementalRun.recompute(poisonPipeline, _ =>
        Seq(("p", "k1", 1.0)).toDF("id", "k", "v")).checkpointed,
      maxRetries = 2, clock = () => now)

    // seq=1 fails -> pending
    engine.processBatch(Seq(Change(1, Change.Updated, "src", "p")), batchId = 0)
    assert(engine.pending.size == 1)

    // the source heals and a NEWER change (seq=2) for the same id succeeds
    // BEFORE seq=1's retry gate opens: the stale pending entry must die
    // with it — replaying seq=1 later may not undo newer state
    data = Seq(("p", "k1", 42.0)).toDF("id", "k", "v")
    now = 100 // seq=1 not yet due
    engine.processBatch(Seq(Change(2, Change.Updated, "src", "p")), batchId = 1)
    assert(engine.pending.isEmpty && engine.deadLetters.isEmpty)
    assert(reduced(engine.currentState) == Map("k1" -> 42.0))

    // nothing left to replay at the next drains
    now = 2000
    engine.drainDue()
    assert(engine.pending.isEmpty && engine.deadLetters.isEmpty)
    assert(reduced(engine.currentState) == Map("k1" -> 42.0))
  }

  test("A18: a record that heals before its retry clears its failure entry") {
    @volatile var now = 0L
    var data = Seq(("p", "k1", -1.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data
    val engine = new StreamingEngine(poisonPipeline, sources,
      IncrementalRun.recompute(poisonPipeline, _ =>
        Seq(("p", "k1", 1.0)).toDF("id", "k", "v")).checkpointed,
      maxRetries = 2, clock = () => now)

    engine.processBatch(Seq(Change(1, Change.Updated, "src", "p")), batchId = 0)
    assert(engine.pending.size == 1)

    // the source row heals; the due retry applies and clears the entry
    data = Seq(("p", "k1", 7.0)).toDF("id", "k", "v")
    now = 300
    engine.processBatch(Seq.empty, batchId = 1)
    assert(engine.pending.isEmpty && engine.deadLetters.isEmpty)
    assert(reduced(engine.currentState) == Map("k1" -> 7.0))
  }
}
