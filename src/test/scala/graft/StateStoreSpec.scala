package graft

import graft.core._
import graft.incr._
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A3/A4 durable sink: parquet snapshots + manifest swap, crash/restart
  * recovery, vacuum. */
class StateStoreSpec extends AnyFunSuite with SparkTestBase {
  import MrSchema._
  import spark.implicits._

  private val pipeline = Pipeline(
    maps = Seq(MapSpec("src", "m", 1, idCol = "id",
      fn = MapFns.item("k", Some("v"), idCol = "id"))),
    reduces = Seq(ReduceSpec("m", "r", 1, ExprReduce(sum))))

  private def reduced(st: MrState): Map[String, Double] =
    st("r").select(col(Key), col(Value)).as[(String, Double)].collect().toMap

  test("state survives an engine restart via the store; vacuum drops old batches") {
    val dir = Files.createTempDirectory("mrstate").toString
    val store = new ParquetStateStore(dir)
    var data = Seq(("a", "k1", 1.0), ("b", "k2", 2.0)).toDF("id", "k", "v")
    val sources: IncrementalRun.Sources = _ => data

    val e1 = StreamingEngine.restore(pipeline, sources, store, spark)
    assert(store.committedBatch.isEmpty) // cold start: nothing committed yet
    data = Seq(("a", "k1", 5.0), ("b", "k2", 2.0), ("c", "k2", 3.0)).toDF("id", "k", "v")
    e1.processBatch(Seq(
      Change(1, Change.Updated, "src", "a"), Change(2, Change.Created, "src", "c")).toDS(), 0L)
    e1.processBatch(Seq(Change(3, Change.Deleted, "src", "b")).toDS(), 1L)
    data = Seq(("a", "k1", 5.0), ("c", "k2", 3.0)).toDF("id", "k", "v")
    assert(store.committedBatch.contains(1L))

    // "crash": build a brand-new engine from the store only
    val e2 = StreamingEngine.restore(pipeline, sources, store, spark)
    assert(reduced(e2.currentState) == Map("k1" -> 5.0, "k2" -> 3.0))

    store.vacuum()
    // old batch dirs gone, committed snapshot still loadable
    val reloaded = store.load(spark)
    assert(reloaded.map(_._2).contains(1L))
    assert(reduced(reloaded.get._1) == Map("k1" -> 5.0, "k2" -> 3.0))
  }
}
