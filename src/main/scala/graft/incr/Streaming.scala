package graft.incr

import graft.core.Pipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A2/A23 — the orchestrator as a Structured Streaming query.
  *
  * The reference's worker loop (worker.py:66-89: drain notifications → map
  * phase → grouped reduce phase → 0.5 s idle sleep, `-f` forever mode) maps
  * onto one streaming query: `readStream` of changes → `foreachBatch` running
  * [[IncrementalRun.applyChanges]] → state tables rewritten per batch.
  * `Trigger.AvailableNow` is the drain-and-exit mode; a processing-time
  * trigger is `-f`. The single-writer lease (A19, listeners.py:56-153) is
  * subsumed by Spark's one-driver-per-checkpoint-dir model.
  *
  * A18 retry: the reference retries a failed notification after 0.25 s and
  * 1.5 s, then drops it (processor.py:261-304). Here a failed batch is
  * retried `maxRetries` times; a batch that keeps failing is appended to a
  * dead-letter log and skipped — same at-most-n-attempts semantics, but per
  * batch (Spark already retries individual tasks via `spark.task.maxFailures`).
  */
final class StreamingEngine(
    pipeline: Pipeline,
    sources: IncrementalRun.Sources,
    @volatile private var state: MrState,
    maxRetries: Int = 2,
    store: Option[ParquetStateStore] = None) {

  @volatile private var deadLetterBatches: List[(Long, Array[Change])] = Nil
  @volatile private var batchClock: Long = 0L

  def currentState: MrState = state
  def deadLetters: List[(Long, Array[Change])] = deadLetterBatches

  /** Run one micro-batch (the `foreachBatch` body). Visible for batch tests. */
  def processBatch(changes: Dataset[Change], batchId: Long): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        batchClock += 1
        // applyChanges already truncates the lineage of every table it
        // rewrote (eager localCheckpoint = this batch's sink write);
        // re-checkpointing the whole state here would copy untouched tables.
        state = IncrementalRun.applyChanges(
          pipeline, sources, state, changes, batchTimestampNs = batchClock)
        store.foreach(_.save(state, batchId)) // durable snapshot + manifest swap
        done = true
      } catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1 // reference backoff 0.25s/1.5s collapses to immediate re-run locally
        case _: Exception =>
          deadLetterBatches ::= (batchId, changes.collect())
          done = true
      }
    }
  }

  /** Start the engine on a change stream. `availableNow=true` = the worker's
    * drain-then-exit mode; false = forever mode with a short poll trigger. */
  def start(changeStream: Dataset[Change], availableNow: Boolean = true): StreamingQuery = {
    val writer = changeStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Change], id: Long) => processBatch(ds, id) }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("500 milliseconds")))
      .start()
  }
}

object StreamingEngine {
  /** Crash/restart recovery: resume from the store's last committed
    * snapshot, or cold-start from a full recompute when none exists. */
  def restore(
      pipeline: Pipeline,
      sources: IncrementalRun.Sources,
      store: ParquetStateStore,
      spark: SparkSession,
      maxRetries: Int = 2): StreamingEngine = {
    val st = store.load(spark).map(_._1)
      .getOrElse(IncrementalRun.recompute(pipeline, sources).checkpointed)
    new StreamingEngine(pipeline, sources, st, maxRetries, Some(store))
  }
}
