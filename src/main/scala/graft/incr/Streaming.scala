package graft.incr

import graft.core.Pipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A failed notification awaiting retry — the reference's FailedNotification
  * (processor.py:37-44): `retries` counts retry attempts used so far and
  * `firstFailedAtMs` anchors the backoff gates (the reference keeps the
  * original processed_at across retries, processor.py:273-280). */
final case class FailedChange(change: Change, retries: Int, firstFailedAtMs: Long)

/** Shared listener wiring for the streaming engines: maps Spark's
  * idle/progress/termination events onto a retry drain WITHOUT blocking the
  * shared listener bus — callbacks only flag-and-dispatch to a dedicated
  * daemon thread, so a long micro-batch holding the engine's batch lock can
  * never stall progress/idle delivery for every other query on the session. */
private[incr] final class DrainDispatch(drain: () => Unit) {
  private val queued = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val exec = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-retry-drain"); t.setDaemon(true); t
  })

  /** Coalescing request: at most one drain queued behind the running one.
    * After [[shutdown]] (query terminated) a late request runs inline —
    * only the rare restart-after-terminate path pays that. */
  def request(): Unit =
    if (queued.compareAndSet(false, true))
      try exec.submit(new Runnable {
        def run(): Unit = { queued.set(false); drain() }
      })
      catch {
        case _: java.util.concurrent.RejectedExecutionException =>
          queued.set(false); drain()
      }

  /** Stop the drain thread once its query is done — engines are per-query;
    * without this a long-lived host leaks one daemon thread (and the
    * engine it pins) per engine start. Queued work still runs. */
  def shutdown(): Unit = exec.shutdown()

  def listenerFor(q: StreamingQuery, spark: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQueryListener = {
    val self = this
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.id == q.id) self.request()
      override def onQueryIdle(e: QueryIdleEvent): Unit =
        if (e.id == q.id) self.request()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == q.id) {
          self.request() // final drain is async — hosts needing a
          // synchronous last drain call drainDue() after awaitTermination
          spark.streams.removeListener(this)
          self.shutdown() // already-queued final drain still runs
        }
    }
  }
}

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
  * A18 retry parity lives in the shared [[RetryLedger]]; a batch that fails
  * is bisected so only the genuinely failing records are charged (halves are
  * applied independently, sorted by seq, so per-id ordering is preserved
  * across sub-batches — O(f·log n) sub-batch attempts isolate f poison
  * records). The clock is injectable so specs drive the gates without
  * sleeping.
  *
  * This engine pairs an in-memory [[MrState]] with the whole-table
  * [[ParquetStateStore]] — right for modest state (each durable save
  * rewrites every table). The scale path with identical A18 semantics is
  * [[BucketedStreamingEngine]], which pairs the same ledger with
  * touched-bucket IO and persists the ledger inside the store commit.
  */
final class StreamingEngine(
    pipeline: Pipeline,
    sources: IncrementalRun.Sources,
    @volatile private var state: MrState,
    maxRetries: Int = 2,
    store: Option[ParquetStateStore] = None,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val ledger = new RetryLedger(maxRetries)

  @volatile private var batchClock: Long = 0L

  def currentState: MrState = state
  def deadLetters: List[Change] = ledger.deadLetters
  def pending: Seq[FailedChange] = ledger.pending

  /** The queryable notification queue (reference: listeners.py:37-40) —
    * pending retries with their backoff gates plus the dead-letter log. */
  def notifications(spark: SparkSession): DataFrame =
    Notifications.frame(spark, pending, deadLetters)

  private def session: SparkSession = state.tables.head._2.sparkSession

  // batches and the idle-drain dispatcher run on different threads; the
  // engine is single-writer, so one lock serializes them
  private val batchLock = new Object
  @volatile private var lastBatchId: Long = -1L

  /** Run one micro-batch (the `foreachBatch` body). Visible for batch tests. */
  def processBatch(changes: Dataset[Change], batchId: Long): Unit =
    processBatch(changes.collect().toSeq, batchId)

  /** Drain whatever retries are due right now (the reference's idle poll,
    * worker.py:85-89). Wired to Spark's idle/progress events by [[start]];
    * callable directly by hosts embedding the engine. */
  def drainDue(): Unit = processBatch(Seq.empty[Change], lastBatchId)

  /** Same, batch already local. Due retries ride along with the incoming
    * changes; an empty incoming batch still drains due retries (the
    * reference's idle poll; [[start]] wires Spark's idle/progress events to
    * this so retries drain even when no new data arrives). */
  def processBatch(changes: Seq[Change], batchId: Long): Unit = batchLock.synchronized {
    lastBatchId = math.max(lastBatchId, batchId)
    val now = clock()
    val due = ledger.due(now)
    // a batch whose records are all pending-and-not-due leaves state (and
    // the durable snapshot) untouched by design — skipping the save is
    // sound because the snapshot is still exactly the pre-batch state
    val work = (due.map(_.change) ++ changes).distinct.sortBy(_.seq)
    if (work.isEmpty) return

    batchClock += 1
    val failed = applyIsolating(work)
    ledger.record(work, failed, due, now)
    // durable snapshot once per batch, covering whatever applied
    store.foreach(_.save(state, batchId))
  }

  /** Apply `work`, bisecting on failure so only the genuinely failing
    * records are reported. Returns the failed records. */
  private def applyIsolating(work: Seq[Change]): Seq[Change] =
    if (work.isEmpty) Nil
    else {
      val ok =
        try {
          val s = session
          import s.implicits._
          // applyChanges already truncates the lineage of every table it
          // rewrote (eager localCheckpoint = this batch's sink write)
          state = IncrementalRun.applyChanges(
            pipeline, sources, state, work.toDS(), batchTimestampNs = batchClock)
          true
        } catch { case _: Exception => false }
      if (ok) Nil
      else if (work.size == 1) work
      else {
        val (l, r) = work.splitAt(work.size / 2)
        applyIsolating(l) ++ applyIsolating(r)
      }
    }

  private val drains = new DrainDispatch(() => drainDue())

  /** Start the engine on a change stream. `availableNow=true` = the worker's
    * drain-then-exit mode; false = forever mode with a short poll trigger.
    *
    * Retry draining: Structured Streaming skips `foreachBatch` entirely when
    * no new data arrived, so pending retries would otherwise strand during
    * quiet periods — a listener maps Spark's idle/progress/termination
    * events onto [[drainDue]] via a dedicated drain thread (the reference's
    * poll loop touches its retry ledger every iteration regardless of new
    * notifications). The ledger here is in-memory, like the reference's
    * `_failed_notifications` dict — crash-durable retries are
    * [[BucketedStreamingEngine]]'s job (ledger persisted in the store
    * commit). */
  def start(changeStream: Dataset[Change], availableNow: Boolean = true): StreamingQuery = {
    val spark = changeStream.sparkSession
    val writer = changeStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Change], id: Long) => processBatch(ds, id) }
    val q = (if (availableNow) writer.trigger(Trigger.AvailableNow())
             else writer.trigger(Trigger.ProcessingTime("500 milliseconds")))
      .start()
    spark.streams.addListener(drains.listenerFor(q, spark))
    q
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
