package graft.incr

import graft.core.Pipeline
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A failed notification awaiting retry — the reference's FailedNotification
  * (processor.py:37-44): `retries` counts retry attempts used so far and
  * `firstFailedAtMs` anchors the backoff gates (the reference keeps the
  * original processed_at across retries, processor.py:273-280). */
final case class FailedChange(change: Change, retries: Int, firstFailedAtMs: Long)

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
  * A18 retry parity (processor.py:261-304): failures are tracked PER
  * NOTIFICATION, never per batch — one poison record must not poison its
  * siblings. A batch that fails is bisected: halves are applied
  * independently (sorted by seq, so per-id ordering is preserved across
  * sub-batches) until the failing records are isolated in O(f·log n)
  * sub-batch attempts. A failed record is retried on a LATER batch once its
  * backoff gate opens — no sooner than 0.25 s after its first failure, then
  * no sooner than 1.5 s — and after the second retry fails it is dropped to
  * the dead-letter log, exactly the reference's attempt schedule. A record
  * that succeeds on retry clears its failure entry (_report_success,
  * processor.py:255-259). The clock is injectable so specs can drive the
  * gates without sleeping.
  */
final class StreamingEngine(
    pipeline: Pipeline,
    sources: IncrementalRun.Sources,
    @volatile private var state: MrState,
    maxRetries: Int = 2,
    store: Option[ParquetStateStore] = None,
    clock: () => Long = () => System.currentTimeMillis()) {

  /** Backoff before retry n+1 (ms since FIRST failure) — processor.py:287-291. */
  private val backoffMs = Seq(250L, 1500L)

  @volatile private var pendingRetries: Map[(String, String, Long), FailedChange] = Map.empty
  @volatile private var deadLetterChanges: List[Change] = Nil
  @volatile private var batchClock: Long = 0L

  def currentState: MrState = state
  def deadLetters: List[Change] = deadLetterChanges
  def pending: Seq[FailedChange] = pendingRetries.values.toSeq

  private def key(c: Change): (String, String, Long) =
    (c.resourceType, c.resourceId, c.seq)

  private def session: SparkSession = state.tables.head._2.sparkSession

  // batches and the idle-drain listener run on different threads; the
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
    val due = pendingRetries.values.filter { f =>
      now - f.firstFailedAtMs >= backoffMs(math.min(f.retries, backoffMs.size - 1))
    }.toSeq
    // a batch whose records are all pending-and-not-due leaves state (and
    // the durable snapshot) untouched by design — skipping the save is
    // sound because the snapshot is still exactly the pre-batch state
    val work = (due.map(_.change) ++ changes).distinct.sortBy(_.seq)
    if (work.isEmpty) return

    batchClock += 1
    val failed = applyIsolating(work)

    val failedKeys = failed.map(key).toSet
    // successes clear their failure entries (_report_success) — including
    // any OLDER pending change for the same id: once a newer change for an
    // id has applied (current source state re-fetched), replaying a stale
    // earlier notification would un-do it and diverge from the recompute,
    // so the superseded entry must die with the success
    val succeededMax: Map[(String, String), Long] = work
      .filterNot(c => failedKeys.contains(key(c)))
      .groupBy(c => (c.resourceType, c.resourceId))
      .map { case (k, cs) => k -> cs.map(_.seq).max }
    pendingRetries = pendingRetries.filter { case ((t, i, seq), _) =>
      succeededMax.get((t, i)).forall(_ < seq)
    }
    // a failed change superseded by a SUCCEEDED newer change of the same id
    // is dropped outright (retrying it later would undo the newer state)
    for (c <- failed
         if succeededMax.get((c.resourceType, c.resourceId)).forall(_ < c.seq)) {
      pendingRetries.get(key(c)) match {
        case None =>
          pendingRetries += key(c) -> FailedChange(c, retries = 0, firstFailedAtMs = now)
        case Some(f) if due.exists(d => key(d.change) == key(c)) =>
          // a due retry failed: use up one retry, or drop after the last
          if (f.retries + 1 >= maxRetries) {
            pendingRetries -= key(c)
            deadLetterChanges ::= c
          } else
            pendingRetries += key(c) -> f.copy(retries = f.retries + 1)
        case Some(_) => // failed again before its gate opened — unchanged
      }
    }
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

  /** Start the engine on a change stream. `availableNow=true` = the worker's
    * drain-then-exit mode; false = forever mode with a short poll trigger.
    *
    * Retry draining: Structured Streaming skips `foreachBatch` entirely when
    * no new data arrived, so pending retries would otherwise strand during
    * quiet periods — a listener maps Spark's idle/progress/termination
    * events onto [[drainDue]] (the reference's poll loop touches its retry
    * ledger every iteration regardless of new notifications). Note the
    * ledger itself is in-memory, like the reference's `_failed_notifications`
    * dict: the reference survives crashes because failed notifications stay
    * UNACKED in its queue, a luxury a committed Spark checkpoint doesn't
    * offer — a host needing crash-durable retries should persist
    * [[pending]]/[[deadLetters]] alongside its snapshots. */
  def start(changeStream: Dataset[Change], availableNow: Boolean = true): StreamingQuery = {
    val spark = changeStream.sparkSession
    val writer = changeStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Change], id: Long) => processBatch(ds, id) }
    val q = (if (availableNow) writer.trigger(Trigger.AvailableNow())
             else writer.trigger(Trigger.ProcessingTime("500 milliseconds")))
      .start()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.id == q.id) drainDue()
      override def onQueryIdle(e: QueryIdleEvent): Unit =
        if (e.id == q.id) drainDue()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == q.id) {
          drainDue() // last chance before drain-then-exit hands control back
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
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
