package graft.incr

import graft.core.{MrSchema, Pipeline}
import graft.ops.{MapOp, ReduceOp}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Bucket-scoped incremental batches over a [[BucketedStateStore]] —
  * [[IncrementalRun.applyChanges]] with the same ordering guarantees
  * (delete-old-then-rewrite, A13 tombstone + deferred purge, A15 version
  * barrier, A12 newest-wins inside a batch) but O(touched buckets) IO per
  * batch instead of a full-state rewrite.
  *
  * How a batch stays scoped:
  *   1. the change batch itself is CONTROL DATA — it is collected to the
  *     driver exactly like the reference drains its notification queue one
  *     listener poll at a time (processor.py:437-461). A batch is small by
  *     contract (a backlog beyond memory is what resync A16/A17 is for);
  *     holding it locally lets every bucket set be computed without a
  *     Spark job and every id/key predicate ship as a local-relation
  *     broadcast;
  *   2. a per-map-table SECONDARY INDEX `(source_type, source_id, key)`,
  *      bucketed by source id, answers "which keys did these changed ids
  *      produce" by reading only the index buckets of the batch's ids —
  *      the reference's indexed REST lookup (clients/qvarn.py:111-137)
  *      without scanning the map table;
  *   3. touched keys (old-from-index ∪ freshly-mapped) give a touched
  *      bucket set per table; the batch reads those buckets only, applies
  *      the provenance algebra, re-reduces ready keys, and stages ONLY
  *      those buckets back — untouched buckets are carried by reference;
  *   4. the A15 stale-key filter is computed over the scoped rows, which is
  *      exact: every row of a touched key lives in a touched bucket, and
  *      stale keys outside the touched set cannot affect readiness.
  *
  * Shuffle story at 100 TB: every batch-side frame (ids, touched keys,
  * ready keys) is a broadcast local relation, so STATE rows are never
  * shuffle-joined — the only exchanges in a batch plan are over batch-sized
  * data (the re-reduce of touched keys' rows and the bucketed staging
  * write). The per-batch plans are captured in the returned [[BatchReport]]
  * so tests can assert no SortMergeJoin ever touches a state-side frame.
  *
  * Per batch this runs a fixed, small number of Spark jobs: one touched-key
  * collect per map spec, one stale-key collect per reduce target, a purge
  * collect only when the batch contains deletes, and one staged write per
  * touched table.
  */
object BucketedRun {
  import MrSchema._

  /** Secondary-index table name for a map target. */
  def indexName(mapTarget: String): String = s"_idx_$mapTarget"

  /** Per-table staging summary: which buckets were replaced, with the
    * executed plan of the staged content (for plan-audit assertions).
    * `resync = true` marks a batch that exceeded the small-batch contract
    * and was diverted to the full-recompute path (staged map empty — every
    * bucket of every table was replaced through [[resyncFull]]). */
  final case class StagedTable(buckets: Set[Int], plan: String)
  final case class BatchReport(staged: Map[String, StagedTable], resync: Boolean = false)

  /** Ceiling on the driver-collected change batch (see [[applyChanges]]'s
    * Dataset overload): below it a batch is notification-sized control data;
    * above it the batch is a backlog and the full-recompute resync path is
    * strictly cheaper than per-id scoped algebra anyway (it scans each
    * source once, instead of per-key bucket IO proportional to the batch). */
  val MaxCollectedBatch: Int = 100000

  /** Cold start: full recompute, then write every table (+ index) bucketed. */
  def initialize(pipeline: Pipeline, sources: IncrementalRun.Sources,
                 store: BucketedStateStore, batchId: Long = 0L): Unit = {
    val st = IncrementalRun.recompute(pipeline, sources)
    // each map table is written twice (table + its index projection): cache
    // so the source scan and map projection run once per target
    val cached = pipeline.mapTargets.toSeq.map(t => t -> st(t).cache()).toMap
    try {
      val mapTables = cached.toSeq.map { case (t, df) =>
        Seq(t -> (df, Key),
          indexName(t) -> (df.select(col(SourceType), col(SourceId), col(Key)).distinct(), SourceId))
      }
      // rebuild reduces from the CACHED map frames (recompute()'s own reduce
      // plans reference the uncached map plans — the source would be
      // re-scanned per reduce target otherwise)
      val reduceTables = pipeline.reduces.map(r =>
        Seq(r.target -> (ReduceOp(r, cached(r.source)): DataFrame, Key)))
      store.initialize((mapTables ++ reduceTables).flatten.toMap, batchId)
    } catch {
      // half-staged resync deltas must never ride along with the NEXT
      // successful commit (stage metadata is store-level) — same protocol
      // as the applyChanges failure path
      case e: Throwable => store.discardStaged(); throw e
    } finally cached.values.foreach(_.unpersist(blocking = false))
  }

  /** Backlog divert target (A16/A17 applied to the store): replace the whole
    * state with a fresh recompute over current source snapshots, committed
    * as `batchId`. A backlog batch carries no information a recompute does
    * not — the engine re-fetches current source state per id anyway, so one
    * scan of each source strictly dominates per-id scoped IO at backlog
    * sizes. */
  def resyncFull(pipeline: Pipeline, sources: IncrementalRun.Sources,
                 store: BucketedStateStore, batchId: Long): BatchReport = {
    if (store.committedBatch.exists(_ >= batchId)) return BatchReport(Map.empty)
    initialize(pipeline, sources, store, batchId)
    BatchReport(Map.empty, resync = true)
  }

  /** Heal [[BucketedStateStore.fsck]] damage: recompute the derivation
    * from current sources (ONE scan per source — the same cost argument as
    * [[resyncFull]]) but stage and commit ONLY the damaged buckets of the
    * damaged tables. Undamaged buckets keep their immutable directories by
    * reference, so repair WRITE IO is proportional to the damage, not the
    * state. No-op on a clean store. Returns the damage that was healed.
    * Reference analogue: resync heals whatever state drifted
    * (resync.py:91-128) — here narrowed to the verifiably-broken subset. */
  def repair(pipeline: Pipeline, sources: IncrementalRun.Sources,
             store: BucketedStateStore,
             batchId: Long): Seq[(String, Int, String)] = {
    val damaged = store.fsck()
    if (damaged.isEmpty) return damaged
    val byTable: Map[String, Set[Int]] =
      damaged.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val st = IncrementalRun.recompute(pipeline, sources)
    val cached = pipeline.mapTargets.toSeq.map(t => t -> st(t).cache()).toMap
    try {
      val all: Map[String, (DataFrame, String)] = (cached.toSeq.flatMap {
        case (t, df) => Seq(t -> (df, Key),
          indexName(t) -> (df.select(col(SourceType), col(SourceId), col(Key))
            .distinct(): DataFrame, SourceId))
      } ++ pipeline.reduces.map(r =>
        r.target -> (ReduceOp(r, cached(r.source)): DataFrame, Key))).toMap
      byTable.foreach { case (tname, bks) =>
        val (df, keyCol) = all.getOrElse(tname,
          sys.error(s"damaged table '$tname' is not derivable from the pipeline"))
        store.stageBuckets(tname, bks,
          df.filter(store.bucketOf(col(keyCol)).isin(bks.toSeq: _*)),
          batchId, keyCol)
      }
      store.commit(batchId)
    } catch {
      case e: Throwable => store.discardStaged(); throw e
    } finally cached.values.foreach(_.unpersist(blocking = false))
    damaged
  }

  /** Driver-side mirror of [[BucketedStateStore.bucketOf]] — same xxhash64
    * chain (null hashes to the seed, exactly like the Catalyst expression
    * skips null children). */
  private def bucketOfValue(key: String, numBuckets: Int): Int = {
    val h = if (key == null) 42L
    else XxHash64Function.hash(UTF8String.fromString(key), StringType, 42L)
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }

  /** One change batch against the store; commits on success.
    *
    * The small-batch contract is ENFORCED here, not assumed: the collect is
    * bounded at `maxBatchSize + 1` rows, and a batch that exceeds it (a
    * streaming source replaying a backlog after downtime) diverts to
    * [[resyncFull]] instead of blowing the driver — the reference handles
    * the same situation by resyncing rather than draining the queue
    * (resync.py:91-128). Normal notification-sized batches are unaffected. */
  def applyChanges(
      pipeline: Pipeline,
      sources: IncrementalRun.Sources,
      store: BucketedStateStore,
      changes: Dataset[Change],
      batchTimestampNs: Long,
      batchId: Long): BatchReport =
    applyChanges(pipeline, sources, store, changes, batchTimestampNs, batchId,
      MaxCollectedBatch)

  /** Same, with an explicit backlog ceiling (specs drive it low). */
  def applyChanges(
      pipeline: Pipeline,
      sources: IncrementalRun.Sources,
      store: BucketedStateStore,
      changes: Dataset[Change],
      batchTimestampNs: Long,
      batchId: Long,
      maxBatchSize: Int): BatchReport = {
    val bounded = changes.limit(maxBatchSize + 1).collect().toSeq
    if (bounded.size > maxBatchSize)
      resyncFull(pipeline, sources, store, batchId)
    else
      applyChanges(changes.sparkSession, pipeline, sources, store,
        bounded, batchTimestampNs, batchId)
  }

  /** Same, with the batch already in driver memory — the native shape of a
    * notification-queue poll (the Dataset overload exists for streaming
    * `foreachBatch`, which hands the batch over as a Dataset).
    *
    * `ledger`: opaque engine payload committed atomically WITH the batch
    * (see [[BucketedStateStore.commit]]) — [[BucketedStreamingEngine]]
    * passes its serialized retry ledger so a crash can never separate
    * applied state from retry accounting. */
  def applyChanges(
      spark: org.apache.spark.sql.SparkSession,
      pipeline: Pipeline,
      sources: IncrementalRun.Sources,
      store: BucketedStateStore,
      changes: Seq[Change],
      batchTimestampNs: Long,
      batchId: Long,
      ledger: Option[String] = None): BatchReport = {
    import spark.implicits._

    // exactly-once sink contract: Structured Streaming re-delivers the last
    // batch after a crash; a batch id at-or-below the committed manifest
    // pointer has already been fully applied and published — skip it
    if (store.committedBatch.exists(_ >= batchId)) return BatchReport(Map.empty)

    // A12 newest-wins per id, on the driver (see scaling note above)
    val batchAll: Seq[Change] = changes
      .groupBy(c => (c.resourceType, c.resourceId))
      .map { case (_, cs) => cs.maxBy(_.seq) }.toSeq

    def bucketsOfKeys(keys: Iterable[String]): Set[Int] =
      keys.map(bucketOfValue(_, store.numBuckets)).toSet
    /** Single-column local relation — broadcasts from driver memory, so
      * joins against it never spawn a job to materialize the build side. */
    def localCol(name: String, values: Seq[String]): DataFrame =
      broadcast(values.toDF(name))

    val tempCaches = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def tracked(df: DataFrame): DataFrame = { tempCaches += df.cache(); df }

    def prof[T](label: String)(f: => T): T =
      if (!sys.env.contains("GRAFT_PROF")) f
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"PROFB $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
      }

    /** Batch-lifetime scoped view of one stored table: widens bucket by
      * bucket as the batch discovers touched keys, stages once at the end.
      * Tables that were only READ (e.g. an index consulted by a batch that
      * did not change it) are never staged — their committed buckets stand.
      *
      * Write elision: staging first computes a per-bucket content
      * fingerprint of committed-vs-updated rows (one aggregation over
      * frames the batch already holds cached) and stages ONLY buckets whose
      * content actually changed. A steady-state no-op update (same ids,
      * same rows — the common "notification fired but nothing material
      * moved" case) then writes NOTHING; at scale, write IO tracks changed
      * buckets, not touched buckets. The fingerprint is two independently
      * keyed order-independent hash sums + a count per bucket — a false
      * "unchanged" needs a simultaneous collision in both 64-bit sums. */
    final class Scoped(name: String, keyCol: String) {
      var buckets: Set[Int] = Set.empty
      var rows: DataFrame = _
      private var original: DataFrame = _
      var dirty: Boolean = false
      def widen(need: Set[Int]): DataFrame = {
        val add = need -- buckets
        if (add.nonEmpty || rows == null) {
          val fresh = store.readBuckets(spark, name, add)
          rows = tracked(if (rows == null) fresh else rows.unionByName(fresh))
          original = tracked(if (original == null) fresh else original.unionByName(fresh))
          buckets ++= add
        }
        rows
      }
      def update(f: DataFrame => DataFrame): Unit = {
        rows = tracked(f(rows)); dirty = true
      }
      /** Buckets whose content differs from the committed content. Falls
        * back to "all widened buckets" when the fingerprint cannot run
        * (schema drift within the batch, un-hashable column type). */
      private def changedBuckets(): Set[Int] = {
        if (original == null || original.columns.sorted.toSeq != rows.columns.sorted.toSeq)
          return buckets
        // the batch timestamp is provenance timing, not content: a row whose
        // every OTHER column matches the committed row is unchanged, and
        // keeping its original stamp is exactly what "nothing moved" means
        // (versions and tombstone flags stay in — those are semantic)
        val cols = rows.columns.sorted.toSeq.filterNot(_ == Timestamp).map(col)
        def fp(df: DataFrame, s: Int): DataFrame =
          df.select(store.bucketOf(col(keyCol)).as("__b"),
            xxhash64(struct(cols: _*)).cast("decimal(38,0)").as("__h1"),
            xxhash64(lit("g2"), struct(cols: _*)).cast("decimal(38,0)").as("__h2"),
            lit(s).as("__s"))
        scala.util.Try {
          val agg = fp(original, 0).unionByName(fp(rows, 1))
            .groupBy(col("__b"), col("__s"))
            .agg(count(lit(1)).as("__n"), sum(col("__h1")).as("__s1"),
              sum(col("__h2")).as("__s2"))
            .collect()
          // columns: __b, __s, __n, __s1, __s2
          val by = agg.map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getLong(2), r.getDecimal(3), r.getDecimal(4))).toMap
          agg.map(_.getInt(0)).toSet
            .filter(b => by.get((b, 0)) != by.get((b, 1)))
        }.getOrElse(buckets)
      }
      def stage(): Option[StagedTable] = {
        val changed = prof(s"diff:$name")(changedBuckets())
        if (changed.isEmpty) None
        else {
          val plan = rows.queryExecution.executedPlan.toString
          val toStage =
            if (changed == buckets) rows
            else rows.filter(store.bucketOf(col(keyCol)).isin(changed.toSeq: _*))
          store.stageBuckets(name, changed, toStage, batchId, keyCol)
          Some(StagedTable(changed, plan))
        }
      }
    }
    val scoped = scala.collection.mutable.LinkedHashMap.empty[String, Scoped]
    def scopedTable(name: String, keyCol: String): Scoped =
      scoped.getOrElseUpdate(name, new Scoped(name, keyCol))

    // AQE off for the batch body: every frame here is either a broadcast
    // local relation or a few scoped buckets, so runtime re-planning buys
    // nothing and splits each of the batch's ~7 actions into per-stage jobs
    // — at notification-batch sizes the fixed per-job overhead dominates
    // wall time (measured ~30 jobs/batch with AQE, ~10 without). Narrow
    // static shuffle width for the same reason. Session-global settings —
    // BatchConf serializes all tuned bodies on this session.
    graft.core.BatchConf.withBatchTuning(spark) {
    try {
      // (mapTarget -> touched keys), merged across specs
      var affectedKeys = Map.empty[String, Set[String]]

      for ((sourceName, specs) <- pipeline.mappersBySource.toSeq.sortBy(_._1)) {
        val batch = batchAll.filter(_.resourceType == sourceName)
        val upserts = batch.collect { case c if c.change != Change.Deleted => c.resourceId }
        val deletes = batch.collect { case c if c.change == Change.Deleted => c.resourceId }
        val allIds = upserts ++ deletes
        if (allIds.nonEmpty) for (spec <- specs) {
          val idx = scopedTable(indexName(spec.target), SourceId)
          val idxRows = idx.widen(bucketsOfKeys(allIds))

          // 1. old (type, id, key) triples of the changed ids — index
          // lookup, not a table scan
          val oldTriples = idxRows.filter(col(SourceType) === spec.source)
            .join(localCol("__id", allIds), col(SourceId) === col("__id"), "left_semi")
            .select(col(SourceType), col(SourceId), col(Key), lit(false).as("__new"))

          // 2. re-map only the touched source rows. The semi join is the
          // correctness contract; the isin prefilter is the same id set as
          // a pushable predicate so the source scan prunes row groups
          // instead of reading the whole table (exact driver-side cast of
          // the string ids to the id column's type — skipped when the ids
          // don't round-trip or the IN list would be degenerate).
          val src = sources(spec.source)
          val idFilter: Option[Column] = {
            import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
            if (upserts.isEmpty || upserts.size > 1000) None
            else scala.util.Try {
              src.schema(spec.idCol).dataType match {
                case LongType => col(spec.idCol).isin(upserts.map(_.toLong): _*)
                case IntegerType => col(spec.idCol).isin(upserts.map(_.toInt): _*)
                case StringType => col(spec.idCol).isin(upserts: _*)
              }
            }.toOption
          }
          val touchedSrc = idFilter.map(src.filter).getOrElse(src)
            .join(localCol("__id", upserts),
              col(spec.idCol).cast("string") === col("__id"), "left_semi")
          val fresh = tracked(MapOp(spec, touchedSrc))
          val freshTriples = fresh
            .select(col(SourceType), col(SourceId), col(Key), lit(true).as("__new"))
            .distinct()

          // 3. old + fresh triples — THE one collect job of the map phase
          // (it also materializes `fresh` into its cache for the updates
          // below). Triples, not bare keys: the driver derives touched keys
          // AND whether the index content actually changed.
          val collected = prof(s"triples:${spec.target}") {
            oldTriples.unionByName(freshTriples)
              .as[(String, String, String, Boolean)].collect() }
          val oldT = collected.collect { case (t, i, k, false) => (t, i, k) }.toSet
          val newT = collected.collect { case (t, i, k, true) => (t, i, k) }.toSet
          val touched: Set[String] = (oldT ++ newT).map(_._3)
          val tbl = scopedTable(spec.target, Key)
          tbl.widen(bucketsOfKeys(touched))

          // 4. delete-old-then-rewrite within the scoped buckets only; the
          // algebra touches nothing outside `spec.source` rows of batch ids,
          // and all of those live in the scoped buckets (via the index)
          val upsertDf = localCol(SourceId, upserts)
          tbl.update { old =>
            val mine = old.filter(col(SourceType) === spec.source)
            val others = old.filter(col(SourceType) =!= spec.source)
            val withoutUpserted = mine.join(upsertDf, Seq(SourceId), "left_anti")
            val marked = withoutUpserted
              .join(localCol("__del", deletes), col(SourceId) === col("__del"), "left")
              .withColumn(Deleted, col(Deleted) || col("__del").isNotNull)
              .drop("__del")
            others.unionByName(marked.unionByName(fresh, allowMissingColumns = true),
              allowMissingColumns = true)
          }

          // 5. index maintenance: upserted ids get their fresh (id -> key)
          // entries; deleted ids KEEP theirs while the tombstone lives (a
          // later re-create must find the tombstone's bucket to remove it);
          // the purge step below drops them together with their rows.
          // SKIPPED when the upserted ids' triples are unchanged (the
          // steady-state update batch: same ids map to the same keys) —
          // the committed index buckets already hold exactly this content.
          val upsertSet = upserts.toSet
          val idxDirty = newT != oldT.filter(t => upsertSet.contains(t._2))
          if (idxDirty) idx.update { old =>
            val mineIdx = old.filter(col(SourceType) === spec.source)
            val othersIdx = old.filter(col(SourceType) =!= spec.source)
            othersIdx.unionByName(
              mineIdx.join(upsertDf, Seq(SourceId), "left_anti")
                .unionByName(fresh.select(col(SourceType), col(SourceId), col(Key)).distinct()))
          }

          if (pipeline.reducersBySource.contains(spec.target))
            affectedKeys += spec.target ->
              (affectedKeys.getOrElse(spec.target, Set.empty) ++ touched)
        }
      }

      val anyDeletes = batchAll.exists(_.change == Change.Deleted)

      for ((mapTarget, keys) <- affectedKeys.toSeq.sortBy(_._1)) {
        val specs = pipeline.mapSpecsByTarget(mapTarget)
        val tbl = scoped(mapTarget)
        for (rspec <- pipeline.reducersBySource(mapTarget)) {
          val table = tbl.rows

          // A15 version barrier over the scoped rows (exact: every row of a
          // touched key is inside the scoped buckets). Steady state has zero
          // stale rows, so this collect is empty and cheap.
          val stale = specs.map(s =>
            col(SourceType) === s.source && col(Version) =!= s.version
          ).reduce(_ || _)
          val staleKeys = prof(s"stale:${rspec.target}") {
            table.filter(!col(Deleted) && stale)
              .select(col(Key)).distinct().as[String].collect().toSet }
          val ready: Set[String] = keys -- staleKeys
          val readyKeys = localCol(Key, ready.toSeq)

          val scopedLive = table.join(readyKeys, Seq(Key), "left_semi")
          val recomputed = ReduceOp(rspec, scopedLive, batchTimestampNs)

          // replace ready keys wholesale inside the reduce table's touched
          // buckets; an empty group yields no row = output delete
          val rtbl = scopedTable(rspec.target, Key)
          rtbl.widen(bucketsOfKeys(ready))
          rtbl.update { old =>
            old.join(readyKeys, Seq(Key), "left_anti")
              .unionByName(recomputed, allowMissingColumns = true)
          }

          // A13 deferred purge of reduced tombstones — rows AND their index
          // entries (a stale index entry would spuriously re-reduce the
          // purged key on the id's next unrelated change). Exact (type, id,
          // key) triples, not bare ids: a flatmap id can keep live rows
          // under other keys whose entries must survive. Skipped when the
          // batch contains no delete: fresh tombstones only appear in
          // delete batches; the one corner this defers is a barrier-
          // postponed tombstone from an EARLIER batch whose key reduces in
          // a delete-free batch — it is then benign garbage (excluded from
          // every fold) until the next delete-bearing batch purges it.
          if (anyDeletes) {
            val purged = tbl.rows.filter(col(Deleted))
              .join(readyKeys, Seq(Key), "left_semi")
              .select(col(SourceType), col(SourceId), col(Key)).distinct()
              .as[(String, String, String)].collect()
            tbl.update { rows =>
              rows.join(readyKeys.withColumnRenamed(Key, "__k"),
                col(Key) === col("__k") && col(Deleted), "left_anti")
            }
            if (purged.nonEmpty) {
              val idx = scopedTable(indexName(mapTarget), SourceId)
              idx.widen(bucketsOfKeys(purged.map(_._2)))
              val purgedDf = broadcast(purged.toSeq.toDF("__pt", "__pi", "__pk"))
              idx.update { old =>
                old.join(purgedDf,
                  col(SourceType) === col("__pt") && col(SourceId) === col("__pi") &&
                    col(Key) === col("__pk"),
                  "left_anti")
              }
            }
          }
        }
      }

      // stage all DIRTY tables CONCURRENTLY — each writes its own
      // immutable directory, so the writes only contend for executor slots
      // (wall time ≈ the largest table's write, not the sum)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val stagedF = scoped.toSeq.collect {
        case (n, sc) if sc.dirty => n -> Future(prof(s"stage:$n")(sc.stage()))
      }
      // await EVERY future before surfacing a failure: a still-running stage
      // must not add to the store's stage metadata after the catch below has
      // discarded this batch's deltas
      val awaited = prof("stage:await") {
        stagedF.map { case (n, f) => n -> scala.util.Try(Await.result(f, Duration.Inf)) } }
      awaited.collectFirst { case (_, scala.util.Failure(e)) => throw e }
      // tables whose fingerprints elided the write (Success(None)) are
      // omitted: their committed buckets stand untouched
      val report = BatchReport(awaited.collect {
        case (n, scala.util.Success(Some(st))) => n -> st }.toMap)
      prof("commit")(store.commit(batchId, ledger))
      report
    } catch {
      // a failed batch must not leak its half-staged deltas into the next
      // successful batch's commit (the retry engine re-applies failed work
      // LATER, against whatever state committed in between)
      case e: Throwable => store.discardStaged(); throw e
    } finally {
      tempCaches.foreach(_.unpersist(blocking = false))
    }
    }
  }

  /** Streaming `foreachBatch` body against the store (drain-then-exit or
    * forever mode, mirroring [[StreamingEngine]]). */
  def foreachBatch(pipeline: Pipeline, sources: IncrementalRun.Sources,
                   store: BucketedStateStore): (Dataset[Change], Long) => Unit = {
    (ds: Dataset[Change], id: Long) =>
      applyChanges(pipeline, sources, store, ds, batchTimestampNs = id + 1, batchId = id + 1)
      ()
  }
}
