package graft

import graft.core.IniConfig
import graft.dedup.{Components, DocDedup}
import graft.incr.BucketedStateStore
import graft.text.{Curation, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named BATCH jobs for the worker CLI — the flagship LLM-curation
  * pipeline gets the same operational surface the reference's worker
  * gives its MR pipelines: config-file-driven
  * (`runMain graft.Worker --job curate -c config.ini`), single-writer
  * leased, RESUMABLE through the durable store's committed batch ids,
  * and inspectable without a lease or a SparkSession (`--jobs`, the
  * batch twin of `--queue`).
  *
  * Resumability contract: each stage writes its full output table into
  * the store and commits it under the stage's fixed batch id (manifest
  * swap — all-or-nothing). A re-run skips every stage at or below the
  * committed pointer and reads its output back from the store, so a
  * crash between stages costs only the unfinished stage, and a re-run
  * of a finished job is a no-op. Per-stage row counts ride the same
  * manifest swap as store meta ([[BucketedStateStore.setMeta]]), so the
  * `--jobs` listing can answer "how far did it get" from the manifest
  * alone. */
object Jobs {

  /** Thrown when a job must stop mid-run (single-writer lease lost):
    * continuing to commit would write concurrently with the new lease
    * holder — the exact violation the lease exists to prevent. */
  final case class AbortedException(msg: String) extends RuntimeException(msg)

  /** Run a named job; returns the process exit code. `cancelled` is
    * polled before every stage start and again immediately before every
    * durable commit (the worker wires it to its lease-lost flag), so a
    * stolen lease aborts the job BEFORE the next manifest swap — the
    * batch twin of the stream path's stop-on-steal. */
  def run(name: String, spark: SparkSession, conf: IniConfig,
          store: BucketedStateStore,
          sources: graft.incr.IncrementalRun.Sources,
          cancelled: () => Boolean = () => false): Int = name match {
    case "curate" =>
      try { Curate.run(spark, conf, store, sources, cancelled); 0 }
      catch {
        case AbortedException(msg) => System.err.println(msg); 1
      }
    case other =>
      System.err.println(s"unknown job '$other' (known: curate)")
      1
  }

  /** Committed stage pointer for a named job — how many of its stages
    * have durably committed. Job progress is JOB-SCOPED store meta (it
    * rides the same atomic manifest swap as the stage's table), NOT the
    * store's global batch counter: a store that already carries commits
    * from another workload (a stream worker's, say) must not make a
    * never-run job look 'done'. */
  private[graft] def stagePointer(store: BucketedStateStore,
                                  job: String): Long =
    store.meta(s"job.$job.stage").map(_.toLong).getOrElse(0L)

  /** `--jobs`: progress listing from the committed manifest alone. */
  def progressLines(store: BucketedStateStore): Seq[String] = {
    val done = stagePointer(store, "curate")
    Curate.Stages.zipWithIndex.map { case (stage, i) =>
      val status =
        if (done >= i + 1L)
          s"done (rows=${store.meta(s"job.curate.$stage.rows").getOrElse("?")})"
        else "pending"
      s"curate/$stage: $status"
    }
  }

  /** The capstone curation chain (the `pipeline_curate` query as an
    * operable job): near-dup RESOLUTION (MinHash pairs → connected
    * components → survivors) ∘ language + quality gates ∘ per-source
    * quantile length gate ∘ temperature mixing to per-source budgets.
    *
    * {{{
    * [job:curate]
    * input = documents     ; [sources] name of the document table
    * id_col = doc_id
    * text_col = text
    * source_col = source
    * threshold = 0.8       ; near-dup MinHash Jaccard threshold
    * lang = en
    * quality_min = 0.55
    * alpha = 0.7           ; mixing temperature
    * frac = 0.5            ; token budget as a fraction of the corpus
    * }}} */
  object Curate {
    val Stages: Seq[String] = Seq("survivors", "gated", "curated")

    def run(spark: SparkSession, conf: IniConfig, store: BucketedStateStore,
            sources: graft.incr.IncrementalRun.Sources,
            cancelled: () => Boolean = () => false): Unit = {
      val sec = "job:curate"
      val input = conf.getOrElse(sec, "input", "documents")
      val idCol = conf.getOrElse(sec, "id_col", "doc_id")
      val textCol = conf.getOrElse(sec, "text_col", "text")
      val sourceCol = conf.getOrElse(sec, "source_col", "source")
      def dbl(key: String, default: Double) =
        conf.get(sec, key).map(_.toDouble).getOrElse(default)
      val threshold = dbl("threshold", 0.8)
      val qualityMin = dbl("quality_min", 0.55)
      val alpha = dbl("alpha", 0.7)
      val frac = dbl("frac", 0.5)
      val lang = conf.getOrElse(sec, "lang", "en")

      val allBuckets = (0 until store.numBuckets).toSet
      def abortIfCancelled(at: String): Unit =
        if (cancelled()) throw AbortedException(
          s"lease lost; aborting job 'curate' at $at (no further commits)")
      // progress is the JOB's stage pointer (store meta, atomic with the
      // stage's table), never the store's global batch counter — so a
      // store pre-populated by any other workload can't fake 'done', and
      // a 'done' pointer always has its table (same manifest swap). A
      // pointer without its table is a corrupted store: fail loud.
      def stageDone(idx: Long, stage: String): Boolean = {
        val done = stagePointer(store, "curate") >= idx
        if (done && !store.tableNames.contains(stage))
          throw new IllegalStateException(
            s"job.curate.stage=$idx but stage table '$stage' is absent — " +
              "store meta and tables disagree; refusing to skip")
        done
      }
      def commitStage(stage: String, idx: Long, rows: DataFrame,
                      keyCol: String): Unit = {
        val batch = store.committedBatch.getOrElse(0L) + 1L
        val cached = graft.ops.Caches.track(rows)
        store.stageBuckets(stage, allBuckets, cached, batch, keyCol)
        store.setMeta(s"job.curate.$stage.rows", cached.count().toString)
        store.setMeta("job.curate.stage", idx.toString)
        abortIfCancelled(s"commit of stage '$stage'")
        store.commit(batch) // the stage becomes durable HERE, atomically
        graft.core.KillPoint(s"job.curate.$stage.committed")
      }

      // stage 1 — survivors: near-dup resolution + language/quality gates
      if (!stageDone(1L, "survivors")) {
        abortIfCancelled("start of stage 'survivors'")
        graft.core.KillPoint("job.curate.survivors.start")
        val docs = sources(input)
        val pairs = DocDedup.nearDupPairs(docs, textCol, idCol,
          threshold = threshold, numHashes = 32, bands = 8,
          maxBucketSize = 10000)
        val filtered = Components.survivors(docs, idCol, pairs)
          .filter(TextFunctions.langId(col(textCol)) === lang &&
            TextFunctions.qualityScore(col(textCol)) >= qualityMin)
        commitStage("survivors", 1L, filtered, idCol)
      }

      // stage 2 — gated: per-source quantile length gate over stage 1
      if (!stageDone(2L, "gated")) {
        abortIfCancelled("start of stage 'gated'")
        graft.core.KillPoint("job.curate.gated.start")
        val filtered = store.table(spark, "survivors")
        val gated = Curation.lengthGate(filtered, textCol, idCol, sourceCol)
        commitStage("gated", 2L,
          filtered.join(gated.select(col(idCol)), Seq(idCol)), idCol)
      }

      // stage 3 — curated: temperature mixing to per-source token budgets
      if (!stageDone(3L, "curated")) {
        abortIfCancelled("start of stage 'curated'")
        graft.core.KillPoint("job.curate.curated.start")
        val gatedDocs = store.table(spark, "gated")
        commitStage("curated", 3L,
          Curation.mixByTemperature(gatedDocs, idCol, textCol, sourceCol,
            alpha = alpha, frac = frac), idCol)
      }
      graft.ops.Caches.release()
    }
  }
}
