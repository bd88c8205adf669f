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

  /** Run a named job; returns the process exit code. */
  def run(name: String, spark: SparkSession, conf: IniConfig,
          store: BucketedStateStore,
          sources: graft.incr.IncrementalRun.Sources): Int = name match {
    case "curate" => Curate.run(spark, conf, store, sources); 0
    case other =>
      System.err.println(s"unknown job '$other' (known: curate)")
      1
  }

  /** `--jobs`: progress listing from the committed manifest alone. */
  def progressLines(store: BucketedStateStore): Seq[String] = {
    val done = store.committedBatch.getOrElse(-1L)
    Curate.Stages.zipWithIndex.map { case (stage, i) =>
      val batch = i + 1L
      val status =
        if (done >= batch)
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
            sources: graft.incr.IncrementalRun.Sources): Unit = {
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
      def stageDone(batch: Long) = store.committedBatch.exists(_ >= batch)
      def commitStage(stage: String, batch: Long, rows: DataFrame,
                      keyCol: String): Unit = {
        val cached = graft.ops.Caches.track(rows)
        store.stageBuckets(stage, allBuckets, cached, batch, keyCol)
        store.setMeta(s"job.curate.$stage.rows", cached.count().toString)
        store.commit(batch) // the stage becomes durable HERE, atomically
        graft.core.KillPoint(s"job.curate.$stage.committed")
      }

      // stage 1 — survivors: near-dup resolution + language/quality gates
      if (!stageDone(1L)) {
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
      if (!stageDone(2L)) {
        graft.core.KillPoint("job.curate.gated.start")
        val filtered = store.table(spark, "survivors")
        val gated = Curation.lengthGate(filtered, textCol, idCol, sourceCol)
        commitStage("gated", 2L,
          filtered.join(gated.select(col(idCol)), Seq(idCol)), idCol)
      }

      // stage 3 — curated: temperature mixing to per-source token budgets
      if (!stageDone(3L)) {
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
