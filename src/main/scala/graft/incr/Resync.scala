package graft.incr

import graft.core.{MapSpec, MrSchema, Pipeline}
import graft.ops.{MapOp, ReduceOp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A16/A17/A20 — handler-version registry + full resync.
  *
  * The reference keeps `qvarnmr_handlers` rows `{target, source, version}`
  * (resync.py:52-88) and, when a configured version differs, re-enumerates
  * every source id as a synthetic UPDATED notification in chunks of 100
  * (resync.py:91-128), skipping rows already at the current version
  * (processor.py:114-116).
  *
  * Spark-first: the registry is a tiny in-memory map (persist it as a
  * one-row-per-handler parquet/JSON next to the checkpoint in production);
  * "resync a map target" is a recompute of only the source ids that lack a
  * current-version row — an anti-join, not an id-at-a-time loop; "resync a
  * reduce target" is one distinct-keys recompute.
  */
final case class HandlerRegistry(versions: Map[String, Int]) {
  // map handlers are registered per (source, target) pair — a multi-source
  // map target bumps independently per source handler
  private def key(m: MapSpec): String = s"${m.source}→${m.target}"
  def changed(pipeline: Pipeline): (Seq[String], Seq[String]) = {
    val mapsChanged = pipeline.maps.filter(m => versions.getOrElse(key(m), -1) != m.version)
    val reducesChanged = pipeline.reduces.filter(r => versions.getOrElse(r.target, -1) != r.version)
    (mapsChanged.map(_.target), reducesChanged.map(_.target))
  }
  def bumped(pipeline: Pipeline): HandlerRegistry =
    HandlerRegistry(versions
      ++ pipeline.maps.map(m => key(m) -> m.version)
      ++ pipeline.reduces.map(r => r.target -> r.version))
}

object HandlerRegistry {
  val empty: HandlerRegistry = HandlerRegistry(Map.empty)
}

object Resync {
  import MrSchema._

  /** A16 — map-target resync with the skip-if-same-version fast path:
    * keep rows already produced by the current handler version; re-map only
    * the source ids that have none. */
  def resyncMap(spec: MapSpec, sources: IncrementalRun.Sources, oldTable: DataFrame): DataFrame = {
    // rows from OTHER sources feeding the same target pass through untouched
    val others = oldTable.filter(col(SourceType) =!= spec.source)
    val live = oldTable.filter(col(SourceType) === spec.source && !col(Deleted))
    // an id is "fresh" only when every live row it produced is at the current
    // version (the reference's `_same_version` check is per resource,
    // processor.py:40-45); anything else re-maps wholesale.
    val freshIds = live.groupBy(col(SourceId))
      .agg(max(when(col(Version) =!= spec.version, 1).otherwise(0)).as("__stale"))
      .filter(col("__stale") === 0)
      .select(col(SourceId).as("__id"))
    val src = sources(spec.source)
    val todo = src.join(freshIds, col(spec.idCol).cast("string") === col("__id"), "left_anti")
    val kept = live.join(freshIds, col(SourceId) === col("__id"), "left_semi")
    others.unionByName(kept.unionByName(MapOp(spec, todo), allowMissingColumns = true),
      allowMissingColumns = true)
  }

  /** A17 — reduce-target resync: recompute over distinct keys (all of them —
    * a full `groupBy`, which Spark executes as one shuffled pass, not the
    * reference's 1000-id client-side batches). */
  def resyncReduce(pipeline: Pipeline, target: String, state: MrState, timestampNs: Long = 0L): DataFrame = {
    val spec = pipeline.reduces.find(_.target == target).get
    ReduceOp(spec, state(spec.source), timestampNs)
  }

  /** Resync every handler whose registered version differs, then bump the
    * registry (the reference's `resync_changed_handlers`, resync.py:91-128). */
  def resyncChanged(
      pipeline: Pipeline,
      sources: IncrementalRun.Sources,
      state: MrState,
      registry: HandlerRegistry,
      timestampNs: Long = 0L): (MrState, HandlerRegistry) = {
    val (mapsChanged, reducesChanged) = registry.changed(pipeline)
    var st = state
    for (t <- mapsChanged.distinct; spec <- pipeline.mapSpecsByTarget(t))
      st = st.updated(t, resyncMap(spec, sources, st(t)))
    // a changed map target invalidates its dependent reduce targets too:
    val reduceTodo = (reducesChanged ++ pipeline.reduces
      .filter(r => mapsChanged.contains(r.source)).map(_.target)).distinct
    for (t <- reduceTodo)
      st = st.updated(t, resyncReduce(pipeline, t, st, timestampNs))
    (st, registry.bumped(pipeline))
  }
}
