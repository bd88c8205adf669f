package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative pipeline specs — the Spark-first re-expression of the
  * reference's handler config (qvarn-mr README.rst:232-249, handlers.py:11-24).
  *
  * The reference registers per-target Python callables; here a map handler is
  * a declarative `DataFrame => DataFrame` transform (so Catalyst sees the whole
  * plan and can prune/push down), and a reduce handler is one of a closed set
  * of fold shapes (expression agg, same-key join merge) that all compile to
  * native `groupBy(...).agg(...)` plans.
  */

/** A map handler: expand each source record into 0..n keyed rows (A5).
  *
  * `fn` must return columns `_mr_key` (any type; MapOp stringifies) and
  * optionally `_mr_value` and/or extra payload columns, plus the column named
  * by `idCol` for provenance tracking (the reference's `_mr_source_id`,
  * processor.py:63-64).
  */
final case class MapSpec(
    source: String,
    target: String,
    version: Int,
    idCol: String = "id",
    fn: DataFrame => DataFrame)

/** Reduce fold shapes. All fold every live (non-tombstoned) map row of one
  * key into exactly one output row per key (A6, processor.py:192-227). */
sealed trait ReduceFn

/** Expression fold: optional per-element pre-map (A7, `'map': value()` in the
  * reference) then a native aggregate over `_mr_value`. */
final case class ExprReduce(agg: Column => Column, premap: Column => Column = identity)
    extends ReduceFn

/** Same-key multi-source field merge (A10, the reference's `join()` helper,
  * func.py:63-71): for each source type pick the named payload fields; when a
  * key has several rows of one source, the row with the greatest `orderBy`
  * payload column wins (the reference's iteration order = last writer wins).
  */
final case class JoinReduce(
    mapping: Map[String, Map[String, String]], // sourceType -> (payloadField -> outputField)
    orderBy: String)
    extends ReduceFn

/** Count of live rows in the group (A11, func.py:46-47). */
case object CountReduce extends ReduceFn

/** User-defined running fold over the scalar `_mr_value` — the reference's
  * "any Python callable as reduce handler" surface (func.py:34-43; e.g.
  * plain `sum`/`min` used directly, tests/scripts/test_worker.py:80).
  * Spark-first this is a typed `Aggregator` compiled into the same
  * hash-aggregate plan as the built-in folds (partial agg + one shuffle). */
final case class TypedReduce(agg: org.apache.spark.sql.expressions.Aggregator[Double, _, Double])
    extends ReduceFn

/** User-defined fold over the WHOLE map row — the reference's reduce
  * handlers receive each mapped value unrestricted, including dict-shaped
  * ones (func.py:34-43; processor.py:209-213 hands over the value list).
  * [[TypedReduce]] narrows to scalar doubles; this variant hands the
  * `Aggregator` every live row as a `Row` (all table columns, accessible
  * by name), and its output type becomes `_mr_value`'s type — structs
  * included. Compiles into the same partial-agg + one-shuffle plan. */
final case class RowReduce(
    agg: org.apache.spark.sql.expressions.Aggregator[org.apache.spark.sql.Row, _, _])
    extends ReduceFn

final case class ReduceSpec(
    source: String, // must be a map target
    target: String,
    version: Int,
    fn: ReduceFn)

/** A validated DAG of map + reduce targets (A21/A22, validation.py:6-94).
  *
  * A map target may be fed by SEVERAL sources — one `MapSpec` per
  * (source, target) pair, exactly the reference's `{target: {source:
  * handler, source2: handler2}}` config shape (README.rst:232-249) that the
  * `join()` reduce relies on. A reduce target has exactly one source and it
  * must be a map target (validation.py:62-77).
  */
final case class Pipeline(maps: Seq[MapSpec], reduces: Seq[ReduceSpec]) {
  validate()

  /** mappers by source table — the reference's inverted routing table
    * (handlers.py:11-24). */
  lazy val mappersBySource: Map[String, Seq[MapSpec]] = maps.groupBy(_.source)
  lazy val reducersBySource: Map[String, Seq[ReduceSpec]] = reduces.groupBy(_.source)
  lazy val mapSpecsByTarget: Map[String, Seq[MapSpec]] = maps.groupBy(_.target)
  lazy val mapTargets: Set[String] = maps.map(_.target).toSet

  private def validate(): Unit = {
    // one handler per (source, target) pair; a target is either map or reduce
    val pairs = maps.map(m => (m.source, m.target))
    require(pairs.distinct == pairs,
      s"duplicate map handler for pair(s): ${pairs.diff(pairs.distinct).distinct.mkString(",")}")
    val rTargets = reduces.map(_.target)
    require(rTargets.distinct == rTargets,
      s"one reduce target must have exactly one handler; duplicated: ${rTargets.diff(rTargets.distinct).distinct.mkString(",")}")
    require(mapTargets.intersect(rTargets.toSet).isEmpty,
      "a target cannot be both a map and a reduce target")
    // a reduce target's single source must be a map target (validation.py:62-77)
    reduces.foreach { r =>
      require(mapTargets.contains(r.source),
        s"reduce target '${r.target}' source '${r.source}' is not a map target")
    }
    // no map may read from a reduce target (keeps the DAG two-layer like the reference)
    maps.foreach { m =>
      require(!rTargets.contains(m.source),
        s"map target '${m.target}' may not source from reduce target '${m.source}'")
    }
    require(maps.forall(_.version > 0) && reduces.forall(_.version > 0), "versions must be positive")
  }
}

/** The reference's `item` / `value` map-handler helpers (func.py:50-60)
  * re-expressed as projections. */
object MapFns {
  import MrSchema._

  /** item(key[, value]): project two fields into a (key, value) pair. */
  def item(key: String, value: Option[String] = None, idCol: String = "id")(df: DataFrame): DataFrame = {
    val v = value.map(f => col(f)).getOrElse(lit(null))
    df.select(col(key).as(Key), v.as(Value), col(idCol))
  }

  /** value(field): the reduce pre-map projection helper. */
  def value(field: String): Column => Column = _ => col(field)
}
