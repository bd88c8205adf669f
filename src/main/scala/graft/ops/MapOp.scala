package graft.ops

import graft.core.{MapSpec, MrSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5 — the map operator: per source record emit 0..n `(key, value)` rows
  * tagged with provenance (reference `_process_map`, processor.py:99-158).
  *
  * Spark-first: the handler is a declarative transform, so the whole map
  * phase is one narrow projection/flatMap stage — no shuffle, fully
  * codegen'd, and column pruning reaches the parquet scan. Provenance
  * columns are appended here so every handler stays a pure projection.
  */
object MapOp {
  import MrSchema._

  /** Run a map spec over a full source snapshot (batch / resync path A16). */
  def apply(spec: MapSpec, source: DataFrame): DataFrame = {
    val mapped = spec.fn(source)
    require(mapped.columns.contains(Key), s"map fn for '${spec.target}' must emit $Key")
    require(mapped.columns.contains(spec.idCol),
      s"map fn for '${spec.target}' must retain id column '${spec.idCol}' for provenance")
    val withValue =
      if (mapped.columns.contains(Value)) mapped
      else mapped.withColumn(Value, lit(null))
    withValue
      .withColumn(Key, col(Key).cast("string")) // keys are heterogeneous scalars: stringify (§1.2)
      .withColumn(SourceId, col(spec.idCol).cast("string"))
      .withColumn(SourceType, lit(spec.source))
      .withColumn(Version, lit(spec.version))
      .withColumn(Deleted, lit(false))
      .drop(spec.idCol)
  }
}
