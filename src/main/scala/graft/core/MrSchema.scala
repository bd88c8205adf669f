package graft.core

import org.apache.spark.sql.types._

/** Engine-owned columns of derived (map / reduce) tables.
  *
  * Mirrors the reference's derived-row data model (qvarn-mr
  * processor.py:52-96, README.rst:437-513): every map-target row carries a
  * stringified key, an optional scalar value, provenance (source id + type),
  * the producing handler version and a tombstone flag; every reduce-target
  * row carries key, value, version and a newest-wins timestamp.
  *
  * Keys are heterogeneous scalars in the reference (int and string keys both
  * appear in its tests) — we stringify `_mr_key` uniformly so one column type
  * hashes/joins consistently.
  */
object MrSchema {
  val Key = "_mr_key"
  val Value = "_mr_value"
  val SourceId = "_mr_source_id"
  val SourceType = "_mr_source_type"
  val Version = "_mr_version"
  val Deleted = "_mr_deleted"
  val Timestamp = "_mr_timestamp"

  /** Engine columns appended by MapOp, in order. */
  val mapEngineCols: Seq[String] = Seq(Key, Value, SourceId, SourceType, Version, Deleted)

  /** Engine columns of a reduce-target row. */
  val reduceEngineCols: Seq[String] = Seq(Key, Value, Version, Timestamp)

  val mapEngineSchema: StructType = StructType(Seq(
    StructField(Key, StringType, nullable = true),
    StructField(Value, StringType, nullable = true),
    StructField(SourceId, StringType, nullable = false),
    StructField(SourceType, StringType, nullable = false),
    StructField(Version, IntegerType, nullable = false),
    StructField(Deleted, BooleanType, nullable = false)
  ))
}
