package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Interchange formats for the ingest/export axis.
  *
  * The reference speaks JSON documents over HTTP (clients/qvarn.py:44-118);
  * a Spark pipeline's equivalent surface is FILE interchange — line-JSON,
  * CSV and ORC alongside the engine's native parquet. Shapes that matter
  * at 100 TB, encoded here once so every caller inherits them:
  *
  *   - readers take an EXPLICIT DDL schema. Schema inference is a second
  *     full scan of the data before the first real one, and an inferred
  *     schema can drift between shards (a column that is all-null in one
  *     shard infers as string, long in the next);
  *   - writers shard via `repartition(shards)` — shard count is the
  *     caller's lever for downstream read parallelism (text formats split
  *     per file, not per block, once quoting is in play);
  *   - CSV round-trips quote-all on write and multiLine on read, so
  *     embedded separators/newlines survive. multiLine CSV is
  *     NON-SPLITTABLE per file — parallelism comes from the shard count,
  *     which is why the writer takes it explicitly;
  *   - all writers go through Spark's committer: output appears atomically
  *     per job, never per task (a killed export leaves no torn dataset).
  *
  * [[writePartitioned]] is the layout half: hive-style `partitionBy`
  * directories turn equality predicates on the partition column into
  * PLAN-TIME directory pruning (PartitionFilters in the scan — a filter
  * on `event_type` reads 1/5 of the files, verified in FormatsSpec),
  * the coarse complement of [[Layout]]'s file-level z-order stats.
  */
object Formats {

  def writeJsonl(df: DataFrame, dir: String, shards: Int): Unit =
    df.repartition(shards).write.mode(SaveMode.Overwrite).json(dir)

  def readJsonl(spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(dir)

  def writeCsv(df: DataFrame, dir: String, shards: Int): Unit =
    df.repartition(shards).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      // quote everything: the reader then never mis-splits on embedded
      // separators, and escaped quotes round-trip ("" inside a field)
      .option("quoteAll", "true")
      // the CSV WRITER trims cell whitespace by default (both options
      // default true on write, false on read) — silent data mutation;
      // "  x  " must round-trip as "  x  "
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(ddl)
      .option("header", "true")
      .option("multiLine", "true") // embedded newlines stay inside quotes
      .csv(dir)

  def writeOrc(df: DataFrame, dir: String, shards: Int): Unit =
    df.repartition(shards).write.mode(SaveMode.Overwrite).orc(dir)

  def readOrc(spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(ddl).orc(dir)

  /** Hive-style partitioned parquet layout: one directory per distinct
    * value tuple of `cols`. Equality/IN predicates on those columns prune
    * whole directories at plan time. Keep partition columns LOW
    * cardinality (a high-cardinality partition column is a small-files
    * factory — use bucketing or z-order for those). */
  def writePartitioned(df: DataFrame, dir: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
