package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-on-read extraction of JSON sidecar columns — real corpora carry
  * per-record metadata as JSON strings (crawl headers, provenance tags,
  * event properties), and the pipeline projects them into typed columns
  * before any relational work.
  *
  * `from_json` with an explicit DDL schema is the idiomatic Spark form: a
  * codegen'd narrow projection (no UDF), null on malformed input (PERMISSIVE
  * mode), and Catalyst prunes the extraction to the fields actually
  * referenced downstream. Keep the schema explicit — schema inference over
  * a 100 TB corpus is a full extra scan.
  *
  * Reference scope: the reference stores whole resources as JSON and lets
  * handlers pick fields out in Python (func.py:50-60); here the same
  * projection is declarative and stays inside whole-stage codegen.
  */
object SemiStructured {

  /** Parse `jsonCol` against `ddl` (e.g. `"k INT, tag STRING"`) into a
    * struct column named `as`. Malformed rows parse to null fields. */
  def parseJson(df: DataFrame, jsonCol: String, ddl: String,
                as: String = "props"): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), org.apache.spark.sql.types.StructType.fromDDL(ddl)))

  /** One extracted field as a column, for inline use. */
  def jsonField(jsonCol: Column, ddl: String, field: String): Column =
    from_json(jsonCol, org.apache.spark.sql.types.StructType.fromDDL(ddl)).getField(field)
}
