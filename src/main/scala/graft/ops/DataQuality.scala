package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint validation — the admission gate a pipeline
  * runs before deriving anything from a new drop of data (completeness,
  * uniqueness, domain membership, cross-column consistency, referential
  * integrity), in the spirit of declarative-expectation frameworks.
  *
  * Spark-first shape: every single-table constraint is an AGGREGATE
  * EXPRESSION, so the whole suite evaluates in ONE pass over the table —
  * one job, one partial-aggregated single-row result, no per-constraint
  * scans (N constraints cost the same scan as one). The row then pivots
  * to tidy (constraint, metric, pass) rows driver-free via a literal
  * struct array + explode. Referential checks are LEFT ANTI join counts —
  * equi-joins Catalyst plans as broadcast or shuffled hash per side
  * sizes; orphans aggregate map-side to a count, never collected.
  *
  * All metrics are exact integer counts published as doubles, so every
  * result row is hash-checkable against an external SQL oracle.
  *
  * Reference scope: qvarn-mr's only validation is config-DAG shape
  * (validation.py:6-94 — covered by A21/core.Specs); data-level
  * expectations are extension surface.
  */
object DataQuality {

  /** One constraint: an aggregate metric and the pass predicate over the
    * aggregated value. */
  final case class Constraint(name: String, metric: Column,
                              passIf: Column => Column)

  /** Count of rows where `cond` holds — the violations-count shape most
    * constraints reduce to. */
  def violations(cond: Column): Column =
    coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))

  /** Evaluate all constraints in one aggregate pass:
    * (constraint, metric: double, pass: 0/1). */
  def validate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty)
    val aggs = constraints.map(c => c.metric.as("m_" + c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = constraints.map { c =>
      struct(lit(c.name).as("constraint"),
        col("m_" + c.name).cast("double").as("metric"),
        c.passIf(col("m_" + c.name)).cast("long").as("pass"))
    }
    row.select(explode(array(stacked: _*)).as("__r")).select(col("__r.*"))
  }

  /** The standard single-table suite for the documents corpus. */
  def documentsSuite(docs: DataFrame): DataFrame = validate(docs, Seq(
    Constraint("row_count", count(lit(1)), _ > 0),
    Constraint("doc_id_nulls", violations(col("doc_id").isNull), _ === 0),
    Constraint("doc_id_dups",
      count(lit(1)) - countDistinct(col("doc_id")), _ === 0),
    Constraint("text_empty",
      violations(col("text").isNull || col("text") === ""), _ === 0),
    Constraint("n_chars_mismatch",
      violations(col("n_chars") =!= length(col("text"))), _ === 0),
    Constraint("lang_invalid",
      violations(!col("lang").isin("en", "zh", "fr", "es", "de")), _ === 0),
    Constraint("n_chars_negative", violations(col("n_chars") < 0), _ === 0)))

  /** Orphan count of a foreign-key edge: child rows whose `childKey` has
    * no match in `parent.parentKey` (null keys count as orphans — a null
    * FK fails referential integrity here). */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("orphans"))

  /** Referential-integrity suite over a set of FK edges:
    * (relation, orphans: double, pass: 0/1). */
  def referentialSuite(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    edges.map { case (name, child, ck, parent, pk) =>
      orphans(child, ck, parent, pk)
        .select(lit(name).as("relation"),
          col("orphans").cast("double").as("orphans"),
          (col("orphans") === 0).cast("long").as("pass"))
    }.reduce(_.unionByName(_))

  /** k-anonymity audit over a quasi-identifier column set — the
    * release-governance check for datasets carrying person-adjacent
    * attributes: every row whose quasi-identifier combination is shared
    * by fewer than k rows is re-identifiable at that granularity. One
    * groupBy (map-side combined) + one control-sized aggregate:
    * (k, n_groups, n_violating_groups, rows_at_risk, min_group_size) —
    * the summary a release gate consumes. Scales as a single shuffle on
    * the quasi-identifier key at any corpus size. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty && k >= 1, "need quasi-identifiers and k >= 1")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        lit(k).as("k"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_at_risk"),
        min(col("__n")).as("min_group_size"))
  }
}
