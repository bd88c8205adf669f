package graft.ops

import graft.core.{CountReduce, ExprReduce, JoinReduce, MrSchema, ReduceSpec, RowReduce, TypedReduce}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A6/A7/A10/A11 — the reduce operator: fold all live map rows of one key
  * into exactly one output row per key (reference `_process_reduce`,
  * processor.py:192-227).
  *
  * Spark-first: one `groupBy(_mr_key)` — the shuffle IS the reference's
  * group-by-key batching (A14, processor.py:373-382), and partial (map-side)
  * aggregation comes free for the expression folds. Empty groups simply
  * produce no row, which is the reference's "delete output row when the
  * group is empty" rule (processor.py:214-217): a group with only
  * tombstoned rows is filtered out *before* the fold.
  */
object ReduceOp {
  import MrSchema._

  /** Batch/resync recompute (A17): reduce a full map-target table. */
  def apply(spec: ReduceSpec, mapRows: DataFrame, timestampNs: Long = 0L): DataFrame = {
    val live = mapRows.filter(!col(Deleted)) // tombstones visible to grouping, excluded from fold (A13)
    val folded = spec.fn match {
      case ExprReduce(agg, premap) =>
        live.groupBy(col(Key)).agg(agg(premap(col(Value))).as(Value))
      case CountReduce =>
        live.groupBy(col(Key)).agg(count(lit(1)).as(Value))
      case TypedReduce(a) =>
        val f = udaf(a.asInstanceOf[Aggregator[Double, Any, Double]], Encoders.scalaDouble)
        live.groupBy(col(Key)).agg(f(col(Value).cast("double")).as(Value))
      case RowReduce(a) =>
        // the fold sees the whole live row (schema-carrying Row) — no value
        // narrowing; its output type becomes the Value column's type. The
        // Row-encoded UDAF takes one argument per table column.
        val f = udaf(a.asInstanceOf[Aggregator[org.apache.spark.sql.Row, Any, Any]],
          Encoders.row(live.schema))
        live.groupBy(col(Key)).agg(f(live.columns.toIndexedSeq.map(col): _*).as(Value))
      case JoinReduce(mapping, orderBy) =>
        // Same-key multi-source merge: for each mapped (sourceType, field),
        // take that field from the winning row of that source type.
        // "Winning" = greatest orderBy value (reference iterates rows and
        // lets the last writer win, func.py:63-71; we make the winner
        // explicit and deterministic).
        val picks = mapping.toSeq.sortBy(_._1).flatMap { case (srcType, fields) =>
          fields.toSeq.sortBy(_._1).map { case (field, out) =>
            max_by(
              when(col(SourceType) === srcType, col(field)),
              when(col(SourceType) === srcType, col(orderBy))
            ).as(out)
          }
        }
        live.groupBy(col(Key)).agg(picks.head, picks.tail: _*)
    }
    folded
      .withColumn(Version, lit(spec.version))
      .withColumn(Timestamp, lit(timestampNs))
  }
}
