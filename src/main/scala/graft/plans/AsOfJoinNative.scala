package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** The backward as-of join as a WHOLE custom operator — the (c) tier of the
  * build brief's preference order in full: a logical node
  * ([[AsOfJoinNode]]), a planner strategy ([[AsOfJoinStrategy]]), and a
  * physical merge operator ([[AsOfJoinExec]]), registered through
  * `SparkSessionExtensions.injectPlannerStrategy` /
  * `spark.experimental.extraStrategies`.
  *
  * Why a physical operator when the union+window form
  * ([[graft.ops.AsOfJoin]]) already avoids the range-join explosion: the
  * window form pays for generality —
  *
  *   - the union shuffles BOTH sides through one exchange with each row
  *     padded to the union schema (a null struct of the other side's
  *     columns on every row);
  *   - the window operator buffers each key's frame through
  *     UnsafeExternalSorter machinery to evaluate `last(...) over (...)`.
  *
  * The merge exec instead shuffles each side with only its own columns,
  *     sorts each side by (key, ts) — both sorts smaller than the union's
  *     one — and then streams the two sorted iterators with O(1) state:
  *     the single candidate right row per key. Same O(|L|+|R|) work, no
  *     window buffer, no padding; at 100 TB the exchanged bytes drop by
  *     the null-struct overhead and the sort spill halves.
  *
  * Measured trade (sf0.1, local[32], warm): the merge exec runs ~0.45 s vs
  * the window form's ~0.25 s — at micro scale the SECOND shuffle stage's
  * fixed scheduling latency outweighs everything else. The crossover is
  * where sort/shuffle volume dominates stage count: wide payloads (the
  * union pads every row with a null struct of the other side's columns)
  * and spilling sorts. Both forms ship; `events_asof`/`events_asof_native`
  * pin them to the same DuckDB ASOF oracle.
  *
  * Semantics (pinned to the union+window form by AsOfJoinNativeSpec, and
  * to DuckDB's native `ASOF LEFT JOIN` by the `events_asof_native` oracle):
  * for each left row, the right row with equal key and the greatest
  * `rightTs <= leftTs`; ties on rightTs resolved by the greatest
  * `tieBreak`; optional tolerance nulls out matches older than
  * `leftTs - tolerance`. Right rows with null key or ts can never match
  * and are dropped; left rows with null key or ts emit unmatched — the
  * SQL-equality semantics DuckDB's ASOF `ON l.k = r.k` has. (The
  * union+window form DIVERGES there: `partitionBy` groups nulls as one
  * key, so a null-key left row would pick up a null-key right payload.
  * No graft corpus has null keys; on such data prefer this operator or
  * pre-filter.)
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightTie: Option[Attribute],
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] onto [[AsOfJoinExec]]; inert on every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie, tol) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of: children hash-clustered on their keys (the planner
  * co-partitions them exactly as it does a sort-merge join) and sorted by
  * (key, ts[, tie]); one forward pass zips the two iterators with a single
  * retained candidate row. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightTie: Option[Attribute],
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTie.map(t => SortOrder(t, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // attributes resolve to plain ordinals — the hot loop reads primitives
    // straight off the UnsafeRows instead of boxing through eval()
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(Seq(lKeyIdx, lTsIdx, rKeyIdx, rTsIdx).forall(_ >= 0),
      "as-of key/ts must be direct child output attributes")
    require(leftTs.dataType == LongType && rightTs.dataType == LongType,
      "as-of timestamps must be long (the wrapper casts them)")
    // the right key is read through the LEFT key's accessor and the two
    // sides must co-hash: mismatched key types would silently mis-read
    // and mis-partition (the wrapper aligns them)
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
    val longKeys = leftKey.dataType == LongType && rightKey.dataType == LongType
    val keyOrd =
      if (longKeys) null else TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val keyDt = leftKey.dataType
    val nRight = right.output.size
    val tolGate = tolerance.getOrElse(Long.MaxValue)
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rightNulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(
        outAttrs: Seq[Expression],
        leftAttrs ++ rightAttrs.map(_.withNullability(true)))
      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKeyL: Long = 0L
        private var rKeyA: Any = _
        private var rTs: Long = 0L
        private var rValid = false
        private var cand: InternalRow = _ // a .copy() — iterator rows are reused
        private var candKeyL: Long = 0L
        private var candKeyA: Any = _
        private var candTs = 0L
        private var hasCand = false

        private def fetchRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTsIdx)) {
              rRow = r
              if (longKeys) rKeyL = r.getLong(rKeyIdx)
              else rKeyA = r.get(rKeyIdx, keyDt)
              rTs = r.getLong(rTsIdx)
              rValid = true
            } // a null-key/ts right row matches nothing: skip
          }
        }
        fetchRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          numOutputRows += 1
          val l = lIter.next()
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx))
            return resultProj(joined(l, rightNulls))
          val lts = l.getLong(lTsIdx)
          val lkL = if (longKeys) l.getLong(lKeyIdx) else 0L
          val lkA = if (longKeys) null else l.get(lKeyIdx, keyDt)
          @inline def cmpR: Int =
            if (longKeys) java.lang.Long.compare(rKeyL, lkL)
            else keyOrd.compare(rKeyA, lkA)
          // consume right rows ordered before (lk, lts]: rows of earlier
          // keys can never match a later left row (left keys ascend), and
          // each same-key row with ts <= lts supersedes the candidate
          var advancing = true
          while (advancing && rValid) {
            val c = cmpR
            if (c < 0) fetchRight()
            else if (c == 0 && rTs <= lts) {
              cand = rRow.copy()
              // the key is re-read from the COPY: rKeyA is a live view into
              // the sorter's reused record buffer (e.g. a UTF8String over
              // a spill reader's array) and the next fetch overwrites it
              candKeyL = rKeyL
              candKeyA = if (longKeys) null else cand.get(rKeyIdx, keyDt)
              candTs = rTs; hasCand = true
              fetchRight()
            } else advancing = false
          }
          // hasCand first: candKeyA is null until a candidate exists and
          // the interpreted ordering NPEs on null. Tolerance compares with
          // overflow protection: absurd timestamp spans must read as
          // "older than any tolerance", not wrap negative and match
          val matched = hasCand &&
            (if (longKeys) candKeyL == lkL
             else keyOrd.compare(candKeyA, lkA) == 0) &&
            (tolGate == Long.MaxValue ||
              (try Math.subtractExact(lts, candTs) <= tolGate
               catch { case _: ArithmeticException => false }))
          resultProj(joined(l, if (matched) cand else rightNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public wrapper with the same signature and output shape as the
  * algebraic [[graft.ops.AsOfJoin.asOf]]. */
object AsOfJoinNative {

  /** Idempotent runtime registration (the `extraStrategies` twin of
    * `GraftExtensions`' `injectPlannerStrategy`). Synchronized: the
    * read-modify-write would otherwise race a concurrent appender and
    * drop its strategy. */
  def register(spark: SparkSession): Unit = synchronized {
    val extra = spark.experimental.extraStrategies
    if (!extra.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = extra :+ AsOfJoinStrategy
  }

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String],
           tolerance: Option[Long] = None,
           tieBreak: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val leftCols = left.columns.toSeq
    val reserved = Seq("asof_ts", "__lts", "__rk", "__rts")
    require(reserved.forall(r => !leftCols.contains(r)),
      s"left must not already have ${reserved.mkString("/")}")
    require((payload ++ tieBreak).forall(p =>
        !leftCols.contains(p) && !reserved.contains(p)),
      "payload/tieBreak names must not collide with left columns or " +
        "asof_ts/__lts/__rk/__rts — alias the right side first")
    // normalized inputs: key renamed on the right (no name ambiguity in the
    // joined frame) and CAST to the left key's type (the exec reads it
    // through the left accessor and the sides must co-hash), ts cast to
    // long on both sides like the algebraic form
    val lNorm = left.withColumn("__lts", col(leftTs).cast("long"))
    val lKeyType = left.schema(key).dataType
    val rightCols = (payload ++ tieBreak.filterNot(payload.contains)).map(col)
    val rNorm = right.select(col(key).cast(lKeyType).as("__rk") +:
      col(rightTs).cast("long").as("__rts") +: rightCols: _*)
    val lp = lNorm.queryExecution.analyzed
    // fresh exprIds on the right: a self-as-of (both sides from one scan)
    // would otherwise put duplicate attribute ids in the node's output
    val rp0 = rNorm.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(sys.error(s"missing column $name"))
    val node = AsOfJoinNode(lp, rp,
      attr(lp.output, key), attr(rp.output, "__rk"),
      attr(lp.output, "__lts"), attr(rp.output, "__rts"),
      tieBreak.map(attr(rp.output, _)), tolerance)
    GraftPlanBridge.ofRows(spark, node)
      .select(leftCols.map(col) ++
        (col("__rts").as("asof_ts") +: payload.map(col)): _*)
  }
}
