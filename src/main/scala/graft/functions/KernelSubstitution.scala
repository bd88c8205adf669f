package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule substituting graft's native codegen kernels for their
  * declarative built-in forms — the (c) tier of the build brief's preference
  * order, completing the kernel story: users (and graft's own portable
  * fallbacks) write plain `functions._` algebra, the optimizer swaps in the
  * fused loop. Two rewrites, both proven value-identical in
  * KernelSubstitutionSpec (including null arrays, null elements, empties,
  * and ragged lengths):
  *
  * 1. dot-product fold → [[VectorDot]]:
  *    {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, e) => acc + e) }}}
  *    becomes `if (size(a) = size(b)) graft_dot(a, b) else null`. The guard
  *    reproduces the fold's null-off-the-zip-padding on ragged pairs;
  *    [[VectorDot]] itself propagates element nulls exactly like the fold.
  *
  * 2. set-Jaccard → [[JaccardSim]]:
  *    {{{ when(size(array_union(a, b)) = 0, 0.0).otherwise(
  *          size(array_intersect(a, b)) / size(array_union(a, b))) }}}
  *    becomes `graft_jaccard(a, b)` — the kernel's single-pass HashSet walk
  *    has the same dedup and null-element semantics as the
  *    intersect/union pair (a null element is one set member, SQL-style).
  *
  * Why a Rule and not "just call the kernel": the declarative forms are what
  * a user of plain Spark writes, what survives view definitions and SQL
  * round-trips, and what graft's own code keeps as the portable reference
  * semantics ([[graft.sim.Similarity.dotHof]],
  * [[graft.dedup.DocDedup.jaccardSetsHof]]). At 100 TB the interpreted
  * higher-order fold is a per-element lambda eval + boxing on the hottest
  * pair loops; this rule makes the fast path automatic instead of a calling
  * convention.
  *
  * Injected session-wide by [[GraftExtensions]] (the
  * `spark.sql.extensions` path) and by [[GraftFunctions.register]] (the
  * runtime path, via `spark.experimental.extraOptimizations`).
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def isStrArr(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  // the dot rewrite references each array child TWICE (the size guard and
  // the kernel); only fire when re-evaluating the child is free — an
  // attribute or a literal — so the rewrite can never regress an
  // expensive derivation the fold evaluated once
  private def isCheap(e: Expression): Boolean =
    e.isInstanceOf[Attribute] || e.foldable

  /** The element-to-double upcast the fold writes explicitly; SimplifyCasts
    * may already have dropped the identity cast on double arrays. */
  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case _ => e
  }

  private def isLambdaPair(l: Expression, r: Expression,
                           x: NamedLambdaVariable, y: NamedLambdaVariable,
                           commutes: Boolean): Boolean = {
    def is(e: Expression, v: NamedLambdaVariable) = e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }
    (is(l, x) && is(r, y)) || (commutes && is(l, y) && is(r, x))
  }

  // bitwise +0.0 only: a -0.0 zero would surface as -0.0 on empty folds
  private def foldsToZeroDouble(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && (e.eval(null) match {
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
      case _ => false
    })

  // integer-or-double zero: UnwrapCastInBinaryComparison turns
  // `cast(size(u) as double) = 0.0` into `size(u) = 0`, so the guard's
  // zero may surface in either type by the time this rule runs
  private def foldsToZero(e: Expression): Boolean =
    e.foldable && (e.eval(null) match {
      case null => false
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
      case n: java.lang.Number => n.longValue == 0L
      case _ => false
    })

  /** `size(f(a, b))` with modern (null → null) size semantics, optionally
    * behind a numeric cast (the comparison's cast may have been unwrapped,
    * the division's cast to double is still there). */
  private object SizeOfArr {
    def unapply(e: Expression): Option[Expression] = stripDoubleCast(e) match {
      case Size(child, false) => Some(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // --- 1. aggregate(zip_with(a, b, _ * _), 0.0, _ + _) → graft_dot ---
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
      if isVec(a.dataType) && isVec(b.dataType) &&
        a.deterministic && b.deterministic &&
        isCheap(a) && isCheap(b) &&
        foldsToZeroDouble(zero) &&
        isLambdaPair(stripDoubleCast(ml), stripDoubleCast(mr), x, y, commutes = true) &&
        isLambdaPair(al, ar, acc, el, commutes = true) &&
        fin.exprId == finArg.exprId =>
      If(EqualTo(Size(a, legacySizeOfNull = false), Size(b, legacySizeOfNull = false)),
        VectorDot(a, b), Literal(null, DoubleType))

    // --- 2. when(size(union) = 0, 0.0).otherwise(size(inter)/size(union)) → graft_jaccard ---
    case CaseWhen(
        Seq((EqualTo(SizeOfArr(u1: ArrayUnion), z), zeroBranch)),
        Some(Divide(SizeOfArr(i1: ArrayIntersect), SizeOfArr(u2: ArrayUnion), _)))
      if isStrArr(u1.left.dataType) && isStrArr(u1.right.dataType) &&
        u1.left.deterministic && u1.right.deterministic &&
        foldsToZero(z) && foldsToZeroDouble(zeroBranch) &&
        u2.semanticEquals(u1) &&
        ((i1.left.semanticEquals(u1.left) && i1.right.semanticEquals(u1.right)) ||
          (i1.left.semanticEquals(u1.right) && i1.right.semanticEquals(u1.left))) =>
      JaccardSim(u1.left, u1.right)
  }
}
