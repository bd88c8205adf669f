package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns, accumulated in double
  * in element order (bit-identical to the equivalent
  * `aggregate(zip_with(...))` fold, so results are stable against oracles).
  *
  * Why a custom Catalyst expression (the (b) tier of the build brief's
  * preference order): `zip_with`/`aggregate` higher-order functions are
  * interpreted per element — a lambda eval and boxing per component. For
  * ANN/near-dup scans doing millions of pairs × 64-1024 dims, this is the
  * hot loop; `doGenCode` emits a tight primitive `for` over the two
  * `ArrayData`, keeping the whole pair stage inside whole-stage codegen.
  * Measured ~5× on the sf0.1 embedding pair scan.
  *
  * Null semantics: a null ELEMENT poisons the result to null — exactly the
  * `aggregate(zip_with(...))` fold's behavior (`x * null` then `acc + null`
  * stay null), which is what lets [[KernelSubstitution]] substitute this
  * kernel for the fold. The check compiles away entirely when the array
  * types carry `containsNull = false`. Unequal lengths use the min length
  * (the fold instead yields null off the zip's null padding — the
  * substitution rule guards that case with a length-equality branch).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual check — ExpectsInputTypes/AbstractDataType are private[sql] in 4.x
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean =
    super.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    val checkNulls = elemNullable(left) || elemNullable(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: `cosine` puts THREE dots in one generated
      // function (dot + two norms); fixed names collide ("Redefinition of
      // local variable") and janino silently drops the whole projection to
      // interpreted mode.
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // the element-null check is emitted only when the schema says nulls
      // can exist — rectangular non-null vectors keep the tight two-op loop
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $nullCheck $s += $getA * $getB; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Registration for the graft kernels: either inject at session build time
  * via `.withExtensions(GraftExtensions)` / the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf, or call
  * [[GraftFunctions.register]] on an existing session (idempotent). Both
  * paths install the functions AND the [[KernelSubstitution]] optimizer
  * rule (built-in declarative forms rewritten to the fused kernels). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => KernelSubstitution)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  private def descriptor(
      name: String, clazz: Class[_], arity: Int,
      build: Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == arity, s"$name takes exactly $arity arguments")
      build(children)
    })

  private[graft] val descriptors = Seq(
    descriptor("graft_dot", classOf[VectorDot], 2, c => VectorDot(c(0), c(1))),
    descriptor("graft_minhash", classOf[MinHashSig], 2, c => MinHashSig(c(0), c(1))),
    descriptor("graft_simhash", classOf[SimHash64], 1, c => SimHash64(c(0))),
    descriptor("graft_simhash_md5", classOf[SimHashMd5], 1, c => SimHashMd5(c(0))),
    descriptor("graft_rollingmd5", classOf[RollingMd5], 2, c => RollingMd5(c(0), c(1))),
    descriptor("graft_jaccard", classOf[JaccardSim], 2, c => JaccardSim(c(0), c(1))),
    descriptor("graft_nfc", classOf[NfcNormalize], 1, c => NfcNormalize(c(0))),
    descriptor("graft_phash", classOf[PerceptualHash64], 2,
      c => PerceptualHash64(c(0), c(1))),
    descriptor("graft_audio_energy", classOf[AudioEnergy], 2,
      c => AudioEnergy(c(0), c(1))),
    descriptor("graft_audio_zc", classOf[AudioZeroCrossings], 2,
      c => AudioZeroCrossings(c(0), c(1))),
    descriptor("graft_lshbucket", classOf[LshBucketExpr], 4, c => {
      def asInt(e: Expression, what: String): Int = e match {
        case lit if lit.foldable => lit.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(s"$what must be int, got $other")
        }
        case _ => throw new IllegalArgumentException(s"$what must be a literal")
      }
      LshBucketExpr(c(0), asInt(c(1), "dim"), asInt(c(2), "nBits"), asInt(c(3), "seed"))
    }))

  /** Idempotent runtime registration on an existing session: the functions
    * plus the [[KernelSubstitution]] rewrite (appended through
    * `experimental.extraOptimizations`, the runtime twin of
    * `injectOptimizerRule`). */
  def register(spark: SparkSession): Unit = synchronized {
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    // synchronized: the read-modify-write would otherwise race a
    // concurrent appender and drop its rule
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(KernelSubstitution))
      spark.experimental.extraOptimizations = extra :+ KernelSubstitution
  }
}
