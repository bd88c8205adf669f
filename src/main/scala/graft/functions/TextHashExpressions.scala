package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the text-dedup hot loops.
  *
  * The composed `aggregate`/`zip_with`/`transform` higher-order functions
  * these replace are evaluated interpreted — one lambda dispatch plus an
  * intermediate array allocation per element step. For MinHash that is
  * O(shingles × k) boxed steps and O(shingles) k-wide array copies per
  * document; for SimHash O(tokens) 64-wide copies; for Jaccard a fresh
  * hash set per candidate pair side. At bench scale the allocation storm
  * additionally taxes every query scheduled after these with GC debt.
  *
  * Each kernel is bit-identical to its HOF formulation (asserted in
  * DedupSimSpec): the hash is Spark's own xxhash64 chain via
  * [[XxHash64Function]], fold order is element order, and set semantics
  * match `array_intersect`/`array_union` on distinct inputs. Codegen
  * delegates to the same eval helpers, keeping the surrounding stage in
  * whole-stage codegen with one virtual call per row.
  */
object TextHashKernels {

  /** k MinHash values: out[j] = min over shingles s of
    * xxhash64(s, j) — the exact chain of `xxhash64(s: string, j: int)`. */
  def minhash(sh: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h1 = XxHash64Function.hash(sh.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < k) {
        val h = XxHash64Function.hash(j, IntegerType, h1)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** dHash-style perceptual fingerprint over raw bytes: `buckets`
    * contiguous ranges, bit b = bucket b's mean > bucket b+1's mean
    * (cross-multiplied integer sums — no division). Bit-identical to the
    * composed expression form
    * ([[graft.multimodal.Multimodal.perceptualHashHof]]); bucket bounds
    * are n·b/buckets with integer truncation, matching both the HOF form
    * (exact power-of-two double division) and the DuckDB oracle's `//`. */
  def phash(blob: Array[Byte], buckets: Int): Long = {
    val n = blob.length
    val sums = new Array[Long](buckets)
    val cnts = new Array[Long](buckets)
    var b = 0
    while (b < buckets) {
      val lo = (n.toLong * b / buckets).toInt
      val hi = (n.toLong * (b + 1) / buckets).toInt
      var i = lo
      var s = 0L
      while (i < hi) { s += (blob(i) & 0xff); i += 1 }
      sums(b) = s
      cnts(b) = hi - lo
      b += 1
    }
    var h = 0L
    var i = 0
    while (i < buckets - 1) {
      if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i)) h |= 1L << i
      i += 1
    }
    h
  }

  /** Per-window energy of a 16-bit signed little-endian PCM blob: sum of
    * v² over each `window`-sample window (last window partial; a trailing
    * odd byte is ignored). One pass, integer-exact: |v| ≤ 32768 keeps a
    * 1024-sample window's energy < 1.1e12 — BIGINT everywhere. */
  def audioEnergy(blob: Array[Byte], window: Int): ArrayData = {
    val ns = blob.length / 2
    val nw = (ns + window - 1) / window
    val out = new Array[Long](nw)
    var i = 0
    while (i < ns) {
      val v = (blob(2 * i + 1) << 8) | (blob(2 * i) & 0xff) // signed hi byte
      out(i / window) += v.toLong * v
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-window zero-crossing counts of the same PCM stream: window w
    * counts samples i > 0 inside it whose negativity differs from sample
    * i−1's (the VAD/silence-trim primitive next to [[audioEnergy]]). */
  def audioZeroCrossings(blob: Array[Byte], window: Int): ArrayData = {
    val ns = blob.length / 2
    val nw = (ns + window - 1) / window
    val out = new Array[Long](nw)
    var prevNeg = false
    var i = 0
    while (i < ns) {
      val v = (blob(2 * i + 1) << 8) | (blob(2 * i) & 0xff)
      val neg = v < 0
      if (i > 0 && neg != prevNeg) out(i / window) += 1
      prevNeg = neg
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash: majority vote per bit over token hashes. */
  def simhash(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit SimHash with md5-derived token bits — the cross-engine-
    * reproducible variant ([[graft.dedup.DocDedup.simhashMd5]]'s HOF form
    * computes the same value; nibble-indexed bit j of the hex equals bit
    * (7 - j%8) of digest byte j/8, read MSB-first). Strict-majority vote. */
  def simhashMd5(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = md5Local.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 64) {
        if (((d(j >> 3) >> (7 - (j & 7))) & 1) != 0) votes(j) += 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      sig = (sig << 1) | (if (votes(j) * 2 > n) 1L else 0L)
      j += 1
    }
    sig
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** Chained md5 fingerprint: acc := md5hex(acc + "|" + token), folded over
    * the tokens from `seed` — order-sensitive (a shift-resistant document
    * signature) and reproducible in any engine with md5 + a list fold.
    * Exactly the chain of `aggregate(toks, seed, (a, t) => md5(a || '|'
    * || t))` with lowercase-hex intermediate states. */
  def rollingMd5(toks: ArrayData, seed: UTF8String): UTF8String = {
    val md = md5Local.get()
    var acc = seed.getBytes
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(acc)
      md.update('|'.toByte)
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexDigits((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = hexDigits(d(j) & 0xf)
        j += 1
      }
      acc = hex
      i += 1
    }
    UTF8String.fromBytes(acc)
  }

  /** Random-hyperplane LSH bucket id: bit i of the result is the sign of
    * h_i · v with h_i[j] = (xxhash64(seed+i, j) % 1001) / 1000.0 — the
    * exact chain (and summation order) of the composed
    * `aggregate(zip_with(v, sequence(0, dim-1), ...))` formulation,
    * INCLUDING ragged vectors: `zip_with` null-pads the shorter side, so a
    * vector shorter than `dim` makes every projection null → all bits 0
    * (bucket 0), and elements beyond `dim` get the hash-of-null coefficient
    * (xxhash64 of a null index returns the seed unchanged → (h1 % 1001)
    * / 1000). */
  def lshBucket(vec: ArrayData, dim: Int, nBits: Int, seed: Int, isFloat: Boolean): Long = {
    val len = vec.numElements()
    if (len < dim) return 0L // HOF: null-padded element ⇒ proj null ⇒ bit 0 ∀i
    var bucket = 0L
    var i = 0
    while (i < nBits) {
      val h1 = XxHash64Function.hash(seed + i, IntegerType, 42L)
      val cPad = (h1 % 1001L).toDouble / 1000.0 // coefficient of a null index
      var proj = 0.0
      var j = 0
      while (j < len) {
        val c =
          if (j < dim) (XxHash64Function.hash(j, IntegerType, h1) % 1001L).toDouble / 1000.0
          else cPad
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        proj += x * c
        j += 1
      }
      if (proj > 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  /** Jaccard similarity of two string arrays as distinct sets —
    * |A∩B| / |A∪B|, 0.0 when both empty (matches
    * `size(array_intersect)/size(array_union)` on any inputs). */
  /** NFC normalization; returns the INPUT object when already normalized
    * (the overwhelmingly common case) so the hot path allocates nothing. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (setB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val uni = setA.size + setB.size - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }
}

/** `graft_minhash(shingles, k)` → array<bigint>. `k` must be foldable. */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      // a foldable NULL int literal passes the type check but would silently
      // become k=0 (empty signatures); reject it here where analysis reports
      // errors instead of at eval time
      right.eval(null) match {
        case i: java.lang.Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "graft_minhash k must be a non-null positive int literal")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash requires (array<string>, foldable int)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val k: Int = right.eval(null).asInstanceOf[Int]
  override def nullSafeEval(sh: Any, unused: Any): Any =
    TextHashKernels.minhash(sh.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, _) => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernels.minhash($sh, $k);"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
  override def prettyName: String = "graft_minhash"
}

/** `graft_simhash(tokens)` → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(toks: Any): Any =
    TextHashKernels.simhash(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.simhash($toks)"
    })
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "graft_simhash"
}

/** `graft_simhash_md5(tokens)` → bigint (md5-derived token bits). */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(toks: Any): Any =
    TextHashKernels.simhashMd5(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.simhashMd5($toks)"
    })
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
  override def prettyName: String = "graft_simhash_md5"
}

/** `graft_phash(blob, buckets)` → bigint: dHash-style bucket-gradient
  * fingerprint over raw bytes ([[TextHashKernels.phash]]). `buckets` must
  * be a foldable int in 2..33 (hash width = buckets−1 bits). */
case class PerceptualHash64(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) if right.foldable =>
      right.eval(null) match {
        case b: java.lang.Integer if b >= 2 && b <= 33 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_phash buckets must be an int literal in 2..33, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_phash requires (binary, foldable int)")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(blob: Any, b: Any): Any =
    TextHashKernels.phash(blob.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (blob, b) => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.phash($blob, $b)"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PerceptualHash64 =
    copy(left = l, right = r)
  override def prettyName: String = "graft_phash"
}

/** Shared shape of the two audio-window kernels: (binary, foldable int
  * window ≥ 1) → array<bigint>, one element per `window`-sample window of
  * the blob read as 16-bit signed little-endian PCM. */
abstract class AudioWindowExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) if right.foldable =>
      right.eval(null) match {
        case w: java.lang.Integer if w >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName window must be an int literal >= 1, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, foldable int)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def kernelName: String
  override def nullSafeEval(blob: Any, w: Any): Any = {
    val b = blob.asInstanceOf[Array[Byte]]
    val win = w.asInstanceOf[Int]
    if (kernelName == "audioEnergy") TextHashKernels.audioEnergy(b, win)
    else TextHashKernels.audioZeroCrossings(b, win)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (blob, w) => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.$kernelName($blob, $w)"
    })
}

/** `graft_audio_energy(blob, window)` → array<bigint>: per-window PCM
  * sum-of-squares (see [[TextHashKernels.audioEnergy]]). */
case class AudioEnergy(left: Expression, right: Expression) extends AudioWindowExpr {
  protected def kernelName: String = "audioEnergy"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AudioEnergy =
    copy(left = l, right = r)
  override def prettyName: String = "graft_audio_energy"
}

/** `graft_audio_zc(blob, window)` → array<bigint>: per-window PCM
  * zero-crossing counts. */
case class AudioZeroCrossings(left: Expression, right: Expression) extends AudioWindowExpr {
  protected def kernelName: String = "audioZeroCrossings"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AudioZeroCrossings =
    copy(left = l, right = r)
  override def prettyName: String = "graft_audio_zc"
}

/** `graft_rollingmd5(tokens, seed)` → string. `seed` must be foldable. */
case class RollingMd5(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) if right.foldable =>
      right.eval(null) match {
        case s: UTF8String if s != null => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "graft_rollingmd5 seed must be a non-null string literal")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_rollingmd5 requires (array<string>, foldable string)")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(toks: Any, seed: Any): Any =
    TextHashKernels.rollingMd5(toks.asInstanceOf[ArrayData], seed.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (toks, seed) => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.rollingMd5($toks, $seed)"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RollingMd5 =
    copy(left = l, right = r)
  override def prettyName: String = "graft_rollingmd5"
}

/** `graft_lshbucket(vec, dim, nBits, seed)` → bigint. The three int
  * parameters must be literals (resolved at registry-build time). */
case class LshBucketExpr(child: Expression, dim: Int, nBits: Int, seed: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lshbucket requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(vec: Any): Any =
    TextHashKernels.lshBucket(vec.asInstanceOf[ArrayData], dim, nBits, seed, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, vec => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.lshBucket($vec, $dim, $nBits, $seed, $isFloat)"
    })
  override protected def withNewChildInternal(c: Expression): LshBucketExpr = copy(child = c)
  override def prettyName: String = "graft_lshbucket"
}

/** `graft_nfc(s)` → string: NFC Unicode normalization.
  *
  * Curation pipelines canonicalize text before hashing/dedup so that
  * composed ("é") and decomposed ("e" + U+0301) spellings of the same
  * content fingerprint identically. Spark has no normalization builtin; a
  * Scala UDF would box every row, so this is a codegen expression whose
  * kernel fast-paths the common case (already-NFC text returns the input
  * UTF8String untouched — one linear `isNormalized` scan, no allocation).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextHashKernels.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.nfc($s)"
    })
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "graft_nfc"
}

/** `graft_jaccard(a, b)` → double. */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_jaccard requires two array<string> inputs")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => {
      val kernels = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$kernels.jaccard($a, $b)"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "graft_jaccard"
}
