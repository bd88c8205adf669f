package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED quality filter, closed form: ordinary least squares fit of a
  * binary quality pseudo-label on cheap per-document features, solved
  * exactly via the normal equations — the "train a classifier on a seed
  * corpus, score everything" step of a curation pipeline (CCNet trains
  * against Wikipedia; FineWeb-Edu against LLM labels), reduced to machinery
  * an oracle can replay bit for bit.
  *
  * Exactness is the whole design: features and labels are integers, so the
  * moment matrix A = Σ x·xᵀ and moment vector b = Σ x·y are exact BIGINT
  * sums, Cramer's rule turns the 3×3 solve into integer determinants
  * (BigInt on the driver, HUGEINT in the DuckDB oracle), and the fitted
  * weights are emitted as nano-units via truncated integer division —
  * identical in both engines (DuckDB `//` truncates toward zero like
  * BigInt `/`; verified, and see the repo's cross-engine notes). No
  * iteration, no ln/exp/sigmoid, no platform-shaped float paths.
  *
  * Scale: training is ONE distributed aggregate over the corpus — nine
  * 64-bit moments with map-side partial aggregation — followed by an O(1)
  * driver solve; scoring is a narrow stateless projection with the three
  * fitted weights inlined as literals (broadcast by value). Both are the
  * plans you would run unchanged at 100 TB. Overflow bound: moments sum
  * x1² ≤ (max tokens/doc)² per row, so BIGINT moments hold to ~10¹⁴ docs
  * of 10³ tokens; the determinant arithmetic is arbitrary-precision BigInt
  * on the driver (the oracle's HUGEINT holds to corpus ~10⁹ rows — far
  * beyond any oracle scale).
  *
  * Features (x0 = intercept):
  *   x1 = whitespace token count            (TextFunctions.tokenCount)
  *   x2 = English stopword-marker hits      (TextFunctions.markerHits)
  *   y  = 1 iff the document's `lang` tag is "en" — the pseudo-label a
  *        pipeline gets from a trusted seed signal.
  */
object Probe {

  /** Fitted weights in nano-units plus the solve's exact determinant. */
  final case class Weights(w0Nano: Long, w1Nano: Long, w2Nano: Long,
                           n: Long, det: BigInt)

  /** The nine exact training moments — the probe's entire training state.
    * Abelian (componentwise integer sums), so the model is MAINTAINABLE:
    * moments(corpus ∪ batch) = moments(corpus) + moments(batch) and
    * deletions subtract — maintained ≡ rebuilt holds exactly, never
    * approximately. At 100 TB the model update for a delta batch touches
    * only the batch. */
  final case class Moments(n: Long, s1: Long, s2: Long, s11: Long, s12: Long,
                           s22: Long, sy: Long, sy1: Long, sy2: Long) {
    def +(o: Moments): Moments = Moments(n + o.n, s1 + o.s1, s2 + o.s2,
      s11 + o.s11, s12 + o.s12, s22 + o.s22, sy + o.sy, sy1 + o.sy1,
      sy2 + o.sy2)
    def -(o: Moments): Moments = Moments(n - o.n, s1 - o.s1, s2 - o.s2,
      s11 - o.s11, s12 - o.s12, s22 - o.s22, sy - o.sy, sy1 - o.sy1,
      sy2 - o.sy2)
  }

  private val Nano = BigInt(1000000000L)

  /** Per-doc integer feature frame: (idCol, x1, x2, y). */
  def features(docs: DataFrame, textCol: String, idCol: String,
               labelCol: String, positive: String): DataFrame =
    docs.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("x1"),
      TextFunctions.markerHits(col(textCol),
        TextFunctions.langMarkers.toMap.apply("en")).cast("long").as("x2"),
      when(col(labelCol) === positive, lit(1L)).otherwise(lit(0L)).as("y"))

  /** One distributed pass: the nine training moments of `docs` (map-side
    * combined; `coalesce` so an empty delta batch folds as the identity). */
  def moments(docs: DataFrame, textCol: String, idCol: String,
              labelCol: String = "lang", positive: String = "en"): Moments = {
    val f = features(docs, textCol, idCol, labelCol, positive)
    val m = f.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("x1")), lit(0L)).as("s1"),
      coalesce(sum(col("x2")), lit(0L)).as("s2"),
      coalesce(sum(col("x1") * col("x1")), lit(0L)).as("s11"),
      coalesce(sum(col("x1") * col("x2")), lit(0L)).as("s12"),
      coalesce(sum(col("x2") * col("x2")), lit(0L)).as("s22"),
      coalesce(sum(col("y")), lit(0L)).as("sy"),
      coalesce(sum(col("y") * col("x1")), lit(0L)).as("sy1"),
      coalesce(sum(col("y") * col("x2")), lit(0L)).as("sy2")).collect()(0)
    Moments(m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3),
      m.getLong(4), m.getLong(5), m.getLong(6), m.getLong(7), m.getLong(8))
  }

  /** Cramer solve from explicit moments (the maintained-model path). */
  def solve(mo: Moments): Weights = {
    val Seq(n, s1, s2, s11, s12, s22, sy, sy1, sy2) =
      Seq(mo.n, mo.s1, mo.s2, mo.s11, mo.s12, mo.s22, mo.sy, mo.sy1, mo.sy2)
        .map(BigInt(_))
    // det of [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] and its three Cramer
    // column replacements by [sy,sy1,sy2] — Sarrus, exact
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    require(det != 0, "degenerate feature moments: constant feature column")
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)
    val det1 = n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    val det2 = n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)
    // truncated division matches DuckDB // exactly (both toward zero)
    Weights((det0 * Nano / det).toLong, (det1 * Nano / det).toLong,
      (det2 * Nano / det).toLong, n.toLong, det)
  }

  /** Train: one moment pass + the exact solve. */
  def fit(docs: DataFrame, textCol: String, idCol: String,
          labelCol: String = "lang", positive: String = "en"): Weights =
    solve(moments(docs, textCol, idCol, labelCol, positive))

  /** One-row weight table: (w0_nano, w1_nano, w2_nano, n). */
  def weightsFrame(spark: SparkSession, w: Weights): DataFrame = {
    import spark.implicits._
    Seq((w.w0Nano, w.w1Nano, w.w2Nano, w.n))
      .toDF("w0_nano", "w1_nano", "w2_nano", "n")
  }

  /** Score every document with fitted weights: pred_nano = w·x exactly
    * (integer products of nano weights and integer features — a stateless
    * codegen'd projection; the model rides the plan as three literals). */
  def score(docs: DataFrame, w: Weights, textCol: String, idCol: String,
            labelCol: String = "lang", positive: String = "en"): DataFrame =
    features(docs, textCol, idCol, labelCol, positive)
      .select(col(idCol),
        (lit(w.w0Nano) + lit(w.w1Nano) * col("x1") +
          lit(w.w2Nano) * col("x2")).as("pred_nano"),
        col("y"))

  /** Confusion matrix of the 0.5-threshold filter the probe induces:
    * one row (tp, fp, fn, tn). `pred ≥ 0.5` is `2·pred_nano ≥ 1e9` —
    * integer, no float threshold. */
  def confusion(scored: DataFrame): DataFrame = {
    val pos = (col("pred_nano") * 2 >= lit(1000000000L)).cast("long")
    scored.agg(
      sum(pos * col("y")).as("tp"),
      sum(pos * (lit(1L) - col("y"))).as("fp"),
      sum((lit(1L) - pos) * col("y")).as("fn"),
      sum((lit(1L) - pos) * (lit(1L) - col("y"))).as("tn"))
  }

  /** Calibration (reliability) table of the probe: the OBSERVED score
    * range split into `buckets` equal bands, each reporting its size,
    * band bounds, and observed positive rate — monotone pos_rate across
    * bands means the score ranks documents usefully, and the table is
    * what re-picks the filter threshold when the corpus shifts
    * ([[confusion]]'s fixed-threshold complement). The range comes from
    * one min/max aggregate (two longs of control data, broadcast back as
    * a 1-row frame — the events_rfm pattern); bucketing and rates are
    * truncating integer arithmetic — engine-exact. Output: (bucket,
    * lo_nano, n, n_pos, pos_rate). */
  def calibration(scored: DataFrame, buckets: Int = 10): DataFrame = {
    val mm = scored.agg(min(col("pred_nano")).as("__mn"),
      max(col("pred_nano")).as("__mx"))
    val span = col("__mx") - col("__mn") + 1 // +1: max lands in the top band
    val bucket = call_function("div",
      (col("pred_nano") - col("__mn")) * buckets, span)
    scored.crossJoin(mm)
      .groupBy(bucket.cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        min(col("pred_nano")).as("lo_nano"))
      .select(col("bucket"), col("lo_nano"), col("n"), col("n_pos"),
        (call_function("div", col("n_pos") * lit(1000000000L), col("n")) /
          lit(1e9)).as("pos_rate"))
  }
}
