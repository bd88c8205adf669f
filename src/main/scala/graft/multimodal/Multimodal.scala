package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus partition-batched
  * decode/feature-extract hooks.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — this container has
  * no media libraries — behind [[FakeDecoder]], a deterministic
  * byte-statistics fake. Everything Spark-side is real and tested: the
  * schema, the batched `mapPartitions` execution shape (one decoder init
  * per partition, like `mapInPandas` batches on a Python cluster), the
  * metadata extraction, and the partitioning story (media blobs are large —
  * repartition by byte-size budget before decode so no task holds more than
  * `spark.sql.files.maxPartitionBytes`-worth of payload).
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = true),      // jpeg|png|wav|…
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)
  ))

  /** Wrap a binary column into (blob, meta) — the canonical multimodal row. */
  def withMeta(df: DataFrame, blobCol: String, mediaType: String, format: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mediaType).as("media_type"),
      lit(format).as("format"),
      length(col(blobCol)).cast("long").as("byte_len"),
      md5(col(blobCol)).as("checksum")))

  /** Decoded feature row produced per blob. */
  final case class MediaFeatures(
      byteLen: Long,
      // image-ish: width/height from a real decoder; audio-ish: sampleRate/frames
      dim1: Int, dim2: Int,
      meanByte: Double,
      histogram: Array[Long]) // 16-bin byte histogram ~ a trivial "feature vector"

  /** The decoder seam. A real deployment plugs libjpeg/ffmpeg here; the
    * fake derives deterministic pseudo-features from the bytes so tests
    * exercise the full pipeline shape. */
  trait Decoder extends Serializable {
    def decode(blob: Array[Byte]): MediaFeatures
  }

  object FakeDecoder extends Decoder {
    def decode(blob: Array[Byte]): MediaFeatures = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < blob.length) {
        val b = blob(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      val mean = if (blob.length == 0) 0.0 else sum.toDouble / blob.length
      // a real decoder would read the header; the fake derives stable dims
      MediaFeatures(blob.length, 1 + (blob.length % 640), 1 + (blob.length % 480), mean, hist)
    }
  }

  /** Batched decode over partitions: one decoder instance per partition
    * (the expensive-init pattern mapInPandas gives Python pipelines).
    * Returns (id, byte_len, dim1, dim2, mean_byte, histogram). */
  def decodeFeatures(
      df: DataFrame, idCol: String, blobCol: String,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] = graft.ops.Par.ensure(
        df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      val d = decoder // per-partition init seam
      it.map { case (id, blob) =>
        val f = d.decode(blob)
        (id, f.byteLen, f.dim1, f.dim2, f.meanByte, f.histogram)
      }
    }.toDF(idCol, "byte_len", "dim1", "dim2", "mean_byte", "histogram")
  }

  /** Frame sampling plumbing for video-ish blobs: split a blob into fixed
    * `frameBytes` windows and keep every `stride`-th — pure expressions, so
    * the (huge) blob column never leaves the JVM or codegen. */
  def sampleFrames(df: DataFrame, blobCol: String, frameBytes: Int, stride: Int): DataFrame =
    df.withColumn("frames",
      filter(
        transform(
          sequence(lit(0), greatest(ceil(length(col(blobCol)).cast("double") / frameBytes).cast("int") - 1, lit(0))),
          i => substring(col(blobCol), (i * frameBytes + 1).cast("int"), lit(frameBytes))),
        (_, i) => i % stride === 0))

  /** Resize stub: deterministic byte-grid subsample (every `stride`-th
    * byte), expressed over the blob's hex so the whole transform is native
    * expressions inside codegen — the decoder-free stand-in for an image
    * resize (a real deployment swaps in the [[Decoder]] seam). Returns the
    * subsampled bytes as binary. */
  def resizeStub(blob: Column, stride: Int): Column = {
    val bytes = regexp_extract_all(hex(blob), lit(".."), lit(0))
    val kept = filter(bytes, (_, i) => i % stride === 0)
    unhex(array_join(kept, ""))
  }

  /** Windowed RMS-energy substrate for audio-ish blobs: the blob read as
    * 16-bit signed little-endian PCM, per-window integer sum of squares —
    * the voice-activity-detection / silence-trimming primitive a speech
    * pipeline runs before anything expensive. One-pass native kernel
    * ([[graft.functions.AudioEnergy]]); a real deployment decodes the
    * container format through the [[Decoder]] seam first, then runs the
    * identical arithmetic over the PCM. Integer-exact end to end, so the
    * oracle reproduces it from the blob's hex. */
  def audioEnergy(blob: Column, windowSamples: Int): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_audio_energy", blob, lit(windowSamples))
  }

  /** Per-window zero-crossing counts over the same PCM reading — the
    * cheap spectral-content proxy paired with [[audioEnergy]]. */
  def audioZeroCrossings(blob: Column, windowSamples: Int): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_audio_zc", blob, lit(windowSamples))
  }

  /** dHash-style PERCEPTUAL fingerprint over the blob's byte stream: the
    * bytes split into `buckets` contiguous ranges, and bit b of the hash
    * records whether bucket b's mean exceeds bucket b+1's — the gradient
    * signature that survives re-encoding/scaling noise a checksum cannot
    * (the image near-dup primitive; a real deployment computes it over
    * decoded luma via the [[Decoder]] seam, this decoder-free form runs
    * the identical arithmetic over the raw bytes). Mean comparisons are
    * cross-multiplied integer sums — no division, engine-exact. Pure
    * expressions over the blob's hex: codegen-friendly, the blob never
    * leaves the scan. Hash width = buckets−1 bits. */
  def perceptualHash(blob: Column, buckets: Int = 16): Column = {
    require(buckets >= 2 && buckets <= 33, "1..32 hash bits")
    // native one-pass kernel ([[graft.functions.PerceptualHash64]]): the
    // interpreted HOF form below costs ~1 µs per BYTE (hex split + conv
    // per element, no codegen) — 20 s over a 20 MB corpus slice; the
    // kernel is one virtual call per row
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_phash", blob, lit(buckets))
  }

  /** Composed-expression formulation of [[perceptualHash]] — bit-identical
    * (MultimodalSpec), kept as the portable spec cross-check. */
  def perceptualHashHof(blob: Column, buckets: Int = 16): Column = {
    require(buckets >= 2 && buckets <= 33, "1..32 hash bits")
    // bind the (expensive) hex split ONCE — every sum/count below sees the
    // lambda variable, not a re-evaluated regex subtree (the withTokens
    // idiom; HOF trees are interpreted with no CSE)
    element_at(transform(array(regexp_extract_all(hex(blob), lit(".."), lit(0))),
      bytes => {
        val n = size(bytes)
        // bucket b covers 0-based [n*b/B, n*(b+1)/B) — /B is exact double
        // math for B a power of two, truncation = floor for nonneg values
        def lo(b: Int): Column = (n * lit(b) / lit(buckets)).cast("int")
        val sums = array((0 until buckets).map { b =>
          aggregate(slice(bytes, lo(b) + 1, lo(b + 1) - lo(b)), lit(0L),
            (acc, s) => acc + conv(s, 16, 10).cast("long"))
        }: _*)
        val cnts = array((0 until buckets).map(b =>
          (lo(b + 1) - lo(b)).cast("long")): _*)
        (0 until buckets - 1).map { b =>
          when(element_at(sums, b + 1) * element_at(cnts, b + 2) >
            element_at(sums, b + 2) * element_at(cnts, b + 1),
            lit(1L << b)).otherwise(0L)
        }.reduce(_ + _)
      }), 1)
  }

  /** Byte-budget repartition before decode: media rows are fat, so balance
    * by cumulative blob size, not row count. */
  def repartitionByBytes(df: DataFrame, blobCol: String, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = df.select(sum(length(col(blobCol)).cast("long"))).first().getLong(0)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }
}
