package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus partition-batched
  * decode/feature-extract hooks.
  *
  * The decode seam has one REAL implementation — [[Wav]]/[[WavDecoder]], a
  * pure-JVM RIFF/WAVE chunk-walking 16-bit-PCM parser (no native codec
  * needed) — and a deterministic byte-statistics fake ([[FakeDecoder]])
  * standing in for the codec-bound formats (JPEG/PNG/compressed audio)
  * this container has no libraries for. Everything Spark-side is real and
  * tested either way: the schema, the batched `mapPartitions` execution
  * shape (one decoder init per partition, like `mapInPandas` batches on a
  * Python cluster), the metadata extraction, and the partitioning story
  * (media blobs are large — repartition by byte-size budget before decode
  * so no task holds more than `spark.sql.files.maxPartitionBytes`-worth
  * of payload).
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

  /** A parsed RIFF/WAVE file: the `fmt ` chunk's parameters plus the
    * located PCM payload (offset/length into the original blob) and the
    * decoded 16-bit-sample statistics. All integers — exact cross-engine. */
  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataOffset: Int, dataBytes: Int,
      nSamples: Long, sumSamples: Long, sumSquares: Long, maxAbs: Long)

  /** Pure-JVM RIFF/WAVE parser — the decode seam's first REAL
    * implementation (no native codec needed: WAV is a chunked container
    * around raw PCM). Walks the chunk list generically (unknown chunks —
    * LIST/JUNK/bext/… — are skipped by their declared size with RIFF's
    * word alignment), reads `fmt `, locates `data`, and decodes the
    * samples: 16-bit signed little-endian PCM (format 1), the two
    * G.711 companded telephony codecs — A-law (format 6) and μ-law
    * (format 7), 8-bit bytes expanded to 16-bit samples with the
    * standard integer segment/mantissa arithmetic — or IMA ADPCM
    * (format 0x11): block-structured 4-bit differential coding expanded
    * through the published step/index tables, the first COMPRESSED audio
    * codec of the seam. Strict: any other format tag throws rather than
    * returning fake features. */
  object Wav {
    /** IMA ADPCM quantizer step table (89 entries) and index-advance
      * table — the published constants every IMA decoder shares. */
    val AdpcmStepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One IMA ADPCM step: expand nibble `nib` against (`pred`, `sidx`),
      * returning the clamped new predictor (= the decoded sample) and the
      * clamped new step index. Exact integer arithmetic — the DuckDB
      * oracle replays it per nibble. */
    def adpcmStep(pred: Int, sidx: Int, nib: Int): (Int, Int) = {
      val step = AdpcmStepTable(sidx)
      var diff = step >> 3
      if ((nib & 1) != 0) diff += step >> 2
      if ((nib & 2) != 0) diff += step >> 1
      if ((nib & 4) != 0) diff += step
      val raw = if ((nib & 8) != 0) pred - diff else pred + diff
      val p = math.max(-32768, math.min(32767, raw))
      val i = math.max(0, math.min(88, sidx + AdpcmIndexTable(nib & 7)))
      (p, i)
    }

    /** G.711 μ-law byte → 16-bit sample: complement, then
      * ((mantissa·8 + 132) << exponent) − 132, sign from bit 7.
      * Pure integers — the oracle replays it per byte. */
    def mulawSample(b: Int): Int = {
      val u = ~b & 0xff
      val exp = (u >> 4) & 7
      val mant = u & 0x0f
      val mag = (((mant << 3) + 0x84) << exp) - 0x84
      if ((u & 0x80) != 0) -mag else mag
    }

    /** G.711 A-law byte → 16-bit sample: XOR 0x55, segment 0 is linear
      * (mantissa·16 + 8), higher segments shift; bit 7 SET means
      * positive (the inverse of μ-law's convention). */
    def alawSample(b: Int): Int = {
      val a = b ^ 0x55
      val exp = (a >> 4) & 7
      val mant = a & 0x0f
      val mag =
        if (exp == 0) (mant << 4) + 8
        else ((mant << 4) + 0x108) << (exp - 1)
      if ((a & 0x80) != 0) mag else -mag
    }

    def parse(blob: Array[Byte]): WavInfo = {
      def u32(o: Int): Long = (blob(o) & 0xffL) | (blob(o + 1) & 0xffL) << 8 |
        (blob(o + 2) & 0xffL) << 16 | (blob(o + 3) & 0xffL) << 24
      def u16(o: Int): Int = (blob(o) & 0xff) | (blob(o + 1) & 0xff) << 8
      def tag(o: Int): String =
        new String(blob, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(blob.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "not a RIFF/WAVE container")
      var off = 12
      var sr = -1; var ch = -1; var bits = -1; var fmt = -1
      var blockAlign = -1
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= blob.length) {
        val id = tag(off)
        val size = u32(off + 4).toInt
        val body = off + 8
        require(size >= 0 && body + size <= blob.length,
          s"chunk '$id' overruns the blob")
        id match {
          case "fmt " =>
            require(size >= 16, "fmt chunk too short")
            fmt = u16(body)
            require(fmt == 1 || fmt == 6 || fmt == 7 || fmt == 0x11,
              s"unsupported WAV format $fmt (PCM 1, A-law 6, mu-law 7, " +
                "IMA ADPCM 17)")
            ch = u16(body + 2); sr = u32(body + 4).toInt
            blockAlign = u16(body + 12); bits = u16(body + 14)
          case "data" => dataOff = body; dataLen = size
          case _ => () // LIST/JUNK/…: skipped by size
        }
        off = body + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(sr > 0 && ch > 0, "missing fmt  chunk")
      require(dataOff >= 0, "missing data chunk")
      var n = 0L; var sum = 0L; var sq = 0L; var mx = 0L
      if (fmt == 1) {
        require(bits == 16, s"only 16-bit PCM supported, got $bits")
        var i = dataOff
        val end = dataOff + dataLen
        while (i + 1 < end) {
          val s = ((blob(i) & 0xff) | (blob(i + 1) << 8)).toShort.toLong
          n += 1; sum += s; sq += s * s
          val a = math.abs(s); if (a > mx) mx = a
          i += 2
        }
      } else if (fmt == 0x11) {
        // IMA ADPCM: fixed-size blocks of nBlockAlign bytes, each opening
        // with a 4-byte header (initial predictor s16le, step index u8,
        // reserved 0) whose predictor IS sample 0, followed by 2 nibbles
        // per byte expanded through the step/index tables. The last block
        // may run short (we decode to the data chunk's end).
        require(bits == 4, s"IMA ADPCM is 4-bit, got $bits")
        require(ch == 1, "IMA ADPCM decode is mono-only")
        require(blockAlign >= 5, s"ADPCM block align $blockAlign too small")
        var boff = dataOff
        val end = dataOff + dataLen
        while (boff < end) {
          val bend = math.min(boff + blockAlign, end)
          require(bend - boff >= 4, "truncated ADPCM block header")
          var pred = ((blob(boff) & 0xff) | (blob(boff + 1) << 8))
            .toShort.toInt
          var sidx = blob(boff + 2) & 0xff
          require(sidx <= 88, s"ADPCM step index $sidx out of range")
          require(blob(boff + 3) == 0, "ADPCM reserved header byte must be 0")
          n += 1; sum += pred; sq += pred.toLong * pred
          if (math.abs(pred) > mx) mx = math.abs(pred).toLong
          var i = boff + 4
          while (i < bend) {
            val byte = blob(i) & 0xff
            var half = 0
            while (half < 2) {
              val nib = if (half == 0) byte & 0x0f else byte >> 4
              val (p, si) = adpcmStep(pred, sidx, nib)
              pred = p; sidx = si
              n += 1; sum += pred; sq += pred.toLong * pred
              val a = math.abs(pred).toLong; if (a > mx) mx = a
              half += 1
            }
            i += 1
          }
          boff += blockAlign
        }
      } else {
        require(bits == 8, s"G.711 streams are 8-bit, got $bits")
        var i = dataOff
        val end = dataOff + dataLen
        while (i < end) {
          val s = (if (fmt == 7) mulawSample(blob(i) & 0xff)
                   else alawSample(blob(i) & 0xff)).toLong
          n += 1; sum += s; sq += s * s
          val a = math.abs(s); if (a > mx) mx = a
          i += 1
        }
      }
      WavInfo(sr, ch, bits, dataOff, dataLen, n, sum, sq, mx)
    }
  }

  /** A parsed BMP (DIB) file: the BITMAPINFOHEADER geometry plus exact
    * integer statistics over the decoded 24-bit pixels. `topLeftHex` is the
    * LOGICAL top-left pixel's 3 bytes (B,G,R) — for the usual bottom-up
    * row order that is the LAST stored row, so it witnesses that the
    * parser honours BMP's row direction, not just the byte stream. */
  final case class BmpInfo(
      width: Int, height: Int, topDown: Boolean,
      nPixels: Long, sumB: Long, sumG: Long, sumR: Long,
      maxPx: Long, // max over pixels of (B + G + R)
      topLeftHex: String)

  /** Pure-JVM BMP parser — the decode seam's real IMAGE implementation
    * (BMP is uncompressed, so like WAV it needs no native codec). Reads
    * the BITMAPFILEHEADER ('BM', pixel-array offset), a BITMAPINFOHEADER
    * (width, signed height — negative means top-down, 24 bpp, BI_RGB
    * only), and walks the pixel array with the 4-byte row stride BMP
    * mandates (rows are padded; a parser that ignores the stride reads
    * garbage on any width where 3·w % 4 ≠ 0). Strict: anything that is
    * not an uncompressed 24-bit DIB throws rather than faking features. */
  object Bmp {
    def parse(blob: Array[Byte]): BmpInfo = {
      def u32(o: Int): Long = (blob(o) & 0xffL) | (blob(o + 1) & 0xffL) << 8 |
        (blob(o + 2) & 0xffL) << 16 | (blob(o + 3) & 0xffL) << 24
      def s32(o: Int): Int = u32(o).toInt
      def u16(o: Int): Int = (blob(o) & 0xff) | (blob(o + 1) & 0xff) << 8
      require(blob.length >= 54 && blob(0) == 'B'.toByte && blob(1) == 'M'.toByte,
        "not a BM bitmap")
      // bounds arithmetic in Long: a hostile header with width near 2^31 or
      // a pixel offset with the sign bit set must hit these requires, not
      // overflow Int and slip past them into an ArrayIndexOutOfBounds
      val pixOffU = u32(10) // unsigned on disk; validate BEFORE .toInt
      require(pixOffU >= 54 && pixOffU <= blob.length.toLong,
        "pixel array overruns the blob")
      val pixOff = pixOffU.toInt
      require(u32(14) >= 40, "not a BITMAPINFOHEADER DIB")
      val width = s32(18)
      val rawH = s32(22)
      val topDown = rawH < 0
      val heightL = math.abs(rawH.toLong) // Int.MinValue would overflow abs(Int)
      require(heightL <= Int.MaxValue.toLong, "height overflows Int")
      val height = heightL.toInt
      require(width >= 0, "negative width")
      require(u16(26) == 1, "planes must be 1")
      require(u16(28) == 24, s"only 24-bit pixels supported, got ${u16(28)}")
      require(u32(30) == 0, "only BI_RGB (uncompressed) supported")
      val strideL = ((width.toLong * 3 + 3) / 4) * 4 // rows pad to 4 bytes
      require(strideL <= Int.MaxValue.toLong &&
        pixOffU + strideL * height <= blob.length.toLong,
        "pixel array overruns the blob")
      val stride = strideL.toInt
      var n = 0L; var sb = 0L; var sg = 0L; var sr = 0L; var mx = 0L
      var y = 0
      while (y < height) {
        var o = pixOff + y * stride
        var x = 0
        while (x < width) {
          val b = blob(o) & 0xff; val g = blob(o + 1) & 0xff; val r = blob(o + 2) & 0xff
          n += 1; sb += b; sg += g; sr += r
          val px = (b + g + r).toLong; if (px > mx) mx = px
          x += 1; o += 3
        }
        y += 1
      }
      val topLeftHex =
        if (height == 0 || width == 0) ""
        else {
          // logical top row: stored FIRST when top-down, LAST when bottom-up
          val o = pixOff + (if (topDown) 0 else (height - 1) * stride)
          blob.slice(o, o + 3).map(b => f"${b & 0xff}%02X").mkString
        }
      BmpInfo(width, height, topDown, n, sb, sg, sr, mx, topLeftHex)
    }
  }

  /** Statistics of a REAL nearest-neighbor resize: the decoded image
    * downsampled by `stride` in both axes (logical pixel (r, c) of the
    * output reads original (r·stride, c·stride)), summarized as exact
    * integer channel sums plus the LAST selected pixel's bytes (an
    * order-sensitive witness that the sampling grid — including the
    * bottom-up row mapping and the row stride — was walked correctly). */
  final case class BmpResize(
      outW: Int, outH: Int, nPx: Long,
      sumB: Long, sumG: Long, sumR: Long, lastPxHex: String)

  /** Nearest-neighbor resize over REAL decoded 24-bit pixels — the
    * decode→transform step [[resizeStub]] only imitates on raw bytes.
    * Walks the logical image (top row first, honouring bottom-up vs
    * top-down storage and the 4-byte row stride) and samples every
    * `stride`-th row and column. */
  object BmpOps {
    def resizeStats(blob: Array[Byte], stride: Int): BmpResize = {
      require(stride >= 1, "stride must be positive")
      def u32(o: Int): Long = (blob(o) & 0xffL) | (blob(o + 1) & 0xffL) << 8 |
        (blob(o + 2) & 0xffL) << 16 | (blob(o + 3) & 0xffL) << 24
      val info = Bmp.parse(blob) // header validation + geometry (incl. bounds)
      val pixOff = u32(10).toInt
      val rowStride = (((info.width.toLong * 3 + 3) / 4) * 4).toInt // parse bounded it
      val outW = (info.width + stride - 1) / stride
      val outH = (info.height + stride - 1) / stride
      var n = 0L; var sb = 0L; var sg = 0L; var sr = 0L
      var lastHex = ""
      var r = 0
      while (r < info.height) {
        // logical row r is stored at h-1-r (bottom-up) or r (top-down)
        val stored = if (info.topDown) r else info.height - 1 - r
        var c = 0
        while (c < info.width) {
          val o = pixOff + stored * rowStride + 3 * c
          n += 1
          sb += blob(o) & 0xff; sg += blob(o + 1) & 0xff; sr += blob(o + 2) & 0xff
          lastHex = f"${blob(o) & 0xff}%02X${blob(o + 1) & 0xff}%02X${blob(o + 2) & 0xff}%02X"
          c += stride
        }
        r += stride
      }
      BmpResize(if (info.height == 0 || info.width == 0) 0 else outW,
        if (info.height == 0 || info.width == 0) 0 else outH,
        n, sb, sg, sr, lastHex)
    }
  }

  /** Batched real-pixel resize: (id, out_w, out_h, n_px, sum_b, sum_g,
    * sum_r, last_px_hex) per blob. Same mapPartitions shape as
    * [[decodeBmp]]. */
  def resizeBmp(df: DataFrame, idCol: String, blobCol: String,
                stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val r = BmpOps.resizeStats(blob, stride)
        (id, r.outW, r.outH, r.nPx, r.sumB, r.sumG, r.sumR, r.lastPxHex)
      })
      .toDF(idCol, "out_w", "out_h", "n_px", "sum_b", "sum_g", "sum_r",
        "last_px_hex")
  }

  /** Batched REAL BMP decode: geometry + exact integer channel statistics
    * per blob — (id, width, height, n_px, sum_b, sum_g, sum_r, max_px,
    * topleft_hex). Same mapPartitions shape as [[decodeWav]]. */
  def decodeBmp(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val b = Bmp.parse(blob)
        (id, b.width, b.height, b.nPixels, b.sumB, b.sumG, b.sumR,
          b.maxPx, b.topLeftHex)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_b", "sum_g", "sum_r",
        "max_px", "topleft_hex")
  }

  /** Wrap raw RGB bytes into a REAL baseline PNG ([[Png.encode]]): row
    * filters cycling all five types, zlib IDAT split across chunks,
    * CRC-32 per chunk. Unlike [[bmpBlob]] this is a `mapPartitions` seam,
    * not a Column expression — a Deflater stream is genuinely outside
    * Catalyst's expression algebra (same justification as the decode
    * side). Input rows must carry a payload that is a positive whole
    * number of 3·`width`-byte rows; callers truncate and filter. */
  def pngBlob(df: DataFrame, idCol: String, rgbCol: String,
              width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(rgbCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rgb) => (id, Png.encode(rgb, width)) })
      .toDF(idCol, "blob")
  }

  /** [[pngBlob]]'s Adam7-INTERLACED twin ([[Png.encodeInterlaced]]):
    * same pixels, genuinely different scanline layout — seven
    * independently-filtered pass sub-images. */
  def pngInterlacedBlob(df: DataFrame, idCol: String, rgbCol: String,
                        width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(rgbCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, rgb) =>
        (id, Png.encodeInterlaced(rgb, width))
      })
      .toDF(idCol, "blob")
  }

  /** Batched REAL PNG decode: inflate + unfilter + exact integer channel
    * statistics per blob — (id, width, height, n_px, sum_r, sum_g, sum_b,
    * max_px, topleft_hex). PNG stores rows top-down, so topleft_hex is the
    * FIRST pixel (the orientation twin of BMP's bottom-up witness). Same
    * mapPartitions shape as [[decodeBmp]]. */
  def decodePng(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val p = Png.parse(blob)
        (id, p.width, p.height, p.nPixels, p.sumR, p.sumG, p.sumB,
          p.maxPx, p.topLeftHex)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "max_px", "topleft_hex")
  }

  /** Deterministic 256-entry fixture palette, re-derivable in plain SQL:
    * entry i = (i, (7i+13) mod 256, (31i+101) mod 256). */
  val FixturePalette: Array[Byte] = Array.tabulate(768) { j =>
    val i = j / 3
    (j % 3 match {
      case 0 => i
      case 1 => (7 * i + 13) % 256
      case _ => (31 * i + 101) % 256
    }).toByte
  }

  /** Wrap payload bytes (palette INDICES, one per pixel) into a REAL
    * type-3 palette PNG against [[FixturePalette]]. */
  def pngPaletteBlob(df: DataFrame, idCol: String, payloadCol: String,
                     width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Png.encodePalette(p, width, FixturePalette))
      })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes (6 per pixel: big-endian 16-bit R,G,B samples)
    * into a REAL depth-16 truecolor PNG ([[Png.encode16]]). */
  def png16Blob(df: DataFrame, idCol: String, payloadCol: String,
                width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Png.encode16(p, width)) })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes (grayscale samples, one per pixel) into a REAL
    * type-0 PNG — formerly the image seam's last named rejection class,
    * closed round 12 (the png16 reclassification precedent). */
  def pngGrayBlob(df: DataFrame, idCol: String, payloadCol: String,
                  width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Png.encodeGray(p, width)) })
      .toDF(idCol, "blob")
  }

  /** Wrap payload byte PAIRS (gray, alpha) into a REAL type-4 PNG. */
  def pngGrayAlphaBlob(df: DataFrame, idCol: String, payloadCol: String,
                       width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Png.encodeGrayAlpha(p, width)) })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes (RGBA quads) into a REAL type-6 PNG. */
  def pngRgbaBlob(df: DataFrame, idCol: String, payloadCol: String,
                  width: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Png.encodeRgba(p, width)) })
      .toDF(idCol, "blob")
  }

  /** [[decodePng]] plus the alpha channel: (id, width, height, n_px,
    * sum_r, sum_g, sum_b, sum_a, max_px, topleft_hex). */
  def decodePngRgba(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val p = Png.parse(blob)
        (id, p.width, p.height, p.nPixels, p.sumR, p.sumG, p.sumB, p.sumA,
          p.maxPx, p.topLeftHex)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "sum_a", "max_px", "topleft_hex")
  }

  /** Wrap payload bytes into a REAL baseline grayscale JFIF stream
    * ([[Jpeg.encodeGray]]): one DC-only 8×8 block per byte, canonical
    * Huffman DHT, byte-stuffed entropy scan. `mapPartitions` seam like
    * [[pngBlob]] — an entropy coder is not a Catalyst expression. */
  def jpegBlob(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Jpeg.encodeGray(p)) })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes into a REAL PROGRESSIVE (SOF2) grayscale JFIF
    * stream ([[Jpeg.encodeGrayProgressive]]): the same DC-only blocks as
    * [[jpegBlob]] sent as the canonical four-scan progression. */
  def jpegProgressiveBlob(df: DataFrame, idCol: String,
                          payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeGrayProgressive(p))
      })
      .toDF(idCol, "blob")
  }

  /** Batched REAL JPEG decode: Huffman + DC prediction + dequant + full
    * IDCT per block, exact integer statistics per blob — (id, width,
    * height, n_px, sum_px, sum_sq, max_px, min_px, topleft_hex). */
  def decodeJpeg(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val j = Jpeg.parse(blob)
        (id, j.width, j.height, j.nPixels, j.sumPx, j.sumSq, j.maxPx,
          j.minPx, j.topLeftHex)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_px", "sum_sq",
        "max_px", "min_px", "topleft_hex")
  }

  /** Wrap payload bytes into a REAL baseline 4:4:4 COLOR JFIF stream
    * ([[Jpeg.encodeColor]]): one interleaved Y/Cb/Cr MCU per byte with
    * per-component quant + Huffman tables and non-neutral chroma. */
  def jpegColorBlob(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Jpeg.encodeColor(p)) })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes into a REAL 4:2:0 baseline JFIF stream
    * ([[Jpeg.encodeColor420]]): four Y blocks + shared chroma per 16×16
    * MCU, with restart markers every `restartEvery` MCUs when > 0 — the
    * subsampled layout (and resync structure) of real crawl images. */
  def jpeg420Blob(df: DataFrame, idCol: String, payloadCol: String,
                  restartEvery: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColor420(p, restartEvery))
      })
      .toDF(idCol, "blob")
  }

  /** Progressive twins of [[jpegColorBlob]]/[[jpeg420Blob]]: same MCUs,
    * eight-scan SOF2 wire format ([[Jpeg.encodeColorProgressive]] /
    * [[Jpeg.encodeColor420Progressive]]). */
  def jpegColorProgressiveBlob(df: DataFrame, idCol: String,
                               payloadCol: String,
                               restartEvery: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColorProgressive(p, restartEvery))
      })
      .toDF(idCol, "blob")
  }

  def jpeg420ProgressiveBlob(df: DataFrame, idCol: String,
                             payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColor420Progressive(p))
      })
      .toDF(idCol, "blob")
  }

  /** 4:2:2 wrappers ([[Jpeg.encodeColor422]] /
    * [[Jpeg.encodeColor422Progressive]]): two bytes per 16×8 MCU, shared
    * chroma from the pair's first byte. */
  def jpeg422Blob(df: DataFrame, idCol: String, payloadCol: String,
                  restartEvery: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColor422(p, restartEvery))
      })
      .toDF(idCol, "blob")
  }

  /** 4:1:1 fixture staging ([[Jpeg.encodeColor411]]): four payload bytes
    * per 32×8 MCU, shared chroma from the group's first byte. */
  def jpeg411Blob(df: DataFrame, idCol: String, payloadCol: String,
                  restartEvery: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColor411(p, restartEvery))
      })
      .toDF(idCol, "blob")
  }

  def jpeg422ProgressiveBlob(df: DataFrame, idCol: String,
                             payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Jpeg.encodeColor422Progressive(p))
      })
      .toDF(idCol, "blob")
  }

  /** Batched REAL color JPEG decode: interleaved-MCU Huffman + three DC
    * predictors + per-component dequant + IDCT + fixed-point BT.601
    * YCbCr→RGB, exact per-channel statistics per blob — (id, width,
    * height, n_px, sum_r, sum_g, sum_b, max_px, topleft_hex). */
  def decodeJpegColor(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val j = Jpeg.parseColor(blob)
        (id, j.width, j.height, j.nPixels, j.sumR, j.sumG, j.sumB,
          j.maxPx, j.topLeftHex)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "max_px", "topleft_hex")
  }

  /** EXIF-AWARE color decode: the governance pass's orientation tag,
    * HONORED at decode ([[Exif.parse]] → [[Jpeg.parseColorOriented]]) —
    * the returned geometry and top-left witness describe the DISPLAYED
    * raster, so downstream consumers (thumbnailers, layout checks,
    * aspect-ratio gates) never see a sideways image. Untagged blobs
    * decode as orientation 1. */
  def decodeJpegColorOriented(df: DataFrame, idCol: String,
                              blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val o = Exif.parse(blob).orientation
        val j = Jpeg.parseColorOriented(blob, o)
        (id, o, j.width, j.height, j.nPixels, j.sumR, j.sumG, j.sumB,
          j.maxPx, j.topLeftHex)
      })
      .toDF(idCol, "orientation", "width", "height", "n_px", "sum_r",
        "sum_g", "sum_b", "max_px", "topleft_hex")
  }

  /** Distributed SEGMENT-PARALLEL color JPEG decode: fan each image's
    * restart segments across up to `tasksPerImage` stride-buckets, decode
    * partial channel statistics per bucket, and merge by sum/max — the
    * plan that decodes ONE giant restart-marked scan across a cluster's
    * executors instead of serializing on a single task. The fan-out is a
    * header-only planning pass (no entropy work); images without DRI
    * stay single-task. Output is column-identical to [[decodeJpegColor]],
    * and byte-identical by construction (same per-segment decode, exact
    * integer merge). */
  def decodeJpegColorParallel(df: DataFrame, idCol: String, blobCol: String,
                              tasksPerImage: Int = 8): DataFrame =
    segmentParallelDecode(df, idCol, blobCol, tasksPerImage,
      b => Jpeg.segmentInfo(b), Jpeg.decodeColorSegments)

  /** [[decodeJpegColorParallel]]'s PROGRESSIVE twin: the same fan-out /
    * merge plumbing over [[Jpeg.decodeColorProgressiveSegments]] — each
    * task replays the full scan sequence for its stride of restart
    * segments (4:4:4 only: the layout where every scan's restart
    * segmentation partitions the same block raster), holding coefficient
    * state in a reused restartInterval-sized buffer instead of a
    * whole-image plane. */
  def decodeJpegColorProgressiveParallel(df: DataFrame, idCol: String,
                                         blobCol: String,
                                         tasksPerImage: Int = 8): DataFrame =
    segmentParallelDecode(df, idCol, blobCol, tasksPerImage,
      b => Jpeg.progressiveSegmentInfo(b), Jpeg.decodeColorProgressiveSegments)

  private def segmentParallelDecode(df: DataFrame, idCol: String,
      blobCol: String, tasksPerImage: Int,
      info: Array[Byte] => Jpeg.SegmentInfo,
      decode: (Array[Byte], Int, Int) => (Long, Long, Long, Long, Int, String))
      : DataFrame = {
    require(tasksPerImage >= 1, "tasksPerImage must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // no Par.ensure here: the explicit (image, bucket) repartition below
    // is the operator's own spread — a guard shuffle before the fan-out
    // would just move every blob twice (seen in the plan audit)
    val fanned = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val k = math.min(info(b).nSegments, tasksPerImage)
        (0 until k).map(t => (id, t, k, b))
      }
      .toDF(idCol, "bucket", "stride", "blob")
      // move each (image, bucket) to its own task: at scale this is the
      // shuffle that spreads one image's byte ranges across executors
      .repartition(col(idCol), col("bucket"))
    fanned.as[(Long, Int, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, bucket, stride, b) =>
        val si = info(b)
        val (n, r, g, bl, mx, tl) = decode(b, bucket, stride)
        (id, si.width, si.height, n, r, g, bl, mx, tl)
      })
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "max_px", "topleft_hex")
      .groupBy(col(idCol))
      .agg(max("width").as("width"), max("height").as("height"),
        sum("n_px").as("n_px"), sum("sum_r").as("sum_r"),
        sum("sum_g").as("sum_g"), sum("sum_b").as("sum_b"),
        max("max_px").as("max_px"),
        // only the bucket owning MCU 0 emits a non-null witness
        max("topleft_hex").as("topleft_hex"))
  }

  /** Wrap a raw BGR byte column into a REAL bottom-up 24-bit BMP container
    * as pure expressions (the image twin of [[wavBlob]]): BITMAPFILEHEADER
    * + BITMAPINFOHEADER + the pixel array with each 3·`width`-byte row
    * padded to BMP's mandatory 4-byte stride — so consumers must honour
    * the stride and the bottom-up row order, not just slice bytes. The
    * input must be a whole number of rows (length % (3·width) == 0);
    * callers truncate. */
  def bmpBlob(bgr: Column, width: Int): Column = {
    require(width > 0, "width must be positive")
    val rowBytes = 3 * width
    val stride = ((rowBytes + 3) / 4) * 4
    val pad = stride - rowBytes
    val h = (length(bgr) / rowBytes).cast("long") // exact: whole rows only
    // static BITMAPINFOHEADER tail after the height field
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(1.toShort).putShort(24.toShort) // planes, bpp
      .putInt(0).putInt(0)                      // BI_RGB, imageSize (0 ok for BI_RGB)
      .putInt(2835)                             // x pixels/metre
    val planesToXppm = bb.array()
    val infoTail = planesToXppm ++ Array[Byte](
      0x13, 0x0b, 0, 0, // y pixels/metre = 2835
      0, 0, 0, 0,       // colours used
      0, 0, 0, 0)       // important colours
    val rows = transform(
      sequence(lit(0L), greatest(h - 1, lit(0L))).cast("array<int>"),
      i => substring(bgr, i * rowBytes + 1, lit(rowBytes)))
    val pixelArray =
      if (pad == 0) bgr
      else aggregate(
        when(h > 0, rows).otherwise(array().cast("array<binary>")),
        lit(Array.emptyByteArray),
        (acc, row) => concat(acc, row, lit(Array.fill[Byte](pad)(0))))
    concat(
      lit("BM".getBytes("US-ASCII")),
      leU32(h * stride + lit(54L)), // file size
      lit(Array[Byte](0, 0, 0, 0)), // reserved
      lit(Array[Byte](54, 0, 0, 0)),// pixel-array offset
      lit(Array[Byte](40, 0, 0, 0)),// info-header size
      leU32(lit(width.toLong)),
      leU32(h),                     // positive = bottom-up
      lit(infoTail),
      pixelArray)
  }

  /** [[Decoder]] backed by the real [[Wav]] parser: byte statistics run
    * over the DECODED PCM payload (FakeDecoder's arithmetic, real bytes),
    * dims carry (sampleRate, channels). */
  object WavDecoder extends Decoder {
    def decode(blob: Array[Byte]): MediaFeatures = {
      val w = Wav.parse(blob)
      val hist = new Array[Long](16)
      var sum = 0L
      var i = w.dataOffset
      while (i < w.dataOffset + w.dataBytes) {
        val b = blob(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      val mean = if (w.dataBytes == 0) 0.0 else sum.toDouble / w.dataBytes
      MediaFeatures(w.dataBytes.toLong, w.sampleRate, w.channels, mean, hist)
    }
  }

  /** Batched REAL WAV decode: one parser pass per blob, typed integer
    * sample statistics out — (id, sample_rate, channels, bits, n_samples,
    * sum_samples, sum_squares, max_abs), all exact. Same mapPartitions
    * shape as [[decodeFeatures]]. */
  def decodeWav(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val w = Wav.parse(blob)
        (id, w.sampleRate, w.channels, w.bitsPerSample,
          w.nSamples, w.sumSamples, w.sumSquares, w.maxAbs)
      })
      .toDF(idCol, "sample_rate", "channels", "bits",
        "n_samples", "sum_samples", "sum_squares", "max_abs")
  }

  /** Little-endian u32 as 4 binary bytes, composed from plain expressions. */
  /** A parsed ISO-BMFF (MP4) container: movie-header timing, track count
    * + first track's pixel dimensions, and the media-data payload's byte
    * statistics. All integers — exact cross-engine. */
  final case class Mp4Info(
      brand: String, nTopBoxes: Int, timescale: Long, duration: Long,
      nTracks: Int, width: Long, height: Long,
      mdatBytes: Long, mdatSum: Long, mdatMax: Int)

  /** Pure-JVM ISO-BMFF box walker — the decode seam's VIDEO-side real
    * implementation (next to [[Wav]] and [[Bmp]]; the box layer needs no
    * codec: `[u32 BE size][4cc type][payload]`, nested for `moov`/`trak`).
    * Walks top-level boxes generically (unknown boxes — `free`/`skip`/… —
    * skip by declared size; size 1 = 64-bit largesize; size 0 = to EOF),
    * reads `ftyp`'s major brand, descends `moov` for `mvhd`
    * (timescale/duration) and each `trak`'s `tkhd` (16.16 fixed-point
    * width/height — first track wins), and stats the `mdat` payload.
    * Bounds arithmetic in Long throughout (a hostile 32-bit size must hit
    * the requires, not overflow past them — the Bmp lesson). Strict:
    * anything that is not a version-0 BMFF movie throws. */
  object Mp4 {
    def parse(blob: Array[Byte]): Mp4Info = {
      def u32(o: Long): Long = {
        val i = o.toInt
        (blob(i) & 0xffL) << 24 | (blob(i + 1) & 0xffL) << 16 |
          (blob(i + 2) & 0xffL) << 8 | (blob(i + 3) & 0xffL)
      }
      def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
      def tag(o: Long): String =
        new String(blob, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val total = blob.length.toLong
      require(total >= 8, "not an ISO-BMFF container")

      var brand: String = null
      var nTop = 0
      var timescale = -1L; var duration = -1L
      var nTracks = 0; var width = -1L; var height = -1L
      var mdN = 0L; var mdSum = 0L; var mdMax = 0

      /** One box at `off` inside [start, end): returns (bodyOff, boxEnd). */
      def boxAt(off: Long, end: Long): (String, Long, Long) = {
        require(off + 8 <= end, "truncated box header")
        val size0 = u32(off)
        val typ = tag(off + 4)
        val (hdr, size) =
          if (size0 == 1L) {
            require(off + 16 <= end, s"box '$typ': truncated largesize")
            (16L, u64(off + 8))
          } else if (size0 == 0L) (8L, end - off)
          else (8L, size0)
        // size <= end - off, NOT off + size <= end: a hostile 64-bit
        // largesize near 2^63 would wrap the addition past the check
        require(size >= hdr && size <= end - off,
          s"box '$typ' overruns its container")
        (typ, off + hdr, off + size)
      }

      def walkTrak(body: Long, end: Long): Unit = {
        var off = body
        while (off < end) {
          val (typ, b, e) = boxAt(off, end)
          if (typ == "tkhd") {
            require(e - b >= 84, "tkhd too short") // version-0 body size
            require((blob(b.toInt) & 0xff) == 0, "only version-0 tkhd supported")
            if (width < 0) { // first track's dims win
              width = u32(b + 76) >> 16 // 16.16 fixed point
              height = u32(b + 80) >> 16
            }
          }
          off = e
        }
      }

      def walkMoov(body: Long, end: Long): Unit = {
        var off = body
        while (off < end) {
          val (typ, b, e) = boxAt(off, end)
          typ match {
            case "mvhd" =>
              require(e - b >= 20, "mvhd too short")
              require((blob(b.toInt) & 0xff) == 0, "only version-0 mvhd supported")
              timescale = u32(b + 12)
              duration = u32(b + 16)
            case "trak" =>
              nTracks += 1
              walkTrak(b, e)
            case _ => () // udta/iods/…: skipped by size
          }
          off = e
        }
      }

      var off = 0L
      while (off < total) {
        val (typ, body, end) = boxAt(off, total)
        typ match {
          case "ftyp" =>
            require(end - body >= 4, "ftyp too short")
            brand = tag(body)
          case "moov" => walkMoov(body, end)
          case "mdat" =>
            var i = body
            while (i < end) {
              val b = blob(i.toInt) & 0xff
              mdN += 1; mdSum += b; if (b > mdMax) mdMax = b
              i += 1
            }
          case _ => () // free/skip/…: skipped by size
        }
        nTop += 1
        off = end
      }
      require(brand != null, "missing ftyp box")
      require(timescale > 0 && duration >= 0, "missing moov/mvhd box")
      Mp4Info(brand, nTop, timescale, duration, nTracks,
        math.max(width, 0L), math.max(height, 0L), mdN, mdSum, mdMax)
    }
  }

  /** Demuxed frame statistics: the frame plan read from the DECLARED
    * sample tables plus every `stride`-th frame's byte statistics. */
  final case class Mp4Frames(
      nFrames: Long, frameMs: Long, nSampled: Long,
      sampledBytes: Long, sampledSum: Long, sampledMax: Int)

  /** The container's declared frame plan: per-frame absolute byte ranges
    * plus the single-run frame duration — the demux walk shared by the
    * stats sampler ([[demuxSample]]) and the per-frame video decoder
    * ([[decodeVideoFrames]]). Every range is bounds-checked against the
    * blob before it is returned. */
  final case class FramePlan(frameMs: Long, offsets: Array[Long],
                             sizes: Array[Long])

  /** Walk the MP4 sample tables (`stbl`: `stts` per-frame duration,
    * `stsz` constant-or-per-sample sizes, `stco` chunk offset) and return
    * the frame plan — frames are located through the container's OWN
    * tables, never by assuming the payload sits at a known offset or
    * splits at fixed boundaries. Strict on the structure it reads
    * (version-0 tables, one chunk), generic on everything else (walks by
    * size like [[Mp4.parse]]). */
  def framePlan(blob: Array[Byte]): FramePlan = {
    def u32(o: Long): Long = {
      val i = o.toInt
      (blob(i) & 0xffL) << 24 | (blob(i + 1) & 0xffL) << 16 |
        (blob(i + 2) & 0xffL) << 8 | (blob(i + 3) & 0xffL)
    }
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
    def tag(o: Long): String =
      new String(blob, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val total = blob.length.toLong
    var frameMs = -1L
    var nFrames = -1L
    var constSize = -1L
    var sizes: Array[Long] = null
    var chunkOff = -1L

    def walk(body: Long, end: Long, path: List[String]): Unit = {
      var off = body
      while (off < end) {
        require(off + 8 <= end, "truncated box header")
        val size0 = u32(off)
        val typ = tag(off + 4)
        // same header grammar as Mp4.parse's boxAt: size0==1 carries a
        // 64-bit largesize after the tag (a container Mp4.parse accepts
        // must not fail here with a misleading "overruns")
        val (hdr, size) =
          if (size0 == 1L) {
            require(off + 16 <= end, s"box '$typ': truncated largesize")
            (16L, u64(off + 8))
          } else if (size0 == 0L) (8L, end - off)
          else (8L, size0)
        require(size >= hdr && size <= end - off, s"box '$typ' overruns")
        val b = off + hdr
        (path, typ) match {
          case (Nil, "moov") | (List("moov"), "trak") |
               (List("trak", "moov"), "mdia") |
               (List("mdia", "trak", "moov"), "minf") |
               (List("minf", "mdia", "trak", "moov"), "stbl") =>
            walk(b, off + size, typ :: path)
          case (List("stbl", _*), "stts") if frameMs < 0 =>
            require(size - 8 >= 16, "stts too short")
            require(u32(b + 4) == 1L, "expected one stts entry")
            frameMs = u32(b + 12) // delta of the single run
          case (List("stbl", _*), "stsz") if nFrames < 0 =>
            require(size - 8 >= 12, "stsz too short")
            constSize = u32(b + 4)
            nFrames = u32(b + 8)
            if (constSize == 0L) { // per-sample sizes follow
              require(size - 8 >= 12 + 4 * nFrames, "stsz table too short")
              sizes = Array.tabulate(nFrames.toInt)(i => u32(b + 12 + 4L * i))
            }
          case (List("stbl", _*), "stco") if chunkOff < 0 =>
            require(size - 8 >= 12, "stco too short")
            require(u32(b + 4) == 1L, "expected one chunk")
            chunkOff = u32(b + 8)
          case _ => () // skipped by size
        }
        off += size
      }
    }
    walk(0L, total, Nil)
    require(nFrames >= 0 && chunkOff >= 0 && frameMs >= 0,
      "missing stbl sample tables (stts/stsz/stco)")

    val offs = new Array[Long](nFrames.toInt)
    val szs = new Array[Long](nFrames.toInt)
    var i = 0
    var off = chunkOff
    while (i < nFrames) {
      val sz = if (constSize > 0) constSize else sizes(i)
      require(off + sz <= total, s"frame $i overruns the blob")
      offs(i) = off; szs(i) = sz
      off += sz
      i += 1
    }
    FramePlan(frameMs, offs, szs)
  }

  /** REAL frame sampling — the stats layer over [[framePlan]]: every
    * `stride`-th declared frame's byte statistics. */
  def demuxSample(blob: Array[Byte], stride: Int): Mp4Frames = {
    require(stride >= 1, "stride must be positive")
    val plan = framePlan(blob)
    var i = 0
    var n = 0L; var bytes = 0L; var sum = 0L; var mx = 0
    while (i < plan.offsets.length) {
      if (i % stride == 0) {
        n += 1
        var j = plan.offsets(i)
        val end = plan.offsets(i) + plan.sizes(i)
        while (j < end) {
          val v = blob(j.toInt) & 0xff
          bytes += 1; sum += v; if (v > mx) mx = v
          j += 1
        }
      }
      i += 1
    }
    Mp4Frames(plan.offsets.length.toLong, plan.frameMs, n, bytes, sum, mx)
  }

  /** Batched real demux: (id, n_frames, frame_ms, n_sampled,
    * sampled_bytes, sampled_sum, sampled_max). */
  def demuxMp4(df: DataFrame, idCol: String, blobCol: String,
               stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val f = demuxSample(blob, stride)
        (id, f.nFrames, f.frameMs, f.nSampled, f.sampledBytes, f.sampledSum,
          f.sampledMax.toLong)
      })
      .toDF(idCol, "n_frames", "frame_ms", "n_sampled", "sampled_bytes",
        "sampled_sum", "sampled_max")
  }

  /** Mux pre-encoded video frames (MJPEG: each sample is a whole baseline
    * JPEG) into a minimal REAL ISO-BMFF movie: `ftyp` + `moov` whose
    * nested `trak`→`mdia`→`minf`→`stbl` declares exactly the frame plan —
    * `stts` one run at `frameMs` per frame, per-sample `stsz` (entropy-
    * coded frames vary in size), `stco` one chunk at the mdat payload's
    * ABSOLUTE offset — then `mdat` with the concatenated frames. The
    * product round-trips through [[framePlan]]/[[demuxSample]] by
    * construction (reference qvarn-mr has no media code; the container
    * layout is the public ISO/IEC 14496-12 box grammar). */
  def muxMjpeg(frames: Seq[Array[Byte]], frameMs: Int): Array[Byte] = {
    require(frames.nonEmpty && frameMs >= 1, "need >=1 frame and a duration")
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(tag: String, body: Array[Byte]*): Array[Byte] = {
      val n = 8L + body.map(_.length.toLong).sum
      val out = new java.io.ByteArrayOutputStream(n.toInt)
      out.write(be32(n))
      out.write(tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      body.foreach(out.write)
      out.toByteArray
    }
    val n = frames.length.toLong
    val verFlags = Array[Byte](0, 0, 0, 0)
    val stts = box("stts", verFlags, be32(1L), be32(n), be32(frameMs.toLong))
    val stsz = box("stsz", verFlags, be32(0L), be32(n),
      frames.toArray.flatMap(f => be32(f.length.toLong)))
    // stco's chunk offset is absolute in the FILE — computed from the
    // sizes of everything that precedes the mdat payload; stco itself is
    // fixed-size, so the layout solves in one pass
    val stcoLen = 8 + 4 + 8
    def wrap(inner: Array[Byte], tags: String*): Array[Byte] =
      tags.foldLeft(inner)((acc, t) => box(t, acc))
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII), be32(0L))
    val moovLen = 8 + (8 * 4) + stts.length + stsz.length + stcoLen
    val chunkOff = ftyp.length.toLong + moovLen + 8L
    val stco = box("stco", verFlags, be32(1L), be32(chunkOff))
    val moov = wrap(stts ++ stsz ++ stco,
      "stbl", "minf", "mdia", "trak", "moov")
    assert(moov.length == moovLen, s"moov layout drifted: ${moov.length}")
    val mdat = box("mdat", frames.toArray.flatten)
    ftyp ++ moov ++ mdat
  }

  /** Wrap payload bytes into an MJPEG-in-MP4 movie: consecutive
    * `frameBytes`-byte payload slices each become one DC-only grayscale
    * JPEG frame ([[Jpeg.encodeGray]]), muxed by [[muxMjpeg]]. Payload
    * length must be a positive multiple of `frameBytes`; callers
    * truncate. Same `mapPartitions` seam as [[jpegBlob]]. */
  def mjpegBlob(df: DataFrame, idCol: String, payloadCol: String,
                frameBytes: Int, frameMs: Int): DataFrame = {
    require(frameBytes >= 1, "frameBytes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        require(p.nonEmpty && p.length % frameBytes == 0,
          s"payload must be a positive multiple of $frameBytes bytes")
        val frames = p.grouped(frameBytes).map(Jpeg.encodeGray(_)).toSeq
        (id, muxMjpeg(frames, frameMs))
      })
      .toDF(idCol, "blob")
  }

  /** REAL video-FRAME decode — the composition the demux and image sides
    * meet at: the container's own sample tables locate each frame
    * ([[framePlan]], a header-only planning pass), the frames fan out
    * across tasks through ONE keyed shuffle, and every frame runs the
    * full baseline-JPEG pipeline ([[Jpeg.parse]]: canonical Huffman, DC
    * prediction, dequant, IDCT). Output is one row per frame with exact
    * integer pixel statistics — at 100 TB a two-hour video decodes
    * cluster-wide instead of serializing on the task that read the blob
    * (the same argument as [[decodeJpegColorParallel]], one level up). */
  def decodeVideoFrames(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // planning pass: stbl walk + frame slicing only — no entropy work
    // (no Par.ensure guard: the keyed repartition below is the spread)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val plan = framePlan(blob)
        plan.offsets.indices.map { i =>
          (id, i, i * plan.frameMs, java.util.Arrays.copyOfRange(blob,
            plan.offsets(i).toInt, (plan.offsets(i) + plan.sizes(i)).toInt))
        }
      }
      .toDF(idCol, "frame_idx", "pts_ms", "frame")
      // each (video, frame) to its own task — the one real shuffle
      .repartition(col(idCol), col("frame_idx"))
      .as[(Long, Int, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, idx, pts, fb) =>
        val j = Jpeg.parse(fb)
        (id, idx, pts, j.width, j.height, j.nPixels, j.sumPx, j.maxPx,
          j.topLeftHex)
      })
      .toDF(idCol, "frame_idx", "pts_ms", "width", "height", "n_px",
        "sum_px", "max_px", "topleft_hex")
  }

  /** A minimal 4:1:1-SAMPLED progressive JPEG header (SOI + 3-component
    * SOF2 with Y=4×1 + EOI) — the seam's remaining progressive rejection
    * class (grayscale, 4:4:4, 4:2:0 AND 4:2:2 progressive all decode for
    * real via [[Jpeg.parse]]/[[Jpeg.parseColor]]); classification reads
    * the marker kind, component count, and sampling layout. */
  val ProgressiveJpegStub: Array[Byte] = Array(
    0xff, 0xd8, 0xff, 0xc2, 0x00, 0x11, 8, 0, 8, 0, 8, 3,
    1, 0x41, 0, 2, 0x11, 1, 3, 0x11, 1,
    0xff, 0xd9).map(_.toByte)

  /** A minimal ARITHMETIC-CODED progressive JPEG header (SOI + DAC +
    * 3-component SOF10 at 4:2:0 + EOI) — the named rejection class for
    * T.81's arithmetic entropy coder: the layout would decode, the
    * entropy coding is what the seam rejects (SOF9/SOF10 by name). */
  val ArithmeticJpegStub: Array[Byte] = Array(
    0xff, 0xd8,
    0xff, 0xcc, 0x00, 0x04, 0x00, 0x10, // DAC: DC table 0, default Kx
    0xff, 0xca, 0x00, 0x11, 8, 0, 8, 0, 8, 3, // SOF10 8×8, 3 components
    1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1, // 4:2:0 — layout itself fine
    0xff, 0xd9).map(_.toByte)

  /** A minimal GRAYSCALE (color type 0) PNG header (signature + IHDR
    * with a correct CRC) — formerly a named rejection class; since
    * round 12 the decoder covers grayscale too, so the survey counts
    * this class as DECODABLE (label unchanged for series continuity). */
  val PngGrayStub: Array[Byte] = {
    val ihdr = Array[Byte](0, 0, 0, 8, 0, 0, 0, 8, 8, 0, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr)
    def be(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    Png.Signature ++ be(13L) ++ "IHDR".getBytes("US-ASCII") ++ ihdr ++
      be(crc.getValue)
  }

  /** Cheap STRUCTURAL classification of one media blob — magic bytes plus
    * the header fields that determine decodability, zero decode work:
    * JPEG's first SOF marker kind (baseline C0 and progressive C2 —
    * [[Jpeg.parse]]'s real T.81 G.2 path — both accepted for gray 1×1
    * and color 4:4:4 / 4:2:0 / 4:2:2, baseline additionally for 4:1:1,
    * rejected for other layouts such as progressive 4:1:1 or 4:4:0;
    * the other SOFn rejected by
    * name), PNG's IHDR depth/color/interlace, and the BMP/WAV/MP4
    * container magics. Returns (format label, whether this seam's
    * decoders accept it). */
  def classifyFormat(blob: Array[Byte]): (String, Boolean) = {
    def u8(i: Int) = blob(i) & 0xff
    def ascii(o: Int, n: Int) = new String(blob, o, n,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (blob.length >= 8 &&
        Png.Signature.indices.forall(i => blob(i) == Png.Signature(i))) {
      if (blob.length < 33) ("png_truncated", false)
      else {
        val depth = u8(24); val color = u8(25); val interlace = u8(28)
        // depth 8: gray/truecolor/palette/gray+alpha/RGBA; depth 16:
        // everything but palette (16-bit palette does not exist in the
        // spec) — both interlace modes. Grayscale (0/4) decodes since
        // round 12 (the png16 reclassification precedent); the label
        // keeps the _gray suffix so the survey series stays comparable.
        val gray = color == 0 || color == 4
        (if (gray) s"png${depth}_gray" else s"png$depth",
          (depth == 8 && Set(0, 2, 3, 4, 6)(color) ||
            depth == 16 && Set(0, 2, 4, 6)(color)) && interlace <= 1)
      }
    } else if (blob.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: (String, Boolean) = ("jpeg_headerless", false)
      var done = false
      while (!done && i + 3 < blob.length) {
        if (u8(i) != 0xff) done = true // desynced: not a marker stream
        else {
          val m = u8(i + 1)
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
          else if (m == 0xd9) done = true
          else {
            val len = (u8(i + 2) << 8) | u8(i + 3)
            // decodable layouts: gray 1×1 and color 4:4:4 / 4:2:0 /
            // 4:2:2 on both paths; 4:1:1 decodes on the BASELINE path
            // only (round 12, by measured share) — progressive 4:1:1
            // stays the named rejection; anything else (4:4:0, …)
            // rejected by the declared factors
            def layoutOk(base: Boolean): Boolean = {
              val nComp = if (i + 9 < blob.length) u8(i + 9) else 0
              val samp = (0 until nComp).map { c =>
                if (i + 11 + 3 * c < blob.length) u8(i + 11 + 3 * c) else 0
              }
              (nComp == 1 && samp == Seq(0x11)) ||
                (nComp == 3 && (samp == Seq(0x11, 0x11, 0x11) ||
                  samp == Seq(0x22, 0x11, 0x11) ||
                  samp == Seq(0x21, 0x11, 0x11) ||
                  (base && samp == Seq(0x41, 0x11, 0x11))))
            }
            m match {
              case 0xc0 => res = ("jpeg_baseline", layoutOk(true)); done = true
              case 0xc2 => res = ("jpeg_progressive", layoutOk(false)); done = true
              // other frame kinds (extended sequential, lossless,
              // arithmetic, hierarchical) — named, rejected
              case mm if mm >= 0xc1 && mm <= 0xcf &&
                  mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
                res = (f"jpeg_sof$mm%02x", false); done = true
              case _ => ()
            }
            i += 2 + len
          }
        }
      }
      res
    } else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M')
      ("bmp", true)
    else if (blob.length >= 12 && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE") ("wav", true)
    else if (blob.length >= 4 && ascii(0, 4) == "fLaC") ("flac", true)
    else if (blob.length >= 12 && ascii(4, 4) == "ftyp") ("mp4", true)
    else if (blob.length >= 4 && (ascii(0, 3) == "ID3" ||
        (u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0))) {
      // MP3-class: ID3v2 prefix or a raw MPEG sync word. Decodable at the
      // HEADER-WALK level iff the first header declares MPEG-1 Layer III
      // with in-range bitrate/samplerate (PCM synthesis is the recorded
      // rejection — PLANS.md round 12); other MPEG versions/layers are
      // the named remainder.
      val h = if (ascii(0, 3) == "ID3") -1 else u8(1)
      if (h < 0) ("mp3", true) // ID3-prefixed: walker validates frames
      else if ((h & 0x18) == 0x18 && (h & 0x06) == 0x02 &&
          blob.length >= 3 && (u8(2) >> 4) >= 1 && (u8(2) >> 4) <= 14 &&
          ((u8(2) >> 2) & 0x3) <= 2) ("mp3", true)
      else ("mpeg_audio_other", false)
    }
    else ("unknown", false)
  }

  /** MP3 fixture staging ([[Mp3.build]]): deterministic frame streams,
    * every parameter doc_id arithmetic. */
  def mp3Blob(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, Mp3.build(id, p)) })
      .toDF(idCol, "blob")
  }

  /** Batched MP3 header walk ([[Mp3.parse]]): frame count, samplerate,
    * CBR/VBR, peak bitrate, frame-exact duration, ID3 presence — the
    * audio data-card fields a curation pipeline reads without paying for
    * PCM synthesis. */
  def decodeMp3Survey(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val m = Mp3.parse(blob)
        (id, m.nFrames, m.sampleRate, m.cbr, m.maxKbps, m.durationMs,
          m.hasId3)
      })
      .toDF(idCol, "n_frames", "sample_rate", "cbr", "max_kbps",
        "duration_ms", "has_id3")
  }

  /** No-decode FORMAT SURVEY — the production pre-pass that measures what
    * share of a corpus the decode seam accepts BEFORE spending decode
    * cycles on it: one structural classification per blob, a narrow
    * map over the scan (the blob never shuffles). Output: (id, format,
    * decodable). */
  def formatSurvey(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val (format, ok) = classifyFormat(blob)
        (id, format, ok)
      })
      .toDF(idCol, "format", "decodable")
  }

  /** Batched MP4 decode: (id, brand, n_boxes, timescale, duration,
    * n_tracks, width, height, mdat_bytes, mdat_sum, mdat_max) per blob.
    * Same mapPartitions shape as [[decodeWav]]/[[decodeBmp]]. */
  def decodeMp4(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val m = Mp4.parse(blob)
        (id, m.brand, m.nTopBoxes.toLong, m.timescale, m.duration,
          m.nTracks.toLong, m.width, m.height, m.mdatBytes, m.mdatSum,
          m.mdatMax.toLong)
      })
      .toDF(idCol, "brand", "n_boxes", "timescale", "duration", "n_tracks",
        "width", "height", "mdat_bytes", "mdat_sum", "mdat_max")
  }

  /** Wrap a payload column into a REAL ISO-BMFF movie as pure expressions
    * (the video twin of [[wavBlob]]/[[bmpBlob]]): `ftyp` (isom), `moov`
    * with a version-0 `mvhd` (timescale 1000, data-dependent duration)
    * and TWO `trak` children — the video track carries `w`×`h` in 16.16
    * fixed point PLUS a full `mdia`→`minf`→`stbl` sample-table chain
    * (stsd/stts/stsc/stsz/stco) declaring `frameBytes`-byte frames at
    * `frameMs` each, located by an ABSOLUTE chunk offset into the `mdat`
    * payload — so [[demuxSample]] finds frames through the container's
    * own tables, never by layout assumption; then a dimensionless audio
    * track. A `free` box forces size-based skipping, and box sizes are
    * big-endian — a RIFF-minded parser reads garbage immediately. */
  def mp4Blob(payload: Column, durationCol: Column, w: Column, h: Column,
              frameBytes: Int = 200, frameMs: Int = 40): Column = {
    def beInt(x: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(x).array()
    def box(typ: String, body: Column*): Column = {
      val bodyCat = concat(body: _*)
      concat(beU32(length(bodyCat).cast("long") + lit(8L)),
        lit(typ.getBytes("US-ASCII")), bodyCat)
    }
    val ftyp = lit({
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.putInt(24).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
      bb.array()
    })
    // mvhd: verflags, creation, modification | timescale | duration | tail
    val mvhd = box("mvhd",
      lit(new Array[Byte](12)),
      beU32(lit(1000L)), beU32(durationCol),
      lit({
        val bb = java.nio.ByteBuffer.allocate(80)
        bb.putInt(0x00010000) // rate 1.0
          .putShort(0x0100.toShort).putShort(0) // volume, reserved
          .putLong(0L) // reserved
          // unity matrix
          .putInt(0x10000).putInt(0).putInt(0)
          .putInt(0).putInt(0x10000).putInt(0)
          .putInt(0).putInt(0).putInt(0x40000000)
        bb.position(bb.position() + 24) // pre_defined
        bb.putInt(3) // next track id
        bb.array()
      }))
    def tkhd(trackId: Int, wc: Column, hc: Column, volume: Int): Column =
      box("tkhd",
        lit({
          val bb = java.nio.ByteBuffer.allocate(12)
          bb.put(0.toByte).put(Array[Byte](0, 0, 7)) // version, flags (enabled)
            .putInt(0).putInt(0) // creation, modification
          bb.array()
        }),
        beU32(lit(trackId.toLong)),
        lit(new Array[Byte](4)), // reserved
        beU32(durationCol),
        lit({
          val bb = java.nio.ByteBuffer.allocate(52) // 8 res + 8 + 36 matrix
          bb.putLong(0L) // reserved
            .putShort(0).putShort(0) // layer, alternate_group
            .putShort(volume.toShort).putShort(0) // volume, reserved
            .putInt(0x10000).putInt(0).putInt(0)
            .putInt(0).putInt(0x10000).putInt(0)
            .putInt(0).putInt(0).putInt(0x40000000)
          bb.array()
        }),
        beU32(shiftleft(wc.cast("long"), 16)), // 16.16 fixed
        beU32(shiftleft(hc.cast("long"), 16)))
    // video track sample tables: n frames of frameBytes each (the payload
    // tail past n·frameBytes is container slack the tables never claim)
    val nFrames = floor(length(payload).cast("long") / lit(frameBytes))
      .cast("long")
    val mdhd = box("mdhd",
      lit(new Array[Byte](12)), // verflags, creation, modification
      beU32(lit(1000L)), beU32(durationCol),
      lit(Array[Byte](0x55, 0xc4.toByte, 0, 0))) // language 'und', pre_def
    val hdlr = box("hdlr",
      lit(beInt(0) ++ beInt(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](13))) // reserved ×3 + empty name
    val stsd = box("stsd",
      lit(beInt(0) ++ beInt(1) ++ beInt(16) ++
        "mp4v".getBytes("US-ASCII") ++ new Array[Byte](8)))
    val stts = box("stts",
      lit(beInt(0) ++ beInt(1)), beU32(nFrames), beU32(lit(frameMs.toLong)))
    val stsc = box("stsc",
      lit(beInt(0) ++ beInt(1) ++ beInt(1)), beU32(nFrames), lit(beInt(1)))
    val stsz = box("stsz",
      lit(beInt(0)), beU32(lit(frameBytes.toLong)), beU32(nFrames))
    // absolute file offset of the mdat BODY: ftyp(24) + moov(529) +
    // free(16) + mdat header(8) — every box above is fixed-size, so the
    // offset is a constant; Mp4Spec's demux round trip pins it
    val stco = box("stco",
      lit(beInt(0) ++ beInt(1)), beU32(lit(MdatBodyOffset)))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val mdia = box("mdia", mdhd, hdlr, box("minf", stbl))
    val moov = box("moov", mvhd,
      box("trak", tkhd(1, w, h, volume = 0), mdia),
      box("trak", tkhd(2, lit(0L), lit(0L), volume = 0x0100)))
    val free = lit({
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16).put("free".getBytes("US-ASCII")).putLong(0L)
      bb.array()
    })
    val mdat = box("mdat", payload)
    concat(ftyp, moov, free, mdat)
  }

  /** mdat body's absolute file offset in [[mp4Blob]]'s fixed layout:
    * ftyp 24 + moov 529 (mvhd 108; video trak 8+92 tkhd+213 mdia where
    * mdia = 8 + mdhd 32 + hdlr 33 + minf 140 (stbl 132: stsd 32, stts 24,
    * stsc 28, stsz 20, stco 20); audio trak 100) + free 16 + header 8. */
  private val MdatBodyOffset = 577L

  private def beU32(v: Column): Column = unhex(lpad(hex(v), 8, "0"))

  private def leU32(v: Column): Column = unhex(concat(
    lpad(hex(v.bitwiseAND(lit(255L))), 2, "0"),
    lpad(hex(shiftright(v, 8).bitwiseAND(lit(255L))), 2, "0"),
    lpad(hex(shiftright(v, 16).bitwiseAND(lit(255L))), 2, "0"),
    lpad(hex(shiftright(v, 24).bitwiseAND(lit(255L))), 2, "0")))

  /** Wrap a (even-length) PCM byte column into a REAL RIFF/WAVE container
    * — header, `fmt ` chunk, a JUNK chunk (so consumers must actually walk
    * chunks, not assume data at offset 44), and the `data` chunk — as pure
    * binary-concat expressions: the container is built inside codegen, no
    * UDF. 16-bit mono/`channels` PCM at `sampleRate`. */
  def wavBlob(pcm: Column, sampleRate: Int, channels: Int): Column =
    wavBlobFmt(pcm, sampleRate, channels, fmtCode = 1, bits = 16)

  /** G.711 RIFF container: format tag 7 (μ-law) or 6 (A-law), 8-bit
    * companded bytes — what telephony recordings actually ship as. */
  def wavG711Blob(bytes: Column, sampleRate: Int, channels: Int,
                  mulaw: Boolean): Column =
    wavBlobFmt(bytes, sampleRate, channels,
      fmtCode = if (mulaw) 7 else 6, bits = 8)

  /** Wrap payload bytes (the raw 4-bit nibble stream, 2 samples per
    * byte) into a REAL IMA ADPCM RIFF container (format tag 0x11):
    * payload split into `blockAlign`-byte blocks, each opening with the
    * 4-byte header (predictor 0, step index 0, reserved 0) — the last
    * block may run short. A `mapPartitions` seam like [[pngBlob]]: the
    * per-block header interleave is a byte-buffer walk, not a Catalyst
    * expression. */
  def wavAdpcmBlob(df: DataFrame, idCol: String, payloadCol: String,
                   sampleRate: Int = 8000,
                   blockAlign: Int = 12): DataFrame = {
    require(blockAlign >= 5, s"block align $blockAlign too small")
    val spark = df.sparkSession
    import spark.implicits._
    val dataBytes = blockAlign - 4
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val nBlocks = (p.length + dataBytes - 1) / dataBytes
        val dataLen = p.length + 4 * nBlocks
        val bb = java.nio.ByteBuffer.allocate(12 + 24 + 16 + 8 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(dataLen + 52)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(0x11.toShort).putShort(1.toShort) // IMA ADPCM, mono
          .putInt(sampleRate)
          .putInt(sampleRate * blockAlign / (2 * dataBytes + 1)) // approx
          .putShort(blockAlign.toShort).putShort(4.toShort)
          // a JUNK chunk keeps the chunk walk genuine, like wavBlobFmt
          .put("JUNK".getBytes("US-ASCII")).putInt(8).put(new Array[Byte](8))
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var o = 0
        while (o < p.length) {
          bb.putShort(0.toShort).put(0.toByte).put(0.toByte) // block header
          val nBytes = math.min(dataBytes, p.length - o)
          bb.put(p, o, nBytes)
          o += nBytes
        }
        (id, bb.array())
      })
      .toDF(idCol, "blob")
  }

  /** Wrap payload bytes into a REAL mono 16-bit FLAC stream
    * ([[Flac.encode]]): sample i = payload(i) − 128, frames of
    * `blockSize` samples whose subframe types cycle VERBATIM →
    * FIXED(1, two Rice partitions) → FIXED(2, escape-coded) → LPC(2) —
    * every decoder path reconstructs the same samples from genuinely
    * different wire forms. `mapPartitions` seam like [[pngBlob]]: an
    * entropy coder is not a Catalyst expression. */
  def flacBlob(df: DataFrame, idCol: String, payloadCol: String,
               sampleRate: Int = 8000, blockSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(payloadCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, Flac.encode(p.map(b => (b & 0xff) - 128), sampleRate, blockSize))
      })
      .toDF(idCol, "blob")
  }

  /** Batched REAL FLAC decode: frame walk, CRC-8/CRC-16 verification,
    * Rice residuals, inverse fixed/LPC prediction — typed integer sample
    * statistics out, same column shape as [[decodeWav]] plus the frame
    * count. */
  def decodeFlac(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val f = Flac.parse(blob)
        (id, f.sampleRate, f.channels, f.bitsPerSample, f.nFrames,
          f.nSamples, f.sumSamples, f.sumSquares, f.maxAbs)
      })
      .toDF(idCol, "sample_rate", "channels", "bits", "n_frames",
        "n_samples", "sum_samples", "sum_squares", "max_abs")
  }

  /** Splice a deterministic EXIF APP1 into each JPEG blob — byte order,
    * orientation, camera make/model, timestamp, and GPS sub-IFD all
    * derived from the id (every 5th image stays EXIF-FREE: absence is
    * data a survey must count, not an error). */
  def exifTagged(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, jpeg) =>
        if (id % 5 == 4) (id, jpeg)
        else {
          val gps = if (id % 3 == 0)
            Seq((1, (id % 90).toInt), (3, (id % 180).toInt)) else Nil
          (id, Exif.insertApp1(jpeg, Exif.app1(
            littleEndian = id % 2 == 0,
            orientation = (1 + id % 8).toInt,
            make = s"Cam${id % 7}", model = s"M-${id % 13}",
            dateTime = s"2026:01:0${1 + id % 9} 12:00:00", gps)))
        }
      })
      .toDF(idCol, "blob")
  }

  /** Batched EXIF extraction: the APP1 walk + TIFF-IFD parse per blob —
    * (id, byte_order, orientation, make, model, datetime, gps_present,
    * n_gps_tags). GPS presence is the release-governance flag. */
  def decodeExif(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.ops.Par.ensure(df.select(col(idCol).cast("long"), col(blobCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val e = Exif.parse(blob)
        (id, e.byteOrder, e.orientation, e.make, e.model, e.dateTime,
          e.gpsPresent, e.nGpsTags)
      })
      .toDF(idCol, "byte_order", "orientation", "make", "model",
        "datetime", "gps_present", "n_gps_tags")
  }

  private def wavBlobFmt(pcm: Column, sampleRate: Int, channels: Int,
                         fmtCode: Int, bits: Int): Column = {
    val bytesPerFrame = channels * (bits / 8)
    val bb = java.nio.ByteBuffer.allocate(24 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * bytesPerFrame)
      .putShort(bytesPerFrame.toShort).putShort(bits.toShort)
      .put("JUNK".getBytes("US-ASCII")).putInt(8).put(new Array[Byte](8))
    val fmtAndJunk = bb.array()
    val dataLen = length(pcm).cast("long")
    concat(
      lit("RIFF".getBytes("US-ASCII")),
      // 4 (WAVE) + 24 (fmt) + 16 (JUNK) + 8 (data header) + payload
      leU32(dataLen + lit(52L)),
      lit("WAVE".getBytes("US-ASCII")),
      lit(fmtAndJunk),
      lit("data".getBytes("US-ASCII")),
      leU32(dataLen),
      pcm)
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
