package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: metadata struct, frame sampling, byte-budget
  * repartitioning. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val blobs = Seq(
    (1L, "abcdefghij"), // 10 bytes
    (2L, "xy"),
    (3L, "")
  ).toDF("id", "text").withColumn("blob", encode(col("text"), "UTF-8"))

  test("perceptualHash matches a plain-Scala dHash reference") {
    def ref(bytes: Array[Byte], buckets: Int = 16): Long = {
      val n = bytes.length
      def lo(b: Int) = n * b / buckets
      val sums = (0 until buckets).map(b =>
        (lo(b) until lo(b + 1)).map(i => (bytes(i) & 0xff).toLong).sum)
      val cnts = (0 until buckets).map(b => (lo(b + 1) - lo(b)).toLong)
      (0 until buckets - 1).foldLeft(0L)((acc, b) =>
        acc + (if (sums(b) * cnts(b + 1) > sums(b + 1) * cnts(b)) 1L << b else 0L))
    }
    val docs = sf("documents").filter(col("doc_id") < 50)
      .withColumn("blob", encode(col("text"), "UTF-8"))
    val got = docs.select(col("doc_id"),
        Multimodal.perceptualHash(col("blob")).as("ph"),
        Multimodal.perceptualHashHof(col("blob")).as("ph_hof"), col("text"))
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == 50)
    got.foreach { case (id, ph, phHof, text) =>
      assert(ph == ref(text.getBytes("UTF-8")), s"doc $id")
      assert(ph == phHof, s"doc $id: kernel vs HOF")
    }
    // identical blobs hash identically; the empty blob is well-defined
    assert(ref(Array.emptyByteArray) == 0L)
    val e = blobs.filter(col("id") === 3L)
      .select(Multimodal.perceptualHash(col("blob"))).as[Long].collect().head
    assert(e == 0L)
  }

  test("withMeta attaches typed metadata (byte_len, checksum)") {
    val out = Multimodal.withMeta(blobs, "blob", "image", "raw")
      .select(col("id"), col("meta.media_type"), col("meta.byte_len"))
      .as[(Long, String, Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(out(1L) == (("image", 10L)))
    assert(out(3L) == (("image", 0L)))
  }

  test("sampleFrames splits blobs into fixed windows and keeps every stride-th") {
    val out = Multimodal.sampleFrames(blobs, "blob", frameBytes = 3, stride = 2)
      .select(col("id"), transform(col("frames"), f => length(f)).as("lens"))
      .as[(Long, Seq[Int])].collect().toMap
    // 10 bytes → frames [3,3,3,1], keep indices 0,2 → lengths [3,3]
    assert(out(1L) == Seq(3, 3))
    // 2 bytes → frames [2], keep index 0
    assert(out(2L) == Seq(2))
  }

  test("resizeStub keeps every stride-th byte, byte-exactly") {
    val out = blobs
      .select(col("id"), Multimodal.resizeStub(col("blob"), stride = 3).as("rz"))
      .as[(Long, Array[Byte])].collect().toMap
    val src = blobs.select(col("id"), col("blob"))
      .as[(Long, Array[Byte])].collect().toMap
    for ((id, blob) <- src) {
      val expect = blob.zipWithIndex.collect { case (b, i) if i % 3 == 0 => b }
      assert(out(id).toSeq == expect.toSeq, s"id $id")
    }
  }

  test("repartitionByBytes sizes partition count by cumulative blob bytes") {
    val out = Multimodal.repartitionByBytes(blobs, "blob", targetBytesPerPartition = 5)
    assert(out.rdd.getNumPartitions == 3) // 12 bytes total / 5 → ceil = 3
  }

  test("audio kernels: 16-bit LE PCM windowed energy + zero crossings") {
    // samples [1, -1, 300] as LE bytes; window=2 → windows [1,-1], [300]
    val pcm: Array[Byte] = Array(0x01, 0x00, 0xff.toByte, 0xff.toByte, 0x2c, 0x01)
    // trailing odd byte ignored; empty blob → zero windows
    val df = Seq((1L, pcm), (2L, pcm :+ 0x7f.toByte), (3L, Array.empty[Byte]))
      .toDF("id", "blob")
    val out = df.select(col("id"),
        Multimodal.audioEnergy(col("blob"), windowSamples = 2).as("en"),
        Multimodal.audioZeroCrossings(col("blob"), windowSamples = 2).as("zc"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // energies: 1²+(−1)² = 2, then 300² = 90000
    assert(out(1L) == (Seq(2L, 90000L), Seq(1L, 1L)))
    assert(out(2L) == out(1L), "trailing odd byte must be ignored")
    assert(out(3L) == (Seq.empty[Long], Seq.empty[Long]))
    // sign flips: 1→−1 lands in window 0 (sample 1), −1→300 in window 1
    // (sample 2) — already asserted via the zc vectors above
  }

  test("WAV parser: wavBlob round-trip, chunk walking, strictness") {
    // round-trip through the expression-built container (includes a JUNK
    // chunk before data, so offset-44 assumptions would fail)
    val pcm = Seq((1L, Array[Byte](1, 0, -1, -1, 44, 1)), // 1, -1, 300
                  (2L, Array.empty[Byte]))
      .toDF("id", "pcm")
    val out = pcm.withColumn("blob", Multimodal.wavBlob(col("pcm"), 8000, 1))
    val parsed = Multimodal.decodeWav(out, "id", "blob")
      .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(parsed(1L) == ((1L, 8000, 1, 16, 3L, 300L, 90002L, 300L)))
    assert(parsed(2L) == ((2L, 8000, 1, 16, 0L, 0L, 0L, 0L)))

    // hand-built container with an ODD-size chunk before data: the parser
    // must apply RIFF word alignment to find the data chunk
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16)
    val odd = "odd ".getBytes ++ le32(3) ++ Array[Byte](9, 9, 9, 0) // 3 + pad
    val data = "data".getBytes ++ le32(4) ++ Array[Byte](0, 1, 0, -128) // 256, -32768
    val body = "WAVE".getBytes ++ fmt ++ odd ++ data
    val wav = "RIFF".getBytes ++ le32(body.length) ++ body
    val w = Multimodal.Wav.parse(wav)
    assert(w.sampleRate == 44100 && w.channels == 2 && w.bitsPerSample == 16)
    assert(w.nSamples == 2 && w.sumSamples == 256L - 32768L && w.maxAbs == 32768L)

    // WavDecoder (the Decoder-seam hookup) reads payload stats, not header
    val mf = Multimodal.WavDecoder.decode(wav)
    assert(mf.dim1 == 44100 && mf.dim2 == 2 && mf.byteLen == 4L)

    // strictness: garbage and non-PCM must throw, not fake features
    intercept[IllegalArgumentException](Multimodal.Wav.parse("notawav".getBytes))
    val floatFmt = "fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(32)
    val floatBody = "WAVE".getBytes ++ floatFmt ++ data
    intercept[IllegalArgumentException](
      Multimodal.Wav.parse("RIFF".getBytes ++ le32(floatBody.length) ++ floatBody))
  }

  test("G.711: μ-law and A-law expand every byte to the reference sample") {
    // independent reference points from the G.711 tables: μ-law 0xFF/0x7F
    // encode ±0, 0x80 is the negative max −32124; A-law 0x55 is −8, the
    // positive max is 32256
    assert(Multimodal.Wav.mulawSample(0xFF) == 0)
    assert(Multimodal.Wav.mulawSample(0x7F) == 0)
    assert(Multimodal.Wav.mulawSample(0x80) == 32124)
    assert(Multimodal.Wav.mulawSample(0x00) == -32124)
    assert(Multimodal.Wav.alawSample(0x55) == -8)
    assert(Multimodal.Wav.alawSample(0xD5) == 8)
    assert(Multimodal.Wav.alawSample(0xAA) == 32256)
    assert(Multimodal.Wav.alawSample(0x2A) == -32256)
    // sign symmetry across the full byte range: flipping the sign bit of
    // the UNCOMPANDED code negates the sample
    for (b <- 0 until 128) {
      assert(Multimodal.Wav.mulawSample(b) == -Multimodal.Wav.mulawSample(b | 0x80))
      assert(Multimodal.Wav.alawSample(b ^ 0x55) == -Multimodal.Wav.alawSample((b | 0x80) ^ 0x55))
    }
    // decode magnitudes are monotone in the companded magnitude code
    val mus = (0 to 127).map(c => Multimodal.Wav.mulawSample(~c & 0xff))
    assert(mus == mus.sorted && mus.distinct == mus)

    // container round-trip through the expression-built G.711 WAV: all
    // 256 byte values in one payload, both codecs
    val all = Array.tabulate(256)(_.toByte)
    val df = Seq((1L, all)).toDF("id", "bytes")
    for (mulaw <- Seq(true, false)) {
      val out = df.withColumn("blob",
        Multimodal.wavG711Blob(col("bytes"), 8000, 1, mulaw))
      val got = Multimodal.decodeWav(out, "id", "blob")
        .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect().head
      val samples = all.map(b =>
        (if (mulaw) Multimodal.Wav.mulawSample(b & 0xff)
         else Multimodal.Wav.alawSample(b & 0xff)).toLong)
      assert(got == ((1L, 8000, 1, 8, 256L, samples.sum,
        samples.map(s => s * s).sum, samples.map(math.abs).max)))
    }
    // an unsupported compressed format tag still throws by name
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val adpcm = "fmt ".getBytes ++ le32(16) ++ le16(2) ++ le16(1) ++
      le32(8000) ++ le32(4000) ++ le16(1) ++ le16(4)
    val body = "WAVE".getBytes ++ adpcm ++ ("data".getBytes ++ le32(0))
    val msg = intercept[IllegalArgumentException](
      Multimodal.Wav.parse("RIFF".getBytes ++ le32(body.length) ++ body)).getMessage
    assert(msg.contains("unsupported WAV format 2"))
  }

  test("IMA ADPCM: step recurrence, clamps, block boundaries, round-trip") {
    import Multimodal.Wav
    // single-step contract over ALL (step index, nibble) pairs against an
    // independently-written expansion: diff accumulates step>>3 plus the
    // selected halvings — equivalently floor(step/8)+b0*floor(step/4)+…
    // computed here with integer division and explicit bit tests
    for (sidx <- 0 to 88; nib <- 0 to 15) {
      val step = Wav.AdpcmStepTable(sidx)
      val expDiff = step / 8 + (if (nib % 2 == 1) step / 4 else 0) +
        (if ((nib / 2) % 2 == 1) step / 2 else 0) +
        (if ((nib / 4) % 2 == 1) step else 0)
      val signed = if (nib >= 8) -expDiff else expDiff
      val (p, i) = Wav.adpcmStep(0, sidx, nib)
      assert(p == math.max(-32768, math.min(32767, signed)),
        s"sidx=$sidx nib=$nib")
      assert(i == math.max(0, math.min(88,
        sidx + Seq(-1, -1, -1, -1, 2, 4, 6, 8)(nib % 8))))
    }
    // predictor clamps at both rails: all-7 nibbles (max positive) then
    // all-15 (max negative) saturate without wrapping
    var st = (0, 0)
    for (_ <- 0 until 64) st = Wav.adpcmStep(st._1, st._2, 7)
    assert(st._1 == 32767, "positive rail must clamp")
    for (_ <- 0 until 128) st = Wav.adpcmStep(st._1, st._2, 15)
    assert(st._1 == -32768, "negative rail must clamp")

    // container round-trip: all 256 byte values as the nibble stream,
    // 12-byte blocks (8 data bytes → state resets every 16 nibbles + a
    // header sample 0 per block) vs an independent per-sample simulation
    val all = Array.tabulate(256)(_.toByte)
    def simulate(payload: Array[Byte]): (Long, Long, Long, Long) = {
      var n = 0L; var sum = 0L; var sq = 0L; var mx = 0L
      payload.grouped(8).foreach { bb =>
        var pred = 0; var sidx = 0
        n += 1 // the header's predictor is sample 0
        bb.foreach { b =>
          Seq(b & 0x0f, (b & 0xff) >> 4).foreach { nib =>
            val (p, i) = Wav.adpcmStep(pred, sidx, nib)
            pred = p; sidx = i
            n += 1; sum += p; sq += p.toLong * p
            mx = math.max(mx, math.abs(p).toLong)
          }
        }
      }
      (n, sum, sq, mx)
    }
    for (payload <- Seq(all, all.take(7), all.take(13), Array.empty[Byte])) {
      val df = Seq((1L, payload)).toDF("id", "bytes")
      val got = Multimodal.decodeWav(
          Multimodal.wavAdpcmBlob(df, "id", "bytes", 8000, 12), "id", "blob")
        .as[(Long, Int, Int, Int, Long, Long, Long, Long)].collect().head
      val (n, sum, sq, mx) = simulate(payload)
      assert(got == ((1L, 8000, 1, 4, n, sum, sq, mx)),
        s"payload of ${payload.length} bytes")
    }

    // hostile blocks fail by name: out-of-range step index, nonzero
    // reserved byte, truncated header
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def container(block: Array[Byte]) = {
      val fmt = "fmt ".getBytes ++ le32(16) ++ le16(0x11) ++ le16(1) ++
        le32(8000) ++ le32(4000) ++ le16(12) ++ le16(4)
      val body = "WAVE".getBytes ++ fmt ++
        ("data".getBytes ++ le32(block.length) ++ block)
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    def msgOf(block: Array[Byte]) = intercept[IllegalArgumentException](
      Wav.parse(container(block))).getMessage
    assert(msgOf(Array[Byte](0, 0, 89, 0, 1, 2)).contains("step index"))
    assert(msgOf(Array[Byte](0, 0, 0, 1, 1, 2)).contains("reserved"))
    assert(msgOf(Array[Byte](0, 0, 0)).contains("truncated ADPCM"))
  }

  test("BMP parser: bmpBlob round-trip, stride padding, row order, strictness") {
    // width 5 → 15 payload bytes/row, stride 16 (1 pad byte): the parser
    // must honour the stride or its channel sums shift by one per row
    val row0 = Array.tabulate[Byte](15)(i => (i + 1).toByte)        // bottom row
    val row1 = Array.tabulate[Byte](15)(i => (100 + i).toByte)      // top row
    val px = Seq((1L, row0 ++ row1), (2L, Array.empty[Byte])).toDF("id", "bgr")
    val out = px.withColumn("blob", Multimodal.bmpBlob(col("bgr"), width = 5))
    val parsed = Multimodal.decodeBmp(out, "id", "blob")
      .as[(Long, Int, Int, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val all = row0 ++ row1
    val sumB = all.zipWithIndex.collect { case (b, i) if i % 3 == 0 => b & 0xff }.sum.toLong
    val sumG = all.zipWithIndex.collect { case (b, i) if i % 3 == 1 => b & 0xff }.sum.toLong
    val sumR = all.zipWithIndex.collect { case (b, i) if i % 3 == 2 => b & 0xff }.sum.toLong
    val maxPx = all.grouped(3).map(_.map(_ & 0xff).sum.toLong).max
    // logical top-left pixel = first 3 bytes of the LAST stored row (bottom-up)
    assert(parsed(1L) == ((1L, 5, 2, 10L, sumB, sumG, sumR, maxPx, "646566")))
    assert(parsed(2L) == ((2L, 5, 0, 0L, 0L, 0L, 0L, 0L, "")))

    // the expression-built container is a REAL bottom-up padded BMP
    val blob = out.where(col("id") === 1L)
      .select(col("blob")).as[Array[Byte]].head()
    assert(blob.length == 54 + 2 * 16, "header + 2 padded rows")
    assert(blob(54 + 15) == 0 && blob(54 + 31) == 0, "row pad bytes present")

    // hand-built TOP-DOWN variant (negative height): logical top row is
    // now the FIRST stored row
    val td = blob.clone()
    val negH = -2
    td(22) = negH.toByte; td(23) = (negH >> 8).toByte
    td(24) = (negH >> 16).toByte; td(25) = (negH >> 24).toByte
    val w = Multimodal.Bmp.parse(td)
    assert(w.topDown && w.height == 2 && w.topLeftHex == "010203")
    assert(w.sumB == sumB && w.sumG == sumG && w.sumR == sumR)

    // REAL-pixel 2× resize on the same container: logical top row is the
    // LAST stored row, so output row 0 samples row1 at cols 0,2,4
    val rs = Multimodal.BmpOps.resizeStats(blob, stride = 2)
    val sel = Seq(0, 6, 12).map(o => (row1(o) & 0xff, row1(o + 1) & 0xff, row1(o + 2) & 0xff))
    assert(rs == Multimodal.BmpResize(3, 1, 3L,
      sel.map(_._1).sum.toLong, sel.map(_._2).sum.toLong, sel.map(_._3).sum.toLong,
      "707172"))
    // top-down variant samples row0 instead
    val rsTd = Multimodal.BmpOps.resizeStats(td, stride = 2)
    assert(rsTd.lastPxHex == "0D0E0F" && rsTd.nPx == 3L)
    // stride 1 resize = identity statistics
    val rs1 = Multimodal.BmpOps.resizeStats(blob, stride = 1)
    assert(rs1.nPx == 10L && rs1.sumB == sumB && rs1.sumG == sumG && rs1.sumR == sumR)

    // strictness: garbage, non-24-bit, and compressed DIBs must throw
    intercept[IllegalArgumentException](Multimodal.Bmp.parse("notabmp".getBytes))
    val bad8 = blob.clone(); bad8(28) = 8
    intercept[IllegalArgumentException](Multimodal.Bmp.parse(bad8))
    val rle = blob.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Multimodal.Bmp.parse(rle))
    val torn = blob.take(60) // pixel array overruns
    intercept[IllegalArgumentException](Multimodal.Bmp.parse(torn))
  }
}
