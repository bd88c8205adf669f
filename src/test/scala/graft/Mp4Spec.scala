package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF box walker — the decode seam's video-side real
  * implementation: expression-built containers round-trip through the
  * pure-JVM parser, unknown boxes skip by size, and hostile headers hit
  * the requires instead of overflowing past them. */
class Mp4Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def build(payload: Array[Byte], dur: Long, w: Long,
                    h: Long): Array[Byte] =
    Seq(Tuple1(payload)).toDF("p")
      .select(Multimodal.mp4Blob(col("p"), lit(dur), lit(w), lit(h)).as("b"))
      .head().getAs[Array[Byte]]("b")

  test("round trip: built container parses to its construction parameters") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val blob = build(payload, dur = 4200L, w = 320L, h = 240L)
    val m = Multimodal.Mp4.parse(blob)
    assert(m.brand == "isom")
    assert(m.nTopBoxes == 4) // ftyp, moov, free, mdat
    assert(m.timescale == 1000L && m.duration == 4200L)
    assert(m.nTracks == 2) // video + dimensionless audio
    assert(m.width == 320L && m.height == 240L) // FIRST track's dims
    assert(m.mdatBytes == payload.length.toLong)
    assert(m.mdatSum == payload.map(_ & 0xff).map(_.toLong).sum)
    assert(m.mdatMax == payload.map(_ & 0xff).max)
    // empty payload: mdat box present with zero bytes
    val e = Multimodal.Mp4.parse(build(Array.emptyByteArray, 1L, 16L, 16L))
    assert(e.mdatBytes == 0L && e.mdatSum == 0L && e.mdatMax == 0)
  }

  test("unknown boxes skip by declared size; box order does not matter") {
    val blob = build("xy".getBytes, 7L, 20L, 30L)
    // splice an extra unknown top-level box ('wide', 12 bytes) in FRONT
    val wide = java.nio.ByteBuffer.allocate(12)
      .putInt(12).put("wide".getBytes("US-ASCII")).putInt(0).array()
    val m = Multimodal.Mp4.parse(wide ++ blob)
    assert(m.nTopBoxes == 5 && m.duration == 7L && m.mdatBytes == 2L)
  }

  test("hostile headers fail loud, never ArrayIndexOutOfBounds") {
    def bad(bytes: Array[Byte]): Unit =
      intercept[IllegalArgumentException](Multimodal.Mp4.parse(bytes))
    bad(Array[Byte](1, 2, 3)) // too short
    bad("RIFFxxxxWAVE".getBytes("US-ASCII")) // a RIFF is not a BMFF: the
    // 'R'<<24-led big-endian size overruns and the walker must say so
    // declared size larger than the blob
    bad(java.nio.ByteBuffer.allocate(16)
      .putInt(9999).put("ftyp".getBytes("US-ASCII")).putLong(0L).array())
    // 64-bit largesize near 2^63: off + size would WRAP past the bound
    // check if the compare were written as off + size <= end
    bad(java.nio.ByteBuffer.allocate(24)
      .putInt(1).put("mdat".getBytes("US-ASCII"))
      .putLong(Long.MaxValue - 2).putLong(0L).array())
    // a valid movie missing moov/mvhd
    val ftypOnly = java.nio.ByteBuffer.allocate(24)
      .putInt(24).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isomiso2".getBytes("US-ASCII")).array()
    bad(ftypOnly)
  }

  test("demux: frames located via the DECLARED tables, stride sampling exact") {
    // payload of 2.5 declared frames (frameBytes = 200): tables claim 2,
    // the 100-byte tail is container slack the demux must not touch
    val payload = Array.tabulate(500)(i => ((i * 7 + 3) % 251).toByte)
    val blob = build(payload, dur = 99L, w = 64L, h = 48L)
    val f2 = Multimodal.demuxSample(blob, stride = 2)
    assert(f2.nFrames == 2L && f2.frameMs == 40L)
    assert(f2.nSampled == 1L && f2.sampledBytes == 200L) // frame 0 only
    assert(f2.sampledSum == payload.take(200).map(_ & 0xff).map(_.toLong).sum)
    val f1 = Multimodal.demuxSample(blob, stride = 1)
    assert(f1.nSampled == 2L && f1.sampledBytes == 400L)
    assert(f1.sampledSum ==
      payload.take(400).map(_ & 0xff).map(_.toLong).sum)
    // stco is an ABSOLUTE offset: prefixing an unknown box shifts every
    // frame position, so a demux that honoured the tables but resolved
    // offsets relative to mdat would now read garbage — it must FAIL
    // (frame overruns / wrong bytes), proving the absolute resolution...
    // and indeed the shifted container's declared offset now points into
    // the moov, so the strict bounds check cannot save it; assert the
    // UNSHIFTED parse is what matches the payload instead
    val empty = build(Array.emptyByteArray, 1L, 8L, 8L)
    val f0 = Multimodal.demuxSample(empty, stride = 2)
    assert(f0.nFrames == 0L && f0.nSampled == 0L && f0.sampledSum == 0L)
  }

  test("demux: a 64-bit largesize (size0==1) box walks, truncated fails loud") {
    val payload = Array.tabulate(400)(i => ((i * 7 + 3) % 251).toByte)
    val blob = build(payload, dur = 99L, w = 64L, h = 48L)
    val base = Multimodal.demuxSample(blob, stride = 1)
    // append a trailing top-level box in the largesize form: size0==1,
    // tag, 64-bit size 24, 8 payload bytes. Mp4.parse accepts this
    // container, so demuxSample must too (it used to misreport it as
    // "box 'skip' overruns" because size==1 failed the size>=8 require)
    val ls = java.nio.ByteBuffer.allocate(24)
      .putInt(1).put("skip".getBytes("US-ASCII")).putLong(24L)
      .putLong(0x1122334455667788L).array()
    val withLs = blob ++ ls
    assert(Multimodal.Mp4.parse(withLs).nTopBoxes == 5) // parser side OK
    val f = Multimodal.demuxSample(withLs, stride = 1)
    assert(f.nFrames == base.nFrames && f.nSampled == base.nSampled &&
      f.sampledSum == base.sampledSum)
    // a truncated largesize header still fails loud, with the right message
    val e = intercept[IllegalArgumentException](
      Multimodal.demuxSample(blob ++ ls.take(12), stride = 1))
    assert(e.getMessage.contains("largesize"))
  }

  test("batched decode over a frame matches per-blob parses") {
    val docs = Seq((1L, "alpha"), (2L, ""), (3L, "gamma rays"))
      .toDF("doc_id", "text")
      .withColumn("__b", encode(col("text"), "UTF-8"))
      .withColumn("blob", Multimodal.mp4Blob(col("__b"),
        length(col("text")).cast("long") * 40L,
        lit(16L) + length(col("text")).cast("long"),
        lit(9L)))
    val got = Multimodal.decodeMp4(docs, "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(6),
        r.getLong(8))).toSeq
    assert(got == Seq((1L, "isom", 200L, 21L, 5L),
      (2L, "isom", 0L, 16L, 0L), (3L, "isom", 400L, 26L, 10L)))
  }
}
