package graft

import graft.multimodal.{Flac, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FLAC codec — the decode seam's lossless compressed audio format:
  * encoder output round-trips through the pure-JVM frame walk (Rice
  * residuals incl. partitions and escape codes, inverse fixed/LPC
  * prediction, UTF-8 frame numbers, CRC-8 + CRC-16 per frame), and
  * hostile streams hit named requires instead of decoding garbage. */
class FlacSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def payload(n: Int): Array[Int] =
    Array.tabulate(n)(i => ((i * 31 + 7) % 256) - 128)

  private def oracle(s: Array[Int], blockSize: Int = 64): Flac.FlacInfo =
    Flac.FlacInfo(8000, 1, 16,
      (s.length + blockSize - 1) / blockSize, s.length.toLong,
      s.map(_.toLong).sum, s.map(v => v.toLong * v).sum,
      if (s.isEmpty) 0L else s.map(v => math.abs(v).toLong).max)

  test("round trip: all four subframe kinds reconstruct exact samples") {
    // ≥ 4 frames cycles VERBATIM / FIXED(1) two-partition /
    // FIXED(2) escape-coded / LPC(2); short + tiny last frames too
    for (n <- Seq(0, 1, 2, 5, 64, 64 * 4, 64 * 3 + 1, 64 * 5 + 2, 300)) {
      val s = payload(n)
      assert(Flac.parse(Flac.encode(s)) == oracle(s), s"n=$n")
    }
    // full byte range and constant runs (Rice parameter 0 paths)
    val all = Array.tabulate(256)(i => i - 128)
    assert(Flac.parse(Flac.encode(all)) == oracle(all))
    val const = Array.fill(200)(7)
    assert(Flac.parse(Flac.encode(const)) == oracle(const))
    // full 16-bit dynamic range: large residuals through every predictor
    val wild = Array.tabulate(260)(i =>
      if (i % 3 == 0) 32767 else if (i % 3 == 1) -32768 else (i * 997) % 30000)
    assert(Flac.parse(Flac.encode(wild)) == oracle(wild))
    // non-default block size
    val s2 = payload(100)
    assert(Flac.parse(Flac.encode(s2, blockSize = 16)) ==
      oracle(s2, blockSize = 16))
  }

  test("hostile streams fail loud with named reasons") {
    def msgOf(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](Flac.parse(blob)).getMessage
    assert(msgOf("definitely not a flac stream, but long enough to parse"
      .getBytes).contains("magic"))
    assert(msgOf("fLa".getBytes).contains("too short"))

    val good = Flac.encode(payload(130)) // 3 frames
    // corrupt one byte in the last frame's body: CRC-16 catches it
    assert(msgOf(good.updated(good.length - 5,
      (good(good.length - 5) ^ 0x10).toByte)).contains("CRC-16"))
    // truncation mid-stream fails before fabricating samples
    assert(intercept[IllegalArgumentException](
      Flac.parse(good.dropRight(7))).getMessage.nonEmpty)
    // stereo / 24-bit STREAMINFO rejected by name (channels are bits
    // 4-6 of STREAMINFO byte 12; bps-1 spans its last bit + next byte)
    val stereo = good.clone; stereo(8 + 12) = (stereo(8 + 12) | 0x02).toByte
    assert(msgOf(stereo).contains("mono"))
    val deep = good.clone
    deep(8 + 13) = ((deep(8 + 13) & 0x0f) | 0x70).toByte // bps-1 = 23
    assert(msgOf(deep).contains("16-bit"))
    // a header bit flip breaks the CRC-8 before any sample decodes
    val firstFrame = 8 + 34 // magic + block header + STREAMINFO
    val badHdr = good.clone
    badHdr(firstFrame + 4) = (badHdr(firstFrame + 4) ^ 0x01).toByte
    val m = msgOf(badHdr)
    assert(m.contains("CRC-8") || m.contains("frame number"), m)
  }

  test("classifyFormat: FLAC is decodable by magic") {
    assert(Multimodal.classifyFormat(Flac.encode(payload(10))) ==
      ("flac", true))
  }

  test("Spark plumbing: flacBlob → decodeFlac matches the codec directly") {
    val docs = Seq((1L, Array.tabulate(70)(i => (i * 3 + 1).toByte)),
      (2L, Array.empty[Byte]),
      (3L, Array.tabulate(300)(i => (255 - i % 256).toByte)))
      .toDF("doc_id", "px")
    val got = Multimodal.decodeFlac(
        Multimodal.flacBlob(docs, "doc_id", "px", 8000, 64), "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    val want = Seq(
      (1L, Array.tabulate(70)(i => (i * 3 + 1).toByte)),
      (2L, Array.empty[Byte]),
      (3L, Array.tabulate(300)(i => (255 - i % 256).toByte))).map {
      case (id, p) =>
        val o = oracle(p.map(b => (b & 0xff) - 128))
        (id, o.nFrames, o.nSamples, o.sumSamples, o.sumSquares, o.maxAbs)
    }
    assert(got.toSeq == want)
  }
}
