package graft

import graft.multimodal.{Jpeg, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG codec — the decode seam's second compressed format:
  * DC-only fixtures decode to EXACT flat blocks (the property the driver
  * oracle relies on), AC-bearing streams agree with an independent direct
  * 2-D IDCT, and non-baseline or torn streams fail loud by name. */
class JpegSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def stats(bytes: Array[Byte]): Jpeg.JpegInfo = {
    val bv = bytes.map(_ & 0xff)
    Jpeg.JpegInfo(8, 8 * bv.length, 64L * bv.length,
      64L * bv.map(_.toLong).sum, 64L * bv.map(b => b.toLong * b).sum,
      bv.max, bv.min, f"${bv(0)}%02X")
  }

  test("DC-only fixtures decode to EXACT flat blocks for every byte value") {
    // extremes, wrap-around jumps, and every DC-difference size category
    val hostile = Array[Byte](0, -1 /*255*/, 0, 127, -128 /*128*/, 1, -2, 64)
    assert(Jpeg.parse(Jpeg.encodeGray(hostile)) == stats(hostile))
    // all 256 byte values in one image: every category both directions
    val all = Array.tabulate(256)(i => i.toByte)
    assert(Jpeg.parse(Jpeg.encodeGray(all)) == stats(all))
    val rev = all.reverse
    assert(Jpeg.parse(Jpeg.encodeGray(rev)) == stats(rev))
    // one byte
    assert(Jpeg.parse(Jpeg.encodeGray(Array[Byte](42))) == stats(Array[Byte](42)))
  }

  test("AC coefficients: Huffman run/size + zigzag agree with a direct IDCT") {
    // blocks exercising EOB, ZRL, mid-run symbols (0x11/0x21/0x31/0x12),
    // and negative values; 2 blocks per row exercises the MCU grid walk
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      pairs.foreach { case (k, v) => b(k) = v }
      b
    }
    val blocks = Array(
      blk(0 -> 10, 1 -> 3, 2 -> -7),           // run-0 sizes
      blk(0 -> -5, 3 -> 2, 5 -> -1, 7 -> 4),   // run-1 gaps (0x11/0x12 path)
      blk(0 -> 0, 20 -> 6),                    // long zero run via ZRL
      blk(0 -> 100, 63 -> -3))                 // coefficient at the tail
    val blob = Jpeg.encodeBlocks(blocks, blocksPerRow = 2)
    val got = Jpeg.parse(blob)

    // independent reference: dequantize in zigzag order, direct 2-D IDCT
    val q = Array.tabulate(64)(i => if (i == 0) 8 else 5)
    def reference(zig: Array[Int]): Array[Int] = {
      val f = new Array[Double](64)
      for (k <- 0 until 64) f(Jpeg.Zigzag(k)) = (zig(k) * q(k)).toDouble
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += cu * cv * f(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
        }
        out(y * 8 + x) =
          math.max(0, math.min(255, math.round(s / 4.0 + 128.0).toInt))
      }
      out
    }
    val px = blocks.map(reference)
    val flat = px.flatten.map(_.toLong)
    assert(got.width == 16 && got.height == 16)
    assert(got.nPixels == 256L)
    assert(got.sumPx == flat.sum)
    assert(got.sumSq == flat.map(v => v * v).sum)
    assert(got.maxPx == flat.max && got.minPx == flat.min)
    assert(got.topLeftHex == f"${px(0)(0)}%02X")
  }

  test("non-baseline and torn streams fail loud by name") {
    val good = Jpeg.encodeGray(Array[Byte](10, 20, 30))
    def msgOf(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](Jpeg.parse(blob)).getMessage
    def markerAt(m: Int): Int = {
      val i = good.indexOfSlice(Array(0xff.toByte, m.toByte))
      require(i >= 0); i
    }
    assert(msgOf("JFIF but not really".getBytes).contains("SOI"))
    assert(msgOf(good.updated(markerAt(0xc0) + 1, 0xc2.toByte))
      .contains("progressive"))
    // 16-bit quant table: flip the DQT precision nibble
    assert(msgOf(good.updated(markerAt(0xdb) + 4, 0x10.toByte))
      .contains("16-bit quantization"))
    // multi-component frame
    val sof = markerAt(0xc0)
    assert(msgOf(good.updated(sof + 9, 3.toByte)).contains("single-component"))
    // restart interval spliced before SOS
    val sos = markerAt(0xda)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x08).map(_.toByte)
    assert(msgOf(good.take(sos) ++ dri ++ good.drop(sos)).contains("DRI"))
    // an unassigned Huffman pattern at the head of the scan
    val scanStart = sos + 2 + (((good(sos + 2) & 0xff) << 8) | (good(sos + 3) & 0xff))
    assert(msgOf(good.updated(scanStart, 0xf4.toByte))
      .contains("invalid Huffman code"))
    // scan cut mid-stream
    assert(msgOf(good.take(scanStart + 1)).contains("truncated"))
    // EOI dropped after an otherwise-complete scan
    assert(msgOf(good.dropRight(2)).contains("missing EOI"))
  }

  test("Spark plumbing: jpegBlob → decodeJpeg matches per-payload stats") {
    val docs = Seq((1L, "alpha"), (2L, "z"), (3L, "The quick brown fox."))
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val got = Multimodal.decodeJpeg(
        Multimodal.jpegBlob(docs, "doc_id", "px"), "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7), r.getString(8)))
    val want = Seq((1L, "alpha"), (2L, "z"), (3L, "The quick brown fox."))
      .map { case (id, tx) =>
        val o = stats(tx.getBytes("UTF-8"))
        (id, o.width, o.height, o.nPixels, o.sumPx, o.sumSq, o.maxPx,
          o.minPx, o.topLeftHex)
      }
    assert(got.toSeq == want)
  }
}
