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
    // flipping a gray SOF0 to SOF2 routes to the (real) progressive
    // decoder, which rejects the baseline scan header's spectral band
    assert(msgOf(good.updated(markerAt(0xc0) + 1, 0xc2.toByte))
      .contains("bad spectral band"))
    // flipping a COLOR SOF0 to SOF2 likewise: the progressive decoder
    // rejects the baseline scan layout instead of misreading it
    val colorBlob = Jpeg.encodeColor(Array[Byte](10, 20, 30, 40))
    val csof = colorBlob.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    assert(intercept[IllegalArgumentException](
      Jpeg.parseColor(colorBlob.updated(csof + 1, 0xc2.toByte)))
      .getMessage.contains("bad spectral band"))
    // 16-bit quant table: flip the DQT precision nibble
    assert(msgOf(good.updated(markerAt(0xdb) + 4, 0x10.toByte))
      .contains("16-bit quantization"))
    // component count flipped without the matching payload bytes
    val sof = markerAt(0xc0)
    assert(msgOf(good.updated(sof + 9, 3.toByte)).contains("component count"))
    // a DRI spliced before SOS promises restart markers the scan lacks:
    // the decoder must demand RST0 after the first MCU, loudly
    val sos = markerAt(0xda)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    assert(msgOf(good.take(sos) ++ dri ++ good.drop(sos))
      .contains("expected restart marker RST0"))
    // an unassigned Huffman pattern at the head of the scan
    val scanStart = sos + 2 + (((good(sos + 2) & 0xff) << 8) | (good(sos + 3) & 0xff))
    assert(msgOf(good.updated(scanStart, 0xf4.toByte))
      .contains("invalid Huffman code"))
    // scan cut mid-stream
    assert(msgOf(good.take(scanStart + 1)).contains("truncated"))
    // EOI dropped after an otherwise-complete scan
    assert(msgOf(good.dropRight(2)).contains("missing EOI"))
  }

  // ---- progressive (SOF2, T.81 G.2) ------------------------------------

  test("progressive: DC-only four-scan round trip equals the baseline decode") {
    for (payload <- Seq(
        Array[Byte](0, -1, 0, 127, -128, 1, -2, 64),
        Array.tabulate(256)(i => i.toByte),
        Array[Byte](42))) {
      val prog = Jpeg.encodeGrayProgressive(payload)
      assert(Jpeg.parse(prog) == stats(payload))
      assert(Jpeg.parse(prog) == Jpeg.parse(Jpeg.encodeGray(payload)))
      // really a different wire format: SOF2 present, SOF0 absent,
      // four SOS segments
      def count(m: Int) = prog.sliding(2).count(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == m)
      assert(count(0xc2) >= 1 && count(0xc0) == 0 && count(0xda) == 4)
    }
  }

  test("progressive: AC scans (EOBn runs, ZRL, refinement bits) ≡ baseline") {
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      pairs.foreach { case (k, v) => b(k) = v }
      b
    }
    // the adversarial mix: |v|=1 coefficients are INVISIBLE to the AC
    // first scan at Al=1 (magnitude>>1 == 0) and must appear as
    // newly-significant in the refinement scan; odd magnitudes need
    // correction bits; all-zero bands between coded blocks exercise
    // cross-block EOBn runs; a 20-zero gap exercises ZRL in both scans
    val blocks = Array(
      blk(0 -> 10, 1 -> 3, 2 -> -7, 4 -> 1),    // odd + newly-significant
      blk(),                                     // EOB run member
      blk(),                                     // EOB run member
      blk(0 -> -5, 3 -> 2, 5 -> -1, 30 -> 5),   // negative newly-significant
      blk(0 -> 0, 25 -> 6, 26 -> 1, 63 -> -1),  // tail coefficients
      blk(0 -> 100, 1 -> 1, 22 -> -3),          // long gap after early ±1
      blk(),                                     // trailing EOB run
      blk(0 -> 1))                               // DC-only odd value
    val prog = Jpeg.encodeBlocksProgressive(blocks.map(_.clone), blocksPerRow = 2)
    val base = Jpeg.encodeBlocks(blocks.map(_.clone), blocksPerRow = 2)
    assert(Jpeg.parse(prog) == Jpeg.parse(base))
  }

  test("progressive ≡ baseline: seeded randomized block property") {
    // the refinement encoder's bit-pool interactions (EOBn-attached vs
    // in-block correction bits, ZRL folding) have enough cases that a
    // seeded sweep earns its keep: 40 corpora of random sparse blocks
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(12)
      val blocks = Array.fill(n) {
        val b = new Array[Int](64)
        for (_ <- 0 until rnd.nextInt(8))
          b(rnd.nextInt(64)) = rnd.nextInt(15) - 7
        b
      }
      val restartEvery = trial % 3 // 0 (none), 1, 2 — resync included
      val p = Jpeg.parse(Jpeg.encodeBlocksProgressive(blocks.map(_.clone), 1,
        restartEvery))
      val q = Jpeg.parse(Jpeg.encodeBlocks(blocks.map(_.clone), 1))
      assert(p == q, s"trial $trial (restartEvery=$restartEvery) diverged")
    }
  }

  test("progressive restart intervals: predictors and EOB runs resync") {
    // restarts in EVERY scan kind: interleaved DC (per-component resets),
    // DC refinement (marker only), AC first (EOB runs never cross the
    // boundary), AC refinement (attached bits flush before the marker)
    val payload = Array.tabulate(60)(i => (i * 5).toByte)
    assert(Jpeg.parse(Jpeg.encodeGrayProgressive(payload, restartEvery = 3)) ==
      Jpeg.parse(Jpeg.encodeGray(payload)))
    assert(Jpeg.parseColor(Jpeg.encodeColor420Progressive(payload,
        restartEvery = 2)) ==
      Jpeg.parseColor(Jpeg.encodeColor420(payload)))
    // a broken restart chain fails loud (marker cycle is validated)
    val withRst = Jpeg.encodeGrayProgressive(payload, restartEvery = 3)
    val rst = withRst.indexOfSlice(Array(0xff.toByte, 0xd0.toByte))
    assert(rst >= 0, "fixture should contain RST0")
    val msg = intercept[IllegalArgumentException](
      Jpeg.parse(withRst.updated(rst + 1, 0xd5.toByte))).getMessage
    assert(msg.contains("expected restart marker"))
  }

  test("progressive color: 4:4:4 and 4:2:0 eight-scan round trips ≡ baseline") {
    // DC-only driver fixtures, both samplings
    for (payload <- Seq(Array[Byte](10, -1, 0, 77), Array.tabulate(64)(i => (i * 4).toByte))) {
      assert(Jpeg.parseColor(Jpeg.encodeColorProgressive(payload)) ==
        Jpeg.parseColor(Jpeg.encodeColor(payload)), "4:4:4 DC-only")
      assert(Jpeg.parseColor(Jpeg.encodeColor420Progressive(payload)) ==
        Jpeg.parseColor(Jpeg.encodeColor420(payload)), "4:2:0 DC-only")
    }
    // AC-bearing blocks through the interleaved-DC + per-component-AC
    // scan structure; the 4:2:0 Y plane's raster-vs-MCU order is the
    // load-bearing mapping (2×2 Y blocks per MCU)
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64); pairs.foreach { case (k, v) => b(k) = v }; b
    }
    val y444 = Array(blk(0 -> 10, 1 -> 3, 4 -> 1), blk(), blk(0 -> -5, 30 -> 5),
      blk(0 -> 1, 63 -> -1))
    val cb4 = Array(blk(0 -> 2, 2 -> 1), blk(), blk(0 -> -3), blk(5 -> -1))
    val cr4 = Array(blk(), blk(0 -> 4, 7 -> 3), blk(), blk(0 -> -2, 1 -> 1))
    assert(Jpeg.parseColor(Jpeg.encodeColorBlocksProgressive(
        y444.map(b => Array(b.clone)), cb4.map(_.clone), cr4.map(_.clone),
        mcusPerRow = 2, ySamp = 0x11)) ==
      Jpeg.parseColor(Jpeg.encodeColorBlocks(
        y444.map(_.clone), cb4.map(_.clone), cr4.map(_.clone),
        blocksPerRow = 2)), "4:4:4 AC")
    val y420 = Array(
      Array(blk(0 -> 10, 1 -> 1), blk(0 -> -4, 20 -> 3), blk(), blk(0 -> 7, 2 -> -1)),
      Array(blk(), blk(0 -> 1), blk(0 -> -8, 40 -> 2), blk(0 -> 3)))
    val cb2 = Array(blk(0 -> 2, 3 -> -1), blk(0 -> -5, 1 -> 1))
    val cr2 = Array(blk(), blk(0 -> 6, 10 -> 1))
    assert(Jpeg.parseColor(Jpeg.encodeColorBlocksProgressive(
        y420.map(_.map(_.clone)), cb2.map(_.clone), cr2.map(_.clone),
        mcusPerRow = 2, ySamp = 0x22)) ==
      Jpeg.parseColor(Jpeg.encodeColorBlocks420(
        y420.map(_.map(_.clone)), cb2.map(_.clone), cr2.map(_.clone),
        mcusPerRow = 2)), "4:2:0 AC")
    // seeded randomized sweep over both samplings
    val rnd = new scala.util.Random(42424242L)
    for (trial <- 0 until 20) {
      val n = 2 * (1 + rnd.nextInt(4))
      def rblk(): Array[Int] = {
        val b = new Array[Int](64)
        for (_ <- 0 until rnd.nextInt(6)) b(rnd.nextInt(64)) = rnd.nextInt(15) - 7
        b
      }
      val y = Array.fill(n)(Array.fill(4)(rblk()))
      val cb = Array.fill(n)(rblk())
      val cr = Array.fill(n)(rblk())
      val p = Jpeg.parseColor(Jpeg.encodeColorBlocksProgressive(
        y.map(_.map(_.clone)), cb.map(_.clone), cr.map(_.clone), 2, 0x22))
      val q = Jpeg.parseColor(Jpeg.encodeColorBlocks420(
        y.map(_.map(_.clone)), cb.map(_.clone), cr.map(_.clone), 2))
      assert(p == q, s"420 trial $trial")
      val p4 = Jpeg.parseColor(Jpeg.encodeColorBlocksProgressive(
        y.map(m => Array(m(0).clone)), cb.map(_.clone), cr.map(_.clone), 2, 0x11))
      val q4 = Jpeg.parseColor(Jpeg.encodeColorBlocks(
        y.map(_(0).clone), cb.map(_.clone), cr.map(_.clone), 2))
      assert(p4 == q4, s"444 trial $trial")
    }
  }

  test("progressive: hostile streams fail loud by name") {
    val good = Jpeg.encodeGrayProgressive(Array[Byte](10, 20, 30))
    def msgOf(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](Jpeg.parse(blob)).getMessage
    // torn scan
    val lastSos = good.lastIndexOfSlice(Array(0xff.toByte, 0xda.toByte))
    assert(msgOf(good.take(lastSos + 10)).contains("truncated"))
    // single-component contract: the scan header must cover the component
    val firstSos = good.indexOfSlice(Array(0xff.toByte, 0xda.toByte))
    assert(msgOf(good.updated(firstSos + 4, 2.toByte))
      .contains("single component"))
  }

  // ---- color (3-component 4:4:4 YCbCr) --------------------------------

  private def clamp(v: Int) = math.max(0, math.min(255, v))

  /** The decoder's fixed-point BT.601 conversion on the fixture's flat
    * planes (Y = b, Cb−128 = b%9−4, Cr−128 = b%7−3). */
  private def rgbOf(b: Int): (Int, Int, Int) = {
    val cb = b % 9 - 4; val cr = b % 7 - 3
    (clamp(b + ((91881 * cr + 32768) >> 16)),
      clamp(b + ((-22554 * cb - 46802 * cr + 32768) >> 16)),
      clamp(b + ((116130 * cb + 32768) >> 16)))
  }

  private def colorStats(bytes: Array[Byte]): Jpeg.JpegColorInfo = {
    val px = bytes.map(b => rgbOf(b & 0xff))
    Jpeg.JpegColorInfo(8, 8 * px.length, 64L * px.length,
      64L * px.map(_._1.toLong).sum,
      64L * px.map(_._2.toLong).sum,
      64L * px.map(_._3.toLong).sum,
      px.flatMap(p => Seq(p._1, p._2, p._3)).max,
      f"${px(0)._1}%02X${px(0)._2}%02X${px(0)._3}%02X")
  }

  test("color DC-only fixtures decode to exact RGB for every byte value") {
    val hostile = Array[Byte](0, -1, 0, 127, -128, 1, -2, 64)
    assert(Jpeg.parseColor(Jpeg.encodeColor(hostile)) == colorStats(hostile))
    val all = Array.tabulate(256)(i => i.toByte)
    assert(Jpeg.parseColor(Jpeg.encodeColor(all)) == colorStats(all))
    assert(Jpeg.parseColor(Jpeg.encodeColor(all.reverse)) ==
      colorStats(all.reverse))
    assert(Jpeg.parseColor(Jpeg.encodeColor(Array[Byte](42))) ==
      colorStats(Array[Byte](42)))
  }

  test("color AC blocks: per-component tables/predictors agree with a direct IDCT") {
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      pairs.foreach { case (k, v) => b(k) = v }
      b
    }
    // four MCUs, 2 per row: AC energy in ALL THREE planes with different
    // patterns, so desynced table selection or a shared DC predictor
    // would corrupt the comparison
    val y = Array(blk(0 -> 10, 1 -> 3, 2 -> -7), blk(0 -> -5, 3 -> 2),
      blk(0 -> 0, 20 -> 6), blk(0 -> 100, 63 -> -3))
    val cb = Array(blk(0 -> 2, 5 -> -1), blk(0 -> -3, 1 -> 4),
      blk(0 -> 1), blk(0 -> 0, 30 -> 2))
    val cr = Array(blk(0 -> -2, 7 -> 3), blk(0 -> 4),
      blk(0 -> -1, 10 -> -2), blk(0 -> 3, 40 -> 1))
    val got = Jpeg.parseColor(Jpeg.encodeColorBlocks(y, cb, cr, blocksPerRow = 2))

    // independent reference: dequantize (luma q 8/5, chroma q 8/7) in
    // zigzag order, direct 2-D IDCT per plane, then the fixed-point
    // conversion per pixel
    def reference(zig: Array[Int], qdc: Int, qac: Int): Array[Int] = {
      val f = new Array[Double](64)
      for (k <- 0 until 64)
        f(Jpeg.Zigzag(k)) = (zig(k) * (if (k == 0) qdc else qac)).toDouble
      val out = new Array[Int](64)
      for (yy <- 0 until 8; xx <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += cu * cv * f(v * 8 + u) *
            math.cos((2 * xx + 1) * u * math.Pi / 16.0) *
            math.cos((2 * yy + 1) * v * math.Pi / 16.0)
        }
        out(yy * 8 + xx) = clamp(math.round(s / 4.0 + 128.0).toInt)
      }
      out
    }
    var nPx = 0L; var sR = 0L; var sG = 0L; var sB = 0L; var mx = 0
    var tl = ""
    for (m <- 0 until 4) {
      val yp = reference(y(m), 8, 5)
      val cbp = reference(cb(m), 8, 7)
      val crp = reference(cr(m), 8, 7)
      for (i <- 0 until 64) {
        val cbv = cbp(i) - 128; val crv = crp(i) - 128
        val r = clamp(yp(i) + ((91881 * crv + 32768) >> 16))
        val g = clamp(yp(i) + ((-22554 * cbv - 46802 * crv + 32768) >> 16))
        val b = clamp(yp(i) + ((116130 * cbv + 32768) >> 16))
        nPx += 1; sR += r; sG += g; sB += b
        mx = math.max(mx, math.max(r, math.max(g, b)))
        if (m == 0 && i == 0) tl = f"$r%02X$g%02X$b%02X"
      }
    }
    assert(got == Jpeg.JpegColorInfo(16, 16, nPx, sR, sG, sB, mx, tl))
  }

  test("color routing and subsampling guards fail loud by name") {
    val gray = Jpeg.encodeGray(Array[Byte](10, 20))
    val color = Jpeg.encodeColor(Array[Byte](10, 20))
    assert(intercept[IllegalArgumentException](Jpeg.parse(color))
      .getMessage.contains("parseColor"))
    assert(intercept[IllegalArgumentException](Jpeg.parseColor(gray))
      .getMessage.contains("use parse"))
    // declare 1x2 (4:4:0) sampling on the Y component: throws by name
    // (2x2 / 4:2:0, 2x1 / 4:2:2 and 4x1 / 4:1:1 are SUPPORTED, tested
    // separately)
    val sof = color.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    val sub = color.updated(sof + 11, 0x12.toByte)
    assert(intercept[IllegalArgumentException](Jpeg.parseColor(sub))
      .getMessage.contains("subsampling"))
  }

  // ---- 4:2:0 subsampling + restart intervals ---------------------------

  /** Expected stats for the 4:2:0 fixture: quadrant k of group j is flat
    * Y = b(4j+k) under the group-shared chroma of b(4j). */
  private def colorStats420(bytes: Array[Byte]): Jpeg.JpegColorInfo = {
    val bv = bytes.map(_ & 0xff)
    val groups = bv.grouped(4).toArray
    def pxOf(y: Int, c: Int): (Int, Int, Int) = {
      val cb = c % 9 - 4; val cr = c % 7 - 3
      (clamp(y + ((91881 * cr + 32768) >> 16)),
        clamp(y + ((-22554 * cb - 46802 * cr + 32768) >> 16)),
        clamp(y + ((116130 * cb + 32768) >> 16)))
    }
    val px = groups.flatMap(g => g.map(b => pxOf(b, g(0))))
    val tl = pxOf(groups(0)(0), groups(0)(0))
    Jpeg.JpegColorInfo(16, 16 * groups.length, 256L * groups.length,
      64L * px.map(_._1.toLong).sum,
      64L * px.map(_._2.toLong).sum,
      64L * px.map(_._3.toLong).sum,
      px.flatMap(p => Seq(p._1, p._2, p._3)).max,
      f"${tl._1}%02X${tl._2}%02X${tl._3}%02X")
  }

  test("4:2:0 fixtures decode exactly, with and without restart intervals") {
    val all = Array.tabulate(256)(i => i.toByte) // 64 MCUs
    val want = colorStats420(all)
    assert(Jpeg.parseColor(Jpeg.encodeColor420(all)) == want)
    // restart markers + DC-predictor resets must not change decoded
    // values; intervals 1/3/5 hit every RSTn cycle position and both
    // aligned and unaligned marker boundaries
    for (ri <- Seq(1, 3, 5, 64, 100))
      assert(Jpeg.parseColor(Jpeg.encodeColor420(all, restartEvery = ri)) ==
        want, s"restartEvery=$ri")
    val tiny = Array[Byte](0, -1, 127, -128)
    assert(Jpeg.parseColor(Jpeg.encodeColor420(tiny)) == colorStats420(tiny))
  }

  test("grayscale restart intervals decode exactly and resync the predictor") {
    val payload = Array.tabulate(40)(i => (i * 37 % 256).toByte)
    val want = Jpeg.parse(Jpeg.encodeGray(payload))
    for (ri <- Seq(1, 2, 7, 8, 9))
      assert(Jpeg.parse(Jpeg.encodeGray(payload, restartEvery = ri)) == want,
        s"restartEvery=$ri")
  }

  test("4:2:0 AC blocks agree with a direct per-plane IDCT + box upsample") {
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      pairs.foreach { case (k, v) => b(k) = v }
      b
    }
    // one MCU: four distinct AC-bearing Y quadrants, AC-bearing chroma
    val y = Array(Array(blk(0 -> 10, 1 -> 3), blk(0 -> -5, 3 -> 2),
      blk(0 -> 0, 20 -> 6), blk(0 -> 100, 63 -> -3)))
    val cb = Array(blk(0 -> 2, 5 -> -1))
    val cr = Array(blk(0 -> -2, 7 -> 3))
    val got = Jpeg.parseColor(Jpeg.encodeColorBlocks420(y, cb, cr, 1))

    def reference(zig: Array[Int], qdc: Int, qac: Int): Array[Int] = {
      val f = new Array[Double](64)
      for (k <- 0 until 64)
        f(Jpeg.Zigzag(k)) = (zig(k) * (if (k == 0) qdc else qac)).toDouble
      val out = new Array[Int](64)
      for (yy <- 0 until 8; xx <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += cu * cv * f(v * 8 + u) *
            math.cos((2 * xx + 1) * u * math.Pi / 16.0) *
            math.cos((2 * yy + 1) * v * math.Pi / 16.0)
        }
        out(yy * 8 + xx) = clamp(math.round(s / 4.0 + 128.0).toInt)
      }
      out
    }
    // the blocks hold ABSOLUTE DCs; the stream carries diffs chained
    // across the four Y quadrants, which the decoder must undo exactly
    val yPlanes = y(0).map(reference(_, 8, 5))
    val cbP = reference(cb(0), 8, 7)
    val crP = reference(cr(0), 8, 7)
    var nPx = 0L; var sR = 0L; var sG = 0L; var sB = 0L; var mx = 0
    var tl = ""
    for (py <- 0 until 16; px <- 0 until 16) {
      val yv = yPlanes((py / 8) * 2 + (px / 8))((py % 8) * 8 + (px % 8))
      val cbv = cbP((py / 2) * 8 + (px / 2)) - 128
      val crv = crP((py / 2) * 8 + (px / 2)) - 128
      val r = clamp(yv + ((91881 * crv + 32768) >> 16))
      val g = clamp(yv + ((-22554 * cbv - 46802 * crv + 32768) >> 16))
      val b = clamp(yv + ((116130 * cbv + 32768) >> 16))
      nPx += 1; sR += r; sG += g; sB += b
      mx = math.max(mx, math.max(r, math.max(g, b)))
      if (py == 0 && px == 0) tl = f"$r%02X$g%02X$b%02X"
    }
    assert(got == Jpeg.JpegColorInfo(16, 16, nPx, sR, sG, sB, mx, tl))
  }

  test("4:4:0 sampling and broken restart chains fail loud by name") {
    val blob = Jpeg.encodeColor420(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
      restartEvery = 1)
    // corrupt the RST0 marker between the two MCUs
    val rst = blob.indexOfSlice(Array(0xff.toByte, 0xd0.toByte))
    assert(rst > 0)
    val msg = intercept[IllegalArgumentException](
      Jpeg.parseColor(blob.updated(rst + 1, 0xd4.toByte))).getMessage
    assert(msg.contains("expected restart marker RST0"))
    // 4:4:0 (Y 1x2) declared in SOF throws by its factors (4:1:1 is a
    // supported layout since round 12 — see the 4:1:1 round-trip test)
    val sof = blob.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    val m440 = intercept[IllegalArgumentException](
      Jpeg.parseColor(blob.updated(sof + 11, 0x12.toByte))).getMessage
    assert(m440.contains("unsupported chroma subsampling layout"))
  }

  test("parseColorOriented: EXIF orientation remaps the display raster") {
    // a 2-group 4:2:0 fixture whose FOUR stored corners are distinct
    // bytes: TL=b0 (q0 of group 0), TR=b1, BL=b6 (q2 of group 1), BR=b7
    val payload = Array[Byte](10, 60, 20, 30, 40, 50, 90, 120)
    val base = Jpeg.parseColor(Jpeg.encodeColor420(payload))
    assert(base.width == 16 && base.height == 32)
    def hex(yv: Int, cByte: Int): String = {
      val cbv = cByte % 9 - 4; val crv = cByte % 7 - 3
      def conv(e: Long) =
        math.max(0, math.min(255, yv + ((e + 32768) >> 16).toInt))
      f"${conv(91881L * crv)}%02X${conv(-22554L * cbv - 46802L * crv)}%02X${conv(116130L * cbv)}%02X"
    }
    val tl = hex(10, 10); val tr = hex(60, 10)
    val bl = hex(90, 40); val br = hex(120, 40)
    for (o <- 0 to 8) {
      val got = Jpeg.parseColorOriented(Jpeg.encodeColor420(payload), o)
      // sums/max/count are rotation-invariant
      assert((got.nPixels, got.sumR, got.sumG, got.sumB, got.maxPx) ==
        ((base.nPixels, base.sumR, base.sumG, base.sumB, base.maxPx)), s"o=$o")
      // dims swap exactly for the transposed orientations
      val (w, h) = if (o >= 5) (32, 16) else (16, 32)
      assert(got.width == w && got.height == h, s"o=$o")
      // the display top-left is the mapped stored corner
      val want = o match {
        case 0 | 1 | 5 => tl
        case 2 | 8 => tr
        case 4 | 6 => bl
        case 3 | 7 => br
      }
      assert(got.topLeftHex == want, s"o=$o")
    }
    // orientation 1 ≡ parseColor; out-of-range orientations fail loud
    assert(Jpeg.parseColorOriented(Jpeg.encodeColor420(payload), 1) == base)
    assert(intercept[IllegalArgumentException](
      Jpeg.parseColorOriented(Jpeg.encodeColor420(payload), 9))
      .getMessage.contains("orientation"))
  }

  test("4:1:1 (Y 4x1): round trip, shared chroma, splittable restarts") {
    // DC-only driver fixture: four flat Y blocks side by side over one
    // chroma pair — the horizontally-quartered sibling of 4:2:0 (same
    // 4-bytes-per-group semantics, 32×8 geometry)
    val payload = Array[Byte](10, -1, 0, 127, -128, 1, 33, -7)
    val got = Jpeg.parseColor(Jpeg.encodeColor411(payload))
    val bv = payload.map(_ & 0xff)
    def conv(yv: Int, e: Long): Int =
      math.max(0, math.min(255, yv + ((e + 32768) >> 16).toInt))
    val px = bv.grouped(4).flatMap { g =>
      g.flatMap { yv =>
        val cbv = g(0) % 9 - 4; val crv = g(0) % 7 - 3
        Seq.fill(64)((conv(yv, 91881L * crv),
          conv(yv, -22554L * cbv - 46802L * crv),
          conv(yv, 116130L * cbv)))
      }
    }.toSeq
    assert(got.width == 32 && got.height == 8 * (payload.length / 4))
    assert(got.nPixels == px.size.toLong)
    assert(got.sumR == px.map(_._1.toLong).sum)
    assert(got.sumG == px.map(_._2.toLong).sum)
    assert(got.sumB == px.map(_._3.toLong).sum)
    assert(got.maxPx == px.map(p => math.max(p._1, math.max(p._2, p._3))).max)
    // restart-marked stream decodes identically (the splittable form)
    assert(Jpeg.parseColor(Jpeg.encodeColor411(payload, restartEvery = 1)) == got)
    // AC-bearing randomized sweep: the 4×1 box upsample is exercised
    // beyond flat planes, cross-checked against the general stream
    // writer driven at 0x41 via the segment-parallel decode path
    val rnd = new scala.util.Random(4111411L)
    def blk(): Array[Int] = new Array[Int](64)
    for (trial <- 0 until 10) {
      val n = 1 + rnd.nextInt(4)
      def rblk(): Array[Int] = {
        val b = blk()
        for (_ <- 0 until rnd.nextInt(6)) b(rnd.nextInt(64)) = rnd.nextInt(15) - 7
        b
      }
      val y = Array.fill(n)(Array.fill(4)(rblk()))
      val cb = Array.fill(n)(rblk())
      val cr = Array.fill(n)(rblk())
      val blob = Jpeg.encodeColorBlocks411(
        y.map(_.map(_.clone)), cb.map(_.clone), cr.map(_.clone), 1,
        restartEvery = 1)
      val want = Jpeg.parseColor(blob)
      // parallel segment decode merges to the sequential result
      val parts = (0 until 2).map(Jpeg.decodeColorSegments(blob, _, 2))
      assert(parts.map(_._1).sum == want.nPixels, s"411 trial $trial")
      assert(parts.map(_._2).sum == want.sumR)
      assert(parts.map(_._3).sum == want.sumG)
      assert(parts.map(_._4).sum == want.sumB)
    }
  }

  test("4:2:2 (Y 2x1): baseline and progressive round trips, shared chroma") {
    // DC-only driver fixture: two flat Y blocks over one chroma pair —
    // the horizontal twin of 4:2:0's quadrant semantics
    val payload = Array[Byte](10, -1, 0, 127, -128, 1)
    val got = Jpeg.parseColor(Jpeg.encodeColor422(payload))
    // independent reference: pixel (x, y) of MCU j has Y = b(2j + x/8),
    // chroma from b(2j) — 64 pixels per Y block
    val bv = payload.map(_ & 0xff)
    def conv(yv: Int, e: Long): Int =
      math.max(0, math.min(255, yv + ((e + 32768) >> 16).toInt))
    val px = bv.grouped(2).flatMap { g =>
      g.flatMap { yv =>
        val cbv = g(0) % 9 - 4; val crv = g(0) % 7 - 3
        Seq.fill(64)((conv(yv, 91881L * crv),
          conv(yv, -22554L * cbv - 46802L * crv),
          conv(yv, 116130L * cbv)))
      }
    }.toSeq
    assert(got.width == 16 && got.height == 8 * (payload.length / 2))
    assert(got.nPixels == px.size.toLong)
    assert(got.sumR == px.map(_._1.toLong).sum)
    assert(got.sumG == px.map(_._2.toLong).sum)
    assert(got.sumB == px.map(_._3.toLong).sum)
    assert(got.maxPx == px.map(p => math.max(p._1, math.max(p._2, p._3))).max)
    // progressive ≡ baseline, with and without restarts
    assert(Jpeg.parseColor(Jpeg.encodeColor422Progressive(payload)) == got)
    assert(Jpeg.parseColor(Jpeg.encodeColor422Progressive(payload,
      restartEvery = 2)) == got)
    assert(Jpeg.parseColor(Jpeg.encodeColor422(payload, restartEvery = 1)) == got)
    // AC-bearing randomized sweep, baseline vs progressive
    def blk(): Array[Int] = new Array[Int](64)
    val rnd = new scala.util.Random(4221122L)
    for (trial <- 0 until 10) {
      val n = 2 * (1 + rnd.nextInt(3))
      def rblk(): Array[Int] = {
        val b = blk()
        for (_ <- 0 until rnd.nextInt(6)) b(rnd.nextInt(64)) = rnd.nextInt(15) - 7
        b
      }
      val y = Array.fill(n)(Array.fill(2)(rblk()))
      val cb = Array.fill(n)(rblk())
      val cr = Array.fill(n)(rblk())
      val p = Jpeg.parseColor(Jpeg.encodeColorBlocksProgressive(
        y.map(_.map(_.clone)), cb.map(_.clone), cr.map(_.clone), 2, 0x21))
      val q = Jpeg.parseColor(Jpeg.encodeColorBlocks422(
        y.map(_.map(_.clone)), cb.map(_.clone), cr.map(_.clone), 2))
      assert(p == q, s"422 trial $trial")
    }
  }

  test("segment decode: stride-bucket partials merge to the sequential result") {
    val all = Array.tabulate(256)(i => i.toByte) // 64 MCUs
    for (ri <- Seq(1, 3, 5, 64); stride <- Seq(1, 2, 3, 8, 64)) {
      val blob = Jpeg.encodeColor420(all, restartEvery = ri)
      val info = Jpeg.segmentInfo(blob)
      assert(info.nSegments == (64 + ri - 1) / ri, s"ri=$ri")
      val want = Jpeg.parseColor(blob)
      val parts = (0 until stride).map(Jpeg.decodeColorSegments(blob, _, stride))
      assert(parts.map(_._1).sum == want.nPixels, s"ri=$ri stride=$stride")
      assert(parts.map(_._2).sum == want.sumR)
      assert(parts.map(_._3).sum == want.sumG)
      assert(parts.map(_._4).sum == want.sumB)
      assert(parts.map(_._5).max == want.maxPx)
      // exactly one bucket owns MCU 0 and carries the witness
      assert(parts.flatMap(p => Option(p._6)) == Seq(want.topLeftHex))
    }
    // AC-bearing segments too: predictors must reset per segment exactly
    def blk(v: Int, k: Int, a: Int): Array[Int] = {
      val b = new Array[Int](64); b(0) = v; b(k.max(1)) = a; b
    }
    val y = Array.tabulate(6)(i => Array.tabulate(4)(q => blk(i * 17 - 40, q + 1, 3 - q)))
    val cb = Array.tabulate(6)(i => blk(i - 3, 5, 2))
    val cr = Array.tabulate(6)(i => blk(2 - i, 7, -1))
    val acBlob = Jpeg.encodeColorBlocks420(y, cb, cr, 1, restartEvery = 2)
    val acWant = Jpeg.parseColor(acBlob)
    val acParts = (0 until 3).map(Jpeg.decodeColorSegments(acBlob, _, 3))
    assert(acParts.map(_._2).sum == acWant.sumR)
    assert(acParts.map(_._3).sum == acWant.sumG)
    assert(acParts.map(_._4).sum == acWant.sumB)
  }

  test("progressive segment decode: stride partials merge to sequential") {
    // DC-only 4:4:4 eight-scan streams across ri/stride combinations:
    // each task replays ALL scans for its stride of restart segments
    val all = Array.tabulate(64)(i => (i * 4).toByte) // 64 MCUs
    for (ri <- Seq(1, 3, 5, 64); stride <- Seq(1, 2, 3, 8)) {
      val blob = Jpeg.encodeColorProgressive(all, restartEvery = ri)
      val info = Jpeg.progressiveSegmentInfo(blob)
      assert(info.nSegments == (64 + ri - 1) / ri, s"ri=$ri")
      val want = Jpeg.parseColor(blob)
      val parts = (0 until stride)
        .map(Jpeg.decodeColorProgressiveSegments(blob, _, stride))
      assert(parts.map(_._1).sum == want.nPixels, s"ri=$ri stride=$stride")
      assert(parts.map(_._2).sum == want.sumR)
      assert(parts.map(_._3).sum == want.sumG)
      assert(parts.map(_._4).sum == want.sumB)
      assert(parts.map(_._5).max == want.maxPx)
      assert(parts.flatMap(p => Option(p._6)) == Seq(want.topLeftHex))
    }
    // AC-bearing blocks: EOBn runs flushed at restart boundaries, ZRL,
    // refinement correction bits — all replayed per segment
    def blk(pairs: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64); pairs.foreach { case (k, v) => b(k) = v }; b
    }
    val y = Array(blk(0 -> 10, 1 -> 3, 4 -> 1), blk(), blk(0 -> -5, 30 -> 5),
      blk(0 -> 1, 63 -> -1), blk(2 -> 2), blk(0 -> 9))
    val cb = Array(blk(0 -> 2, 2 -> 1), blk(), blk(0 -> -3), blk(5 -> -1),
      blk(), blk(0 -> 1))
    val cr = Array(blk(), blk(0 -> 4, 7 -> 3), blk(), blk(0 -> -2, 1 -> 1),
      blk(40 -> 1), blk())
    val acBlob = Jpeg.encodeColorBlocksProgressive(
      y.map(b => Array(b.clone)), cb.map(_.clone), cr.map(_.clone),
      mcusPerRow = 2, ySamp = 0x11, restartEvery = 2)
    val acWant = Jpeg.parseColor(acBlob)
    val acParts = (0 until 3)
      .map(Jpeg.decodeColorProgressiveSegments(acBlob, _, 3))
    assert(acParts.map(_._2).sum == acWant.sumR)
    assert(acParts.map(_._3).sum == acWant.sumG)
    assert(acParts.map(_._4).sum == acWant.sumB)
    // randomized sweep: many blocks, small ri → EOB runs meet segment
    // boundaries in varied phases
    val rnd = new scala.util.Random(777L)
    for (trial <- 0 until 10) {
      val n = 2 * (2 + rnd.nextInt(4))
      def rblk(): Array[Int] = {
        val b = new Array[Int](64)
        for (_ <- 0 until rnd.nextInt(6)) b(rnd.nextInt(64)) = rnd.nextInt(15) - 7
        b
      }
      val ry = Array.fill(n)(rblk()); val rcb = Array.fill(n)(rblk())
      val rcr = Array.fill(n)(rblk())
      val rBlob = Jpeg.encodeColorBlocksProgressive(
        ry.map(b => Array(b.clone)), rcb.map(_.clone), rcr.map(_.clone),
        mcusPerRow = 2, ySamp = 0x11, restartEvery = 1 + rnd.nextInt(3))
      val w = Jpeg.parseColor(rBlob)
      val ps = (0 until 4).map(Jpeg.decodeColorProgressiveSegments(rBlob, _, 4))
      assert(ps.map(_._2).sum == w.sumR, s"trial $trial")
      assert(ps.map(_._3).sum == w.sumG, s"trial $trial")
      assert(ps.map(_._4).sum == w.sumB, s"trial $trial")
    }
    // guards: 4:2:0 progressive (rasters disagree) and DRI-less streams
    // fail by name instead of decoding wrong
    val p420 = Jpeg.encodeColor420Progressive(
      Array[Byte](1, 2, 3, 4), restartEvery = 2)
    assert(intercept[IllegalArgumentException](
      Jpeg.progressiveSegmentInfo(p420)).getMessage.contains("4:4:4"))
    assert(intercept[IllegalArgumentException](
      Jpeg.decodeColorProgressiveSegments(p420, 0, 1)).getMessage
      .contains("4:4:4"))
    val noDri = Jpeg.encodeColorProgressive(Array[Byte](1, 2, 3))
    assert(intercept[IllegalArgumentException](
      Jpeg.decodeColorProgressiveSegments(noDri, 0, 1)).getMessage
      .contains("restart interval"))
  }

  test("Spark plumbing: progressive parallel ≡ sequential progressive") {
    val docs = Seq((1L, "alphabet"), (2L, "zzzz"),
      (3L, "The quick brown fox jumps over the lazy dog, twice over!"))
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val blobs = Multimodal.jpegColorProgressiveBlob(docs, "doc_id", "px",
      restartEvery = 3)
    val seqRows = Multimodal.decodeJpegColor(blobs, "doc_id", "blob")
      .orderBy("doc_id").collect().map(_.toSeq)
    val parRows = Multimodal.decodeJpegColorProgressiveParallel(
        blobs, "doc_id", "blob", tasksPerImage = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(parRows.toSeq == seqRows.toSeq)
  }

  test("Spark plumbing: decodeJpegColorParallel ≡ decodeJpegColor on 420 streams") {
    val docs = Seq((1L, "alphabet"), (2L, "zzzz"),
      (3L, "The quick brown fox jumps over the lazy dog, twice over!"))
      .toDF("doc_id", "text")
      .withColumn("px", expr(
        "substring(encode(text, 'UTF-8'), 1, length(text) - pmod(length(text), 4))"))
    val blobs = Multimodal.jpeg420Blob(docs, "doc_id", "px", restartEvery = 2)
    val seqRows = Multimodal.decodeJpegColor(blobs, "doc_id", "blob")
      .orderBy("doc_id").collect().map(_.toSeq)
    val parRows = Multimodal
      .decodeJpegColorParallel(blobs, "doc_id", "blob", tasksPerImage = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(parRows.toSeq == seqRows.toSeq)
  }

  test("parallel decode plan: one fan-out shuffle, map-side partial merge") {
    val docs = Seq((1L, "alphabet"), (2L, "The quick brown fox jumps!xx"))
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val q = Multimodal.decodeJpegColorParallel(
      Multimodal.jpeg420Blob(docs, "doc_id", "px", restartEvery = 2),
      "doc_id", "blob", tasksPerImage = 4)
    q.collect()
    val finalPlan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE keyed fan-out repartition (image, bucket); the only
    // other allowed shuffles are the encode stage's Par.ensure spread
    // (a no-op at scale — file/bytes-gated) and the doc_id merge. A
    // second round-robin would be the redundant whole-blob pass the
    // plan audit caught
    def occ(s: String) = finalPlan.sliding(s.length).count(_ == s)
    assert(occ("REPARTITION_BY_COL") == 1, finalPlan)
    assert(occ("REPARTITION_BY_NUM") <= 1, finalPlan)
    assert(occ("Exchange ") <= 3, finalPlan)
    // the merge is map-side combined: partial aggregation BEFORE the
    // doc_id exchange, so only control-sized partials shuffle
    assert(finalPlan.contains("partial_sum"), finalPlan)
  }

  test("Spark plumbing: jpeg420Blob → decodeJpegColor matches per-payload stats") {
    val docs = Seq((1L, "alphabet"), (2L, "zzzz"),
      (3L, "The quick brown fox.")) // lengths all multiples of 4
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val got = Multimodal.decodeJpegColor(
        Multimodal.jpeg420Blob(docs, "doc_id", "px", restartEvery = 3),
        "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7), r.getString(8)))
    val want = Seq((1L, "alphabet"), (2L, "zzzz"), (3L, "The quick brown fox."))
      .map { case (id, tx) =>
        val o = colorStats420(tx.getBytes("UTF-8"))
        (id, o.width, o.height, o.nPixels, o.sumR, o.sumG, o.sumB,
          o.maxPx, o.topLeftHex)
      }
    assert(got.toSeq == want)
  }

  test("Spark plumbing: jpegColorBlob → decodeJpegColor matches per-payload stats") {
    val docs = Seq((1L, "alpha"), (2L, "z"), (3L, "The quick brown fox."))
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val got = Multimodal.decodeJpegColor(
        Multimodal.jpegColorBlob(docs, "doc_id", "px"), "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7), r.getString(8)))
    val want = Seq((1L, "alpha"), (2L, "z"), (3L, "The quick brown fox."))
      .map { case (id, tx) =>
        val o = colorStats(tx.getBytes("UTF-8"))
        (id, o.width, o.height, o.nPixels, o.sumR, o.sumG, o.sumB,
          o.maxPx, o.topLeftHex)
      }
    assert(got.toSeq == want)
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
