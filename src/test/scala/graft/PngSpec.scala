package graft

import graft.multimodal.{Multimodal, Png}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The baseline PNG codec — the decode seam's first COMPRESSED format:
  * encoder output round-trips through the pure-JVM parser (real Inflater,
  * all five row filters, multi-IDAT concatenation, per-chunk CRC-32), and
  * hostile containers hit named requires instead of decoding garbage. */
class PngSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + 7) % 256).toByte)

  /** Reference stats straight off the raw payload (RGB triples, top-down,
    * width*3 bytes per row, no padding — PNG has no stride). */
  private def oracle(px: Array[Byte], width: Int): Png.PngInfo = {
    val triples = px.grouped(3).map(_.map(_ & 0xff)).toSeq
    Png.PngInfo(width, px.length / (3 * width), triples.size.toLong,
      triples.map(_(0).toLong).sum, triples.map(_(1).toLong).sum,
      triples.map(_(2).toLong).sum, 0L,
      triples.map(t => (t(0) + t(1) + t(2)).toLong).max,
      f"${px(0) & 0xff}%02X${px(1) & 0xff}%02X${px(2) & 0xff}%02X")
  }

  /** Rebuild one chunk with a correct CRC (for splicing hostile headers). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    val t = typ.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    def be(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    be(data.length.toLong) ++ t ++ data ++ be(crc.getValue)
  }

  private def ihdr(w: Int, h: Int, depth: Byte, color: Byte,
                   interlace: Byte): Array[Byte] = {
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    be(w) ++ be(h) ++ Array[Byte](depth, color, 0, 0, interlace)
  }

  test("round trip: all five row filters reconstruct exact pixels") {
    // 10 rows of width 5 → filter sequence 0,1,2,3,4,0,1,2,3,4
    val px = payload(150)
    val p = Png.parse(Png.encode(px, width = 5))
    assert(p == oracle(px, 5))
    // one row (filter 0 only) and wide single-pixel columns also hold
    assert(Png.parse(Png.encode(px.take(15), width = 5)) == oracle(px.take(15), 5))
    assert(Png.parse(Png.encode(px.take(30), width = 1)) == oracle(px.take(30), 1))
  }

  test("multi-IDAT: the deflate stream concatenates across chunk splits") {
    val px = payload(3000) // 200 rows → z stream far larger than 64 bytes
    val one = Png.encode(px, width = 5, idatChunk = 1 << 20)
    val many = Png.encode(px, width = 5, idatChunk = 64)
    assert(countChunks(many, "IDAT") > countChunks(one, "IDAT"),
      "small idatChunk must split the stream")
    assert(Png.parse(many) == Png.parse(one))
    assert(Png.parse(many) == oracle(px, 5))
  }

  private def countChunks(blob: Array[Byte], typ: String): Int =
    blob.sliding(4).count(_.sameElements(typ.getBytes("US-ASCII")))

  test("ancillary chunks skip by size but still CRC-check") {
    val px = payload(45)
    val blob = Png.encode(px, 5)
    // splice a tEXt chunk between IHDR and the first IDAT
    val ihdrEnd = 8 + 12 + 13
    val spliced = blob.take(ihdrEnd) ++
      chunk("tEXt", "comment\u0000hello".getBytes("US-ASCII")) ++
      blob.drop(ihdrEnd)
    assert(Png.parse(spliced) == oracle(px, 5))
    // ...but a corrupted ancillary CRC still fails loud
    val bad = blob.take(ihdrEnd) ++
      chunk("tEXt", "x".getBytes).updated(11, 'y'.toByte) ++ blob.drop(ihdrEnd)
    val e = intercept[IllegalArgumentException](Png.parse(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("hostile containers fail loud with named reasons") {
    val good = Png.encode(payload(45), 5)
    def msgOf(blob: Array[Byte]): String =
      intercept[IllegalArgumentException](Png.parse(blob)).getMessage

    assert(msgOf("not a png at all, sorry".getBytes).contains("signature"))
    // corrupt one IDAT byte: CRC catches it before the Inflater sees it
    val idatOff = good.indexOfSlice("IDAT".getBytes("US-ASCII"))
    assert(msgOf(good.updated(idatOff + 5, (good(idatOff + 5) ^ 0x40).toByte))
      .contains("CRC"))
    // unknown-interlace / sub-byte-depth / grayscale / 16-bit-palette
    // headers are rejected by name; a palette header (type 3, now
    // supported) without PLTE fails too. Headers CLAIMING Adam7 or
    // depth 16 over this 8-bit sequential stream fail the geometry
    // length check instead of misreading the scanlines.
    def withIhdr(h: Array[Byte]): Array[Byte] =
      good.take(8) ++ chunk("IHDR", h) ++ good.drop(8 + 12 + 13)
    assert(msgOf(withIhdr(ihdr(5, 3, 8, 2, 2))).contains("interlace"))
    assert(msgOf(withIhdr(ihdr(5, 3, 8, 2, 1))).contains("geometry"))
    assert(msgOf(withIhdr(ihdr(5, 3, 16, 2, 0))).contains("geometry"))
    assert(msgOf(withIhdr(ihdr(5, 3, 4, 2, 0))).contains("depth supported"))
    assert(msgOf(withIhdr(ihdr(5, 3, 16, 3, 0))).contains("palette"))
    assert(msgOf(withIhdr(ihdr(5, 3, 8, 7, 0))).contains("supported, got 7"))
    assert(msgOf(withIhdr(ihdr(5, 3, 8, 3, 0))).contains("missing PLTE"))
    // zero dims out of range
    assert(msgOf(withIhdr(ihdr(0, 3, 8, 2, 0))).contains("out of range"))
    // truncated IDAT: keep only the FIRST of the split chunks + IEND
    val many = Png.encode(payload(3000), 5, idatChunk = 64)
    val firstIdat = many.indexOfSlice("IDAT".getBytes("US-ASCII")) - 4
    def be(o: Int) = ((many(o) & 0xff) << 24) | ((many(o + 1) & 0xff) << 16) |
      ((many(o + 2) & 0xff) << 8) | (many(o + 3) & 0xff)
    val truncated = many.take(firstIdat + 12 + be(firstIdat)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(msgOf(truncated).contains("truncated IDAT"))
    // geometry smaller than the stream: shrink the declared height
    val shrunk = good.take(8) ++ chunk("IHDR", ihdr(5, 1, 8, 2, 0)) ++
      good.drop(8 + 12 + 13)
    assert(msgOf(shrunk).contains("past the declared geometry"))
    // chunk length overrunning the blob
    assert(msgOf(good.dropRight(6)).contains("truncated chunk header"))
  }

  test("Adam7 interlaced: seven-pass round trip equals the sequential decode") {
    // 11×7: every Adam7 pass is non-empty and none aligns with the 8/4/2
    // grids exactly — pass extraction, per-pass filter reset, and the
    // pass-geometry inflate length are all load-bearing
    val px = payload(3 * 11 * 7)
    val seq = Png.parse(Png.encode(px, 11))
    val adam = Png.parse(Png.encodeInterlaced(px, 11))
    assert(adam == seq && adam == oracle(px, 11))
    // the two containers differ (interlace flag + scanline layout) even
    // though the decoded statistics agree
    assert(!Png.encodeInterlaced(px, 11).sameElements(Png.encode(px, 11)))
    // small frames where passes go EMPTY: 1×1 (only pass 1), 2×2
    // (passes 1, 6, 7), 5×3, and a single row
    for ((w, n) <- Seq((1, 3), (2, 12), (5, 45), (8, 24)))
      assert(Png.parse(Png.encodeInterlaced(payload(n), w)) ==
        Png.parse(Png.encode(payload(n), w)), s"w=$w n=$n")
    // truncating the stream by one pass still fails loud
    val blob = Png.encodeInterlaced(px, 11)
    val cut = blob.take(blob.indexOfSlice("IEND".getBytes("US-ASCII")) - 80)
    intercept[IllegalArgumentException](Png.parse(
      cut ++ chunk("IEND", Array.emptyByteArray)))
  }

  test("palette (type 3): indices look up PLTE exactly, all five filters") {
    // 200 indices, width 5 → 40 rows: every filter type at bpp=1
    val idx = payload(200)
    val got = Png.parse(
      Png.encodePalette(idx, 5, Multimodal.FixturePalette))
    def pr(i: Int) = i
    def pg(i: Int) = (7 * i + 13) % 256
    def pb(i: Int) = (31 * i + 101) % 256
    val iv = idx.map(_ & 0xff)
    assert(got == Png.PngInfo(5, 40, 200L,
      iv.map(pr(_).toLong).sum, iv.map(pg(_).toLong).sum,
      iv.map(pb(_).toLong).sum, 0L,
      iv.map(i => (pr(i) + pg(i) + pb(i)).toLong).max,
      f"${pr(iv(0))}%02X${pg(iv(0))}%02X${pb(iv(0))}%02X"))
    // an index past the palette's end fails loud by name
    val shortPal = Multimodal.FixturePalette.take(12) // 4 entries
    val over = Png.encodePalette(Array[Byte](0, 1, 2, 3, 9), 5, shortPal)
    assert(intercept[IllegalArgumentException](Png.parse(over))
      .getMessage.contains("palette index 9 out of range"))
  }

  test("RGBA (type 6): 4-bpp unfilter offsets and exact alpha sums") {
    val quads = payload(400) // width 5 → 20 bytes/row → 20 rows
    val got = Png.parse(Png.encodeRgba(quads, 5))
    val px = quads.grouped(4).map(_.map(_ & 0xff)).toSeq
    assert(got == Png.PngInfo(5, 20, 100L,
      px.map(_(0).toLong).sum, px.map(_(1).toLong).sum,
      px.map(_(2).toLong).sum, px.map(_(3).toLong).sum,
      px.map(q => (q(0) + q(1) + q(2)).toLong).max,
      f"${px(0)(0)}%02X${px(0)(1)}%02X${px(0)(2)}%02X"))
  }

  test("Spark plumbing: palette and RGBA wrappers match the codec directly") {
    val docs = Seq((1L, payload(25)), (2L, payload(100))).toDF("doc_id", "px")
    val pal = Multimodal.decodePng(
        Multimodal.pngPaletteBlob(docs, "doc_id", "px", width = 5),
        "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(8)))
    val palWant = Seq((1L, payload(25)), (2L, payload(100))).map {
      case (id, ix) =>
        val o = Png.parse(Png.encodePalette(ix, 5, Multimodal.FixturePalette))
        (id, o.nPixels, o.sumR, o.topLeftHex)
    }
    assert(pal.toSeq == palWant)
    val docs4 = Seq((1L, payload(40)), (2L, payload(200))).toDF("doc_id", "px")
    val rgba = Multimodal.decodePngRgba(
        Multimodal.pngRgbaBlob(docs4, "doc_id", "px", width = 5),
        "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(7), r.getString(9)))
    val rgbaWant = Seq((1L, payload(40)), (2L, payload(200))).map {
      case (id, q) =>
        val o = Png.parse(Png.encodeRgba(q, 5))
        (id, o.nPixels, o.sumA, o.topLeftHex)
    }
    assert(rgba.toSeq == rgbaWant)
  }

  /** Reference stats for a depth-16 truecolor payload: 6 bytes per pixel,
    * each sample the big-endian pair 256·hi + lo. */
  private def oracle16(px: Array[Byte], width: Int): Png.PngInfo = {
    val triples = px.grouped(6).map { g =>
      Array(((g(0) & 0xff) << 8) | (g(1) & 0xff),
        ((g(2) & 0xff) << 8) | (g(3) & 0xff),
        ((g(4) & 0xff) << 8) | (g(5) & 0xff))
    }.toSeq
    Png.PngInfo(width, px.length / (6 * width), triples.size.toLong,
      triples.map(_(0).toLong).sum, triples.map(_(1).toLong).sum,
      triples.map(_(2).toLong).sum, 0L,
      triples.map(t => (t(0) + t(1) + t(2)).toLong).max,
      f"${triples.head(0)}%04X${triples.head(1)}%04X${triples.head(2)}%04X")
  }

  test("16-bit truecolor: wide-stride filters round-trip exact samples") {
    // 10 rows of width 5 → every filter type twice at the 6-byte stride
    val px = payload(300)
    assert(Png.parse(Png.encode16(px, width = 5)) == oracle16(px, 5))
    // one row, single-pixel column, and constant rows (Up all-zero)
    assert(Png.parse(Png.encode16(px.take(30), 5)) == oracle16(px.take(30), 5))
    assert(Png.parse(Png.encode16(px.take(60), 1)) == oracle16(px.take(60), 1))
    val const = Array.fill[Byte](90)(0x7f)
    assert(Png.parse(Png.encode16(const, 5)) == oracle16(const, 5))
    // samples above 0xFF00 exercise the high byte end-to-end
    val hot = Array.fill[Byte](30)(0xff.toByte)
    assert(Png.parse(Png.encode16(hot, 5)) == oracle16(hot, 5))
  }

  test("16-bit Adam7: interlaced decode equals the sequential decode") {
    val px = payload(11 * 7 * 6) // 11×7: every pass non-empty, none aligned
    assert(Png.parse(Png.encode16Interlaced(px, width = 11)) ==
      Png.parse(Png.encode16(px, width = 11)))
    assert(Png.parse(Png.encode16Interlaced(px, width = 11)) ==
      oracle16(px, 11))
  }

  test("grayscale (types 0 and 4): bpp=1/2 filters, alpha channel, 16-bit") {
    // type 0 at depth 8: one byte per pixel, every filter at the
    // narrowest stride; the sample feeds all three stat channels
    val g = payload(50)
    val got = Png.parse(Png.encodeGray(g, width = 5))
    val samples = g.map(_ & 0xff)
    assert(got.width == 5 && got.height == 10)
    assert(got.nPixels == 50L && got.sumR == samples.map(_.toLong).sum)
    assert(got.sumG == got.sumR && got.sumB == got.sumR && got.sumA == 0L)
    assert(got.maxPx == 3L * samples.max)
    assert(got.topLeftHex == f"${samples(0)}%02X" * 3)
    // type 4: (gray, alpha) pairs at bpp=2; alpha summed exactly
    val ga = payload(100)
    val got4 = Png.parse(Png.encodeGrayAlpha(ga, width = 5))
    val pairs = ga.map(_ & 0xff).grouped(2).toArray
    assert(got4.nPixels == 50L)
    assert(got4.sumR == pairs.map(_(0).toLong).sum && got4.sumG == got4.sumR)
    assert(got4.sumA == pairs.map(_(1).toLong).sum)
    assert(got4.maxPx == 3L * pairs.map(_(0)).max)
    // depth 16 grayscale: big-endian pairs, full 0..65535 sums
    val g16 = payload(60)
    val got16 = Png.parse(Png.encodeGray16(g16, width = 5))
    val s16 = g16.map(_ & 0xff).grouped(2).map(p => p(0) * 256 + p(1)).toArray
    assert(got16.nPixels == 30L && got16.sumR == s16.map(_.toLong).sum)
    assert(got16.maxPx == 3L * s16.max)
    assert(got16.topLeftHex == f"${s16(0)}%04X" * 3)
  }

  test("16-bit RGBA: 8-byte stride and exact 16-bit alpha sums") {
    val quads = payload(800) // width 5 → 40 bytes/row → 20 rows
    val got = Png.parse(Png.encode16Rgba(quads, 5))
    val px = quads.grouped(8).map { g =>
      Array.tabulate(4)(c => ((g(2 * c) & 0xff) << 8) | (g(2 * c + 1) & 0xff))
    }.toSeq
    assert(got == Png.PngInfo(5, 20, 100L,
      px.map(_(0).toLong).sum, px.map(_(1).toLong).sum,
      px.map(_(2).toLong).sum, px.map(_(3).toLong).sum,
      px.map(q => (q(0) + q(1) + q(2)).toLong).max,
      f"${px.head(0)}%04X${px.head(1)}%04X${px.head(2)}%04X"))
  }

  test("Spark plumbing: png16Blob → decodePng matches the codec directly") {
    val docs = Seq((1L, payload(30)), (2L, payload(300))).toDF("doc_id", "px")
    val got = Multimodal.decodePng(
        Multimodal.png16Blob(docs, "doc_id", "px", width = 5),
        "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8)))
    val want = Seq((1L, payload(30)), (2L, payload(300))).map {
      case (id, px) =>
        val o = oracle16(px, 5)
        (id, o.width, o.height, o.nPixels, o.sumR, o.sumG, o.sumB, o.maxPx,
          o.topLeftHex)
    }
    assert(got.toSeq == want)
  }

  test("classifyFormat: 16-bit and grayscale PNG decodable, odd depths named") {
    val px = payload(30)
    assert(Multimodal.classifyFormat(Png.encode16(px, 5)) == ("png16", true))
    assert(Multimodal.classifyFormat(Png.encode16Interlaced(
      payload(11 * 7 * 6), 11)) == ("png16", true))
    assert(Multimodal.classifyFormat(Png.encode(payload(15), 5)) ==
      ("png8", true))
    // grayscale decodes since round 12 (label keeps the _gray suffix for
    // survey series continuity); types 0 and 4 both accepted
    assert(Multimodal.classifyFormat(Multimodal.PngGrayStub) ==
      ("png8_gray", true))
    assert(Multimodal.classifyFormat(Png.encodeGray(payload(15), 5)) ==
      ("png8_gray", true))
    assert(Multimodal.classifyFormat(Png.encodeGrayAlpha(payload(30), 5)) ==
      ("png8_gray", true))
    assert(Multimodal.classifyFormat(Png.encodeGray16(payload(30), 5)) ==
      ("png16_gray", true))
    // sub-byte depths stay named rejections
    locally {
      val stub = Multimodal.PngGrayStub.clone
      stub(24) = 4 // depth 4 — CRC no longer matches, but classification
      // is structural (header fields), not integrity: fix the CRC
      val crc = new java.util.zip.CRC32
      crc.update(stub, 12, 4 + 13)
      def be(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      System.arraycopy(be(crc.getValue), 0, stub, 29, 4)
      assert(Multimodal.classifyFormat(stub) == ("png4_gray", false))
    }
    // arithmetic-coded JPEG (SOF10 behind a DAC segment the walker must
    // skip by size) is rejected by name — the scoping-decision class
    assert(Multimodal.classifyFormat(Multimodal.ArithmeticJpegStub) ==
      ("jpeg_sofca", false))
  }

  test("Spark plumbing: pngBlob → decodePng round-trips a frame exactly") {
    val docs = Seq(
      (1L, payload(15)),   // one row: filter 0 only
      (2L, payload(150)),  // ten rows: every filter type twice
      (3L, Array.fill[Byte](45)(0)) // constant rows: Up filter all-zero
    ).toDF("doc_id", "px")
    val got = Multimodal.decodePng(
        Multimodal.pngBlob(docs, "doc_id", "px", width = 5), "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8)))
    val want = Seq((1L, payload(15)), (2L, payload(150)),
      (3L, Array.fill[Byte](45)(0))).map { case (id, px) =>
      val o = oracle(px, 5)
      (id, o.width, o.height, o.nPixels, o.sumR, o.sumG, o.sumB, o.maxPx,
        o.topLeftHex)
    }
    assert(got.toSeq == want)
  }
}
