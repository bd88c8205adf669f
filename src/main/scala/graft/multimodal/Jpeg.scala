package graft.multimodal

/** Pure-JVM baseline JPEG (JFIF) codec — the decode seam's second
  * COMPRESSED format, pairing with [[Png]]. Everything is implemented
  * here from the public interchange format: the segment grammar
  * (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), canonical Huffman table construction
  * from DHT counts, the entropy-coded scan with byte-stuffing (FF 00),
  * DC prediction with size-category + sign-extension coding, run/size AC
  * coding with EOB and ZRL, zigzag order, dequantization, and the full
  * 2-D inverse DCT with level shift and clamping.
  *
  * Strict scope, like the other decoders: baseline sequential (SOF0),
  * 8-bit, single-component grayscale, no restart intervals. Progressive
  * (SOF2), arithmetic coding, multi-component scans, and DRI all throw
  * loudly by name rather than decoding garbage.
  *
  * JPEG is lossy, so unlike PNG the driver oracle cannot re-derive
  * arbitrary pixels. The fixture encoder therefore emits DC-ONLY blocks
  * whose dequantized DC is `(b - 128) * 8` for payload byte `b`: the IDCT
  * of a DC-only block is EXACTLY flat at `F(0,0)/8 + 128 = b` (no
  * rounding error for any b), so every decoded pixel is an exact integer
  * the oracle recomputes from the source text — while the decoder still
  * runs the entire real pipeline (Huffman, prediction, dequant, IDCT) to
  * get there. AC-bearing streams are exercised by the spec against an
  * independent reference IDCT. */
object Jpeg {

  final case class JpegInfo(
      width: Int, height: Int, nPixels: Long,
      sumPx: Long, sumSq: Long, maxPx: Int, minPx: Int,
      topLeftHex: String)

  // ---- fixture Huffman tables (carried in DHT; the decoder builds its
  // tables generically from whatever DHT declares) --------------------

  /** DC table: all 12 size categories as 4-bit canonical codes. */
  private val DcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray

  /** AC table: EOB, ZRL, (run 0, size 1..10), and (run 1..15, size 1..3)
    * — 57 canonical 6-bit codes. Enough for EOB-only fixture blocks and
    * for the spec's AC-bearing streams with arbitrary short runs. */
  private val AcBits = Array(0, 0, 0, 0, 0, 57, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = (Array(0x00, 0xF0) ++ (1 to 10).map(s => 0x00 | s) ++
    (1 to 15).flatMap(r => Seq((r << 4) | 1, (r << 4) | 2, (r << 4) | 3)))
    .map(_.toByte)

  /** Zigzag scan order: zigzag index -> raster index (row*8 + col). */
  private[graft] val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var r = 0; var c = 0
    var i = 0
    while (i < 64) {
      out(i) = r * 8 + c
      if ((r + c) % 2 == 0) { // moving up-right
        if (c == 7) r += 1 else if (r == 0) c += 1 else { r -= 1; c += 1 }
      } else { // moving down-left
        if (r == 7) c += 1 else if (c == 0) r += 1 else { r += 1; c -= 1 }
      }
      i += 1
    }
    out
  }

  /** Fixture quantization table in ZIGZAG order: q(DC)=8 makes the flat
    * fixture exact; the AC entries are small primes so spec streams hit
    * non-trivial dequantization. */
  private val QuantZig: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 5)

  // ------------------------------------------------------------ encoder

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { // pad with 1-bits (spec convention)
        acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
        out.write(acc)
        if (acc == 0xff) out.write(0x00)
      }
      out.toByteArray
    }
  }

  /** Canonical code assignment from (counts-per-length, values):
    * value -> (code, length). */
  private def canonical(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += ((vals(vi) & 0xff) -> (code, len))
        code += 1; vi += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    m.result()
  }

  private def category(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((payload.length + 2) >>> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++
      payload

  /** General fixture encoder: one grayscale 8×8 block per entry of
    * `blocks`, each a 64-entry array of quantized coefficients in ZIGZAG
    * order, laid out `blocksPerRow` MCUs wide (the block count must be a
    * whole number of rows). Emits a complete baseline JFIF stream. */
  private[graft] def encodeBlocks(blocks: Array[Array[Int]],
                                       blocksPerRow: Int): Array[Byte] = {
    require(blocks.nonEmpty, "need at least one block")
    require(blocksPerRow > 0 && blocks.length % blocksPerRow == 0,
      "block count must be a whole number of rows")
    val w = 8 * blocksPerRow
    val h = 8 * (blocks.length / blocksPerRow)
    require(w <= 0xffff && h <= 0xffff, "image dims exceed 16 bits")
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBits, AcVals)

    val bw = new BitWriter
    var prevDc = 0
    for (b <- blocks) {
      require(b.length == 64, "each block carries 64 zigzag coefficients")
      // DC: size category + sign-extended difference bits
      val diff = b(0) - prevDc
      prevDc = b(0)
      val s = category(diff)
      val (c, l) = dcCodes(s)
      bw.write(c, l)
      if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: run/size symbols + value bits, ZRL for 16-zero runs, EOB
      var k = 1
      var run = 0
      while (k < 64) {
        val v = b(k)
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = acCodes(0xF0); bw.write(zc, zl); run -= 16
          }
          val sz = category(v)
          val sym = (run << 4) | sz
          val (ac, al) = acCodes.getOrElse(sym,
            throw new IllegalArgumentException(
              f"fixture AC table lacks symbol 0x$sym%02X"))
          bw.write(ac, al)
          bw.write(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acCodes(0x00); bw.write(ec, el) } // EOB
    }
    val scan = bw.finish()

    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]) =
      Array(((cls << 4) | id).toByte) ++ bits.map(_.toByte) ++ vals
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(seg(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))) // APP0 v1.1, no density
    out.write(seg(0xdb, Array(0x00.toByte) ++ QuantZig.map(_.toByte))) // DQT
    out.write(seg(0xc0, Array[Byte](8, // SOF0: precision
      (h >>> 8).toByte, (h & 0xff).toByte, (w >>> 8).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))) // 1 component, 1x1 sampling, quant table 0
    out.write(seg(0xc4, dht(0, 0, DcBits, DcVals) ++ dht(1, 0, AcBits, AcVals)))
    out.write(seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))) // SOS
    out.write(scan)
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Driver-fixture encoder: payload byte `b` → one DC-only block whose
    * decoded 8×8 is EXACTLY flat at `b` (see object doc). One block per
    * MCU row (width 8, height 8·n). */
  def encodeGray(payload: Array[Byte]): Array[Byte] = {
    require(payload.nonEmpty && payload.length <= 8191,
      "payload must be 1..8191 bytes (height is 16-bit)")
    encodeBlocks(payload.map { b =>
      val blk = new Array[Int](64)
      blk(0) = (b & 0xff) - 128 // dequantized DC = (b-128)*8 with q=8
      blk
    }.toArray, blocksPerRow = 1)
  }

  // ------------------------------------------------------------ decoder

  /** Canonical Huffman decoder built from DHT counts/values, using the
    * standard mincode/maxcode/valptr walk (one table probe per length). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var vi = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = vi
        minCode(l) = code
        code += bits(l - 1); vi += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1 // no codes at this length
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        code = (code << 1) | br.readBit()
        l += 1
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l)) & 0xff
      }
      throw new IllegalArgumentException("invalid Huffman code in scan")
    }
  }

  /** Entropy-scan bit reader with FF00 byte-unstuffing; hitting a real
    * marker or the end of the blob mid-scan fails loud. */
  private final class BitReader(blob: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) {
        require(pos < blob.length, "scan truncated")
        var b = blob(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < blob.length, "scan truncated at FF")
          val m = blob(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal FF
          else throw new IllegalArgumentException(
            f"marker FF$m%02X inside entropy scan (truncated stream?)")
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def bytePos: Int = pos
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(x*8+u) = C(u)·cos((2x+1)uπ/16)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(x * 8 + u) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Full 2-D IDCT (separable double-precision), level shift, clamp. */
  private[graft] def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D over u for each v-row of coefficients
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTable(x * 8 + u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTable(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val px = math.round(s / 4.0 + 128.0).toInt
        out(yy * 8 + x) = math.max(0, math.min(255, px))
        yy += 1
      }
      x += 1
    }
    out
  }

  /** Parse + fully decode a baseline grayscale JFIF stream into exact
    * pixel statistics. Strict: progressive, arithmetic, multi-component,
    * restart intervals, 16-bit quant tables all throw by name. */
  def parse(blob: Array[Byte]): JpegInfo = {
    require(blob.length >= 4 && (blob(0) & 0xff) == 0xff &&
      (blob(1) & 0xff) == 0xd8, "not a JPEG: missing SOI")
    var pos = 2
    def u16(o: Int): Int = ((blob(o) & 0xff) << 8) | (blob(o + 1) & 0xff)

    var width = -1; var height = -1
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var sofSeen = false
    var compQuant = -1

    while (pos < blob.length) {
      require((blob(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = blob(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case m if m >= 0xd0 && m <= 0xd7 =>
          throw new IllegalArgumentException("restart markers not supported")
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported")
        case 0xc9 | 0xca | 0xcb => throw new IllegalArgumentException(
          "arithmetic-coded JPEG not supported")
        case 0xdd => throw new IllegalArgumentException(
          "restart intervals (DRI) not supported")
        case 0xc0 =>
          val len = u16(pos)
          require(blob(pos + 2) == 8, "only 8-bit precision supported")
          height = u16(pos + 3); width = u16(pos + 5)
          require(width >= 1 && height >= 1, "dims out of range")
          val nComp = blob(pos + 7) & 0xff
          require(nComp == 1,
            s"only single-component (grayscale) supported, got $nComp")
          require((blob(pos + 9) & 0xff) == 0x11, "only 1x1 sampling supported")
          compQuant = blob(pos + 10) & 0xff
          sofSeen = true
          pos += len
        case 0xdb =>
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pq = (blob(o) & 0xff) >> 4
            val tq = blob(o) & 0x0f
            require(pq == 0, "16-bit quantization tables not supported")
            quant(tq) = Array.tabulate(64)(i => blob(o + 1 + i) & 0xff)
            o += 65
          }
          pos += len
        case 0xc4 =>
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val cls = (blob(o) & 0xff) >> 4
            val id = blob(o) & 0x0f
            val bits = Array.tabulate(16)(i => blob(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = blob.slice(o + 17, o + 17 + n)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
            o += 17 + n
          }
          pos += len
        case 0xda =>
          val len = u16(pos)
          require(sofSeen, "SOS before SOF0")
          val nComp = blob(pos + 2) & 0xff
          require(nComp == 1, "multi-component scan not supported")
          val dcId = (blob(pos + 4) & 0xff) >> 4
          val acId = blob(pos + 4) & 0x0f
          require(blob(pos + 5) == 0 && blob(pos + 6) == 63 && blob(pos + 7) == 0,
            "non-baseline spectral selection")
          val dcT = dcTables(dcId); val acT = acTables(acId)
          require(dcT != null && acT != null, "scan references missing DHT")
          val q = quant(compQuant)
          require(q != null, "frame references missing DQT")
          return decodeScan(blob, pos + len, width, height, dcT, acT, q)
        case _ => // APPn/COM/etc: skip by length
          pos += u16(pos)
      }
    }
    throw new IllegalArgumentException("missing SOS")
  }

  private def decodeScan(blob: Array[Byte], scanStart: Int, width: Int,
                         height: Int, dcT: HuffTable, acT: HuffTable,
                         q: Array[Int]): JpegInfo = {
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val br = new BitReader(blob, scanStart)
    var prevDc = 0
    var nPx = 0L; var sum = 0L; var sq = 0L; var mx = 0; var mn = 255
    var topLeftHex = ""
    val coef = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val s = dcT.decode(br)
        require(s <= 11, s"DC size category $s out of range")
        prevDc += extend(br.readBits(s), s)
        coef(0) = prevDc * q(0)
        var k = 1
        while (k < 64) {
          val sym = acT.decode(br)
          if (sym == 0x00) k = 64 // EOB
          else if (sym == 0xF0) k += 16 // ZRL
          else {
            val run = sym >> 4
            val sz = sym & 0x0f
            k += run
            require(k < 64, "AC run overflows the block")
            coef(Zigzag(k)) = extend(br.readBits(sz), sz) * q(k)
            k += 1
          }
        }
        val px = idct(coef)
        // accumulate only pixels inside the declared geometry (the last
        // block row/col may overhang when dims are not multiples of 8)
        val xMax = math.min(8, width - bx * 8)
        val yMax = math.min(8, height - by * 8)
        var yy = 0
        while (yy < yMax) {
          var xx = 0
          while (xx < xMax) {
            val v = px(yy * 8 + xx)
            nPx += 1; sum += v; sq += v.toLong * v
            if (v > mx) mx = v
            if (v < mn) mn = v
            xx += 1
          }
          yy += 1
        }
        if (bx == 0 && by == 0) topLeftHex = f"${px(0)}%02X"
        bx += 1
      }
      by += 1
    }
    // trailing EOI must follow the (byte-aligned) scan
    var p = br.bytePos
    while (p + 1 < blob.length && !((blob(p) & 0xff) == 0xff &&
        (blob(p + 1) & 0xff) == 0xd9)) p += 1
    require(p + 1 < blob.length, "missing EOI after scan")
    JpegInfo(width, height, nPx, sum, sq, mx, mn, topLeftHex)
  }
}
