package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM baseline PNG codec — the decode seam's first COMPRESSED
  * format (WAV/BMP/MP4 all walk uncompressed containers; real crawl data
  * is PNG/JPEG). Dependency-free: `java.util.zip` supplies the zlib
  * stream, everything else — chunk grammar, CRC-32 per chunk, the five
  * row filters including Paeth — is implemented here.
  *
  * Scope covers the three 8-bit color types real web graphics use —
  * truecolor (2), palette (3, PLTE-indexed), and RGBA (6) — plus
  * 16-BIT depth for truecolor/RGBA (big-endian samples, the
  * HDR/scientific layout; filter arithmetic stays byte-wise with the
  * wider pixel stride per spec §9), with
  * compression 0, filter method 0, interlace 0 (sequential) AND
  * interlace 1 (Adam7: seven independently-filtered sub-images whose
  * grids tile the frame — spec §8.2; the decoder walks each pass's own
  * geometry and resets the filter context per pass). Anything else —
  * grayscale types, sub-byte depths — throws loudly rather than faking
  * a decode. The encoder
  * deliberately cycles ALL FIVE filter types across rows and splits large
  * IDAT payloads into multiple chunks, so every decoder path (unfilter
  * types 0-4, cross-chunk zlib concatenation, per-chunk CRC checks) is
  * exercised by every round-tripped document, and the DuckDB oracle
  * cross-checks the decoded pixels against the payload bytes it re-derives
  * from the source text — a decoder that failed to invert the real
  * Deflater stream or mis-unfiltered any row type hash-mismatches. */
object Png {

  val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Exact integer statistics over the decoded pixels. PNG is stored
    * top-down, so `topLeftHex` is the FIRST pixel's RGB bytes — the
    * orientation twin of BMP's bottom-up witness. `sumA` is 0 for the
    * alphaless color types (2 truecolor, 3 palette). */
  final case class PngInfo(
      width: Int, height: Int, nPixels: Long,
      sumR: Long, sumG: Long, sumB: Long, sumA: Long,
      maxPx: Long, // max over pixels of (R + G + B)
      topLeftHex: String)

  /** Byte stride of one pixel at the given color type and depth. Palette
    * indices are always one byte (the spec's 16-bit depth is not valid
    * for type 3); truecolor/RGBA carry `channels × depth/8` bytes. */
  private def bppOf(colorType: Int, depth: Int = 8): Int = {
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette index
      case 4 => 2 // grayscale + alpha
      case 6 => 4 // RGBA
      case t => throw new IllegalArgumentException(
        s"only grayscale (0), truecolor (2), palette (3), " +
          s"gray+alpha (4), RGBA (6) supported, got $t")
    }
    require(depth == 8 || depth == 16, s"depth $depth unsupported")
    require(depth == 8 || colorType != 3,
      "16-bit depth is not valid for palette color type")
    channels * (depth / 8)
  }

  private def crcOf(typ: Array[Byte], data: Array[Byte], off: Int,
                    len: Int): Long = {
    val c = new CRC32
    c.update(typ)
    c.update(data, off, len)
    c.getValue
  }

  private def beU32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte], off: Int = 0,
                    len: Int = -1): Array[Byte] = {
    val n = if (len < 0) data.length else len
    val t = typ.getBytes("US-ASCII")
    beU32(n.toLong) ++ t ++ data.slice(off, off + n) ++
      beU32(crcOf(t, data, off, n))
  }

  /** Adam7 pass grid (spec §8.2): (xStart, yStart, xStep, yStep) per
    * pass. A pass's sub-image is the pixels at (yStart + r·yStep,
    * xStart + c·xStep); passes whose sub-image is empty contribute NO
    * scanlines (not even filter bytes). */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Sub-image dimensions of one pass over a width×height frame. */
  private def passDims(width: Int, height: Int,
                       pass: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = pass
    (math.max(0, (width - x0 + dx - 1) / dx),
      math.max(0, (height - y0 + dy - 1) / dy))
  }

  /** Paeth predictor (PNG spec §9.4) — exact reference arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode raw RGB bytes (`rgb.length % (3*width) == 0`, at least one
    * row) as a REAL baseline truecolor PNG. Row `r` uses filter type
    * `r % 5`, so a multi-row image exercises None/Sub/Up/Average/Paeth;
    * the deflated stream splits into IDAT chunks of at most `idatChunk`
    * bytes. */
  def encode(rgb: Array[Byte], width: Int, idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(rgb, width, colorType = 2, palette = null, idatChunk)

  /** Encode grayscale samples (one byte per pixel) as a type-0 PNG. */
  def encodeGray(samples: Array[Byte], width: Int,
                 idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(samples, width, colorType = 0, palette = null, idatChunk)

  /** Encode (gray, alpha) byte pairs as a type-4 PNG. */
  def encodeGrayAlpha(ga: Array[Byte], width: Int,
                      idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(ga, width, colorType = 4, palette = null, idatChunk)

  /** Encode big-endian 16-bit grayscale samples as a depth-16 type-0
    * PNG (two bytes per pixel). */
  def encodeGray16(samples: Array[Byte], width: Int,
                   idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(samples, width, colorType = 0, palette = null, idatChunk,
      depth = 16)

  /** Encode palette INDICES (1 byte per pixel) against a 256-entry RGB
    * palette as a REAL type-3 PNG (PLTE + filtered index plane) — the
    * layout of most web graphics. */
  def encodePalette(indices: Array[Byte], width: Int,
                    palette: Array[Byte], idatChunk: Int = 4096): Array[Byte] = {
    require(palette.length > 0 && palette.length % 3 == 0 &&
      palette.length <= 768, "palette must be 1..256 RGB triples")
    encodeRaw(indices, width, colorType = 3, palette, idatChunk)
  }

  /** Encode raw RGBA bytes (4 per pixel) as a REAL type-6 PNG. */
  def encodeRgba(rgba: Array[Byte], width: Int,
                 idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(rgba, width, colorType = 6, palette = null, idatChunk)

  /** Encode raw 16-BIT truecolor samples (6 bytes per pixel: big-endian
    * R,G,B) as a REAL depth-16 type-2 PNG — the HDR/scientific-image
    * layout. Filtering operates on BYTES with the 6-byte pixel stride
    * (spec §9: the filter offset is the pixel's byte width), so every
    * filter type exercises the wide-stride arithmetic. */
  def encode16(samples: Array[Byte], width: Int,
               idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(samples, width, colorType = 2, palette = null, idatChunk,
      depth = 16)

  /** [[encode16]]'s Adam7-interlaced twin: the same 16-bit pixels stored
    * as seven independently-filtered pass sub-images. */
  def encode16Interlaced(samples: Array[Byte], width: Int,
                         idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(samples, width, colorType = 2, palette = null, idatChunk,
      interlaced = true, depth = 16)

  /** Encode raw 16-bit RGBA samples (8 bytes per pixel, big-endian) as a
    * REAL depth-16 type-6 PNG. */
  def encode16Rgba(samples: Array[Byte], width: Int,
                   idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(samples, width, colorType = 6, palette = null, idatChunk,
      depth = 16)

  /** Encode raw RGB bytes as a REAL Adam7-INTERLACED truecolor PNG: the
    * seven pass sub-images are extracted on the spec grid, each filtered
    * as an independent image (filter context resets per pass), and the
    * concatenated stream deflates into the usual split IDATs. */
  def encodeInterlaced(rgb: Array[Byte], width: Int,
                       idatChunk: Int = 4096): Array[Byte] =
    encodeRaw(rgb, width, colorType = 2, palette = null, idatChunk,
      interlaced = true)

  /** Filter one (sub-)image's rows: 1 type byte + rowBytes per row, with
    * the row filter cycling through all five types (offset by
    * `tOffset` so consecutive passes don't align their cycles). */
  private def filterRows(pixels: Array[Byte], pw: Int, ph: Int, bpp: Int,
                         tOffset: Int): Array[Byte] = {
    val rowBytes = bpp * pw
    val filtered = new Array[Byte](ph * (1 + rowBytes))
    var r = 0
    while (r < ph) {
      val t = (r + tOffset) % 5
      val base = r * rowBytes
      val out = r * (1 + rowBytes)
      filtered(out) = t.toByte
      var x = 0
      while (x < rowBytes) {
        val raw = pixels(base + x) & 0xff
        val left = if (x >= bpp) pixels(base + x - bpp) & 0xff else 0
        val up = if (r > 0) pixels(base - rowBytes + x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp) pixels(base - rowBytes + x - bpp) & 0xff else 0
        val pred = t match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(out + 1 + x) = ((raw - pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    filtered
  }

  private def encodeRaw(rgb: Array[Byte], width: Int, colorType: Int,
                        palette: Array[Byte], idatChunk: Int,
                        interlaced: Boolean = false,
                        depth: Int = 8): Array[Byte] = {
    require(width > 0, "width must be positive")
    val Bpp = bppOf(colorType, depth)
    val rowBytes = Bpp * width
    require(rgb.length > 0 && rgb.length % rowBytes == 0,
      s"payload must be a positive whole number of $rowBytes-byte rows")
    val height = rgb.length / rowBytes

    val filtered: Array[Byte] =
      if (!interlaced) filterRows(rgb, width, height, Bpp, tOffset = 0)
      else {
        val out = new java.io.ByteArrayOutputStream(rgb.length + height * 8)
        Adam7.zipWithIndex.foreach { case (pass @ (x0, y0, dx, dy), pi) =>
          val (pw, ph) = passDims(width, height, pass)
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](ph * Bpp * pw)
            var r = 0
            while (r < ph) {
              var c = 0
              while (c < pw) {
                val src = ((y0 + r * dy) * width + (x0 + c * dx)) * Bpp
                System.arraycopy(rgb, src, sub, (r * pw + c) * Bpp, Bpp)
                c += 1
              }
              r += 1
            }
            out.write(filterRows(sub, pw, ph, Bpp, tOffset = pi))
          }
        }
        out.toByteArray
      }

    // zlib-deflate the filtered stream
    val defl = new Deflater()
    defl.setInput(filtered)
    defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    defl.end()
    val z = zbuf.toByteArray

    val ihdr = beU32(width.toLong) ++ beU32(height.toLong) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, // deflate, adaptive
        if (interlaced) 1 else 0)
    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    if (colorType == 3) out.write(chunk("PLTE", palette))
    var off = 0
    while (off < z.length) { // multiple IDATs: consumers must concatenate
      val n = math.min(idatChunk, z.length - off)
      out.write(chunk("IDAT", z, off, n))
      off += n
    }
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Parse + fully decode a baseline PNG: walk the chunk stream verifying
    * every CRC, inflate the concatenated IDAT payload, reverse the per-row
    * filter, and return exact channel statistics. Strict on everything the
    * baseline contract promises: bad signature, CRC mismatch, interlace,
    * non-8-bit, unsupported color types, palette-index overrun, truncated
    * or oversized IDAT, and a missing IEND all throw with a named
    * reason. */
  def parse(blob: Array[Byte]): PngInfo = {
    require(blob.length >= Signature.length + 12, "not a PNG: too short")
    var i = 0
    while (i < Signature.length) {
      require(blob(i) == Signature(i), "not a PNG: bad signature")
      i += 1
    }
    def u32(o: Int): Long = (blob(o) & 0xffL) << 24 | (blob(o + 1) & 0xffL) << 16 |
      (blob(o + 2) & 0xffL) << 8 | (blob(o + 3) & 0xffL)

    var off = Signature.length
    var width = -1; var height = -1
    var colorType = -1; var bpp = 0; var depth = 8
    var interlaced = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false; var sawIend = false
    val total = blob.length.toLong
    while (!sawIend) {
      require(off + 12 <= total, "truncated chunk header")
      val len = u32(off)
      val typ = new String(blob, off + 4, 4, "US-ASCII")
      require(len <= total - off - 12, s"chunk '$typ' overruns the blob")
      val dataOff = off + 8
      val n = len.toInt
      val crc = u32(dataOff + n)
      require(crc == crcOf(blob.slice(off + 4, off + 8), blob, dataOff, n),
        s"chunk '$typ': CRC mismatch")
      typ match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(n == 13, "IHDR must be 13 bytes")
          val w = u32(dataOff); val h = u32(dataOff + 4)
          require(w >= 1 && w <= Int.MaxValue / 8, s"width $w out of range")
          require(h >= 1 && h <= Int.MaxValue / 8, s"height $h out of range")
          depth = blob(dataOff + 8) & 0xff
          require(depth == 8 || depth == 16,
            s"only 8/16-bit depth supported, got $depth")
          colorType = blob(dataOff + 9) & 0xff
          bpp = bppOf(colorType, depth) // throws by name on 0/4/unknown
          require(blob(dataOff + 10) == 0, "unknown compression method")
          require(blob(dataOff + 11) == 0, "unknown filter method")
          interlaced = blob(dataOff + 12) match {
            case 0 => false
            case 1 => true
            case m => throw new IllegalArgumentException(
              s"unknown interlace method $m")
          }
          width = w.toInt; height = h.toInt
          sawIhdr = true
        case "PLTE" =>
          require(sawIhdr, "PLTE before IHDR")
          require(n > 0 && n % 3 == 0 && n <= 768,
            "PLTE must hold 1..256 RGB triples")
          require(idat.size == 0, "PLTE after IDAT")
          palette = blob.slice(dataOff, dataOff + n)
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(blob, dataOff, n)
        case "IEND" =>
          require(n == 0, "IEND must be empty")
          sawIend = true
        case _ => () // ancillary chunks skip by size (CRC still checked)
      }
      off = dataOff + n + 4
    }
    require(sawIhdr, "missing IHDR")
    require(idat.size > 0, "missing IDAT")
    require(colorType != 3 || palette != null, "palette PNG missing PLTE")

    // inflate to EXACTLY the filtered-stream length the declared geometry
    // implies — one sub-image per Adam7 pass when interlaced (empty
    // passes contribute nothing, not even filter bytes), else the whole
    // frame as a single pass
    val passes: Seq[(Int, Int)] =
      if (!interlaced) Seq((width, height))
      else Adam7.map(passDims(width, height, _)).filter(d => d._1 > 0 && d._2 > 0)
    val expected = passes.map { case (pw, ph) =>
      ph.toLong * (1L + bpp.toLong * pw) }.sum
    require(expected <= Int.MaxValue, "image too large")
    val filtered = new Array[Byte](expected.toInt)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < filtered.length && !infl.finished()) {
      val n = infl.inflate(filtered, got, filtered.length - got)
      require(n > 0 || infl.finished(), "truncated IDAT stream")
      got += n
    }
    val over = new Array[Byte](1)
    require(infl.finished() || infl.inflate(over) == 0,
      "IDAT inflates past the declared geometry")
    infl.end()
    require(got == filtered.length,
      s"IDAT inflates to $got bytes, geometry needs ${filtered.length}")

    // unfilter + statistics, one sub-image at a time: the filter context
    // (previous row) resets at every pass boundary — spec §8.2 treats each
    // pass as an independent image. The statistics are placement-
    // independent (sums/max over the same pixel SET in either layout);
    // the top-left witness is the first pixel of the FIRST pass, which
    // starts at logical (0, 0) in both layouts.
    var nPx = 0L; var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var mx = 0L
    var topLeftHex = ""
    var streamOff = 0
    var firstPass = true
    for ((pw, ph) <- passes) {
      val rowBytes = bpp * pw
      val cur = new Array[Int](rowBytes)
      val prev = new Array[Int](rowBytes)
      var r = 0
      while (r < ph) {
        val base = streamOff + r * (1 + rowBytes)
        val t = filtered(base) & 0xff
        require(t <= 4, s"row $r: unknown filter type $t")
        var x = 0
        while (x < rowBytes) {
          val f = filtered(base + 1 + x) & 0xff
          val left = if (x >= bpp) cur(x - bpp) else 0
          val up = if (r > 0) prev(x) else 0
          val ul = if (r > 0 && x >= bpp) prev(x - bpp) else 0
          val pred = t match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          cur(x) = (f + pred) & 0xff
          x += 1
        }
        var p = 0
        while (p < pw) {
          var red = 0; var green = 0; var blue = 0; var alpha = 0
          // 16-bit samples are big-endian pairs; stats sum the FULL
          // 0..65535 sample values (same columns, wider domain)
          def s16(i: Int) = (cur(i) << 8) | cur(i + 1)
          (colorType, depth) match {
            // grayscale: the one sample feeds all three channels, so
            // every downstream stat (sums, max of R+G+B, topleft hex)
            // keeps its meaning without a per-type schema
            case (0, 8) =>
              red = cur(p); green = red; blue = red
            case (0, 16) =>
              red = s16(2 * p); green = red; blue = red
            case (4, 8) =>
              red = cur(2 * p); green = red; blue = red
              alpha = cur(2 * p + 1)
            case (4, 16) =>
              red = s16(4 * p); green = red; blue = red
              alpha = s16(4 * p + 2)
            case (2, 8) =>
              red = cur(3 * p); green = cur(3 * p + 1); blue = cur(3 * p + 2)
            case (2, 16) =>
              red = s16(6 * p); green = s16(6 * p + 2); blue = s16(6 * p + 4)
            case (3, _) =>
              val idx = cur(p)
              require(3 * idx + 2 < palette.length,
                s"palette index $idx out of range (${palette.length / 3} entries)")
              red = palette(3 * idx) & 0xff
              green = palette(3 * idx + 1) & 0xff
              blue = palette(3 * idx + 2) & 0xff
            case (6, 8) =>
              red = cur(4 * p); green = cur(4 * p + 1); blue = cur(4 * p + 2)
              alpha = cur(4 * p + 3)
            case (6, 16) =>
              red = s16(8 * p); green = s16(8 * p + 2); blue = s16(8 * p + 4)
              alpha = s16(8 * p + 6)
          }
          nPx += 1; sr += red; sg += green; sb += blue; sa += alpha
          val px = (red + green + blue).toLong; if (px > mx) mx = px
          if (firstPass && r == 0 && p == 0)
            topLeftHex =
              if (depth == 16) f"$red%04X$green%04X$blue%04X"
              else f"$red%02X$green%02X$blue%02X"
          p += 1
        }
        System.arraycopy(cur, 0, prev, 0, rowBytes)
        r += 1
      }
      streamOff += ph * (1 + rowBytes)
      firstPass = false
    }
    PngInfo(width, height, nPx, sr, sg, sb, sa, mx, topLeftHex)
  }
}
