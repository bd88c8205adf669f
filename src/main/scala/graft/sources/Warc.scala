package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** WARC/1.0 + gzip-member codec — the crawl-native ingestion format of
  * web-scale training data (Common-Crawl-style `.warc.gz`): each WARC
  * record is compressed as its OWN gzip member and the members are
  * concatenated, which is exactly what makes a multi-gigabyte crawl file
  * SPLITTABLE — a task can start decoding at any member boundary without
  * touching the bytes before it. This codec implements both layers for
  * real and dependency-free:
  *
  *  - the gzip member framing by hand (RFC 1952 header with FLG/extra
  *    field handling, raw-deflate body via `Inflater(nowrap)`, and the
  *    8-byte trailer whose CRC-32 and ISIZE are VERIFIED per member —
  *    `GZIPInputStream` would hide the member boundaries we need);
  *  - the WARC/1.0 record grammar (version line, named headers,
  *    Content-Length-delimited payload, double-CRLF terminators), strict
  *    on everything: a bad magic, CRC mismatch, missing header, or short
  *    payload throws by name rather than yielding a torn record.
  *
  * No WARC exists in the reference — this is beyond-reference realism
  * for the LLM-pipeline ingestion seam. */
object Warc {

  final case class WarcRecord(
      url: String, date: String, contentType: String,
      recordId: String, payload: Array[Byte],
      /** Byte offset of this record's gzip member in the file — the
        * split point a distributed reader hands the NEXT task. */
      memberOffset: Long)

  // ---- gzip member layer (RFC 1952) -----------------------------------

  /** Compress `payload` as ONE complete gzip member (header + raw
    * deflate + CRC-32/ISIZE trailer). */
  def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    // header: magic, CM=8 (deflate), FLG=0, MTIME=0, XFL=0, OS=255
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, true) // raw
    defl.setInput(payload)
    defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val crc = new CRC32
    crc.update(payload)
    def le32(v: Long): Array[Byte] = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    out.write(le32(crc.getValue))
    out.write(le32(payload.length.toLong & 0xffffffffL))
    out.toByteArray
  }

  /** Decode the gzip member starting at `offset`: verifies the RFC 1952
    * header (skipping FEXTRA/FNAME/FCOMMENT/FHCRC if flagged), inflates
    * the raw-deflate body, and checks the trailer's CRC-32 and ISIZE.
    * Returns (payload, offsetAfterMember). */
  def readGzipMember(blob: Array[Byte], offset: Int): (Array[Byte], Int) = {
    require(offset + 10 <= blob.length, "truncated gzip header")
    require((blob(offset) & 0xff) == 0x1f && (blob(offset + 1) & 0xff) == 0x8b,
      f"not a gzip member at offset $offset")
    require((blob(offset + 2) & 0xff) == 8, "unknown gzip compression method")
    val flg = blob(offset + 3) & 0xff
    require((flg & 0xe0) == 0, "reserved gzip FLG bits set")
    var p = offset + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      require(p + 2 <= blob.length, "truncated gzip FEXTRA")
      val xlen = (blob(p) & 0xff) | ((blob(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (p < blob.length && blob(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < blob.length && blob(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    require(p <= blob.length, "gzip header overruns the blob")
    val infl = new Inflater(true) // raw deflate
    infl.setInput(blob, p, blob.length - p)
    val out = new java.io.ByteArrayOutputStream(4096)
    val buf = new Array[Byte](8192)
    while (!infl.finished()) {
      val n = infl.inflate(buf)
      require(n > 0 || infl.finished(), "truncated gzip deflate stream")
      out.write(buf, 0, n)
    }
    val consumed = (blob.length - p) - infl.getRemaining
    infl.end()
    val payload = out.toByteArray
    val tr = p + consumed
    require(tr + 8 <= blob.length, "truncated gzip trailer")
    def le32(o: Int): Long = (blob(o) & 0xffL) | (blob(o + 1) & 0xffL) << 8 |
      (blob(o + 2) & 0xffL) << 16 | (blob(o + 3) & 0xffL) << 24
    val crc = new CRC32
    crc.update(payload)
    require(le32(tr) == crc.getValue,
      f"gzip member CRC-32 mismatch at offset $offset")
    require(le32(tr + 4) == (payload.length.toLong & 0xffffffffL),
      "gzip ISIZE mismatch")
    (payload, tr + 8)
  }

  // ---- WARC record layer ----------------------------------------------

  private val Crlf = "\r\n"

  /** Serialize one WARC/1.0 record with EXPLICIT headers (uncompressed
    * form) — Content-Length is derived; everything else arrives as
    * given. The typed writers below build on this. */
  def recordBytesOf(warcType: String, headers: Seq[(String, String)],
                    payload: Array[Byte]): Array[Byte] = {
    val header = new StringBuilder
    header.append("WARC/1.0").append(Crlf)
    header.append("WARC-Type: ").append(warcType).append(Crlf)
    headers.foreach { case (k, v) =>
      header.append(k).append(": ").append(v).append(Crlf)
    }
    header.append("Content-Length: ").append(payload.length).append(Crlf)
    header.append(Crlf)
    header.toString.getBytes("US-ASCII") ++ payload ++
      (Crlf + Crlf).getBytes("US-ASCII")
  }

  /** Serialize one WARC/1.0 record of `warcType` (default `response`;
    * `conversion` is the WET sidecar type) with the standard headers. */
  def recordBytes(url: String, date: String, contentType: String,
                  recordId: String, payload: Array[Byte],
                  warcType: String = "response"): Array[Byte] =
    recordBytesOf(warcType, Seq(
      "WARC-Target-URI" -> url, "WARC-Date" -> date,
      "WARC-Record-ID" -> recordId, "Content-Type" -> contentType), payload)

  /** Write records as a member-per-record `.warc.gz` byte stream — each
    * record its own gzip member, members concatenated. `warcType`
    * applies to every record (`response` crawl shards, `conversion`
    * WET-style extracted-text sidecars). */
  def writeGz(records: Seq[(String, String, String, String, Array[Byte])],
              warcType: String = "response"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (url, date, ct, id, payload) =>
      out.write(gzipMember(recordBytes(url, date, ct, id, payload, warcType)))
    }
    out.toByteArray
  }

  /** A record under the TOLERANT grammar: `warcType` always present;
    * `url`/`contentType` null when the record type doesn't carry them
    * (a real crawl shard opens with a `warcinfo` record that has no
    * WARC-Target-URI and interleaves request/metadata/revisit records
    * — the reader classifies them, it doesn't throw). */
  final case class WarcAnyRecord(
      warcType: String, url: String, date: String, contentType: String,
      recordId: String, payload: Array[Byte], memberOffset: Long)

  /** Record types for which WARC-Target-URI is mandatory (ISO 28500
    * §5.12 — all types except warcinfo and, in practice, metadata). */
  private val TargetUriTypes = Set(
    "response", "request", "revisit", "conversion", "continuation", "resource")

  /** Shared record-grammar scan: version line, well-formed header lines
    * to the empty line, payload of exactly Content-Length bytes,
    * double-CRLF terminator. Grammar-level damage still throws by name
    * under BOTH parse modes — tolerance is about record TYPES, not torn
    * bytes. */
  private def parseCommon(bytes: Array[Byte])
      : (Map[String, String], Array[Byte]) = {
    val headerEnd = indexOfDoubleCrlf(bytes, 0)
    require(headerEnd >= 0, "WARC record missing header terminator")
    val head = new String(bytes, 0, headerEnd, "US-ASCII")
    val lines = head.split("\r\n", -1)
    require(lines.nonEmpty && lines(0) == "WARC/1.0",
      s"bad WARC version line '${lines.headOption.getOrElse("")}'")
    val hdrs = lines.drop(1).map { l =>
      val i = l.indexOf(':')
      require(i > 0, s"malformed WARC header line '$l'")
      l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
    }.toMap
    val len = hdrs.getOrElse("content-length",
      throw new IllegalArgumentException(
        "WARC record missing Content-Length header")).toInt
    val payloadStart = headerEnd + 4
    require(payloadStart + len <= bytes.length,
      "WARC payload shorter than Content-Length")
    val payload = java.util.Arrays.copyOfRange(bytes, payloadStart,
      payloadStart + len)
    val term = new String(bytes, payloadStart + len,
      math.min(4, bytes.length - payloadStart - len), "US-ASCII")
    require(term == "\r\n\r\n", "WARC record missing payload terminator")
    (hdrs, payload)
  }

  /** Parse ONE uncompressed WARC record. Strict grammar: version line,
    * header lines until the empty line, mandatory WARC-Target-URI /
    * WARC-Date / WARC-Record-ID / Content-Type / Content-Length, payload
    * of exactly Content-Length bytes, double-CRLF terminator. The
    * strict contract fits engine-written response-only shards; real
    * mixed-type crawl input goes through [[parseAnyRecord]]. */
  def parseRecord(bytes: Array[Byte], memberOffset: Long): WarcRecord = {
    val (hdrs, payload) = parseCommon(bytes)
    def need(k: String): String = hdrs.getOrElse(k.toLowerCase,
      throw new IllegalArgumentException(s"WARC record missing $k header"))
    WarcRecord(need("WARC-Target-URI"), need("WARC-Date"),
      need("Content-Type"), need("WARC-Record-ID"), payload, memberOffset)
  }

  /** TOLERANT single-record parse — what a real Common Crawl shard
    * needs on its very first record: WARC-Type / WARC-Date /
    * WARC-Record-ID / Content-Length are mandatory for every type (ISO
    * 28500 §5), WARC-Target-URI only for the types that carry one, and
    * Content-Type is surfaced when present (null otherwise). Unknown
    * record types pass through classified, not thrown — the reader
    * counts them (the mm_format_survey discipline). */
  def parseAnyRecord(bytes: Array[Byte], memberOffset: Long): WarcAnyRecord = {
    val (hdrs, payload) = parseCommon(bytes)
    def need(k: String): String = hdrs.getOrElse(k.toLowerCase,
      throw new IllegalArgumentException(s"WARC record missing $k header"))
    val warcType = need("WARC-Type").toLowerCase
    val url =
      if (TargetUriTypes(warcType)) need("WARC-Target-URI")
      else hdrs.getOrElse("warc-target-uri", null)
    WarcAnyRecord(warcType, url, need("WARC-Date"),
      hdrs.getOrElse("content-type", null), need("WARC-Record-ID"),
      payload, memberOffset)
  }

  private def indexOfDoubleCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Walk a member-per-record `.warc.gz` blob FROM byte `offset` (a
    * member boundary — 0 for the whole file, or a recorded
    * [[WarcRecord.memberOffset]] for a mid-file split) and decode every
    * record at or after it. The sequential member walk is what a
    * distributed reader runs per split; `memberOffset` on each record is
    * the boundary it would hand the next task. */
  def readGz(blob: Array[Byte], offset: Int = 0): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var p = offset
    while (p < blob.length) {
      val (payload, next) = readGzipMember(blob, p)
      out += parseRecord(payload, p.toLong)
      p = next
    }
    out.toSeq
  }

  /** [[readGz]] under the tolerant grammar: every record classified by
    * WARC-Type, none thrown for being the "wrong" type — the walk a
    * real mixed-record crawl shard requires. */
  def readGzAny(blob: Array[Byte], offset: Int = 0): Seq[WarcAnyRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcAnyRecord]
    var p = offset
    while (p < blob.length) {
      val (payload, next) = readGzipMember(blob, p)
      out += parseAnyRecord(payload, p.toLong)
      p = next
    }
    out.toSeq
  }

  /** BOUNDED-MEMORY streaming gzip-member walker — the index pass of the
    * splittable reader ([[WarcSource]]). Walks an InputStream member by
    * member holding only a compressed window (64 KiB, grown transiently
    * only if a single gzip HEADER outruns it) plus, when `keepPayload`,
    * one member's inflated payload: a production multi-GB `.warc.gz`
    * never materializes on the heap. Yields `(memberOffset,
    * nextMemberOffset, payload)` per member (payload empty when
    * `keepPayload` is false — CRC-32 and ISIZE are still verified from
    * the inflated stream, so a torn member fails the INDEX pass, not a
    * later read). Same strictness as [[readGzipMember]].
    *
    * `tolerateTruncatedTail` relaxes exactly ONE failure class: bytes
    * running out AT END OF FILE mid-member — the shard a crawler was
    * writing when it died, the most common damage in a real crawl
    * bucket. Iteration then ends cleanly after the last COMPLETE member
    * and [[tornTailOffset]] reports where the torn one started (count
    * it, don't throw — the survey discipline). Mid-file corruption (CRC
    * mismatch, bad magic, reserved flags) still throws by name in both
    * modes: only EOF-truncation is distinguishable damage. */
  final class GzipMemberIterator(in: java.io.InputStream,
                                 keepPayload: Boolean = false,
                                 tolerateTruncatedTail: Boolean = false)
      extends Iterator[(Long, Long, Array[Byte])] {
    private var buf = new Array[Byte](1 << 16)
    private var len = 0   // valid bytes in buf
    private var pos = 0   // cursor into buf
    private var base = 0L // absolute file offset of buf(0)
    private var eof = false

    /** Compact + read more; false at EOF. Never called while the
      * Inflater holds unconsumed input (it references `buf`). */
    private def fill(): Boolean = {
      if (eof) return false
      if (pos > 0) {
        System.arraycopy(buf, pos, buf, 0, len - pos)
        base += pos; len -= pos; pos = 0
      }
      if (len == buf.length) // a header field outran the window
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      val n = in.read(buf, len, buf.length - len)
      if (n <= 0) { eof = true; false } else { len += n; true }
    }
    private def ensure(n: Int): Boolean = {
      while (len - pos < n && fill()) {}
      len - pos >= n
    }
    private def skipZeroTerminated(what: String): Unit = {
      var done = false
      while (!done) {
        while (pos < len && buf(pos) != 0) pos += 1
        if (pos < len) { pos += 1; done = true }
        else require(fill(), s"truncated gzip $what field")
      }
    }

    /** Start offset of the EOF-truncated tail member, once hit
      * (tolerant mode only); iteration has ended when this is set. */
    var tornTailOffset: Option[Long] = None
    private var pending: (Long, Long, Array[Byte]) = null

    override def hasNext: Boolean = pending != null || advance()

    override def next(): (Long, Long, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException("end of gzip members")
      val r = pending; pending = null; r
    }

    /** Decode one member into `pending` (lookahead — the decode work
      * happens in hasNext so a torn tail can end iteration instead of
      * throwing from next()). */
    private def advance(): Boolean = {
      if (tornTailOffset.isDefined || !ensure(1)) return false
      val memberOffset = base + pos
      try { pending = decodeOne(memberOffset); true }
      catch {
        // every "truncated ..." require fires only after fill() hit
        // EOF, so the message prefix IS the tail-truncation signal;
        // CRC/magic/flag damage keeps its named throw
        case e: IllegalArgumentException
            if tolerateTruncatedTail && eof && e.getMessage != null &&
              e.getMessage.contains("truncated gzip") =>
          tornTailOffset = Some(memberOffset)
          false
      }
    }

    private def decodeOne(memberOffset: Long): (Long, Long, Array[Byte]) = {
      require(ensure(10), "truncated gzip header")
      require((buf(pos) & 0xff) == 0x1f && (buf(pos + 1) & 0xff) == 0x8b,
        f"not a gzip member at offset $memberOffset")
      require((buf(pos + 2) & 0xff) == 8, "unknown gzip compression method")
      val flg = buf(pos + 3) & 0xff
      require((flg & 0xe0) == 0, "reserved gzip FLG bits set")
      pos += 10
      if ((flg & 0x04) != 0) { // FEXTRA
        require(ensure(2), "truncated gzip FEXTRA")
        val xlen = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8)
        require(ensure(2 + xlen), "truncated gzip FEXTRA payload")
        pos += 2 + xlen
      }
      if ((flg & 0x08) != 0) skipZeroTerminated("FNAME")
      if ((flg & 0x10) != 0) skipZeroTerminated("FCOMMENT")
      if ((flg & 0x02) != 0) { require(ensure(2), "truncated gzip FHCRC"); pos += 2 }
      // raw-deflate body, fed window by window; CRC/size computed from the
      // inflated stream whether or not the payload is kept
      val infl = new Inflater(true)
      val crc = new CRC32
      var isize = 0L
      val keep = if (keepPayload) new java.io.ByteArrayOutputStream(4096) else null
      val outChunk = new Array[Byte](8192)
      try {
        while (!infl.finished()) {
          if (infl.needsInput()) {
            if (pos == len) require(fill(), "truncated gzip deflate stream")
            infl.setInput(buf, pos, len - pos)
            pos = len // all fed; unconsumed remainder reclaimed at finish
          }
          val n = infl.inflate(outChunk)
          if (n > 0) {
            crc.update(outChunk, 0, n)
            isize += n
            if (keep != null) keep.write(outChunk, 0, n)
          }
        }
        pos -= infl.getRemaining // hand back the last chunk's unread tail
      } finally infl.end() // also on a truncation throw (tolerant tail)
      require(ensure(8), "truncated gzip trailer")
      def le32(o: Int): Long = (buf(o) & 0xffL) | (buf(o + 1) & 0xffL) << 8 |
        (buf(o + 2) & 0xffL) << 16 | (buf(o + 3) & 0xffL) << 24
      require(le32(pos) == crc.getValue,
        f"gzip member CRC-32 mismatch at offset $memberOffset")
      require(le32(pos + 4) == (isize & 0xffffffffL), "gzip ISIZE mismatch")
      pos += 8
      (memberOffset, base + pos,
        if (keep != null) keep.toByteArray else Array.emptyByteArray)
    }
  }
}
