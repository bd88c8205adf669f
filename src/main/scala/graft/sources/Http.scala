package graft.sources

/** HTTP/1.1 message codec for WARC payloads — real crawl `response`
  * records carry `application/http; msgtype=response` payloads (status
  * line + header block + body), never bare documents, so the crawl
  * ingestion seam needs a byte-level splitter before any text gate sees
  * the content. Pure deterministic byte functions, no dependencies:
  *
  *  - status line + header parsing (headers keep arrival order; lookup
  *    is case-insensitive, first occurrence wins);
  *  - body framing honoring `Content-Length`, `Transfer-Encoding:
  *    chunked` (hex sizes, extensions ignored, terminal 0-chunk,
  *    optional trailers), and identity/EOF framing;
  *  - charset resolution the way a fetch pipeline resolves it: the
  *    `charset=` parameter of the HTTP `Content-Type` header, falling
  *    back to a `<meta charset=...>` sniff over the first 1024 body
  *    bytes, falling back to windows-1252 (the de-facto web default —
  *    a superset of ISO-8859-1 on the bytes browsers actually see);
  *  - charset-aware decode with REPLACE semantics (mis-declared bytes
  *    become U+FFFD deterministically, they never throw mid-corpus).
  *
  * Malformed MESSAGES fail by name (a torn status line is corruption,
  * the mm_format_survey discipline of named rejections applies one
  * level up); unknown charset NAMES degrade to the fallback (a bad
  * declaration is data, not corruption). No HTTP exists in the
  * reference (qvarnmr consumes a JSON REST API, qvarnmr/listeners.py);
  * this is beyond-reference crawl realism. */
object Http {

  /** One parsed HTTP response message. `headers` preserves wire order. */
  final case class HttpMessage(version: String, status: Int, reason: String,
      headers: Seq[(String, String)], body: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one HTTP/1.x response message: status line, headers to the
    * blank line, body framed by Content-Length / chunked / EOF. */
  def parseResponse(bytes: Array[Byte]): HttpMessage = {
    val lineEnd = indexOfCrlf(bytes, 0)
    require(lineEnd > 0, "HTTP message missing status line terminator")
    val statusLine = new String(bytes, 0, lineEnd, "US-ASCII")
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"bad HTTP status line '$statusLine'")
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"non-numeric HTTP status in '$statusLine'")
    }
    val reason = if (parts.length == 3) parts(2) else ""
    // header block: lines until the empty line
    var p = lineEnd + 2
    val headers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done) {
      val e = indexOfCrlf(bytes, p)
      require(e >= 0, "HTTP header block missing blank-line terminator")
      if (e == p) { done = true; p += 2 }
      else {
        val line = new String(bytes, p, e - p, "US-ASCII")
        val i = line.indexOf(':')
        require(i > 0, s"malformed HTTP header line '$line'")
        headers += (line.substring(0, i).trim -> line.substring(i + 1).trim)
        p = e + 2
      }
    }
    val hdr = (n: String) => header(headers.toSeq, n)
    val body =
      if (hdr("Transfer-Encoding").exists(_.equalsIgnoreCase("chunked")))
        dechunk(bytes, p)
      else hdr("Content-Length") match {
        case Some(cl) =>
          val len = try cl.toInt catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"non-numeric Content-Length '$cl'")
          }
          require(p + len <= bytes.length,
            s"HTTP body shorter than Content-Length $len")
          java.util.Arrays.copyOfRange(bytes, p, p + len)
        case None => // identity framing: body runs to end of payload
          java.util.Arrays.copyOfRange(bytes, p, bytes.length)
      }
    HttpMessage(parts(0), status, reason, headers.toSeq, body)
  }

  /** Case-insensitive header lookup; first occurrence wins (RFC 9110
    * field-order semantics for singleton fields). */
  def header(headers: Seq[(String, String)], name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  /** Decode a `Transfer-Encoding: chunked` body starting at `from`:
    * hex chunk sizes (chunk extensions after ';' ignored), data + CRLF
    * per chunk, a terminal 0-chunk, then optional trailers to the final
    * blank line (validated but discarded). */
  def dechunk(bytes: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length - from)
    var p = from
    var last = false
    while (!last) {
      val e = indexOfCrlf(bytes, p)
      require(e >= 0, "chunked body missing chunk-size line")
      val sizeLine = new String(bytes, p, e - p, "US-ASCII")
      val sizeHex = sizeLine.split(";", 2)(0).trim
      val size = try java.lang.Integer.parseInt(sizeHex, 16) catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"bad chunk size '$sizeLine'")
      }
      require(size >= 0, s"negative chunk size '$sizeLine'")
      p = e + 2
      if (size == 0) last = true
      else {
        require(p + size + 2 <= bytes.length, "chunk data truncated")
        out.write(bytes, p, size)
        require(bytes(p + size) == '\r' && bytes(p + size + 1) == '\n',
          "chunk data missing CRLF terminator")
        p += size + 2
      }
    }
    // trailers: zero or more header lines, then the blank line
    var done = false
    while (!done) {
      val e = indexOfCrlf(bytes, p)
      if (e == p) { done = true }
      else if (e < 0) { done = true } // tolerate absent final CRLF
      else p = e + 2
    }
    out.toByteArray
  }

  /** Serialize a response message for staging/round-trip fixtures —
    * `chunkSize > 0` emits a chunked body (no Content-Length),
    * otherwise Content-Length framing. */
  def responseBytes(status: Int, reason: String,
      headers: Seq[(String, String)], body: Array[Byte],
      chunkSize: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 256)
    def line(s: String): Unit = {
      out.write(s.getBytes("US-ASCII")); out.write(Crlf)
    }
    line(s"HTTP/1.1 $status $reason")
    headers.foreach { case (k, v) => line(s"$k: $v") }
    if (chunkSize > 0) {
      line("Transfer-Encoding: chunked")
      line("")
      var p = 0
      while (p < body.length) {
        val n = math.min(chunkSize, body.length - p)
        line(java.lang.Integer.toHexString(n))
        out.write(body, p, n); out.write(Crlf)
        p += n
      }
      line("0"); line("")
    } else {
      line(s"Content-Length: ${body.length}")
      line("")
      out.write(body)
    }
    out.toByteArray
  }

  // ---- charset resolution ---------------------------------------------

  /** The de-facto web fallback: every 0x80-0x9F byte is a printable
    * character, so mis-labeled legacy bytes still decode to SOMETHING
    * readable instead of control chars — the same default browsers and
    * the WHATWG encoding standard apply to undeclared content. */
  val FallbackCharset = "windows-1252"

  private val CharsetAliases: Map[String, String] = Map(
    "utf8" -> "utf-8", "utf-8" -> "utf-8",
    "latin1" -> "iso-8859-1", "latin-1" -> "iso-8859-1", "l1" -> "iso-8859-1",
    "iso8859-1" -> "iso-8859-1", "iso-8859-1" -> "iso-8859-1",
    "iso_8859-1" -> "iso-8859-1", "iso-ir-100" -> "iso-8859-1",
    "iso8859-15" -> "iso-8859-15", "iso-8859-15" -> "iso-8859-15",
    "cp1252" -> "windows-1252", "cp-1252" -> "windows-1252",
    "windows-1252" -> "windows-1252", "win-1252" -> "windows-1252",
    "x-cp1252" -> "windows-1252", "ansi_x3.4-1968" -> "us-ascii",
    "us-ascii" -> "us-ascii", "ascii" -> "us-ascii")

  /** Canonical charset name, or None for names this decoder doesn't
    * carry tables for — the caller degrades to [[FallbackCharset]]
    * (a bad declaration is data, not corruption). */
  def normalizeCharset(raw: String): Option[String] =
    CharsetAliases.get(raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim.toLowerCase)

  private val CharsetParam =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?'?\\s*([A-Za-z0-9_.:-]+)")

  /** `charset=` parameter of a Content-Type value, canonicalized. */
  def charsetOf(contentType: String): Option[String] = {
    if (contentType == null) return None
    val m = CharsetParam.matcher(contentType)
    if (m.find()) normalizeCharset(m.group(1)) else None
  }

  /** `<meta charset=...>` / `<meta http-equiv=Content-Type content=
    * "...charset=...">` sniff over the first `limit` body bytes. The
    * window is decoded as ISO-8859-1 (byte-transparent for the ASCII
    * the declaration itself is written in). */
  def sniffMetaCharset(body: Array[Byte], limit: Int = 1024): Option[String] = {
    val n = math.min(limit, body.length)
    val window = new String(body, 0, n, "ISO-8859-1")
    val i = window.toLowerCase.indexOf("<meta")
    if (i < 0) None
    else {
      val m = CharsetParam.matcher(window)
      if (m.find(i)) normalizeCharset(m.group(1)) else None
    }
  }

  /** Full resolution chain: HTTP header param → meta sniff → fallback.
    * Returns (canonical charset, source ∈ {header, meta, fallback}) —
    * the source rides along so a corpus audit can COUNT how much of the
    * crawl is running on the fallback guess. */
  def detectCharset(httpContentType: String,
                    body: Array[Byte]): (String, String) =
    charsetOf(httpContentType).map((_, "header"))
      .orElse(sniffMetaCharset(body).map((_, "meta")))
      .getOrElse((FallbackCharset, "fallback"))

  /** Decode `body` in `charset` with REPLACE semantics: malformed or
    * unmappable input becomes U+FFFD deterministically (`new String`
    * contract) — a mis-declared page yields stable garbage that dedup
    * and quality gates can still score, never an exception. */
  def decode(body: Array[Byte], charset: String): String =
    new String(body, java.nio.charset.Charset.forName(charset))
}
