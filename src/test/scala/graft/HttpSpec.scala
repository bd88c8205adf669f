package graft

import graft.sources.Http
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP/1.1 message codec under the WARC payload seam: framing
  * (Content-Length / chunked / identity), header semantics, charset
  * resolution chain, and the named-error grammar. */
class HttpSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("content-length framing round-trips") {
    val body = ascii("hello <b>world</b> body")
    val msg = Http.responseBytes(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Server" -> "graft/1.0"), body)
    val m = Http.parseResponse(msg)
    assert(m.version == "HTTP/1.1" && m.status == 200 && m.reason == "OK")
    assert(m.headers.map(_._1) ==
      Seq("Content-Type", "Server", "Content-Length"))
    assert(m.body.sameElements(body))
  }

  test("chunked framing reassembles and serializer round-trips") {
    val body = ascii("x" * 1000 + "tail")
    val msg = Http.responseBytes(200, "OK",
      Seq("Content-Type" -> "text/html"), body, chunkSize = 257)
    val m = Http.parseResponse(msg)
    assert(Http.header(m.headers, "transfer-encoding").contains("chunked"))
    assert(Http.header(m.headers, "Content-Length").isEmpty)
    assert(m.body.sameElements(body))
  }

  test("chunk extensions and trailers are tolerated") {
    val raw = ascii(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "5;ext=1\r\nhello\r\n3\r\n wo\r\n0\r\nX-Trailer: t\r\n\r\n")
    assert(new String(Http.parseResponse(raw).body, "US-ASCII") == "hello wo")
  }

  test("identity framing runs to end of payload") {
    val raw = ascii("HTTP/1.1 204 No Content\r\nServer: s\r\n\r\nrest bytes")
    val m = Http.parseResponse(raw)
    assert(m.status == 204 && m.reason == "No Content")
    assert(new String(m.body, "US-ASCII") == "rest bytes")
  }

  test("header lookup is case-insensitive, first occurrence wins") {
    val hs = Seq("X-A" -> "1", "x-a" -> "2", "X-B" -> "3")
    assert(Http.header(hs, "x-A").contains("1"))
    assert(Http.header(hs, "X-C").isEmpty)
  }

  test("malformed messages fail by name") {
    assert(intercept[IllegalArgumentException] {
      Http.parseResponse(ascii("HTTP/1.1 abc OK\r\n\r\n"))
    }.getMessage.contains("non-numeric HTTP status"))
    assert(intercept[IllegalArgumentException] {
      Http.parseResponse(ascii("GARBAGE\r\n\r\n"))
    }.getMessage.contains("bad HTTP status line"))
    assert(intercept[IllegalArgumentException] {
      Http.parseResponse(ascii("HTTP/1.1 200 OK\r\nNo-Terminator: x"))
    }.getMessage.contains("blank-line terminator"))
    assert(intercept[IllegalArgumentException] {
      Http.parseResponse(ascii(
        "HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort"))
    }.getMessage.contains("shorter than Content-Length"))
    assert(intercept[IllegalArgumentException] {
      Http.parseResponse(ascii(
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n"))
    }.getMessage.contains("bad chunk size"))
  }

  test("charset from Content-Type header parameter") {
    assert(Http.charsetOf("text/html; charset=UTF-8").contains("utf-8"))
    assert(Http.charsetOf("text/html;charset=\"Windows-1252\"")
      .contains("windows-1252"))
    assert(Http.charsetOf("text/html; charset=latin1")
      .contains("iso-8859-1"))
    assert(Http.charsetOf("text/html").isEmpty)
    // unknown names degrade (bad declaration is data, not corruption)
    assert(Http.charsetOf("text/html; charset=klingon").isEmpty)
    assert(Http.charsetOf(null).isEmpty)
  }

  test("meta charset sniff in the first 1024 bytes only") {
    val m1 = ascii("<html><head><meta charset='windows-1252'></head>")
    assert(Http.sniffMetaCharset(m1).contains("windows-1252"))
    val m2 = ascii("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\">")
    assert(Http.sniffMetaCharset(m2).contains("iso-8859-1"))
    val late = ascii(" " * 1100 + "<meta charset=utf-8>")
    assert(Http.sniffMetaCharset(late).isEmpty)
  }

  test("detection chain: header beats meta beats fallback") {
    val metaBody = ascii("<meta charset=utf-8>x")
    assert(Http.detectCharset("text/html; charset=ISO-8859-1", metaBody)
      == ("iso-8859-1", "header"))
    assert(Http.detectCharset("text/html", metaBody) == ("utf-8", "meta"))
    assert(Http.detectCharset("text/html", ascii("plain"))
      == ("windows-1252", "fallback"))
    assert(Http.detectCharset(null, ascii("x")) == ("windows-1252", "fallback"))
  }

  test("decode honors single-byte charsets and replaces bad sequences") {
    // 0xE9 0x80 0x97: e-acute, euro, em-dash in cp1252
    val cp = Array[Byte](0xe9.toByte, 0x80.toByte, 0x97.toByte)
    assert(Http.decode(cp, "windows-1252") == "é€—")
    // same bytes as latin-1: 0x80/0x97 are C1 control chars
    assert(Http.decode(cp, "iso-8859-1") == "\u00e9\u0080\u0097")
    // malformed utf-8 (continuation byte where a lead is required) →
    // deterministic replacement chars, never a throw
    val bad = Array[Byte](0xc3.toByte, 0x28.toByte, 0x80.toByte)
    assert(Http.decode(bad, "utf-8") == "�(�")
    assert(Http.decode("中文€".getBytes("UTF-8"), "utf-8") == "中文€")
  }
}
