package graft

import graft.sources.{Http, Warc, WarcSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-crawl tolerance of the WARC layer: a genuine Common Crawl shard
  * opens with a `warcinfo` record (no WARC-Target-URI) and interleaves
  * request / metadata / revisit records, and its response payloads are
  * HTTP/1.1 messages — the exact first-record shapes the strict
  * response-only grammar would throw on. These specs pin the tolerant
  * walk (classify + count, never throw), the strict walk's unchanged
  * contract, and the fused HTTP projection through WarcSource. */
class WarcTolerantSpec extends AnyFunSuite with SparkTestBase {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  /** A mixed-record shard the way a real crawl writes one: warcinfo
    * first, then request/response pairs, a metadata record, a revisit. */
  private def mixedShard(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def member(b: Array[Byte]): Unit = out.write(Warc.gzipMember(b))
    member(Warc.recordBytesOf("warcinfo", Seq(
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:info-1>",
      "Content-Type" -> "application/warc-fields"),
      ascii("software: graft-crawler/1.0\r\nformat: WARC File Format 1.0\r\n")))
    (0 until 3).foreach { i =>
      member(Warc.recordBytesOf("request", Seq(
        "WARC-Target-URI" -> s"https://ex.org/p/$i",
        "WARC-Date" -> "2026-01-01T00:00:01Z",
        "WARC-Record-ID" -> s"<urn:uuid:req-$i>",
        "Content-Type" -> "application/http; msgtype=request"),
        ascii(s"GET /p/$i HTTP/1.1\r\nHost: ex.org\r\n\r\n")))
      member(Warc.recordBytes(s"https://ex.org/p/$i",
        "2026-01-01T00:00:02Z", "application/http; msgtype=response",
        s"<urn:uuid:resp-$i>",
        Http.responseBytes(200, "OK",
          Seq("Content-Type" -> "text/html; charset=utf-8"),
          ascii(s"<html><body>page $i</body></html>"),
          chunkSize = if (i == 1) 7 else 0)))
    }
    member(Warc.recordBytesOf("metadata", Seq(
      "WARC-Date" -> "2026-01-01T00:00:03Z",
      "WARC-Record-ID" -> "<urn:uuid:meta-1>",
      "Content-Type" -> "application/warc-fields"),
      ascii("fetchTimeMs: 12\r\n")))
    member(Warc.recordBytesOf("revisit", Seq(
      "WARC-Target-URI" -> "https://ex.org/p/0",
      "WARC-Date" -> "2026-01-02T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:rev-1>",
      "Content-Type" -> "message/http"),
      Array.emptyByteArray))
    out.toByteArray
  }

  test("tolerant walk classifies every record type; strict walk throws") {
    val blob = mixedShard()
    val recs = Warc.readGzAny(blob)
    val byType = recs.groupBy(_.warcType).view.mapValues(_.size).toMap
    assert(byType == Map("warcinfo" -> 1, "request" -> 3,
      "response" -> 3, "metadata" -> 1, "revisit" -> 1))
    assert(recs.head.warcType == "warcinfo" && recs.head.url == null)
    assert(recs.filter(_.warcType == "response").forall(_.url != null))
    // the strict response-only walk dies on the FIRST record — exactly
    // the failure mode tolerant iteration exists to remove
    val m = intercept[IllegalArgumentException] {
      Warc.readGz(blob)
    }.getMessage
    assert(m.contains("WARC-Target-URI"), m)
  }

  test("mandatory-for-type headers still throw by name") {
    // a response without Target-URI is damage, not tolerable diversity
    val bad = Warc.recordBytesOf("response", Seq(
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:x>"), ascii("x"))
    assert(intercept[IllegalArgumentException] {
      Warc.parseAnyRecord(bad, 0L)
    }.getMessage.contains("WARC-Target-URI"))
    // WARC-Type itself is mandatory for every record
    val untyped = Warc.recordBytesOf("t", Seq(
      "WARC-Date" -> "d", "WARC-Record-ID" -> "<i>"), ascii("x"))
      .map(_.toChar).mkString.replace("WARC-Type: t\r\n", "")
    assert(intercept[IllegalArgumentException] {
      Warc.parseAnyRecord(untyped.getBytes("US-ASCII"), 0L)
    }.getMessage.contains("WARC-Type"))
  }

  private def stageMixed(nShards: Int): String = {
    val d = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_warc_mixed")).toString
    (0 until nShards).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, f"shard-$i%02d.warc.gz"), mixedShard())
    }
    d
  }

  test("WarcSource.readAll surfaces per-type counts over a mixed dir") {
    val dir = stageMixed(2)
    val counts = WarcSource.readAll(spark, dir, splitBytes = 256L)
      .groupBy("warc_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("warcinfo" -> 2L, "request" -> 6L,
      "response" -> 6L, "metadata" -> 2L, "revisit" -> 2L))
  }

  test("WarcSource.readHttp fuses HTTP split + charset decode per task") {
    val dir = stageMixed(1)
    val rows = WarcSource.readHttp(spark, dir, splitBytes = 256L)
      .select("url", "http_status", "http_content_type", "charset",
        "charset_src", "text", "n_headers")
      .collect()
    assert(rows.length == 3) // responses only; other types dropped here
    rows.foreach { r =>
      assert(r.getInt(1) == 200)
      assert(r.getString(2) == "text/html; charset=utf-8")
      assert(r.getString(3) == "utf-8" && r.getString(4) == "header")
      assert(r.getString(5).startsWith("<html><body>page "))
      assert(r.getInt(6) >= 2)
    }
    // the chunked response (i == 1) de-chunked to the same body shape
    val chunked = rows.find(_.getString(0).endsWith("/p/1")).get
    assert(chunked.getString(5) == "<html><body>page 1</body></html>")
  }

  test("readFilesAll: the manifest batch survives mixed-record shards") {
    val dir = stageMixed(2)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.getAbsolutePath).toSeq
    val counts = WarcSource.readFilesAll(spark, files, splitBytes = 256L)
      .groupBy("warc_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("warcinfo" -> 2L, "request" -> 6L,
      "response" -> 6L, "metadata" -> 2L, "revisit" -> 2L))
    // the strict manifest read over the same shards dies on record one
    assert(intercept[Exception] {
      WarcSource.readFiles(spark, files, splitBytes = 256L).count()
    }.getMessage != null)
  }

  test("truncated tail: tolerant walk ends cleanly, strict walk throws") {
    val m1 = Warc.gzipMember(ascii("complete one"))
    val m2 = Warc.gzipMember(ascii("complete two"))
    val m3 = Warc.gzipMember(ascii("the torn one"))
    val torn = m1 ++ m2 ++ m3.dropRight(5) // cut mid-trailer
    val it = new Warc.GzipMemberIterator(
      new java.io.ByteArrayInputStream(torn), keepPayload = true,
      tolerateTruncatedTail = true)
    val got = it.toSeq
    assert(got.size == 2)
    assert(got.map(r => new String(r._3, "US-ASCII"))
      == Seq("complete one", "complete two"))
    assert(it.tornTailOffset.contains((m1.length + m2.length).toLong))
    // strict mode: the same bytes throw by name
    assert(intercept[IllegalArgumentException] {
      new Warc.GzipMemberIterator(
        new java.io.ByteArrayInputStream(torn)).toSeq
    }.getMessage.contains("truncated"))
    // a header-only dribble of a torn tail (crawler died mid-header)
    val headerTorn = m1 ++ m3.take(6)
    val it2 = new Warc.GzipMemberIterator(
      new java.io.ByteArrayInputStream(headerTorn),
      tolerateTruncatedTail = true)
    assert(it2.size == 1 && it2.tornTailOffset.contains(m1.length.toLong))
  }

  test("tolerant mode still throws on mid-file CRC corruption") {
    val m1 = Warc.gzipMember(ascii("first"))
    val bad = m1.clone
    // flip a CRC byte in the trailer: the member decodes, verification
    // fails — mid-file damage, unambiguously NOT an EOF truncation
    bad(m1.length - 8) = (bad(m1.length - 8) ^ 0x01).toByte
    val blob = bad ++ Warc.gzipMember(ascii("second"))
    val m = intercept[IllegalArgumentException] {
      new Warc.GzipMemberIterator(
        new java.io.ByteArrayInputStream(blob),
        tolerateTruncatedTail = true).toSeq
    }.getMessage
    assert(m.contains("CRC-32"), m)
  }

  test("readHttp degrades bare (non-HTTP) response payloads") {
    val d = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_warc_bare")).toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "bare.warc.gz"),
      Warc.writeGz(Seq(("https://ex.org/plain", "2026-01-01T00:00:00Z",
        "text/plain", "<urn:uuid:p>", ascii("just text")))))
    val r = WarcSource.readHttp(spark, d, splitBytes = 256L)
      .select("http_status", "text", "charset_src").collect().head
    assert(r.isNullAt(0) && r.getString(1) == "just text")
    assert(r.getString(2) == "fallback")
  }
}
