package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the splittable WARC reader's headline claim:
  * one production-sized `.warc.gz` shard decoded as (a) a single
  * whole-blob task (`binaryFile` + sequential member walk — the round-11
  * read path) vs (b) [[graft.sources.WarcSource]]'s offset-index +
  * byte-range tasks. Run: `runMain graft.ProbeWarc [nRecords] [recBytes]
  * [splitMiB]` — defaults build a ~0.5 GB shard. Prints one JSON line;
  * numbers recorded in PLANS.md like the other probe lanes.
  *
  * What the probe isolates: both paths run the SAME member codec on the
  * same bytes, so the delta is pure execution shape — 1 task vs
  * ceil(file/split) tasks across local[32]. The index build (one
  * bounded-memory streaming pass) is timed separately because it is a
  * build-once cost amortized over every subsequent read. */
object ProbeWarc {
  def main(args: Array[String]): Unit = {
    val nRecords = if (args.length > 0) args(0).toInt else 65536
    val recBytes = if (args.length > 1) args(1).toInt else 16384
    val splitMiB = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe-warc] $label%-48s $s%.2f s")
      (r, s)
    }

    // ---- stage ONE multi-hundred-MB shard (executor-written, text-ish
    // payloads so gzip does realistic work rather than storing) --------
    val dir = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_probe_warc")).toString
    // a SECOND shard with the same payloads HTTP-wrapped (status line +
    // headers + Content-Length framing) prices the fused
    // readHttp path — message split + charset detect + decode — against
    // the raw range read on identical content
    val dirHttp = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_probe_warc_http")).toString
    val path = java.nio.file.Paths.get(dir, "shard-0000.warc.gz")
    val pathHttp = java.nio.file.Paths.get(dirHttp, "shard-0000.warc.gz")
    val (_, stageSec) = t(s"stage $nRecords recs x $recBytes B (raw+http)") {
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(path), 1 << 20)
      val outHttp = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(pathHttp), 1 << 20)
      // web-text-shaped compressibility (~3-4:1, not 60:1): words drawn
      // from a large synthetic vocabulary by a xorshift stream, so
      // deflate finds short-range matches but no long repeats
      var rng = 0x9e3779b97f4a7c15L
      def nextWord(): String = {
        rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
        "w" + java.lang.Long.toHexString(rng & 0xffffffL)
      }
      var i = 0
      while (i < nRecords) {
        val sb = new StringBuilder(recBytes + 16)
        while (sb.length < recBytes) sb.append(nextWord()).append(' ')
        val body = sb.toString.getBytes("US-ASCII")
        out.write(graft.sources.Warc.gzipMember(
          graft.sources.Warc.recordBytes(
            s"https://corpus.example/doc/$i", "2026-01-01T00:00:00Z",
            "text/plain", s"<urn:uuid:doc-$i>", body)))
        outHttp.write(graft.sources.Warc.gzipMember(
          graft.sources.Warc.recordBytes(
            s"https://corpus.example/doc/$i", "2026-01-01T00:00:00Z",
            "application/http; msgtype=response", s"<urn:uuid:doc-$i>",
            graft.sources.Http.responseBytes(200, "OK",
              Seq("Content-Type" -> "text/html; charset=utf-8",
                "Server" -> "probe/1.0"), body))))
        i += 1
      }
      out.close(); outHttp.close()
    }
    val fileBytes = java.nio.file.Files.size(path)

    // ---- (a) whole-blob: the pre-round-12 read shape ------------------
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(octet_length(col("payload"))))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val ((nBlob, bytesBlob), blobSec) = t("whole-blob (binaryFile, 1 task)") {
      digest(spark.read.format("binaryFile").load(dir)
        .select(col("content")).as[Array[Byte]]
        .flatMap(b => graft.sources.Warc.readGz(b).map(r =>
          (r.url, r.payload)))
        .toDF("url", "payload"))
    }

    // ---- (b) splittable: index build (once), then range-read ---------
    val (_, indexSec) = t("offset-index build (streaming, once)") {
      graft.sources.WarcSource.memberIndex(spark, dir).count()
    }
    val splitBytes = splitMiB.toLong * 1024 * 1024
    val nSplits = graft.sources.WarcSource.planSplits(spark, dir, splitBytes).size
    val ((nSplit, bytesSplit), splitSec) =
      t(f"splittable ($nSplits range tasks @ $splitMiB MiB)") {
        digest(graft.sources.WarcSource.read(spark, dir, splitBytes))
      }
    require(nSplit == nBlob && bytesSplit == bytesBlob,
      s"split read diverged: $nSplit/$bytesSplit vs $nBlob/$bytesBlob")

    // ---- (c) fused HTTP path: message split + charset decode in the
    // same range task, on the HTTP-wrapped twin of the same content ----
    val (_, indexHttpSec) = t("http shard: offset-index build") {
      graft.sources.WarcSource.memberIndex(spark, dirHttp).count()
    }
    val ((nHttp, bytesHttp), httpSec) =
      t(f"readHttp (fused split+charset+decode)") {
        val r = graft.sources.WarcSource
          .readHttp(spark, dirHttp, splitBytes)
          .agg(count(lit(1)), sum(octet_length(col("body"))))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
    require(nHttp == nBlob && bytesHttp == bytesBlob,
      s"http read diverged: $nHttp/$bytesHttp vs $nBlob/$bytesBlob")

    println(f"""{"metric":"warc_read_speedup","value":${blobSec / splitSec}%.2f,"unit":"x","file_mib":${fileBytes / 1048576}%d,"n_records":$nBlob%d,"n_splits":$nSplits%d,"stage_sec":$stageSec%.2f,"blob_sec":$blobSec%.2f,"index_sec":$indexSec%.2f,"split_sec":$splitSec%.2f,"http_sec":$httpSec%.2f,"http_overhead":${httpSec / splitSec}%.2f,"index_http_sec":$indexHttpSec%.2f}""")
    spark.stop()
  }
}
