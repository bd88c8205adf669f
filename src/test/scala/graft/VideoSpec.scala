package graft

import graft.multimodal.{Jpeg, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-MP4 video decode — the composition of the demux walk (frames
  * located through the container's OWN stbl tables) and the baseline-JPEG
  * pipeline, frame-parallel through one keyed shuffle. Mirrors the
  * Mp4Spec/JpegSpec discipline: byte-level mux/demux round-trips, decode
  * equivalence against the single-frame decoder, plan-shape pinning, and
  * loud failure on structural damage. */
class VideoSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def frames(payload: Array[Byte], frameBytes: Int): Seq[Array[Byte]] =
    payload.grouped(frameBytes).map(Jpeg.encodeGray(_)).toSeq

  test("muxMjpeg → framePlan: the declared plan locates every frame exactly") {
    val payload = "The quick brown fox jumps over the lazy dog, twice!!!!! and then some..."
      .getBytes("UTF-8").take(64) ++ Array.tabulate(64)(i => (i * 7).toByte)
    val fs = frames(payload, 32) // 4 frames, entropy-coded → varied sizes
    assert(fs.map(_.length).distinct.size > 1, "fixture should vary sizes")
    val blob = Multimodal.muxMjpeg(fs, frameMs = 40)
    val plan = Multimodal.framePlan(blob)
    assert(plan.frameMs == 40L)
    assert(plan.sizes.toSeq == fs.map(_.length.toLong))
    // each declared range slices back to EXACTLY the muxed frame bytes
    fs.zipWithIndex.foreach { case (f, i) =>
      val got = java.util.Arrays.copyOfRange(blob,
        plan.offsets(i).toInt, (plan.offsets(i) + plan.sizes(i)).toInt)
      assert(got.toSeq == f.toSeq, s"frame $i bytes drifted")
    }
    // offsets are contiguous from the single stco chunk
    assert(plan.offsets.toSeq ==
      plan.offsets.indices.map(i => plan.offsets(0) + fs.take(i).map(_.length.toLong).sum))
    // the stats sampler sees the same plan (shared walk)
    val d = Multimodal.demuxSample(blob, stride = 2)
    assert(d.nFrames == 4L && d.frameMs == 40L && d.nSampled == 2L)
    assert(d.sampledBytes == fs(0).length + fs(2).length)
  }

  test("structural damage fails loudly, never decodes garbage") {
    val fs = frames(Array.tabulate(64)(_.toByte), 32)
    val blob = Multimodal.muxMjpeg(fs, frameMs = 40)
    // truncating the mdat makes the last declared frame overrun
    val cut = java.util.Arrays.copyOfRange(blob, 0, blob.length - 5)
    val e = intercept[IllegalArgumentException](Multimodal.framePlan(cut))
    assert(e.getMessage.contains("overruns"))
    // a container with no stbl tables is rejected by name
    val bare = Multimodal.muxMjpeg(fs, frameMs = 40).take(16) // ftyp only
    val e2 = intercept[IllegalArgumentException](Multimodal.framePlan(bare))
    assert(e2.getMessage.contains("stts/stsz/stco"))
  }

  test("decodeVideoFrames ≡ per-frame Jpeg.parse, and the DC-only fixture maths") {
    val docs = Seq(
      (1L, "alphabet soup for everyone, with seconds!!! and thirds padded.!!"),
      (2L, ("z" * 64) + ("A" * 64))) // 1 and 2 frames at 64 bytes/frame
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val got = Multimodal.decodeVideoFrames(
        Multimodal.mjpegBlob(docs, "doc_id", "px", frameBytes = 64, frameMs = 40),
        "doc_id", "blob")
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getInt(7), r.getString(8)))
    val want = Seq(
      (1L, "alphabet soup for everyone, with seconds!!! and thirds padded.!!"),
      (2L, ("z" * 64) + ("A" * 64))).flatMap { case (id, tx) =>
      tx.getBytes("UTF-8").grouped(64).zipWithIndex.map { case (slice, k) =>
        val j = Jpeg.parse(Jpeg.encodeGray(slice)) // the single-frame truth
        (id, k, k * 40L, j.width, j.height, j.nPixels, j.sumPx, j.maxPx,
          j.topLeftHex)
      }
    }
    assert(got.toSeq == want)
    // fixture arithmetic the oracle replays: flat 8×8 per byte
    val f0 = want.head
    val bytes0 = "alphabet soup for everyone, with seconds!!! and thirds padded.!!"
      .getBytes("UTF-8").take(64).map(_ & 0xff)
    assert(f0._4 == 8 && f0._5 == 512 && f0._6 == 4096L)
    assert(f0._7 == 64L * bytes0.sum && f0._8 == bytes0.max)
  }

  test("video decode plan: one keyed frame fan-out shuffle") {
    val docs = Seq((1L, "x" * 128), (2L, "y" * 192))
      .toDF("doc_id", "text")
      .withColumn("px", encode(col("text"), "UTF-8"))
    val q = Multimodal.decodeVideoFrames(
      Multimodal.mjpegBlob(docs, "doc_id", "px", frameBytes = 64, frameMs = 40),
      "doc_id", "blob")
    q.collect()
    val finalPlan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def occ(s: String) = finalPlan.sliding(s.length).count(_ == s)
    // exactly ONE keyed (video, frame) fan-out; the only other allowed
    // shuffle is the encode stage's Par.ensure spread. Output is already
    // per-frame — no merge exchange exists at all
    assert(occ("REPARTITION_BY_COL") == 1, finalPlan)
    assert(occ("Exchange ") <= 2, finalPlan)
  }
}
