package graft

import graft.multimodal.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame-header walker: spec'd frame-length arithmetic, padding
  * stride, ID3v2 skip, CBR/VBR detection, frame-exact duration, and
  * named failures for torn or out-of-scope streams. */
class Mp3Spec extends AnyFunSuite {

  test("frame length matches the Layer III spec arithmetic") {
    // 144 * 128000 / 44100 = 417 (trunc); padding adds one byte
    assert(Mp3.frameLength(9, 0, padding = false) == 417)
    assert(Mp3.frameLength(9, 0, padding = true) == 418)
    // 144 * 320000 / 32000 = 1440
    assert(Mp3.frameLength(14, 2, padding = false) == 1440)
  }

  test("walker strides padded and unpadded frames exactly") {
    val blob = Mp3.frame(9, 0, padding = true, _ => 0xAA) ++
      Mp3.frame(9, 0, padding = false, _ => 0xBB) ++
      Mp3.frame(9, 0, padding = true, _ => 0xCC)
    val got = Mp3.parse(blob)
    assert(got == Mp3.Mp3Info(3, 44100, cbr = true, 128,
      3L * 1152 * 1000 / 44100, hasId3 = false))
  }

  test("ID3v2 prefix skips by syncsafe size; VBR detected across frames") {
    val frames = Mp3.frame(9, 1, padding = false, _ => 1) ++
      Mp3.frame(11, 1, padding = false, _ => 2)
    val got = Mp3.parse(Mp3.id3v2(200) ++ frames)
    assert(got.hasId3 && !got.cbr && got.maxKbps == 192)
    assert(got.sampleRate == 48000 && got.nFrames == 2)
    // a syncsafe size crossing the 7-bit boundaries still lands on the
    // first frame (size 300 = 0b10_0101100 -> bytes 0x02 0x2C)
    assert(Mp3.parse(Mp3.id3v2(300) ++ frames).nFrames == 2)
  }

  test("fixture builder round-trips every doc_id shape") {
    for (id <- 0L until 50L) {
      val got = Mp3.parse(Mp3.build(id, Array.emptyByteArray))
      val n = 1 + (id % 8).toInt
      val sr = Seq(44100, 48000, 32000)((id % 3).toInt)
      assert(got.nFrames == n, s"id=$id")
      assert(got.sampleRate == sr)
      assert(got.hasId3 == (id % 5 == 0))
      assert(got.cbr == (id % 4 != 0 || n == 1), s"id=$id")
      assert(got.maxKbps == (if (id % 4 != 0) 128
        else if (n >= 3) 192 else if (n == 2) 160 else 128))
      assert(got.durationMs == n.toLong * 1152 * 1000 / sr)
    }
  }

  test("torn or out-of-scope streams fail loud by name") {
    val ok = Mp3.frame(9, 0, padding = false, _ => 0)
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Mp3.parse(b)).getMessage
    // truncated mid-frame
    assert(msg(ok.dropRight(5)).contains("overruns"))
    // garbage after a valid frame = lost sync
    assert(msg(ok ++ Array[Byte](1, 2, 3, 4)).contains("lost MP3 sync"))
    // MPEG-2 version bits
    assert(msg(ok.updated(1, 0xf3.toByte)).contains("MPEG-1"))
    // Layer II
    assert(msg(ok.updated(1, 0xfd.toByte)).contains("Layer III"))
    // free-format (0) and reserved (15) bitrate indices
    assert(msg(ok.updated(2, 0x00.toByte)).contains("bitrate index"))
    assert(msg(ok.updated(2, 0xf0.toByte)).contains("bitrate index"))
    // reserved samplerate index
    assert(msg(ok.updated(2, (ok(2) | 0x0c).toByte))
      .contains("samplerate"))
    // ID3 size past the end
    assert(msg(Mp3.id3v2(0).take(10)).contains("no MP3 frames") ||
      msg(Mp3.id3v2(4).take(10)).contains("overruns"))
  }
}
