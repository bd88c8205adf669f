package graft

import graft.multimodal.Jpeg

/** Driver-side CPU split of the JPEG codec hot path: encode vs decode per
  * blob, no Spark — prices where the next mm_* second actually goes.
  * Usage: runMain graft.ProbeJpeg [payloadBytes=2048] [blobs=2000] */
object ProbeJpeg {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2048
    val blobs = if (args.length > 1) args(1).toInt else 2000
    val payload = Array.tabulate(n)(i => ((i * 131 + 7) % 251).toByte)

    def time(label: String, reps: Int)(body: => Unit): Unit = {
      // warmup then measure
      (0 until math.max(1, reps / 4)).foreach(_ => body)
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => body)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[jpeg] $label%-28s ${dt}%.2f s  (${dt * 1000 / reps}%.3f ms/blob)")
    }

    time("encodeGray", blobs) { Jpeg.encodeGray(payload) }
    val gray = Jpeg.encodeGray(payload)
    time("parse (gray decode)", blobs) { Jpeg.parse(gray) }
    time("encodeColor420", blobs / 4) { Jpeg.encodeColor420(payload, 3) }
    val c420 = Jpeg.encodeColor420(payload, 3)
    time("parseColor (420 decode)", blobs / 4) { Jpeg.parseColor(c420) }
    time("encodeGrayProgressive", blobs / 4) { Jpeg.encodeGrayProgressive(payload) }
    val prog = Jpeg.encodeGrayProgressive(payload)
    time("parse (progressive decode)", blobs / 4) { Jpeg.parse(prog) }
  }
}
