package graft

import graft.multimodal.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sparse-aware IDCT (loops bounded by the last nonzero
  * coefficient row/column — the r13 optimization) bit-identical to the
  * unbounded reference on random blocks with random zero tails: the
  * skipped terms are exact `+= c * 0` no-ops, so no output pixel may
  * differ. */
class JpegIdctSparseSpec extends AnyFunSuite {

  /** The pre-optimization reference: full 8×8 separable passes over the
    * same CosTable, identical summation order. */
  private val cosTable: Array[Double] = {
    val t = new Array[Double](64)
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

  private def idctFull(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += cosTable(x * 8 + u) * coef(y * 8 + u); u += 1 }
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
        while (v < 8) { s += cosTable(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val px = math.round(s / 4.0 + 128.0).toInt
        out(yy * 8 + x) = math.max(0, math.min(255, px))
        yy += 1
      }
      x += 1
    }
    out
  }

  test("bounded IDCT is bit-identical to the unbounded reference") {
    val rnd = new scala.util.Random(42)
    // sweep sparsity: DC-only, a few AC, random rectangles, dense
    for (trial <- 0 until 2000) {
      val coef = new Array[Int](64)
      val shape = trial % 5
      shape match {
        case 0 => // DC-only (the fixture-encoder block)
          coef(0) = rnd.nextInt(2048) - 1024
        case 1 => // DC + up to 3 random AC
          coef(0) = rnd.nextInt(2048) - 1024
          (0 until rnd.nextInt(4)).foreach { _ =>
            coef(rnd.nextInt(63) + 1) = rnd.nextInt(512) - 256
          }
        case 2 => // nonzero support confined to a random top-left rectangle
          val r = rnd.nextInt(8); val c = rnd.nextInt(8)
          for (y <- 0 to r; x <- 0 to c)
            coef(y * 8 + x) = rnd.nextInt(256) - 128
        case 3 => // dense
          (0 until 64).foreach(i => coef(i) = rnd.nextInt(256) - 128)
        case 4 => // all-zero block
          ()
      }
      val got = Jpeg.idct(coef)
      val want = idctFull(coef)
      assert(got.sameElements(want),
        s"trial $trial shape $shape: ${got.toSeq} != ${want.toSeq}")
    }
  }

  test("interior zeros inside the bounded rectangle are still summed") {
    // a block whose max row/col come from far coefficients with zeros
    // in between — the bounded loops must still walk the interior zeros
    val coef = new Array[Int](64)
    coef(0) = 300; coef(7) = -40; coef(56) = 25 // corners: maxR=7, maxC=7
    assert(Jpeg.idct(coef).sameElements(idctFull(coef)))
  }
}
