package graft

import graft.core.{DirSwap, KillPoint}
import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The heal-aware directory swap under crash + recovery interleavings:
  * a swap killed at either rename seam, healed (by a "different process"),
  * then followed by a FRESH swap on the same dst — and the same sequence
  * WITHOUT the explicit heal, which swap's own entry-time heal must make
  * safe (a blind cleanup there would delete the aside copy while dst is
  * missing, losing the only complete copy). */
class DirSwapSpec extends AnyFunSuite {

  private final class Kill extends RuntimeException("injected crash")

  private def killAt(step: String)(body: => Unit): Unit = {
    KillPoint.hook = s => if (s == step) throw new Kill
    try intercept[Kill](body)
    finally KillPoint.hook = _ => ()
  }

  private def mkDir(parent: Path, name: String, marker: String): String = {
    val d = parent.resolve(name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("marker"), marker)
    d.toString
  }

  private def markerOf(dir: String): Option[String] = {
    val p = Paths.get(dir, "marker")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  test("crashed swap + heal + fresh swap converges; no window loses both copies") {
    for (step <- Seq("dirswap.aside", "dirswap.in")) {
      val base = graft.core.TempDirs.register(
        Files.createTempDirectory(s"graft_dirswap_$step"))
      val dst = mkDir(base, "table", "v1")
      val staging1 = mkDir(base, "staging1", "v2")
      killAt(step)(DirSwap.swap(staging1, dst))
      // at every kill point at least one complete copy exists on disk
      val survivors = Seq(markerOf(dst), markerOf(dst + "__old")).flatten
      assert(survivors.nonEmpty, s"$step: no complete copy left")
      DirSwap.heal(dst)
      // healed: dst is a complete copy (old if killed mid-swap, new if after)
      assert(markerOf(dst).contains(if (step == "dirswap.aside") "v1" else "v2"))
      assert(!Files.exists(Paths.get(dst + "__old")), "heal must clear the aside")
      DirSwap.heal(dst) // idempotent
      // a fresh swap on the healed dst lands the new data cleanly
      val staging2 = mkDir(base, "staging2", "v3")
      DirSwap.swap(staging2, dst)
      assert(markerOf(dst).contains("v3"))
      assert(!Files.exists(Paths.get(dst + "__old")))
    }
  }

  test("a fresh swap WITHOUT an explicit heal restores the aside copy first") {
    // kill between the renames: dst missing, dst__old is the ONLY copy —
    // the next swap must NOT delete it blindly (that window would strand
    // zero copies if the staging write were itself bad); entry-time heal
    // restores v1 before v3 replaces it
    val base = graft.core.TempDirs.register(
      Files.createTempDirectory("graft_dirswap_noheal"))
    val dst = mkDir(base, "table", "v1")
    killAt("dirswap.aside")(DirSwap.swap(mkDir(base, "s1", "v2"), dst))
    assert(markerOf(dst).isEmpty && markerOf(dst + "__old").contains("v1"))
    DirSwap.swap(mkDir(base, "s2", "v3"), dst)
    assert(markerOf(dst).contains("v3"))
    assert(!Files.exists(Paths.get(dst + "__old")))
  }
}
