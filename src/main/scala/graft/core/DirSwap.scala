package graft.core

import java.nio.file.{Files, Paths}

/** Heal-aware directory replacement for the index compaction paths
  * ([[graft.text.Retrieval]], [[graft.dedup.LshIndex]],
  * [[graft.sim.Ivf]], [[graft.sim.Pq]]).
  *
  * A naive replace (delete dst, rename src → dst) leaves NO copy of the
  * data for the whole duration of the delete — at index scale that is a
  * long window where a crash loses the table. [[swap]] instead renames
  * the old directory ASIDE (`dst__old`), renames the staging directory
  * in, and only then deletes the old copy: every window has at least one
  * complete copy on disk. The single non-atomic gap (aside done, swap-in
  * not) is repaired by [[heal]], which compaction entry points call
  * first — the same open-time self-repair discipline as the bucketed
  * store's stranded-swap sweep (ChaosStoreSpec). */
object DirSwap {

  private def oldOf(dst: String) = Paths.get(dst + "__old")

  /** Repair a crashed [[swap]]: dst missing + dst__old present → the
    * crash hit between the two renames, restore the old copy; both
    * present → the crash hit before the final cleanup, drop the old
    * copy (dst is already the complete new data). */
  def heal(dst: String): Unit = {
    val d = Paths.get(dst)
    val old = oldOf(dst)
    if (!Files.exists(d) && Files.isDirectory(old)) Files.move(old, d)
    else if (Files.isDirectory(old)) TempDirs.deleteRecursively(old)
  }

  /** Replace `dst` with `src`: aside-rename, in-rename, cleanup.
    * Heals at entry: if a PREVIOUS swap crashed between its renames
    * (dst missing, dst__old the only copy), a blind cleanup here would
    * delete that only copy — restore it first, exactly as the compaction
    * entry points do, so an un-healed fresh swap is still safe. */
  def swap(src: String, dst: String): Unit = {
    heal(dst)
    if (Files.exists(Paths.get(dst))) Files.move(Paths.get(dst), oldOf(dst))
    KillPoint("dirswap.aside")
    Files.move(Paths.get(src), Paths.get(dst))
    KillPoint("dirswap.in")
    TempDirs.deleteRecursively(oldOf(dst))
  }
}
