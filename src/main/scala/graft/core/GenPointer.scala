package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Committed-generation pointer for the log-structured index family
  * ([[graft.dedup.LshIndex]], [[graft.sim.Ivf]], [[graft.sim.Pq]]).
  *
  * Each of those indexes applies a change batch as SEVERAL independent
  * append jobs (data rows + tombstones, sometimes across two tables).
  * Every append is stamped with the batch's generation; this pointer —
  * one `_gens` file, swapped atomically via tmp+ATOMIC_MOVE — advances
  * only after ALL of the batch's appends finished, and readers filter
  * `gen <= committed` (and tombstones `upto_gen <= committed`). A crash
  * anywhere mid-batch therefore leaves the batch INVISIBLE: the index
  * reads as its pre-batch self, and redelivering the batch at the same
  * generation is idempotent. The same design as the bucketed store's
  * manifest swap, shrunk to a single long (the underscore prefix keeps
  * the file out of Spark partition discovery).
  *
  * Pointer absent (pre-pointer index directories) = everything visible
  * (`Long.MaxValue`), so existing indexes keep working until their next
  * build/compact normalizes them. */
object GenPointer {

  def committed(dir: String): Long = {
    val p = Paths.get(dir, "_gens")
    if (!Files.exists(p)) Long.MaxValue
    else Files.readAllLines(p).get(0).stripPrefix("committed=").toLong
  }

  /** The committed generation if a pointer file exists — unlike
    * [[committed]] this does NOT default to `Long.MaxValue` for
    * pre-pointer directories, so callers can max it into a derived gen. */
  def committedOpt(dir: String): Option[Long] = {
    val p = Paths.get(dir, "_gens")
    if (!Files.exists(p)) None
    else Some(Files.readAllLines(p).get(0).stripPrefix("committed=").toLong)
  }

  /** Commit `gen` without ever regressing an existing pointer. Compaction
    * derives its rewrite generation from the LIVE rows, which after a
    * deletes-only final batch (tombstones at gen G, zero rows at G) sits
    * BELOW the committed G; recommitting that lower value would break the
    * "redelivery of a committed gen is a no-op" contract and any external
    * progress reading of the pointer. */
  def commitAtLeast(dir: String, gen: Long): Unit =
    commit(dir, committedOpt(dir).fold(gen)(math.max(gen, _)))

  def commit(dir: String, gen: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, "_gens")
    val tmp = p.resolveSibling("_gens.tmp")
    Files.write(tmp, s"committed=$gen".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
