package graft.incr

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** A19 — single-writer lease with keep-alive (reference listeners.py:56-153,
  * worker.py:51-64): a state row holds `owner` + `timestamp`; the owner
  * heartbeats every `interval`; another worker may steal the lease once
  * `timeout` has elapsed since the last heartbeat; acquiring a live lease
  * held by someone else raises [[Lease.BusyListenerError]].
  *
  * Spark-native engines rarely need this — one streaming query per sink is
  * the idiomatic single-writer guarantee — but multi-driver deployments
  * (e.g. two schedulers racing to own a pipeline) still want an explicit
  * lease. State lives in a file next to the checkpoint dir (swap the
  * file ops for a Delta/JDBC row on a cluster; the protocol is identical).
  * Writes are atomic-rename so a crashed writer never leaves a torn row.
  */
final class Lease(path: Path, owner: String, timeoutMs: Long,
                  clock: () => Long = () => System.currentTimeMillis()) {

  /** Acquire or refresh. Steals only expired leases. */
  def keepAlive(): Unit = read() match {
    case Some((o, ts)) if o != owner && clock() - ts < timeoutMs =>
      throw Lease.BusyListenerError(o)
    case _ => write()
  }

  /** True while this worker holds an unexpired lease. */
  def holds: Boolean = read() match {
    case Some((o, ts)) => o == owner && clock() - ts < timeoutMs
    case None => false
  }

  /** Release so another worker can take over immediately. */
  def release(): Unit = read() match {
    case Some((o, _)) if o == owner => Files.deleteIfExists(path)
    case _ => ()
  }

  private def read(): Option[(String, Long)] =
    if (!Files.exists(path)) None
    else new String(Files.readAllBytes(path), StandardCharsets.UTF_8).split('\n') match {
      case Array(o, ts) => ts.toLongOption.map(t => (o, t))
      case _ => None
    }

  private def write(): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, s"$owner\n${clock()}".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object Lease {
  final case class BusyListenerError(heldBy: String)
      extends RuntimeException(s"lease held by '$heldBy'")
}
