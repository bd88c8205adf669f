package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for caches a library operator creates INTERNALLY (signature
  * indexes, banded-bucket frames) under a lazily-returned result.
  *
  * The operator cannot unpersist them itself — its caller has not run an
  * action yet — and leaving them silently cached accumulates block-manager
  * entries unbounded across calls in a long-lived session. Tracking them
  * here gives callers one explicit lifecycle point: run the action on the
  * returned frame, then `Caches.release()` (Verify and Bench do this after
  * every query; a long-lived service would do it per request).
  */
object Caches {
  private val live = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Cache `df` and register it for the next [[release]]. */
  def track(df: DataFrame): DataFrame = synchronized { live += df.cache(); df }

  /** Unpersist every tracked cache (idempotent). */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }
}
