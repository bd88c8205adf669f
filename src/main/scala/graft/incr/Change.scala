package graft.incr

/** A2 — the change-stream element: a payload-free upsert/delete notification
  * (reference tests/test_notifications.py:19-27; consumed at
  * processor.py:437-461). The engine re-fetches current source state by id,
  * so the feed is at-least-once and self-deduplicating on replay.
  *
  * `seq` is a monotonically increasing sequence number; when one id appears
  * several times in a batch the greatest `seq` wins (the reference applies
  * notifications in arrival order — batch semantics need the order explicit).
  */
final case class Change(seq: Long, change: String, resourceType: String, resourceId: String)

object Change {
  val Created = "created"
  val Updated = "updated"
  val Deleted = "deleted"
}
