package graft.core

/** Shared crash-injection seam for the log-structured index family
  * ([[graft.text.Retrieval]] BM25, [[graft.sim.Ivf]], [[graft.sim.Pq]];
  * [[graft.dedup.LshIndex]] carries its own earlier hook). Each index
  * applies a change batch as SEVERAL independent append jobs followed by
  * one [[GenPointer]] swap; the named points sit between those jobs so a
  * chaos spec can kill the apply at every seam and assert the crash
  * contract: pre-swap crashes leave the batch invisible, post-swap crashes
  * leave it fully visible, and redelivery at the same generation converges
  * to the fresh-rebuild probe results. Production cost: one no-op
  * invocation per append job. */
private[graft] object KillPoint {
  @volatile var hook: String => Unit = _ => ()
  @inline def apply(step: String): Unit = hook(step)
}
