package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-length token-sequence packing — the step that turns per-document
  * token-id arrays into the dense `seqLen`-token training rows a
  * pretraining loader consumes (each doc terminated by `eosId`, sequences
  * filled back-to-back across document boundaries).
  *
  * Scale design (100 TB): packing is sequential BY CONSTRUCTION — token t
  * must know how many tokens precede it — so the naive formulation is a
  * single global window (one partition owns the whole corpus: the
  * textbook scale killer). Real pipelines shard first and pack per
  * writer; this operator does exactly that: documents hash to `nShards`
  * by id, each shard's docs pack sequentially IN its partition (one
  * mapPartitions pass over (shard, doc_id)-sorted rows, O(seqLen) state),
  * and sequence ids are (shard, seq_idx) pairs. Shards scale horizontally
  * with writers; the only waste is ≤ one partial tail sequence per SHARD
  * (emitted, not dropped — pad-or-drop is a downstream policy, and
  * keeping it makes the operator lossless and exactly replayable).
  *
  * Determinism: shard = doc_id mod nShards (not a hash — an external
  * engine replays it with `%`), docs pack in doc_id order within their
  * shard, so every output sequence is an exact function of the input.
  *
  * Reference scope: qvarn-mr has no tokenizer surface; training-data
  * extension next to [[Unigram.greedyIds]] (whose output this packs). */
object Pack {

  /** Pack `docIds` — (idCol: integral, idsCol: array<int>) — into
    * (shard, seq_idx, n_ids, ids) rows of at most `seqLen` tokens.
    * Every document contributes its ids followed by ONE `eosId`. */
  def packTokenIds(docIds: DataFrame, idCol: String, idsCol: String,
                   seqLen: Int, nShards: Int, eosId: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val spark = docIds.sparkSession
    import spark.implicits._
    val prepared = docIds
      .select(pmod(col(idCol).cast("long"), lit(nShards.toLong)).cast("int")
          .as("__shard"),
        col(idCol).cast("long").as("__did"),
        col(idsCol).cast("array<int>").as("__ids"))
      .repartition(nShards, col("__shard"))
      // two shards may hash into one partition: the packer detects shard
      // boundaries in the sorted stream and restarts its state
      .sortWithinPartitions(col("__shard"), col("__did"))
    prepared.as[(Int, Long, Array[Int])].mapPartitions { docs =>
      var cur = Int.MinValue
      var seqIdx = 0L
      val buf = new scala.collection.mutable.ArrayBuffer[Int](seqLen)
      def flushPartial(): Seq[(Int, Long, Int, Array[Int])] =
        if (cur != Int.MinValue && buf.nonEmpty) {
          val r = (cur, seqIdx, buf.length, buf.toArray)
          buf.clear(); seqIdx += 1
          Seq(r)
        } else Seq.empty
      val packed = docs.flatMap { case (shard, _, ids) =>
        val emitted = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Int, Array[Int])]
        if (shard != cur) { // shard boundary: tail sequence, fresh counters
          emitted ++= flushPartial()
          cur = shard; seqIdx = 0L
        }
        var i = 0
        val n = ids.length + 1 // + the document's EOS
        while (i < n) {
          buf += (if (i < ids.length) ids(i) else eosId)
          if (buf.length == seqLen) {
            emitted += ((cur, seqIdx, seqLen, buf.toArray))
            buf.clear(); seqIdx += 1
          }
          i += 1
        }
        emitted
      }
      // lazy trailing flush: the last shard's partial tail, emitted only
      // once the doc stream is exhausted
      packed ++ Iterator(()).flatMap(_ => flushPartial())
    }.toDF("shard", "seq_idx", "n_ids", "ids")
  }
}
