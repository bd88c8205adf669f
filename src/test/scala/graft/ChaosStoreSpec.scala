package graft

import java.nio.file.{Files, Paths}

import graft.incr.BucketedStateStore
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Chaos property test for the bucketed store's crash contract: a kill at
  * ANY point of the batch lifecycle — after staging, with the snapshot tmp
  * written, with the snapshot published but the pointer not yet swapped,
  * with the pointer tmp written, or after the swap (mid-retention) — must
  * reopen to the LAST COMMITTED batch: exact table bytes, exact ledger
  * payload, fsck-clean, no stranded `_swap.tmp*` files, no snapshot
  * manifest ahead of the pointer. Kills are injected through the store's
  * `onCommitStep` seam (a throwing hook at the exact durability step);
  * 120 generated scenarios × 2 batches each, every batch drawing random
  * upserts/deletes and a random kill point. */
class ChaosStoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private final case class BatchPlan(upserts: Map[Long, Long], deletes: Set[Long],
                                     killIdx: Int)

  // killIdx: 0 none, 1 staged-only (crash before commit), then a commit
  // killed at: 2 snapshot tmp written, 3 snapshot published, 4 pointer tmp
  // written, 5 pointer swapped (crash during retention cleanup)
  private val genBatch: Gen[BatchPlan] = for {
    nUp <- Gen.chooseNum(1, 6)
    ups <- Gen.listOfN(nUp, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(-99L, 99L)))
    nDel <- Gen.chooseNum(0, 3)
    dels <- Gen.listOfN(nDel, Gen.chooseNum(0L, 9L))
    kill <- Gen.chooseNum(0, 5)
  } yield BatchPlan(ups.toMap, dels.toSet -- ups.map(_._1), kill)

  private val genScenario: Gen[List[BatchPlan]] = Gen.listOfN(2, genBatch)

  private def killStep(idx: Int, batchId: Long): Option[String] = idx match {
    case 2 => Some(s"tmp-written:_manifest.b$batchId")
    case 3 => Some("snapshot-written")
    case 4 => Some("tmp-written:_manifest")
    case 5 => Some("pointer-swapped")
    case _ => None
  }

  private final class Kill extends RuntimeException("injected crash")

  private def assertConsistent(root: String, store: BucketedStateStore,
                               model: Map[Long, Long],
                               batch: Option[Long], ledger: Option[String]): Unit = {
    assert(store.committedBatch == batch)
    assert(store.committedLedger == ledger)
    if (batch.isEmpty) assert(store.isEmpty)
    else {
      val got = store.table(spark, "t").as[(Long, Long)].collect().toMap
      assert(got == model)
    }
    assert(store.fsck().isEmpty)
    val listing = Files.list(Paths.get(root))
    val names = try listing.iterator().asScala.map(_.getFileName.toString).toList
                finally listing.close()
    assert(!names.exists(_.startsWith("_swap.tmp")), s"stranded tmp in $names")
    batch.foreach(b => assert(store.snapshots.forall(_ <= b),
      s"snapshot ahead of pointer: ${store.snapshots} > $b"))
  }

  test("kill at every commit step: store reopens to the last committed batch (120 seeds)") {
    for (seed <- 0 until 120) {
      val plans = genScenario.apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"gen failure at seed $seed"))
      val root = graft.core.TempDirs.register(
        Files.createTempDirectory(s"graft_chaos$seed")).toString
      var store = new BucketedStateStore(root, numBuckets = 2, autoVacuumEvery = 0)
      var model = Map.empty[Long, Long]
      var committedBatch = Option.empty[Long]
      var committedLedger = Option.empty[String]

      def stageAll(content: Map[Long, Long], b: Long): Unit =
        store.stageBuckets("t", Set(0, 1),
          content.toSeq.toDF("id", "v"), b, keyCol = "id")

      for (plan <- plans) {
        val b = committedBatch.map(_ + 1).getOrElse(0L)
        val next = (model ++ plan.upserts) -- plan.deletes
        stageAll(next, b)
        val killed =
          if (plan.killIdx == 1) true // crash after staging, before commit
          else {
            killStep(plan.killIdx, b) match {
              case None =>
                store.commit(b, ledger = Some(s"L$b")); false
              case Some(step) =>
                store.onCommitStep = s => if (s == step) throw new Kill
                val died =
                  try { store.commit(b, ledger = Some(s"L$b")); false }
                  catch { case _: Kill => true }
                assert(died, s"kill step '$step' never fired (seed $seed)")
                true
            }
          }
        val pointerSwapped = !killed || plan.killIdx == 5
        if (pointerSwapped) {
          model = next
          committedBatch = Some(b)
          committedLedger = Some(s"L$b")
        }
        if (killed) {
          // crash: abandon the instance, reopen from disk
          store = new BucketedStateStore(root, numBuckets = 2, autoVacuumEvery = 0)
          assertConsistent(root, store, model, committedBatch, committedLedger)
          if (!pointerSwapped) {
            // redelivery: the engine re-stages and re-commits the batch
            stageAll(next, b)
            store.commit(b, ledger = Some(s"L$b"))
            model = next
            committedBatch = Some(b)
            committedLedger = Some(s"L$b")
          }
        }
        assertConsistent(root, store, model, committedBatch, committedLedger)
      }

      // GC after the dust settles: vacuum must not touch live state, and
      // time travel must still serve the newest retained snapshot exactly
      store.vacuum(0L)
      assertConsistent(root, store, model, committedBatch, committedLedger)
      committedBatch.foreach { b =>
        val asOf = store.tableAsOf(spark, "t", b).as[(Long, Long)].collect().toMap
        assert(asOf == model)
      }
      graft.core.TempDirs.deleteRecursively(Paths.get(root))
    }
  }
}
