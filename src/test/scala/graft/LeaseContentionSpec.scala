package graft

import graft.incr.BucketedStateStore
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A19 driven as the reference drives it (tests/test_listeners.py:133-259):
  * TWO REAL WORKER PROCESSES contending for the same store's lease —
  * separate JVMs, so nothing is shared but the lease file and the store
  * directory. Worker A holds and heartbeats; worker B must print the busy
  * error and exit 1 (fast — the lease check now runs BEFORE Spark
  * startup); after A is killed forcibly (a crash: no release) the lease
  * expires and worker C steals it, drains, and exits 0 with correct
  * state. */
class LeaseContentionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def forkWorker(base: String, tag: String, ini: String,
                         extra: Seq[String]): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.Worker", "graft.WorkerTestPipeline", "-c", ini) ++ extra
    new ProcessBuilder(cmd: _*)
      .directory(new java.io.File(base))
      .redirectOutput(new java.io.File(base, s"$tag.out"))
      .redirectError(new java.io.File(base, s"$tag.err"))
      .start()
  }

  private def eventually(what: String, timeoutMs: Long = 120000L)
                        (probe: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!probe) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting: $what")
      Thread.sleep(250)
    }
  }

  test("two worker JVMs: holder wins, contender exits 1, crash-expiry is stolen") {
    val base = Files.createTempDirectory("graft_lease2").toString
    val srcDir = s"$base/src.parquet"
    val changesDir = s"$base/changes"
    val storeRoot = s"$base/store"
    Files.createDirectories(Paths.get(changesDir))
    Seq(("a", "k1", 1.0), ("b", "k2", 2.0)).toDF("id", "k", "v")
      .write.parquet(srcDir)
    val ini = s"$base/worker.ini"
    Files.writeString(Paths.get(ini),
      s"""[spark]
         |master = local[2]
         |shuffle_partitions = 4
         |[store]
         |root = $storeRoot
         |buckets = 8
         |[sources]
         |src = $srcDir
         |[changes]
         |dir = $changesDir
         |[qvarnmr]
         |instance = contender
         |keep_alive_timeout = 3
         |keep_alive_update_interval = 1
         |""".stripMargin)
    val leasePath = Paths.get(storeRoot, "_lease")

    // worker A: forever mode — acquires the lease pre-Spark and heartbeats
    val a = forkWorker(base, "a", ini, Seq("-f"))
    try {
      eventually("worker A acquires the lease")(Files.exists(leasePath))

      // worker B: real contending JVM — busy error, exit 1, and FAST (the
      // pre-Spark check: no session is ever built in the loser)
      val b = forkWorker(base, "b", ini, Seq.empty)
      assert(b.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        "contender must exit promptly")
      assert(b.exitValue() == 1, "contender must exit 1 while the lease is live")
      val bErr = Files.readString(Paths.get(base, "b.err"))
      assert(bErr.contains("lease held by 'contender@" + a.pid()),
        s"busy error must name the holder pid, got:\n$bErr")

      // A crashes (forcibly — a real crash, so NO release happens) →
      // heartbeats stop → after keep_alive_timeout the lease is stealable
      a.destroyForcibly()
      a.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    } finally if (a.isAlive) { a.destroyForcibly(); a.waitFor() }
    Thread.sleep(3500) // past keep_alive_timeout since the last heartbeat

    // worker C: steals the expired lease, drains, exits 0 — and the state
    // it owns is correct
    val c = forkWorker(base, "c", ini, Seq.empty)
    assert(c.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "stealer must terminate")
    assert(c.exitValue() == 0, "stealer must exit 0; stderr:\n" +
      Files.readString(Paths.get(base, "c.err")).takeRight(2000))
    val reduced = new BucketedStateStore(storeRoot, 8).table(spark, "r")
      .select(col(graft.core.MrSchema.Key), col(graft.core.MrSchema.Value))
      .as[(String, Double)].collect().toMap
    assert(reduced == Map("k1" -> 1.0, "k2" -> 2.0))
    assert(!Files.exists(leasePath), "the clean exit releases the lease")
  }
}
