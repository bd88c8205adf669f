package graft

import graft.ops.IntervalJoin
import graft.streaming.StreamJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: equivalence with the batch bucketized
  * interval join on the same inputs. */
class StreamJoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val B = 86400000000L // epoch-0 rows sit on the initial watermark

  private def tmpDir(): String = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory("graft_ssj")).toString

  test("stream-stream join equals the batch interval join") {
    val signups = Seq((1L, 100L, 10L), (2L, 100L, 95L), (3L, 200L, 10L))
      .toDF("sid", "uid", "mins")
      .select(col("sid"), col("uid"), (col("mins") * 60000000L + B).as("sts"))
    val errors = Seq(
      (100L, 12L, "a"), (100L, 20L, "b"), (100L, 95L, "d"),
      (100L, 104L, "e"), (200L, 15L, "g"), (999L, 11L, "h"))
      .toDF("uid", "mins", "tag")
      .select(col("uid"), (col("mins") * 60000000L + B).as("ets"), col("tag"))

    val batch = IntervalJoin.intervalJoin(signups, errors, Seq("uid"),
        "sts", "ets", 0L, 10L * 60000000L)
      .select("sid", "tag").as[(Long, String)].collect().toSet
    val streamed = StreamJoins.intervalJoinDrained(signups, errors, "uid",
        "sts", "ets", window = "10 MINUTES", watermarkDelay = "1 minute",
        tmpDir(), tmpDir())
      .select("sid", "tag").as[(Long, String)].collect().toSet

    assert(streamed == batch && batch.nonEmpty)
  }

  test("left-outer drain: matches, closed-window misses, open misses withheld") {
    // final watermark = min(max sts, max ets) − delay = min(95, 104) − 1
    //                 = minute 94 (B-based micros)
    val signups = Seq(
      (1L, 100L, 10L),  // matched (errors at 12, 20)
      (2L, 300L, 10L),  // miss, window [10, 20] closed before wm 94 → emits
      (3L, 300L, 90L),  // miss, window [90, 100] OPEN at wm 94 → withheld
      (4L, 100L, 95L))  // matched at 95 and 104 (window [95, 105])
      .toDF("sid", "uid", "mins")
      .select(col("sid"), col("uid"), (col("mins") * 60000000L + B).as("sts"))
    val errors = Seq(
      (100L, 12L, "a"), (100L, 20L, "b"), (100L, 95L, "d"), (100L, 104L, "e"))
      .toDF("uid", "mins", "tag")
      .select(col("uid"), (col("mins") * 60000000L + B).as("ets"), col("tag"))

    val out = StreamJoins.intervalJoinLeftOuterDrained(signups, errors, "uid",
        "sts", "ets", window = "10 MINUTES", watermarkDelay = "1 minute",
        tmpDir(), tmpDir())
      .select(col("sid"), col("tag")).as[(Long, Option[String])].collect()
    val bySid = out.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    assert(bySid(1L) == Set("a", "b"))
    assert(bySid(4L) == Set("d", "e"))
    assert(bySid.get(2L).contains(Set.empty[String]),
      "a closed-window miss must emit its null row")
    assert(!bySid.contains(3L),
      "an open-window miss must stay buffered (resume semantics)")
  }
}
