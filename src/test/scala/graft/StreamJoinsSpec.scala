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
}
