package graft

import graft.streaming.StatefulSessions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionization: parity with the built-in
  * session_window aggregation, cross-batch state carry, punctuated flush,
  * and watermark-bounded streaming dedup. */
class StatefulSessionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in us
  private val GAP = 10L * M

  private def tmpDir(): String = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory("graft_sess")).toString

  // base offset: an event at exactly epoch 0 sits on Spark's INITIAL
  // watermark and is dropped as late — real feeds never start at epoch 0
  private val B = 86400000000L

  /** (user, minute-offset, value) triples → (user_id, us, value) frame. */
  private def ev(rows: (Long, Long, Double)*): DataFrame =
    rows.toSeq.toDF("user_id", "mins", "value")
      .select(col("user_id"), (col("mins") * M + B).as("us"), col("value"))

  private def resultSet(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("user_id")),
      r.getLong(r.fieldIndex("session_start_us")),
      r.getLong(r.fieldIndex("n_events")),
      math.round(r.getDouble(r.fieldIndex("sum_value")) * 100) / 100.0)).toSet

  private val sample = ev(
    (1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 10L, 4.0),  // one session (gaps <= 10m)
    (1L, 21L, 8.0),                                  // 11m silence → new session
    (2L, 0L, 1.0), (2L, 10L, 1.0), (2L, 20L, 1.0),  // exactly-gap chain: one session
    (3L, 50L, 9.0))                                  // singleton

  test("sessionize matches inclusive-gap sessions and flushes via punctuation") {
    val got = resultSet(StatefulSessions.sessionizeDrained(
      sample, GAP, watermarkDelay = "1 minute", tmpDir()))
    val want = Set(
      (1L, B, 3L, 7.0), (1L, B + 21L * M, 1L, 8.0),
      (2L, B, 3L, 3.0), (3L, B + 50L * M, 1L, 9.0))
    assert(got == want)
  }

  test("sessionize equals the built-in session_window aggregation") {
    val viaBuiltin = graft.streaming.EventWindows
      .sessionAgg(sample.withColumn("ts", col("us") * 1000), "ts", "user_id",
        gap = "10 minutes")
      .select(col("user_id"), col("session_start_us"), col("n_events"), col("sum_value"))
    val got = resultSet(StatefulSessions.sessionizeDrained(
      sample, GAP, "1 minute", tmpDir()))
    assert(got == resultSet(viaBuiltin))
  }

  test("sessions spanning micro-batches merge through carried state") {
    // part 1 ends mid-session for user 1; part 2 continues it within gap
    val p1 = ev((1L, 0L, 1.0), (1L, 8L, 1.0), (2L, 0L, 5.0))
    val p2 = ev((1L, 16L, 1.0), (1L, 40L, 2.0), (2L, 30L, 5.0))
    val got = resultSet(StatefulSessions.sessionizeParts(
      spark, Seq(p1, p2), GAP, "1 minute", tmpDir()))
    val want = Set(
      (1L, B, 3L, 3.0),        // 0,8,16 chain across the batch boundary
      (1L, B + 40L * M, 1L, 2.0),
      (2L, B, 1L, 5.0), (2L, B + 30L * M, 1L, 5.0))
    assert(got == want)
  }

  test("custom session state survives a query restart via the checkpoint") {
    import graft.streaming.SessionEvent
    val dir = java.nio.file.Paths.get(tmpDir())
    val ckpt = tmpDir()
    val outDir = tmpDir()

    def runDrain(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, us LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(dir.toString)
        .select(col("user_id"), expr("timestamp_micros(us)").as("et"), col("value"))
        .withWatermark("et", "1 minute")
        .as[SessionEvent]
      val q = StatefulSessions.sessionize(stream, GAP).toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase 1: user 1's session is OPEN (events at 0 and 8 min) when the
    // drain finishes and the query is torn down
    val p1 = ev((1L, 0L, 1.0), (1L, 8L, 1.0))
    StatefulSessions.stageOrderedFiles(spark, dir, p1, Seq.empty)
    runDrain()

    // phase 2: a NEW query on the same checkpoint continues the session
    // (16 min is within gap of 8), then punctuation flushes everything
    val p2 = ev((1L, 16L, 1.0), (1L, 40L, 2.0))
    val punct = Seq(2L * 86400000000L, 4L * 86400000000L)
      .map(d => spark.range(1).select(lit(-1L).as("user_id"),
        lit(B + 50L * M + d).as("us"), lit(0.0).as("value")))
    StatefulSessions.stageOrderedFiles(spark, dir, p2, punct, startIdx = 1)
    runDrain()

    val got = resultSet(spark.read.parquet(outDir))
    assert(got == Set((1L, B, 3L, 3.0), (1L, B + 40L * M, 1L, 2.0)),
      "the pre-restart open session must merge with post-restart events")
  }

  test("dedup stream drops redelivered events, keeps distinct ones") {
    val events = Seq(
      (1L, 1L * M, "click", 1.0), (2L, 2L * M, "view", 2.0),
      (3L, 3L * M, "click", 4.0))
      .toDF("event_id", "us", "event_type", "value")
    val got = StatefulSessions.dedupDrained(events, "1 hour", tmpDir())
    assert(got.count() == 3) // second delivery of all 3 dropped
    assert(got.select("event_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
