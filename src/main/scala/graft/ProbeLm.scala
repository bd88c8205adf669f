package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch scale probe for the tokenizer/LM family: replicate the sf0.1
  * corpus 1x/10x on disk and time the corpus-scale vs vocab-scale split
  * the designs claim (BPE rounds should be ~flat — the word table is the
  * same vocabulary with scaled counts; KN marginals should stay
  * vocab-bounded). Throwaway evidence-gathering main, not part of the
  * driver contract. */
object ProbeLm {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val dir10 = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_probe10")).toString
    // 10x replication with distinct ids (same vocabulary, 10x counts)
    spark.range(10).crossJoin(docs)
      .withColumn("doc_id", col("doc_id") + col("id") * 10000000L)
      .drop("id")
      .repartition(32).write.mode("overwrite").parquet(dir10)
    val docs10 = spark.read.parquet(dir10)

    def runAll(tag: String, d: DataFrame): Unit = {
      time(s"bpe_learn_$tag") { graft.text.Bpe.learn(d, "text", 8) }
      time(s"kn_bigram_$tag") {
        graft.text.LmCounts.knBigrams(d, "text", 100).count()
      }
      time(s"kn_score_$tag") {
        graft.text.LmCounts.knScore(d, "text", "doc_id").count()
      }
      time(s"count_of_counts_$tag") {
        graft.text.LmCounts.countOfCounts(d, "text").count()
      }
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      System.gc()
    }
    runAll("warm", docs) // JIT warm-up, discard
    runAll("1x", docs)
    runAll("10x", docs10)
    spark.stop()
  }
}
