package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the two-tower retrieval queries
  * (search_hybrid_rrf / mine_hard_negatives / mine_paraphrase_pairs):
  * prices the full-postings df scan, the probe-term selection pass and
  * the end-to-end query so the towerLists restructure is measured, not
  * assumed. */
object ProbeTower {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (0 until 3).foreach { round =>
      println(s"--- round $round")
      // the same memoized index the three queries share (first build priced)
      val idxDir = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_bm25probe")).toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val index = t("buildIndex") {
        graft.text.Retrieval.buildIndex(docs, "text", "doc_id", idxDir,
          numBuckets = 64)
      }
      val probes = docs.filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"), col("text"))

      // piece 1: the full-postings df scan towerLists runs today
      t("dfTab full-postings scan+agg") {
        spark.read.parquet(index.postingsDir)
          .groupBy(col("term")).agg(count(lit(1)).as("__df")).count()
      }
      // piece 2: probe term collect (the control-sized driver set)
      val terms = t("probe-term distinct collect") {
        probes.select(explode(array_distinct(
            graft.text.TextFunctions.tokens(col("text")))).as("term"))
          .distinct().collect().map(_.getString(0)).toSeq
      }
      println(s"[probe] probe vocabulary = ${terms.size} terms")
      // piece 3: pruned df scan (what the restructure would run)
      t("dfTab pruned scan+agg") {
        spark.read.parquet(index.postingsDir)
          .filter(col("term").isin(terms: _*))
          .groupBy(col("term")).agg(count(lit(1)).as("__df")).count()
      }
      // piece 4: dense tower alone
      t("dense bruteForceTopK") {
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val qvecs = e.join(broadcast(probes.select(col("doc_id").as("__pid"))),
          col("vec_id") === col("__pid")).select(col("vec_id"), col("embedding"))
        graft.sim.Similarity.bruteForceTopK(e, qvecs, "vec_id", "embedding", 20)
          .count()
      }
      // piece 5: the three queries end to end — calls Retrieval directly
      // (not SparkEntry) to bypass SparkEntry's per-dir index memoization,
      // so each probe run prices a cold index build + query
      t("hybridRrf end-to-end") {
        graft.text.Retrieval.hybridRrf(spark, index, probes, "doc_id", "text",
          spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id",
          "embedding", kEach = 20, kOut = 10).count()
      }
      t("hardNegatives end-to-end") {
        graft.text.Retrieval.hardNegatives(spark, index, probes, "doc_id",
          "text", spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id",
          "embedding", kEach = 20).count()
      }
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
