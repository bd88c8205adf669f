package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of representative queries — the
  * scale-readiness audit: filters pushed to the parquet scan, pruned read
  * schemas, broadcast joins where one side is small, wide whole-stage
  * codegen spans, no stray shuffles. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "a6_reduce_sum", "a10_join_report", "b1_exact_ci", "b8_show",
      "dedup_minhash", "sim_topk_bruteforce", "sim_topk_ivf", "events_hourly",
      "events_asof", "events_interval_join", "b14_url_search", "search_bm25",
      "search_phrase", "text_tfidf_topk", "sim_topk_hamming", "sim_topk_mrl",
      "text_span_scrub", "text_cdc_dedup", "text_length_gate",
      "mm_phash_dedup", "mix_temperature", "sketch_kmv_merge",
      "sketch_distinct_hll", "sketch_freq_cms", "sketch_join_size",
      "text_dsir", "text_chunking", "search_hybrid_rrf",
      "events_asof_native", "split_leakage",
      "embed_pca", "text_kn_bigram", "text_kn_trigram", "text_bpe_encode",
      "dq_documents", "dq_referential", "text_kn_score", "embed_pca_incr")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n======== $n ========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
