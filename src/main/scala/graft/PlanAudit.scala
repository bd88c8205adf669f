package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness: `runMain graft.PlanAudit <sfDir> <query,query,…>`
  * prints each query's FORMATTED executed plan (post-AQE where the query
  * executes eagerly) — the artifact for "is this the plan you'd want at
  * 100×": pushed filters, partition pruning, broadcast vs sort-merge,
  * whole-stage codegen spans, exchange counts. */
object PlanAudit {
  /** Default audit set: a representative slice of each plan family
    * (agg, search, dedup/LSH, ANN, retrieval, tokenizer, graph, store,
    * multimodal, packing, mixing) — every name is a real
    * [[SparkEntry.queries]] key. */
  val DefaultQueries: Seq[String] = Seq(
    "a6_reduce_sum", "a10_join_report", "b3_range", "b9_sort_limit",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "decon_overlap",
    "sim_topk_bruteforce", "sim_topk_ivf", "sim_topk_ivfpq",
    "search_bm25", "search_hybrid_rrf", "text_bpe_encode",
    "text_langid", "text_quality", "text_tfidf_topk", "pack_sequences",
    "mix_temperature", "graph_pagerank", "graph_triangles",
    "events_asof_native", "events_hourly", "incr_bucketed",
    "mm_decode_jpeg", "mm_decode_png", "embed_neardup_cell",
    "cluster_kmeanspar", "sketch_distinct_hll", "layout_partition_prune")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"\n===== PLAN $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // drive AQE so the final plan is the adapted one
        println(df.queryExecution.executedPlan.toString.take(8000))
      } catch {
        case e: Throwable => println(s"AUDIT ERROR: ${e.getMessage}")
      }
      graft.ops.Caches.release()
      spark.catalog.clearCache()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      spark.streams.resetTerminated()
    }
    spark.stop()
  }
}
