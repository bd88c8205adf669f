package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew realism probe for the AQE-reliant frequent-window joins
  * (`text_dup_spans` / `text_cdc_dedup` share the shape: corpus-scale
  * span table LEFT-joined to a data-dependent duplicated-hash table with
  * no broadcast hint). Two questions, answered with measurements:
  *
  *  1. does the hot-key regime actually arise — a boilerplate paragraph
  *     pasted into a third of the corpus concentrates its ~11 in-span
  *     window hashes onto single reducers once the right side outgrows
  *     the broadcast threshold and the join flips to SortMergeJoin;
  *  2. does AQE's skew split engage on that plan — at probe scale the
  *     skewed partitions sit far below the default 256 MB
  *     skewedPartitionThresholdInBytes, so the honest default answer is
  *     NO (and correctly so: the imbalance is megabytes); lowering the
  *     thresholds to probe-scale proves the plan SHAPE admits the split
  *     (AQEShuffleRead reports skewed partitions) with no plan surgery,
  *     which is the property that matters at 100 TB where the defaults
  *     do trigger.
  *
  * Run: `sbt "runMain graft.ProbeSkew [nDocs vocab]"`; results recorded
  * in PLANS.md (round 9). */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val vocab = if (args.length > 1) args(1).toInt else 120000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe-skew] $label%-52s $s%.2f s")
      (r, s)
    }

    // corpus, four families engineering two DIFFERENT skew regimes:
    //  - Zipf base + a 30-token boilerplate on every 3rd doc + a 10%
    //    duplicated tail (the tail forces the duplicated-hash table past
    //    any broadcast size, locking the SMJ regime);
    //  - a 2% SPAM family (1000 identical tokens per doc): every window
    //    of a spam doc collapses to ONE hash — 2M rows on one key, but
    //    the rows are runs of identical (doc_id, hash) pairs that lz4
    //    collapses BELOW the median partition, so byte-based skew
    //    detection cannot see this one (row skew without byte skew —
    //    the recorded caveat);
    //  - a HOT family of 5×nDocs tiny docs, each a shared 20-token
    //    boilerplate + 5 id-specific words: ONE window hash carried by
    //    500k DISTINCT doc_ids ≈ tens of incompressible MB on a single
    //    reducer — the byte-visible hot key AQE's split must handle.
    val boiler = (0 until 30).map(i => ZipfCorpus.wordFor(7 + 13L * i)).mkString(" ")
    val spamText = Array.fill(1000)(ZipfCorpus.wordFor(2)).mkString(" ")
    val hotBoiler = (0 until 20).map(i => ZipfCorpus.wordFor(11 + 29L * i)).mkString(" ")
    val dir = graft.core.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft_skew")).toString
    t("generate + write corpus") {
      import spark.implicits._
      val base = ZipfCorpus.corpus(spark, nDocs, vocab)
        .withColumn("text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + boiler)))
            .otherwise(col("text")))
      val dupTail = base.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(nDocs))
      val spam = spark.range(nDocs / 50).select(
        (col("id") + lit(2 * nDocs)).as("doc_id"),
        lit(spamText).as("text"), lit("en").as("lang"),
        lit("spam").as("source"), lit(spamText.length.toLong).as("n_chars"))
      val hot = spark.range(5 * nDocs).as[Long].mapPartitions(_.map { i =>
        val tail = (0 until 5)
          .map(j => ZipfCorpus.wordFor(
            ZipfCorpus.zipfRank(ZipfCorpus.mix(i * 31 + j), 120000)))
          .mkString(" ")
        val text = hotBoiler + " " + tail
        (3 * nDocs + i, text, "en", "hot", text.length.toLong)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
      base.unionByName(dupTail).unionByName(spam).unionByName(hot)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the skew facts: top window-hash multiplicity + duplicated-hash count
    val spans = docs
      .select(col("doc_id"),
        posexplode(graft.text.TextFunctions.tokens(col("text")))
          .as(Seq("__p", "__w")))
      .withColumn("__s", collect_list(col("__w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("__p")).rowsBetween(0, 19)))
      .filter(size(col("__s")) === 20)
      .select(md5(concat_ws(" ", col("__s")).cast("binary")).as("__h"))
    val (facts, _) = t("window-hash distribution facts") {
      val byH = spans.groupBy(col("__h")).agg(count(lit(1)).as("c")).cache()
      val top = byH.orderBy(col("c").desc).limit(3).collect()
        .map(r => r.getLong(1)).toSeq
      val nDup = byH.filter(col("c") > 1).count()
      val total = spans.count()
      byH.unpersist()
      (top, nDup, total)
    }
    println(s"[probe-skew]   top-3 hash multiplicities: ${facts._1.mkString(", ")}; " +
      s"duplicated hashes: ${facts._2}; total spans: ${facts._3}")

    def runDupSpans(label: String): String = {
      // inspect the EXECUTED aggregate's plan via collect(): AQE only
      // adapts the plan that actually ran, and head() would build a
      // SEPARATE limit(1) query execution, leaving this one un-adapted
      // (isFinalPlan=false, plain Exchanges — burned an hour on that)
      val agg = graft.text.Curation.dupSpans(docs, "text", "doc_id")
        .agg(sum(col("n_dup")))
      val (_, _) = t(label)(agg.collect()(0).getLong(0))
      graft.ops.Caches.release()
      agg.queryExecution.executedPlan.toString
    }

    val planDefault = runDupSpans("dupSpans (AQE defaults)")
    // AdaptiveSparkPlanExec prints "== Final Plan ==" then "== Initial
    // Plan ==": only the final section reflects what actually ran
    def finalPlan(p: String): String = p.split("== Initial Plan ==")(0)
    def joinFacts(p0: String): String = {
      val p = finalPlan(p0)
      val kinds = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .filter(p.contains)
      val skewed = p.contains("skew=true")
      s"joins=${kinds.mkString("+")} skewSplit=$skewed"
    }
    println(s"[probe-skew]   default: ${joinFacts(planDefault)}")

    // probe-scale thresholds: prove the plan admits AQE's skew split.
    // Both knobs must scale down — the byte threshold (default 256 MB)
    // AND the factor (default 5x median: the engineered hot partition is
    // ~1.5x median here; a 100 TB boilerplate key is GBs and clears 5x)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      (1L << 20).toString)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (4L << 20).toString)
    val planSkew = runDupSpans("dupSpans (skew thresholds at probe scale)")
    println(s"[probe-skew]   lowered: ${joinFacts(planSkew)}")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val planForced = runDupSpans("dupSpans (forceOptimizeSkewedJoin)")
    println(s"[probe-skew]   forced: ${joinFacts(planForced)}")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    if (!finalPlan(planSkew).contains("skew=true") &&
        !finalPlan(planForced).contains("skew=true")) {
      val dump = java.nio.file.Paths.get("/tmp/probe_skew_plan.txt")
      java.nio.file.Files.writeString(dump, planForced)
      println(s"[probe-skew] full forced plan dumped to $dump")
    }
    require(!finalPlan(planForced).contains("SortMergeJoin") ||
        finalPlan(planForced).contains("skew=true"),
      "the SMJ regime must admit AQE's skew split once thresholds match " +
        "the data scale — a custom partitioner or hint blocking it is a bug")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.stop()
  }
}
