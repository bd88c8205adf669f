package graft

import graft.core._
import graft.dedup.{Components, DocDedup, LshIndex}
import graft.incr._
import graft.multimodal.Multimodal
import graft.ops._
import graft.sim.{Ivf, Similarity}
import graft.text.{Bpe, Curation, LmCounts, Repetition, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Example user-defined reduce fold: value range (max - min) as a typed
  * Aggregator (the reference accepts any callable as a reduce handler,
  * func.py:34-43). Order-independent in FP, so the result is bit-stable
  * across partitionings — a mean here would drift in the last ulp with the
  * merge order and fail exact-compare gates. */
object RangeAgg extends org.apache.spark.sql.expressions.Aggregator[Double, (Double, Double), Double] {
  def zero: (Double, Double) = (Double.MaxValue, Double.MinValue)
  def reduce(b: (Double, Double), a: Double): (Double, Double) =
    (math.min(b._1, a), math.max(b._2, a))
  def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (math.min(x._1, y._1), math.max(x._2, y._2))
  def finish(b: (Double, Double)): Double = if (b._2 < b._1) 0.0 else b._2 - b._1
  def bufferEncoder = org.apache.spark.sql.Encoders.product[(Double, Double)]
  def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}

/** Example whole-row reduce fold: struct-valued stats over each key's live
  * map rows (sum, count, lexicographic max of provenance id). The reference
  * hands reduce callables the unrestricted value list (func.py:34-43) —
  * this is that surface without [[TypedReduce]]'s scalar narrowing. */
object RowStatsAgg extends org.apache.spark.sql.expressions.Aggregator[
    org.apache.spark.sql.Row, (Double, Long, String), (Double, Long, String)] {
  def zero: (Double, Long, String) = (0.0, 0L, "")
  def reduce(b: (Double, Long, String), r: org.apache.spark.sql.Row): (Double, Long, String) =
    (b._1 + r.getAs[Double](MrSchema.Value), b._2 + 1L,
      Seq(b._3, r.getAs[String](MrSchema.SourceId)).max)
  def merge(x: (Double, Long, String), y: (Double, Long, String)): (Double, Long, String) =
    (x._1 + y._1, x._2 + y._2, Seq(x._3, y._3).max)
  def finish(b: (Double, Long, String)): (Double, Long, String) = b
  def bufferEncoder = org.apache.spark.sql.Encoders.product[(Double, Long, String)]
  def outputEncoder = org.apache.spark.sql.Encoders.product[(Double, Long, String)]
}

/** Driver contract: one `queries` entry (+ DuckDB `oracleSql` where the
  * semantics are ANSI-SQL-expressible) per operator of SURVEY.md §2, plus
  * the training-data-pipeline extensions (dedup / similarity / text /
  * multimodal). Names in comments refer to the §2 inventory (A5, B1, …).
  */
object SparkEntry {
  import MrSchema.{Key, Value, SourceId}

  private val streamSinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  /** One bucketed state store per (scale dir, query variant) — init writes
    * the recomputed state hash-bucketed once per process, exactly like a
    * production pipeline's cold start; every query invocation afterwards is
    * a live bucket-scoped batch (fresh batch ids, never the replay no-op). */
  private val bucketedStores =
    scala.collection.concurrent.TrieMap.empty[String, BucketedStateStore]

  private def bucketedStore(dir: String, variant: String, pipeline: Pipeline,
                            keepSnapshots: Int = 8)
                           (init: => IncrementalRun.Sources): BucketedStateStore =
    bucketedStores.getOrElseUpdate(s"$dir#$variant", {
      // 64 buckets: notification-sized batches (tens of keys) then touch a
      // strict subset of buckets, so the per-batch IO demonstrably scales
      // with the batch, not the state. At real scale size buckets to
      // ≥128 MB instead.
      val st = new BucketedStateStore(
        graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory(s"graft_incr_$variant")).toString,
        numBuckets = 64, keepSnapshots = keepSnapshots)
      BucketedRun.initialize(pipeline, init, st)
      st
    })

  private val tableCount = scala.collection.concurrent.TrieMap.empty[String, Long]
  /** One persisted IVF index per scale dir (built on first probe). */
  private val ivfIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Ivf.Index]
  private val bm25Indexes =
    scala.collection.concurrent.TrieMap.empty[String, graft.text.Retrieval.InvertedIndex]
  private val hllStores = scala.collection.concurrent.TrieMap.empty[String, String]
  private val cmsStreamStores = scala.collection.concurrent.TrieMap.empty[String, String]
  private val hllStreamStores = scala.collection.concurrent.TrieMap.empty[String, String]
  private val lshIndexes = scala.collection.concurrent.TrieMap
    .empty[String, (graft.dedup.LshIndex.Index, String, java.util.concurrent.atomic.AtomicLong)]
  /** (index, initPairsPath, livePairsPath, streamInDir, checkpointDir) per
    * scale dir — the streaming-ingest dedup fixture. */
  private val lshStreamIndexes = scala.collection.concurrent.TrieMap
    .empty[String, (graft.dedup.LshIndex.Index, String, String, String, String)]

  /** One batch of same-typed changes over `table` ids `≡ residue (mod mod)`
    * — a notification-queue-sized batch (tens of ids at sf0.1) built in
    * driver memory, the shape a notification poll hands the engine (the ids
    * arrive as messages; deriving them costs no table scan). Ids in the
    * driver-generated testdata are dense 0..N-1 (TESTDATA.md), so the id
    * set is arithmetic; N comes from one memoized metadata-only count. */
  private def idBatch(s: SparkSession, dir: String, table: String, mod: Int,
                      change: String, seqOffset: Long = 0L,
                      residue: Long = 0L): Seq[Change] = {
    val n = tableCount.getOrElseUpdate(s"$dir/$table", t(s, dir, table).count())
    (residue to (n - 1) by mod.toLong)
      .map(k => Change(k + seqOffset, change, table, k.toString))
  }
  private def ordersBatch(s: SparkSession, dir: String, mod: Int, change: String,
                          seqOffset: Long = 0L, residue: Long = 0L): Seq[Change] =
    idBatch(s, dir, "orders", mod, change, seqOffset, residue)

  /** The deterministic fixed-centroid cell assignment shared by
    * `sim_ivf_assign` and `sim_diverse_sample` (centroids = the 8 smallest
    * vec_ids' vectors; the tie rule is oracle-checked): THE single place
    * the centroid fixture is defined — its two oracles share one CTE too. */
  /** Fixed PQ codebooks for the oracle-checked queries: 8 subspaces × 16
    * codes seeded from the first 16 vectors (memoized per scale dir). */
  private val pqCodebookCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.sim.Pq.Codebooks]
  /** One persisted IVF-PQ code index per scale dir (built on first probe). */
  private val pqIndexPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Flat (un-celled) PQ code table per scale dir — encode once, probe
    * many (the 8-bytes-per-vector "index" of the brute-force ADC scan). */
  private val pqFlatCodePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Log-structured-maintained IVF-PQ index (perturbed build + converging
    * generation-stamped batches) per scale dir. */
  private val pqIncrIndexes = scala.collection.concurrent.TrieMap
    .empty[String, (String, java.util.concurrent.atomic.AtomicLong)]
  private def pqCodebooks(s: SparkSession, dir: String): graft.sim.Pq.Codebooks =
    pqCodebookCache.getOrElseUpdate(dir,
      graft.sim.Pq.fixedCodebooks(t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 8, k = 16))

  /** Brute-force top-5 cosine ground truth for the recall dashboards
    * (`sim_recall_eval`, `sim_recall_lsh`), built ONCE per scale dir and
    * persisted — the engine's own build-once/probe-many index discipline
    * applied to the truth side: the exact scan is the expensive part of
    * a recall evaluation and it is invariant across every (nProbe,
    * nTables, nBits) configuration, so each invocation now pays only the
    * probe cost. */
  private val recallTruthPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def recallTruth(s: SparkSession, dir: String): DataFrame = {
    val p = recallTruthPaths.getOrElseUpdate(dir, {
      val out = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_recall_truth")).toString
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(p)
  }

  /** Run independent Spark ACTIONS concurrently from a bounded driver
    * pool (guide §2.6: actions are only sequential because the driver
    * calls them sequentially — overlapping lets a later job's tasks
    * back-fill executors idled by the current job's straggler tail).
    * Results keep `items` order; any failure rethrows. Used by the
    * multi-lane dashboard queries whose lanes are independent counts. */
  private def inParallel[A, B](items: Seq[A], threads: Int)(f: A => B): Seq[B] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futs = items.map(a => scala.concurrent.Future(f(a)))
      futs.map(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }

  /** Fixed IVF centroids (first 8 vectors by id — the oracle substrate),
    * memoized per scale dir. */
  private val fixedCentroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]
  private def fixedCentroids(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    fixedCentroidCache.getOrElseUpdate(dir, {
      import s.implicits._
      t(s, dir, "embeddings").orderBy(col("vec_id")).limit(8)
        .select(transform(col("embedding"), _.cast("double")))
        .as[Seq[Double]].collect().toSeq
        .zipWithIndex.map { case (v, i) => i -> v }
    })

  private def fixedCellAssignment(s: SparkSession, dir: String): DataFrame =
    Ivf.assignCells(t(s, dir, "embeddings"), "vec_id", "embedding",
      fixedCentroids(s, dir))

  /** Input tables are immutable per scale dir, so the ANALYZED handle —
    * file listing + parquet footer schema inside its InMemoryFileIndex /
    * LogicalRelation — is shared per (session, dir, table) instead of
    * being re-listed and re-footer-read on every call (guide §6: file
    * listing / metadata is driver-side planning cost; at sf0.1 it is a
    * visible slice of the ~0.4 s per-query session floor, at 100 TB it
    * is the multi-second listing the filesourcePartitionFileCacheSize
    * knob exists for). No DATA is cached or persisted: every action
    * still scans the parquet; only the plan-time metadata is reused,
    * keyed by session so a fresh session re-lists from disk. */
  private val tableHandles = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    tableHandles.getOrElseUpdate((s, dir, name), {
      // on a miss, drop handles owned by stopped sessions so a long
      // multi-session run (the test suite) doesn't pin dead contexts
      tableHandles.keys.foreach { k =>
        if (k._1.sparkContext.isStopped) tableHandles.remove(k)
      }
      val df = s.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEventTs(df) else df
    })

  /** events.ts contract: long ns since epoch. Early testdata wrote parquet
    * TIMESTAMP(NANOS), surfaced as long via nanosAsLong; later driver
    * generations write TIMESTAMP(MICROS), which that flag ignores — it
    * arrives as TIMESTAMP_NTZ and every ns-arithmetic query breaks.
    * ONE shared normalization (session tz is pinned UTC, so the NTZ cast
    * is exact) — the batch and streaming reads of the table must never
    * desynchronize on this again. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema.fields.exists(f => f.name == "ts" &&
        f.dataType != org.apache.spark.sql.types.LongType))
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000)
    else df

  /** events as a file stream (one parquet file → one micro-batch), with the
    * same ts-normalization contract as [[t]] (long ns since epoch). */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet").schema
    // file-stream source takes a directory; select just the events table
    normalizeEventTs(s.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** lineitem has no single-column id; derive one for provenance. */
  private def sources(s: SparkSession, dir: String): IncrementalRun.Sources = {
    case "lineitem" => t(s, dir, "lineitem")
      .withColumn("li_id", concat_ws("-", col("l_orderkey"), col("l_linenumber")))
    case n => t(s, dir, n)
  }

  // ---- pipelines (the reference's flagship config shapes) -----------------

  /** Two-source join materialization — the reference's `company_reports`
    * shape (README.rst:74-106, tests/test_mapreduce.py:128-195). */
  private val joinPipeline = Pipeline(
    maps = Seq(
      MapSpec("customer", "co_map", 1, idCol = "c_custkey",
        fn = df => df.select(col("c_custkey").as(Key), col("c_name"),
          col("c_acctbal"), col("c_custkey"))),
      MapSpec("orders", "co_map", 1, idCol = "o_orderkey",
        fn = df => df.select(col("o_custkey").as(Key), col("o_totalprice"),
          col("o_orderkey")))),
    reduces = Seq(
      ReduceSpec("co_map", "customer_report", 1, JoinReduce(
        mapping = Map(
          "customer" -> Map("c_name" -> "customer_name", "c_acctbal" -> "acctbal"),
          "orders" -> Map("o_totalprice" -> "last_totalprice")),
        orderBy = SourceId))))

  /** Scalar-sum reduce over orders keyed by customer (A6/A8). */
  private val ordersSumPipeline = Pipeline(
    maps = Seq(MapSpec("orders", "orders_map", 1, idCol = "o_orderkey",
      fn = MapFns.item("o_custkey", Some("o_totalprice"), idCol = "o_orderkey"))),
    reduces = Seq(ReduceSpec("orders_map", "orders_sum", 1, ExprReduce(sum))))

  private val ordersCountPipeline = Pipeline(
    maps = Seq(MapSpec("orders", "orders_map", 1, idCol = "o_orderkey",
      fn = MapFns.item("o_custkey", None, idCol = "o_orderkey"))),
    reduces = Seq(ReduceSpec("orders_map", "orders_cnt", 1, CountReduce)))

  private val lineitemMinPipeline = Pipeline(
    maps = Seq(MapSpec("lineitem", "li_map", 1, idCol = "li_id",
      fn = MapFns.item("l_partkey", Some("l_quantity"), idCol = "li_id"))),
    reduces = Seq(ReduceSpec("li_map", "li_min", 1, ExprReduce(min))))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a10_join_report")(spark, "/root/testdata/sf0.001")

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A5+A8: map with item() helper — provenance-tagged (key, value) rows
    "a5_map_item" -> ((s, dir) =>
      MapOp(ordersSumPipeline.maps.head, t(s, dir, "orders"))
        .select(col(Key), col(Value), col(SourceId), col(MrSchema.SourceType),
          col(MrSchema.Version), col(MrSchema.Deleted))),

    // A6: sum fold per key
    "a6_reduce_sum" -> ((s, dir) => {
      val st = IncrementalRun.recompute(ordersSumPipeline, sources(s, dir))
      st("orders_sum").select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // A6 typed fold: min (exact in FP — no rounding needed)
    "a6_reduce_min" -> ((s, dir) => {
      val st = IncrementalRun.recompute(lineitemMinPipeline, sources(s, dir))
      st("li_min").select(col(Key), col(Value).as("min_qty"))
    }),

    // A6 user-defined running fold: typed Aggregator (value range) — the
    // reference's arbitrary-callable reduce surface
    "a6_typed_range" -> ((s, dir) => {
      val p = Pipeline(
        maps = Seq(MapSpec("orders", "orders_map", 1, idCol = "o_orderkey",
          fn = MapFns.item("o_custkey", Some("o_totalprice"), idCol = "o_orderkey"))),
        reduces = Seq(ReduceSpec("orders_map", "orders_range", 1, TypedReduce(RangeAgg))))
      IncrementalRun.recompute(p, sources(s, dir))("orders_range")
        .select(col(Key), col(Value).as("range_value"))
    }),

    // A6 whole-row user fold: struct-valued stats per key (RowReduce) — the
    // reduce callable sees full rows, not a narrowed scalar
    "a6_row_reduce" -> ((s, dir) => {
      val p = Pipeline(
        maps = Seq(MapSpec("orders", "orders_map", 1, idCol = "o_orderkey",
          fn = MapFns.item("o_custkey", Some("o_totalprice"), idCol = "o_orderkey"))),
        reduces = Seq(ReduceSpec("orders_map", "orders_stats", 1, RowReduce(RowStatsAgg))))
      IncrementalRun.recompute(p, sources(s, dir))("orders_stats")
        .select(col(Key),
          round(col(Value)("_1"), 2).as("sum_value"),
          col(Value)("_2").as("cnt"),
          col(Value)("_3").as("max_source_id"))
    }),

    // Skew-resistant two-stage (salted) aggregation: 3-value hot key over
    // the full lineitem table
    "salted_skew_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Salted.sum(li, Seq("l_returnflag", "l_linestatus"), "l_quantity", out = "sum_qty")
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"))
    }),

    // A5 generator protocol: a map handler emitting 0..n rows per record
    // (filter = 0 emissions; explode = several) — reference func.py:34-43.
    // Both emitted rows share the record's provenance id, so an incremental
    // delete removes them together.
    "a5_map_flatmap" -> ((s, dir) => {
      val p = Pipeline(
        maps = Seq(MapSpec("orders", "omulti_map", 1, idCol = "o_orderkey",
          fn = df => df.filter(col("o_totalprice") > lit(1000.0))
            .select(explode(array(
              col("o_custkey").cast("string"),
              concat(lit("st:"), col("o_orderstatus")))).as(Key),
              col("o_totalprice"), col("o_orderkey"))
            .select(col(Key), col("o_totalprice").as(Value), col("o_orderkey")))),
        reduces = Seq(ReduceSpec("omulti_map", "omulti_sum", 1, ExprReduce(sum))))
      IncrementalRun.recompute(p, sources(s, dir))("omulti_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // A7: pre-map adapter before the fold (reference `'map': value()`)
    "a7_reduce_premap" -> ((s, dir) => {
      val p = Pipeline(
        maps = Seq(MapSpec("lineitem", "li_map", 1, idCol = "li_id",
          fn = MapFns.item("l_suppkey", Some("l_extendedprice"), idCol = "li_id"))),
        reduces = Seq(ReduceSpec("li_map", "li_disc", 1,
          ExprReduce(sum, premap = c => c * lit(0.9)))))
      IncrementalRun.recompute(p, sources(s, dir))("li_disc")
        .select(col(Key), round(col(Value), 2).as("sum_disc"))
    }),

    // A10: same-key multi-source join merge (+A9 value projection inside)
    "a10_join_report" -> ((s, dir) => {
      val st = IncrementalRun.recompute(joinPipeline, sources(s, dir))
      st("customer_report")
        .select(col(Key), col("customer_name"), col("acctbal"), col("last_totalprice"))
    }),

    // §3.3 read path closed end to end: a DERIVED reduce target served
    // through the Qvarn search URL surface — the reference's clients query
    // materialized views exactly this way (`GET /<type>/search/...`,
    // read_only.py:139-168). Sorted/paged/projected straight off the
    // materialization, predicates case-folded like any resource
    "b16_url_derived" -> ((s, dir) => {
      val st = IncrementalRun.recompute(joinPipeline, sources(s, dir))
      QvarnUrl.urlSearch(
        st("customer_report").select(col(Key), col("customer_name"),
          col("acctbal"), col("last_totalprice")),
        "/customer_report/search/gt/acctbal/1000/startswith/customer_name/customer" +
          "/sort/acctbal/sort/_mr_key/limit/50/show/customer_name/show/acctbal",
        idField = MrSchema.Key)
    }),

    // B17: subresource stitching on reads — the client's `get(...,
    // subresources=)` / `search_one(subresources=)` (clients/
    // qvarn.py:111-118, 294-311): a full-document URL search carries each
    // named subpath side-document as ONE struct column, null where the
    // parent has no side-doc. The side table here is a deterministic
    // 'contact_info' subpath for customers whose key is not divisible
    // by 3 (so both present and absent side-docs are exercised).
    "b17_subresource" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val side = cust.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("id"), col("c_nationkey").as("nation"),
          concat(lit("c"), col("c_custkey"), lit("@example.com")).as("email"))
      // the API serves a real struct column (QvarnUrlSpec pins that); the
      // published row encodes it as canonical JSON — the driver comparator
      // sorts/hashes cells, and dicts are unhashable in pandas
      QvarnUrl.parse(cust,
          "/customer/search/exact/c_mktsegment/BUILDING/gt/c_acctbal/9000/show_all",
          idField = "c_custkey")
        .withSubresource("contact_info", side, sideIdCol = "id")
        .result()
        .withColumn("contact_info", to_json(col("contact_info")))
    }),

    // B18: blob-file subresource GET — the client's raw-bytes read
    // `get_blob(type, id, subresource)` (clients/qvarn.py:120-122; the
    // vendored server's file subresources, realqvarn.py:41-45) through the
    // URL path surface `/<type>/<id>/<sub>`: five point-GETs of the
    // documents' payload blob, unioned (each row is one GET's bytes as hex)
    "b18_blob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
      Seq(0L, 50L, 100L, 150L, 200L)
        .map(id => QvarnUrl.getBlob(docs, s"/documents/$id/payload",
          idField = "doc_id"))
        .reduce(_ unionByName _)
    }),

    // B19: blob-file subresource PUT — the write twin of b18 (`update_file`,
    // clients/qvarn.py:193-200): three (type, id, subresource)-addressed
    // blob writes with the revision CAS check against a fresh revision-
    // tracked store, a deliberately STALE fourth write that must raise
    // WriteConflict (the 409), then the readback of the written bytes as
    // hex. The oracle re-derives the written payloads from the source text.
    "b19_blob_put" -> ((s, dir) => {
      import graft.incr.{BucketedRun, BucketedStateStore}
      val docs = t(s, dir, "documents")
      val src = docs.select(col("doc_id").cast("string").as("id"),
        encode(col("text"), "UTF-8").as("payload"))
      val emptySeq = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(graft.core.MrSchema.SourceType,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(graft.core.MrSchema.SourceId,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("seq",
            org.apache.spark.sql.types.LongType))))
      val store = new BucketedStateStore(graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_b19")).toString, 16)
      store.initialize(Map(
        "documents" -> (src, "id"),
        BucketedRun.SeqTable -> (emptySeq, graft.core.MrSchema.SourceId)))
      // the new payloads are a deterministic function of the source text
      val ids = Seq("0", "50", "100")
      val payloads = docs.filter(col("doc_id").isin(0L, 50L, 100L))
        .select(col("doc_id").cast("string"),
          concat(upper(col("text")), lit("!")))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      var batch = 1L
      for (id <- ids) {
        BucketedRun.putBlob(s, store, "documents", id, "payload",
          payloads(id).getBytes("UTF-8"),
          expectedSeq = 0L, newSeq = 1L, batchId = batch, idCol = "id")
        batch += 1
      }
      // the 409: a stale revision (0 after the write above) must conflict
      // and leave the store untouched
      val conflicted =
        try {
          BucketedRun.putBlob(s, store, "documents", "0", "payload",
            "stale".getBytes("UTF-8"),
            expectedSeq = 0L, newSeq = 2L, batchId = batch, idCol = "id")
          false
        } catch { case _: BucketedRun.WriteConflict => true }
      require(conflicted, "stale-revision putBlob must raise WriteConflict")
      store.table(s, "documents")
        .filter(col("id").isin(ids: _*))
        .select(col("id"), hex(col("payload")).as("blob_hex"))
    }),

    // B20: dict-subpath subresource PUT — the STRUCT twin of b19
    // (`update_subresource`, clients/qvarn.py:184-191): three (type, id,
    // subresource)-addressed side-document writes against a revision-
    // tracked store (CAS-before-mutation, payload + revision bump in ONE
    // manifest swap), a deliberately STALE fourth write that must raise
    // WriteConflict (the 409), a PUT to a missing id that must raise
    // NoSuchResource (the 404 — a subresource PUT never creates), then
    // the readback of the written side-documents THROUGH the URL search
    // surface. The oracle re-derives the payloads from the source rows.
    "b20_subresource_put" -> ((s, dir) => {
      import graft.incr.{BucketedRun, BucketedStateStore}
      val cust = t(s, dir, "customer")
      val src = cust.select(col("c_custkey").cast("string").as("id"),
        struct(col("c_nationkey").cast("long").as("nation"),
          concat(lit("c"), col("c_custkey"), lit("@example.com")).as("email"))
          .as("contact_info"))
      val emptySeq = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(graft.core.MrSchema.SourceType,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(graft.core.MrSchema.SourceId,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("seq",
            org.apache.spark.sql.types.LongType))))
      val store = new BucketedStateStore(graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_b20")).toString, 16)
      store.initialize(Map(
        "customer" -> (src, "id"),
        BucketedRun.SeqTable -> (emptySeq, graft.core.MrSchema.SourceId)))
      // the new side-documents are a deterministic function of the source
      val ids = Seq("1", "7", "20")
      val nations = cust.filter(col("c_custkey").isin(1L, 7L, 20L))
        .select(col("c_custkey").cast("string"), col("c_nationkey").cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var batch = 1L
      for (id <- ids) {
        val json = s"""{"nation": ${nations(id) * 100 + id.toLong}, """ +
          s""""email": "updated-$id@example.org"}"""
        BucketedRun.putSubresource(s, store, "customer", id, "contact_info",
          json, expectedSeq = 0L, newSeq = 1L, batchId = batch, idCol = "id")
        batch += 1
      }
      // the 409: a stale revision must conflict and leave the store intact
      val conflicted =
        try {
          BucketedRun.putSubresource(s, store, "customer", "1", "contact_info",
            """{"nation": 0, "email": "stale"}""",
            expectedSeq = 0L, newSeq = 2L, batchId = batch, idCol = "id")
          false
        } catch { case _: BucketedRun.WriteConflict => true }
      require(conflicted, "stale-revision putSubresource must raise WriteConflict")
      batch += 1
      // the 404: a subresource PUT never creates the parent document
      val missing =
        try {
          BucketedRun.putSubresource(s, store, "customer", "99999999",
            "contact_info", """{"nation": 1, "email": "ghost"}""",
            expectedSeq = 0L, newSeq = 1L, batchId = batch, idCol = "id")
          false
        } catch { case _: BucketedRun.NoSuchResource => true }
      require(missing, "putSubresource to a missing id must raise NoSuchResource")
      // readback through the URL search surface (b17's read path)
      val table = store.table(s, "customer")
      ids.map(id => QvarnUrl.parse(table,
          s"/customer/search/exact/id/$id/show/contact_info", idField = "id")
          .result())
        .reduce(_ unionByName _)
        .withColumn("contact_info", to_json(col("contact_info")))
    }),

    // B21: batch subresource fan-out read (`get_multiple_subresources`,
    // clients/qvarn.py:139-142) — N point GETs of /<type>/<id>/<sub>
    // batched as one pruned scan + one stitch join: ids 3 and 21 have no
    // side-document (null struct), 999999 is absent from the parent
    // entirely (no row — the per-id 404)
    "b21_multiget_sub" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val side = cust.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("id"), col("c_nationkey").as("nation"),
          concat(lit("c"), col("c_custkey"), lit("@example.com")).as("email"))
      QvarnUrl.multigetSubresource(cust, side, "contact_info",
          Seq("1", "2", "3", "10", "21", "999999"), idField = "c_custkey")
        .withColumn("contact_info", to_json(col("contact_info")))
    }),

    // Notification-queue introspection (listeners.py:37-40,
    // tests/test_notifications.py:19-77): the A18 retry ledger as a
    // queryable frame — pending retries with their backoff-gate timestamps
    // plus dead letters. The state is CONSTRUCTED deterministically from
    // real order keys (every 499th key is a notification; batch 1 at
    // t=1000 ms fails m%3!=0, batch 2 at t=2000 retries all due and fails
    // the even m again, batch 3 at t=4000 re-attempts only m%4==0 — with
    // maxRetries=2 those dead-letter), so the oracle re-derives the exact
    // queue from the same arithmetic. The ledger holds FAILURES, not the
    // feed — driver-side control data at any corpus size
    "mr_notifications" -> ((s, dir) => {
      val ms = t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(499)) === 0)
        .select(expr("o_orderkey div 499").as("m"))
        .collect().map(_.getLong(0)).sorted
      def chg(m: Long) = graft.incr.Change(
        seq = m * 499,
        change = (m % 5) match {
          case x if x < 2 => graft.incr.Change.Created
          case x if x < 4 => graft.incr.Change.Updated
          case _ => graft.incr.Change.Deleted
        },
        resourceType = "orders", resourceId = (m * 499).toString)
      val all = ms.map(chg)
      val led = new graft.incr.RetryLedger(maxRetries = 2)
      led.record(all, all.filter(c => (c.seq / 499) % 3 != 0), Nil, now = 1000L)
      val due2 = led.due(2000L)
      led.record(due2.map(_.change),
        due2.map(_.change).filter(c => (c.seq / 499) % 2 == 0), due2, now = 2000L)
      val due3 = led.due(4000L).filter(f => (f.change.seq / 499) % 4 == 0)
      led.record(due3.map(_.change), due3.map(_.change), due3, now = 4000L)
      graft.incr.Notifications.frame(s, led.pending, led.deadLetters)
    }),

    // A11: count reduce
    "a11_reduce_count" -> ((s, dir) => {
      val st = IncrementalRun.recompute(ordersCountPipeline, sources(s, dir))
      st("orders_cnt").select(col(Key), col(Value).as("cnt"))
    }),

    // A12: dedup-to-newest (latest event per user)
    "a12_dedup_newest" -> ((s, dir) =>
      DedupOp.newestWins(t(s, dir, "events"), Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))),

    // A16: map resync — stale v1 rows are re-mapped, current v2 rows kept
    "a16_resync_map" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val v2 = MapSpec("orders", "orders_map", 2, idCol = "o_orderkey",
        fn = MapFns.item("o_custkey", Some("o_totalprice"), idCol = "o_orderkey"))
      val v1 = MapSpec("orders", "orders_map", 1, idCol = "o_orderkey",
        fn = df => df.select(col("o_custkey").as(Key), lit(-1.0).as(Value), col("o_orderkey")))
      val old = MapOp(v2, orders.filter(col("o_orderkey") % 2 === 0))
        .unionByName(MapOp(v1, orders.filter(col("o_orderkey") % 2 =!= 0)))
      Resync.resyncMap(v2, sources(s, dir), old)
        .select(col(Key), col(Value), col(SourceId))
    }),

    // A17: reduce resync — distinct-keys recompute
    "a17_resync_reduce" -> ((s, dir) => {
      val st = IncrementalRun.recompute(lineitemMinPipeline, sources(s, dir))
      Resync.resyncReduce(lineitemMinPipeline, "li_min", st)
        .select(col(Key), col(Value).as("min_qty"))
    }),

    // A5/A6 incremental: UPDATED changes re-map touched ids through the
    // bucketed store (touched-bucket IO, not a full-state rewrite); end
    // state must equal the full recompute (the engine's core invariant).
    // Each invocation applies a LIVE batch under a fresh batch id — the
    // bench measures the bucket-scoped apply, never a replay no-op.
    // Time travel on the bucketed store: batch n+1 deletes a slice of
    // orders, batch n+2 restores it; the query reads the DELETED state
    // back through the retained batch-(n+1) manifest snapshot while the
    // live table shows the restored full state — MVCC from manifest
    // retention alone (immutable bucket dirs mean a snapshot costs one
    // small file per commit, no data copies). Both rows of history are
    // oracle-checked side by side under a snapshot tag
    "incr_time_travel" -> ((s, dir) => {
      // generous retention: the query reads the bootstrap's post-delete
      // snapshot on every later invocation
      val store = bucketedStore(dir, "tt", ordersSumPipeline,
        keepSnapshots = 10000)(sources(s, dir))
      // bootstrap once per process: the DELETE batch whose snapshot is the
      // "past" read target (its id rides the same manifest commit via meta)
      val n1 = store.meta("tt_past") match {
        case Some(b) => b.toLong
        case None =>
          val b = store.committedBatch.getOrElse(0L) + 1
          BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
            ordersBatch(s, dir, 7993, Change.Deleted), b, batchId = b)
          // marker only after the bootstrap batch committed — a failed
          // bootstrap must retry, not poison later invocations with an
          // as-of target whose snapshot never materialized (the staged
          // meta rides the NEXT commit, which is fine: the store is
          // process-scoped and the marker only gates re-bootstrapping)
          store.setMeta("tt_past", b.toString)
          b
      }
      // steady state: ONE live restore batch per invocation (a fresh seq so
      // each supersedes the last); the as-of read is manifest indirection
      val n2 = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
        ordersBatch(s, dir, 7993, Change.Updated, seqOffset = 1000000L + n2),
        n2, batchId = n2)
      store.tableAsOf(s, "orders_sum", n1)
        .select(lit("past").as("snapshot"), col(Key),
          round(col(Value), 2).as("sum_value"))
        .unionByName(store.table(s, "orders_sum")
          .select(lit("current").as("snapshot"), col(Key),
            round(col(Value), 2).as("sum_value")))
    }),

    // SNAPSHOT DIFF — the time-travel CDC read: full-outer join of a past
    // retained snapshot against the current committed state, classifying
    // every key as added/removed/updated. Pure manifest indirection on
    // both sides (no log replay); the oracle recomputes both states from
    // the source tables
    "incr_snapshot_diff" -> ((s, dir) => {
      val store = bucketedStore(dir, "tt", ordersSumPipeline,
        keepSnapshots = 10000)(sources(s, dir))
      val n1 = store.meta("tt_past") match {
        case Some(b) => b.toLong
        case None =>
          val b = store.committedBatch.getOrElse(0L) + 1
          BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
            ordersBatch(s, dir, 7993, Change.Deleted), b, batchId = b)
          store.setMeta("tt_past", b.toString)
          b
      }
      // one live restore batch per invocation (same steady state as
      // incr_time_travel — the diff is then past-vs-fully-restored)
      val n2 = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
        ordersBatch(s, dir, 7993, Change.Updated, seqOffset = 2000000L + n2),
        n2, batchId = n2)
      val past = store.tableAsOf(s, "orders_sum", n1)
        .select(col(Key), round(col(Value), 2).as("past_value"))
      val cur = store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("cur_value"))
      past.join(cur, Seq(Key), "full_outer")
        .filter(!(col("past_value") <=> col("cur_value")))
        .select(col(Key),
          when(col("past_value").isNull, "added")
            .when(col("cur_value").isNull, "removed")
            .otherwise("updated").as("change"),
          col("past_value"), col("cur_value"))
    }),

    // ZERO-COPY schema evolution on the durable store: `n_orders` is added
    // to the derived table's schema without rewriting a single committed
    // bucket (explicit-schema reads surface NULL from pre-evolution files —
    // BucketedIncrSpec pins that and the unchanged directory paths). The
    // first invocation evolves + backfills; later invocations stage a
    // touched-bucket batch that maintains BOTH columns for one key residue
    // class — the steady state of a widened table. The pre-evolution
    // snapshot still reads with the OLD shape via time travel.
    "incr_schema_evolve" -> ((s, dir) => {
      // generous snapshot retention: the query time-travels to batch 0
      // (the pre-evolution shape) on every invocation
      val store = bucketedStore(dir, "evo", ordersSumPipeline,
        keepSnapshots = 10000)(sources(s, dir))
      val next = store.committedBatch.getOrElse(0L) + 1
      val counts = t(s, dir, "orders")
        .groupBy(col("o_custkey").cast("string").as(Key))
        .agg(count(lit(1)).as("__n"))
      if (store.meta("evolved").isEmpty) {
        store.evolveTable("orders_sum", "n_orders BIGINT")
        store.setMeta("evolved", "1")
        val rows = store.table(s, "orders_sum").drop("n_orders")
          .join(counts, Seq(Key), "left")
          .withColumn("n_orders", col("__n")).drop("__n")
        store.stageBuckets("orders_sum", (0 until store.numBuckets).toSet,
          rows, next, Key)
      } else {
        // touched-bucket maintenance batch: recompute the buckets holding
        // keys ≡ (next mod 97); values are re-derived from source, so the
        // end state is invocation-stable
        val touched = store.table(s, "orders_sum")
          .filter(col(Key).cast("long") % 97 === next % 97)
          .select(store.bucketOf(col(Key)).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val rows = store.table(s, "orders_sum").drop("n_orders")
          .filter(store.bucketOf(col(Key)).isin(touched.toSeq: _*))
          .join(counts, Seq(Key), "left")
          .withColumn("n_orders", col("__n")).drop("__n")
        store.stageBuckets("orders_sum", touched, rows, next, Key)
      }
      store.commit(next)
      store.tableAsOf(s, "orders_sum", 0L)
        .select(lit("past").as("snapshot"), col(Key),
          round(col(Value), 2).as("sum_value"),
          lit(null).cast("long").as("n_orders"))
        .unionByName(store.table(s, "orders_sum")
          .select(lit("current").as("snapshot"), col(Key),
            round(col(Value), 2).as("sum_value"), col("n_orders")))
    }),

    "incr_update" -> ((s, dir) => {
      val store = bucketedStore(dir, "upd", ordersSumPipeline)(sources(s, dir))
      val next = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
        ordersBatch(s, dir, 9973, Change.Updated), next, batchId = next)
      store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // A13 tombstones + empty-group delete: DELETED changes drop
    // contributions and purge after the key's reduce. Invocation n deletes
    // residue class n (mod 9949) — derived from the committed batch pointer,
    // so every run applies a REAL delete batch of fresh ids (never a replay
    // no-op, never re-deleting already-absent ids). Verify's single
    // invocation is batch 1 = residue 1, which the oracle pins.
    "incr_delete" -> ((s, dir) => {
      val store = bucketedStore(dir, "del", ordersSumPipeline)(sources(s, dir))
      val next = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
        ordersBatch(s, dir, 9949, Change.Deleted, seqOffset = 10000000L,
          residue = next % 9949),
        next, batchId = next)
      store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // CREATE + DELETE in one batch, last change per id wins (A12 inside the
    // batch: every %6998 id carries both a CREATE and a higher-seq DELETE).
    // Initial state lacks the %3499 ids; the batch creates them and deletes
    // the %6998 subset — re-running upserts the survivors and no-op-deletes
    // the absent ids, so the end state is stable across invocations.
    "incr_create_delete" -> ((s, dir) => {
      val store = bucketedStore(dir, "cd", ordersSumPipeline) {
        val init: IncrementalRun.Sources = {
          case "orders" => t(s, dir, "orders").filter(col("o_orderkey") % 3499 =!= 0)
          case n => t(s, dir, n)
        }
        init
      }
      val next = store.committedBatch.getOrElse(0L) + 1
      val changes = ordersBatch(s, dir, 3499, Change.Created) ++
        ordersBatch(s, dir, 6998, Change.Deleted, seqOffset = 10000000L)
      BucketedRun.applyChanges(s, ordersSumPipeline, sources(s, dir), store,
        changes, next, batchId = next)
      store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // A3/A4 durable + scale path: a CREATE+DELETE batch applied through the
    // bucketed store — full recompute written hash-bucketed by _mr_key
    // (one-time, memoized per scale dir like any production state), then a
    // SMALL batch (~0.04% of ids — the shape the bucketed path exists for;
    // a backlog-sized batch is what resync A16/A17 is for) that reads and
    // rewrites only touched buckets and swaps the manifest; the result is
    // read back from parquet (a real durability round-trip). Every
    // invocation applies under a FRESH batch id (re-upserting the %4999
    // ids, no-op-deleting the absent %4993 ids), so the bench measures a
    // live bucket-scoped apply, never the exactly-once replay skip (that
    // contract is covered by BucketedIncrSpec).
    "incr_bucketed" -> ((s, dir) => {
      import s.implicits._
      val full = sources(s, dir)
      val store = bucketedStore(dir, "bk", ordersSumPipeline) {
        val init: IncrementalRun.Sources = {
          case "orders" => t(s, dir, "orders").filter(col("o_orderkey") % 4999 =!= 0)
          case n => t(s, dir, n)
        }
        init
      }
      val orders = t(s, dir, "orders")
      val created = orders.filter(col("o_orderkey") % 4999 === 0)
        .select(col("o_orderkey").as("seq"), lit(Change.Created).as("change"),
          lit("orders").as("resourceType"), col("o_orderkey").cast("string").as("resourceId"))
      val deleted = orders.filter(col("o_orderkey") % 4993 === 0)
        .select((col("o_orderkey") + 10000000L).as("seq"), lit(Change.Deleted).as("change"),
          lit("orders").as("resourceType"), col("o_orderkey").cast("string").as("resourceId"))
      val next = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(ordersSumPipeline, full, store,
        created.unionByName(deleted).as[Change], next, batchId = next)
      store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // A10-incremental on the bucketed path: TWO sources feed one map
    // target; the secondary index carries both provenance types and the
    // JoinReduce output is maintained per touched key. Updating ids whose
    // source rows are unchanged must leave the report equal to the full
    // recompute — the a10 oracle verbatim.
    "incr_bucketed_join" -> ((s, dir) => {
      val store = bucketedStore(dir, "join", joinPipeline)(sources(s, dir))
      val next = store.committedBatch.getOrElse(0L) + 1
      val changes = idBatch(s, dir, "customer", 1499, Change.Updated) ++
        idBatch(s, dir, "orders", 14983, Change.Updated, seqOffset = 20000000L)
      BucketedRun.applyChanges(s, joinPipeline, sources(s, dir), store,
        changes, next, batchId = next)
      store.table(s, "customer_report")
        .select(col(Key), col("customer_name"), col("acctbal"), col("last_totalprice"))
    }),

    // A15 version barrier: a key whose live map rows span handler versions
    // keeps its OLD reduce output (processor.py:173-177). Deterministic
    // mixed-version state over the %4 orders subset: rows of %36 orderkeys
    // sit at map version 1 with the v1 value (-1.0), rows of %100 orderkeys
    // carry a stale snapshot value (0.0), everything else is current v2.
    // The batch re-maps the %100 ids at v2; keys still holding an untouched
    // %36 row are postponed, keys without one recompute to the current sum
    // — both branches populated at every scale factor. Runs where
    // production runs the barrier: the BUCKETED store — the mixed-version
    // state is written hash-bucketed once per process, and every invocation
    // applies a live update batch through the scoped-bucket path (the state
    // is a fixed point of the batch, so repeated runs stay oracle-equal).
    "a15_version_barrier" -> ((s, dir) => {
      val orders = t(s, dir, "orders").filter(col("o_orderkey") % 4 === 0)
      val srcs: IncrementalRun.Sources = { case "orders" => orders }
      val v2 = MapSpec("orders", "orders_map", 2, idCol = "o_orderkey",
        fn = MapFns.item("o_custkey", Some("o_totalprice"), idCol = "o_orderkey"))
      val pipeline = Pipeline(maps = Seq(v2),
        reduces = Seq(ReduceSpec("orders_map", "orders_sum", 1, ExprReduce(sum))))
      val store = bucketedStores.getOrElseUpdate(s"$dir#a15", {
        // 16 buckets, not 64: this batch touches ~1% of ids but they spread
        // over ~most keys' buckets, so bucket count sets the per-batch task
        // and file count — size buckets to the BATCH's key spread, and at
        // real scale to >=128MB per bucket
        val st = new BucketedStateStore(
          graft.core.TempDirs.register(
            java.nio.file.Files.createTempDirectory("graft_incr_a15")).toString,
          numBuckets = 16)
        val key = col(SourceId).cast("long")
        val oldMap = MapOp(v2, orders)
          .withColumn(Value,
            when(key % 36 === 0, lit(-1.0))
              .when(key % 100 === 0, lit(0.0))
              .otherwise(col(Value)))
          .withColumn(MrSchema.Version, when(key % 36 === 0, lit(1)).otherwise(lit(2)))
          .cache()
        try st.initialize(Map(
          "orders_map" -> (oldMap, Key),
          BucketedRun.indexName("orders_map") ->
            (oldMap.select(col(MrSchema.SourceType), col(SourceId), col(Key)).distinct(),
              SourceId),
          "orders_sum" -> (ReduceOp(pipeline.reduces.head, oldMap): DataFrame, Key)))
        finally oldMap.unpersist(blocking = false)
        st
      })
      val next = store.committedBatch.getOrElse(0L) + 1
      BucketedRun.applyChanges(s, pipeline, srcs, store,
        ordersBatch(s, dir, 100, Change.Updated), next, batchId = next)
      store.table(s, "orders_sum")
        .select(col(Key), round(col(Value), 2).as("sum_value"))
    }),

    // B1: case-insensitive exact
    "b1_exact_ci" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey").exact("p_brand", "brand#13").result()),

    // B11: exactly-one semantics — searchOne() enforces the contract
    // (throws on zero or several matches); the same single row is returned
    // as a DataFrame for the oracle compare
    "b11_search_one" -> ((s, dir) => {
      val q = QvarnSearch(t(s, dir, "part"), "p_partkey").exact("p_partkey", "142")
      q.searchOne()
      q.result()
    }),

    // B2: ne (case-folded)
    "b2_ne" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey").notEqual("p_type", "economy").result()),

    // B3: ordered compares
    "b3_range" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey")
        .ge("p_size", 5).le("p_size", 40)
        .gt("p_retailprice", 905.0).lt("p_retailprice", 1050.0).result()),

    // B4: contains (case-insensitive LIKE %v%)
    "b4_contains" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey").contains("p_name", "RED").result()),

    // B5: startswith
    "b5_startswith" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey").startswith("p_name", "SMALL").result()),

    // B6: bare-field resolution into nested arrays-of-structs (exists())
    "b6_nested_field" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val nested = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(collect_list(struct(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderstatus"))).as("orders"))
      QvarnSearch(nested, "c_custkey").exact("o_orderpriority", "1-URGENT")
        .result().select(col("c_custkey"))
    }),

    // B7: repeated conds on one field AND together
    "b7_multi_cond" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey")
        .contains("p_name", "e").contains("p_name", "o").result()),

    // B8: projection (show)
    "b8_show" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey").exact("p_type", "small")
        .show("p_name", "p_retailprice").result()),

    // B9+B10: sort + offset/limit (requires sort)
    "b9_sort_limit" -> ((s, dir) =>
      QvarnSearch(t(s, dir, "part"), "p_partkey")
        .sort("p_retailprice", "p_partkey").offset(5).limit(10).result()),

    // B9 on a child list table: Qvarn sorts by the FIRST list element
    // (list_pos = 0) — here customers ordered by the min orderkey of their
    // (deterministically sorted) nested orders list, no-order customers
    // first (null sorts first ascending in both engines via NULLS FIRST)
    "b9_sort_list_field" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val nested = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        // array_sort: collect_list order is partition-dependent; sorting
        // makes element 0 deterministic for both engines
        .agg(array_sort(collect_list(struct(col("o_orderkey"), col("o_totalprice"))))
          .as("orders"))
      QvarnSearch(nested, "c_custkey").sort("o_orderkey", "c_custkey").limit(25)
        .show().result() // ids-only projection
    }),

    // B12: point multiget by id list
    "b12_multiget" -> ((s, dir) =>
      t(s, dir, "part").filter(col("p_partkey").isin(1, 2, 42, 77, 1999))),

    // B14: the server's URL search surface parsed end to end
    // (list_resource.py:196-262) — operators, typed coercion of the
    // string-carried value against an int column, multi-field sort,
    // offset/limit, show projection
    "b14_url_search" -> ((s, dir) =>
      QvarnUrl.urlSearch(t(s, dir, "part"),
        "/part/search/contains/p_name/WIDGET/ge/p_size/10" +
          "/sort/p_retailprice/sort/p_partkey/offset/3/limit/40" +
          "/show/p_name/show/p_size",
        idField = "p_partkey")),

    // B14: ids-only default projection + percent-decoded value ('%23' → '#')
    "b14_url_ids" -> ((s, dir) =>
      QvarnUrl.urlSearch(t(s, dir, "part"),
        "/part/search/exact/p_brand/Brand%234/gt/p_retailprice/950",
        idField = "p_partkey")),

    // B15: the client's Django-style keyword search (clients/qvarn.py:211-273)
    // — bare key = exact, multi-value tuple ANDs per element, stringified
    // values coerced back by column type
    "b15_param_search" -> ((s, dir) =>
      QvarnUrl.paramSearch(t(s, dir, "customer"),
        Seq("c_mktsegment" -> "BUILDING", "c_acctbal__ge" -> 0,
          "c_name__contains" -> Seq("1", "2")),
        show = Seq("c_name", "c_acctbal"), idField = "c_custkey").result()),

    // B14+B6: nested-field resolution through the URL surface — conditions
    // independently match ANY element of the child list, with the double
    // field compared numerically
    "b14_url_nested" -> ((s, dir) => {
      val nested = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(collect_list(struct(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))).as("orders"))
      QvarnUrl.urlSearch(nested,
        "/search/exact/o_orderpriority/1-URGENT/gt/o_totalprice/150000",
        idField = "c_custkey")
    }),

    // Streaming-analog windowed aggregation over the events table
    // Gap-based session windows per user (Spark session_window; the same
    // code runs streaming with a watermark). Oracle = the classic
    // gaps-and-islands formulation.
    "events_sessions" -> ((s, dir) =>
      graft.streaming.EventWindows.sessionAgg(t(s, dir, "events"), "ts", "user_id",
        gap = "10 minutes")
        .select(col("user_id"), col("session_start_us"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))),

    // The same gap sessions computed by the GENERAL custom-state operator:
    // flatMapGroupsWithState with event-time timeouts, driven as a real
    // file stream (data batch + punctuation batches that advance the
    // watermark and flush open sessions). Must equal the gaps-and-islands
    // oracle — and therefore also the built-in session_window variant.
    "events_sessions_state" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("us"), col("value"))
      // staged feed shared ACROSS invocations (the ssJoinDirs discipline —
      // staging 600k rows per run was pure fixture cost); every drain still
      // runs live over the files with a FRESH checkpoint: reusing the
      // checkpoint would mark the files processed and drain nothing
      val staged = sessStateStage.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_sess_state")).toString
        graft.streaming.StatefulSessions.stageSessionFeed(s, Seq(ev), d)
        d
      })
      graft.streaming.StatefulSessions
        .sessionizeDrained(ev, gapUs = 600000000L, watermarkDelay = "10 minutes",
          streamDir = staged, stage = false)
        .select(col("user_id"), col("session_start_us"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
    }),

    // Exactly-once delivery over an at-least-once feed: every event is
    // delivered TWICE (two micro-batches); dropDuplicatesWithinWatermark
    // keys state by event_id and expires it at the watermark horizon, so
    // the aggregate equals the batch oracle over the ORIGINAL events
    "events_dedup_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("us"),
          col("event_type"), col("value"))
      // both delivery copies staged once per fixture dir (ssJoinDirs
      // discipline); the dedup drain runs live per invocation with a fresh
      // checkpoint — see events_sessions_state for why reuse is unsafe
      val staged = dedupStreamStage.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_dedup_stream")).toString
        graft.streaming.StatefulSessions.stageDedupFeed(ev, d)
        d
      })
      graft.streaming.StatefulSessions.dedupDrained(ev, "1 hour", staged,
        stage = false)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    }),

    // Backward as-of join (union+window form — one exchange, no range-join
    // explosion): each event picks up the most recent prior-or-equal
    // 'view' event of the same user. Oracle is DuckDB's native ASOF JOIN.
    "events_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("us").as("vus"), col("value").as("view_value"),
          col("event_id").as("vid"))
      // tieBreak pins equal-microsecond view collisions deterministically
      // (none exist in this corpus, but output must not be layout-dependent)
      graft.ops.AsOfJoin.asOf(
        ev.select(col("event_id"), col("user_id"), col("us")), views,
        "user_id", "us", "vus", Seq("view_value"), tieBreak = Some("vid"))
    }),

    // The SAME as-of join through the custom-plan tier: logical node +
    // planner strategy + sorted-merge exec (plans/AsOfJoinNative). Each
    // side shuffles only its own columns and the merge streams with O(1)
    // state — no window buffer, no union padding. Same oracle as
    // events_asof: the two forms must agree row for row
    "events_asof_native" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("us").as("vus"), col("value").as("view_value"),
          col("event_id").as("vid"))
      graft.plans.AsOfJoinNative.asOf(
        ev.select(col("event_id"), col("user_id"), col("us")), views,
        "user_id", "us", "vus", Seq("view_value"), tieBreak = Some("vid"))
    }),

    // Conversion funnel: signup → view → purchase, each stage's first
    // qualifying event within 1 h of the previous stage's timestamp —
    // keyed min-aggregates and user joins only, no windows
    "events_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnel(
        t(s, dir, "events").withColumn("us", expr("ts div 1000")),
        "user_id", "us", "event_type",
        Seq("signup", "view", "purchase"), withinUs = 3600000000L)),

    // Bucketized interval join (the Flink-interval-join shape as relational
    // algebra — window-width time buckets + equi-join + exact range prune,
    // never a nested-loop): errors within one hour after each signup of the
    // same user, aggregated per signup
    "events_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
      val su = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("us"))
      val er = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("us").as("ets"), col("value").as("err_value"))
      graft.ops.IntervalJoin.intervalJoin(su, er, Seq("user_id"),
          "us", "ets", lower = 0L, upper = 3600000000L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_err"), round(sum(col("err_value")), 2).as("sum_err"))
    }),

    // The SAME interval join as a stream-STREAM join: both sides replayed
    // through readStream with watermarks, paired in the join state store,
    // drained append-mode. Must equal the batch bucketized interval join —
    // they share one oracle
    "events_join_stream" -> ((s, dir) => {
      val (su, er) = ssJoinFrames(s, dir)
      val (l, r) = ssJoinDirs(s, dir)
      graft.streaming.StreamJoins.intervalJoinDrained(su, er, "user_id",
          "us", "ets", window = "1 HOUR", watermarkDelay = "1 hour",
          l, r, stage = false)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_err"), round(sum(col("err_value")), 2).as("sum_err"))
    }),

    // LEFT-OUTER stream-stream interval join: signups with NO error inside
    // the hour window surface as n_err = 0 rows once the watermark closes
    // their window (state-store eviction emits the null-extended row);
    // signups whose window is still open at stream end stay buffered —
    // the durable resume semantics — so the drained set is matches plus
    // closed-window misses, both oracle-derivable
    "events_join_stream_outer" -> ((s, dir) => {
      val (su, er) = ssJoinFrames(s, dir)
      val (l, r) = ssJoinDirs(s, dir)
      graft.streaming.StreamJoins.intervalJoinLeftOuterDrained(su, er, "user_id",
          "us", "ets", window = "1 HOUR", watermarkDelay = "1 hour",
          l, r, stage = false)
        .groupBy(col("event_id"))
        .agg(count(col("err_value")).as("n_err"),
          round(sum(col("err_value")), 2).as("sum_err"))
    }),

    // Schema-on-read JSON sidecar extraction: parse the props column with
    // an explicit DDL schema (from_json — codegen'd, no UDF, no inference
    // scan) and aggregate the typed field per event_type
    "events_props_agg" -> ((s, dir) => {
      val k = graft.sources.SemiStructured.jsonField(col("props"), "k INT", "k")
      t(s, dir, "events")
        .select(col("event_type"), k.cast("long").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // NFC Unicode canonicalization (graft_nfc codegen kernel) ahead of
    // fingerprinting: decomposed sequences are injected deterministically
    // (the corpus is ASCII), and the normalized bytes must shrink and
    // hash identically to DuckDB's nfc_normalize
    "text_nfc" -> ((s, dir) => {
      // DECOMPOSED "café noël": e + combining acute (U+0301) / diaeresis
      // (U+0308) — explicit escapes so no editor silently re-composes them
      val aug = concat(col("text"), lit(" caf\u0065\u0301 no\u0065\u0308l"))
      val norm = graft.text.TextFunctions.nfcNormalize(aug)
      t(s, dir, "documents").select(col("doc_id"),
        octet_length(aug).cast("long").as("raw_bytes"),
        octet_length(norm).cast("long").as("nfc_bytes"),
        md5(norm.cast("binary")).as("nfc_md5"))
    }),

    // Multi-level OLAP aggregation: rollup produces the (source, lang),
    // (source, ALL) and (ALL, ALL) grouping sets in ONE pass — map-side
    // partial aggregation covers all levels before the single shuffle
    "corpus_rollup" -> ((s, dir) =>
      t(s, dir, "documents").rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("total_chars"))),

    // CUBE grouping sets over the same dimensions (all four marginal
    // combinations in ONE pass — rollup's lattice plus the lang-only cut)
    "corpus_cube" -> ((s, dir) =>
      t(s, dir, "documents").cube(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("total_chars"))),

    // Per-source QUANTILE length gate: keep docs inside their own source's
    // [p05, p95] token-count band — outlier filtering RELATIVE to the
    // source distribution; bounds are a broadcast corpus-stat aggregate,
    // the gate is a narrow filter, no per-group sort at any scale
    "text_length_gate" -> ((s, dir) =>
      Curation.lengthGate(t(s, dir, "documents"), "text", "doc_id", "source")),

    // The bounded-memory variant: [lo, hi] from exact order statistics
    // over each source's deterministic bottom-k md5 sample (≤ k rows of
    // state per group ever, mergeable) — the 100 TB shape of the gate,
    // where exact `percentile` would buffer a dominant source's whole
    // length column in one aggregation state
    "text_length_gate_sketched" -> ((s, dir) =>
      Curation.lengthGateSketched(t(s, dir, "documents"), "text", "doc_id",
        "source", k = 128)),

    // CCNet-style head/middle/tail quality buckets per language: tercile
    // thresholds of the corpus-LM score broadcast back over a narrow
    // bucket pass (threshold comparison, never an ntile sort per language)
    "text_quality_buckets" -> ((s, dir) =>
      Curation.lmBuckets(t(s, dir, "documents"), "text", "doc_id", "lang")),

    // Pivot to a wide per-user activity profile (explicit value list, so
    // the schema is static and the plan is one ordinary aggregation)
    "events_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events").groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +:
          types.map(c => coalesce(col(c), lit(0L)).as(s"n_$c")): _*)
    }),

    "events_hourly" -> ((s, dir) => {
      val ev = t(s, dir, "events") // ts is long ns (nanosAsLong)
      // integral div — FP division would lose precision on ~1e18 ns values
      ev.groupBy(expr("ts div 3600000000000").as("hour_idx"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select((col("hour_idx") * 3600).as("hour"), col("event_type"), col("cnt"),
          col("sum_value"))
    }),

    // Integer EWMA rate smoothing + spike count per event type: the
    // hourly series folds SEQUENTIALLY (s_t = (s_{t-1} + x_t) div 2 — a
    // half-life-one-hour exponential smoother in pure integer halving)
    // with spikes flagged where x_t > 4·s_{t-1}. Sequential state can't
    // be a window sum, so the fold runs IN-ROW over the per-type series
    // (bounded by the retention window, not corpus size) with the
    // (smoothed, spikes) state bit-packed into one long — the same fold
    // runs as DuckDB's list_reduce, so the nonlinear truncated recurrence
    // is bit-exact cross-engine
    "events_ewma" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hourly = ev
        .groupBy(expr("ts div 3600000000000").as("hour_idx"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      graft.streaming.EventWindows
        .ewmaSpikes(hourly, "event_type", "hour_idx", "cnt")
        .withColumnRenamed("n_buckets", "n_hours")
    }),

    // A2/A23 driver-checked as a REAL streaming query: the same windowed
    // aggregation computed via readStream → watermark → AvailableNow drain
    // into a memory sink. One parquet file → one micro-batch, so the
    // watermark drops nothing and the result equals the batch oracle.
    "events_hourly_stream" -> ((s, dir) => BatchConf.withBatchTuning(s) {
      val stream = eventsStream(s, dir)
      val agg = graft.streaming.EventWindows
        .typedWindowAgg(stream, "ts", watermark = "2 hours", window = "1 hour")
      // monotonic counter, not identityHashCode: hash collisions with a
      // still-registered sink are possible, and repeated runs must not leak
      // one temp view each
      val sink = s"events_hourly_stream_${streamSinkSeq.incrementAndGet()}"
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // Dataset analysis is eager, so the view can be dropped immediately —
      // the returned frame keeps the resolved memory-sink plan
      val out = s.table(sink)
        .select((unix_timestamp(col("window_start"))).as("hour"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
      s.catalog.dropTempView(sink)
      out
    }),

    // A23 forever mode (`-f`, worker.py:76-89) driver-checked: the SAME
    // windowed aggregation under a ProcessingTime trigger — the query keeps
    // polling after the data is drained (the reference's 0.5 s idle loop);
    // processAllAvailable() is the quiescent point, then the query is
    // stopped and the drained result must equal the batch oracle.
    "events_hourly_forever" -> ((s, dir) => BatchConf.withBatchTuning(s) {
      val stream = eventsStream(s, dir)
      val agg = graft.streaming.EventWindows
        .typedWindowAgg(stream, "ts", watermark = "2 hours", window = "1 hour")
      val sink = s"events_hourly_forever_${streamSinkSeq.incrementAndGet()}"
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      val out = s.table(sink)
        .select((unix_timestamp(col("window_start"))).as("hour"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
      s.catalog.dropTempView(sink)
      out
    }),

    // Stream-STATIC enrichment — the standard streaming dimension join: the
    // event stream joins a broadcast static dimension (re-resolved per
    // micro-batch, so a slowly-changing dimension picks up updates) and
    // aggregates per dimension attribute. No state store involvement for
    // the join itself; the stream side never shuffles before the agg
    "events_enrich_stream" -> ((s, dir) => BatchConf.withBatchTuning(s) {
      val stream = eventsStream(s, dir)
      val cust = broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
      val agg = stream.join(cust, col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sv"))
      val sink = s"events_enrich_stream_${streamSinkSeq.incrementAndGet()}"
      val q = agg.writeStream
        .outputMode("complete").format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = s.table(sink)
        .select(col("c_nationkey"), col("n_events"),
          round(col("sv"), 2).as("sum_value"))
      s.catalog.dropTempView(sink)
      out
    }),

    // The production sink shape for the same streaming aggregation: UPDATE
    // output mode drained through foreachBatch into the durable bucketed
    // store — per-batch IO tracks the changed key set and the result lives
    // in the store, not in driver memory (the complete-mode memory sink
    // above is the test-harness variant; this is what a 100 TB feed runs)
    "events_hourly_upsert" -> ((s, dir) => BatchConf.withBatchTuning(s) {
      val stream = eventsStream(s, dir)
      val agg = graft.streaming.EventWindows
        .typedWindowAgg(stream, "ts", watermark = "2 hours", window = "1 hour")
      val store = new BucketedStateStore(
        graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ev_upsert")).toString,
        numBuckets = 16)
      graft.streaming.EventWindows.drainToStore(agg, store, "hourly",
        concat_ws("|", unix_timestamp(col("window_start")).cast("string"),
          col("event_type")))
      graft.streaming.EventWindows.storedTable(s, store, "hourly")
        .select(unix_timestamp(col("window_start")).as("hour"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
    }),

    // ---- training-data pipeline extensions --------------------------------

    // Exact dedup survivors (hash-groupBy on content fingerprint)
    "dedup_exact" -> ((s, dir) =>
      DocDedup.exact(t(s, dir, "documents"), "text", "doc_id").select(col("doc_id"))),

    // MinHash+LSH near-dup pairs, verified with exact Jaccard. The bucket
    // cap is the production setting: a degenerate band bucket (boilerplate
    // shingle block) is m²/2 candidates at corpus scale. 10k ≫ any bucket in
    // this corpus, so the capped path is benched without changing output.
    "dedup_minhash" -> ((s, dir) =>
      DocDedup.nearDupPairs(t(s, dir, "documents"), "text", "doc_id",
        threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))),

    // TRAIN/EVAL LEAKAGE audit: near-dup pairs that CROSS the deterministic
    // split boundary — the documents that leak evaluation data into
    // training even after exact dedup. Pure composition: the LSH pair set
    // tagged with each side's md5-split assignment, filtered to
    // boundary-crossing pairs
    "split_leakage" -> ((s, dir) => {
      def sp(c: Column) = Curation.assignSplit(c,
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      DocDedup.nearDupPairs(t(s, dir, "documents"), "text", "doc_id",
          threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"),
          sp(col("id_a")).as("split_a"), sp(col("id_b")).as("split_b"))
        .filter(col("split_a") =!= col("split_b"))
    }),

    // LSH banding TUNER: measured precision/recall of each (bands, rows)
    // split against exact all-pairs ground truth on the 256 docs with
    // the smallest md5 draws (an ABSOLUTE bottom-k sample — a rate would
    // make the all-pairs stage quadratic in corpus size) — how the
    // production banding knob is picked from the corpus's own similarity
    // distribution (more bands → recall up, precision down). The md5
    // MinHash keeps the signatures cross-engine
    "dedup_lsh_tune" -> ((s, dir) =>
      DocDedup.lshTune(t(s, dir, "documents"), "text", "doc_id",
        threshold = 0.8, numHashes = 16, bandChoices = Seq(2, 4, 8),
        sampleSize = 256)),

    // Incremental near-dup: index two thirds of the corpus once, apply the
    // remaining third as a live change batch, and dedup the batch against
    // the persisted index (partition-pruned band/set reads — no corpus
    // rescan). Build-time pairs ∪ batch probe must equal the one-shot
    // full-recompute pair set, so this shares dedup_minhash's exact oracle
    "dedup_minhash_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      // index bootstrap once per process (the production pipeline's cold
      // start, its cost ≈ dedup_minhash which IS measured); afterwards
      // every invocation is a LIVE batch under a fresh generation against
      // the durable index — the same measurement discipline as incr_*.
      // Re-applying the same ids supersedes their previous generation, so
      // the live corpus (and the pair set) is a fixed point of the batch.
      val (idx, initPairsPath, gen) = lshIndexes.getOrElseUpdate(dir, {
        val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        val tmp = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_lshidx")).toString
        // sign-once APIs: build+pairs / apply+probe each shingle their
        // frame exactly once. nPartitions tracks corpus size (16 at sf0.1
        // — at cluster scale use the 64 default or higher).
        val (i, p) = LshIndex.buildWithPairs(init, "text", "doc_id",
          tmp, threshold = 0.8, numHashes = 32, bands = 8, nPartitions = 16,
          maxBucketSize = 10000)
        // build-time pairs persist beside the index (disk, not a cached
        // plan: Bench/Verify clear the cache between queries)
        p.write.mode("overwrite").parquet(s"$tmp/init_pairs")
        (i, s"$tmp/init_pairs", new java.util.concurrent.atomic.AtomicLong(0L))
      })
      LshIndex.applyBatchWithPairs(idx, batch, "text", "doc_id",
        deletes = batch.select(col("doc_id")).limit(0),
        gen = gen.incrementAndGet(), maxBucketSize = 10000)
        .unionByName(s.read.parquet(initPairsPath))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // STREAMING ingest dedup: the live third arrives as a document change
    // stream; a checkpointed AvailableNow drain hands each micro-batch to
    // the persisted LSH index (applyBatchWithPairs = index AND dedup in one
    // signing pass), so every invocation measures one REAL streaming
    // micro-batch under a fresh generation. Re-applied ids supersede their
    // previous generation, so converged pairs ∪ build pairs reproduce the
    // one-shot pair set — the same exact oracle as dedup_minhash
    "dedup_minhash_stream" -> ((s, dir) => BatchConf.withBatchTuning(s) {
      val (idx, initPairsPath, livePairsPath, streamDir, ckptDir) =
        lshStreamIndexes.getOrElseUpdate(dir, {
          val docs = t(s, dir, "documents")
          val init = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          val tmp = graft.core.TempDirs.register(
            java.nio.file.Files.createTempDirectory("graft_lshstr")).toString
          val (i, p) = LshIndex.buildWithPairs(init, "text", "doc_id", tmp,
            threshold = 0.8, numHashes = 32, bands = 8, nPartitions = 16,
            maxBucketSize = 10000)
          p.write.mode("overwrite").parquet(s"$tmp/init_pairs")
          (i, s"$tmp/init_pairs", s"$tmp/live_pairs",
            graft.core.TempDirs.register(
              java.nio.file.Files.createTempDirectory("graft_lshstr_in")).toString,
            graft.core.TempDirs.register(
              java.nio.file.Files.createTempDirectory("graft_lshstr_ck")).toString)
        })
      val live = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), col("text"))
      // one new file per invocation; the checkpoint makes the drain process
      // exactly this file (never a replay of earlier invocations' files)
      live.coalesce(1).write.mode("append").parquet(streamDir)
      val noDeletes = live.filter(lit(false)).select(col("doc_id"))
      val q = s.readStream.schema(live.schema).parquet(streamDir)
        .writeStream
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          LshIndex.applyBatchWithPairs(idx, b.toDF(), "text", "doc_id",
            noDeletes, gen = id + 1, maxBucketSize = 10000)
            .write.mode("overwrite").parquet(livePairsPath)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(livePairsPath)
        .unionByName(s.read.parquet(initPairsPath))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Near-dup RESOLUTION: pairs → connected components (min-label
    // propagation + pointer jumping, O(log n) joins) → keep the smallest
    // doc_id per cluster. This is the query that actually drops documents.
    "dedup_minhash_resolve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DocDedup.nearDupPairs(docs, "text", "doc_id",
        threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
      Components.survivors(docs, "doc_id", pairs).select(col("doc_id"))
    }),

    // INCREMENTAL near-dup resolution: the prior corpus's component
    // labeling contracts to (id, cluster) star edges; a new-document
    // batch folds in ONLY its delta pairs — never the historical edge
    // set — and the merged survivors must equal the one-shot resolution
    // (same oracle as dedup_minhash_resolve)
    "dedup_resolve_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Caches.track(
        DocDedup.nearDupPairs(docs, "text", "doc_id",
          threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000))
      val boot = pairs.filter(col("id_a") % 3 =!= 0 && col("id_b") % 3 =!= 0)
      val delta = pairs.filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
      val labels0 = Components.connectedComponents(boot, "id_a", "id_b")
      val merged = Components.incrementalComponents(labels0, delta)
      Components.survivorsFromLabels(docs, "doc_id", merged).select(col("doc_id"))
    }),

    // Quality-keyed resolution: keep the LONGEST member of each near-dup
    // cluster (ties → smallest id) instead of the smallest id — the
    // FineWeb/RefinedWeb convention of preserving the best copy. Same
    // pair/component machinery; the winner pick is one integral argmax
    // per cluster over the (small) member set
    "dedup_resolve_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DocDedup.nearDupPairs(docs, "text", "doc_id",
        threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
      Components.survivorsByKey(docs, "doc_id", pairs,
        d => length(d("text")).cast("long"))
        .select(col("doc_id"))
    }),

    // Same resolution over the EMBEDDING near-dup pair family: cosine
    // pairs → components → one vector per cluster
    "embed_neardup_resolve" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val pairs = Similarity.bruteForcePairs(e, "vec_id", "embedding",
        threshold = 0.45)
      Components.survivors(e, "vec_id", pairs).select(col("vec_id"))
    }),

    // Sub-document candidate pairs from shared winnowing fingerprints —
    // the MOSS match step: any shared ≥ k+w-1-token run is guaranteed a
    // shared fingerprint, so this is the recall-safe candidate generator
    // for substring-level dedup (one fp-key exchange; a boilerplate-heavy
    // fp behaves like an LSH bucket and AQE handles the skew)
    "dedup_winnow_pairs" -> ((s, dir) => {
      // pinned: the fingerprint frame feeds BOTH self-join sides — without
      // it the winnow window pipeline plans (and runs) twice
      val fp = graft.ops.Caches.track(
        Curation.winnow(t(s, dir, "documents"), "text", "doc_id",
          k = 5, w = 4).select(col("doc_id"), col("fp")).distinct())
      fp.select(col("doc_id").as("id_a"), col("fp"))
        .join(fp.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // SemDeDup end to end: cell-scoped cosine pairs → connected components
    // → one surviving vector per semantic cluster (the embedding-space
    // analogue of pipeline_filter's near-dup drop)
    "semantic_dedup_filter" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val pairs = Similarity.cellScopedPairs(fixedCellAssignment(s, dir),
        e, "vec_id", "embedding", "cell", threshold = 0.4)
      Components.survivors(e, "vec_id", pairs).select(col("vec_id"))
    }),

    // End-to-end training-data filter — the composition a pretraining
    // pipeline runs before tokenization: drop near-dup losers, keep
    // English docs above the quality gate
    "pipeline_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DocDedup.nearDupPairs(docs, "text", "doc_id",
        threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
      Components.survivors(docs, "doc_id", pairs)
        .filter(TextFunctions.langId(col("text")) === "en" &&
          TextFunctions.qualityScore(col("text")) >= 0.55)
        .select(col("doc_id"))
    }),

    // The CAPSTONE end-to-end curation pipeline: near-dup RESOLUTION
    // (MinHash pairs → connected components → survivors) ∘ language +
    // quality gates ∘ per-source quantile length gate (bounds computed on
    // the gated population itself) ∘ temperature mixing to per-source
    // budgets — the whole chain a pretraining run executes, one oracle.
    // The filtered survivor set is pinned: it feeds the gate-bounds pass,
    // the gate join and the mix, and the CC loop must not re-run per use
    "pipeline_curate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = DocDedup.nearDupPairs(docs, "text", "doc_id",
        threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
      val filtered = graft.ops.Caches.track(
        Components.survivors(docs, "doc_id", pairs)
          .filter(TextFunctions.langId(col("text")) === "en" &&
            TextFunctions.qualityScore(col("text")) >= 0.55))
      val gated = Curation.lengthGate(filtered, "text", "doc_id", "source")
      val gatedDocs = filtered.join(gated.select(col("doc_id")), Seq("doc_id"))
      Curation.mixByTemperature(gatedDocs, "doc_id", "text", "source",
        alpha = 0.7, frac = 0.5)
    }),

    // Curation OBSERVABILITY: per-document audit trail — the FIRST gate
    // that rejected each doc (near-dup loser → language → quality), the
    // provenance record a pipeline publishes alongside its output (the
    // FineWeb-style filtering funnel). Same gates as pipeline_filter, but
    // kept rows become 'pass' and dropped rows say WHY
    "pipeline_audit" -> ((s, dir) => pipelineAudit(s, dir)),

    // The funnel itself: documents remaining after each successive stage —
    // four control rows derived from one pass over the audit frame
    "pipeline_funnel" -> ((s, dir) => {
      val a = pipelineAudit(s, dir).agg(
        count(lit(1)).as("n0"),
        sum(when(col("stage") =!= "dup", 1L).otherwise(0L)).as("n1"),
        sum(when(col("stage") =!= "dup" && col("stage") =!= "lang", 1L)
          .otherwise(0L)).as("n2"),
        sum(when(col("stage") === "pass", 1L).otherwise(0L)).as("n3"))
      a.select(explode(array(
          struct(lit(0L).as("ord"), lit("ingest").as("stage"), col("n0").as("remaining")),
          struct(lit(1L).as("ord"), lit("dedup").as("stage"), col("n1").as("remaining")),
          struct(lit(2L).as("ord"), lit("lang").as("stage"), col("n2").as("remaining")),
          struct(lit(3L).as("ord"), lit("quality").as("stage"), col("n3").as("remaining"))))
          .as("f"))
        .select(col("f.ord").as("ord"), col("f.stage").as("stage"),
          col("f.remaining").as("remaining"))
    }),

    // SimHash hamming near-dup pairs. The md5-nibble signature variant is
    // bit-for-bit reproducible in DuckDB, so the whole pipeline (signature
    // → chunk blocking → hamming verify) is hash-checked by the oracle;
    // the xxhash64 kernel variant is the throughput path (DedupSimSpec).
    // maxBucketSize is explicitly uncapped HERE because the oracle computes
    // the exact hamming<=3 pair set — a hot chunk bucket silently dropping
    // candidates would only surface at corpus scales the oracle never runs;
    // capped blocking remains the production default in simhashPairs.
    "dedup_simhash" -> ((s, dir) =>
      DocDedup.simhashPairs(t(s, dir, "documents"), "text", "doc_id", maxDist = 3,
        sigFn = DocDedup.simhashMd5, maxBucketSize = Int.MaxValue)),

    // Exact n-gram Jaccard on a subsample (the all-pairs baseline)
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 1500)
      // shingle sets computed once per doc (cached: both join sides read
      // this frame), NOT per pair; left side repartitioned — the nested-loop
      // join otherwise inherits the scan's single input partition →
      // one-core quadratic
      val sets = graft.ops.Caches.track(docs.select(col("doc_id"),
        array_distinct(DocDedup.shingles(col("text"))).as("__sh")))
      val a = sets.select(col("doc_id").as("id_a"), col("__sh").as("__sa")).repartition(32)
      val b = sets.select(col("doc_id").as("id_b"), col("__sh").as("__sb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("jaccard", DocDedup.jaccardSets(col("__sa"), col("__sb")))
        .filter(col("jaccard") >= 0.15)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Brute-force cosine top-k (the ANN baseline)
    "sim_topk_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"),
          col("rank"))
    }),

    // ANN index QUALITY dashboard: recall@5 of the IVF probe against the
    // exact brute-force ground truth, per probe budget (nProbe 1/2/4) —
    // the measurement that justifies a partition-pruned index at 100 TB
    // (how much recall does each pruned cell cost?). Both sides break
    // cosine ties by neighbor_id, so the top-5 SETS are deterministic and
    // the hit counts exact; recall is an integer-nano ladder. Output is
    // 3 control rows; the expensive parts are the same scans the probes
    // themselves run
    "sim_recall_eval" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val truth = recallTruth(s, dir)
      val index = ivfIndexes.getOrElseUpdate(dir, Ivf.buildIndexWith(
        fixedCentroids(s, dir), e, "vec_id", "embedding",
        graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivf_idx")).toString))
      val nq = q.count()
      def lane(name: String, np: Int, probe: DataFrame) = {
        val hits = probe.select(col("query_id"), col("neighbor_id"))
          .join(truth, Seq("query_id", "neighbor_id")).count()
        (name, np, nq, hits,
          (BigInt(hits) * BigInt(1000000000L) / (BigInt(nq) * 5)).toLong)
      }
      // the quantized lane: ADC distances over the same cells — measures
      // what the 32× code compression costs in recall
      val pqIdx = pqIndexPaths.getOrElseUpdate(dir, {
        val p = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivfpq")).toString
        graft.sim.Pq.buildCodeIndex(e, "vec_id", "embedding",
          fixedCentroids(s, dir), pqCodebooks(s, dir), p)
        p
      })
      // the four lanes are independent partition-pruned probe+count jobs —
      // overlap them (guide §2.6) instead of paying four straggler tails
      val laneFns: Seq[() => (String, Int, Long, Long, Long)] =
        Seq(1, 2, 4).map(np => () => lane("ivf", np,
          Ivf.probe(index, q, "vec_id", "embedding", k = 5, nProbe = np))) :+
        (() => lane("ivfpq", 3,
          graft.sim.Pq.probeCodeIndex(q, "vec_id", "embedding",
            fixedCentroids(s, dir), pqCodebooks(s, dir), pqIdx,
            nProbe = 3, k = 5)))
      val rows = inParallel(laneFns, threads = 4)(_.apply())
      rows.toDF("lane", "n_probe", "n_queries", "hits", "recall_nano")
    }),

    // Recall dashboard for the HYPERPLANE-LSH lane — prices the
    // (nTables, nBits) production knobs the same way sim_recall_eval
    // prices IVF's nProbe: recall@5 of the hamming-1 bucket probe vs the
    // exact brute-force truth, per configuration. More tables buy recall
    // with extra index copies; more bits buy selectivity (smaller
    // candidate sets) at a recall cost — this lane measures both
    // directions of the trade. Output is 4 control rows
    "sim_recall_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val truth = recallTruth(s, dir)
      val nq = q.count()
      // ONE corpus signature + probe-join pass covers the three nested
      // 8-bit lanes (table seeds are prefix-stable, so `min_table < t`
      // slices the t-table candidate set exactly — Similarity
      // .lshCandidatesMd5); the 12-bit lane is a different hyperplane
      // family and keeps its own pass. The cached-candidate lane counts
      // and the 12-bit lane run OVERLAPPED (guide §2.6) so the second
      // pass back-fills the first pass's straggler tail.
      val cand = graft.ops.Caches.track(Similarity.lshCandidatesMd5(
        e, q, "vec_id", "embedding", dim = 64, nBits = 8, nTables = 4))
      def hitsOf(topk: DataFrame): Long = topk
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id")).count()
      val lanes: Seq[() => Long] = Seq(
        () => hitsOf(Similarity.lshTopKFromCandidates(cand, tables = 1, k = 5)),
        () => hitsOf(Similarity.lshTopKFromCandidates(cand, tables = 2, k = 5)),
        () => hitsOf(Similarity.lshTopKFromCandidates(cand, tables = 4, k = 5)),
        () => hitsOf(Similarity.lshTopKMd5(e, q, "vec_id", "embedding",
          dim = 64, k = 5, nBits = 12, nTables = 2)))
      val hits = inParallel(lanes, threads = 4)(_.apply())
      val rows = Seq((1, 8), (2, 8), (4, 8), (2, 12)).zip(hits).map {
        case ((tables, bits), h) =>
          (tables, bits, nq, h,
            (BigInt(h) * BigInt(1000000000L) / (BigInt(nq) * 5)).toLong)
      }
      rows.toDF("n_tables", "n_bits", "n_queries", "hits", "recall_nano")
    }),

    // Embedding DRIFT monitor: per-dimension mean shift between two
    // slices (here the even/odd vec_id halves standing in for two corpus
    // snapshots), top dims by absolute shift — integer-micro keys, exact
    // cross-engine ranking
    "embed_drift" -> ((s, dir) =>
      Similarity.dimensionDrift(t(s, dir, "embeddings"), "embedding",
        isA = col("vec_id") % 2 === 0)),

    // LSH-bucketed ANN top-k over the md5 hyperplane family: approximate
    // SEARCH, deterministic RESULT — candidates are exactly the pairs
    // within hamming 1 of the query's bucket in one of the 2 tables, so
    // the oracle re-derives the same buckets from its own md5 and the
    // top-k hash-checks end to end (the xxhash64 lshTopK stays the
    // throughput default, recall-pinned in DedupSimSpec). 2^8 buckets
    // sized for the test corpora; at 100 TB raise nBits so bucket
    // cardinality tracks corpus size
    "sim_topk_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopKMd5(e, q, "vec_id", "embedding", dim = 64, k = 5, nBits = 8)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // IVF ANN top-k against the FIXED-centroid index (the sim_ivf_assign
    // substrate): with fixed centroids the probed cells and their members
    // are an exact function of the data, so the whole probe hash-checks —
    // approximate only vs brute force (recall pinned in IvfSpec; trained
    // k-means Ivf.buildIndex remains the production path). The index is
    // built ONCE per scale dir (assignment persisted partitioned by cell)
    // and every invocation probes it — a probe reads only the probed
    // cells' partitions.
    "sim_topk_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val index = ivfIndexes.getOrElseUpdate(dir, Ivf.buildIndexWith(
        fixedCentroids(s, dir), e, "vec_id", "embedding",
        graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivf_idx")).toString))
      Ivf.probe(index, q, "vec_id", "embedding", k = 5, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // LSH bucket assignment — the DETERMINISTIC substrate under the
    // approximate sim_topk_lsh: md5-hyperplane family, hash-checked against
    // an oracle that re-derives the same hyperplanes from its own md5 (the
    // xxhash64 family stays the throughput path; DedupSimSpec pins both)
    "sim_lsh_bucket" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
        Similarity.lshBucketMd5(col("embedding"), dim = 64, nBits = 8).as("bucket"))),

    // IVF cell assignment — the deterministic substrate under sim_topk_ivf:
    // nearest-cell over a FIXED centroid set (the 8 smallest vec_ids'
    // vectors — k-means trained centroids are equally fixed at probe time),
    // hash-checked end to end including the tie rule
    "sim_ivf_assign" -> ((s, dir) =>
      fixedCellAssignment(s, dir)),

    // Embedding-space diversity sampling: nearest-cell assignment (same
    // fixed centroids as sim_ivf_assign) then 4 deterministic reps per
    // cell — dense embedding regions can't dominate the sample
    "sim_diverse_sample" -> ((s, dir) =>
      Curation.diverseSample(fixedCellAssignment(s, dir),
        "vec_id", "cell", perCell = 4)),

    // PQ codes under FIXED codebooks (first-16 subvectors — the same
    // oracle trick as sim_ivf_assign): 64 floats → 8 four-bit codes, a
    // pure narrow expression. The compression substrate of scan-time ANN
    "sim_pq_codes" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cbs = pqCodebooks(s, dir)
      graft.sim.Pq.encode(e, "vec_id", "embedding", cbs)
        .select(col("vec_id"),
          array_join(transform(col("codes"), _.cast("string")), ",").as("codes_csv"))
    }),

    // ADC top-k over the PQ codes: per-query lookup tables ride a
    // broadcast local relation, the corpus side touches ONLY its codes
    // (m lookups + a fold per pair). With fixed codebooks the ADC result
    // is an exact function of the codes — hash-checked even though the
    // search is approximate vs true distance (recall measured in PqSpec)
    "sim_topk_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      // encode-once/probe-many: the flat code table persists per dir
      // (sim_pq_codes hash-checks the encoding itself); each invocation
      // measures the ADC probe over the 8-byte codes
      val codesPath = pqFlatCodePaths.getOrElseUpdate(dir, {
        val p = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_pqflat")).toString
        graft.sim.Pq.encode(e, "vec_id", "embedding", pqCodebooks(s, dir))
          .select(col("vec_id").as("neighbor_id"), col("codes"))
          .write.mode("overwrite").parquet(p)
        p
      })
      graft.sim.Pq.adcTopKFromCodes(s.read.parquet(codesPath), q,
          "vec_id", "embedding", pqCodebooks(s, dir), k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
    }),

    // IVF-PQ, the billion-scale composite: probe the 3 nearest coarse
    // cells per query, ADC re-rank only their members — candidate cost is
    // Σ probed-cell sizes. Fixed centroids + fixed codebooks make the
    // whole composite an exact function of the data (hash-checked)
    "sim_topk_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      // build-once/probe-many: the cell-partitioned code index persists per
      // process; each invocation measures the partition-pruned probe
      val idxPath = pqIndexPaths.getOrElseUpdate(dir, {
        val p = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivfpq")).toString
        graft.sim.Pq.buildCodeIndex(e, "vec_id", "embedding",
          fixedCentroids(s, dir), pqCodebooks(s, dir), p)
        p
      })
      graft.sim.Pq.probeCodeIndex(q, "vec_id", "embedding",
        fixedCentroids(s, dir), pqCodebooks(s, dir), idxPath, nProbe = 3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cell"),
          round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
    }),

    // The SAME IVF-PQ composite served from a log-structured-MAINTAINED
    // code index: the index starts from a perturbed corpus (corrupted
    // vectors, a missing residue class, phantom rows); every invocation
    // applies the converging change batch under a FRESH generation
    // (upserts re-encode and append to their possibly-new cell, id
    // tombstones kill older rows wherever they live), and the probe must
    // match the fresh-build oracle exactly — maintained ≡ rebuilt
    "sim_ivfpq_incr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val phantoms = e.filter(col("vec_id") % 13 === 7)
        .withColumn("vec_id", col("vec_id") + 10000000L)
      val (path, gen) = pqIncrIndexes.getOrElseUpdate(dir, {
        val p = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivfpq_incr")).toString
        val corrupted = e.withColumn("embedding",
          when(col("vec_id") % 13 === 0,
            transform(col("embedding"), x => x + lit(1.0f)))
            .otherwise(col("embedding")))
        graft.sim.Pq.buildCodeIndex(
          corrupted.filter(col("vec_id") % 13 =!= 5).unionByName(phantoms),
          "vec_id", "embedding", fixedCentroids(s, dir), pqCodebooks(s, dir), p)
        (p, new java.util.concurrent.atomic.AtomicLong(0L))
      })
      graft.sim.Pq.updateCodeIndex(path, fixedCentroids(s, dir),
        pqCodebooks(s, dir),
        upserts = e.filter(col("vec_id") % 13 === 0 || col("vec_id") % 13 === 5),
        idCol = "vec_id", vecCol = "embedding",
        deletes = phantoms.select(col("vec_id")), gen = gen.incrementAndGet())
      val q = e.filter(col("vec_id") % 50 === 0)
      graft.sim.Pq.probeCodeIndex(q, "vec_id", "embedding",
        fixedCentroids(s, dir), pqCodebooks(s, dir), path, nProbe = 3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cell"),
          round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
    }),

    // The ANN code index kept fresh under a VECTOR CHANGE STREAM (the
    // bm25_stream shape for the similarity family): a cold index missing a
    // residue class and holding corrupted vectors for another converges
    // through a real readStream (one file per micro-batch, each applied
    // log-structured under its batch id) — and the probe must match the
    // fresh-build oracle
    "sim_ivfpq_stream" -> ((s, dir) => {
      val path = pqIndexPaths.getOrElseUpdate(dir + "#stream", {
        val e = t(s, dir, "embeddings")
        val p = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivfpqs")).toString
        val stale = e.withColumn("embedding",
          when(pmod(col("vec_id"), lit(11)) === 5,
            transform(col("embedding"), x => -x)).otherwise(col("embedding")))
        graft.sim.Pq.buildCodeIndex(
          stale.filter(pmod(col("vec_id"), lit(11)) =!= 4),
          "vec_id", "embedding", fixedCentroids(s, dir), pqCodebooks(s, dir), p)
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_ivfpqs_in")).toString
        e.filter(pmod(col("vec_id"), lit(11)).isin(4, 5))
          .select(col("vec_id"), col("embedding"))
          .repartition(3).write.mode("overwrite").parquet(streamDir)
        val noDeletes = e.filter(lit(false)).select(col("vec_id"))
        val cents = fixedCentroids(s, dir)
        val cbs = pqCodebooks(s, dir)
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.sim.Pq.updateCodeIndex(p, cents, cbs, b.toDF(), "vec_id",
              "embedding", noDeletes, gen = id + 1)
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        p
      })
      val q = t(s, dir, "embeddings").filter(col("vec_id") % 50 === 0)
      graft.sim.Pq.probeCodeIndex(q, "vec_id", "embedding",
        fixedCentroids(s, dir), pqCodebooks(s, dir), path, nProbe = 3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cell"),
          round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
    }),

    // Binary (sign) quantization + exact Hamming top-k: 64 dims pack into
    // two 32-bit sign words, distance is two XOR+popcount ops — approximate
    // only in the REPRESENTATION, so given the packed bits the integer
    // top-k is exact and hash-checked end to end
    "sim_topk_hamming" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      Similarity.hammingTopK(e, q, "vec_id", "embedding", dim = 64, k = 5)
    }),

    // Matryoshka-style two-stage retrieval: coarse rank on the PREFIX 16
    // components (a quarter of the vector bytes cross the corpus-wide
    // pass), exact full-dim re-rank of the 25 survivors — both stages are
    // double dot-products in element order, so the composite hash-checks
    "sim_topk_mrl" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      Similarity.mrlTopK(e, q, "vec_id", "embedding", prefixDim = 16, m = 25, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
    }),

    // Distributed GRAM matrix (the PCA/whitening substrate): Σ_rows x·xᵀ
    // as one exploded aggregate — per-term products quantize to integer
    // micro-units BEFORE the sum (house rule: no float summation whose
    // order could differ), and map-side partial aggregation bounds the
    // shuffle to partitions × 64² keys regardless of corpus size
    "embed_gram" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      e.select(col("embedding").as("__v"),
          posexplode(col("embedding")).as(Seq("i", "__xi")))
        .select(col("i"), col("__xi"),
          posexplode(col("__v")).as(Seq("j", "__xj")))
        .groupBy(col("i"), col("j"))
        .agg(sum(floor(col("__xi").cast("double") * col("__xj") * 1e6)
          .cast("long")).as("g_micro"))
    }),

    // Embedding-cosine near-dup pairs (brute-force exact baseline; the LSH
    // scale path is Similarity.cosineNearDupPairs, approximate by design)
    "embed_cos_neardup" -> ((s, dir) =>
      Similarity.bruteForcePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))),

    // SemDeDup-style cell-scoped near-dup (Abbas et al. 2023): exact cosine
    // pairs only WITHIN each embedding cluster cell — Σ|cell|² instead of
    // corpus², one equi-join exchange on the cell key. Same fixed-centroid
    // assignment the sim_ivf_assign oracle re-derives.
    "embed_neardup_cell" -> ((s, dir) =>
      Similarity.cellScopedPairs(fixedCellAssignment(s, dir),
        t(s, dir, "embeddings"), "vec_id", "embedding", "cell", threshold = 0.4)
        .select(col("id_a"), col("id_b"), col("cell"),
          round(col("cosine"), 6).as("cosine"))),

    // Embedding near-dup via LSH buckets — the scale path (approximate:
    // cross-bucket pairs are missed; every returned pair is exact-verified).
    // md5 hyperplane family ⇒ the bucket partition and therefore the pair
    // set are an exact function of the data — hash-checked against an
    // oracle re-deriving the buckets (xxhash64 cosineNearDupPairs stays the
    // throughput default, recall-pinned in DedupSimSpec)
    "embed_cos_neardup_lsh" -> ((s, dir) =>
      // 2^3 buckets: sized for the test corpora (single-table collision P
      // at cosine 0.45 is ~(1-θ/π)^nBits ≈ 0.27, so tiny nBits keeps the
      // driver's check meaningful); at scale raise nBits with corpus size
      // and union multiple tables for recall
      Similarity.cosineNearDupPairsMd5(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.45, nBits = 3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))),

    // Text statistics: token count, mean token length, punctuation ratio,
    // content fingerprint
    // HTML → text extraction (the WET step between WARC ingestion and
    // every text gate): each doc is wrapped into a deterministic page —
    // title, style + script SUBTREES (whose content must vanish
    // wholesale, incl. a raw '<' inside the script that would derail a
    // tag-only strip), nav/footer boilerplate, and the entity-escaped
    // body — then cleaned by the pure-expression htmlExtract chain
    // (subtree drops → tag strip → entity decode with &amp; LAST →
    // whitespace collapse). The oracle builds the same page and replays
    // the identical RE2-safe chain, so any ordering or greediness slip
    // hash-mismatches
    "text_html_extract" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.htmlExtract(
          htmlPage(col("doc_id"), col("text"))).as("clean_text"))),

    // Boilerplate/content BLOCK classification (jusText-core) — the step
    // after tag stripping that text_html_extract deliberately does NOT
    // do: the page splits at block-level tag boundaries, each block is
    // cleaned and scored by length + link density (10·|link| ≤ 3·|clean|,
    // all-integer), and the nav/footer/title chrome drops while the body
    // paragraph survives. Pure expression chain end to end; the oracle
    // replays the identical split/clean/classify over the same page
    "text_html_content" -> ((s, dir) => {
      val blocks = graft.text.TextFunctions.htmlBlocks(
        htmlPage(col("doc_id"), col("text")))
      t(s, dir, "documents")
        .select(col("doc_id"), blocks.as("__bs"))
        .select(col("doc_id"),
          size(col("__bs")).as("n_blocks"),
          (size(col("__bs")) - size(filter(col("__bs"),
            graft.text.TextFunctions.isContentBlock(_)))).as("n_boiler"),
          graft.text.TextFunctions.htmlContentText(col("__bs"))
            .as("content_text"))
    }),

    // RFC 3986-lite URL normalization — the crawl pipeline's first,
    // cheapest dedup key: five deterministic spellings of the same page
    // URL (cased host, default port, tracking params, fragment, unsorted
    // params) collapse to one canonical form. Pure RE2-safe expression
    // chain; the oracle replays the identical parse/fold/sort
    "url_normalize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), messyUrl(col("doc_id")).as("url"))
        .select(col("doc_id"), col("url"),
          graft.text.TextFunctions.urlNormalize(col("url")).as("url_norm"))),

    // OUTLINK extraction → normalization → DOMAIN-ROLLED LINK GRAPH:
    // each doc's page carries 1..4 anchors whose hrefs arrive in messy
    // spellings (cased host + default port, tracking params) and target
    // subdomains of multi-label-suffix sites — the query extracts hrefs
    // with the attr regex, normalizes each, and KEYS the in-degree
    // aggregation on the REGISTRABLE domain (pinned public-suffix
    // table), so blog.siteN.co.uk and www.siteN.co.uk roll up to one
    // row: the per-site edge build real link analysis runs. Still one
    // shuffle. The oracle derives the same edges from the fixture
    // arithmetic and replays the same suffix table
    "web_link_graph" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(regexp_extract_all(htmlLinkPage(col("doc_id")),
            lit("(?i)<a[^>]*href=\"([^\"]*)\""), lit(1))).as("__href"))
        .select(col("doc_id"),
          graft.text.TextFunctions.urlNormalize(col("__href")).as("dst_url"))
        .select(col("doc_id"), col("dst_url"),
          regexp_extract(col("dst_url"), "^https://([^/?]*)", 1)
            .as("__host"))
        .select(col("doc_id"), col("dst_url"),col("__host"),
          graft.text.PublicSuffix.registrableDomain(col("__host"))
            .as("dst_domain"))
        .groupBy(col("dst_domain"))
        .agg(count(lit(1)).as("n_inlinks"),
          countDistinct(col("__host")).as("n_hosts"),
          countDistinct(col("dst_url")).as("n_urls"),
          min(col("doc_id")).as("first_src"))),

    // Per-DOMAIN corpus rollup — the crawl data card's first table:
    // REGISTRABLE domain (eTLD+1 via the pinned public-suffix table)
    // from the normalized URL, doc and distinct-host counts per domain.
    // Hosts arrive cased with default ports and include multi-label
    // suffixes (co.uk, com.au, github.io) — a raw last-two-labels key
    // would wrongly pool every .co.uk site into one row
    "url_domain_stats" -> ((s, dir) => {
      val host = regexp_extract(
        graft.text.TextFunctions.urlNormalize(messyHostUrl(col("doc_id"))),
        "^https://([^/]*)/", 1)
      t(s, dir, "documents")
        .select(col("doc_id"), host.as("__host"))
        .select(col("doc_id"), col("__host"),
          graft.text.PublicSuffix.registrableDomain(col("__host"))
            .as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("__host")).as("n_hosts"))
    }),

    // URL-key dedup over the WARC records' URLs: splittable ingestion →
    // messy-URL fixture → normalize → first-occurrence per canonical URL
    // (min doc_id + dup count) — the single-shuffle shape every crawl
    // pipeline runs before any content hash is computed
    "dedup_url" -> ((s, dir) => {
      val staged = warcStagedDir(s, dir)
      graft.sources.WarcSource.read(s, staged, splitBytes = 64L * 1024)
        .select(expr("CAST(substring_index(url, '/', -1) AS BIGINT)")
          .as("doc_id"))
        .select(col("doc_id"), graft.text.TextFunctions.urlNormalize(
          messyUrl(col("doc_id"))).as("url_norm"))
        .groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("first_doc"),
          count(lit(1)).as("n_docs"))
    }),

    // The CRAWL-TO-CORPUS FUNNEL end-to-end — the composition a web-scale
    // training pipeline actually runs: .warc.gz shards (member-per-record
    // gzip, staged once per dir with the HTML pages as record payloads)
    // → splittable two-layer WARC decode → block-level boilerplate
    // classification (htmlBlocks: the nav/footer/title chrome DROPS here,
    // with the funnel counting the dropped blocks) → language-ID +
    // quality gates over the CONTENT text → per-doc keep decision. The
    // oracle rebuilds the page, replays the identical block chain, and
    // applies the same gate arithmetic to the content column
    "pipeline_web" -> ((s, dir) => {
      import s.implicits._
      val staged = warcHtmlStageDirs.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_warc_html")).toString
        t(s, dir, "documents")
          .repartition(4, pmod(col("doc_id"), lit(4L)))
          .select(col("doc_id").cast("long"),
            encode(htmlPage(col("doc_id"), col("text")), "UTF-8").as("__b"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            // response payloads are full HTTP/1.1 messages, the way a
            // real crawler records them: charset declared in the header
            // for even ids (odd ids ride the fallback — the page bytes
            // are ASCII, so the funnel output is charset-invariant),
            // chunked framing for every 5th doc
            val recs = it.map { case (id, b) =>
              val ct = if (id % 2 == 0) "text/html; charset=utf-8"
                       else "text/html"
              val http = graft.sources.Http.responseBytes(200, "OK",
                Seq("Content-Type" -> ct, "Server" -> "graft/1.0"), b,
                chunkSize = if (id % 5 == 0) 257 else 0)
              (s"https://corpus.example/doc/$id", "2026-01-01T00:00:00Z",
                "application/http; msgtype=response",
                s"<urn:uuid:doc-$id>", http)
            }.toSeq
            if (recs.nonEmpty) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              java.nio.file.Files.write(
                java.nio.file.Paths.get(d, f"part-$pid%04d.warc.gz"),
                graft.sources.Warc.writeGz(recs))
            }
            Iterator.single(1)
          }.count()
        d
      })
      // splittable ingestion (WarcSource, as fmt_warc_roundtrip): offset
      // index once per dir, then byte-range tasks — never whole-blob;
      // readHttp fuses the HTTP split + charset detect + decode into the
      // same range task, so the funnel sees TEXT, not wire bytes
      val blocks = graft.sources.WarcSource.readHttp(s, staged,
          splitBytes = 64L * 1024)
        .select(
          expr("CAST(substring_index(url, '/', -1) AS BIGINT)").as("doc_id"),
          graft.text.TextFunctions.htmlBlocks(col("text")).as("__bs"))
      val clean = blocks.select(col("doc_id"),
        size(col("__bs")).as("n_blocks"),
        (size(col("__bs")) - size(filter(col("__bs"),
          graft.text.TextFunctions.isContentBlock(_)))).as("n_boiler"),
        graft.text.TextFunctions.htmlContentText(col("__bs")).as("__clean"))
      clean.select(col("doc_id"), col("n_blocks"), col("n_boiler"),
          length(col("__clean")).as("clean_chars"),
          graft.text.TextFunctions.langId(col("__clean")).as("lang_pred"),
          round(graft.text.TextFunctions.qualityScore(col("__clean")), 2)
            .as("quality"))
        .withColumn("kept",
          col("lang_pred") === "en" && col("quality") >= lit(0.6))
    }),

    // HTTP-message extraction over the mixed-record crawl fixture — the
    // decode a real Common Crawl response record needs: tolerant record
    // walk past the warcinfo/request/revisit records, then status line /
    // headers / body split (Content-Length AND chunked framing both
    // live in the fixture) and the charset resolution chain (header
    // param for even ids, windows-1252 fallback for odd — the fixture
    // pages carry no meta tag). The oracle re-derives status, reason,
    // header count, charset decision, and the body's md5 from the
    // documents arithmetic alone
    "warc_http_extract" -> ((s, dir) => {
      val staged = warcMixedStagedDir(s, dir)
      graft.sources.WarcSource.readHttp(s, staged, splitBytes = 64L * 1024)
        .select(
          expr("CAST(substring_index(url, '/', -1) AS BIGINT)").as("doc_id"),
          col("http_status"), col("http_reason"), col("n_headers"),
          col("http_content_type").as("content_type_hdr"),
          col("charset"), col("charset_src"),
          length(col("body")).cast("long").as("body_bytes"),
          md5(col("body")).as("body_md5"))
    }),

    // Record-type survey over the same mixed shards — the scan-cost
    // census (mm_format_survey discipline) a crawl audit runs before
    // deciding what to decode: every record classified and counted,
    // none thrown
    "warc_type_survey" -> ((s, dir) => {
      val staged = warcMixedStagedDir(s, dir)
      graft.sources.WarcSource.readAll(s, staged, splitBytes = 64L * 1024)
        .groupBy(col("warc_type"))
        .agg(count(lit(1)).as("n_records"),
          count(col("url")).as("n_with_url"))
    }),

    // WAT-style sidecar → LINK GRAPH: the JSON metadata records (one
    // per doc, carrying url + raw outlink hrefs) are read back through
    // the tolerant source, parsed with from_json, and rolled into the
    // SAME domain-keyed link graph the HTML extraction path builds —
    // the query shares web_link_graph's oracle verbatim, so the sidecar
    // provably carries exactly the extraction (two wire formats, one
    // truth)
    "wat_link_graph" -> ((s, dir) => {
      val staged = watStagedDir(s, dir)
      val schema = "url STRING, links ARRAY<STRING>"
      graft.sources.WarcSource.readAll(s, staged, splitBytes = 64L * 1024)
        .filter(col("warc_type") === "metadata")
        .select(from_json(decode(col("payload"), "UTF-8"),
          org.apache.spark.sql.types.StructType.fromDDL(schema)).as("__j"))
        .select(
          expr("CAST(substring_index(__j.url, '/', -1) AS BIGINT)")
            .as("doc_id"),
          explode(col("__j.links")).as("__href"))
        .select(col("doc_id"),
          graft.text.TextFunctions.urlNormalize(col("__href")).as("dst_url"))
        .select(col("doc_id"), col("dst_url"),
          regexp_extract(col("dst_url"), "^https://([^/?]*)", 1)
            .as("__host"))
        .select(col("doc_id"), col("dst_url"), col("__host"),
          graft.text.PublicSuffix.registrableDomain(col("__host"))
            .as("dst_domain"))
        .groupBy(col("dst_domain"))
        .agg(count(lit(1)).as("n_inlinks"),
          countDistinct(col("__host")).as("n_hosts"),
          countDistinct(col("dst_url")).as("n_urls"),
          min(col("doc_id")).as("first_src"))
    }),

    // robots.txt politeness gate over the crawl frontier: per-host
    // robots TEXT (with a host-varied extra rule) is PARSED by the
    // engine into a rules table, then every URL is judged by RFC 9309
    // longest-prefix-match with Allow winning ties and default-allow —
    // broadcast join + one verdict fold. The oracle derives the
    // expected verdicts INDEPENDENTLY from the residue arithmetic (it
    // never replays the parser), so a parse or ranking slip anywhere
    // hash-mismatches
    "url_robots_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(7L)).as("__h"),
          pmod(col("doc_id"), lit(5L)).as("__p"))
      val path = when(col("__p") === 0,
          concat(lit("/page/"), col("doc_id")))
        .when(col("__p") === 1, concat(lit("/private/p"), col("doc_id")))
        .when(col("__p") === 2,
          concat(lit("/private/pub/q"), col("doc_id")))
        .when(col("__p") === 3, concat(lit("/tmp/t"), col("doc_id")))
        .otherwise(lit("/"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://site"), col("__h"), lit(".com"), path)
          .as("url"))
      val robots = docs.select(col("__h")).distinct()
        .select(concat(lit("site"), col("__h"), lit(".com")).as("host"),
          concat(
            lit("User-agent: *\nDisallow: /private/\n" +
              "Allow: /private/pub/\nDisallow: /tmp/\n"),
            when(pmod(col("__h"), lit(2L)) === 0,
              lit("Disallow: /page/\n")).otherwise(lit("")))
            .as("robots_txt"))
      graft.text.Robots.filterUrls(urls, robots)
    }),

    // Shard-health census over a crawl dir where one shard is
    // EOF-truncated (a crawler died mid-write, the most common damage
    // in a real crawl bucket): the tolerant walk counts every COMPLETE
    // member and reports the torn-tail offset instead of killing the
    // scan — while mid-file CRC damage still throws by name. The
    // oracle re-derives each shard's surviving record count from the
    // residue arithmetic (shard 1 loses exactly its final member)
    "warc_torn_survey" -> ((s, dir) => {
      val staged = warcTornStagedDir(s, dir)
      graft.sources.WarcSource.tornSurvey(s, staged)
        .select(
          regexp_extract(col("path"), "part-(\\d+)", 1).cast("int")
            .as("shard"),
          col("n_members").as("n_records"),
          col("torn_offset").isNotNull.as("torn"))
    }),

    // Charset-aware HTML decode over the legacy-charset fixture: bodies
    // arrive encoded in utf-8 / windows-1252 / iso-8859-1 with the
    // declaration in the HTTP header, a meta tag, or absent (fallback).
    // Each marker decodes correctly ONLY under its true charset (0x80
    // is € in cp1252, malformed in utf-8), so the md5 of the decoded
    // text — recomputed by DuckDB from codepoint arithmetic — catches
    // any wrong-table decode that would silently poison lang-ID,
    // quality, and dedup keys downstream
    "text_html_charset" -> ((s, dir) => {
      val staged = warcCharsetStagedDir(s, dir)
      graft.sources.WarcSource.readHttp(s, staged, splitBytes = 64L * 1024)
        .select(
          expr("CAST(substring_index(url, '/', -1) AS BIGINT)").as("doc_id"),
          col("charset"), col("charset_src"),
          length(col("text")).cast("long").as("n_chars"),
          md5(encode(col("text"), "UTF-8")).as("text_md5"))
    }),

    // WET-style sidecar round trip: the funnel's extracted CONTENT text
    // written back as member-per-record `conversion` records (the
    // interchange shape the crawl ecosystem consumes) and re-read
    // through the splittable source; the digest compares md5/length per
    // doc against DuckDB's replay of the same content chain
    "fmt_wet_roundtrip" -> ((s, dir) => {
      val staged = wetStagedDir(s, dir)
      graft.sources.WarcSource.readAll(s, staged, splitBytes = 64L * 1024)
        .filter(col("warc_type") === "conversion")
        .select(
          expr("CAST(substring_index(url, '/', -1) AS BIGINT)").as("doc_id"),
          col("warc_type"),
          length(col("payload")).cast("long").as("content_length"),
          md5(col("payload")).as("payload_md5"))
    }),

    "text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextFunctions.meanTokenLen(col("text")), 6).as("mean_token_len"),
        round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))),

    // Language-ID heuristic
    "text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"))),

    // Quality score
    "text_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 2).as("quality"))),

    // TRAINED quality probe: exact closed-form least squares of an
    // en/not-en pseudo-label on (token count, stopword hits) — train once
    // per dir (one 9-moment aggregate + BigInt Cramer on the driver),
    // serve weights / per-doc scores / the induced filter's confusion
    // matrix. All-integer end to end (graft.text.Probe).
    "quality_probe_weights" -> ((s, dir) =>
      graft.text.Probe.weightsFrame(s, probeModel(s, dir))),
    "quality_probe_score" -> ((s, dir) =>
      graft.text.Probe.score(t(s, dir, "documents"), probeModel(s, dir),
        "text", "doc_id")),
    "quality_probe_eval" -> ((s, dir) =>
      graft.text.Probe.confusion(graft.text.Probe.score(
        t(s, dir, "documents"), probeModel(s, dir), "text", "doc_id"))),

    // Probe calibration table: the observed score range in 10 bands,
    // observed positive rate per band — the reliability report that
    // re-picks the filter threshold when the corpus shifts; the range is
    // one min/max aggregate broadcast back (events_rfm pattern), integer
    // bucketing + truncating nano rates, exact cross-engine
    "quality_probe_calibration" -> ((s, dir) =>
      graft.text.Probe.calibration(graft.text.Probe.score(
        t(s, dir, "documents"), probeModel(s, dir), "text", "doc_id"))),

    // MAINTAINED probe training: the nine moments are abelian integer
    // sums, so model state folds create/update/delete batches exactly —
    // bootstrap (base ∪ phantoms), then +delta −phantoms must equal the
    // one-shot retrain bit for bit (same oracle as quality_probe_weights).
    // The 100 TB shape: a model refresh touches ONLY the delta batch
    "quality_probe_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val phantoms = docs.filter(col("doc_id") % 7 === 1)
        .withColumn("text", concat(col("text"), lit(" zzzphantom")))
      val boot = graft.text.Probe.moments(
        docs.filter(col("doc_id") % 3 =!= 0).unionByName(phantoms),
        "text", "doc_id")
      val maintained = boot +
        graft.text.Probe.moments(docs.filter(col("doc_id") % 3 === 0),
          "text", "doc_id") -
        graft.text.Probe.moments(phantoms, "text", "doc_id")
      graft.text.Probe.weightsFrame(s, graft.text.Probe.solve(maintained))
    }),

    // STREAM-maintained probe training: drain the corpus as a real file
    // stream, fold each micro-batch's distributed moment aggregate into
    // the 9-long model state (control data), solve once at the end —
    // must equal the batch retrain (same oracle). Only the staged INPUT
    // files are cached per dir (fixture creation); every invocation runs
    // a full live drain — the same measurement discipline as the other
    // *_stream queries (a bench repeat measures real stream-maintenance
    // work, not a weights-cache hit)
    "quality_probe_stream" -> ((s, dir) => {
      val streamDir = probeStreamStage.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_probe_in")).toString
        t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
          .repartition(4).write.mode("overwrite").parquet(d)
        d
      })
      var acc = graft.text.Probe.Moments(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      var lastId = -1L
      val q = s.readStream.schema(s.read.parquet(streamDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir)
        .writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (id > lastId) { // exactly-once fold on replay
            acc = acc + graft.text.Probe.moments(b.toDF(), "text", "doc_id")
            lastId = id
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.text.Probe.weightsFrame(s, graft.text.Probe.solve(acc))
    }),

    // Rolling-hash document fingerprint (xxhash64-based — rows-only)
    // Rolling document fingerprint — the md5-chain variant is re-derivable
    // in the oracle engine (list_reduce fold), so the whole chain is
    // hash-checked; the xxhash64 chain stays the throughput path
    "text_rolling_hash" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.rollingHashMd5(col("text")).as("rhash"))),

    // BPE-ish subword token count (RE2-safe pattern — the oracle runs the
    // same regex verbatim)
    "text_subword_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        size(TextFunctions.subwordTokens(col("text"))).cast("long").as("n_subwords"))),

    // Hashing-trick featurizer: 16 signed token-count buckets per doc
    // (bucket and sign from md5 nibbles) — the no-model text embedding
    // for cheap clustering / near-dup / probe features. One md5 per
    // token + integer filters: a pure narrow codegen projection,
    // all-integer output, exact oracle
    "text_feature_hash" -> ((s, dir) =>
      Curation.hashFeatures(t(s, dir, "documents"), "text", "doc_id")),

    // Multimodal: binary blobs + typed metadata
    "mm_meta" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      Multimodal.withMeta(blobs, "blob", "image", "utf8")
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
          col("meta.checksum").as("checksum"))
    }),

    // Multimodal: partition-batched decode → feature rows (stub decoder)
    "mm_decode" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      Multimodal.decodeFeatures(blobs, "doc_id", "blob")
        .select(col("doc_id"), col("byte_len"), col("dim1"), col("dim2"))
    }),

    // REAL container decode: each doc's UTF-8 bytes (even-truncated — PCM
    // frames are 2 bytes) wrapped into an actual RIFF/WAVE container (fmt
    // + JUNK + data chunks, built as binary-concat expressions inside
    // codegen), then parsed back by the pure-JVM chunk-walking 16-bit-PCM
    // WAV decoder (Multimodal.Wav — the decode seam's first real
    // implementation; the JUNK chunk forces genuine chunk walking). The
    // decoded sample statistics are exact integers, so the oracle
    // recomputes them from the same bytes
    "mm_decode_wav" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__pcm",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 2))"))
        .withColumn("blob", Multimodal.wavBlob(col("__pcm"),
          sampleRate = 8000, channels = 1))
      Multimodal.decodeWav(blobs, "doc_id", "blob")
    }),

    // The decode seam under Structured Streaming: images ARRIVE as a
    // stream (4 parquet files, maxFilesPerTrigger=1 → a real multi-batch
    // drain), each micro-batch encodes + decodes its blobs through the
    // same 4:2:0 restart-marked path as mm_decode_jpeg420, and the
    // decoded features land in a per-batch-id sink directory (overwrite →
    // redelivery-idempotent; nothing corpus-scale touches the driver).
    // Same oracle as the batch query: stream-decode ≡ batch-decode,
    // proven by the gate
    "mm_decode_stream" -> ((s, dir) => {
      val streamDir = mmStreamStage.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_mm_in")).toString
        t(s, dir, "documents")
          .withColumn("__b0",
            expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
          .withColumn("__b",
            expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
          .filter(length(col("__b")) >= 4)
          .select(col("doc_id"), col("__b"))
          .repartition(4).write.mode("overwrite").parquet(d)
        d
      })
      val outDir = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_mm_out")).toString
      val q = s.readStream.schema(s.read.parquet(streamDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir)
        .writeStream
        .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          Multimodal.decodeJpegColor(
              Multimodal.jpeg420Blob(b.toDF(), "doc_id", "__b",
                restartEvery = 3), "doc_id", "blob")
            .write.mode("overwrite").parquet(s"$outDir/b$id")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$outDir/*")
    }),

    // REAL G.711 μ-law decode (WAV format tag 7) — what telephony audio
    // actually ships as: every payload byte is one companded sample,
    // expanded with the standard complement + segment/mantissa integer
    // arithmetic the oracle replays per byte
    "mm_decode_mulaw" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("blob", Multimodal.wavG711Blob(col("__b"),
          sampleRate = 8000, channels = 1, mulaw = true))
      Multimodal.decodeWav(blobs, "doc_id", "blob")
    }),

    // REAL IMA ADPCM decode (WAV format tag 0x11) — the seam's first
    // COMPRESSED audio codec: the payload bytes are the raw nibble
    // stream, split into 12-byte blocks whose 4-byte headers (predictor
    // 0, step index 0) each emit sample 0, then every nibble steps the
    // predictor through the published step/index tables with clamping at
    // ±32767/[0,88]. Exact integer statistics; the oracle replays the
    // identical per-nibble recurrence in a recursive CTE over the same
    // bytes — a decoder that mis-ordered nibbles, missed a clamp, or
    // broke a block boundary hash-mismatches
    "mm_decode_adpcm" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
      Multimodal.decodeWav(
        Multimodal.wavAdpcmBlob(blobs, "doc_id", "__b",
          sampleRate = 8000, blockAlign = 12), "doc_id", "blob")
    }),

    // EXIF SURVEY — the image-side governance pass: every JPEG gains a
    // REAL APP1/TIFF-IFD block (byte order alternating II/MM per doc,
    // out-of-line ASCII values so the offset arithmetic is load-bearing,
    // a GPS sub-IFD on every 3rd image — the privacy flag a release gate
    // counts BEFORE training on crawl images; every 5th image stays
    // EXIF-free, and absence is data, not an error). The decoder walks
    // the marker stream to APP1, parses BOTH endiannesses, reads inline
    // SHORTs and offset ASCII, and follows the GPS pointer; the oracle
    // re-derives every field from doc_id arithmetic
    "mm_exif_survey" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 64)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeExif(
        Multimodal.exifTagged(
          Multimodal.jpegBlob(px, "doc_id", "__b"), "doc_id", "blob"),
        "doc_id", "blob")
    }),

    // MP3-class audio survey — the dominant real-crawl audio container,
    // the last named audio absence (PLANS.md round 12 records the
    // measured-share decision: HEADER WALK implemented — frame count,
    // samplerate, CBR/VBR, peak bitrate, frame-exact duration, ID3
    // presence, the audio data-card fields — PCM synthesis the recorded
    // rejection). The walker validates every frame's sync/version/layer,
    // strides by the spec's 144·bitrate/samplerate(+padding) length, and
    // skips ID3v2 by its syncsafe size; the oracle re-derives every
    // output from the fixture's doc_id arithmetic
    "mm_mp3_survey" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 64)"))
      Multimodal.decodeMp3Survey(
        Multimodal.mp3Blob(px, "doc_id", "__b"), "doc_id", "blob")
    }),

    // REAL FLAC decode — the seam's LOSSLESS compressed audio codec:
    // sample i is exactly payload byte i − 128, but the wire format
    // cycles VERBATIM → FIXED(1) with two Rice partitions → FIXED(2)
    // with escape-coded residuals → LPC(2) across frames, so
    // reconstructing the bytes requires real Rice decoding, inverse
    // prediction against three different predictors, UTF-8 frame
    // numbers, and CRC-8/CRC-16 verification on every frame. Exact
    // integer statistics; the oracle recomputes them from the bytes
    "mm_decode_flac" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
      Multimodal.decodeFlac(
        Multimodal.flacBlob(blobs, "doc_id", "__b",
          sampleRate = 8000, blockSize = 64), "doc_id", "blob")
    }),

    // REAL G.711 A-law decode (WAV format tag 6): XOR-0x55 companding,
    // linear segment 0, inverted sign convention vs μ-law
    "mm_decode_alaw" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("blob", Multimodal.wavG711Blob(col("__b"),
          sampleRate = 8000, channels = 1, mulaw = false))
      Multimodal.decodeWav(blobs, "doc_id", "blob")
    }),

    // REAL image decode: each doc's UTF-8 bytes (truncated to whole
    // 15-byte rows) wrapped into an actual bottom-up 24-bit BMP — file
    // header, BITMAPINFOHEADER, and 4-byte-stride row padding, built as
    // binary-concat expressions — then parsed back by the pure-JVM BMP
    // decoder (Multimodal.Bmp, the decode seam's real IMAGE
    // implementation). width 5 forces a nonzero row pad, so a parser that
    // ignores BMP's stride reads shifted channels; topleft_hex witnesses
    // the bottom-up row order. All-integer stats — exact oracle
    "mm_decode_bmp" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 15))"))
        .withColumn("blob", Multimodal.bmpBlob(col("__px"), width = 5))
      Multimodal.decodeBmp(blobs, "doc_id", "blob")
    }),

    // REAL compressed-image decode — the decode seam's first COMPRESSED
    // format (WAV/BMP/MP4 walk uncompressed containers): each doc's UTF-8
    // bytes (whole 15-byte rows; docs under one row excluded — PNG
    // requires positive dims) wrapped into an actual baseline PNG whose
    // encoder cycles ALL FIVE row filters (None/Sub/Up/Average/Paeth) and
    // splits the zlib stream across IDAT chunks, then decoded back by the
    // pure-JVM parser (Inflater + unfilter + per-chunk CRC-32). The oracle
    // re-derives every pixel from the text, so a decode that fails to
    // invert the real deflate stream or any filter type hash-mismatches
    "mm_decode_png" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 15))"))
        .filter(length(col("__px")) >= 15)
      Multimodal.decodePng(
        Multimodal.pngBlob(px, "doc_id", "__px", width = 5), "doc_id", "blob")
    }),

    // REAL Adam7-INTERLACED PNG decode — the progressive-rendering layout
    // a real crawl contains: the SAME pixels as mm_decode_png but stored
    // as seven independently-filtered pass sub-images on the spec grid,
    // so the decoder must walk a genuinely different scanline geometry
    // (per-pass filter resets, pass-dependent row lengths, empty passes
    // contributing nothing). The oracle is pixel-set identical to the
    // sequential query's — interlacing changes storage, not pixels —
    // which is exactly what makes the equality a decode proof
    "mm_decode_png_interlaced" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 15))"))
        .filter(length(col("__px")) >= 15)
      Multimodal.decodePng(
        Multimodal.pngInterlacedBlob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // No-decode FORMAT SURVEY over a DECLARED mix — the production
    // pre-pass that measures the decode seam's reject rate before
    // spending decode cycles: blobs are classified structurally (JPEG SOF
    // kind + component count, PNG IHDR depth/interlace, container magics)
    // and counted by (format, decodable). The mix covers accepted classes
    // (baseline JPEG gray + 4:2:0, sequential + Adam7 PNG, REAL 16-bit
    // PNG — decodable since the depth-16 branch landed — and REAL FLAC
    // audio) and the two
    // named rejection classes (COLOR progressive JPEG at 4:1:1 —
    // gray/4:4:4/4:2:0/4:2:2 progressive decode for real — grayscale
    // PNG, and ARITHMETIC-coded JPEG: SOF10 rejected by name — the
    // measured-share input to the implement/reject decision recorded in
    // PLANS.md); the oracle re-derives every count from doc_id alone
    "mm_format_survey" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__k", pmod(col("doc_id"), lit(10L)))
      def slice(k: Int) = docs.filter(col("__k") === k)
      val gray = Multimodal.jpegBlob(
        slice(0).filter(length(col("__b0")) >= 1), "doc_id", "__b0")
      val j420 = Multimodal.jpeg420Blob(slice(1)
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4), "doc_id", "__b", restartEvery = 3)
      def pngPx(k: Int) = slice(k)
        .withColumn("__px",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 15))"))
        .filter(length(col("__px")) >= 15)
      val png = Multimodal.pngBlob(pngPx(2), "doc_id", "__px", width = 5)
      val adam = Multimodal.pngInterlacedBlob(pngPx(3), "doc_id", "__px", width = 5)
      val prog = slice(4).select(col("doc_id"),
        lit(Multimodal.ProgressiveJpegStub).as("blob"))
      val p16 = Multimodal.png16Blob(slice(5)
        .withColumn("__px",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 30))"))
        .filter(length(col("__px")) >= 30), "doc_id", "__px", width = 5)
      val pgray = slice(6).select(col("doc_id"),
        lit(Multimodal.PngGrayStub).as("blob"))
      val arith = slice(7).select(col("doc_id"),
        lit(Multimodal.ArithmeticJpegStub).as("blob"))
      val flac = Multimodal.flacBlob(slice(8)
        .filter(length(col("__b0")) >= 1), "doc_id", "__b0")
      val mp3 = Multimodal.mp3Blob(slice(9), "doc_id", "__b0")
      val mix = Seq(gray, j420, png, adam, prog, p16, pgray, arith, flac,
        mp3)
        .map(_.select(col("doc_id"), col("blob"))).reduce(_.unionByName(_))
      Multimodal.formatSurvey(mix, "doc_id", "blob")
        .groupBy(col("format"), col("decodable"))
        .agg(count(lit(1)).as("n"))
    }),

    // REAL palette-PNG decode (color type 3) — the layout of most web
    // graphics: payload bytes become palette INDICES into a deterministic
    // 256-entry PLTE the oracle re-derives arithmetically; the decoder
    // walks chunk CRCs, inflates, unfilters a 1-byte-per-pixel plane
    // (filter arithmetic at bpp=1, different from truecolor's 3), and
    // looks every index up in the palette
    "mm_decode_png_palette" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 5))"))
        .filter(length(col("__px")) >= 5)
      Multimodal.decodePng(
        Multimodal.pngPaletteBlob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // REAL 16-BIT truecolor PNG decode (depth 16, color type 2 — the
    // HDR/scientific layout, formerly a named rejection class): payload
    // bytes become big-endian 16-bit samples, 6 bytes per pixel; the
    // decoder unfilters at the WIDE byte stride (filter offset 6, spec
    // §9) and sums full 0..65535 sample values. Shares the PNG
    // pixel-stat oracle shape; the oracle re-derives each 16-bit sample
    // as 256·hi + lo from the text bytes
    "mm_decode_png16" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 30))"))
        .filter(length(col("__px")) >= 30)
      Multimodal.decodePng(
        Multimodal.png16Blob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // REAL GRAYSCALE PNG decode (color type 0) — formerly the image
    // seam's last named rejection class, closed by the png16 precedent:
    // one byte per pixel, the narrowest filter geometry (bpp=1 left
    // distances), the one sample feeding all three stat channels
    "mm_decode_png_gray" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 5))"))
        .filter(length(col("__px")) >= 5)
      Multimodal.decodePng(
        Multimodal.pngGrayBlob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // REAL GRAY+ALPHA PNG decode (color type 4): 2-byte pixels, alpha
    // summed as its own exact channel at the bpp=2 filter stride
    "mm_decode_png_graya" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 10))"))
        .filter(length(col("__px")) >= 10)
      Multimodal.decodePngRgba(
        Multimodal.pngGrayAlphaBlob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // REAL RGBA-PNG decode (color type 6): 4-byte pixels, alpha summed
    // as its own exact channel; the 4-bpp filter offsets and the extra
    // plane width exercise a distinct unfilter geometry
    "mm_decode_png_rgba" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 20))"))
        .filter(length(col("__px")) >= 20)
      Multimodal.decodePngRgba(
        Multimodal.pngRgbaBlob(px, "doc_id", "__px", width = 5),
        "doc_id", "blob")
    }),

    // REAL baseline JPEG decode — the seam's second compressed format.
    // JPEG is lossy, so the fixture encoder emits DC-ONLY grayscale
    // blocks whose dequantized DC is (b-128)*8 for payload byte b: the
    // IDCT of such a block is EXACTLY flat at b (zero rounding error), so
    // the oracle recomputes every pixel from the text while the decoder
    // still runs the full real pipeline — segment walk, canonical Huffman
    // from DHT, byte-unstuffing, DC prediction with sign extension,
    // zigzag dequantization, 2-D IDCT. One block per byte (width 8,
    // height 8n); payloads truncate to 2048 bytes, empty docs excluded
    "mm_decode_jpeg" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeJpeg(
        Multimodal.jpegBlob(px, "doc_id", "__b"), "doc_id", "blob")
    }),

    // REAL PROGRESSIVE JPEG decode — the format most of a real crawl's
    // JPEGs use: the SAME flat DC-only blocks as mm_decode_jpeg, sent as
    // a true SOF2 four-scan progression (DC first at Al=1, AC first over
    // band 1..63 with cross-block EOBn runs, DC refinement bits, AC
    // refinement with correction bits) and decoded by the full T.81 G.2
    // successive-approximation algorithm. The oracle is byte-identical to
    // mm_decode_jpeg's — progressive changes the wire format, not the
    // pixels — so the equality proves the multi-scan decode
    "mm_decode_jpeg_progressive" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeJpeg(
        Multimodal.jpegProgressiveBlob(px, "doc_id", "__b"), "doc_id", "blob")
    }),

    // REAL baseline COLOR JPEG decode — full 3-component 4:4:4 YCbCr:
    // interleaved MCUs, per-component quant + Huffman tables (the chroma
    // tables use different code lengths, so table mis-selection would
    // desync, not drift), three DC predictors, and the 16-bit fixed-point
    // BT.601 conversion real decoders use. The fixture derives NON-neutral
    // flat chroma from each payload byte (Cb = 128 + b%9−4, Cr = 128 +
    // b%7−3; chroma DC quant 8 keeps the IDCT integer-exact), so the color
    // conversion does arithmetic on every pixel and the oracle re-derives
    // every channel with the same integer constants via floor division
    "mm_decode_jpeg_color" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeJpegColor(
        Multimodal.jpegColorBlob(px, "doc_id", "__b"), "doc_id", "blob")
    }),

    // PROGRESSIVE COLOR decode, both real-world samplings: the SAME MCUs
    // as mm_decode_jpeg_color / mm_decode_jpeg420 sent as eight-scan SOF2
    // progressions — interleaved DC scans over three components, then
    // per-component AC scans walking each component's OWN plane raster
    // (which differs from MCU order at 4:2:0 — the load-bearing mapping).
    // Byte-identical oracles to the baseline queries: the wire format is
    // the only difference, which is the proof
    "mm_decode_jpeg_prog_color" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeJpegColor(
        Multimodal.jpegColorProgressiveBlob(px, "doc_id", "__b"),
        "doc_id", "blob")
    }),
    "mm_decode_jpeg_prog420" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4)
      Multimodal.decodeJpegColor(
        Multimodal.jpeg420ProgressiveBlob(px, "doc_id", "__b"),
        "doc_id", "blob")
    }),

    // REAL 4:2:2 decode, baseline AND progressive — the OTHER common
    // subsampled layout (DV, many camera JPEGs): every two payload bytes
    // become one 16×8 MCU of two Y blocks over ONE shared chroma pair
    // (the horizontal twin of 4:2:0's quadrant semantics), so with this
    // pair every real-world JPEG layout (gray, 4:4:4, 4:2:0, 4:2:2 ×
    // baseline/progressive) decodes. Shared oracle across the two
    "mm_decode_jpeg422" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 2))"))
        .filter(length(col("__b")) >= 2)
      Multimodal.decodeJpegColor(
        Multimodal.jpeg422Blob(px, "doc_id", "__b", restartEvery = 3),
        "doc_id", "blob")
    }),
    // EXIF orientation HONORED at decode — the governance pass extracts
    // the tag (mm_exif_survey); this query closes the loop: 4:2:0
    // restart-marked JPEGs are EXIF-tagged with orientation 1..8 (every
    // fifth image untagged), and the decode reports the DISPLAYED
    // raster — width/height swap for the transposed orientations and
    // the top-left witness is the stored corner the rotation maps there.
    // A pure integer remap of the existing pixel walk: the witness
    // coordinate moves, nothing is re-decoded. The oracle re-derives
    // orientation from doc_id arithmetic and picks the same corner
    "mm_decode_oriented" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4)
      Multimodal.decodeJpegColorOriented(
        Multimodal.exifTagged(
          Multimodal.jpeg420Blob(px, "doc_id", "__b", restartEvery = 3),
          "doc_id", "blob"),
        "doc_id", "blob")
    }),

    // REAL 4:1:1 JPEG decode — the last named layout rejection besides
    // arithmetic coding, closed by measured share (PLANS.md round 12):
    // each 32×8 MCU carries FOUR Y blocks side by side over ONE shared
    // Cb/Cr pair from the group's first byte, box-upsampled 4×1 — the
    // same 4-bytes-per-group semantics as 4:2:0 with quartered geometry,
    // so the oracle is the 4:2:0 oracle with (width,height) transposed
    // to the 32-wide MCU row. restartEvery=3 keeps the stream splittable
    "mm_decode_jpeg411" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4)
      Multimodal.decodeJpegColor(
        Multimodal.jpeg411Blob(px, "doc_id", "__b", restartEvery = 3),
        "doc_id", "blob")
    }),

    "mm_decode_jpeg_prog422" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 2))"))
        .filter(length(col("__b")) >= 2)
      Multimodal.decodeJpegColor(
        Multimodal.jpeg422ProgressiveBlob(px, "doc_id", "__b"),
        "doc_id", "blob")
    }),

    // REAL 4:2:0 JPEG decode WITH restart intervals — the layout virtually
    // all real crawl images use: each 16×16 MCU carries four Y blocks and
    // ONE shared Cb/Cr pair (from the group's first byte), box-upsampled
    // 2×2, so the shared-chroma semantics are observable in the oracle
    // (quadrants differ only through Y). restartEvery=3 puts RSTn markers
    // + DC-predictor resets in every stream — the resync structure that
    // makes one huge scan SPLITTABLE across decode tasks at scale
    "mm_decode_jpeg420" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4)
      Multimodal.decodeJpegColor(
        Multimodal.jpeg420Blob(px, "doc_id", "__b", restartEvery = 3),
        "doc_id", "blob")
    }),

    // SEGMENT-PARALLEL decode of the same 4:2:0 restart-marked streams:
    // each image's scan is split at its RSTn markers (one linear byte
    // scan, no entropy work), the segments fan across up to 8 stride-
    // buckets through a real shuffle, and exact partial statistics merge
    // by sum/max. Same oracle as mm_decode_jpeg420 — the driver gate
    // PROVES distributed-segment decode ≡ sequential whole-scan decode.
    // At 100 TB this is the difference between one task per giant image
    // and a cluster-wide decode
    "mm_decode_jpeg_parallel" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 4))"))
        .filter(length(col("__b")) >= 4)
      Multimodal.decodeJpegColorParallel(
        Multimodal.jpeg420Blob(px, "doc_id", "__b", restartEvery = 3),
        "doc_id", "blob", tasksPerImage = 8)
    }),

    // SEGMENT-PARALLEL decode of restart-marked PROGRESSIVE 4:4:4
    // streams: 4:4:4 is the layout where the DC scan's MCU raster and
    // every AC scan's block raster are the SAME raster, so one restart
    // interval partitions ALL EIGHT SCANS into the same block ranges —
    // each task replays the full scan sequence (DC first → per-component
    // AC first → refinements) for just its stride of segments, holding
    // coefficient state in a reused restartInterval-sized buffer instead
    // of whole-image planes. Same oracle as mm_decode_jpeg_color /
    // mm_decode_jpeg_prog_color — the driver gate PROVES distributed
    // progressive decode ≡ sequential ≡ baseline
    "mm_decode_jpeg_prog_parallel" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .filter(length(col("__b")) >= 1)
      Multimodal.decodeJpegColorProgressiveParallel(
        Multimodal.jpegColorProgressiveBlob(px, "doc_id", "__b",
          restartEvery = 3), "doc_id", "blob", tasksPerImage = 8)
    }),

    // REAL-pixel resize: the decoded BMP downsampled 2× in both axes by
    // nearest neighbor — the decode→transform step mm_resize only
    // imitates on raw bytes. The sampling grid reads logical rows top
    // first (so the bottom-up storage mapping and the row stride are both
    // exercised per pixel); last_px_hex witnesses grid order. Exact
    // integer stats — the oracle re-derives every sampled offset
    "mm_resize_bmp" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("__px",
          expr("substring(__b, 1, length(__b) - pmod(length(__b), 15))"))
        .withColumn("blob", Multimodal.bmpBlob(col("__px"), width = 5))
      Multimodal.resizeBmp(blobs, "doc_id", "blob", stride = 2)
    }),

    // REAL video-container decode — the decode seam's third modality
    // (image/audio landed round 7): each doc wrapped into an actual
    // ISO-BMFF movie (ftyp + moov with mvhd timing and two trak/tkhd
    // children carrying 16.16 fixed-point dims + a free box + mdat), all
    // built by binary-concat expressions with BIG-endian box sizes, then
    // parsed back by the pure-JVM box walker (Multimodal.Mp4). The free
    // box forces generic size-based skipping; the nested moov walk and
    // the fixed-point dims are the non-trivial parse work. Exact oracle
    "mm_decode_mp4" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("blob", Multimodal.mp4Blob(col("__b"),
          durationCol = col("n_chars") * 40,
          w = lit(16L) + pmod(col("n_chars"), lit(640L)),
          h = lit(16L) + pmod(col("n_chars"), lit(480L))))
      Multimodal.decodeMp4(blobs, "doc_id", "blob")
    }),

    // REAL frame sampling — the demux layer: frames are located through
    // the container's OWN sample tables (stts duration, stsz sizes, stco
    // absolute chunk offset), never by assuming where the payload sits or
    // how it splits; every 2nd declared 200-byte frame is statted. The
    // oracle re-derives the frame plan the builder declared
    "mm_demux_mp4" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("__b", encode(col("text"), "UTF-8"))
        .withColumn("blob", Multimodal.mp4Blob(col("__b"),
          durationCol = col("n_chars") * 40,
          w = lit(16L) + pmod(col("n_chars"), lit(640L)),
          h = lit(16L) + pmod(col("n_chars"), lit(480L))))
      Multimodal.demuxMp4(blobs, "doc_id", "blob", stride = 2)
    }),

    // REAL video-FRAME decode — MJPEG-in-MP4, the composition closing the
    // demux→decode gap: each doc's payload splits into 64-byte slices,
    // each slice becomes a real DC-only grayscale JPEG frame, the frames
    // mux into a real ISO-BMFF movie (stts/stsz/stco), and the decoder
    // re-locates every frame through the container's OWN sample tables,
    // fans the frames across tasks through ONE keyed shuffle, and runs
    // the full baseline-JPEG pipeline per frame. One row per frame with
    // exact pixel statistics — the oracle re-derives every frame's pixels
    // from the document text (the DC-only fixture decodes bit-exactly)
    "mm_decode_video" -> ((s, dir) => {
      val px = t(s, dir, "documents")
        .withColumn("__b0", expr("substring(encode(text, 'UTF-8'), 1, 2048)"))
        .withColumn("__b",
          expr("substring(__b0, 1, length(__b0) - pmod(length(__b0), 64))"))
        .filter(length(col("__b")) >= 64)
      Multimodal.decodeVideoFrames(
        Multimodal.mjpegBlob(px, "doc_id", "__b", frameBytes = 64,
          frameMs = 40), "doc_id", "blob")
    }),

    // Multimodal PERCEPTUAL-hash dedup: dHash-style gradient fingerprint
    // over the blob's byte stream (16 bucket means, adjacent comparisons
    // cross-multiplied in exact integers), then hash-group duplicate
    // flagging — the image near-dup primitive; the tiny hash-count table
    // joins back (AQE broadcasts it), the blob never leaves the scan
    "mm_phash_dedup" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      val hashed = graft.ops.Caches.track(blobs.select(col("doc_id"),
        Multimodal.perceptualHash(col("blob")).as("phash")))
      val cnt = hashed.groupBy(col("phash")).agg(count(lit(1)).as("__c"))
      hashed.join(cnt, Seq("phash"))
        .select(col("doc_id"), col("phash"), (col("__c") > 1).as("is_dup"))
    }),

    // Multimodal frame sampling: fixed-size byte windows, every 2nd kept —
    // the blob never leaves codegen; frame content checked byte-exactly via
    // its hex against the oracle's hex-string slice
    "mm_frames" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      Multimodal.sampleFrames(blobs, "blob", frameBytes = 256, stride = 2)
        .select(col("doc_id"),
          size(col("frames")).cast("long").as("n_frames"),
          hex(element_at(col("frames"), 1)).as("first_frame_hex"))
    }),

    // Multimodal audio windows: the blob as 16-bit LE PCM, per-window
    // integer energy + zero crossings (native one-pass kernels) — the
    // VAD/silence-trim substrate; published as scalars per doc (first/max
    // window energy, total crossings) since list cells don't hash
    "mm_audio_energy" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      val en = Multimodal.audioEnergy(col("blob"), windowSamples = 256)
      val zc = Multimodal.audioZeroCrossings(col("blob"), windowSamples = 256)
      blobs.select(col("doc_id"),
        size(en).cast("long").as("n_windows"),
        try_element_at(en, lit(1)).as("energy_first"),
        array_max(en).as("energy_max"),
        aggregate(zc, lit(0L), _ + _).as("zc_total"))
    }),

    // Multimodal resize stub: byte-grid subsample (every 4th byte) as pure
    // expressions; content verified byte-exactly via hex
    "mm_resize" -> ((s, dir) => {
      val blobs = t(s, dir, "documents")
        .withColumn("blob", encode(col("text"), "UTF-8"))
      val rz = Multimodal.resizeStub(col("blob"), stride = 4)
      blobs.select(col("doc_id"),
        length(rz).cast("long").as("resized_bytes"),
        substring(hex(rz), 1, 128).as("resized_hex_prefix"))
    }),

    // Benchmark decontamination: documents sharing any distinct 5-gram with
    // the benchmark subset (doc_id % 97 == 0). The benchmark docs stay IN
    // the corpus — a leaked benchmark document must flag itself — and the
    // benchmark n-gram set is broadcast (control-sized next to the corpus)
    "decon_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.contamination(docs, docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 5)
    }),

    // FUZZY decontamination: corpus docs that are MinHash NEAR-dups of a
    // benchmark doc (exact-Jaccard-verified, identity pairs kept — a
    // verbatim leak IS the signal). Catches paraphrased leakage the exact
    // 5-gram overlap (decon_overlap) misses; the probe side broadcasts
    "decon_fuzzy" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      DocDedup.crossNearDupPairs(docs, bench, "text", "doc_id",
        threshold = 0.8, maxBucketSize = 10000)
        .select(col("id_a").as("doc_id"), col("id_b").as("bench_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    // PII scrubbing. The synthetic corpus is PII-free, so each row gets a
    // deterministic injected contact line (email + phone + IPv4) derived
    // from its doc_id; the oracle injects the identical line and re-derives
    // the scrub md5 and span count with the same RE2-safe regexes
    "text_pii_scrub" -> ((s, dir) => {
      val injected = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@mail.example.org or 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10.1."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".9"))
      t(s, dir, "documents").select(col("doc_id"),
        Curation.piiCount(injected).as("n_pii"),
        md5(Curation.scrubPii(injected)).as("scrub_md5"))
    }),

    // Deterministic stratified sampling: per-language keep rates over an
    // md5-derived uniform — the same rows survive at any scale, partitioning
    // or re-run (df.sample's partition-seeded RNG gives none of that)
    "sample_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        rates = Map("en" -> 0.5, "es" -> 0.3, "fr" -> 0.3,
          "de" -> 0.2, "zh" -> 0.2))
        .select(col("doc_id"), col("lang"))),

    // Per-source document cap: at most 15 docs per source by md5-uniform
    // rank — the anti-domination gate a web pipeline applies per domain.
    // The rank filter is a WindowGroupLimit pushdown (map-side top-n per
    // group before the one exchange)
    "cap_per_source" -> ((s, dir) =>
      Curation.capPerGroup(t(s, dir, "documents"), "doc_id", "source", n = 15)
        .select(col("doc_id"), col("source"))),

    // Sequence packing: fixed token-budget training sequences within
    // (lang, shard) lanes — shard count bounds every window, no global sort
    "pack_sequences" -> ((s, dir) =>
      Curation.packSequences(t(s, dir, "documents"), "doc_id", "text", "lang",
        budgetTokens = 2048, nShards = 4)),

    // Embedding int8 min-max quantization (the 4x storage compression an
    // embedding store applies before indexing; codes engine-reproducible)
    "embed_quantize" -> ((s, dir) => {
      val q = Curation.quantizeInt8(col("embedding"))
      t(s, dir, "embeddings").select(col("vec_id"),
        array_join(transform(q, _.cast("string")), ",").as("q_csv"))
    }),

    // Gopher-style repetition signals + gate: one tokenization per row
    // feeding top-word / top-bigram / duplicate-trigram fractions — a pure
    // narrow projection, thresholds calibrated to split this corpus
    "text_repetition" -> ((s, dir) =>
      Repetition.signalTable(t(s, dir, "documents"), "text", "doc_id")),

    // Corpus-informed rarity stats: vocabulary-sized df table broadcast
    // back over the token stream; all-integer outputs (exact at any scale)
    "text_doc_freq" -> ((s, dir) =>
      Repetition.docFreqStats(t(s, dir, "documents"), "text", "doc_id",
        rareMaxDf = 50L)),

    // N-gram novelty — the memorization/diversity signal: fraction of a
    // doc's distinct word trigrams appearing in NO other document. One
    // distinct (doc, trigram) shuffle + trigram-df agg + join back;
    // nano-ladder division, exact cross-engine
    "text_ngram_novelty" -> ((s, dir) =>
      Repetition.ngramNovelty(t(s, dir, "documents"), "text", "doc_id")),

    // SOURCE-level novelty — the mixture-decision counterpart: per
    // source, the fraction of its distinct trigrams no other source has
    // (sources omitted from the mix lose exactly this much content)
    "corpus_source_novelty" -> ((s, dir) =>
      Repetition.sourceNovelty(t(s, dir, "documents"), "text", "source")),

    // Top-3 TF-IDF terms per document: one doc-term shuffle, broadcast df
    // table, scores fixed to integer micro-units (one multiplication per
    // term, no float summation), per-doc top-k as a WindowGroupLimit
    "text_tfidf_topk" -> ((s, dir) =>
      graft.text.Retrieval.tfidfTopK(t(s, dir, "documents"), "text", "doc_id", k = 3)),

    // BM25-ranked retrieval over a persisted inverted index (the IVF
    // build/probe pattern on text): postings hash-partitioned by term
    // bucket, the probe statically prunes to the query terms' buckets;
    // per-term contributions in integer micro-units so the per-doc sum is
    // exact under any partitioning
    "search_bm25" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      graft.text.Retrieval.bm25(s, index, "fast table scan join merge", k = 20)
    }),

    // RM3 pseudo-relevance feedback — the classic query-expansion loop:
    // top-10 feedback docs nominate 8 expansion terms (by occurrence,
    // ties → term asc, original terms excluded), each weighted
    // ⌊400000·tf/Σtf⌋ against 600000 per original term, then a second
    // weighted bucket-pruned BM25 pass. The feedback set is control-sized
    // by construction; neither pass scans the corpus. All-integer micro
    // weights and contributions — the oracle replays both passes exactly
    "search_rm3" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      graft.text.Retrieval.bm25Rm3(s, index, t(s, dir, "documents"),
        "text", "doc_id", "fast table scan join merge", k = 20)
    }),

    // The same index maintained LOG-STRUCTURED instead of rebuilt: the
    // index starts from a perturbed corpus (corrupted texts, missing docs,
    // phantom rows), one change batch supersedes/adds/deletes its way to
    // the true corpus through gen-stamped appends + tombstones + stats
    // deltas (old doc lengths point-read from the ids' own partitions,
    // never an index scan) — and the probe must match the full-build
    // oracle exactly
    "search_bm25_incr" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir + "#incr", {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25i")).toString
        val docs = t(s, dir, "documents")
        val corrupted = docs.withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" stalepadding")))
            .otherwise(col("text")))
        val phantoms = docs.filter(col("doc_id") % 13 === 7)
          .withColumn("doc_id", col("doc_id") + 10000000L)
        val idx = graft.text.Retrieval.buildIndex(
          corrupted.filter(col("doc_id") % 13 =!= 5).unionByName(phantoms),
          "text", "doc_id", idxDir, numBuckets = 64)
        graft.text.Retrieval.updateIndex(idx,
          upserts = docs.filter(col("doc_id") % 13 === 0 || col("doc_id") % 13 === 5),
          textCol = "text", idCol = "doc_id",
          deletes = phantoms.select(col("doc_id")), gen = 1L)
        idx
      })
      graft.text.Retrieval.bm25(s, index, "fast table scan join merge", k = 20)
    }),

    // BM25 for a BATCH of queries in one pass — a query log scored against
    // the same index: distinct terms prune the buckets, (qid, term) pairs
    // broadcast onto the pruned postings, one (qid, doc) aggregate, per-qid
    // top-k
    "search_bm25_batch" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      import s.implicits._
      val qs = Seq(("q1", "fast table scan"), ("q2", "join merge"),
        ("q3", "window sort stream")).toDF("qid", "qtext")
      graft.text.Retrieval.bm25Batch(s, index, qs, "qid", "qtext", k = 10)
    }),

    // HYBRID retrieval: BM25 (sparse) and cosine (dense) more-like-this
    // lists fused by reciprocal rank — integer nano-unit contributions, so
    // the fused ranking is exact and oracle-checked end to end. Probe docs
    // query BOTH towers: their distinct tokens the pruned postings, their
    // embedding one broadcast corpus scan
    "search_hybrid_rrf" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      val probes = t(s, dir, "documents").filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"), col("text"))
      graft.text.Retrieval.hybridRrf(s, index, probes, "doc_id", "text",
        t(s, dir, "embeddings"), "vec_id", "embedding",
        kEach = 20, kOut = 10)
    }),

    // HARD-NEGATIVE mining: lexical top-k minus dense top-k per probe —
    // BM25-close but cosine-far, the contrastive-training negative set.
    // One anti-join over the same two tower lists the hybrid query fuses
    "mine_hard_negatives" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      val probes = t(s, dir, "documents").filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"), col("text"))
      graft.text.Retrieval.hardNegatives(s, index, probes, "doc_id", "text",
        t(s, dir, "embeddings"), "vec_id", "embedding", kEach = 20)
    }),

    // PARAPHRASE positives: dense top-k minus lexical top-k per probe —
    // semantically close with little surface overlap, the contrastive
    // positive candidates lexical matching cannot surface
    "mine_paraphrase_pairs" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      val probes = t(s, dir, "documents").filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"), col("text"))
      graft.text.Retrieval.paraphrasePositives(s, index, probes, "doc_id", "text",
        t(s, dir, "embeddings"), "vec_id", "embedding", kEach = 20)
    }),

    // The search index kept fresh under a DOCUMENT CHANGE STREAM: the cold
    // index misses some docs and holds stale text for others; the fresh
    // copies arrive as a real readStream (one parquet file per
    // micro-batch), each batch applied log-structured through foreachBatch
    // under its batch id — and the probe must match the fresh-build oracle
    "search_bm25_stream" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir + "#stream", {
        val docs = t(s, dir, "documents")
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25s")).toString
        val stale = docs.withColumn("text",
          when(pmod(col("doc_id"), lit(11)) === 5, concat(col("text"), lit(" staleword")))
            .otherwise(col("text")))
        val idx = graft.text.Retrieval.buildIndex(
          stale.filter(pmod(col("doc_id"), lit(11)) =!= 4),
          "text", "doc_id", idxDir, numBuckets = 64)
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25s_in")).toString
        docs.filter(pmod(col("doc_id"), lit(11)).isin(4, 5))
          .select(col("doc_id"), col("text"))
          .repartition(3).write.mode("overwrite").parquet(streamDir)
        val noDeletes = docs.filter(lit(false)).select(col("doc_id"))
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.text.Retrieval.updateIndex(idx, b.toDF(), "text", "doc_id",
              noDeletes, gen = id + 1)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        idx
      })
      graft.text.Retrieval.bm25(s, index, "fast table scan join merge", k = 20)
    }),

    // Exact phrase search over the positional postings: each term's
    // postings are a partition-pruned read, candidates intersect with
    // doc equi-joins, occurrences count by a codegen'd position-array
    // intersection — never a corpus scan
    "search_phrase" -> ((s, dir) => {
      val index = bm25Indexes.getOrElseUpdate(dir, {
        val idxDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bm25")).toString
        graft.text.Retrieval.buildIndex(t(s, dir, "documents"), "text", "doc_id",
          idxDir, numBuckets = 64)
      })
      graft.text.Retrieval.phraseSearch(s, index, "table scan", k = 20)
    }),

    // Pairwise n-gram overlap between sources — the inter-source
    // duplication diagnostic (did two crawls feed the same content?);
    // one distinct-shingle shuffle, slice²-sized output
    "corpus_source_overlap" -> ((s, dir) =>
      graft.text.Retrieval.sourceOverlap(t(s, dir, "documents"), "text", "source", n = 5)),

    // Deterministic data mixture: greedy per-source fill to a token budget
    // in md5-uniform order (src0 uncapped, src1 dropped, rest 800 tokens)
    "mix_budget" -> ((s, dir) =>
      Curation.mixToBudget(t(s, dir, "documents"), "doc_id", "text", "source",
        budgets = Map("src0" -> 10000000L, "src1" -> 0L),
        defaultBudget = 800L)),

    // MERGEABLE equi-width histogram sketch: 64 fixed bins over the
    // token-count domain (width 16, overflow clamps to the last bin) —
    // all-integer cells, so per-shard histograms merge into the global one
    // by plain addition (SketchesSpec pins the merge identity; the
    // quantile-from-histogram estimate is a deterministic interpolation
    // over those integers). Map-side partial agg: ≤ sources×64 rows shuffle
    "sketch_histogram" -> ((s, dir) => {
      val ntok = TextFunctions.tokenCount(col("text")).cast("long")
      t(s, dir, "documents")
        .select(col("source"),
          least((ntok / 16).cast("long"), lit(63L)).cast("int").as("bin"))
        .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
    }),

    // Per-key BURST detection on the event stream: hours where a user's
    // event count exceeds 2× their own median hourly rate — the robust
    // (median-based) outlier gate; per-user medians are a corpus-stat
    // aggregate over integer counts joined back, never a per-user sort of
    // raw events
    "events_rate_outliers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hourly = graft.ops.Caches.track(
        ev.groupBy(col("user_id"), expr("ts div 3600000000000").as("hour_idx"))
          .agg(count(lit(1)).as("cnt")))
      val med = hourly.groupBy(col("user_id"))
        .agg(round(percentile(col("cnt"), lit(0.5)), 4).as("med"))
      hourly.join(med, Seq("user_id"))
        .filter(col("cnt") > col("med") * 2)
        .select(col("user_id"), (col("hour_idx") * 3600).as("hour"),
          col("cnt"), col("med"))
    }),

    // Temperature-based source resampling: per-source budgets ∝ n_s^0.7
    // (alpha < 1 flattens the mix) over half the corpus's tokens; weights
    // quantize to unit integers (1-ulp pow wobble stays far from the floor
    // boundary) and the split is exact big-integer arithmetic, so the
    // greedy md5-uniform selection is bit-stable
    "mix_temperature" -> ((s, dir) =>
      Curation.mixByTemperature(t(s, dir, "documents"), "doc_id", "text",
        "source", alpha = 0.7, frac = 0.5)),

    // MODEL-driven mixture reweighting (DoReMi-lite): sources ranked by
    // their mean TRAINED-quality-probe score, rank -> integer weight
    // (best S … worst 1), quarter-corpus token budget split ∝ weight in
    // exact big-integer arithmetic, then the deterministic md5-uniform
    // greedy fill. Ordinal weights keep the whole derivation exact: only
    // comparisons of per-source means cross the engine boundary
    "mix_quality_ranked" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.mixByQualityRank(docs, "doc_id", "text", "source",
        graft.text.Probe.score(docs, probeModel(s, dir), "text", "doc_id"),
        "pred_nano", frac = 0.25)
    }),

    // KMV sketch MERGE: per-source bottom-k draw sets fold into the global
    // estimate exactly (the distributed-aggregate property; the oracle
    // computes the direct global sketch — merged must equal it)
    "sketch_kmv_merge" -> ((s, dir) =>
      graft.text.Sketches.kmvMerge(t(s, dir, "documents"), "source",
        col("text"), k = 64)),

    // Token-distribution drift between the even/odd doc halves (standing
    // in for two corpus snapshots): smoothed per-term log rate ratios in
    // integer micro units, top shifts — the vocabulary-level "what
    // changed between crawls" monitor
    "text_drift" -> ((s, dir) =>
      Curation.tokenDrift(t(s, dir, "documents"), "text",
        isA = col("doc_id") % 2 === 0)),

    // Unigram diversity: token entropy + type-token ratio per doc — the
    // "repetitive word soup" gate next to the n-gram repetition rules
    "text_entropy" -> ((s, dir) =>
      Curation.tokenEntropy(t(s, dir, "documents"), "text", "doc_id")),

    // RAG-style chunking: fixed 32-token windows every 24 tokens (8-token
    // overlap, trailing partial kept) — the embedding-prep projection.
    // Pure narrow pass; chunk md5 is the stable downstream id
    "text_chunking" -> ((s, dir) =>
      Curation.chunkTokens(t(s, dir, "documents"), "text", "doc_id",
        size = 32, stride = 24)),

    // Duplicated-span statistics: 20-token sliding windows whose text
    // recurs anywhere in the corpus — the substring-dedup signal that
    // catches verbatim chunks pasted into otherwise-distinct documents
    "text_dup_spans" -> ((s, dir) =>
      Curation.dupSpans(t(s, dir, "documents"), "text", "doc_id", span = 20)),

    // CONTENT-DEFINED chunk dedup stats (FastCDC at token granularity):
    // boundaries fall where the trailing 4-token window's md5 draw ≡ 0
    // (mod 8), so a verbatim run shared at DIFFERENT offsets still yields
    // identical chunks — the shift-robust sibling of text_dup_spans'
    // fixed windows and text_span_scrub's fixed passages
    "text_cdc_dedup" -> ((s, dir) =>
      Curation.cdcDedupStats(t(s, dir, "documents"), "text", "doc_id")),

    // Duplicate-PASSAGE removal — the destructive counterpart of
    // text_dup_spans: consecutive 10-token passages dedup corpus-wide
    // (first occurrence in (doc_id, position) order survives) and each
    // document's text is REBUILT from its surviving passages. First
    // occurrence is a min(struct) aggregate (map-side combine — a passage
    // duplicated millions of times forwards one row per task), never a
    // window over the skewed hash key
    "text_span_scrub" -> ((s, dir) =>
      Curation.scrubDupSpans(t(s, dir, "documents"), "text", "doc_id", span = 10)),

    // Winnowing fingerprints (the MOSS algorithm): min-hash of each
    // 4-window over 5-token shingle hashes, leftmost tie — guarantees a
    // shared fingerprint for any shared run of ≥ 8 tokens at ~2/(w+1)
    // fingerprint density. One tokenization; windows are frames, no join
    "text_winnow" -> ((s, dir) =>
      Curation.winnow(t(s, dir, "documents"), "text", "doc_id", k = 5, w = 4)),

    // EXACT heavy hitters (terms ≥ 1% of all tokens) via a Misra–Gries
    // candidate pre-pass: the candidate shuffle is bounded by
    // partitions×capacity regardless of vocabulary size; the exact recount
    // semi-joins the token stream against the broadcast candidates before
    // its only shuffle. Integer threshold arithmetic — bit-stable
    "text_heavy_hitters" -> ((s, dir) =>
      graft.text.HeavyHitters.frequentTerms(t(s, dir, "documents"), "text",
        num = 1, den = 100, capacity = 1024)),

    // Vocabulary OOV rate: the corpus vocabulary is the ≥0.1% heavy-hitter
    // set (≤1000 terms by construction — control-sized), shipped as a map
    // literal so the per-doc out-of-vocabulary fraction is a PURE NARROW
    // projection: no join, no shuffle, map_contains_key per token
    "text_oov_rate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.text.HeavyHitters
        .frequentTerms(docs, "text", num = 1, den = 1000, capacity = 2048)
        .select("term").collect().map(_.getString(0))
      val vmap = typedLit(vocab.map(_ -> 1).toMap)
      val toks = TextFunctions.tokens(col("text"))
      docs.select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          size(filter(toks, t => !map_contains_key(vmap, t))).cast("long").as("n_oov"))
        .withColumn("oov_frac", round(col("n_oov") / col("n_tok"), 6))
    }),

    // Z-order (Morton) clustering key: bit-interleave of two scaled
    // dimensions — the layout key writeZOrdered range-partitions on so
    // parquet min/max stats stay tight on BOTH columns per file (range
    // predicates on either dimension prune files at plan time; LayoutSpec
    // measures the skipping). The key itself is a pure bit-op projection
    "layout_zorder" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.sources.Layout.zOrder2(
          graft.sources.Layout.rankScale(col("n_chars"), 0L, 2047L, 8),
          graft.sources.Layout.rankScale(col("doc_id"), 0L, 8191L, 8),
          bits = 8).as("zkey"))),

    // CCNet-style corpus LM quality signal: per-doc TOKEN-trigram average
    // negative log-likelihood against the corpus's own trigram
    // distribution (two-pass corpus-stats shape — see lmScore)
    "text_lm_score" -> ((s, dir) =>
      Curation.lmScore(t(s, dir, "documents"), "text", "doc_id")),

    // BPE tokenizer TRAINING on the corpus's own word-frequency table:
    // one corpus-scale (word, count) pass, then vocab-scale pair-count
    // rounds; the learned merge table is the model (control data). The
    // space-delimited symbol serialization makes greedy merge application
    // a literal string replace — bit-identical cross-engine (see Bpe)
    "text_bpe_merges" -> ((s, dir) => {
      // serve from the memoized per-dir model (train once, serve many) —
      // text_bpe_encode/compression already share the same trained model
      import s.implicits._
      bpeModel(s, dir).map(m => (m.rank, m.lhs, m.rhs, m.cnt))
        .toDF("merge_rank", "lhs", "rhs", "cnt")
    }),

    // Encoding with the TRAINED tokenizer: per-doc token count after the
    // 8 learned merges — merges ride as literals in a narrow fold, so the
    // encode pass is embarrassingly parallel (model fit once per dir)
    "text_bpe_encode" -> ((s, dir) =>
      Bpe.encodedLength(t(s, dir, "documents"), "text", "doc_id",
        bpeModel(s, dir))),

    // Unigram-LM tokenizer TRAINING (the SentencePiece-side subword
    // family next to BPE): the piece inventory = all single characters +
    // top-64 multi-character substrings (length ≤ 4) by corpus-weighted
    // count, ranked (cnt DESC, piece). One bounded explode over the
    // vocab-scale word table + a TakeOrdered — never corpus-scale; the
    // model is control data (Unigram.scala)
    "text_unigram_vocab" -> ((s, dir) => {
      import s.implicits._
      unigramModel(s, dir).map(p => (p.rank, p.piece, p.cnt))
        .toDF("rank", "piece", "cnt")
    }),

    // Encoding with the trained unigram inventory: per-word VITERBI
    // minimum-cost segmentation (cost = CostBase·pieces + Σ rank — exact
    // integers standing in for EM log-probs, so the minimum is a unique
    // integer and cross-engine bit-stable). DP runs once per DISTINCT
    // word; a broadcast-sized join fans (n_pieces, rank_sum) back to docs
    "text_unigram_encode" -> ((s, dir) =>
      graft.text.Unigram.encodedLength(t(s, dir, "documents"), "text",
        "doc_id", unigramModel(s, dir))),

    // The tokenizer BAKE-OFF: the three subword families (BPE merges,
    // unigram Viterbi, WordPiece greedy) encoded over the same corpus,
    // one corpus-level fertility row each — the comparison a pipeline
    // runs before committing to a tokenizer. Three control-sized
    // aggregates unioned; the nano-ladder ratio is exact
    "text_tokenizer_bakeoff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val chars = docs.agg(sum(col("n_chars")).cast("long").as("total_chars"))
      val fams = Seq(
        ("bpe", Bpe.encodedLength(docs, "text", "doc_id",
          bpeModel(s, dir)), "n_bpe"),
        ("unigram", graft.text.Unigram.encodedLength(docs, "text", "doc_id",
          unigramModel(s, dir)), "n_tokens"),
        ("wordpiece", graft.text.Unigram.encodedLengthGreedy(docs, "text",
          "doc_id", unigramModel(s, dir)), "n_tokens"))
      fams.map { case (fam, enc, c) =>
        enc.agg(sum(col(c)).cast("long").as("total_tokens"))
          .select(lit(fam).as("family"), col("total_tokens"))
      }.reduce(_.unionByName(_))
        .crossJoin(chars)
        .select(col("family"), col("total_chars"), col("total_tokens"),
          (call_function("div", col("total_chars") * lit(1000000000L),
            col("total_tokens")) / lit(1e9)).as("chars_per_token"))
    }),

    // WordPiece-style GREEDY longest-match encoding over the SAME
    // inventory (BERT's tokenizer discipline): at each position take the
    // longest matching piece, never backtrack — the cheap counterpart of
    // the Viterbi optimum (greedy never uses fewer pieces, spec-pinned).
    // Same distinct-word DP + broadcast-join-back shape
    "text_wordpiece_encode" -> ((s, dir) =>
      graft.text.Unigram.encodedLengthGreedy(t(s, dir, "documents"),
        "text", "doc_id", unigramModel(s, dir))),

    // The tokenizer family's actual DATA PRODUCT: per-doc token-ID
    // sequences (greedy piece ranks over the trained inventory, words in
    // document order). The walk runs once per DISTINCT word; the id
    // arrays fan back through one join and assemble with a sort_array —
    // no window, no driver work. Output pins the full sequence via md5
    // plus a human-readable 12-id head; the oracle replays the greedy
    // walk accumulating rank LISTS (arg_max over matching pieces)
    "text_greedy_ids" -> ((s, dir) => {
      graft.text.Unigram.greedyIds(t(s, dir, "documents"), "text", "doc_id",
          unigramModel(s, dir))
        .select(col("doc_id"),
          size(col("ids")).cast("long").as("n_ids"),
          md5(expr("array_join(transform(ids, x -> cast(x as string)), ',')"))
            .as("ids_md5"),
          expr("array_join(transform(slice(ids, 1, 12), " +
            "x -> cast(x as string)), ',')").as("ids_head"))
    }),

    // Fixed-length sequence packing over those ids — the dense training
    // rows a pretraining loader consumes (each doc + one EOS, sequences
    // filled across doc boundaries). Sharded packing: docs hash to 8
    // shards by id, each shard packs sequentially inside its partition
    // (one mapPartitions pass, O(seqLen) state) — NEVER a global window;
    // at 100 TB shards scale with the writer count and the only waste is
    // one partial tail per shard (kept, not dropped — lossless)
    "pack_token_ids" -> ((s, dir) => {
      val ids = graft.text.Unigram.greedyIds(t(s, dir, "documents"),
        "text", "doc_id", unigramModel(s, dir))
      graft.text.Pack.packTokenIds(ids, "doc_id", "ids",
          seqLen = 256, nShards = 8, eosId = 0)
        .select(col("shard").cast("long").as("shard"),
          col("seq_idx"), col("n_ids").cast("long").as("n_ids"),
          md5(expr("array_join(transform(ids, x -> cast(x as string)), ',')"))
            .as("ids_md5"))
    }),

    // Tokenizer fertility report for the unigram family: per-source
    // chars-per-token of the trained inventory (the BPE twin's metric —
    // comparing the two published reports IS the tokenizer bake-off a
    // data pipeline runs); nano-ladder division, exact cross-engine
    "text_unigram_compression" -> ((s, dir) => {
      val enc = graft.text.Unigram.encodedLength(
        t(s, dir, "documents"), "text", "doc_id", unigramModel(s, dir))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .join(enc, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"))
        .select(col("source"), col("total_chars"), col("total_tokens"),
          (call_function("div", col("total_chars") * lit(1000000000L),
            col("total_tokens")) / lit(1e9)).as("chars_per_token"))
    }),

    // Kneser–Ney-smoothed bigram LM count table: interpolated absolute
    // discounting with CONTINUATION backoff — the estimation substrate of
    // a KenLM-style corpus LM. One corpus-scale bigram groupBy; marginals
    // are vocab-scale; top-100 is a TakeOrdered
    "text_kn_bigram" -> ((s, dir) =>
      LmCounts.publishBigrams(knModel(s, dir)._1, k = 100)),

    // Data-quality admission gate: the whole single-table constraint
    // suite (completeness, uniqueness, domain, cross-column consistency)
    // evaluates in ONE aggregate pass — N constraints cost one scan —
    // then pivots to tidy rows via a literal struct array, driver-free
    "dq_documents" -> ((s, dir) =>
      DataQuality.documentsSuite(t(s, dir, "documents"))),

    // Referential integrity across the star schema: LEFT ANTI orphan
    // counts per FK edge (broadcast or shuffled hash per side size)
    // k-anonymity release gate: rows whose quasi-identifier combination
    // (nation, market segment, acctbal sign) is shared by fewer than k=10
    // rows are re-identifiable at that granularity — the governance
    // summary a dataset release consumes. One map-side-combined groupBy
    // + a control-sized rollup; a single shuffle at any corpus size
    "dq_k_anonymity" -> ((s, dir) =>
      DataQuality.kAnonymity(
        t(s, dir, "customer")
          .withColumn("__bal_sign", signum(col("c_acctbal")).cast("int")),
        Seq("c_nationkey", "c_mktsegment", "__bal_sign"), k = 10)),

    "dq_referential" -> ((s, dir) => DataQuality.referentialSuite(Seq(
      ("lineitem->orders", t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey"),
      ("orders->customer", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"),
      ("lineitem->part", t(s, dir, "lineitem"), "l_partkey",
        t(s, dir, "part"), "p_partkey"),
      ("lineitem->supplier", t(s, dir, "lineitem"), "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"),
      ("customer->nation", t(s, dir, "customer"), "c_nationkey",
        t(s, dir, "nation"), "n_nationkey"),
      ("nation->region", t(s, dir, "nation"), "n_regionkey",
        t(s, dir, "region"), "r_regionkey")))),

    // Heaps'-law vocabulary growth: (decile, n_tokens, n_types) for the
    // doc_id-prefix at each tenth of the corpus — the curve scaling-law
    // work reads vocabulary size from. The decile expansion happens on
    // the TOKEN stream but map-side combine collapses it to (decile,
    // word) pairs before the one shuffle, so the 10× blowup only ever
    // touches vocab-sized data; thresholds are exact integer div
    "corpus_heaps" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("__w"))
        .select(col("doc_id"), col("__w"),
          explode(sequence(lit(1L), lit(10L))).as("decile"))
        .filter(col("doc_id") <=
          call_function("div", lit(maxId) * col("decile"), lit(10L)))
        .groupBy(col("decile"), col("__w"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_types"), sum(col("__c")).as("n_tokens"))
    }),

    // Good–Turing count-of-counts: N_r per occurrence count r, with the
    // adjusted count r* = (r+1)·N_{r+1}/N_r on the nano ladder — the
    // other classical smoothing substrate next to the KN tables
    "text_count_of_counts" -> ((s, dir) =>
      LmCounts.countOfCounts(t(s, dir, "documents"), "text")),

    // Zipf power-law diagnostics: exact least-squares slope/intercept of
    // floor(log2 count) on floor(log2 rank) over the TOP-1024 tokens —
    // the head fit that tells you whether a corpus's token distribution
    // is natural or synthetic/duplicated. All integer: log2 buckets via
    // length(bin(x))-1 (exact in both engines), head selection plans as
    // TakeOrderedAndProject (never a vocab-wide single-partition window:
    // the rank window runs over ≤ 1024 rows), and the 2-var normal
    // equations solve IN-PLAN with `div` (≡ DuckDB `//`, both truncate)
    "corpus_zipf" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))
      val top = t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(1024)
      val pts = top.withColumn("rank", row_number().over(w))
        .select((length(bin(col("rank").cast("long"))) - 1).cast("long").as("x"),
          (length(bin(col("cnt"))) - 1).cast("long").as("y"))
      pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(
          expr("(n * sxy - sx * sy) * 1000000000 div (n * sxx - sx * sx)")
            .as("slope_nano"),
          expr("(sy * sxx - sx * sxy) * 1000000000 div (n * sxx - sx * sx)")
            .as("intercept_nano"),
          col("n"))
    }),

    // Trigram KN: raw-count discounting at the top order, interpolating
    // into the continuation-smoothed bigram model — the three-level
    // estimation stack. Two corpus-scale n-gram groupBys; every adjacent
    // (w2,w3) inside a trigram is itself a bigram, so the backoff join
    // always matches
    "text_kn_trigram" -> ((s, dir) =>
      LmCounts.publishTrigrams(knModel(s, dir)._2, k = 100)),

    // Per-doc NLL under the SMOOTHED trigram model — lmScore's properly
    // backed-off upgrade: the corpus self-scores, so the model join is
    // total; the model's p_kn values are rounded once in the table
    "text_kn_score" -> ((s, dir) =>
      LmCounts.knScoreFrom(t(s, dir, "documents"), "text", "doc_id",
        knModel(s, dir)._2)),

    // Explicit GROUPING SETS with grouping_id — the lattice cut neither
    // rollup nor cube gives alone ((source,lang), (source), (lang): no
    // grand total); one pass, Expand + single shuffle
    "corpus_grouping_sets" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupingSets(
          Seq(Seq(col("source"), col("lang")), Seq(col("source")),
            Seq(col("lang"))),
          col("source"), col("lang"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("gid"), col("n_docs"), col("total_chars"))),

    // STREAM-MAINTAINED BPE word counts: each micro-batch folds its
    // docs' (word, count) deltas into the durable state (the additive
    // twin of text_bpe_incr's batch path); training from the drained
    // state shares text_bpe_merges' oracle — maintained ≡ rebuilt
    "text_bpe_stream" -> ((s, dir) => {
      import s.implicits._
      bpeStreamCache.getOrElseUpdate(dir, {
        val root = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bpes")).toString
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bpes_in")).toString
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(4).write.mode("overwrite").parquet(streamDir)
        var cur: Option[String] = None
        var lastId = -1L
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            // exactly-once within the run: a replayed micro-batch id must
            // not fold its deltas into state that already includes them
            if (id > lastId) {
              val delta = Bpe.wordCounts(b.toDF(), "text")
              val merged = cur match {
                case Some(p) => Bpe.mergeCounts(s.read.parquet(p), delta)
                case None => delta
              }
              val out = s"$root/b$id"
              merged.write.mode("overwrite").parquet(out)
              cur = Some(out)
              lastId = id
            }
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Bpe.learnFromCounts(
          s.read.parquet(cur.getOrElse(sys.error("empty stream"))),
          nMerges = 8)
      }).map(m => (m.rank, m.lhs, m.rhs, m.cnt))
        .toDF("merge_rank", "lhs", "rhs", "cnt")
    }),

    // STREAM-MAINTAINED unigram training: the SAME drained word-count
    // state discipline as text_bpe_stream (counts are abelian; replayed
    // micro-batch ids are skipped), but the inventory learner consumes
    // the state — maintained ≡ rebuilt, sharing text_unigram_vocab's
    // oracle. One drain per dir (the word-count state is the model seam;
    // the live-per-invocation families are the persisted-index ones)
    "text_unigram_stream" -> ((s, dir) => {
      import s.implicits._
      unigramStreamCache.getOrElseUpdate(dir, {
        val root = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_unis")).toString
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_unis_in")).toString
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(4).write.mode("overwrite").parquet(streamDir)
        var cur: Option[String] = None
        var lastId = -1L
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            if (id > lastId) { // exactly-once fold on replay
              val delta = Bpe.wordCounts(b.toDF(), "text")
              val merged = cur match {
                case Some(p) => Bpe.mergeCounts(s.read.parquet(p), delta)
                case None => delta
              }
              val out = s"$root/b$id"
              merged.write.mode("overwrite").parquet(out)
              cur = Some(out)
              lastId = id
            }
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.text.Unigram.learnFromCounts(
          s.read.parquet(cur.getOrElse(sys.error("empty stream"))),
          vocabMulti = 64)
      }).map(p => (p.rank, p.piece, p.cnt))
        .toDF("rank", "piece", "cnt")
    }),

    // STREAM-MAINTAINED KN estimation: bigram counts fold forward under
    // a real readStream (the n-gram twin of text_bpe_stream — counts
    // are abelian); the KN table estimated from the drained state is
    // identical to a from-scratch build and shares text_kn_bigram's
    // oracle — maintained ≡ rebuilt
    "text_kn_stream" -> ((s, dir) => {
      import s.implicits._
      val stateDir = knStreamStores.getOrElseUpdate(dir, {
        val root = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_kns")).toString
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_kns_in")).toString
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(4).write.mode("overwrite").parquet(streamDir)
        var cur: Option[String] = None
        var lastId = -1L
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            if (id > lastId) {
              val delta = LmCounts.bigramCounts(b.toDF(), "text")
              val merged = cur match {
                case Some(p) => LmCounts.mergeBigramCounts(
                  s.read.parquet(p), delta)
                case None => delta
              }
              val out = s"$root/b$id"
              merged.write.mode("overwrite").parquet(out)
              cur = Some(out)
              lastId = id
            }
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cur.getOrElse(sys.error("empty stream"))
      })
      LmCounts.knBigramsFromCounts(s.read.parquet(stateDir), k = 100)
    }),

    // Tokenizer compression report: chars-per-token of the TRAINED BPE
    // per source — the metric a tokenizer is judged by. One narrow
    // encode pass + a per-source aggregate; the ratio rides the nano
    // ladder (a chars/tokens rational can land on a decimal boundary)
    "text_bpe_compression" -> ((s, dir) => {
      val enc = Bpe.encodedLength(t(s, dir, "documents"), "text", "doc_id",
        bpeModel(s, dir))
      t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        .join(enc, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("total_chars"),
          sum(col("n_bpe")).as("total_bpe"))
        .select(col("source"), col("total_chars"), col("total_bpe"),
          (call_function("div", col("total_chars") * lit(1000000000L),
            col("total_bpe")) / lit(1e9)).as("chars_per_token"))
    }),

    // INCREMENTALLY-MAINTAINED BPE training: word counts are an abelian
    // group, so the state is a (word, count) parquet table folded with
    // signed deltas — a batch ADDS its docs' counts and RETRACTS deleted
    // docs' counts; no corpus re-read, no log replay. Training from the
    // maintained counts must equal training from scratch: this query
    // starts from a corrupted state (a third of the corpus missing,
    // phantom docs present), applies the converging delta batch, and
    // shares text_bpe_merges' exact oracle — maintained ≡ rebuilt
    "text_bpe_incr" -> ((s, dir) => {
      import s.implicits._
      bpeIncrCache.getOrElseUpdate(dir, {
        val docs = t(s, dir, "documents")
        val phantoms = docs.filter(col("doc_id") % 7 === 1)
          .withColumn("text", concat(col("text"), lit(" zzzphantom")))
        val stateDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_bpe")).toString
        Bpe.mergeCounts(
            Bpe.wordCounts(docs.filter(col("doc_id") % 3 =!= 0), "text"),
            Bpe.wordCounts(phantoms, "text"))
          .write.mode("overwrite").parquet(stateDir)
        val merged = Bpe.mergeCounts(
          s.read.parquet(stateDir),
          Bpe.wordCounts(docs.filter(col("doc_id") % 3 === 0), "text"),
          Bpe.wordCounts(phantoms, "text", sign = -1))
        Bpe.learnFromCounts(merged, nMerges = 8)
      }).map(m => (m.rank, m.lhs, m.rhs, m.cnt))
        .toDF("merge_rank", "lhs", "rhs", "cnt")
    }),

    // INCREMENTALLY-MAINTAINED unigram training: the inventory is a pure
    // function of the same abelian (word, count) state BPE maintains, so
    // the identical signed-delta fold (corrupted state + converging
    // batch) must reproduce text_unigram_vocab's exact inventory —
    // maintained ≡ rebuilt, sharing that oracle
    "text_unigram_incr" -> ((s, dir) => {
      import s.implicits._
      unigramIncrCache.getOrElseUpdate(dir, {
        val docs = t(s, dir, "documents")
        val phantoms = docs.filter(col("doc_id") % 7 === 1)
          .withColumn("text", concat(col("text"), lit(" zzzphantom")))
        val stateDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_uni")).toString
        Bpe.mergeCounts(
            Bpe.wordCounts(docs.filter(col("doc_id") % 3 =!= 0), "text"),
            Bpe.wordCounts(phantoms, "text"))
          .write.mode("overwrite").parquet(stateDir)
        val merged = Bpe.mergeCounts(
          s.read.parquet(stateDir),
          Bpe.wordCounts(docs.filter(col("doc_id") % 3 === 0), "text"),
          Bpe.wordCounts(phantoms, "text", sign = -1))
        graft.text.Unigram.learnFromCounts(merged, vocabMulti = 64)
      }).map(p => (p.rank, p.piece, p.cnt))
        .toDF("rank", "piece", "cnt")
    }),

    // Weighted sample without replacement (Efraimidis–Spirakis): top-100
    // by u^(1/w) with w = document length — the distributed
    // source-weighted selection primitive; integer nano keys, so the
    // ranking is exact and the plan is a TakeOrderedAndProject
    "sample_weighted" -> ((s, dir) =>
      Curation.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars").cast("double"), k = 100)),

    // Deterministic train/val/test split: md5-uniform assignment, stable
    // under any partitioning — membership recomputable from the id alone
    "split_assign" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          Curation.assignSplit(col("doc_id"),
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("split"),
          col("n_chars"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))),

    // Per-source data-card profile: counts, language spread, size totals,
    // exact median — one shuffle, map-side partials for the sums
    "corpus_profile" -> ((s, dir) =>
      Curation.corpusProfile(t(s, dir, "documents"),
        "source", "lang", "n_chars", "text")),

    // KMV distinct-count sketch: per-source distinct-text cardinality from
    // a 64-draw sketch — the mergeable k-row answer that replaces COUNT
    // (DISTINCT) full shuffles at corpus scale. Deterministic md5 draws, so
    // the estimate (false error and all) is hash-checked by the oracle
    "sketch_distinct_kmv" -> ((s, dir) =>
      graft.text.Sketches.kmvDistinct(t(s, dir, "documents"),
        "source", col("text"), k = 64)),

    // Theta-sketch set algebra: pairwise source-overlap estimates
    // (intersection / union / Jaccard) computed ENTIRELY from the k-row
    // KMV sketches — the scale path for corpus_source_overlap's exact
    // key join: at 100 TB the sketches are one map-side WindowGroupLimit
    // pass, and every pairwise estimate below touches k×sources control
    // rows. Deterministic md5 draws, so estimates hash-check exactly
    "sketch_kmv_intersect" -> ((s, dir) =>
      graft.text.Sketches.kmvIntersect(t(s, dir, "documents"),
        "source", col("text"), k = 64)),

    // Mergeable bottom-k quantile sketch: each source keeps its 64
    // smallest md5-uniform draws (a deterministic uniform doc sample);
    // p50/p90 of n_chars are EXACT order statistics over the sample —
    // integer picks, no interpolation (engines disagree on interpolated
    // quantiles). Rank-≤-k compiles to a map-side WindowGroupLimit.
    "sketch_quantile_bottomk" -> ((s, dir) =>
      graft.text.Sketches.bottomKQuantiles(t(s, dir, "documents"),
        "source", col("n_chars"), "doc_id", k = 64)),

    // The merge path: global p50/p90 by re-taking the global bottom-k
    // from the per-source samples — per-shard sketches fold into the
    // exact global sample without a rescan (the KMV merge property)
    "sketch_quantile_merge" -> ((s, dir) =>
      graft.text.Sketches.bottomKQuantilesMerged(t(s, dir, "documents"),
        "source", col("n_chars"), "doc_id", k = 64)),

    // HyperLogLog distinct-count sketch: per-source cardinality from 256
    // md5-derived registers — unlike KMV it needs NO distinct pass (HLL is
    // multiplicity-insensitive) and its shuffle is capped at 256 rows per
    // group per task. Exact-integer register algebra end to end, so the
    // estimate hash-checks against the oracle, bias and all
    "sketch_distinct_hll" -> ((s, dir) =>
      graft.text.Sketches.hllDistinct(t(s, dir, "documents"),
        "source", col("text"))),

    // Count-min frequency sketch: 4×1024 md5 counters over the token
    // stream, probed for a fixed term set next to the exact counts — the
    // mergeable point-frequency answer (est ≥ true always, bounded
    // overestimate) that replaces a full vocabulary count at corpus scale.
    // Deterministic cells, so estimates hash-check, collisions and all
    "sketch_freq_cms" -> ((s, dir) => {
      import s.implicits._
      val toks = graft.ops.Caches.track(t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok")))
      val sketch = graft.text.Sketches.cmsSketch(toks, col("tok"))
      val probes = Seq("fast", "table", "scan", "join", "merge", "the",
        "zzz_unseen").toDF("term")
      val est = graft.text.Sketches.cmsEstimate(sketch, probes, "term")
      val tru = toks.join(broadcast(probes), col("tok") === col("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      est.join(tru, Seq("term"), "left")
        .select(col("term"), coalesce(col("cnt"), lit(0L)).as("cnt"), col("est_cnt"))
    }),

    // INCREMENTAL HLL maintenance: the register table is the persisted
    // state; a new-document batch sketches ONLY its own rows and merges by
    // register-wise max — nothing already sketched is ever rescanned, the
    // exact shape a 100 TB rolling-cardinality job takes. Bootstrap (2/3
    // of the corpus → parquet state, once per process) + live 1/3 batch;
    // maintained must equal the direct full-corpus sketch (same oracle as
    // sketch_distinct_hll)
    "sketch_hll_incr" -> ((s, dir) => {
      val stateDir = hllStores.getOrElseUpdate(dir, {
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_hll")).toString
        graft.text.Sketches.hllSketch(
            t(s, dir, "documents").filter(col("doc_id") % 3 =!= 0),
            Seq(col("source")), col("text"))
          .write.mode("overwrite").parquet(d)
        d
      })
      val batch = graft.text.Sketches.hllSketch(
        t(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        Seq(col("source")), col("text"))
      val merged = s.read.parquet(stateDir).unionByName(batch)
        .groupBy(col("source"), col("__reg")).agg(max(col("__mx")).as("__mx"))
      graft.text.Sketches.hllFold(merged, Seq(col("source")))
    }),

    // STREAM-MAINTAINED CMS: the counter table folded forward by a real
    // readStream (one parquet file per micro-batch) — each batch sketches
    // only its own rows and ADDS cell-wise into the durable state under
    // foreachBatch, the additive twin of sketch_hll_incr's max-merge.
    // Drained counts must equal the direct one-shot build, so this shares
    // sketch_freq_cms's exact oracle (collisions and all)
    "sketch_cms_stream" -> ((s, dir) => {
      import s.implicits._
      val stateDir = cmsStreamStores.getOrElseUpdate(dir, {
        val root = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_cmss")).toString
        val docs = t(s, dir, "documents")
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_cmss_in")).toString
        docs.select(col("doc_id"), col("text"))
          .repartition(4).write.mode("overwrite").parquet(streamDir)
        var cur: Option[String] = None
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            val toks = b.toDF()
              .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
            val batchSketch = graft.text.Sketches.cmsSketch(toks, col("tok"))
            val merged = cur match {
              case Some(p) => s.read.parquet(p).unionByName(batchSketch)
                .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))
              case None => batchSketch
            }
            val out = s"$root/b$id"
            merged.write.mode("overwrite").parquet(out)
            cur = Some(out)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cur.getOrElse(sys.error("empty stream"))
      })
      val sketch = s.read.parquet(stateDir)
      val toks = graft.ops.Caches.track(t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok")))
      val probes = Seq("fast", "table", "scan", "join", "merge", "the",
        "zzz_unseen").toDF("term")
      val est = graft.text.Sketches.cmsEstimate(sketch, probes, "term")
      val tru = toks.join(broadcast(probes), col("tok") === col("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      est.join(tru, Seq("term"), "left")
        .select(col("term"), coalesce(col("cnt"), lit(0L)).as("cnt"), col("est_cnt"))
    }),

    // STREAMING WINDOWED CARDINALITY: per-hour distinct users from HLL
    // registers folded forward under a real readStream — each micro-batch
    // sketches only its own events and max-merges into durable state; the
    // drained registers must equal the direct batch sketch (same
    // exact-integer oracle family as sketch_distinct_hll)
    "events_uniques_stream" -> ((s, dir) => {
      val stateDir = hllStreamStores.getOrElseUpdate(dir, {
        val root = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_hlls")).toString
        val streamDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_hlls_in")).toString
        t(s, dir, "events")
          .select((expr("ts div 3600000000000") * 3600).as("hour"), col("user_id"))
          .repartition(4).write.mode("overwrite").parquet(streamDir)
        var cur: Option[String] = None
        val q = s.readStream.schema(s.read.parquet(streamDir).schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
          .writeStream
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            val batchSketch = graft.text.Sketches.hllSketch(
              b.toDF(), Seq(col("hour")), col("user_id"))
            val merged = cur match {
              case Some(p) => s.read.parquet(p).unionByName(batchSketch)
                .groupBy(col("hour"), col("__reg")).agg(max(col("__mx")).as("__mx"))
              case None => batchSketch
            }
            val out = s"$root/b$id"
            merged.write.mode("overwrite").parquet(out)
            cur = Some(out)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cur.getOrElse(sys.error("empty stream"))
      })
      graft.text.Sketches.hllFold(s.read.parquet(stateDir), Seq(col("hour")))
    }),

    // JOIN-SIZE estimation from CMS inner products (AMS/CMS sketch
    // estimators, Cormode & Muthukrishnan): |A ⋈ B| ≈ min over hash rows
    // of Σ_c cmsA[r,c]·cmsB[r,c] — never an underestimate. Each side folds
    // to 4096 counters, so two corpus-sized join inputs reduce to a
    // control-data product: the planner-side cardinality answer that costs
    // two narrow scans instead of the join itself
    "sketch_join_size" -> ((s, dir) => {
      val ords = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val skA = graft.text.Sketches.cmsSketch(ords, col("k"))
        .withColumnRenamed("cnt", "__ca")
      val skB = graft.text.Sketches.cmsSketch(cust, col("k"))
        .withColumnRenamed("cnt", "__cb")
      val est = skA.join(skB, Seq("r", "c"))
        .groupBy(col("r")).agg(sum(col("__ca") * col("__cb")).as("__ip"))
        .agg(min(col("__ip")).as("est_size"))
      val tru = ords.join(cust, Seq("k")).agg(count(lit(1)).as("true_size"))
      tru.crossJoin(est)
    }),

    // HLL sketch MERGE: per-source register sets fold by register-wise max
    // into the global estimate exactly (the HLL union property — the
    // oracle computes the direct global sketch; merged must equal it)
    "sketch_hll_merge" -> ((s, dir) =>
      graft.text.Sketches.hllMerge(t(s, dir, "documents"),
        "source", col("text"))),

    // DSIR importance weights (Xie et al. 2023): per-document log ratio of
    // target-vs-raw hashed-ngram multinomials — the principled "does this
    // raw document look like my target distribution" selection signal.
    // Target slice here: the English documents
    "text_dsir" -> ((s, dir) =>
      Curation.dsirWeights(t(s, dir, "documents"), "text", "doc_id",
        isTarget = col("lang") === "en")),

    // Bloom-filter decontamination pre-pass: benchmark 5-gram set folded
    // into a 2^16-bit md5 bitset probed as a pure expression — no join, no
    // exchange on the corpus side. Supersets decon_overlap's exact hits
    // (asserted in SketchesSpec); the deterministic bitset means the oracle
    // reproduces the false positives bit-for-bit
    "decon_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Sketches.contaminationBloom(docs,
        docs.filter(col("doc_id") % 97 === 0), "text", "doc_id", n = 5)
    }),

    // CURRICULUM training order: CCNet quality buckets (head → middle →
    // tail) first, reproducible md5 shuffle within each — the dense
    // position stream a curriculum-scheduled training run reads in order.
    // Sharded two-pass rank: no single-partition sort
    "curriculum_order" -> ((s, dir) => {
      val b = Curation.lmBuckets(t(s, dir, "documents"), "text", "doc_id", "lang")
      val pri = when(col("bucket") === "head", 0)
        .when(col("bucket") === "middle", 1).otherwise(2)
      graft.text.Sketches.curriculumOrder(
        b.select(col("doc_id"), pri.as("p")), "doc_id", col("p"))
    }),

    // Deterministic global training order: dense position 0..n-1 by rank
    // of an md5-uniform draw — the reproducible corpus shuffle a training
    // run reads back in range slices. Sharded two-pass rank: no
    // single-partition sort anywhere in the plan
    "shuffle_order" -> ((s, dir) =>
      graft.text.Sketches.globalOrder(t(s, dir, "documents"),
        "doc_id", nShards = 16)),

    // Training-shard EXPORT manifest: documents land in fixed-size shards
    // by their deterministic global order; each shard's row-count, token
    // total and an md5 over its ordered id list make the export
    // verifiable end-to-end (re-running the pipeline must reproduce every
    // shard digest bit-for-bit). Per-shard state is bounded by the shard
    // size, so the manifest aggregation never holds more than one shard's
    // ids on a reducer
    "export_shards" -> ((s, dir) => {
      val ordered = graft.text.Sketches.globalOrder(t(s, dir, "documents"),
        "doc_id", nShards = 16)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(TextFunctions.subwordTokens(col("text"))).cast("long").as("n_tok"))
      ordered.join(docs, "doc_id")
        .withColumn("shard", expr("pos div 100"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tok"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(struct(col("pos"), col("doc_id")))),
              x => x.getField("doc_id").cast("string"))).cast("binary"))
            .as("ids_md5"))
    }),

    // Interchange-format round-trips (sources/Formats): export the corpus
    // as line-JSON / quote-all CSV / ORC shards and read it back with an
    // EXPLICIT schema (no inference scan), then fold to per-(source, lang)
    // content digests — row count, text byte sum, DISTINCT text-md5 count,
    // id sum. Matching the oracle computed from the parquet originals
    // proves byte-level fidelity of the whole write+read path; BOTH
    // directions run live per invocation (the export is the op)
    // WARC ingestion — the crawl-native container of web-scale training
    // data: documents staged ONCE per scale dir as member-per-record
    // .warc.gz shards (each record its own gzip member, written from
    // EXECUTORS — nothing corpus-scale touches the driver), then read
    // back through the real two-layer decode: per-member RFC 1952 walk
    // (header flags, raw-deflate inflate, CRC-32 + ISIZE verified) and
    // the strict WARC/1.0 record grammar. Member-per-record is what
    // makes a multi-GB crawl file SPLITTABLE — each record carries its
    // member's byte offset, the boundary a distributed reader hands the
    // next task (mid-file resume spec-pinned in WarcSpec). The oracle
    // re-derives every record from the documents table
    "fmt_warc_roundtrip" -> ((s, dir) => {
      val staged = warcStagedDir(s, dir)
      // SPLITTABLE read (WarcSource): member-offset index built once per
      // staged dir, then one task per ~64 KiB member range — a production
      // 1 GB shard fans across ~8k tasks instead of ONE whole-blob task
      // holding the file on heap (64 KiB keeps the fan-out real at test
      // scale; production callers take the 128 MiB default)
      graft.sources.WarcSource.read(s, staged, splitBytes = 64L * 1024)
        .select(
          expr("CAST(substring_index(url, '/', -1) AS BIGINT)").as("doc_id"),
          octet_length(col("payload")).cast("long").as("content_length"),
          md5(col("payload")).as("payload_md5"), col("content_type"))
    }),

    // CONTINUOUS crawl ingestion — the manifest-stream shape a production
    // crawl runs (shard paths arrive on a queue as crawlers finish them):
    // a file-stream of manifest rows (one micro-batch per manifest file,
    // maxFilesPerTrigger=1) drains through foreachBatch, and each batch
    // decodes ONLY its newly-arrived shards via the splittable reader
    // (offset index built in-flight per batch — a batch's shards are
    // read once, so nothing persists). Stream ≡ batch: the oracle is
    // fmt_warc_roundtrip's, verbatim
    "warc_ingest_stream" -> ((s, dir) => {
      val staged = warcStagedDir(s, dir)
      val manifest = warcManifestDirs.getOrElseUpdate(dir, {
        import s.implicits._
        val d = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_warc_manifest"))
        val shards = new java.io.File(staged).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".warc.gz"))
          .map(_.getAbsolutePath).sorted.toSeq
        val batches = shards.grouped(2).toSeq
          .map(g => g.map(Tuple1(_)).toDF("path"))
        graft.streaming.StatefulSessions.stageOrderedFiles(s,
          java.nio.file.Paths.get(d.toString), batches.head, batches.tail)
        d.toString
      })
      val outDir = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc_ingest")).toString
      val ckpt = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc_ingest_ck")).toString
      val q = s.readStream.schema("path STRING")
        .option("maxFilesPerTrigger", 1).parquet(manifest)
        .writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          val paths = batch.collect().map(_.getString(0)).toSeq // shard list
          if (paths.nonEmpty)
            graft.sources.WarcSource.readFiles(s, paths, splitBytes = 64L * 1024)
              .select(
                expr("CAST(substring_index(url, '/', -1) AS BIGINT)")
                  .as("doc_id"),
                octet_length(col("payload")).cast("long").as("content_length"),
                md5(col("payload")).as("payload_md5"), col("content_type"))
              .write.mode("append").parquet(outDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    "fmt_jsonl_roundtrip" -> ((s, dir) => {
      val out = fmtTmp("graft_fmt_jsonl")
      graft.sources.Formats.writeJsonl(fmtCols(s, dir), out, shards = 8)
      fmtDigest(graft.sources.Formats.readJsonl(s, out, FmtDdl))
    }),
    "fmt_csv_roundtrip" -> ((s, dir) => {
      val out = fmtTmp("graft_fmt_csv")
      graft.sources.Formats.writeCsv(fmtCols(s, dir), out, shards = 8)
      fmtDigest(graft.sources.Formats.readCsv(s, out, FmtDdl))
    }),
    "fmt_orc_roundtrip" -> ((s, dir) => {
      val out = fmtTmp("graft_fmt_orc")
      graft.sources.Formats.writeOrc(fmtCols(s, dir), out, shards = 8)
      fmtDigest(graft.sources.Formats.readOrc(s, out, FmtDdl))
    }),

    // Hive-style partitioned layout + plan-time directory pruning: events
    // written partitionBy(event_type) once per dir (the layout is the
    // fixture; FormatsSpec pins PartitionFilters in the scan), then the
    // hourly rollup of ONE partition — the scan never opens the other
    // partitions' files, the coarse-grained complement of layout_zorder's
    // file-stat skipping
    "layout_partition_prune" -> ((s, dir) => {
      val pdir = partitionedEventsDir(s, dir)
      graft.sources.Formats.readPartitioned(s, pdir)
        .filter(col("event_type") === "error")
        .groupBy(expr("ts div 3600000000000").as("hour_idx"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select((col("hour_idx") * 3600).as("hour"), col("cnt"), col("sum_value"))
    }),

    // Per-source token-length quantiles (exact interpolated percentiles) —
    // the length-distribution panel of a corpus data card. Exact is safe
    // here because the aggregation state is bounded by DISTINCT token
    // counts, not rows; unbounded-domain metrics would use approx_percentile
    "corpus_quantiles" -> ((s, dir) => {
      val ntok = TextFunctions.tokenCount(col("text")).cast("long")
      t(s, dir, "documents").groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(percentile(ntok, lit(0.25)), 4).as("p25_tokens"),
          round(percentile(ntok, lit(0.5)), 4).as("p50_tokens"),
          round(percentile(ntok, lit(0.9)), 4).as("p90_tokens"),
          round(percentile(ntok, lit(0.99)), 4).as("p99_tokens"))
    }),

    // Trained k-means clustering — 2 QUANTIZED Lloyd iterations from the
    // id-ordered seed (Ivf.trainQuantized): the curation substrate of
    // cluster-balanced sampling and SemDeDup-style semantic dedup, here as
    // a first-class clustering op whose TRAINED model is itself
    // reproducible: per-iteration centroid means quantize to 6 decimals,
    // so the oracle unrolls the same two iterations and hash-matches the
    // final assignment exactly. Centroids are collected control data;
    // assignment is a narrow projection (no join, no shuffle)
    "cluster_kmeans" -> ((s, dir) =>
      Ivf.assignCells(t(s, dir, "embeddings"), "vec_id", "embedding",
        kmeansCentroids(s, dir))),

    // k-means|| (Bahmani et al., VLDB 2012): the SCALABLE seeding —
    // k-means++'s k serial corpus scans replaced by 2 distributed
    // oversampling rounds (expected l=2k candidates each), candidate
    // weighting by attraction counts, greedy weight-rank reduction to k,
    // one quantized Lloyd polish. Every stochastic choice is derandomized
    // into md5 arithmetic over EXACT integer micro-unit costs (sampled
    // iff u20·φ < l·cost·2^20, compared in decimal(38,0)/HUGEINT), so
    // the oracle replays the complete seeding — including which
    // candidates each round picks — bit for bit. Each round is one
    // narrow corpus scan; candidates are control data at any corpus size
    "cluster_kmeanspar" -> ((s, dir) =>
      graft.sim.KmeansPar.cluster(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8)),

    // The coreset PAYOFF: weighted k-means trained on the control-sized
    // coreset (driver-side — the coreset fits anywhere BY CONSTRUCTION),
    // then ONE distributed assignment over the full corpus. Two corpus
    // scans total vs one per Lloyd iteration for full k-means — the
    // 100 TB clustering recipe. Weighted means ride an exact integer
    // ladder (⌊Σ w_nano·x_micro / Σ w_nano⌋), so training replays in the
    // oracle bit for bit
    "cluster_coreset_kmeans" -> ((s, dir) =>
      graft.sim.KmeansPar.coresetKmeans(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, m = 64)),

    // Lightweight coreset (Bachem–Lucic–Krause, KDD 2018): a weighted
    // subsample preserving k-means cost — q(x) = 1/(2n) + cost(x)/(2φ)
    // around the quantized corpus mean, weight 1/(m·q). ONE corpus scan,
    // pure filter + projection; the corpus-reduction step that makes
    // cluster training control-sized at 100 TB. Derandomized like
    // cluster_kmeanspar: exact integer draw u20·2nφ < m·(φ+n·c)·2²⁰ and
    // an integer-nano weight ladder (div-truncated both engines), so the
    // oracle replays sample AND weights exactly
    "sample_coreset" -> ((s, dir) =>
      graft.sim.KmeansPar.lightweightCoreset(t(s, dir, "embeddings"),
        "vec_id", "embedding", m = 64)),

    // Top-principal-component projection (dominant-direction probe /
    // ABTT de-biasing substrate): the centered Gram matrix aggregates
    // DISTRIBUTED (d² state, map-side combined — row count never touches
    // the driver), the 8-step power iteration runs on the collected 64×64
    // control matrix with index-ordered folds, and the projection is a
    // narrow literal expression. μ and G quantize after their distributed
    // sums; everything after is bit-identical cross-engine by op order
    "embed_pca" -> ((s, dir) => {
      val (mu, v1) = pcaModel(s, dir)
      graft.sim.Pca.pc1ProjectionWith(t(s, dir, "embeddings"),
        "vec_id", "embedding", mu, v1)
    }),

    // INCREMENTALLY-MAINTAINED PCA: the fit's sufficient statistics
    // (n, Σx, Σxxᵀ) are an abelian group over EXACT INTEGER micro-units,
    // so a change batch adds its vectors' moments and retracts deleted
    // ones with no corpus re-read — and maintained ≡ rebuilt is exact,
    // not merge-order-approximate. This query converges a corrupted
    // state (a third missing, scaled phantoms present) by one delta
    // batch, refits (floored integer means, integer centered scatter,
    // the usual power iteration), and projects; the oracle replays the
    // full-corpus moments directly
    "embed_pca_incr" -> ((s, dir) => {
      val (mu, v1) = pcaIncrCache.getOrElseUpdate(dir, {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val phantoms = e.filter(col("vec_id") % 9 === 4)
          .withColumn("embedding",
            transform(col("embedding"), x => x * lit(0.5f)))
        val stateDir = graft.core.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft_pcam")).toString
        graft.sim.Pca.mergeMoments(
            graft.sim.Pca.momentDeltas(
              e.filter(col("vec_id") % 3 =!= 0), "embedding", 64),
            graft.sim.Pca.momentDeltas(phantoms, "embedding", 64))
          .write.mode("overwrite").parquet(stateDir)
        val merged = graft.sim.Pca.mergeMoments(
          s.read.parquet(stateDir),
          graft.sim.Pca.momentDeltas(
            e.filter(col("vec_id") % 3 === 0), "embedding", 64),
          graft.sim.Pca.momentDeltas(phantoms, "embedding", 64, sign = -1))
        graft.sim.Pca.fitFromMoments(
          merged.as[(Int, Long)].collect().toSeq, 64)
      })
      graft.sim.Pca.pc1ProjectionMoments(t(s, dir, "embeddings"),
        "vec_id", "embedding", mu, v1)
    }),

    // ---- graph analytics over item co-occurrence (market basket) --------
    // Build the thresholded edge list ONCE per scale dir (cached) — the
    // graph family shares it the way ANN queries share a built index.

    // Support-thresholded co-occurrence edges: parts bought together in
    // ≥ 2 orders. ONE shuffle + bounded in-row pair expansion (never a
    // fact-table self-join); the threshold prunes ~1.2M noise pairs to
    // ~3.9k edges at sf0.1 before anything downstream runs
    "graph_copurchase" -> ((s, dir) => copurchaseEdges(s, dir)),

    // Undirected degree per node of the thresholded graph
    "graph_degree" -> ((s, dir) =>
      graft.graph.Graph.degrees(copurchaseEdges(s, dir))),

    // Association rules over each edge, both directions: support,
    // confidence, lift — deterministic single-division FP, identical op
    // order in the oracle
    "graph_basket_rules" -> ((s, dir) =>
      graft.graph.Graph.basketRules(copurchaseEdges(s, dir),
        graft.graph.Graph.itemGroupCounts(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey"),
        nOrderGroups(s, dir))),

    // Per-node triangle counts: forward-edge enumeration on the oriented
    // (p1 < p2) edge list — equi-joins only, each triangle counted once
    "graph_triangles" -> ((s, dir) =>
      graft.graph.Graph.triangleCounts(copurchaseEdges(s, dir))),

    // 3 unrolled PageRank power iterations on the undirected thresholded
    // graph — the whole loop runs in integer nano-units (BIGINT sums are
    // associative), so the result is bit-identical under any merge order
    // and across engines
    "graph_pagerank" -> ((s, dir) =>
      graft.graph.Graph.pageRank(copurchaseEdges(s, dir), iters = 3)),

    // Common-neighbor Jaccard similarity between graph nodes — the
    // link-prediction primitive: wedge enumeration through the shared
    // neighbor (equi-joins only, per-node cost bounded by degree², which
    // the support threshold already bounds), never an all-pairs scan
    "graph_common_neighbors" -> ((s, dir) =>
      graft.graph.Graph.commonNeighborSim(copurchaseEdges(s, dir))),

    // Connected components of the co-purchase graph. driverEdgeLimit = 0
    // forces the DISTRIBUTED star-contraction loop (O(log n) label
    // propagation + pointer jumping) so the scale path is what the oracle
    // hash-checks — the driver union-find shortcut stays covered by
    // ComponentsSpec's equality property: (node, cluster) with cluster =
    // the component's smallest node id
    "graph_components" -> ((s, dir) =>
      graft.dedup.Components.connectedComponents(
        copurchaseEdges(s, dir).select(col("p1"), col("p2")), "p1", "p2",
        driverEdgeLimit = 0L)),

    // k-core decomposition (k=3): iterative low-degree peeling to the
    // fixpoint — the graph-denoising gate that keeps the dense core of a
    // co-occurrence graph. Each round shrinks the edge list (degree agg +
    // two anti-joins, lineage checkpoint-truncated); rounds ≈ peeling
    // depth. The oracle replays the peel as exactly 20 MATERIALIZED CTE
    // rounds (extra rounds past convergence are no-ops), so the Spark side
    // PINS the same bound: a graph that peels deeper aborts loudly here
    // instead of hash-mismatching opaquely against the 20-round replay
    "graph_kcore" -> ((s, dir) =>
      graft.graph.Graph.kCore(copurchaseEdges(s, dir), k = 3L, maxRounds = 20)),

    // ---- behavioral time-series (events) --------------------------------

    // RFM segmentation: per-user recency / frequency / monetary plus
    // quartile scores. Scores come from EXACT percentile boundaries
    // (one agg → 3 doubles of control data, broadcast back as literals-
    // via-crossJoin) and a narrow comparison — NOT ntile, whose global
    // ordering is a single-partition sort at scale. Equal-to-boundary
    // lands in the lower bucket; both engines interpolate quantiles with
    // the same formula, so the scores hash-match
    "events_rfm" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"),
          col("value"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("frequency"),
          round(sum(col("value")), 2).as("monetary"))
      val qs = base.agg(
        percentile(col("last_day"), lit(0.25)).as("r1"),
        percentile(col("last_day"), lit(0.5)).as("r2"),
        percentile(col("last_day"), lit(0.75)).as("r3"),
        percentile(col("frequency"), lit(0.25)).as("f1"),
        percentile(col("frequency"), lit(0.5)).as("f2"),
        percentile(col("frequency"), lit(0.75)).as("f3"),
        percentile(col("monetary"), lit(0.25)).as("m1"),
        percentile(col("monetary"), lit(0.5)).as("m2"),
        percentile(col("monetary"), lit(0.75)).as("m3"))
      def score(m: Column, a: Column, b: Column, c: Column): Column =
        lit(1) + (m > a).cast("int") + (m > b).cast("int") + (m > c).cast("int")
      base.crossJoin(broadcast(qs)).select(col("user_id"),
        (lit(20512L) - col("last_day")).as("recency_days"), // fixed horizon
        col("frequency"), col("monetary"),
        score(col("last_day"), col("r1"), col("r2"), col("r3")).as("r_score"),
        score(col("frequency"), col("f1"), col("f2"), col("f3")).as("f_score"),
        score(col("monetary"), col("m1"), col("m2"), col("m3")).as("m_score"))
    }),

    // Cohort retention matrix: users grouped by first-seen day, distinct
    // actives per (cohort, day-offset) — integer counting, hash-exact.
    // Two shuffles (cohort min, matrix count); the user→cohort join
    // broadcasts at dimension scale and shuffles on user_id beyond it
    "events_retention" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("users"))
    }),

    // Per-user sliding mean over the last 5 events (ROWS frame, ordered by
    // event time with id tiebreak) — the trailing-window smoothing of a
    // behavioral feature pipeline. Partition-local window, one shuffle on
    // user_id
    "events_moving_avg" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-4, org.apache.spark.sql.expressions.Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("us"), col("value"))
        .select(col("user_id"), col("event_id"), col("us"),
          round(avg(col("value")).over(w), 4).as("mov_avg"))
    })
  )

  /** Thresholded co-purchase edge list, derived ONCE per scale dir and
    * PERSISTED (parquet) — the shared substrate of the graph_* family
    * (build once, analyze many, like the ANN indexes; a cached DataFrame
    * would silently recompute after any clearCache). */
  private val copurchaseEdgeCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val path = copurchaseEdgeCache.getOrElseUpdate(dir, {
      val p = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_graph")).toString
      graft.graph.Graph.coOccurrenceEdges(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Distinct order-group count (control scalar), memoized per dir. */
  private val orderGroupCount =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def nOrderGroups(s: SparkSession, dir: String): Long =
    orderGroupCount.getOrElseUpdate(dir,
      t(s, dir, "lineitem").select(col("l_orderkey")).distinct().count())

  /** Shared audit frame for pipeline_audit / pipeline_funnel: (doc_id,
    * stage) where stage is the first failing curation gate ('dup' near-dup
    * loser, 'lang', 'quality') or 'pass'. Gate order and thresholds match
    * pipeline_filter exactly — audit('pass') ≡ pipeline_filter's keep set. */
  private def pipelineAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = DocDedup.nearDupPairs(docs, "text", "doc_id",
      threshold = 0.8, numHashes = 32, bands = 8, maxBucketSize = 10000)
    val labels = Components.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("__cc_id"), col("cluster").as("__cc_cluster"))
    docs.join(labels, docs("doc_id") === col("__cc_id"), "left")
      .select(col("doc_id"),
        when(col("__cc_id").isNotNull && col("__cc_cluster") =!= col("doc_id"),
          lit("dup"))
          .when(TextFunctions.langId(col("text")) =!= "en", lit("lang"))
          .when(TextFunctions.qualityScore(col("text")) < 0.55, lit("quality"))
          .otherwise(lit("pass")).as("stage"))
  }

  /** Fitted quality-probe weights per scale dir — train once, score many. */
  private val probeModelCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.text.Probe.Weights]
  private def probeModel(s: SparkSession, dir: String): graft.text.Probe.Weights =
    probeModelCache.getOrElseUpdate(dir,
      graft.text.Probe.fit(t(s, dir, "documents"), "text", "doc_id"))

  /** Staged stream-input files per dir (quality_probe_stream) — fixture
    * only; the drain itself runs live on every invocation. */
  private val probeStreamStage =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val mmStreamStage =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Staged member-per-record .warc.gz shards, one set per scale dir. */
  private val warcStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Stage (once per scale dir) the documents table as member-per-record
    * `.warc.gz` shards written from EXECUTORS — the crawl-native fixture
    * behind fmt_warc_roundtrip and dedup_url. */
  private def warcStagedDir(s: SparkSession, dir: String): String =
    warcStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc")).toString
      t(s, dir, "documents")
        .repartition(4, pmod(col("doc_id"), lit(4L)))
        .select(col("doc_id").cast("long"),
          encode(col("text"), "UTF-8").as("__b"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val recs = it.map { case (id, b) =>
            (s"https://corpus.example/doc/$id", "2026-01-01T00:00:00Z",
              "text/plain", s"<urn:uuid:doc-$id>", b)
          }.toSeq
          if (recs.nonEmpty) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, f"part-$pid%04d.warc.gz"),
              graft.sources.Warc.writeGz(recs))
          }
          Iterator.single(1)
        }.count()
      d
    })

  /** Staged MIXED-RECORD crawl shards, one set per scale dir. */
  private val warcMixedStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Stage (once per scale dir) a REAL-SHAPED crawl fixture: each shard
    * opens with a `warcinfo` record (no WARC-Target-URI — the record
    * that kills a strict response-only reader on byte one of any real
    * Common Crawl file), then per doc a `request` record and a
    * `response` record whose payload is a full HTTP/1.1 MESSAGE
    * (status line varied by doc_id residue, Content-Length or chunked
    * framing, charset declared in the header for even ids only), plus
    * a `revisit` record for every 10th doc. Written from executors,
    * member-per-record — splittable by construction. */
  private def warcMixedStagedDir(s: SparkSession, dir: String): String =
    warcMixedStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc_mixed")).toString
      t(s, dir, "documents")
        .repartition(4, pmod(col("doc_id"), lit(4L)))
        .select(col("doc_id").cast("long"),
          encode(htmlPage(col("doc_id"), col("text")), "UTF-8").as("__b"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          import graft.sources.{Http, Warc}
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new java.io.ByteArrayOutputStream()
          def member(b: Array[Byte]): Unit = out.write(Warc.gzipMember(b))
          // shard header record, like a real crawler writes — emitted
          // even for a docless shard, so the warcinfo census is exactly
          // one per partition (hash repartition may leave some of the 4
          // residue classes sharing a partition)
          member(Warc.recordBytesOf("warcinfo", Seq(
            "WARC-Date" -> "2026-01-01T00:00:00Z",
            "WARC-Record-ID" -> s"<urn:uuid:info-$pid>",
            "Content-Type" -> "application/warc-fields"),
            "software: graft/1.0\r\n".getBytes("US-ASCII")))
          it.foreach { case (id, b) =>
            val url = s"https://corpus.example/doc/$id"
            member(Warc.recordBytesOf("request", Seq(
              "WARC-Target-URI" -> url,
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "WARC-Record-ID" -> s"<urn:uuid:req-$id>",
              "Content-Type" -> "application/http; msgtype=request"),
              s"GET /doc/$id HTTP/1.1\r\nHost: corpus.example\r\n\r\n"
                .getBytes("US-ASCII")))
            val (st, reason) =
              if (id % 7 == 0) (404, "Not Found")
              else if (id % 7 == 3) (301, "Moved Permanently")
              else (200, "OK")
            val ct = if (id % 2 == 0) "text/html; charset=UTF-8"
                     else "text/html"
            member(Warc.recordBytes(url, "2026-01-01T00:00:00Z",
              "application/http; msgtype=response", s"<urn:uuid:doc-$id>",
              Http.responseBytes(st, reason, Seq(
                "Content-Type" -> ct, "Server" -> "graft/1.0",
                "X-Crawl-Id" -> id.toString), b,
                chunkSize = if (id % 5 == 0) 257 else 0)))
            if (id % 10 == 0)
              member(Warc.recordBytesOf("revisit", Seq(
                "WARC-Target-URI" -> url,
                "WARC-Date" -> "2026-01-02T00:00:00Z",
                "WARC-Record-ID" -> s"<urn:uuid:rev-$id>",
                "Content-Type" -> "message/http"), Array.emptyByteArray))
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, f"part-$pid%04d.warc.gz"),
            out.toByteArray)
          Iterator.single(1)
        }.count()
      d
    })

  /** Staged LEGACY-CHARSET crawl shards, one set per scale dir. */
  private val warcCharsetStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Per-charset non-ASCII markers — each provably decodes ONLY under
    * its own charset (the cp1252 marker's euro is byte 0x80, which is
    * malformed UTF-8 and a C1 control in latin-1; the utf-8 marker
    * carries multibyte CJK). Oracle twin: [[CharsetMarkerSql]]. */
  private val CharsetMarkers = Array(
    " café 中文 €",  // utf-8: café 中文 €
    " café — €",        // windows-1252: café — €
    " café ½ü")         // iso-8859-1: café ½ü
  private val CharsetNames =
    Array("utf-8", "windows-1252", "iso-8859-1")
  /** Stage (once per scale dir) the charset fixture: response records
    * whose HTTP bodies are the doc text + a charset-proving marker,
    * ENCODED in utf-8 / windows-1252 / iso-8859-1 by doc_id%3, with the
    * declaration arriving the three ways real crawls declare it —
    * Content-Type header param (even ids), `<meta charset>` prefix
    * (ids ≡ 3,5 mod 6), or not at all (ids ≡ 1 mod 6 — the fallback
    * path, and the bytes really are cp1252, so the fallback guess is
    * CORRECT and the decode proves it). ~10-20% of a real crawl is
    * legacy-charset; mis-decoding it silently poisons every downstream
    * gate, which is why the decode is oracle-checked by md5. */
  private def warcCharsetStagedDir(s: SparkSession, dir: String): String =
    warcCharsetStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc_cs")).toString
      t(s, dir, "documents")
        .repartition(4, pmod(col("doc_id"), lit(4L)))
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          import graft.sources.{Http, Warc}
          val recs = it.map { case (id, text) =>
            val k = (id % 3).toInt
            val cs = CharsetNames(k)
            val declared = // header | meta | none, by residue
              if (id % 6 == 1) "none"
              else if (id % 2 == 0) "header" else "meta"
            val prefix =
              if (declared == "meta") s"""<meta charset="$cs">""" else ""
            val body = (prefix + text + CharsetMarkers(k))
              .getBytes(java.nio.charset.Charset.forName(cs))
            val ct = if (declared == "header") s"text/html; charset=$cs"
                     else "text/html"
            val http = Http.responseBytes(200, "OK",
              Seq("Content-Type" -> ct), body)
            (s"https://corpus.example/doc/$id", "2026-01-01T00:00:00Z",
              "application/http; msgtype=response",
              s"<urn:uuid:doc-$id>", http)
          }.toSeq
          if (recs.nonEmpty) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, f"part-$pid%04d.warc.gz"),
              Warc.writeGz(recs))
          }
          Iterator.single(1)
        }.count()
      d
    })

  /** Staged WET-style sidecar shards, one set per scale dir. */
  private val wetStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Stage (once per scale dir) the EXTRACTED-TEXT sidecar the rest of
    * the crawl ecosystem consumes (`.wet.gz` shape): the pipeline_web
    * funnel's content text — the same htmlBlocks → boilerplate-drop →
    * join chain — written back as member-per-record `conversion`
    * records (splittable by construction, like everything this engine
    * writes). Executors compute the content via the pure expression
    * chain and serialize their own shards — no driver bottleneck. */
  private def wetStagedDir(s: SparkSession, dir: String): String =
    wetStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_wet")).toString
      t(s, dir, "documents")
        .repartition(4, pmod(col("doc_id"), lit(4L)))
        .select(col("doc_id").cast("long"),
          encode(graft.text.TextFunctions.htmlContentText(
            graft.text.TextFunctions.htmlBlocks(
              htmlPage(col("doc_id"), col("text")))), "UTF-8").as("__b"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val recs = it.map { case (id, b) =>
            (s"https://corpus.example/doc/$id", "2026-01-01T00:00:00Z",
              "text/plain", s"<urn:uuid:wet-$id>", b)
          }.toSeq
          if (recs.nonEmpty) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, f"part-$pid%04d.wet.warc.gz"),
              graft.sources.Warc.writeGz(recs, warcType = "conversion"))
          }
          Iterator.single(1)
        }.count()
      d
    })

  /** Staged WAT-style metadata sidecar shards, one set per scale dir. */
  private val watStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Stage (once per scale dir) the WAT-style sidecar: one WARC
    * `metadata` record per doc whose JSON payload carries the page URL
    * and the RAW extracted outlink hrefs (the envelope summary a WAT
    * generator records so consumers never re-parse the HTML). The JSON
    * is built by expressions (to_json over the same href extraction the
    * HTML path runs), serialized member-per-record. */
  private def watStagedDir(s: SparkSession, dir: String): String =
    watStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_wat")).toString
      t(s, dir, "documents")
        .repartition(4, pmod(col("doc_id"), lit(4L)))
        .select(col("doc_id").cast("long"),
          encode(to_json(struct(
            concat(lit("https://corpus.example/doc/"), col("doc_id"))
              .as("url"),
            regexp_extract_all(htmlLinkPage(col("doc_id")),
              lit("(?i)<a[^>]*href=\"([^\"]*)\""), lit(1)).as("links"))),
            "UTF-8").as("__b"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val recs = it.map { case (id, b) =>
            graft.sources.Warc.recordBytesOf("metadata", Seq(
              "WARC-Target-URI" -> s"https://corpus.example/doc/$id",
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "WARC-Record-ID" -> s"<urn:uuid:wat-$id>",
              "Content-Type" -> "application/json"), b)
          }.toSeq
          if (recs.nonEmpty) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val out = new java.io.ByteArrayOutputStream()
            recs.foreach(r => out.write(graft.sources.Warc.gzipMember(r)))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, f"part-$pid%04d.wat.warc.gz"),
              out.toByteArray)
          }
          Iterator.single(1)
        }.count()
      d
    })

  /** Staged torn-shard fixture dirs, one set per scale dir. */
  private val warcTornStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Stage (once per scale dir) four RESIDUE-KEYED response shards —
    * file r holds exactly the docs with doc_id%4 == r, sorted, so the
    * oracle can derive per-file counts — and then TRUNCATE shard 1
    * five bytes short: the file a crawler was writing when it died,
    * cut mid-trailer of its final member. */
  private def warcTornStagedDir(s: SparkSession, dir: String): String =
    warcTornStageDirs.getOrElseUpdate(dir, {
      import s.implicits._
      val d = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_warc_torn")).toString
      t(s, dir, "documents")
        .select(col("doc_id").cast("long"),
          encode(col("text"), "UTF-8").as("__b"))
        .as[(Long, Array[Byte])]
        .groupByKey(_._1 % 4)
        .flatMapGroups { (r, docs) =>
          val sorted = docs.toArray.sortBy(_._1)
          val blob = graft.sources.Warc.writeGz(sorted.toSeq.map {
            case (id, b) =>
              (s"https://corpus.example/doc/$id", "2026-01-01T00:00:00Z",
                "text/plain", s"<urn:uuid:doc-$id>", b)
          })
          val bytes = if (r == 1) blob.dropRight(5) else blob
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, f"part-$r%04d.warc.gz"), bytes)
          Iterator.single(1)
        }.count()
      d
    })

  /** Deterministic LINK-PAGE fixture: 1 + doc_id%4 anchors whose hrefs
    * arrive in messy spellings (cased host + default port, tracking
    * params, fragments, unsorted params); anchor k targets page
    * `(doc_id + 31(k+1)) % 401`. The oracle derives the same canonical
    * edges from the arithmetic alone. */
  private def htmlLinkPage(docId: Column): Column = {
    val cnt = pmod(docId, lit(4L)) + lit(1L)
    def tnum(k: Int) = pmod(docId + lit(31L * (k + 1)), lit(401L))
    def target(k: Int) = tnum(k).cast("string")
    val a0 = concat(lit("<a href=\"https://corpus.example/page/"),
      target(0), lit("\">l0</a>"))
    // anchors 1 and 3 target SUBDOMAINS of multi-label-suffix sites —
    // blog.siteN.co.uk and www.siteN.co.uk must roll up to ONE
    // registrable domain in the link graph
    val a1 = concat(
      lit("<a class='nav' href=\"HTTPS://Blog.Site"),
      pmod(tnum(1), lit(5L)).cast("string"), lit(".CO.UK:443/page/"),
      target(1), lit("?utm_source=nav\">l1</a>"))
    val a2 = concat(lit("<a href=\"https://corpus.example/page/"),
      target(2), lit("?b=2&a=1\">l2</a>"))
    val a3 = concat(lit("<a href=\"https://www.site"),
      pmod(tnum(3), lit(5L)).cast("string"), lit(".co.uk/page/"),
      target(3), lit("#sec\">l3</a>"))
    concat(lit("<html><body><p>see "), a0,
      when(cnt >= 2, a1).otherwise(lit("")),
      when(cnt >= 3, a2).otherwise(lit("")),
      when(cnt >= 4, a3).otherwise(lit("")),
      lit("</p></body></html>"))
  }

  /** Deterministic MULTI-HOST messy URL: cased subdomain + site + public
    * suffix from doc_id residues, default port attached — the suffixes
    * include MULTI-LABEL rules (co.uk, com.au, github.io), so rollup by
    * raw last-two-labels would wrongly key on `co.uk`; 30 registrable
    * domains × 2 subdomain shapes after normalization. */
  private def messyHostUrl(docId: Column): Column = {
    val sub = when(pmod(docId, lit(2L)) === 0, lit("WWW."))
      .otherwise(lit("cdn.Assets."))
    val m6 = pmod(docId, lit(6L))
    val tld = when(m6 === 0, lit("COM")).when(m6 === 1, lit("org"))
      .when(m6 === 2, lit("Net")).when(m6 === 3, lit("CO.UK"))
      .when(m6 === 4, lit("com.au")).otherwise(lit("GitHub.IO"))
    concat(lit("HTTPS://"), sub, lit("Site"),
      pmod(docId, lit(5L)).cast("string"), lit("."), tld,
      lit(":443/p/"), docId.cast("string"))
  }

  /** The deterministic MESSY-URL fixture: five spellings of the same
    * canonical page URL (plain, cased host + default port, tracking
    * params, fragment, unsorted params + tracking), keyed by
    * `doc_id % 401` so distinct docs collide on the canonical form —
    * what urlNormalize + dedup_url exist to collapse. Re-derived by the
    * oracle from the same arithmetic. */
  private def messyUrl(docId: Column): Column = {
    val key = pmod(docId, lit(401L)).cast("string")
    val base = concat(lit("https://corpus.example/page/"), key)
    when(pmod(docId, lit(5L)) === 0, base)
      .when(pmod(docId, lit(5L)) === 1,
        concat(lit("HTTPS://Corpus.EXAMPLE:443/page/"), key))
      .when(pmod(docId, lit(5L)) === 2,
        concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .when(pmod(docId, lit(5L)) === 3, concat(base, lit("#frag-2")))
      .otherwise(concat(base, lit("?b=2&a=1&utm_medium=m")))
  }
  /** Staged manifest files (shard paths, 2 per micro-batch) for the
    * continuous-ingestion stream, one set per scale dir. */
  private val warcManifestDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Staged .warc.gz shards whose record payloads are the HTML PAGES
    * (the pipeline_web funnel's crawl input), one set per scale dir. */
  private val warcHtmlStageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The deterministic HTML page fixture shared by `text_html_extract`
    * and `pipeline_web` (and re-derived by their oracles): title,
    * style + script subtrees (the script carries a raw '<'), nav/footer
    * boilerplate, entity-escaped body. */
  private def htmlPage(id: Column, text: Column): Column = {
    val esc = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (c, (f, t2)) => replace(c, lit(f), lit(t2)) }
    concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title><style type=\"text/css\">body { margin: 0; }</style>" +
        "<script>var n = 1 < 2 && 3 > 2;</script></head><body>" +
        "<nav>Home | <a href=\"/about\">About</a></nav><p>"),
      esc,
      lit("</p><footer>&copy; corpus &amp; co.</footer></body></html>"))
  }

  /** DuckDB CTE chain re-deriving [[htmlPage]] + the htmlExtract clean
    * over `documents`, ending in a relation `c(doc_id, text)` whose
    * `text` column is the CLEANED text — named `text` so downstream
    * oracle fragments (langHits/quality) apply unchanged. */
  private val HtmlPageCtes: String =
    raw"""h AS (SELECT doc_id,
          '<html><head><title>Doc ' || doc_id ||
          '</title><style type="text/css">body { margin: 0; }</style>' ||
          '<script>var n = 1 < 2 && 3 > 2;</script></head><body>' ||
          '<nav>Home | <a href="/about">About</a></nav><p>' ||
          replace(replace(replace(text,
            '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
          '</p><footer>&copy; corpus &amp; co.</footer></body></html>'
          AS html FROM documents),
        s1 AS (SELECT doc_id, regexp_replace(html,
          '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
        s2 AS (SELECT doc_id, regexp_replace(t,
          '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1)"""

  private val HtmlCleanCtes: String =
    raw"""WITH $HtmlPageCtes,
        s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g')
          AS t FROM s2),
        s4 AS (SELECT doc_id, replace(replace(replace(replace(replace(t,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          '&amp;', '&') AS t FROM s3),
        c AS (SELECT doc_id, trim(regexp_replace(t, '[ \t\n\r\f]+', ' ',
          'g')) AS text FROM s4)"""

  /** Oracle of the WARC round trip, shared by the batch read and the
    * manifest-stream drain (stream ≡ batch is the pin). */
  /** The domain-rolled link-graph oracle — shared by the HTML
    * extraction path (web_link_graph) and the WAT JSON sidecar
    * round trip (wat_link_graph): two wire formats, one truth. */
  private val WebLinkGraphSql: String =
    raw"""WITH l AS (SELECT doc_id,
              unnest(range(1 + doc_id % 4)) AS k FROM documents),
            tt AS (SELECT doc_id, k,
              (doc_id + 31*(k+1)) % 401 AS tgt FROM l),
            e AS (SELECT doc_id,
              CASE WHEN k = 1 THEN 'blog.site' || (tgt % 5) || '.co.uk'
                WHEN k = 3 THEN 'www.site' || (tgt % 5) || '.co.uk'
                ELSE 'corpus.example' END AS host,
              CASE WHEN k = 0 THEN 'https://corpus.example/page/' || tgt
                WHEN k = 1 THEN 'https://blog.site' || (tgt % 5)
                  || '.co.uk/page/' || tgt
                WHEN k = 2 THEN 'https://corpus.example/page/' || tgt
                  || '?a=1&b=2'
                ELSE 'https://www.site' || (tgt % 5) || '.co.uk/page/'
                  || tgt END AS dst_url
              FROM tt),
            sp AS (SELECT doc_id, host, dst_url,
              string_split(host, '.') AS ls FROM e),
            dd AS (SELECT doc_id, host, dst_url,
              ${graft.text.PublicSuffix.sqlRegistrableDomain("host", "ls")}
              AS dst_domain FROM sp)
            SELECT dst_domain, count(*) AS n_inlinks,
              count(DISTINCT host) AS n_hosts,
              count(DISTINCT dst_url) AS n_urls,
              CAST(min(doc_id) AS BIGINT) AS first_src
            FROM dd GROUP BY 1"""

  private val WarcRoundtripSql: String =
    raw"""SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
          md5(text) AS payload_md5,
          'text/plain' AS content_type
        FROM documents"""

  /** DuckDB CTE chain re-deriving the messy-URL fixture + the
    * TextFunctions.urlNormalize parse/fold/sort, ending in
    * `un(doc_id, url, url_norm)`. */
  private val UrlNormCtes: String =
    raw"""WITH u AS (SELECT doc_id, CASE CAST(doc_id % 5 AS INTEGER)
          WHEN 0 THEN 'https://corpus.example/page/' || (doc_id % 401)
          WHEN 1 THEN 'HTTPS://Corpus.EXAMPLE:443/page/' || (doc_id % 401)
          WHEN 2 THEN 'https://corpus.example/page/' || (doc_id % 401)
            || '?utm_source=feed&utm_campaign=x'
          WHEN 3 THEN 'https://corpus.example/page/' || (doc_id % 401)
            || '#frag-2'
          ELSE 'https://corpus.example/page/' || (doc_id % 401)
            || '?b=2&a=1&utm_medium=m' END AS url FROM documents),
        n1 AS (SELECT doc_id, url,
          regexp_replace(url, '#.*', '', 'g') AS nofrag FROM u),
        n2 AS (SELECT *, lower(regexp_extract(nofrag,
            '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')
            AS rest FROM n1),
        n3 AS (SELECT *, CASE
            WHEN scheme = 'http' THEN regexp_replace(
              lower(regexp_extract(rest, '^([^/?]*)', 1)), ':80$$', '')
            WHEN scheme = 'https' THEN regexp_replace(
              lower(regexp_extract(rest, '^([^/?]*)', 1)), ':443$$', '')
            ELSE lower(regexp_extract(rest, '^([^/?]*)', 1)) END AS host,
          regexp_replace(rest, '^[^/?]*', '') AS pathq FROM n2),
        n4 AS (SELECT *, CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = ''
            THEN '/' ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
          regexp_extract(pathq, '^[^?]*\?(.*)$$', 1) AS query FROM n3),
        n5 AS (SELECT *, coalesce(array_to_string(list_sort(list_filter(
            string_split(query, '&'), p -> p <> '' AND NOT regexp_matches(p,
              '^(utm_[^=]*|fbclid|gclid)(=|$$)'))), '&'), '') AS qs FROM n4),
        un AS (SELECT doc_id, url, CASE WHEN scheme = '' THEN nofrag
          ELSE scheme || '://' || host || path ||
            (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) END AS url_norm
          FROM n5)"""

  /** One block's clean chain as a SQL fragment over expression `x`:
    * entity decode (&amp; LAST) + explicit-class whitespace collapse —
    * the exact [[graft.text.TextFunctions]] cleanFragment order. */
  private def htmlSqlClean(x: String): String =
    raw"""trim(regexp_replace(replace(replace(replace(replace(replace(
         $x,
         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
         '&amp;', '&'), '[ \t\n\r\f]+', ' ', 'g'))"""

  /** DuckDB CTE chain re-deriving the BLOCK classification
    * (TextFunctions.htmlBlocks + isContentBlock + htmlContentText):
    * split at block tags, clean each block, pair with its link text,
    * drop empties, classify by length + integer link density. Ends in
    * `c(doc_id, n_blocks, n_boiler, text)` with `text` = the kept
    * blocks joined, so langHits/quality fragments apply unchanged. */
  private val HtmlContentCtes: String =
    raw"""WITH $HtmlPageCtes,
        bl AS (SELECT doc_id, string_split_regex(t,
          '(?i)</?(?:p|div|nav|footer|header|h[1-6]|li|ul|ol|table|title|head|body|html)[^>]*>')
          AS blocks FROM s2),
        cb AS (SELECT doc_id, list_filter(list_transform(blocks,
          x -> struct_pack(
            clean := ${htmlSqlClean("regexp_replace(x, '<[^>]*>', ' ', 'g')")},
            link := ${htmlSqlClean(
              "coalesce(array_to_string(regexp_extract_all(x, '(?i)<a[^>]*>([^<]*)</a>', 1), ' '), '')")})),
          s -> s.clean <> '') AS bs FROM bl),
        kp AS (SELECT doc_id, bs, list_filter(bs,
          s -> length(s.clean) >= 25 AND 10 * length(s.link) <= 3 * length(s.clean))
          AS keep FROM cb),
        c AS (SELECT doc_id, len(bs) AS n_blocks,
          len(bs) - len(keep) AS n_boiler,
          coalesce(array_to_string(list_transform(keep, s -> s.clean), ' '),
            '') AS text FROM kp)"""

  /** The stream-stream join pair's signup/error feeds. Both queries join
    * the SAME two feeds, so the staged file-stream inputs are shared per
    * scale dir (fixture staging happens once); every invocation of either
    * query still runs its full live state-store join drain. */
  private def ssJoinFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = t(s, dir, "events").withColumn("us", expr("ts div 1000"))
    val su = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    val er = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("us").as("ets"), col("value").as("err_value"))
    (su, er)
  }
  /** Interchange round-trip plumbing (fmt_* queries). */
  private val FmtDdl = "doc_id BIGINT, text STRING, lang STRING, source STRING"
  /** Oracle twin of [[fmtDigest]] over the parquet originals. */
  private val FmtDigestSql =
    """SELECT source, lang, count(*) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
       count(DISTINCT md5(text)) AS n_text_md5,
       CAST(sum(doc_id) AS BIGINT) AS sum_id
       FROM documents GROUP BY source, lang"""
  private def fmtTmp(prefix: String): String = graft.core.TempDirs.register(
    java.nio.file.Files.createTempDirectory(prefix)).toString
  private def fmtCols(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"), col("source"))
  private def fmtDigest(df: DataFrame): DataFrame =
    df.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("text")).cast("long")).as("sum_bytes"),
        countDistinct(md5(col("text").cast("binary"))).as("n_text_md5"),
        sum(col("doc_id")).as("sum_id"))

  /** Events written partitionBy(event_type) once per scale dir — the
    * partitioned LAYOUT is the fixture layout_partition_prune reads. */
  private val partitionedEvents =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def partitionedEventsDir(s: SparkSession, dir: String): String =
    partitionedEvents.getOrElseUpdate(dir, {
      val d = fmtTmp("graft_events_bytype")
      graft.sources.Formats.writePartitioned(
        t(s, dir, "events"), d, Seq("event_type"))
      d
    })

  private val sessStateStage =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val dedupStreamStage =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val ssJoinStage =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def ssJoinDirs(s: SparkSession, dir: String): (String, String) =
    ssJoinStage.getOrElseUpdate(dir, {
      val (su, er) = ssJoinFrames(s, dir)
      def tmp(p: String) = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory(p)).toString
      val (l, r) = (tmp("graft_ssj_l"), tmp("graft_ssj_r"))
      graft.streaming.StatefulSessions.stageOrderedFiles(
        s, java.nio.file.Paths.get(l), su, Seq.empty)
      graft.streaming.StatefulSessions.stageOrderedFiles(
        s, java.nio.file.Paths.get(r), er, Seq.empty)
      (l, r)
    })

  /** BPE merge model per scale dir — train once, encode many. */
  private val bpeModelCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Bpe.Merge]]
  private def bpeModel(s: SparkSession, dir: String): Seq[Bpe.Merge] =
    bpeModelCache.getOrElseUpdate(dir,
      Bpe.learn(t(s, dir, "documents"), "text", nMerges = 8))

  /** Unigram-LM piece inventory per scale dir — train once, encode many. */
  private val unigramModelCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[graft.text.Unigram.Piece]]
  private def unigramModel(s: SparkSession, dir: String): Seq[graft.text.Unigram.Piece] =
    unigramModelCache.getOrElseUpdate(dir,
      graft.text.Unigram.learn(t(s, dir, "documents"), "text", vocabMulti = 64))

  /** Incrementally-maintained BPE model per dir (see text_bpe_incr). */
  private val bpeIncrCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Bpe.Merge]]

  /** Incrementally-maintained unigram inventory (see text_unigram_incr). */
  private val unigramIncrCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[graft.text.Unigram.Piece]]

  /** Stream-maintained unigram inventory (see text_unigram_stream). */
  private val unigramStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[graft.text.Unigram.Piece]]

  /** Stream-maintained BPE model per dir (see text_bpe_stream). */
  private val bpeStreamCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Bpe.Merge]]

  /** Stream-maintained bigram-count state dir (see text_kn_stream). */
  private val knStreamStores =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Persisted KN nano model (bigram dir, trigram dir) per scale dir —
    * estimate once, serve the bigram/trigram/scoring queries from the
    * stored tables (the BM25/ANN index pattern). The tables are exact
    * integer derivations, so persist-and-read loses nothing. */
  private val knModelStores =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def knModel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (bd, td) = knModelStores.getOrElseUpdate(dir, {
      val bd = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_knb")).toString
      val td = graft.core.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft_knt")).toString
      val docs = t(s, dir, "documents")
      LmCounts.bigramNano(docs, "text")
        .write.mode("overwrite").parquet(bd)
      LmCounts.trigramNanoFrom(docs, "text", s.read.parquet(bd))
        .write.mode("overwrite").parquet(td)
      graft.ops.Caches.release()
      (bd, td)
    })
    (s.read.parquet(bd), s.read.parquet(td))
  }

  /** Moment-maintained PCA model per dir (see embed_pca_incr). */
  private val pcaIncrCache =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[Long], Seq[Double])]

  /** PCA model (μ, v₁) per scale dir — fit once, project many. */
  private val pcaModelCache =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[Double], Seq[Double])]
  private def pcaModel(s: SparkSession, dir: String): (Seq[Double], Seq[Double]) =
    pcaModelCache.getOrElseUpdate(dir,
      graft.sim.Pca.fitPc1(t(s, dir, "embeddings"), "vec_id", "embedding",
        iters = 8))

  /** Quantized-Lloyd k-means centroids (8 cells × 2 iterations), memoized
    * per dir — trained once, assigned many (the model is control data). */
  private val kmeansCentroidCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]
  private def kmeansCentroids(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    kmeansCentroidCache.getOrElseUpdate(dir,
      Ivf.trainQuantized(t(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, iters = 2))

  /** The HLL oracle, shared by the per-source sketch and the global merge
    * (register-wise max merge ≡ the direct global sketch — so the merge
    * oracle IS the direct computation, which is exactly the claim). */
  private def hllOracleSql(perSource: Boolean): String =
    hllOracleSqlOver(
      "SELECT source, md5('graft-hll:' || text) AS h FROM documents WHERE text IS NOT NULL",
      if (perSource) Some("source") else None)

  /** The HLL estimator CTEs over an arbitrary `(group?, h)` source select —
    * `h0Select` must yield an md5 digest column `h` (and the group column
    * when `groupCol` is set). */
  private def hllOracleSqlOver(h0Select: String, groupCol: Option[String]): String = {
    val nibAt = (src: String, k: String) =>
      s"(strpos('0123456789abcdef', substr($src, $k, 1)) - 1)::BIGINT"
    val grp = groupCol.map(_ + ", ").getOrElse("")
    val grpBy = groupCol.map("GROUP BY " + _).getOrElse("")
    val grpBy12 = if (groupCol.isDefined) "GROUP BY 1, 2" else "GROUP BY 1"
    s"""WITH h0 AS ($h0Select),
        rr AS (SELECT $grp
            ${nibAt("h", "1")} * 16 + ${nibAt("h", "2")} AS reg,
            8 - length(ltrim(substr(h, 3, 8), '0')) AS zn,
            (strpos('0123456789abcdef', substr(substr(h, 3, 8),
              (8 - length(ltrim(substr(h, 3, 8), '0'))) + 1, 1)) - 1) AS nib
          FROM h0),
        rho AS (SELECT ${grp}reg,
            CASE WHEN zn = 8 THEN 33 ELSE zn * 4 + 1 +
              CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1
                   WHEN nib >= 2 THEN 2 ELSE 3 END END AS rho
          FROM rr),
        regs AS (SELECT ${grp}reg, max(rho) AS mx FROM rho $grpBy12),
        agg AS (SELECT ${grp}count(*) AS n_set,
            sum(1::BIGINT << (33 - mx)) AS isum FROM regs $grpBy),
        raw AS (SELECT ${grp}n_set,
            (0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 8589934592.0) /
              CAST(isum + (256 - n_set)::BIGINT * (1::BIGINT << 33) AS DOUBLE)
              AS raw
          FROM agg)
        SELECT ${grp}n_set,
          round(CASE WHEN raw <= 640.0 AND (256 - n_set) > 0
            THEN 256.0 * ln(256.0 / (256 - n_set))
            ELSE raw END, 4) AS est_distinct
        FROM raw"""
  }

  /** DuckDB equivalents over the same parquet tables. Column names/aliases
    * must match the Spark outputs exactly (driver sorts columns by name). */
  def oracleSql: Map[String, String] = {
    // shared G.711 oracle scaffold: `sampleExpr` maps companded byte `b`
    // to its 16-bit sample; stats identical to the PCM WAV oracle
    def g711OracleSql(sampleExpr: String): String =
      raw"""WITH b AS (SELECT doc_id,
              regexp_extract_all(hex(encode(text)), '..') AS by FROM documents),
          u AS (SELECT doc_id, list_transform(by, h ->
              (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
              + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bs
            FROM b),
          v AS (SELECT doc_id, len(bs) AS ns,
              list_transform(bs, b -> $sampleExpr) AS vs FROM u)
          SELECT doc_id,
            CAST(8000 AS INTEGER) AS sample_rate,
            CAST(1 AS INTEGER) AS channels,
            CAST(8 AS INTEGER) AS bits,
            CAST(ns AS BIGINT) AS n_samples,
            CAST(coalesce(list_sum(vs), 0) AS BIGINT) AS sum_samples,
            CAST(coalesce(list_sum(list_transform(vs, x -> x * x)), 0)
              AS BIGINT) AS sum_squares,
            CAST(coalesce(list_aggregate(list_transform(vs, x -> abs(x)),
              'max'), 0) AS BIGINT) AS max_abs
          FROM v"""
    // lightweight-coreset CTE chain (quantized mean, integer micro-unit
    // costs, exact HUGEINT draw, div-truncated nano weights) — shared by
    // sample_coreset and the coreset-trained k-means
    val coresetCtes = {
      val sim =
        """CASE WHEN e.vn * c.cn = 0 THEN 0.0
           ELSE list_reduce(list_transform(range(64),
             j -> e.v[j+1] * c.cv[j+1]), (a, b) -> a + b)
             / (e.vn * c.cn) END"""
      def hx(src: String, i: Int) =
        s"(strpos('0123456789abcdef', substr($src, $i, 1)) - 1)"
      val h = "md5('coreset:' || vec_id)"
      val u20 =
        s"((((${hx(h, 1)} * 16 + ${hx(h, 2)}) * 16 + ${hx(h, 3)}) * 16" +
          s" + ${hx(h, 4)}) * 16 + ${hx(h, 5)})"
      s"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v,
            sqrt(list_reduce(list_transform(embedding::DOUBLE[],
              x -> x * x), (a, b) -> a + b)) AS vn
            FROM embeddings),
          ex AS (SELECT vec_id, unnest(v) AS x,
            generate_subscripts(v, 1) AS i FROM e),
          mu AS (SELECT i, round(avg(x), 6) AS m FROM ex GROUP BY 1),
          muv AS (SELECT list(m ORDER BY i) AS cv,
            sqrt(list_reduce(list_transform(list(m ORDER BY i),
              x -> x * x), (a, b) -> a + b)) AS cn FROM mu),
          k AS MATERIALIZED (SELECT e.vec_id,
            CAST(greatest(0, floor((1.0 - $sim) * 1000000.0)) AS BIGINT)
              AS cost
            FROM e CROSS JOIN muv c),
          agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(cost), 0) AS BIGINT) AS phi FROM k),
          cw AS MATERIALIZED (SELECT vec_id,
            CASE WHEN phi = 0
              THEN CAST((n::HUGEINT * 1000000000) // 64 AS BIGINT)
              ELSE CAST((2::HUGEINT * n * phi * 1000000000)
                // (64::HUGEINT * (phi + n * cost)) AS BIGINT)
            END AS weight_nano
            FROM k CROSS JOIN agg
            WHERE CASE WHEN phi = 0
              THEN $u20::HUGEINT * n < 64::HUGEINT * 1048576
              ELSE $u20::HUGEINT * (2::HUGEINT * n * phi)
                < 64::HUGEINT * (phi + n * cost) * 1048576 END)"""
    }
    // the 4:4:4 color oracle, shared by the baseline and the progressive
    // decode queries (equality is the point): per payload byte b the
    // decoded MCU is a flat block with Y=b, Cb-128=b%9-4, Cr-128=b%7-3;
    // RGB re-derived with the decoder's 16-bit fixed-point BT.601
    // constants, where >>16 on a signed value is floor division by 65536
    val jpegColorOracleSql: String = {
      def conv(e: String) =
        s"least(255, greatest(0, y + CAST(floor(($e + 32768) / 65536.0) AS INT)))"
      val r = conv("91881*(y%7-3)")
      val g = conv("-22554*(y%9-4) - 46802*(y%7-3)")
      val bb = conv("116130*(y%9-4)")
      raw"""WITH b AS (SELECT doc_id,
              regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
              FROM documents WHERE octet_length(encode(text)) >= 1),
          v AS (SELECT doc_id, list_transform(by, h ->
              (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
              + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
            FROM b),
          px AS (SELECT doc_id, len(bv) AS n,
              list_transform(bv, y -> $r) AS rs,
              list_transform(bv, y -> $g) AS gs,
              list_transform(bv, y -> $bb) AS bs
            FROM v)
          SELECT doc_id,
            CAST(8 AS INTEGER) AS width,
            CAST(8 * n AS INTEGER) AS height,
            CAST(64 * n AS BIGINT) AS n_px,
            CAST(64 * list_sum(rs) AS BIGINT) AS sum_r,
            CAST(64 * list_sum(gs) AS BIGINT) AS sum_g,
            CAST(64 * list_sum(bs) AS BIGINT) AS sum_b,
            CAST(greatest(list_aggregate(rs, 'max'),
              list_aggregate(gs, 'max'),
              list_aggregate(bs, 'max')) AS INTEGER) AS max_px,
            printf('%02X%02X%02X', rs[1], gs[1], bs[1]) AS topleft_hex
          FROM px"""
    }
    // the 4:2:2 oracle, shared by the baseline and progressive queries:
    // bytes in PAIRS — half k of pair j is a flat 8×8 with Y = bv[2j+k],
    // chroma shared from the pair's FIRST byte
    val jpeg422OracleSql: String = {
        def conv(y: String, e: String) =
          s"least(255, greatest(0, $y + CAST(floor(($e + 32768) / 65536.0) AS INT)))"
        val y = "bv[(2*j+k+1)::INT]"
        val c = "bv[(2*j+1)::INT]"
        val r = conv(y, s"91881*($c%7-3)")
        val g = conv(y, s"-22554*($c%9-4) - 46802*($c%7-3)")
        val bb = conv(y, s"116130*($c%9-4)")
        raw"""WITH b0 AS (SELECT doc_id,
                regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
                FROM documents),
            b AS (SELECT doc_id, by[1:(len(by) - len(by) % 2)::INT] AS by
              FROM b0 WHERE len(by) >= 2),
            v AS (SELECT doc_id, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM b),
            px AS (SELECT doc_id, len(bv) // 2 AS ng,
                flatten(list_transform(range(len(bv) // 2), j ->
                  list_transform(range(2), k -> [$r, $g, $bb]))) AS rgb
              FROM v)
            SELECT doc_id,
              CAST(16 AS INTEGER) AS width,
              CAST(8 * ng AS INTEGER) AS height,
              CAST(128 * ng AS BIGINT) AS n_px,
              CAST(64 * list_sum(list_transform(rgb, p -> p[1])) AS BIGINT)
                AS sum_r,
              CAST(64 * list_sum(list_transform(rgb, p -> p[2])) AS BIGINT)
                AS sum_g,
              CAST(64 * list_sum(list_transform(rgb, p -> p[3])) AS BIGINT)
                AS sum_b,
              CAST(list_aggregate(list_transform(rgb, p ->
                greatest(p[1], p[2], p[3])), 'max') AS INTEGER) AS max_px,
              printf('%02X%02X%02X', rgb[1][1], rgb[1][2], rgb[1][3])
                AS topleft_hex
            FROM px"""
    }
    // the shared 4-bytes-per-group oracle body: 4:2:0 (four Y quadrants,
    // 16-wide MCU) and 4:1:1 (four Y side by side, 32-wide MCU) produce
    // identical per-channel sums — only the declared geometry differs,
    // which is exactly what the parameterization expresses
    def jpegQuadGroupOracleSql(widthExpr: String, heightExpr: String): String = {
        def conv(y: String, e: String) =
          s"least(255, greatest(0, $y + CAST(floor(($e + 32768) / 65536.0) AS INT)))"
        val y = "bv[(4*j+k+1)::INT]"
        val c = "bv[(4*j+1)::INT]"
        val r = conv(y, s"91881*($c%7-3)")
        val g = conv(y, s"-22554*($c%9-4) - 46802*($c%7-3)")
        val bb = conv(y, s"116130*($c%9-4)")
        raw"""WITH b0 AS (SELECT doc_id,
                regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
                FROM documents),
            b AS (SELECT doc_id, by[1:(len(by) - len(by) % 4)::INT] AS by
              FROM b0 WHERE len(by) >= 4),
            v AS (SELECT doc_id, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM b),
            px AS (SELECT doc_id, len(bv) // 4 AS ng,
                flatten(list_transform(range(len(bv) // 4), j ->
                  list_transform(range(4), k -> [$r, $g, $bb]))) AS rgb
              FROM v)
            SELECT doc_id,
              CAST($widthExpr AS INTEGER) AS width,
              CAST($heightExpr AS INTEGER) AS height,
              CAST(256 * ng AS BIGINT) AS n_px,
              CAST(64 * list_sum(list_transform(rgb, p -> p[1])) AS BIGINT)
                AS sum_r,
              CAST(64 * list_sum(list_transform(rgb, p -> p[2])) AS BIGINT)
                AS sum_g,
              CAST(64 * list_sum(list_transform(rgb, p -> p[3])) AS BIGINT)
                AS sum_b,
              CAST(list_aggregate(list_transform(rgb, p ->
                greatest(p[1], p[2], p[3])), 'max') AS INTEGER) AS max_px,
              printf('%02X%02X%02X', rgb[1][1], rgb[1][2], rgb[1][3])
                AS topleft_hex
            FROM px"""
      }
    // the 4:2:0 oracle, shared verbatim by the sequential and the
    // segment-parallel decode queries (equality is the point)
    val jpeg420OracleSql: String = jpegQuadGroupOracleSql("16", "16 * ng")
    val jpeg411OracleSql: String = jpegQuadGroupOracleSql("32", "8 * ng")
    // the EXIF-oriented oracle: the 4:2:0 body plus the orientation
    // arithmetic (doc_id-derived, as mm_exif_survey), display-dim swap
    // for orientations 5-8, and the stored-corner pick for the
    // displayed top-left witness
    val jpegOrientedOracleSql: String = {
      def conv(y: String, e: String) =
        s"least(255, greatest(0, $y + CAST(floor(($e + 32768) / 65536.0) AS INT)))"
      val y = "bv[(4*j+k+1)::INT]"
      val c = "bv[(4*j+1)::INT]"
      val r = conv(y, s"91881*($c%7-3)")
      val g = conv(y, s"-22554*($c%9-4) - 46802*($c%7-3)")
      val bb = conv(y, s"116130*($c%9-4)")
      // displayed-top-left stored corner, per TIFF-274 orientation
      val cy = """CASE WHEN orientation IN (0, 1, 5) THEN bv[1]
           WHEN orientation IN (2, 8) THEN bv[2]
           WHEN orientation IN (3, 7) THEN bv[(4*ng)::INT]
           ELSE bv[(4*ng-1)::INT] END"""
      val cc = """CASE WHEN orientation IN (0, 1, 2, 5, 8) THEN bv[1]
           ELSE bv[(4*ng-3)::INT] END"""
      val wr = conv("cy", "91881*(cc%7-3)")
      val wg = conv("cy", "-22554*(cc%9-4) - 46802*(cc%7-3)")
      val wb = conv("cy", "116130*(cc%9-4)")
      raw"""WITH b0 AS (SELECT doc_id,
              regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
              FROM documents),
          b AS (SELECT doc_id, by[1:(len(by) - len(by) % 4)::INT] AS by
            FROM b0 WHERE len(by) >= 4),
          v AS (SELECT doc_id, list_transform(by, h ->
              (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
              + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
            FROM b),
          o AS (SELECT doc_id, bv, len(bv) // 4 AS ng,
              CAST(CASE WHEN doc_id % 5 = 4 THEN 0
                ELSE 1 + doc_id % 8 END AS INTEGER) AS orientation FROM v),
          px AS (SELECT doc_id, orientation, ng,
              flatten(list_transform(range(ng), j ->
                list_transform(range(4), k -> [$r, $g, $bb]))) AS rgb,
              $cy AS cy, $cc AS cc
            FROM o)
          SELECT doc_id, orientation,
            CAST(CASE WHEN orientation BETWEEN 5 AND 8
              THEN 16 * ng ELSE 16 END AS INTEGER) AS width,
            CAST(CASE WHEN orientation BETWEEN 5 AND 8
              THEN 16 ELSE 16 * ng END AS INTEGER) AS height,
            CAST(256 * ng AS BIGINT) AS n_px,
            CAST(64 * list_sum(list_transform(rgb, p -> p[1])) AS BIGINT)
              AS sum_r,
            CAST(64 * list_sum(list_transform(rgb, p -> p[2])) AS BIGINT)
              AS sum_g,
            CAST(64 * list_sum(list_transform(rgb, p -> p[3])) AS BIGINT)
              AS sum_b,
            CAST(list_aggregate(list_transform(rgb, p ->
              greatest(p[1], p[2], p[3])), 'max') AS INTEGER) AS max_px,
            printf('%02X%02X%02X', $wr, $wg, $wb) AS topleft_hex
          FROM px"""
    }
    // shared DuckDB snippets replicating TextFunctions' tokenization
    val toks = raw"string_split_regex(trim(lower(text)), '\s+')"
    // graft.text.Probe's exact normal-equation solve: integer features,
    // HUGEINT moments, Sarrus determinants, truncated // (matches BigInt /).
    // Shared by the quality_probe_* oracles.
    val probeSolve =
      s"""d AS (SELECT doc_id,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
              (CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len($toks) END)::BIGINT AS x1,
              len(list_filter($toks,
                t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in')))::BIGINT AS x2
            FROM documents),
          m AS (SELECT count(*)::HUGEINT AS n,
              sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2,
              sum(x1 * x1)::HUGEINT AS s11, sum(x1 * x2)::HUGEINT AS s12,
              sum(x2 * x2)::HUGEINT AS s22, sum(y)::HUGEINT AS sy,
              sum(y * x1)::HUGEINT AS sy1, sum(y * x2)::HUGEINT AS sy2
            FROM d),
          w AS (SELECT n,
              (n * (s11*s22 - s12*s12) - s1 * (s1*s22 - s12*s2)
                 + s2 * (s1*s12 - s11*s2)) AS det,
              (sy * (s11*s22 - s12*s12) - s1 * (sy1*s22 - s12*sy2)
                 + s2 * (sy1*s12 - s11*sy2)) AS det0,
              (n * (sy1*s22 - s12*sy2) - sy * (s1*s22 - s12*s2)
                 + s2 * (s1*sy2 - sy1*s2)) AS det1,
              (n * (s11*sy2 - sy1*s12) - s1 * (s1*sy2 - sy1*s2)
                 + sy * (s1*s12 - s11*s2)) AS det2
            FROM m)"""
    // BPE training replay — ONE copy shared by text_bpe_merges and
    // text_bpe_encode (mirrors the single bpeModel per dir on the Spark
    // side). w0 is the corpus's word-frequency table with each word
    // serialized ' sym  sym … ' (symbols space-bounded both sides);
    // round k counts adjacent pairs weighted by word count, takes the
    // (cnt DESC, lhs, rhs) winner, and applies it as the literal replace
    // ' L  R ' → ' LR ' — the same leftmost non-overlapping scan Spark's
    // replace performs, so greedy merge application is bit-identical.
    // MATERIALIZED: DuckDB would otherwise inline w{k-1} into both of
    // round k's consumers and re-derive the whole chain exponentially.
    // coalesce: array_to_string over an empty list is NULL in DuckDB.
    val bpeRound = (k: Int) =>
      s"""p$k AS MATERIALIZED (SELECT b.l AS lhs, b.r AS rhs,
              sum(cnt)::BIGINT AS cnt FROM (
            SELECT cnt, unnest(list_transform(range(len(s) - 1),
                i -> {'l': s[(i+1)::INT], 'r': s[(i+2)::INT]})) AS b
            FROM (SELECT string_split(trim(seq), '  ') AS s, cnt FROM w${k - 1})
          ) GROUP BY 1, 2),
          t$k AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$k
            ORDER BY cnt DESC, lhs, rhs LIMIT 1),
          w$k AS MATERIALIZED (SELECT
            replace(w.seq, ' ' || t.lhs || '  ' || t.rhs || ' ',
              ' ' || t.lhs || t.rhs || ' ') AS seq, w.cnt AS cnt
            FROM w${k - 1} w CROSS JOIN t$k t)"""
    val bpeTrainCtes =
      raw"""tkw AS (SELECT unnest($toks) AS w FROM documents),
          w0 AS MATERIALIZED (SELECT ' ' || coalesce(
              array_to_string(regexp_extract_all(w, '.'), '  '), '') || ' '
              AS seq, count(*)::BIGINT AS cnt FROM tkw GROUP BY 1),
          ${(1 to 8).map(bpeRound).mkString(",\n")}"""
    // Unigram-LM tokenizer replay — shared by text_unigram_vocab and
    // text_unigram_encode (mirrors graft.text.Unigram exactly): piece
    // inventory = all length-1..4 substrings of the word table weighted
    // by word count; vocab = ALL singles + top-64 multis (cnt DESC,
    // piece); cost = 1000000000 + rank (Unigram.CostBase). Segmentation
    // cost per DISTINCT word
    // via 8 Bellman-Ford relaxation rounds (max word length at the oracle
    // scale is 8; each round extends best-known costs by one piece), the
    // SQL twin of the Scala Viterbi DP — the converged minimum cost is a
    // unique integer, so tie-breaks never surface.
    val uniTrainCtes =
      raw"""utk AS (SELECT unnest($toks) AS w FROM documents),
          uwc AS MATERIALIZED (SELECT w, count(*)::BIGINT AS cnt
            FROM utk WHERE len(w) > 0 GROUP BY 1),
          upc AS MATERIALIZED (SELECT piece, sum(cnt)::BIGINT AS cnt FROM (
            SELECT cnt, unnest(flatten(list_transform(range(1, len(w) + 1),
              s -> list_transform(range(1, least(4, len(w) - s + 1) + 1),
                l -> substr(w, s::INT, l::INT))))) AS piece
            FROM uwc) GROUP BY 1),
          uvoc AS MATERIALIZED (SELECT piece, cnt,
            row_number() OVER (ORDER BY cnt DESC, piece) AS rank,
            1000000000 + row_number() OVER (ORDER BY cnt DESC, piece) AS cost
            FROM (SELECT piece, cnt FROM upc WHERE len(piece) = 1
                  UNION ALL
                  SELECT piece, cnt FROM
                    (SELECT piece, cnt FROM upc WHERE len(piece) >= 2
                     ORDER BY cnt DESC, piece LIMIT 64)))"""
    val uniDpRound = (k: Int) =>
      s"""ub$k AS MATERIALIZED (SELECT w, pos, min(cost) AS cost FROM (
            SELECT w, pos, cost FROM ub${k - 1}
            UNION ALL
            SELECT b.w, b.pos + len(v.piece) AS pos, b.cost + v.cost AS cost
            FROM ub${k - 1} b JOIN uvoc v
              ON b.pos + len(v.piece) <= len(b.w)
             AND substr(b.w, (b.pos + 1)::INT, len(v.piece)::INT) = v.piece
          ) GROUP BY 1, 2)"""
    val uniEncodeCtes =
      raw"""$uniTrainCtes,
          ub0 AS (SELECT w, 0 AS pos, 0::BIGINT AS cost
            FROM (SELECT DISTINCT w FROM utk)),
          ${(1 to 8).map(uniDpRound).mkString(",\n")},
          uwe AS (
            -- convergence asserted, not assumed: a word whose segmentation
            -- needs more than the replayed 8 relaxation rounds must error
            -- loudly, not silently drop out of the downstream inner join
            SELECT dw.w AS w,
              CASE WHEN b.cost IS NULL THEN error('unigram Viterbi replay: '
                || 'word "' || dw.w || '" (len ' || len(dw.w) || ') did not '
                || 'reach its terminal state within 8 relaxation rounds')
              ELSE b.cost END AS cost
            FROM (SELECT DISTINCT w FROM utk) dw
            LEFT JOIN (SELECT w, min(cost) AS cost FROM ub8
                       WHERE pos = len(w) GROUP BY 1) b ON b.w = dw.w)"""
    // Greedy token-ID replay — the [[text_wordpiece_encode]] walk
    // accumulating the rank LISTS instead of counts (shared by
    // text_greedy_ids and pack_token_ids): at each active (w, pos) the
    // longest matching piece is a UNIQUE string (one substring per
    // length), so arg_max(rank, len) is deterministic; terminal rows pass
    // through, non-termination errors loudly like uwe/uge
    val greedyIdsCtes = {
      val round = (t: Int) =>
        s"""ugi$t AS MATERIALIZED (
              SELECT w, pos, ids FROM ugi${t - 1} WHERE pos >= len(w)
              UNION ALL
              SELECT s.w AS w, s.pos + s.l AS pos,
                list_append(b.ids, s.rank) AS ids
              FROM (SELECT b.w AS w, b.pos AS pos,
                      max(len(v.piece)) AS l,
                      arg_max(v.rank, len(v.piece)) AS rank
                    FROM ugi${t - 1} b JOIN uvoc v
                      ON b.pos + len(v.piece) <= len(b.w)
                     AND substr(b.w, (b.pos + 1)::INT, len(v.piece)::INT)
                       = v.piece
                    WHERE b.pos < len(b.w)
                    GROUP BY 1, 2) s
              JOIN ugi${t - 1} b ON b.w = s.w AND b.pos = s.pos)"""
      raw"""$uniTrainCtes,
          ugi0 AS (SELECT w, 0 AS pos, []::BIGINT[] AS ids
            FROM (SELECT DISTINCT w FROM utk)),
          ${(1 to 8).map(round).mkString(",\n")},
          ugid AS (
            SELECT dw.w AS w,
              CASE WHEN g.ids IS NULL THEN error('greedy id replay: word "'
                || dw.w || '" did not terminate in 8 rounds')
              ELSE g.ids END AS ids
            FROM (SELECT DISTINCT w FROM utk) dw
            LEFT JOIN (SELECT w, ids FROM ugi8 WHERE pos >= len(w)) g
              ON g.w = dw.w),
          dtok AS (SELECT doc_id, $toks AS l FROM documents),
          udw AS (SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
              i -> {'pos': i, 'w': l[i::INT]})) AS t FROM dtok),
          docids AS (SELECT u.doc_id AS doc_id,
              flatten(list(g.ids ORDER BY u.pos)) AS ids
            FROM (SELECT doc_id, t.pos AS pos, t.w AS w FROM udw) u
            JOIN ugid g ON g.w = u.w
            GROUP BY 1)"""
    }
    // Kneser–Ney INTEGER NANO-UNIT ladder — ONE copy shared by the three
    // text_kn_* oracles (mirrors LmCounts' derivation exactly): all
    // probabilities are integer nano-units produced by integer floor
    // division (`//` here, IntegralDivide in Spark), never FP rounding —
    // these rationals frequently land exactly on .5 decimal boundaries
    // where engines' round() implementations disagree (observed 7/16k at
    // sf0.01 with a round(x,6) formulation)
    val knLadderCtes =
      raw"""d AS (SELECT doc_id, $toks AS l FROM documents),
          bg AS (SELECT unnest(list_transform(range(1, len(l)),
              i -> {'w1': l[i::INT], 'w2': l[(i+1)::INT]})) AS b
            FROM d WHERE len(l) >= 2),
          c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS cnt
            FROM bg GROUP BY 1, 2),
          lt AS (SELECT w1, sum(cnt)::BIGINT AS c_left,
            count(*)::BIGINT AS n_follow FROM c GROUP BY 1),
          ct AS (SELECT w2, count(*)::BIGINT AS n_prec FROM c GROUP BY 1),
          tt AS (SELECT count(*)::BIGINT AS t FROM c),
          pb AS (SELECT c.w1 AS w1, c.w2 AS w2, c.cnt AS cnt,
            greatest(((c.cnt * 4 - 3) * 1000000000
              + 3 * lt.n_follow * ((ct.n_prec * 1000000000) // tt.t))
              // (lt.c_left * 4), 1) AS pb_nano
            FROM c JOIN lt USING (w1) JOIN ct USING (w2) CROSS JOIN tt)"""
    val knTriCtes =
      raw"""$knLadderCtes,
          tg AS (SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
              i -> {'w1': l[i::INT], 'w2': l[(i+1)::INT],
                    'w3': l[(i+2)::INT]})) AS g
            FROM d WHERE len(l) >= 3),
          tgf AS MATERIALIZED (SELECT doc_id, g.w1 AS w1, g.w2 AS w2,
            g.w3 AS w3 FROM tg),
          c3 AS (SELECT w1, w2, w3, count(*)::BIGINT AS cnt
            FROM tgf GROUP BY 1, 2, 3),
          cx AS (SELECT w1, w2, sum(cnt)::BIGINT AS c_ctx,
            count(*)::BIGINT AS n_follow FROM c3 GROUP BY 1, 2),
          m AS (SELECT c3.w1, c3.w2, c3.w3, c3.cnt,
            greatest(((c3.cnt * 4 - 3) * 1000000000
              + 3 * cx.n_follow * pbj.pb_nano)
              // (cx.c_ctx * 4), 1) AS p3_nano
            FROM c3 JOIN cx USING (w1, w2)
            JOIN (SELECT w1 AS w2, w2 AS w3, pb_nano FROM pb) pbj
              USING (w2, w3))"""
    // thresholded co-purchase edge list — ONE copy shared by the graph_*
    // oracles (mirrors the single cached copurchaseEdges on the Spark
    // side). DuckDB lambda index `i` is 1-based; items[i+1:] = the items
    // after position i, matching Spark's 0-based slice(items, i+2, …)
    val basketCtes =
      """gi AS (SELECT l_orderkey AS g,
             list_sort(list_distinct(list(l_partkey))) AS items
             FROM lineitem GROUP BY 1),
         pr0 AS (SELECT unnest(flatten(list_transform(items, (x, i) ->
             list_transform(items[i+1:], y -> {'p1': x, 'p2': y})))) AS p
             FROM gi),
         e AS (SELECT p.p1 AS p1, p.p2 AS p2, count(*) AS support
             FROM pr0 GROUP BY 1, 2 HAVING count(*) >= 2)"""
    // one BM25 formulation, shared verbatim by search_bm25 (fresh build)
    // and search_bm25_incr (log-structured maintenance converging to the
    // same corpus — maintained ≡ rebuilt is exactly the claim)
    val bm25Sql =
      raw"""WITH q AS (SELECT unnest(['fast','table','scan','join','merge']) AS term),
            d AS (SELECT doc_id, $toks AS toks FROM documents),
            dl AS (SELECT doc_id, len(toks) AS dl FROM d),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
            stats AS (SELECT count(*) AS n,
                (sum(dl) * 1000000) // count(*) AS avgdl_micro FROM dl),
            contrib AS (
              SELECT tf.doc_id,
                CAST(round(
                  ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5)) *
                  (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl /
                    (avgdl_micro / 1000000.0))) * 1000000) AS BIGINT) AS c_micro
              FROM tf JOIN q USING (term) JOIN df USING (term)
                JOIN dl USING (doc_id) CROSS JOIN stats),
            scored AS (SELECT doc_id AS doc,
                CAST(sum(c_micro) AS BIGINT) AS score_micro,
                count(*) AS n_terms
              FROM contrib GROUP BY 1)
          SELECT doc, score_micro, n_terms, rank FROM (
            SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc) AS rank
            FROM scored)
          WHERE rank <= 20"""
    // fixed-centroid nearest-cell assignment incl. the tie rule — ONE copy,
    // shared by the sim_ivf_assign and sim_diverse_sample oracles (mirrors
    // the single fixedCellAssignment helper on the Spark side)
    val ivfAssignCtes =
      """e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
               (a, b) -> a + b)) AS vn
           FROM embeddings),
         c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8),
         c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS cn
               FROM c0),
         sc AS (SELECT e.vec_id, c.cell,
               CASE WHEN e.vn * c.cn = 0 THEN 0.0
                 ELSE list_reduce(list_transform(range(64), j -> e.v[j+1] * c.cv[j+1]),
                   (a, b) -> a + b) / (e.vn * c.cn) END AS sc
               FROM e CROSS JOIN c),
         asn AS (SELECT vec_id, CAST(cell AS INTEGER) AS cell FROM sc
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY sc DESC, cell DESC) = 1)"""
    val ivfPqSql =
      s"""WITH $ivfAssignCtes,
            cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j,
                embedding::DOUBLE[] AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
            ms AS (SELECT unnest(range(8)) AS m),
            psc AS (SELECT e2.vec_id, ms.m, cb.j,
                list_reduce(list_transform(range(8), i ->
                  (e2.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])
                  * (e2.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])),
                  (a, b) -> a + b) AS d
              FROM e e2 CROSS JOIN ms CROSS JOIN cbv cb),
            code AS (SELECT vec_id, m, j AS c FROM psc
              QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) = 1),
            probe AS (SELECT vec_id AS query_id, cell FROM sc
              WHERE vec_id % 50 = 0
              QUALIFY row_number() OVER (PARTITION BY vec_id
                ORDER BY sc DESC, cell DESC) <= 3),
            cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, a.cell
              FROM probe p JOIN asn a
                ON a.cell = p.cell AND a.vec_id <> p.query_id),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
            dm AS (SELECT c2.query_id, c2.neighbor_id, c2.cell, k2.m,
                list_reduce(list_transform(range(8), i ->
                  (q.qv[k2.m*8 + i + 1] - cb.cv[k2.m*8 + i + 1])
                  * (q.qv[k2.m*8 + i + 1] - cb.cv[k2.m*8 + i + 1])),
                  (a, b) -> a + b) AS d
              FROM cand c2 JOIN code k2 ON k2.vec_id = c2.neighbor_id
              JOIN cbv cb ON cb.j = k2.c
              JOIN q ON q.query_id = c2.query_id),
            tot AS (SELECT query_id, neighbor_id, cell,
                list_reduce(list(d ORDER BY m), (a, b) -> a + b) AS dist
              FROM dm GROUP BY 1, 2, 3)
            SELECT query_id, neighbor_id, cell, round(dist, 6) AS adc_dist, rank
            FROM (SELECT query_id, neighbor_id, cell, dist,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY dist, neighbor_id) AS INTEGER) AS rank
              FROM tot) WHERE rank <= 5"""
    val shingles =
      raw"""CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
            ELSE list_distinct(list_transform(range(len($toks) - 2),
              i -> $toks[i+1] || ' ' || $toks[i+2] || ' ' || $toks[i+3])) END"""
    val langMarkers = Map(
      "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
      "es" -> Seq("el", "la", "de", "que", "y", "los"),
      "fr" -> Seq("le", "la", "les", "et", "des", "une"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
      "zh" -> Seq("的", "是", "了", "在", "我"))
    def langHits(code: String) = {
      val lst = langMarkers(code).map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toks, t -> t IN ($lst)))"
    }
    // the UNROUNDED quality score (TextFunctions.qualityScore's exact
    // term order, so the summed doubles are bit-identical across engines)
    val qualityExpr =
      s"""(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 0.4 ELSE 0.0 END) +
          (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
             ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
               / length(text) END) < 0.2 THEN 0.2 ELSE 0.0 END) +
          (CASE WHEN (CASE WHEN length(trim(text)) = 0 OR len($toks) = 0 THEN 0.0
             ELSE list_sum(list_transform($toks, t -> length(t)))::DOUBLE / len($toks) END)
             BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END) +
          (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0.0
             ELSE len(list_filter($toks, t -> t IN ('the','a','of','and','is','to','in')))::DOUBLE
               / len($toks) END) > 0.01 THEN 0.2 ELSE 0.0 END)"""
    // the two "more like this" tower lists (MoreLikeThis term
    // selection + bm25 + cosine), shared by the hybrid-fusion and
    // hard-negative oracles
    val hybridTowersCtes = raw"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
              dl AS (SELECT doc_id, len(toks) AS dl FROM d),
              tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
              qt AS (SELECT doc_id AS qid, unnest(list_distinct(toks)) AS term
                     FROM d WHERE doc_id % 199 = 0),
              q AS (SELECT qid, term FROM (
                  SELECT qt.qid, qt.term, row_number() OVER (PARTITION BY qt.qid
                    ORDER BY df.df, qt.term) AS rn
                  FROM qt JOIN df USING (term)) WHERE rn <= 10),
              stats AS (SELECT count(*) AS n,
                  (sum(dl) * 1000000) // count(*) AS avgdl_micro FROM dl),
              contrib AS (
                SELECT q.qid, tf.doc_id,
                  CAST(round(
                    ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5)) *
                    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl /
                      (avgdl_micro / 1000000.0))) * 1000000) AS BIGINT) AS c_micro
                FROM tf JOIN q USING (term) JOIN df USING (term)
                  JOIN dl USING (doc_id) CROSS JOIN stats),
              scored AS (SELECT qid, doc_id AS doc,
                  CAST(sum(c_micro) AS BIGINT) AS s FROM contrib GROUP BY 1, 2),
              lex1 AS (SELECT qid, doc, s FROM (
                  SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY s DESC, doc) AS r FROM scored) WHERE r <= 21),
              lex AS (SELECT qid, doc, r FROM (
                  SELECT qid, doc, row_number() OVER (PARTITION BY qid
                    ORDER BY s DESC, doc) AS r
                  FROM lex1 WHERE doc <> qid) WHERE r <= 20),
              e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 199 = 0),
              den AS (SELECT qid, neighbor_id AS doc, r FROM (
                  SELECT qid, neighbor_id, row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, neighbor_id) AS r FROM (
                    SELECT qv.qid, e.vec_id AS neighbor_id,
                      CASE WHEN sqrt(list_dot_product(qv.qv, qv.qv)) *
                          sqrt(list_dot_product(e.v, e.v)) = 0 THEN 0.0
                        ELSE list_dot_product(qv.qv, e.v) /
                          (sqrt(list_dot_product(qv.qv, qv.qv)) *
                           sqrt(list_dot_product(e.v, e.v))) END AS cos
                    FROM qv JOIN e ON qid <> e.vec_id)) WHERE r <= 20)"""

    val base = Map(
      "a5_map_item" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key, o_totalprice AS _mr_value,
           CAST(o_orderkey AS VARCHAR) AS _mr_source_id, 'orders' AS _mr_source_type,
           CAST(1 AS INTEGER) AS _mr_version, false AS _mr_deleted FROM orders""",
      "a6_reduce_sum" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders GROUP BY 1""",
      "a6_reduce_min" ->
        """SELECT CAST(l_partkey AS VARCHAR) AS _mr_key,
           min(l_quantity) AS min_qty FROM lineitem GROUP BY 1""",
      "a6_typed_range" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           max(o_totalprice) - min(o_totalprice) AS range_value FROM orders GROUP BY 1""",
      "a6_row_reduce" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value, count(*) AS cnt,
           max(CAST(o_orderkey AS VARCHAR)) AS max_source_id
           FROM orders GROUP BY 1""",
      "salted_skew_agg" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
           FROM lineitem GROUP BY 1, 2""",
      "a5_map_flatmap" ->
        """SELECT k AS _mr_key, round(sum(v), 2) AS sum_value FROM (
             SELECT CAST(o_custkey AS VARCHAR) AS k, o_totalprice AS v
             FROM orders WHERE o_totalprice > 1000.0
             UNION ALL
             SELECT 'st:' || o_orderstatus, o_totalprice
             FROM orders WHERE o_totalprice > 1000.0
           ) GROUP BY 1""",
      "a7_reduce_premap" ->
        """SELECT CAST(l_suppkey AS VARCHAR) AS _mr_key,
           round(sum(l_extendedprice * CAST(0.9 AS DOUBLE)), 2) AS sum_disc
           FROM lineitem GROUP BY 1""",
      "a10_join_report" ->
        """SELECT CAST(c.c_custkey AS VARCHAR) AS _mr_key,
           max(c.c_name) AS customer_name, max(c.c_acctbal) AS acctbal,
           max_by(o.o_totalprice, CAST(o.o_orderkey AS VARCHAR)) AS last_totalprice
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY 1""",
      "a11_reduce_count" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key, count(*) AS cnt
           FROM orders GROUP BY 1""",
      "b16_url_derived" ->
        """WITH rep AS (
             SELECT CAST(c.c_custkey AS VARCHAR) AS _mr_key,
               max(c.c_name) AS customer_name, max(c.c_acctbal) AS acctbal
             FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             GROUP BY 1)
           SELECT _mr_key, customer_name, acctbal FROM rep
           WHERE acctbal > 1000 AND lower(customer_name) LIKE 'customer%'
           ORDER BY acctbal, _mr_key LIMIT 50""",
      // struct field order must match the Spark side exactly (nation,
      // email); both engines serialize compact key:value JSON
      "b17_subresource" ->
        """SELECT c.*,
             CASE WHEN s.id IS NULL THEN NULL
               ELSE to_json({'nation': s.nation,
                             'email': s.email})::VARCHAR END AS contact_info
           FROM customer c
           LEFT JOIN (SELECT c_custkey AS id, c_nationkey AS nation,
                        'c' || c_custkey || '@example.com' AS email
                      FROM customer WHERE c_custkey % 3 <> 0) s
             ON c.c_custkey = s.id
           WHERE lower(c.c_mktsegment) = 'building' AND c.c_acctbal > 9000""",
      "b18_blob" ->
        """SELECT doc_id, hex(encode(text)) AS blob_hex FROM documents
           WHERE doc_id IN (0, 50, 100, 150, 200)""",
      // the written blob is upper(text) || '!' by construction; the CAS
      // conflict and the store plumbing have no tabular trace — the
      // readback hex IS the evidence the write landed
      "b19_blob_put" ->
        """SELECT CAST(doc_id AS VARCHAR) AS id,
           hex(encode(upper(text) || '!')) AS blob_hex FROM documents
           WHERE doc_id IN (0, 50, 100)""",
      // the written side-document is {nation*100+id, 'updated-<id>@…'} by
      // construction; the CAS conflict, the 404, and the manifest swap
      // have no tabular trace — the URL-surface readback IS the evidence
      "b20_subresource_put" ->
        """SELECT CAST(c_custkey AS VARCHAR) AS id,
           to_json({'nation': c_nationkey * 100 + c_custkey,
                    'email': 'updated-' || c_custkey || '@example.org'
                   })::VARCHAR AS contact_info
           FROM customer WHERE c_custkey IN (1, 7, 20)""",
      "b21_multiget_sub" ->
        """SELECT c.c_custkey,
             CASE WHEN s.id IS NULL THEN NULL
               ELSE to_json({'nation': s.nation,
                             'email': s.email})::VARCHAR END AS contact_info
           FROM customer c
           LEFT JOIN (SELECT c_custkey AS id, c_nationkey AS nation,
                        'c' || c_custkey || '@example.com' AS email
                      FROM customer WHERE c_custkey % 3 <> 0) s
             ON c.c_custkey = s.id
           WHERE CAST(c.c_custkey AS VARCHAR)
             IN ('1', '2', '3', '10', '21', '999999')""",
      // re-derives the constructed retry-ledger state: batch 1 (t=1000)
      // fails m%3!=0 -> pending(retries=0); batch 2 (t=2000, all gates
      // open at 1250) clears odd m, even m burn a retry (retries=1, gate
      // 1000+1500); batch 3 (t=4000) re-attempts m%4==0 which exhaust
      // maxRetries=2 -> dead letters with null bookkeeping
      "mr_notifications" ->
        """WITH k AS (SELECT o_orderkey // 499 AS m,
                        CAST(o_orderkey AS BIGINT) AS seq
                      FROM orders WHERE o_orderkey % 499 = 0),
           c AS (SELECT m, seq,
                   CASE WHEN m % 5 < 2 THEN 'created'
                        WHEN m % 5 < 4 THEN 'updated'
                        ELSE 'deleted' END AS change
                 FROM k)
           SELECT 'pending' AS state, seq, change,
             'orders' AS resource_type, CAST(seq AS VARCHAR) AS resource_id,
             CAST(1 AS INT) AS retries,
             CAST(1000 AS BIGINT) AS first_failed_at_ms,
             CAST(2500 AS BIGINT) AS gate_opens_at_ms
           FROM c WHERE m % 3 <> 0 AND m % 2 = 0 AND m % 4 <> 0
           UNION ALL
           SELECT 'dead' AS state, seq, change,
             'orders' AS resource_type, CAST(seq AS VARCHAR) AS resource_id,
             CAST(NULL AS INT) AS retries,
             CAST(NULL AS BIGINT) AS first_failed_at_ms,
             CAST(NULL AS BIGINT) AS gate_opens_at_ms
           FROM c WHERE m % 3 <> 0 AND m % 4 = 0""",
      "a12_dedup_newest" ->
        """SELECT user_id, event_id, event_type, value FROM events
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
      "a16_resync_map" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key, o_totalprice AS _mr_value,
           CAST(o_orderkey AS VARCHAR) AS _mr_source_id FROM orders""",
      "a17_resync_reduce" ->
        """SELECT CAST(l_partkey AS VARCHAR) AS _mr_key,
           min(l_quantity) AS min_qty FROM lineitem GROUP BY 1""",
      "incr_update" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders GROUP BY 1""",
      "incr_time_travel" ->
        """SELECT 'past' AS snapshot, CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders
           WHERE o_orderkey % 7993 <> 0 GROUP BY 2
           UNION ALL
           SELECT 'current' AS snapshot, CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders GROUP BY 2""",
      // both diff sides recomputed from orders; keys whose every order
      // was deleted surface as 'added' (absent from the past state)
      "incr_snapshot_diff" ->
        """WITH past AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
               round(sum(o_totalprice), 2) AS v FROM orders
             WHERE o_orderkey % 7993 <> 0 GROUP BY 1),
           cur AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
               round(sum(o_totalprice), 2) AS v FROM orders GROUP BY 1)
           SELECT coalesce(p.k, c.k) AS _mr_key,
             CASE WHEN p.v IS NULL THEN 'added'
                  WHEN c.v IS NULL THEN 'removed'
                  ELSE 'updated' END AS change,
             p.v AS past_value, c.v AS cur_value
           FROM past p FULL OUTER JOIN cur c ON p.k = c.k
           WHERE p.v IS DISTINCT FROM c.v""",
      // schema evolution: past snapshot = the pre-evolution shape (NULL
      // n_orders — the column did not exist at batch 0); current = the
      // widened, fully-maintained table
      "incr_schema_evolve" ->
        """SELECT 'past' AS snapshot, CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value,
           CAST(NULL AS BIGINT) AS n_orders FROM orders GROUP BY 2
           UNION ALL
           SELECT 'current' AS snapshot, CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value,
           count(*) AS n_orders FROM orders GROUP BY 2""",
      "incr_delete" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders
           WHERE o_orderkey % 9949 <> 1 GROUP BY 1""",
      "incr_create_delete" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders
           WHERE o_orderkey % 6998 <> 0 GROUP BY 1""",
      "incr_bucketed" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(sum(o_totalprice), 2) AS sum_value FROM orders
           WHERE o_orderkey % 4993 <> 0 GROUP BY 1""",
      "incr_bucketed_join" ->
        """SELECT CAST(c.c_custkey AS VARCHAR) AS _mr_key,
           max(c.c_name) AS customer_name, max(c.c_acctbal) AS acctbal,
           max_by(o.o_totalprice, CAST(o.o_orderkey AS VARCHAR)) AS last_totalprice
           FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey GROUP BY 1""",
      "b1_exact_ci" -> "SELECT * FROM part WHERE lower(p_brand) = 'brand#13'",
      "b2_ne" -> "SELECT * FROM part WHERE lower(p_type) <> 'economy'",
      "b3_range" ->
        """SELECT * FROM part WHERE p_size >= 5 AND p_size <= 40
           AND p_retailprice > 905.0 AND p_retailprice < 1050.0""",
      "b4_contains" -> "SELECT * FROM part WHERE lower(p_name) LIKE '%red%'",
      "b5_startswith" -> "SELECT * FROM part WHERE lower(p_name) LIKE 'small%'",
      "b6_nested_field" ->
        """SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND lower(o.o_orderpriority) = '1-urgent')""",
      "b7_multi_cond" ->
        "SELECT * FROM part WHERE lower(p_name) LIKE '%e%' AND lower(p_name) LIKE '%o%'",
      "b8_show" ->
        "SELECT p_partkey, p_name, p_retailprice FROM part WHERE lower(p_type) = 'small'",
      "b9_sort_limit" ->
        "SELECT * FROM part ORDER BY p_retailprice, p_partkey LIMIT 10 OFFSET 5",
      "b9_sort_list_field" ->
        """SELECT c_custkey FROM (
             SELECT c.c_custkey,
               (SELECT min(o.o_orderkey) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS k
             FROM customer c)
           ORDER BY k ASC NULLS FIRST, c_custkey LIMIT 25""",
      "b11_search_one" ->
        "SELECT * FROM part WHERE p_partkey = 142",
      "b12_multiget" ->
        "SELECT * FROM part WHERE p_partkey IN (1, 2, 42, 77, 1999)",
      "b14_url_search" ->
        """SELECT p_partkey, p_name, p_size FROM part
           WHERE lower(p_name) LIKE '%widget%' AND p_size >= 10
           ORDER BY p_retailprice, p_partkey LIMIT 40 OFFSET 3""",
      "b14_url_ids" ->
        "SELECT p_partkey FROM part WHERE lower(p_brand) = 'brand#4' AND p_retailprice > 950",
      "b15_param_search" ->
        """SELECT c_custkey, c_name, c_acctbal FROM customer
           WHERE lower(c_mktsegment) = 'building' AND c_acctbal >= 0
             AND lower(c_name) LIKE '%1%' AND lower(c_name) LIKE '%2%'""",
      "b14_url_nested" ->
        """SELECT c_custkey FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND lower(o.o_orderpriority) = '1-urgent')
             AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 150000)""",
      "a15_version_barrier" ->
        """SELECT CAST(o_custkey AS VARCHAR) AS _mr_key,
           round(CASE
             WHEN max(CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END) = 1
              AND max(CASE WHEN o_orderkey % 36 = 0 AND o_orderkey % 100 <> 0
                      THEN 1 ELSE 0 END) = 0
             THEN sum(o_totalprice)
             ELSE sum(CASE WHEN o_orderkey % 36 = 0 THEN -1.0
                           WHEN o_orderkey % 100 = 0 THEN 0.0
                           ELSE o_totalprice END)
           END, 2) AS sum_value
           FROM orders WHERE o_orderkey % 4 = 0 GROUP BY o_custkey""",
      "events_props_agg" ->
        raw"""SELECT event_type, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k, CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
           FROM (SELECT event_type,
             TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
             FROM events)
           WHERE k IS NOT NULL GROUP BY event_type""",
      "text_nfc" ->
        """WITH a AS (SELECT doc_id,
             text || ' caf' || chr(101) || chr(769)
                  || ' no' || chr(101) || chr(776) || 'l' AS aug
           FROM documents)
           SELECT doc_id, CAST(strlen(aug) AS BIGINT) AS raw_bytes,
             CAST(strlen(nfc_normalize(aug)) AS BIGINT) AS nfc_bytes,
             md5(nfc_normalize(aug)) AS nfc_md5
           FROM a""",
      "corpus_rollup" ->
        """SELECT coalesce(source, 'ALL') AS source,
             coalesce(lang, 'ALL') AS lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
           FROM documents GROUP BY ROLLUP (source, lang)""",
      "corpus_cube" ->
        """SELECT coalesce(source, 'ALL') AS source,
             coalesce(lang, 'ALL') AS lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
           FROM documents GROUP BY CUBE (source, lang)""",
      "text_length_gate" ->
        raw"""WITH d AS (SELECT doc_id, source,
              CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\s+')) END
                AS BIGINT) AS n_tok
              FROM documents),
            b AS (SELECT source, round(quantile_cont(n_tok, 0.05), 4) AS lo,
                    round(quantile_cont(n_tok, 0.95), 4) AS hi
                  FROM d GROUP BY source)
            SELECT doc_id, source, n_tok, lo, hi FROM d JOIN b USING (source)
            WHERE n_tok >= lo AND n_tok <= hi""",
      // bounds from exact order statistics over each source's bottom-128
      // md5-uniform sample; integer ceil indices, 1-based lists
      "text_length_gate_sketched" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH d AS (SELECT doc_id, source,
              CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\s+')) END
                AS BIGINT) AS n_tok,
              md5('graft-quant:' || doc_id::VARCHAR) AS h
              FROM documents),
            u AS (SELECT doc_id, source, n_tok,
                ($u32) / 4294967296.0 AS u FROM d),
            r AS (SELECT source, n_tok, row_number() OVER
                (PARTITION BY source ORDER BY u, doc_id::VARCHAR) AS rn
                FROM u),
            g AS (SELECT source, count(*) AS n, list_sort(list(n_tok)) AS vs
                FROM r WHERE rn <= 128 GROUP BY source),
            b AS (SELECT source,
                vs[((n + 19) // 20)::INT]::DOUBLE AS lo,
                vs[((n * 19 + 19) // 20)::INT]::DOUBLE AS hi FROM g)
            SELECT doc_id, source, n_tok, lo, hi
            FROM (SELECT doc_id, source, n_tok FROM d) m JOIN b USING (source)
            WHERE n_tok >= lo AND n_tok <= hi"""
      },
      "text_quality_buckets" ->
        s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                 i -> l[i::INT] || ' ' || l[(i+1)::INT] || ' ' || l[(i+2)::INT])) AS tg
             FROM d WHERE len(l) >= 3),
           c AS (SELECT tg, count(*) AS c FROM tri GROUP BY tg),
           tot AS (SELECT sum(c) AS n, count(*) AS v FROM c),
           sc AS (SELECT tri.doc_id,
               round(-avg(ln((c.c + 1.0) / (tot.n + tot.v))), 6) AS nll
             FROM tri JOIN c USING (tg) CROSS JOIN tot GROUP BY tri.doc_id),
           sl AS (SELECT sc.doc_id, documents.lang, nll
                  FROM sc JOIN documents USING (doc_id)),
           b AS (SELECT lang, round(quantile_cont(nll, 1.0/3), 6) AS t1,
                   round(quantile_cont(nll, 2.0/3), 6) AS t2
                 FROM sl GROUP BY lang)
           SELECT doc_id, lang, nll,
             CASE WHEN nll <= t1 THEN 'head'
                  WHEN nll <= t2 THEN 'middle' ELSE 'tail' END AS bucket
           FROM sl JOIN b USING (lang)""",
      // the quality-bucket CTEs + the md5-uniform draw: global rank by
      // (priority, u, doc_id) — identical to the sharded two-pass rank
      // because the shard id is monotone in u within a priority
      "curriculum_order" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                 i -> l[i::INT] || ' ' || l[(i+1)::INT] || ' ' || l[(i+2)::INT])) AS tg
             FROM d WHERE len(l) >= 3),
           c AS (SELECT tg, count(*) AS c FROM tri GROUP BY tg),
           tot AS (SELECT sum(c) AS n, count(*) AS v FROM c),
           sc AS (SELECT tri.doc_id,
               round(-avg(ln((c.c + 1.0) / (tot.n + tot.v))), 6) AS nll
             FROM tri JOIN c USING (tg) CROSS JOIN tot GROUP BY tri.doc_id),
           sl AS (SELECT sc.doc_id, documents.lang, nll
                  FROM sc JOIN documents USING (doc_id)),
           b AS (SELECT lang, round(quantile_cont(nll, 1.0/3), 6) AS t1,
                   round(quantile_cont(nll, 2.0/3), 6) AS t2
                 FROM sl GROUP BY lang),
           bk AS (SELECT doc_id,
               CASE WHEN nll <= t1 THEN 0 WHEN nll <= t2 THEN 1 ELSE 2 END
                 AS priority
             FROM sl JOIN b USING (lang)),
           uu AS (SELECT doc_id, priority, ($u32) / 4294967296.0 AS u FROM (
               SELECT doc_id, priority,
                 md5('graft-curriculum:' || doc_id::VARCHAR) AS h FROM bk))
           SELECT doc_id, priority,
             CAST(row_number() OVER (ORDER BY priority, u, doc_id) - 1
               AS BIGINT) AS pos
           FROM uu"""
      },
      "events_pivot" ->
        """SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS n_click,
             count(*) FILTER (WHERE event_type = 'error') AS n_error,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
             count(*) FILTER (WHERE event_type = 'view') AS n_view
           FROM events GROUP BY user_id""",
      "events_hourly" ->
        """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
      // the bit-packed sequential fold replayed as list_reduce: acc >> 20
      // is the smoothed value, acc & (2^20-1) the spike count; prepended
      // 0 is the initial state (the recurrence is nonlinear — truncated
      // halving — so only an identical fold reproduces it)
      "events_ewma" ->
        """WITH h AS (SELECT epoch_ns(ts) // 3600000000000 AS hour_idx,
               event_type, count(*)::BIGINT AS cnt
             FROM events GROUP BY 1, 2),
           s AS (SELECT event_type, list_transform(
               list_sort(list({'hour_idx': hour_idx, 'cnt': cnt})),
               r -> r.cnt) AS xs
             FROM h GROUP BY 1),
           f AS (SELECT event_type, len(xs) AS n_hours,
               list_reduce(list_prepend(0::BIGINT, xs), (acc, x) ->
                 ((((acc >> 20) + x) >> 1) << 20)
                 + (acc & 1048575)
                 + (CASE WHEN (acc >> 20) > 0 AND x > (acc >> 20) * 4
                    THEN 1 ELSE 0 END)) AS acc
             FROM s)
           SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
             CAST(acc >> 20 AS BIGINT) AS ewma_final,
             CAST(acc & 1048575 AS BIGINT) AS n_spikes
           FROM f""",
      "events_sessions" ->
        """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
           o AS (SELECT user_id, us, value,
                 CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 600000000
                      THEN 1 ELSE 0 END AS brk
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
           sess AS (SELECT user_id, us, value,
                    sum(brk) OVER (PARTITION BY user_id ORDER BY us
                      ROWS UNBOUNDED PRECEDING) AS sid
                    FROM o)
           SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
           FROM sess GROUP BY user_id, sid""",
      // identical session semantics to events_sessions, by construction
      "events_sessions_state" ->
        """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
           o AS (SELECT user_id, us, value,
                 CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 600000000
                      THEN 1 ELSE 0 END AS brk
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
           sess AS (SELECT user_id, us, value,
                    sum(brk) OVER (PARTITION BY user_id ORDER BY us
                      ROWS UNBOUNDED PRECEDING) AS sid
                    FROM o)
           SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
           FROM sess GROUP BY user_id, sid""",
      // the duplicated redelivery must collapse back to the plain batch agg
      "events_dedup_stream" ->
        """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
           FROM events GROUP BY event_type""",
      "events_asof" ->
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                      FROM events),
           v AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events
                 WHERE event_type = 'view')
           SELECT e.event_id, e.user_id, CAST(e.us AS BIGINT) AS us,
             CAST(v.us AS BIGINT) AS asof_ts, v.value AS view_value
           FROM e ASOF LEFT JOIN v
             ON e.user_id = v.user_id AND e.us >= v.us""",
      // the custom-plan merge exec must reproduce the SAME asof semantics
      "events_asof_native" ->
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                      FROM events),
           v AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events
                 WHERE event_type = 'view')
           SELECT e.event_id, e.user_id, CAST(e.us AS BIGINT) AS us,
             CAST(v.us AS BIGINT) AS asof_ts, v.value AS view_value
           FROM e ASOF LEFT JOIN v
             ON e.user_id = v.user_id AND e.us >= v.us""",
      // Funnel.funnel: first-touch stage advancement within 1h, exact
      // integer-microsecond arithmetic
      "events_funnel" ->
        """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type
                      FROM events),
           s0 AS (SELECT user_id, min(us) AS t FROM e
                  WHERE event_type = 'signup' GROUP BY 1),
           s1 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s0 USING (user_id)
                  WHERE e.event_type = 'view' AND e.us >= s0.t
                    AND e.us - s0.t <= 3600000000 GROUP BY 1),
           s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.us >= s1.t
                    AND e.us - s1.t <= 3600000000 GROUP BY 1)
           SELECT 0 AS step, 'signup' AS event_type,
             (SELECT count(*) FROM s0) AS n_users
           UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
           UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)""",
      "events_interval_join" ->
        """WITH su AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                       FROM events WHERE event_type = 'signup'),
           er AS (SELECT user_id, epoch_ns(ts) // 1000 AS ets, value FROM events
                  WHERE event_type = 'error')
           SELECT su.event_id, count(*) AS n_err,
             round(sum(er.value), 2) AS sum_err
           FROM su JOIN er ON su.user_id = er.user_id
             AND er.ets BETWEEN su.us AND su.us + 3600000000
           GROUP BY su.event_id""",
      // identical semantics to events_interval_join, by construction
      "events_join_stream" ->
        """WITH su AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                       FROM events WHERE event_type = 'signup'),
           er AS (SELECT user_id, epoch_ns(ts) // 1000 AS ets, value FROM events
                  WHERE event_type = 'error')
           SELECT su.event_id, count(*) AS n_err,
             round(sum(er.value), 2) AS sum_err
           FROM su JOIN er ON su.user_id = er.user_id
             AND er.ets BETWEEN su.us AND su.us + 3600000000
           GROUP BY su.event_id""",
      // matches ∪ closed-window misses: an unmatched signup emits its
      // n_err = 0 row iff the final watermark (min of both sides' max
      // event time − 1 h delay) passed its window end
      "events_join_stream_outer" ->
        """WITH su AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                       FROM events WHERE event_type = 'signup'),
           er AS (SELECT user_id, epoch_ns(ts) // 1000 AS ets, value FROM events
                  WHERE event_type = 'error'),
           wm AS (SELECT least((SELECT max(us) FROM su),
                               (SELECT max(ets) FROM er))
                    - 3600000000 AS w),
           m AS (SELECT su.event_id, count(*) AS n_err,
                   round(sum(er.value), 2) AS sum_err
                 FROM su JOIN er ON su.user_id = er.user_id
                   AND er.ets BETWEEN su.us AND su.us + 3600000000
                 GROUP BY su.event_id)
           SELECT * FROM m
           UNION ALL
           SELECT su.event_id, CAST(0 AS BIGINT) AS n_err,
             CAST(NULL AS DOUBLE) AS sum_err
           FROM su CROSS JOIN wm
           WHERE su.event_id NOT IN (SELECT event_id FROM m)
             AND su.us + 3600000000 < wm.w""",
      "events_hourly_stream" ->
        """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
      "events_hourly_forever" ->
        """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
      "events_enrich_stream" ->
        """SELECT c.c_nationkey, count(*) AS n_events,
             round(sum(e.value), 2) AS sum_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY c.c_nationkey""",
      "events_hourly_upsert" ->
        """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour,
           event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
           FROM events GROUP BY 1, 2""",
      "dedup_exact" ->
        s"""SELECT doc_id FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(array_to_string($toks, ' '))
              ORDER BY doc_id) = 1""",
      "dedup_minhash" ->
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""",
      // the banding tuner: md5 MinHash signatures on the md5-uniform half
      // sample, candidates per (bands, rows) split, exact all-pairs truth
      "dedup_lsh_tune" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        def block(b: Int) = {
          val r = 16 / b
          s"""bk$b AS (SELECT doc_id, k,
                array_to_string(sig[(k*$r+1):(k*$r+$r)], ',') AS key
              FROM sg, range(0, $b) t(k)),
            cb$b AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bk$b x JOIN bk$b y
                ON x.k = y.k AND x.key = y.key AND x.doc_id < y.doc_id),
            nc$b AS (SELECT count(*)::BIGINT AS n_candidates FROM cb$b),
            nh$b AS (SELECT count(*)::BIGINT AS n_hits FROM cb$b c JOIN tp
                ON c.id_a = tp.id_a AND c.id_b = tp.id_b WHERE tp.j >= 0.8),
            row$b AS (SELECT $b AS bands, $r AS rows_per_band,
                n_candidates, n_hits FROM nc$b CROSS JOIN nh$b)"""
        }
        raw"""WITH su AS (SELECT doc_id,
                md5('graft-lshtune:' || doc_id::VARCHAR) AS h FROM documents),
            smp AS (SELECT doc_id FROM su
              ORDER BY ($u32) / 4294967296.0, doc_id LIMIT 256),
            sh0 AS (SELECT doc_id, $shingles AS s FROM documents
              WHERE doc_id IN (SELECT doc_id FROM smp)),
            sh AS (SELECT doc_id, s FROM sh0 WHERE len(s) > 0),
            sg AS (SELECT doc_id, list_transform(range(0, 16), i ->
                coalesce(list_aggregate(list_transform(s, x ->
                  list_transform([md5(i::VARCHAR || ':' || x)],
                    h -> $u32)[1]), 'min'), 4294967296)) AS sig
              FROM sh),
            tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.s, b.s))::DOUBLE
                  / len(list_distinct(list_concat(a.s, b.s))) AS j
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
            tru AS (SELECT count(*)::BIGINT AS n_true FROM tp WHERE j >= 0.8),
            ${Seq(2, 4, 8).map(block).mkString(",\n")},
            u AS (SELECT * FROM row2 UNION ALL SELECT * FROM row4
                  UNION ALL SELECT * FROM row8)
            SELECT bands, rows_per_band, n_candidates, tru.n_true, n_hits,
              CASE WHEN n_candidates > 0 THEN
                ((n_hits * 1000000000) // n_candidates) / 1000000000.0
              ELSE 0.0 END AS "precision",
              CASE WHEN tru.n_true > 0 THEN
                ((n_hits * 1000000000) // tru.n_true) / 1000000000.0
              ELSE 0.0 END AS recall
            FROM u CROSS JOIN tru"""
      },
      // Composition: the dedup_minhash exact pair set, each side tagged
      // with the split_assign md5 CASE, filtered to boundary crossers
      "split_leakage" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(len(list_intersect(a.s, b.s))::DOUBLE
                  / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            sp AS (SELECT doc_id, CASE WHEN u < 0.9 THEN 'train'
                WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id, ($u32) / 4294967296.0 AS u
                FROM (SELECT doc_id,
                  md5('graft-split:' || doc_id::VARCHAR) AS h FROM documents)))
            SELECT id_a, id_b, jaccard, a.split AS split_a, b.split AS split_b
            FROM p JOIN sp a ON a.doc_id = id_a JOIN sp b ON b.doc_id = id_b
            WHERE a.split <> b.split"""
      },
      // the incremental index path must reproduce the one-shot pair set
      // exactly — identical oracle to dedup_minhash by construction
      "dedup_minhash_incr" ->
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""",
      // the streaming drain converges the same index, so it reproduces the
      // one-shot pair set exactly — identical oracle to dedup_minhash
      "dedup_minhash_stream" ->
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""",
      "dedup_minhash_resolve" ->
        s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            e AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM e
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN e e2 ON w.reach = e2.src),
            lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id)
            SELECT d.doc_id FROM documents d LEFT JOIN lab ON d.doc_id = lab.id
            WHERE lab.id IS NULL OR lab.m >= d.doc_id""",
      "dedup_resolve_quality" ->
        s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            e AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM e
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN e e2 ON w.reach = e2.src),
            lab AS (SELECT id, least(id, min(reach)) AS comp
                    FROM walk GROUP BY id),
            win AS (SELECT comp, min(struct_pack(nk := -length(d.text),
                      id := d.doc_id)).id AS win_id
                    FROM lab JOIN documents d ON lab.id = d.doc_id
                    GROUP BY comp)
            SELECT d.doc_id FROM documents d
            LEFT JOIN lab ON d.doc_id = lab.id
            LEFT JOIN win ON d.doc_id = win.win_id
            WHERE lab.id IS NULL OR win.win_id IS NOT NULL""",
      "embed_neardup_resolve" ->
        """WITH RECURSIVE ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM ev a JOIN ev b ON a.vec_id < b.vec_id
                 WHERE list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45),
           ed AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION SELECT id_b, id_a FROM p),
           walk(id, reach) AS (
             SELECT src, dst FROM ed
             UNION
             SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
           lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id)
           SELECT x.vec_id FROM embeddings x LEFT JOIN lab ON x.vec_id = lab.id
           WHERE lab.id IS NULL OR lab.m >= x.vec_id""",
      "pipeline_filter" ->
        s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            ed AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
            lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id),
            surv AS (SELECT d.doc_id, d.text FROM documents d
                     LEFT JOIN lab ON d.doc_id = lab.id
                     WHERE lab.id IS NULL OR lab.m >= d.doc_id),
            h AS (SELECT doc_id, text, ${langHits("en")} AS en, ${langHits("es")} AS es,
                  ${langHits("fr")} AS fr, ${langHits("de")} AS de, ${langHits("zh")} AS zh
                  FROM surv)
            SELECT doc_id FROM h
            WHERE NOT (en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0)
              AND en >= es AND en >= fr AND en >= de AND en >= zh
              AND ($qualityExpr) >= 0.55""",
      "pipeline_audit" ->
        s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            ed AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
            lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id),
            a AS (SELECT d.doc_id, d.text,
                    (lab.id IS NOT NULL AND lab.m < d.doc_id) AS isdup
                  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
            h AS (SELECT doc_id, text, isdup, ${langHits("en")} AS en,
                  ${langHits("es")} AS es, ${langHits("fr")} AS fr,
                  ${langHits("de")} AS de, ${langHits("zh")} AS zh FROM a)
            SELECT doc_id, CASE
              WHEN isdup THEN 'dup'
              WHEN (en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0)
                OR NOT (en >= es AND en >= fr AND en >= de AND en >= zh)
                THEN 'lang'
              WHEN ($qualityExpr) < 0.55 THEN 'quality'
              ELSE 'pass' END AS stage
            FROM h""",
      "pipeline_funnel" ->
        s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            ed AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
            lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id),
            a AS (SELECT d.doc_id, d.text,
                    (lab.id IS NOT NULL AND lab.m < d.doc_id) AS isdup
                  FROM documents d LEFT JOIN lab ON d.doc_id = lab.id),
            h AS (SELECT doc_id, text, isdup, ${langHits("en")} AS en,
                  ${langHits("es")} AS es, ${langHits("fr")} AS fr,
                  ${langHits("de")} AS de, ${langHits("zh")} AS zh FROM a),
            st AS (SELECT doc_id, CASE
                WHEN isdup THEN 'dup'
                WHEN (en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0)
                  OR NOT (en >= es AND en >= fr AND en >= de AND en >= zh)
                  THEN 'lang'
                WHEN ($qualityExpr) < 0.55 THEN 'quality'
                ELSE 'pass' END AS stage
              FROM h)
            SELECT 0::BIGINT AS ord, 'ingest' AS stage,
                   count(*)::BIGINT AS remaining FROM st
            UNION ALL SELECT 1::BIGINT, 'dedup', count(*)::BIGINT
              FROM st WHERE stage != 'dup'
            UNION ALL SELECT 2::BIGINT, 'lang', count(*)::BIGINT
              FROM st WHERE stage NOT IN ('dup', 'lang')
            UNION ALL SELECT 3::BIGINT, 'quality', count(*)::BIGINT
              FROM st WHERE stage = 'pass'""",
      "pipeline_curate" -> {
        def nib(k: Int) =
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH RECURSIVE sh AS (SELECT doc_id, $shingles AS s FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            ed AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION SELECT id_b, id_a FROM p),
            walk(id, reach) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
            lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id),
            surv AS (SELECT d.doc_id, d.text, d.source FROM documents d
                     LEFT JOIN lab ON d.doc_id = lab.id
                     WHERE lab.id IS NULL OR lab.m >= d.doc_id),
            lh AS (SELECT doc_id, text, source, ${langHits("en")} AS en,
                  ${langHits("es")} AS es, ${langHits("fr")} AS fr,
                  ${langHits("de")} AS de, ${langHits("zh")} AS zh
                  FROM surv),
            fil AS (SELECT doc_id, text, source FROM lh
              WHERE NOT (en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0)
                AND en >= es AND en >= fr AND en >= de AND en >= zh
                AND ($qualityExpr) >= 0.55),
            m AS (SELECT doc_id, source, text,
                CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len($toks) END AS BIGINT) AS n_wtok
              FROM fil),
            gb AS (SELECT source, round(quantile_cont(n_wtok, 0.05), 4) AS lo,
                     round(quantile_cont(n_wtok, 0.95), 4) AS hi
                   FROM m GROUP BY source),
            g AS (SELECT m.doc_id, m.source, m.text FROM m JOIN gb USING (source)
                  WHERE n_wtok >= lo AND n_wtok <= hi),
            mm AS (SELECT doc_id, source,
                CAST(len(regexp_extract_all(lower(trim(text)),
                  '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_tok,
                md5('graft-mix:' || doc_id::VARCHAR) AS h
              FROM g),
            sc2 AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS ns
                    FROM mm GROUP BY source),
            wt AS (SELECT source, ns,
                     CAST(floor(pow(ns, 0.7)) AS BIGINT) AS w FROM sc2),
            tot AS (SELECT CAST(sum(ns) AS BIGINT) AS total,
                      CAST(sum(w) AS BIGINT) AS sumw FROM wt),
            bb AS (SELECT source,
                     CAST(CAST(floor(0.5 * total) AS HUGEINT) * w // sumw
                       AS BIGINT) AS budget
                   FROM wt CROSS JOIN tot),
            uu AS (SELECT doc_id, source, n_tok, ($u32) / 4294967296.0 AS u FROM mm),
            cc AS (SELECT doc_id, source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY u, doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum_tok
              FROM uu)
            SELECT cc.doc_id, cc.source, cc.n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
            FROM cc JOIN bb USING (source) WHERE cum_tok - n_tok < budget"""
      },
      "dedup_ngram_jaccard" ->
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents
              WHERE doc_id % 3 = 0 AND doc_id < 1500)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.s, b.s))::DOUBLE
                / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.15""",
      "sim_topk_bruteforce" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                      FROM embeddings WHERE vec_id % 50 = 0),
                c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings)
           SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
             SELECT query_id, neighbor_id,
               CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0
                 THEN 0.0 ELSE list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) END AS cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
             FROM q JOIN c ON query_id <> neighbor_id) WHERE rank <= 5""",
      // Similarity.dimensionDrift: even/odd halves, avg per dim, ranked
      // by the integer-micro absolute shift (ties dim asc)
      "embed_drift" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           x AS (SELECT vec_id % 2 = 0 AS a, unnest(v) AS x,
                   CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS dim FROM e),
           m AS (SELECT dim, avg(CASE WHEN a THEN x END) AS ma,
                   avg(CASE WHEN NOT a THEN x END) AS mb
                 FROM x GROUP BY 1)
           SELECT dim, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             CAST(round((ma - mb) * 1000000) AS BIGINT) AS delta_micro
           FROM m
           ORDER BY abs(CAST(round((ma - mb) * 1000000) AS BIGINT)) DESC, dim
           LIMIT 10""",
      "embed_gram" ->
        """WITH v AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
           a AS (SELECT v, unnest(v) AS xi,
                   CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS i FROM v),
           b AS (SELECT i, xi, unnest(v) AS xj,
                   CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS j FROM a)
           SELECT i, j,
             CAST(sum(CAST(floor(xi * xj * 1000000) AS BIGINT)) AS BIGINT)
               AS g_micro
           FROM b GROUP BY i, j""",
      "sim_topk_hamming" ->
        """WITH p AS (SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 32), i -> CASE
               WHEN embedding[(i+1)::INT] > 0 THEN (1::BIGINT << i::INT)
               ELSE 0 END)) AS BIGINT) AS h0,
             CAST(list_sum(list_transform(range(32, 64), i -> CASE
               WHEN embedding[(i+1)::INT] > 0 THEN (1::BIGINT << (i-32)::INT)
               ELSE 0 END)) AS BIGINT) AS h1
           FROM embeddings),
           q AS (SELECT vec_id AS query_id, h0 AS q0, h1 AS q1 FROM p
                 WHERE vec_id % 50 = 0)
           SELECT query_id, neighbor_id, hamming, rank FROM (
             SELECT query_id, p.vec_id AS neighbor_id,
               CAST(bit_count(xor(q0, p.h0)) + bit_count(xor(q1, p.h1))
                 AS BIGINT) AS hamming,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY hamming, p.vec_id) AS INTEGER) AS rank
             FROM q JOIN p ON query_id <> p.vec_id) WHERE rank <= 5""",
      "sim_topk_mrl" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           p AS (SELECT vec_id, v[1:16] AS pv, v FROM e),
           q AS (SELECT vec_id AS query_id, pv AS qp, v AS qv FROM p
                 WHERE vec_id % 50 = 0),
           cand AS (SELECT query_id, neighbor_id FROM (
             SELECT query_id, p.vec_id AS neighbor_id,
               CASE WHEN sqrt(list_dot_product(qp, qp)) * sqrt(list_dot_product(pv, pv)) = 0
                 THEN 0.0 ELSE list_dot_product(qp, pv)
                   / (sqrt(list_dot_product(qp, qp)) * sqrt(list_dot_product(pv, pv))) END AS coarse,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY coarse DESC, p.vec_id) AS crk
             FROM q JOIN p ON query_id <> p.vec_id) WHERE crk <= 25)
           SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
             SELECT c.query_id, c.neighbor_id,
               CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)) = 0
                 THEN 0.0 ELSE list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) END AS cos,
               CAST(row_number() OVER (PARTITION BY c.query_id
                 ORDER BY cos DESC, c.neighbor_id) AS INTEGER) AS rank
             FROM cand c JOIN e ON c.neighbor_id = e.vec_id
                  JOIN q ON c.query_id = q.query_id) WHERE rank <= 5""",
      "sim_lsh_bucket" -> {
        // hyperplane component (i, j): first 16 bits of md5('lsh:0:i:j')
        // mapped into [-1,1] — exactly Similarity.md5Hyperplanes
        def nib(n: Int) =
          s"(strpos('0123456789abcdef', substr(h, $n, 1)) - 1)"
        s"""WITH hp AS (
              SELECT i, list(comp ORDER BY j) AS hl FROM (
                SELECT i, j,
                  ((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})
                    % 1001 - 500) / 500.0 AS comp
                FROM (SELECT i, j, md5('lsh:0:' || i::VARCHAR || ':' || j::VARCHAR) AS h
                      FROM range(8) t(i) CROSS JOIN range(64) u(j))
              ) GROUP BY i)
            SELECT vec_id,
              CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT)
                AS bucket
            FROM (
              SELECT e.vec_id, hp.i,
                list_reduce(list_transform(range(64), j -> e.v[j+1] * hp.hl[j+1]),
                  (a, b) -> a + b) AS proj
              FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e
              CROSS JOIN hp)
            GROUP BY vec_id"""
      },
      "sim_ivf_assign" ->
        s"""WITH $ivfAssignCtes
           SELECT vec_id, cell FROM asn""",
      // md5-hyperplane LSH top-k: candidates = pairs within hamming 1 of
      // the query's bucket in one of the two tables (seeds 0 and 8 — the
      // Spark side's t * nBits family selectors), exact cosine + top-5
      // within. The hyperplane CTE re-derives Similarity.md5Hyperplanes
      "sim_topk_lsh" -> {
        def nib(n: Int) =
          s"(strpos('0123456789abcdef', substr(h, $n, 1)) - 1)"
        s"""WITH hp AS (
              SELECT s, i, list(comp ORDER BY j) AS hl FROM (
                SELECT s, i, j,
                  ((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})
                    % 1001 - 500) / 500.0 AS comp
                FROM (SELECT s, i, j, md5('lsh:' || s::VARCHAR || ':' ||
                        i::VARCHAR || ':' || j::VARCHAR) AS h
                      FROM (SELECT unnest([0, 8]) AS s) ss
                      CROSS JOIN range(8) t(i) CROSS JOIN range(64) u(j))
              ) GROUP BY s, i),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            b AS (SELECT vec_id, s,
                CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << i) ELSE 0 END)
                  AS BIGINT) AS bucket
              FROM (SELECT e.vec_id, hp.s, hp.i,
                  list_reduce(list_transform(range(64), j -> e.v[j+1] * hp.hl[j+1]),
                    (a, b) -> a + b) AS proj
                FROM e CROSS JOIN hp)
              GROUP BY vec_id, s),
            cand AS (SELECT DISTINCT qb.vec_id AS query_id, b.vec_id AS neighbor_id
              FROM (SELECT * FROM b WHERE vec_id % 50 = 0) qb
              JOIN b ON qb.s = b.s AND qb.vec_id <> b.vec_id
                AND bit_count(xor(qb.bucket, b.bucket)) <= 1),
            scored AS (SELECT c.query_id, c.neighbor_id,
                CASE WHEN sqrt(list_dot_product(qe.v, qe.v))
                       * sqrt(list_dot_product(ne.v, ne.v)) = 0 THEN 0.0
                  ELSE list_dot_product(qe.v, ne.v)
                    / (sqrt(list_dot_product(qe.v, qe.v))
                       * sqrt(list_dot_product(ne.v, ne.v))) END AS cos
              FROM cand c JOIN e qe ON qe.vec_id = c.query_id
                   JOIN e ne ON ne.vec_id = c.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
              SELECT query_id, neighbor_id, cos,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM scored) WHERE rank <= 5"""
      },
      // fixed-centroid IVF probe: top-4 cells per query by the shared
      // assignment score (sc DESC, cell DESC — Ivf.probe's tie rule), exact
      // cosine top-5 within the probed cells' members
      "sim_topk_ivf" ->
        s"""WITH $ivfAssignCtes,
            probe AS (SELECT vec_id AS query_id, cell FROM sc
              WHERE vec_id % 50 = 0
              QUALIFY row_number() OVER (PARTITION BY vec_id
                ORDER BY sc DESC, cell DESC) <= 4),
            cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
              FROM probe p JOIN asn a
                ON a.cell = p.cell AND a.vec_id <> p.query_id),
            scored AS (SELECT c.query_id, c.neighbor_id,
                CASE WHEN sqrt(list_dot_product(qe.v, qe.v))
                       * sqrt(list_dot_product(ne.v, ne.v)) = 0 THEN 0.0
                  ELSE list_dot_product(qe.v, ne.v)
                    / (sqrt(list_dot_product(qe.v, qe.v))
                       * sqrt(list_dot_product(ne.v, ne.v))) END AS cos
              FROM cand c JOIN e qe ON qe.vec_id = c.query_id
                   JOIN e ne ON ne.vec_id = c.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank FROM (
              SELECT query_id, neighbor_id, cos,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
              FROM scored) WHERE rank <= 5""",
      // recall@5 of the IVF probe vs exact brute force at nProbe 1/2/4:
      // both sides break cosine ties by neighbor_id so the top-5 SETS
      // are deterministic; hits are exact joins, recall an integer-nano
      // truncated ladder
      "sim_recall_eval" -> {
        val cos =
          """CASE WHEN sqrt(list_dot_product(qe.v, qe.v))
                 * sqrt(list_dot_product(ne.v, ne.v)) = 0 THEN 0.0
             ELSE list_dot_product(qe.v, ne.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ne.v, ne.v))) END"""
        def lane(np: Int) =
          s"""probe$np AS (SELECT vec_id AS query_id, cell FROM sc
                WHERE vec_id % 50 = 0
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY sc DESC, cell DESC) <= $np),
              cand$np AS (SELECT p.query_id, a.vec_id AS neighbor_id
                FROM probe$np p JOIN asn a
                  ON a.cell = p.cell AND a.vec_id <> p.query_id),
              top$np AS (SELECT query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                  row_number() OVER (PARTITION BY c.query_id
                    ORDER BY $cos DESC, c.neighbor_id) AS rank
                FROM cand$np c JOIN e qe ON qe.vec_id = c.query_id
                     JOIN e ne ON ne.vec_id = c.neighbor_id)
                WHERE rank <= 5),
              hit$np AS (SELECT count(*) AS hits FROM top$np t
                JOIN truth g ON g.query_id = t.query_id
                  AND g.neighbor_id = t.neighbor_id)"""
        // the IVF-PQ lane replays the ADC scoring (codes from the fixed
        // 16-entry codebook, per-subvector distance tables) and counts
        // its top-5 hits against the same exact truth
        val pqLane =
          s"""cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j,
                  embedding::DOUBLE[] AS cv
                FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
              ms AS (SELECT unnest(range(8)) AS m),
              psc AS (SELECT e2.vec_id, ms.m, cb.j,
                  list_reduce(list_transform(range(8), i ->
                    (e2.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])
                    * (e2.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])),
                    (a, b) -> a + b) AS d
                FROM e e2 CROSS JOIN ms CROSS JOIN cbv cb),
              code AS (SELECT vec_id, m, j AS c FROM psc
                QUALIFY row_number() OVER (PARTITION BY vec_id, m
                  ORDER BY d, j) = 1),
              probePq AS (SELECT vec_id AS query_id, cell FROM sc
                WHERE vec_id % 50 = 0
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY sc DESC, cell DESC) <= 3),
              candPq AS (SELECT p.query_id, a.vec_id AS neighbor_id
                FROM probePq p JOIN asn a
                  ON a.cell = p.cell AND a.vec_id <> p.query_id),
              qv AS (SELECT vec_id AS query_id, v AS qv FROM e
                WHERE vec_id % 50 = 0),
              dm AS (SELECT c2.query_id, c2.neighbor_id, k2.m,
                  list_reduce(list_transform(range(8), i ->
                    (q.qv[k2.m*8 + i + 1] - cb.cv[k2.m*8 + i + 1])
                    * (q.qv[k2.m*8 + i + 1] - cb.cv[k2.m*8 + i + 1])),
                    (a, b) -> a + b) AS d
                FROM candPq c2 JOIN code k2 ON k2.vec_id = c2.neighbor_id
                JOIN cbv cb ON cb.j = k2.c
                JOIN qv q ON q.query_id = c2.query_id),
              topPq AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dist, neighbor_id) AS rank
                FROM (SELECT query_id, neighbor_id,
                    list_reduce(list(d ORDER BY m), (a, b) -> a + b) AS dist
                  FROM dm GROUP BY 1, 2)) WHERE rank <= 5),
              hitPq AS (SELECT count(*) AS hits FROM topPq t
                JOIN truth g ON g.query_id = t.query_id
                  AND g.neighbor_id = t.neighbor_id)"""
        s"""WITH $ivfAssignCtes,
            qs AS (SELECT count(*) AS nq FROM e WHERE vec_id % 50 = 0),
            truth AS (SELECT query_id, neighbor_id FROM (
              SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY qe.vec_id
                  ORDER BY $cos DESC, ne.vec_id) AS rank
              FROM e qe JOIN e ne ON qe.vec_id % 50 = 0
                AND ne.vec_id <> qe.vec_id)
              WHERE rank <= 5),
            ${lane(1)},
            ${lane(2)},
            ${lane(4)},
            $pqLane
            SELECT lane, CAST(n_probe AS INTEGER) AS n_probe,
              CAST(nq AS BIGINT) AS n_queries,
              CAST(hits AS BIGINT) AS hits,
              CAST(hits * 1000000000 // (nq * 5) AS BIGINT) AS recall_nano
            FROM (SELECT 'ivf' AS lane, 1 AS n_probe, hits FROM hit1
              UNION ALL SELECT 'ivf', 2, hits FROM hit2
              UNION ALL SELECT 'ivf', 4, hits FROM hit4
              UNION ALL SELECT 'ivfpq', 3, hits FROM hitPq) CROSS JOIN qs"""
      },
      // hyperplane-LSH recall replay: per (tables, bits) lane the oracle
      // re-derives every table's md5 hyperplanes (seed = t·bits — the
      // lshBucketMd5 convention), buckets the corpus, probes hamming<=1,
      // ranks the candidates by exact cosine, and counts top-5 hits
      // against the same brute-force truth as sim_recall_eval
      "sim_recall_lsh" -> {
        val cos =
          """CASE WHEN sqrt(list_dot_product(qe.v, qe.v))
                 * sqrt(list_dot_product(ne.v, ne.v)) = 0 THEN 0.0
             ELSE list_dot_product(qe.v, ne.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ne.v, ne.v))) END"""
        def nib(n: Int) =
          s"(strpos('0123456789abcdef', substr(h, $n, 1)) - 1)"
        def lane(l: String, tables: Int, bits: Int) = {
          val seeds = (0 until tables).map(_ * bits).mkString(", ")
          s"""hp$l AS (
                SELECT s, i, list(comp ORDER BY j) AS hl FROM (
                  SELECT s, i, j,
                    ((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})
                      % 1001 - 500) / 500.0 AS comp
                  FROM (SELECT s, i, j, md5('lsh:' || s::VARCHAR || ':' ||
                          i::VARCHAR || ':' || j::VARCHAR) AS h
                        FROM (SELECT unnest([$seeds]) AS s) ss
                        CROSS JOIN range($bits) t(i) CROSS JOIN range(64) u(j))
                ) GROUP BY s, i),
              b$l AS (SELECT vec_id, s,
                  CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << i) ELSE 0 END)
                    AS BIGINT) AS bucket
                FROM (SELECT e.vec_id, hp.s, hp.i,
                    list_reduce(list_transform(range(64), j -> e.v[j+1] * hp.hl[j+1]),
                      (a, b) -> a + b) AS proj
                  FROM e CROSS JOIN hp$l hp)
                GROUP BY vec_id, s),
              cand$l AS (SELECT DISTINCT qb.vec_id AS query_id,
                  bc.vec_id AS neighbor_id
                FROM (SELECT * FROM b$l WHERE vec_id % 50 = 0) qb
                JOIN b$l bc ON qb.s = bc.s AND qb.vec_id <> bc.vec_id
                  AND bit_count(xor(qb.bucket, bc.bucket)) <= 1),
              top$l AS (SELECT query_id, neighbor_id FROM (
                  SELECT c.query_id, c.neighbor_id,
                    row_number() OVER (PARTITION BY c.query_id
                      ORDER BY $cos DESC, c.neighbor_id) AS rank
                  FROM cand$l c JOIN e qe ON qe.vec_id = c.query_id
                       JOIN e ne ON ne.vec_id = c.neighbor_id)
                WHERE rank <= 5),
              hit$l AS (SELECT count(*) AS hits FROM top$l t
                JOIN truth g ON g.query_id = t.query_id
                  AND g.neighbor_id = t.neighbor_id)"""
        }
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            qs AS (SELECT count(*) AS nq FROM e WHERE vec_id % 50 = 0),
            truth AS (SELECT query_id, neighbor_id FROM (
              SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY qe.vec_id
                  ORDER BY $cos DESC, ne.vec_id) AS rank
              FROM e qe JOIN e ne ON qe.vec_id % 50 = 0
                AND ne.vec_id <> qe.vec_id)
              WHERE rank <= 5),
            ${lane("T1B8", 1, 8)},
            ${lane("T2B8", 2, 8)},
            ${lane("T4B8", 4, 8)},
            ${lane("T2B12", 2, 12)}
            SELECT CAST(n_tables AS INTEGER) AS n_tables,
              CAST(n_bits AS INTEGER) AS n_bits,
              CAST(nq AS BIGINT) AS n_queries,
              CAST(hits AS BIGINT) AS hits,
              CAST(hits * 1000000000 // (nq * 5) AS BIGINT) AS recall_nano
            FROM (SELECT 1 AS n_tables, 8 AS n_bits, hits FROM hitT1B8
              UNION ALL SELECT 2, 8, hits FROM hitT2B8
              UNION ALL SELECT 4, 8, hits FROM hitT4B8
              UNION ALL SELECT 2, 12, hits FROM hitT2B12) CROSS JOIN qs"""
      },
      // md5-LSH near-dup pairs: 3-bit bucket partition (seed 0), pairs
      // share a bucket, exact cosine >= threshold (unrounded filter, like
      // embed_cos_neardup)
      "embed_cos_neardup_lsh" -> {
        def nib(n: Int) =
          s"(strpos('0123456789abcdef', substr(h, $n, 1)) - 1)"
        s"""WITH hp AS (
              SELECT i, list(comp ORDER BY j) AS hl FROM (
                SELECT i, j,
                  ((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})
                    % 1001 - 500) / 500.0 AS comp
                FROM (SELECT i, j, md5('lsh:0:' || i::VARCHAR || ':' || j::VARCHAR) AS h
                      FROM range(3) t(i) CROSS JOIN range(64) u(j))
              ) GROUP BY i),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            b AS (SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << i) ELSE 0 END)
                  AS BIGINT) AS bucket
              FROM (SELECT e.vec_id, hp.i,
                  list_reduce(list_transform(range(64), j -> e.v[j+1] * hp.hl[j+1]),
                    (a, b) -> a + b) AS proj
                FROM e CROSS JOIN hp)
              GROUP BY vec_id)
            SELECT ba.vec_id AS id_a, bb.vec_id AS id_b,
              round(list_dot_product(a.v, c.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
            FROM b ba JOIN b bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
            JOIN e a ON a.vec_id = ba.vec_id JOIN e c ON c.vec_id = bb.vec_id
            WHERE list_dot_product(a.v, c.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(c.v, c.v))) >= 0.45"""
      },
      "sim_diverse_sample" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH $ivfAssignCtes,
           hh AS (SELECT vec_id, cell,
                  md5('graft-diverse:' || vec_id::VARCHAR) AS h FROM asn)
           SELECT vec_id, cell FROM hh
           QUALIFY row_number() OVER (PARTITION BY cell
             ORDER BY ($u32) / 4294967296.0, vec_id) <= 4"""
      },
      "embed_cos_neardup" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45""",
      // PQ: codes = per-subspace argmin sub-centroid (squared L2,
      // dim-sequential fold, ties to the lowest code) against the fixed
      // first-16 codebooks; ADC distance = ordered fold of per-subspace
      // lookup distances — both exact functions of the data
      "sim_pq_codes" ->
        """WITH cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j,
                embedding::DOUBLE[] AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
            ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            ms AS (SELECT unnest(range(8)) AS m),
            sc AS (SELECT e.vec_id, ms.m, cb.j,
                list_reduce(list_transform(range(8), i ->
                  (e.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])
                  * (e.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])),
                  (a, b) -> a + b) AS d
              FROM ev e CROSS JOIN ms CROSS JOIN cbv cb),
            code AS (SELECT vec_id, m, j AS c FROM sc
              QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) = 1)
            SELECT vec_id, string_agg(c::VARCHAR, ',' ORDER BY m) AS codes_csv
            FROM code GROUP BY vec_id""",
      "sim_topk_pq" ->
        """WITH cbv AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j,
                embedding::DOUBLE[] AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
            ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            ms AS (SELECT unnest(range(8)) AS m),
            sc AS (SELECT e.vec_id, ms.m, cb.j,
                list_reduce(list_transform(range(8), i ->
                  (e.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])
                  * (e.v[ms.m*8 + i + 1] - cb.cv[ms.m*8 + i + 1])),
                  (a, b) -> a + b) AS d
              FROM ev e CROSS JOIN ms CROSS JOIN cbv cb),
            code AS (SELECT vec_id, m, j AS c FROM sc
              QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) = 1),
            q AS (SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id % 50 = 0),
            dm AS (SELECT q.query_id, c.vec_id AS neighbor_id, c.m,
                list_reduce(list_transform(range(8), i ->
                  (q.qv[c.m*8 + i + 1] - cb.cv[c.m*8 + i + 1])
                  * (q.qv[c.m*8 + i + 1] - cb.cv[c.m*8 + i + 1])),
                  (a, b) -> a + b) AS d
              FROM code c JOIN cbv cb ON cb.j = c.c
              JOIN q ON q.query_id <> c.vec_id),
            tot AS (SELECT query_id, neighbor_id,
                list_reduce(list(d ORDER BY m), (a, b) -> a + b) AS dist
              FROM dm GROUP BY 1, 2)
            SELECT query_id, neighbor_id, round(dist, 6) AS adc_dist, rank FROM (
              SELECT query_id, neighbor_id, dist,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY dist, neighbor_id) AS INTEGER) AS rank
              FROM tot) WHERE rank <= 5""",
      // IVF-PQ: probe cells from the shared assignment scores (top-3 by
      // score DESC, cell DESC — the assignment tie rule), candidates =
      // probed cells' members, then the same PQ/ADC algebra as sim_topk_pq.
      // The log-structured-maintained index converges to the same state, so
      // sim_ivfpq_incr shares the oracle verbatim (ivfPqSql).
      "sim_topk_ivfpq" -> ivfPqSql,
      "sim_ivfpq_incr" -> ivfPqSql,
      "sim_ivfpq_stream" -> ivfPqSql,
      // same pair formulation as embed_cos_neardup, restricted to co-celled
      // vectors via the shared fixed-centroid assignment CTEs
      "embed_neardup_cell" ->
        s"""WITH $ivfAssignCtes
           SELECT a.vec_id AS id_a, b.vec_id AS id_b, aa.cell,
             round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
           FROM asn aa JOIN asn bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
           JOIN e a ON a.vec_id = aa.vec_id JOIN e b ON b.vec_id = bb.vec_id
           WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""",
      "text_subword_count" ->
        raw"""SELECT doc_id, CAST(len(regexp_extract_all(lower(trim(text)),
             '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_subwords
             FROM documents""",
      "text_rolling_hash" ->
        s"""SELECT doc_id, list_reduce(list_prepend('graft', $toks),
            (a, b) -> md5(a || '|' || b)) AS rhash FROM documents""",
      "dedup_simhash" ->
        raw"""WITH hs AS (SELECT doc_id,
                list_transform(string_split_regex(trim(lower(text)), '\s+'),
                               t -> md5(t)) AS hl
              FROM documents),
            sg AS (SELECT doc_id,
                list_transform(range(64), j -> CASE WHEN 2 * len(list_filter(hl,
                    h -> ((strpos('0123456789abcdef', substr(h, (j // 4) + 1, 1)) - 1)
                          >> (3 - (j % 4))) & 1 = 1))
                  > len(hl) THEN 1 ELSE 0 END) AS bits
              FROM hs)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(len(list_filter(range(64),
                j -> a.bits[j + 1] != b.bits[j + 1])) AS INTEGER) AS hamming
            FROM sg a JOIN sg b ON a.doc_id < b.doc_id
            WHERE len(list_filter(range(64),
              j -> a.bits[j + 1] != b.bits[j + 1])) <= 3""",
      // the WET extraction replayed: same page construction, same chain,
      // same order (&amp; decoded LAST), same explicit whitespace class
      "text_html_extract" ->
        s"""$HtmlCleanCtes
            SELECT doc_id, text AS clean_text FROM c""",
      // the block classifier replayed: same split, same clean chain per
      // block, same integer link-density rule
      "text_html_content" ->
        s"""$HtmlContentCtes
            SELECT doc_id, CAST(n_blocks AS INTEGER) AS n_blocks,
              CAST(n_boiler AS INTEGER) AS n_boiler,
              text AS content_text FROM c""",
      // the link graph from arithmetic alone: anchor k of doc d targets
      // page (d + 31(k+1)) % 401 on corpus.example (k=0,2) or a
      // co.uk subdomain (k=1,3); only the k=2 anchor keeps (sorted)
      // params after normalization. The rollup key replays the SAME
      // pinned public-suffix table the engine resolves eTLD+1 with
      "web_link_graph" -> WebLinkGraphSql,
      // the WAT sidecar must carry EXACTLY the HTML-derived edges: the
      // JSON metadata round trip shares the link graph's oracle, so a
      // serialization or parse slip breaks the hash even though the
      // wire format is entirely different
      "wat_link_graph" -> WebLinkGraphSql,
      "url_domain_stats" ->
        raw"""WITH h AS (SELECT doc_id,
              (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE 'cdn.assets.' END)
                || 'site' || (doc_id % 5) || '.' ||
                (CASE CAST(doc_id % 6 AS INTEGER) WHEN 0 THEN 'com'
                  WHEN 1 THEN 'org' WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk'
                  WHEN 4 THEN 'com.au' ELSE 'github.io' END) AS host
              FROM documents),
            sp AS (SELECT doc_id, host, string_split(host, '.') AS ls
              FROM h),
            dd AS (SELECT doc_id, host,
              ${graft.text.PublicSuffix.sqlRegistrableDomain("host", "ls")}
              AS domain FROM sp)
            SELECT domain, count(*) AS n_docs,
              count(DISTINCT host) AS n_hosts
            FROM dd GROUP BY 1""",
      // the URL normalizer replayed: same fragment/scheme/host/port/
      // param arithmetic, same RE2 patterns, same sort
      "url_normalize" ->
        s"""$UrlNormCtes
            SELECT doc_id, url, url_norm FROM un""",
      "dedup_url" ->
        s"""$UrlNormCtes
            SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS first_doc,
              count(*) AS n_docs FROM un GROUP BY url_norm""",
      // the crawl funnel replayed: the block chain ends in c(doc_id,
      // n_blocks, n_boiler, text) with `text` = the CONTENT after the
      // boilerplate drop, so the language/quality fragments apply to it
      // unchanged
      "pipeline_web" ->
        s"""$HtmlContentCtes,
            l AS (SELECT doc_id, CAST(n_blocks AS INTEGER) AS n_blocks,
                CAST(n_boiler AS INTEGER) AS n_boiler,
                CAST(length(text) AS INTEGER)
                AS clean_chars,
              ${langHits("en")} AS en, ${langHits("es")} AS es,
              ${langHits("fr")} AS fr, ${langHits("de")} AS de,
              ${langHits("zh")} AS zh,
              round($qualityExpr, 2) AS quality FROM c),
            g AS (SELECT doc_id, n_blocks, n_boiler, clean_chars, CASE
              WHEN en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0 THEN 'und'
              WHEN en >= es AND en >= fr AND en >= de AND en >= zh THEN 'en'
              WHEN es >= fr AND es >= de AND es >= zh THEN 'es'
              WHEN fr >= de AND fr >= zh THEN 'fr'
              WHEN de >= zh THEN 'de' ELSE 'zh' END AS lang_pred,
              quality FROM l)
            SELECT doc_id, n_blocks, n_boiler, clean_chars, lang_pred,
              quality, (lang_pred = 'en' AND quality >= 0.6) AS kept FROM g""",
      // the HTTP extraction replayed from arithmetic: status/reason by
      // doc_id%7, charset decision by doc_id%2 (header param vs
      // fallback), body = the html page whose md5 DuckDB recomputes —
      // a de-chunking or framing slip on the Spark side hash-mismatches
      "warc_http_extract" ->
        s"""WITH $HtmlPageCtes
            SELECT doc_id,
              CAST(CASE WHEN doc_id % 7 = 0 THEN 404
                WHEN doc_id % 7 = 3 THEN 301 ELSE 200 END AS INTEGER)
                AS http_status,
              CASE WHEN doc_id % 7 = 0 THEN 'Not Found'
                WHEN doc_id % 7 = 3 THEN 'Moved Permanently'
                ELSE 'OK' END AS http_reason,
              CAST(4 AS INTEGER) AS n_headers,
              CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=UTF-8'
                ELSE 'text/html' END AS content_type_hdr,
              CASE WHEN doc_id % 2 = 0 THEN 'utf-8'
                ELSE 'windows-1252' END AS charset,
              CASE WHEN doc_id % 2 = 0 THEN 'header'
                ELSE 'fallback' END AS charset_src,
              CAST(octet_length(encode(html)) AS BIGINT) AS body_bytes,
              md5(html) AS body_md5
            FROM h""",
      // per-type census re-derived from the fixture arithmetic: one
      // warcinfo per staged shard (4 pmod partitions), request+response
      // per doc, revisit per 10th doc; warcinfo carries no Target-URI
      "warc_type_survey" ->
        raw"""WITH d AS (SELECT doc_id FROM documents)
            SELECT 'warcinfo' AS warc_type,
              CAST(count(DISTINCT doc_id % 4) AS BIGINT) AS n_records,
              CAST(0 AS BIGINT) AS n_with_url FROM d
            UNION ALL SELECT 'request', CAST(count(*) AS BIGINT),
              CAST(count(*) AS BIGINT) FROM d
            UNION ALL SELECT 'response', CAST(count(*) AS BIGINT),
              CAST(count(*) AS BIGINT) FROM d
            UNION ALL SELECT 'revisit',
              CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
              FROM d""",
      // the robots verdicts derived INDEPENDENTLY from arithmetic: the
      // oracle states what RFC 9309 longest-match must decide for each
      // (path shape, host parity), without replaying the parser
      "url_robots_filter" ->
        raw"""WITH u AS (SELECT doc_id,
              CAST(doc_id % 7 AS INTEGER) AS h,
              CAST(doc_id % 5 AS INTEGER) AS p FROM documents)
            SELECT doc_id,
              'https://site' || h || '.com' ||
                (CASE p WHEN 0 THEN '/page/' || doc_id
                  WHEN 1 THEN '/private/p' || doc_id
                  WHEN 2 THEN '/private/pub/q' || doc_id
                  WHEN 3 THEN '/tmp/t' || doc_id ELSE '/' END) AS url,
              CASE p WHEN 0 THEN (h % 2 = 1) WHEN 1 THEN false
                WHEN 2 THEN true WHEN 3 THEN false ELSE true
                END AS allowed,
              CASE p WHEN 0 THEN (CASE WHEN h % 2 = 0 THEN '/page/' END)
                WHEN 1 THEN '/private/' WHEN 2 THEN '/private/pub/'
                WHEN 3 THEN '/tmp/' ELSE NULL END AS matched_prefix
            FROM u""",
      // the shard-health census replayed: residue-keyed shards, the
      // truncated one loses exactly its final (max-doc_id) member
      "warc_torn_survey" ->
        raw"""WITH r AS (SELECT CAST(doc_id % 4 AS INTEGER) AS shard,
              count(*) AS n FROM documents GROUP BY 1)
            SELECT shard,
              CAST(n - CASE WHEN shard = 1 THEN 1 ELSE 0 END AS BIGINT)
                AS n_records,
              (shard = 1) AS torn
            FROM r""",
      // the charset decision + decode replayed from codepoint
      // arithmetic: DuckDB rebuilds the DECODED text (doc text + the
      // per-charset marker via chr(), + the meta prefix where declared)
      // and md5s its utf-8 form — byte-for-byte against the engine's
      // detect-and-decode output
      "text_html_charset" ->
        raw"""WITH m AS (SELECT doc_id, text,
              CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN ' caf' || chr(233) || ' ' || chr(20013) ||
                  chr(25991) || ' ' || chr(8364)
                WHEN 1 THEN ' caf' || chr(233) || ' ' || chr(8212) ||
                  ' ' || chr(8364)
                ELSE ' caf' || chr(233) || ' ' || chr(189) || chr(252)
                END AS marker,
              CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'utf-8'
                WHEN 1 THEN 'windows-1252' ELSE 'iso-8859-1'
                END AS charset,
              CASE WHEN doc_id % 6 = 1 THEN 'fallback'
                WHEN doc_id % 2 = 0 THEN 'header'
                ELSE 'meta' END AS charset_src FROM documents),
            dec AS (SELECT doc_id, charset, charset_src,
              (CASE WHEN charset_src = 'meta'
                THEN '<meta charset="' || charset || '">' ELSE '' END)
                || text || marker AS decoded FROM m)
            SELECT doc_id, charset, charset_src,
              CAST(length(decoded) AS BIGINT) AS n_chars,
              md5(decoded) AS text_md5 FROM dec""",
      // the WET digest replayed: the same block/boilerplate chain ends
      // in c(doc_id, ..., text); md5 + octet_length over ITS utf-8
      // bytes must equal what came back through the conversion records
      "fmt_wet_roundtrip" ->
        s"""$HtmlContentCtes
            SELECT doc_id, 'conversion' AS warc_type,
              CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
              md5(text) AS payload_md5
            FROM c""",
      "text_stats" ->
        s"""SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toks) END::BIGINT AS n_tokens,
            round(CASE WHEN length(trim(text)) = 0 OR len($toks) = 0 THEN 0.0
              ELSE list_sum(list_transform($toks, t -> length(t)))::DOUBLE / len($toks) END, 6)
              AS mean_token_len,
            round(CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                / length(text) END, 6) AS punct_ratio,
            md5(array_to_string($toks, ' ')) AS fingerprint
            FROM documents""",
      "text_langid" ->
        s"""WITH h AS (SELECT doc_id, ${langHits("en")} AS en, ${langHits("es")} AS es,
              ${langHits("fr")} AS fr, ${langHits("de")} AS de, ${langHits("zh")} AS zh
              FROM documents)
            SELECT doc_id, CASE
              WHEN en = 0 AND es = 0 AND fr = 0 AND de = 0 AND zh = 0 THEN 'und'
              WHEN en >= es AND en >= fr AND en >= de AND en >= zh THEN 'en'
              WHEN es >= fr AND es >= de AND es >= zh THEN 'es'
              WHEN fr >= de AND fr >= zh THEN 'fr'
              WHEN de >= zh THEN 'de' ELSE 'zh' END AS lang_pred FROM h""",
      "text_quality" ->
        s"SELECT doc_id, round($qualityExpr, 2) AS quality FROM documents",
      "corpus_zipf" ->
        s"""WITH tc AS (SELECT t AS token, count(*)::BIGINT AS cnt
              FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
            top AS (SELECT token, cnt FROM tc
              ORDER BY cnt DESC, token LIMIT 1024),
            r AS (SELECT cnt, row_number()
                OVER (ORDER BY cnt DESC, token) AS rank FROM top),
            pt AS (SELECT (length(bin(rank)) - 1)::BIGINT AS x,
                (length(bin(cnt)) - 1)::BIGINT AS y FROM r),
            m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
                sum(x * y)::BIGINT AS sxy FROM pt)
            SELECT (n * sxy - sx * sy) * 1000000000
                     // (n * sxx - sx * sx) AS slope_nano,
                   (sy * sxx - sx * sxy) * 1000000000
                     // (n * sxx - sx * sx) AS intercept_nano,
                   n
            FROM m""",
      "quality_probe_weights" ->
        s"""WITH $probeSolve
            SELECT CAST(det0 * 1000000000 // det AS BIGINT) AS w0_nano,
                   CAST(det1 * 1000000000 // det AS BIGINT) AS w1_nano,
                   CAST(det2 * 1000000000 // det AS BIGINT) AS w2_nano,
                   CAST(n AS BIGINT) AS n
            FROM w""",
      // maintained ≡ rebuilt: both maintained paths must equal the
      // one-shot retrain over the final corpus state
      "quality_probe_incr" ->
        s"""WITH $probeSolve
            SELECT CAST(det0 * 1000000000 // det AS BIGINT) AS w0_nano,
                   CAST(det1 * 1000000000 // det AS BIGINT) AS w1_nano,
                   CAST(det2 * 1000000000 // det AS BIGINT) AS w2_nano,
                   CAST(n AS BIGINT) AS n
            FROM w""",
      "quality_probe_stream" ->
        s"""WITH $probeSolve
            SELECT CAST(det0 * 1000000000 // det AS BIGINT) AS w0_nano,
                   CAST(det1 * 1000000000 // det AS BIGINT) AS w1_nano,
                   CAST(det2 * 1000000000 // det AS BIGINT) AS w2_nano,
                   CAST(n AS BIGINT) AS n
            FROM w""",
      "quality_probe_score" ->
        s"""WITH $probeSolve
            SELECT doc_id,
              CAST(det0 * 1000000000 // det AS BIGINT)
                + CAST(det1 * 1000000000 // det AS BIGINT) * x1
                + CAST(det2 * 1000000000 // det AS BIGINT) * x2 AS pred_nano,
              y
            FROM d CROSS JOIN w""",
      // calibration: same pred_nano; observed min/max split into 10
      // bands (+1 span so max lands in the top band), truncating nano
      // positive rate per band
      "quality_probe_calibration" ->
        s"""WITH $probeSolve,
            sc AS (SELECT y,
                (CAST(det0 * 1000000000 // det AS BIGINT)
                 + CAST(det1 * 1000000000 // det AS BIGINT) * x1
                 + CAST(det2 * 1000000000 // det AS BIGINT) * x2) AS pred
              FROM d CROSS JOIN w),
            mm AS (SELECT min(pred) AS mn, max(pred) AS mx FROM sc),
            bk AS (SELECT ((pred - mn) * 10) // (mx - mn + 1) AS bucket,
                pred, y FROM sc CROSS JOIN mm)
            SELECT bucket::BIGINT AS bucket,
              min(pred)::BIGINT AS lo_nano,
              count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
              ((sum(y) * 1000000000) // count(*)) / 1000000000.0 AS pos_rate
            FROM bk GROUP BY 1""",
      "quality_probe_eval" ->
        s"""WITH $probeSolve,
            sc AS (SELECT y, CASE WHEN
                (CAST(det0 * 1000000000 // det AS BIGINT)
                 + CAST(det1 * 1000000000 // det AS BIGINT) * x1
                 + CAST(det2 * 1000000000 // det AS BIGINT) * x2) * 2
                >= 1000000000 THEN 1 ELSE 0 END::BIGINT AS p
              FROM d CROSS JOIN w)
            SELECT sum(p * y)::BIGINT AS tp, sum(p * (1 - y))::BIGINT AS fp,
                   sum((1 - p) * y)::BIGINT AS fn,
                   sum((1 - p) * (1 - y))::BIGINT AS tn
            FROM sc""",
      "mm_meta" ->
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS checksum FROM documents""",
      "mm_phash_dedup" ->
        """WITH d AS (SELECT doc_id,
             regexp_extract_all(hex(encode(text)), '..') AS hx FROM documents),
           v AS (SELECT doc_id,
             list_transform(hx, s ->
               ((strpos('0123456789ABCDEF', substr(s, 1, 1)) - 1) * 16 +
                (strpos('0123456789ABCDEF', substr(s, 2, 1)) - 1))::BIGINT) AS bs,
             len(hx) AS n FROM d),
           b AS (SELECT doc_id, n, list_transform(range(16), b ->
             coalesce(list_sum(bs[((n*b)//16 + 1)::INT:((n*(b+1))//16)::INT]), 0)
               ::BIGINT) AS sums FROM v),
           p AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(15), i ->
             CASE WHEN sums[(i+1)::INT] * ((n*(i+2))//16 - (n*(i+1))//16)
                       > sums[(i+2)::INT] * ((n*(i+1))//16 - (n*i)//16)
               THEN (1::BIGINT << i::INT) ELSE 0 END)), 0) AS BIGINT) AS phash
             FROM b),
           c AS (SELECT phash, count(*) AS c FROM p GROUP BY phash)
           SELECT doc_id, p.phash, (c.c > 1) AS is_dup
           FROM p JOIN c ON p.phash = c.phash""",
      "mm_decode" ->
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(1 + octet_length(encode(text)) % 640 AS INTEGER) AS dim1,
           CAST(1 + octet_length(encode(text)) % 480 AS INTEGER) AS dim2 FROM documents""",
      // the WAV round-trip decode: the PCM payload is the doc's
      // even-truncated UTF-8 bytes, so the decoded sample stats equal the
      // 16-bit LE signed reading of those bytes (len(by)//2 drops the odd
      // tail exactly like the even truncation)
      "mm_decode_wav" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by FROM documents),
            s AS (SELECT doc_id, by, len(by) // 2 AS ns FROM b),
            r AS (SELECT doc_id, ns, list_transform(range(ns), i ->
                ${bv("2*i+1")} + 256 * ${bv("2*i+2")}) AS us FROM s),
            v AS (SELECT doc_id, ns, list_transform(us, x ->
                CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS vs FROM r)
            SELECT doc_id,
              CAST(8000 AS INTEGER) AS sample_rate,
              CAST(1 AS INTEGER) AS channels,
              CAST(16 AS INTEGER) AS bits,
              CAST(ns AS BIGINT) AS n_samples,
              CAST(coalesce(list_sum(vs), 0) AS BIGINT) AS sum_samples,
              CAST(coalesce(list_sum(list_transform(vs, x -> x * x)), 0)
                AS BIGINT) AS sum_squares,
              CAST(coalesce(list_aggregate(list_transform(vs, x -> abs(x)),
                'max'), 0) AS BIGINT) AS max_abs
            FROM v"""
      },
      // G.711 μ-law: sample = ±(((mantissa·8 + 132) << exponent) − 132)
      // over the complemented byte — validated against an independent
      // reference for all 256 byte values
      "mm_decode_mulaw" -> {
        val mag = "((((255-b)%16)*8 + 132) * (1 << (((255-b)//16)%8))) - 132"
        g711OracleSql(s"CASE WHEN (255-b) >= 128 THEN -($mag) ELSE $mag END")
      },
      // IMA ADPCM: the oracle replays the exact per-nibble recurrence —
      // step table lookup, 3-bit magnitude expansion, ±32767 clamp,
      // index advance clamped to [0,88] — in a recursive CTE whose
      // frontier is one row per (doc, 12-byte block), 2 nibbles per data
      // byte plus the header's sample 0; block state resets per block
      "mm_decode_adpcm" -> {
        val st = "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41," +
          "45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230," +
          "253,279,307,337,371,408,449,494,544,598,658,724,796,876,963," +
          "1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024," +
          "3327,3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493," +
          "10442,11487,12635,13899,15289,16818,18500,20350,22385,24623," +
          "27086,29794,32767]"
        val it = "[-1,-1,-1,-1,2,4,6,8]"
        raw"""WITH RECURSIVE b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by
                FROM documents),
            v AS (SELECT doc_id, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM b),
            blk AS (SELECT doc_id, j,
                bv[(j*8+1)::INT:(LEAST((j+1)*8, len(bv)))::INT] AS bb
              FROM v, unnest(range((len(bv) + 7) // 8)) AS t(j)),
            rec AS (
              SELECT doc_id, j, bb, 0 AS q, 0 AS pred, 0 AS sidx, 0 AS s
              FROM blk
              UNION ALL
              SELECT doc_id, j, bb, q + 1,
                LEAST(32767, GREATEST(-32768,
                  CASE WHEN nib >= 8 THEN pred - diff
                       ELSE pred + diff END)) AS pred,
                LEAST(88, GREATEST(0, sidx + ($it)[(nib % 8) + 1])) AS sidx,
                LEAST(32767, GREATEST(-32768,
                  CASE WHEN nib >= 8 THEN pred - diff
                       ELSE pred + diff END)) AS s
              FROM (SELECT doc_id, j, bb, q, pred, sidx,
                  CASE WHEN q % 2 = 0 THEN bb[(q + 2) // 2] % 16
                       ELSE bb[(q + 1) // 2] // 16 END AS nib,
                  ($st)[sidx + 1] AS step
                FROM rec WHERE q < 2 * len(bb)) r,
              LATERAL (SELECT step // 8
                + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
                + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
                + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END
                AS diff) d)
            SELECT d.doc_id,
              CAST(8000 AS INTEGER) AS sample_rate,
              CAST(1 AS INTEGER) AS channels,
              CAST(4 AS INTEGER) AS bits,
              CAST(coalesce(r.n, 0) AS BIGINT) AS n_samples,
              CAST(coalesce(r.s, 0) AS BIGINT) AS sum_samples,
              CAST(coalesce(r.sq, 0) AS BIGINT) AS sum_squares,
              CAST(coalesce(r.mx, 0) AS BIGINT) AS max_abs
            FROM documents d LEFT JOIN (
              SELECT doc_id, count(*) AS n, sum(s) AS s, sum(s * s) AS sq,
                max(abs(s)) AS mx FROM rec GROUP BY doc_id) r
              USING (doc_id)"""
      },
      // EXIF: every field is doc_id arithmetic (the JPEG payload is
      // irrelevant to the metadata walk); EXIF-free images surface
      // all-absent fields
      "mm_exif_survey" ->
        raw"""SELECT doc_id,
              CASE WHEN doc_id % 5 = 4 THEN ''
                WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
              CAST(CASE WHEN doc_id % 5 = 4 THEN 0
                ELSE 1 + doc_id % 8 END AS INTEGER) AS orientation,
              CASE WHEN doc_id % 5 = 4 THEN ''
                ELSE 'Cam' || (doc_id % 7) END AS make,
              CASE WHEN doc_id % 5 = 4 THEN ''
                ELSE 'M-' || (doc_id % 13) END AS model,
              CASE WHEN doc_id % 5 = 4 THEN ''
                ELSE '2026:01:0' || (1 + doc_id % 9) || ' 12:00:00' END
                AS datetime,
              (doc_id % 5 != 4 AND doc_id % 3 = 0) AS gps_present,
              CAST(CASE WHEN doc_id % 5 != 4 AND doc_id % 3 = 0 THEN 2
                ELSE 0 END AS INTEGER) AS n_gps_tags
            FROM documents WHERE octet_length(encode(text)) >= 1""",
      // MP3: every walker output is fixture doc_id arithmetic — frames,
      // samplerate table, VBR cycle max, frame-exact truncated duration
      "mm_mp3_survey" ->
        raw"""WITH m AS (SELECT doc_id,
              CAST(1 + doc_id % 8 AS INTEGER) AS n_frames,
              CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS INTEGER) AS sample_rate,
              -- a 1-frame "VBR" stream is observationally CBR: the
              -- walker reports what the frames DECLARE, not the fixture
              -- intent
              (doc_id % 4 != 0 OR 1 + doc_id % 8 = 1) AS cbr
              FROM documents)
            SELECT doc_id, n_frames, sample_rate, cbr,
              CAST(CASE WHEN cbr THEN 128
                WHEN n_frames >= 3 THEN 192
                WHEN n_frames = 2 THEN 160 ELSE 128 END AS INTEGER)
                AS max_kbps,
              CAST(n_frames * 1152 * 1000 // sample_rate AS BIGINT)
                AS duration_ms,
              (doc_id % 5 = 0) AS has_id3
            FROM m""",
      // FLAC: decoded sample i ≡ byte i − 128 by fixture construction
      // (the wire format varies per frame; the VALUES don't) — so the
      // oracle is pure byte arithmetic, and any Rice/prediction/CRC slip
      // on the Spark side hash-mismatches
      "mm_decode_flac" ->
        raw"""WITH b AS (SELECT doc_id,
                list_transform(regexp_extract_all(
                    substr(hex(encode(text)), 1, 4096), '..'), h ->
                  (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                  + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1 - 128)
                  AS vs FROM documents)
            SELECT doc_id,
              CAST(8000 AS INTEGER) AS sample_rate,
              CAST(1 AS INTEGER) AS channels,
              CAST(16 AS INTEGER) AS bits,
              CAST((len(vs) + 63) // 64 AS INTEGER) AS n_frames,
              CAST(len(vs) AS BIGINT) AS n_samples,
              CAST(coalesce(list_sum(vs), 0) AS BIGINT) AS sum_samples,
              CAST(coalesce(list_sum(list_transform(vs, x -> x * x)), 0)
                AS BIGINT) AS sum_squares,
              CAST(coalesce(list_aggregate(list_transform(vs, x -> abs(x)),
                'max'), 0) AS BIGINT) AS max_abs
            FROM b""",
      // G.711 A-law: XOR 0x55, segment 0 linear, sign bit SET = positive
      "mm_decode_alaw" -> {
        val mag = "CASE WHEN (xor(b,85)//16)%8 = 0 THEN (xor(b,85)%16)*16 + 8" +
          " ELSE ((xor(b,85)%16)*16 + 264) * (1 << ((xor(b,85)//16)%8 - 1)) END"
        g711OracleSql(s"CASE WHEN xor(b,85) >= 128 THEN ($mag) ELSE -($mag) END")
      },
      // the BMP round-trip decode: the pixel payload is the doc's UTF-8
      // bytes truncated to whole 15-byte rows (width 5 × BGR), stored
      // bottom-up, so channel c's sum is the sum of payload bytes at
      // positions ≡ c (mod 3) and the logical top-left pixel is the FIRST
      // 3 bytes of the LAST stored row
      "mm_decode_bmp" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 15) // 15 AS h,
                (nb - nb % 15) // 3 AS np FROM b),
            p AS (SELECT doc_id, by, h, np, list_transform(range(np), p ->
                [${bv("3*p+1")}, ${bv("3*p+2")}, ${bv("3*p+3")}]) AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(h AS INTEGER) AS height,
              CAST(np AS BIGINT) AS n_px,
              CAST(coalesce(list_sum(list_transform(px, q -> q[1])), 0)
                AS BIGINT) AS sum_b,
              CAST(coalesce(list_sum(list_transform(px, q -> q[2])), 0)
                AS BIGINT) AS sum_g,
              CAST(coalesce(list_sum(list_transform(px, q -> q[3])), 0)
                AS BIGINT) AS sum_r,
              CAST(coalesce(list_aggregate(list_transform(px,
                q -> q[1] + q[2] + q[3]), 'max'), 0) AS BIGINT) AS max_px,
              CASE WHEN h > 0 THEN
                by[((h-1)*15+1)::INT] || by[((h-1)*15+2)::INT] || by[((h-1)*15+3)::INT]
              ELSE '' END AS topleft_hex
            FROM p"""
      },
      // the PNG round-trip decode: pixels are the doc's UTF-8 bytes in
      // whole 15-byte rows (width 5 × RGB), stored TOP-DOWN, so channel
      // c's sum is the payload bytes at positions ≡ c (mod 3) and the
      // top-left pixel is the FIRST 3 bytes; sub-row docs are excluded
      // (PNG requires positive dims)
      "mm_decode_png" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 15) // 15 AS h,
                (nb - nb % 15) // 3 AS np FROM b WHERE nb >= 15),
            p AS (SELECT doc_id, by, h, np, list_transform(range(np), p ->
                [${bv("3*p+1")}, ${bv("3*p+2")}, ${bv("3*p+3")}]) AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(h AS INTEGER) AS height,
              CAST(np AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(px, q -> q[2])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(px, q -> q[3])) AS BIGINT) AS sum_b,
              CAST(list_aggregate(list_transform(px,
                q -> q[1] + q[2] + q[3]), 'max') AS BIGINT) AS max_px,
              by[1] || by[2] || by[3] AS topleft_hex
            FROM p"""
      },
      // Adam7 round-trip: SAME pixel set as the sequential PNG — the
      // oracle re-derives the identical stats; only the decoder's walk
      // (seven pass sub-images) differs, which is the proof
      "mm_decode_png_interlaced" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 15) // 15 AS h,
                (nb - nb % 15) // 3 AS np FROM b WHERE nb >= 15),
            p AS (SELECT doc_id, by, h, np, list_transform(range(np), p ->
                [${bv("3*p+1")}, ${bv("3*p+2")}, ${bv("3*p+3")}]) AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(h AS INTEGER) AS height,
              CAST(np AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(px, q -> q[2])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(px, q -> q[3])) AS BIGINT) AS sum_b,
              CAST(list_aggregate(list_transform(px,
                q -> q[1] + q[2] + q[3]), 'max') AS BIGINT) AS max_px,
              by[1] || by[2] || by[3] AS topleft_hex
            FROM p"""
      },
      // the survey counts re-derived from doc_id alone: each mix slice's
      // own length gate decides membership, the format label is a pure
      // function of the slice
      "mm_format_survey" ->
        raw"""WITH d AS (SELECT doc_id,
                least(octet_length(encode(text)), 2048) AS nb,
                doc_id % 10 AS k FROM documents),
            c AS (SELECT doc_id,
                CASE k
                  WHEN 0 THEN CASE WHEN nb >= 1 THEN 'jpeg_baseline' END
                  WHEN 1 THEN CASE WHEN nb - nb % 4 >= 4 THEN 'jpeg_baseline' END
                  WHEN 2 THEN CASE WHEN nb - nb % 15 >= 15 THEN 'png8' END
                  WHEN 3 THEN CASE WHEN nb - nb % 15 >= 15 THEN 'png8' END
                  WHEN 4 THEN 'jpeg_progressive'
                  WHEN 5 THEN CASE WHEN nb - nb % 30 >= 30 THEN 'png16' END
                  WHEN 6 THEN 'png8_gray'
                  WHEN 7 THEN 'jpeg_sofca'
                  WHEN 8 THEN CASE WHEN nb >= 1 THEN 'flac' END
                  WHEN 9 THEN 'mp3'
                END AS format,
                k IN (0, 1, 2, 3, 5, 6, 8, 9) AS decodable
              FROM d)
            SELECT format, decodable, count(*) AS n FROM c
            WHERE format IS NOT NULL GROUP BY 1, 2""",
      // palette round-trip: payload byte i is an index into the fixture
      // palette (i, (7i+13)%256, (31i+101)%256) — pure arithmetic
      "mm_decode_png_palette" -> {
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by[1:(nb - nb % 5)::INT] AS by,
                (nb - nb % 5) AS n FROM b WHERE nb >= 5),
            v AS (SELECT doc_id, n, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS iv
              FROM s),
            px AS (SELECT doc_id, n,
                list_transform(iv, i -> i) AS rs,
                list_transform(iv, i -> (7*i + 13) % 256) AS gs,
                list_transform(iv, i -> (31*i + 101) % 256) AS bs
              FROM v)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(n // 5 AS INTEGER) AS height,
              CAST(n AS BIGINT) AS n_px,
              CAST(list_sum(rs) AS BIGINT) AS sum_r,
              CAST(list_sum(gs) AS BIGINT) AS sum_g,
              CAST(list_sum(bs) AS BIGINT) AS sum_b,
              CAST(list_aggregate(list_transform(range(n), q ->
                rs[(q+1)::INT] + gs[(q+1)::INT] + bs[(q+1)::INT]), 'max')
                AS BIGINT) AS max_px,
              printf('%02X%02X%02X', rs[1], gs[1], bs[1]) AS topleft_hex
            FROM px"""
      },
      // RGBA round-trip: 4-byte pixels straight off the payload, alpha
      // summed as its own channel, max over R+G+B only
      // grayscale round-trip: one payload byte per pixel feeds all three
      // stat channels; max is 3x the max sample
      "mm_decode_png_gray" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 5) AS n FROM b
              WHERE nb >= 5),
            p AS (SELECT doc_id, n, list_transform(range(n), q ->
                ${bv("q+1")}) AS gv FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(n // 5 AS INTEGER) AS height,
              CAST(n AS BIGINT) AS n_px,
              CAST(list_sum(gv) AS BIGINT) AS sum_r,
              CAST(list_sum(gv) AS BIGINT) AS sum_g,
              CAST(list_sum(gv) AS BIGINT) AS sum_b,
              CAST(3 * list_aggregate(gv, 'max') AS BIGINT) AS max_px,
              printf('%02X%02X%02X', gv[1], gv[1], gv[1]) AS topleft_hex
            FROM p"""
      },
      // gray+alpha round-trip: byte pairs (gray, alpha); alpha summed as
      // its own channel, excluded from max and the hex witness
      "mm_decode_png_graya" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 10) AS n FROM b
              WHERE nb >= 10),
            p AS (SELECT doc_id, n, list_transform(range(n // 2), q ->
                [${bv("2*q+1")}, ${bv("2*q+2")}]) AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(n // 10 AS INTEGER) AS height,
              CAST(n // 2 AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_b,
              CAST(list_sum(list_transform(px, q -> q[2])) AS BIGINT) AS sum_a,
              CAST(3 * list_aggregate(list_transform(px, q -> q[1]), 'max')
                AS BIGINT) AS max_px,
              printf('%02X%02X%02X', px[1][1], px[1][1], px[1][1])
                AS topleft_hex
            FROM p"""
      },
      "mm_decode_png_rgba" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 20) AS n FROM b
              WHERE nb >= 20),
            p AS (SELECT doc_id, n, list_transform(range(n // 4), q ->
                [${bv("4*q+1")}, ${bv("4*q+2")}, ${bv("4*q+3")}, ${bv("4*q+4")}])
                AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(n // 20 AS INTEGER) AS height,
              CAST(n // 4 AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(px, q -> q[2])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(px, q -> q[3])) AS BIGINT) AS sum_b,
              CAST(list_sum(list_transform(px, q -> q[4])) AS BIGINT) AS sum_a,
              CAST(list_aggregate(list_transform(px,
                q -> q[1] + q[2] + q[3]), 'max') AS BIGINT) AS max_px,
              printf('%02X%02X%02X', px[1][1], px[1][2], px[1][3])
                AS topleft_hex
            FROM p"""
      },
      // 16-bit truecolor round-trip: 6 payload bytes per pixel, each
      // sample the big-endian pair 256·hi + lo; the top-left witness is
      // the first six bytes' hex verbatim
      "mm_decode_png16" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        def v16(idx: String) = s"(256 * ${bv(idx)} + ${bv(s"($idx)+1")})"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 30) AS n FROM b
              WHERE nb >= 30),
            p AS (SELECT doc_id, by, n, list_transform(range(n // 6), q ->
                [${v16("6*q+1")}, ${v16("6*q+3")}, ${v16("6*q+5")}])
                AS px FROM s)
            SELECT doc_id,
              CAST(5 AS INTEGER) AS width,
              CAST(n // 30 AS INTEGER) AS height,
              CAST(n // 6 AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(px, q -> q[1])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(px, q -> q[2])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(px, q -> q[3])) AS BIGINT) AS sum_b,
              CAST(list_aggregate(list_transform(px,
                q -> q[1] + q[2] + q[3]), 'max') AS BIGINT) AS max_px,
              by[1] || by[2] || by[3] || by[4] || by[5] || by[6]
                AS topleft_hex
            FROM p"""
      },
      // the JPEG round-trip decode: each payload byte (first 2048 of the
      // doc's UTF-8) becomes one flat 8×8 block of exactly that value, so
      // every statistic is 64× the payload-byte statistic and the top-left
      // pixel is the first byte
      "mm_decode_jpeg" -> {
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
                FROM documents WHERE octet_length(encode(text)) >= 1),
            v AS (SELECT doc_id, by, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM b),
            s AS (SELECT doc_id, by, bv, len(bv) AS n FROM v)
            SELECT doc_id,
              CAST(8 AS INTEGER) AS width,
              CAST(8 * n AS INTEGER) AS height,
              CAST(64 * n AS BIGINT) AS n_px,
              CAST(64 * list_sum(bv) AS BIGINT) AS sum_px,
              CAST(64 * list_sum(list_transform(bv, x -> x * x)) AS BIGINT)
                AS sum_sq,
              CAST(list_aggregate(bv, 'max') AS INTEGER) AS max_px,
              CAST(list_aggregate(bv, 'min') AS INTEGER) AS min_px,
              by[1] AS topleft_hex
            FROM s"""
      },
      // progressive ≡ baseline on the same blocks: the wire format is the
      // only difference, so the SAME oracle pins the multi-scan decode
      "mm_decode_jpeg_progressive" -> {
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
                FROM documents WHERE octet_length(encode(text)) >= 1),
            v AS (SELECT doc_id, by, list_transform(by, h ->
                (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM b),
            s AS (SELECT doc_id, by, bv, len(bv) AS n FROM v)
            SELECT doc_id,
              CAST(8 AS INTEGER) AS width,
              CAST(8 * n AS INTEGER) AS height,
              CAST(64 * n AS BIGINT) AS n_px,
              CAST(64 * list_sum(bv) AS BIGINT) AS sum_px,
              CAST(64 * list_sum(list_transform(bv, x -> x * x)) AS BIGINT)
                AS sum_sq,
              CAST(list_aggregate(bv, 'max') AS INTEGER) AS max_px,
              CAST(list_aggregate(bv, 'min') AS INTEGER) AS min_px,
              by[1] AS topleft_hex
            FROM s"""
      },
      // the color JPEG round-trip: per payload byte b the decoded MCU is a
      // flat block with Y=b, Cb-128=b%9-4, Cr-128=b%7-3; RGB re-derived
      // with the decoder's 16-bit fixed-point BT.601 constants, where
      // >>16 on a signed value is floor division by 65536
      "mm_decode_jpeg_color" -> jpegColorOracleSql,
      // progressive 4:4:4 ≡ baseline 4:4:4 on the same MCUs
      "mm_decode_jpeg_prog_color" -> jpegColorOracleSql,
      // segment-parallel progressive ≡ sequential progressive ≡ baseline:
      // the same pixel oracle across all three proves the distributed
      // scan-sequence replay exactly
      "mm_decode_jpeg_prog_parallel" -> jpegColorOracleSql,
      // the 4:2:0 round-trip: bytes in groups of four — quadrant k of
      // group j is a flat 8×8 with Y = bv[4j+k], chroma shared from the
      // group's FIRST byte; restarts don't change decoded values (DC
      // prediction resets, but the fixture codes absolute DCs per block)
      "mm_decode_jpeg420" -> jpeg420OracleSql,
      // progressive color ≡ baseline color on the same MCUs — shared
      // oracles pin the eight-scan decode for both samplings
      "mm_decode_jpeg_prog420" -> jpeg420OracleSql,
      // 4:2:2: the horizontal shared-chroma twin, baseline + progressive
      "mm_decode_jpeg422" -> jpeg422OracleSql,
      "mm_decode_jpeg411" -> jpeg411OracleSql,
      "mm_decode_oriented" -> jpegOrientedOracleSql,
      "mm_decode_jpeg_prog422" -> jpeg422OracleSql,
      // the segment-parallel decode is value-identical to the sequential
      // one BY CONTRACT — same oracle, so the gate proves the equivalence
      "mm_decode_jpeg_parallel" -> jpeg420OracleSql,
      // ... and so is the streaming drain (micro-batched decode to a sink)
      "mm_decode_stream" -> jpeg420OracleSql,

      // the real-pixel 2× resize: logical pixel (r, c) of the output reads
      // original (2r, 2c); original logical row R is stored bottom-up at
      // h-1-R, so the sampled payload offset is (h-1-2r)*15 + 6c
      "mm_resize_bmp" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by,
                octet_length(encode(text)) AS nb FROM documents),
            s AS (SELECT doc_id, by, (nb - nb % 15) // 15 AS h FROM b),
            g AS (SELECT doc_id, by, h,
                CASE WHEN h > 0 THEN (h + 1) // 2 ELSE 0 END AS oh FROM s),
            o AS (SELECT doc_id, by, h, oh,
                flatten(list_transform(range(oh), r ->
                  list_transform(range(3), c -> (h - 1 - 2*r) * 15 + 6*c)))
                  AS offs FROM g)
            SELECT doc_id,
              CASE WHEN h > 0 THEN 3 ELSE 0 END::INTEGER AS out_w,
              CAST(oh AS INTEGER) AS out_h,
              CAST(len(offs) AS BIGINT) AS n_px,
              CAST(coalesce(list_sum(list_transform(offs, x -> ${bv("x+1")})), 0)
                AS BIGINT) AS sum_b,
              CAST(coalesce(list_sum(list_transform(offs, x -> ${bv("x+2")})), 0)
                AS BIGINT) AS sum_g,
              CAST(coalesce(list_sum(list_transform(offs, x -> ${bv("x+3")})), 0)
                AS BIGINT) AS sum_r,
              CASE WHEN oh > 0 THEN
                by[((h-1-2*(oh-1))*15 + 13)::INT] || by[((h-1-2*(oh-1))*15 + 14)::INT]
                  || by[((h-1-2*(oh-1))*15 + 15)::INT]
              ELSE '' END AS last_px_hex
            FROM o"""
      },
      // the MP4 box walk re-derived: every container field is an exact
      // function of the doc (brand/timescale/track structure static by
      // construction; duration and dims from n_chars; mdat stats from
      // the payload's hex bytes — the Spark side must PARSE the built
      // container to reproduce them)
      "mm_decode_mp4" ->
        raw"""WITH b AS (SELECT doc_id, n_chars,
                regexp_extract_all(hex(encode(text)), '..') AS by FROM documents),
            m AS (SELECT doc_id, n_chars,
                list_transform(by, x ->
                  (strpos('0123456789ABCDEF', substr(x, 1, 1)) - 1) * 16
                    + strpos('0123456789ABCDEF', substr(x, 2, 1)) - 1) AS bv
              FROM b)
            SELECT doc_id, 'isom' AS brand, 4::BIGINT AS n_boxes,
              1000::BIGINT AS timescale,
              (n_chars * 40)::BIGINT AS duration,
              2::BIGINT AS n_tracks,
              (16 + n_chars % 640)::BIGINT AS width,
              (16 + n_chars % 480)::BIGINT AS height,
              len(bv)::BIGINT AS mdat_bytes,
              coalesce(list_aggregate(bv, 'sum'), 0)::BIGINT AS mdat_sum,
              coalesce(list_aggregate(bv, 'max'), 0)::BIGINT AS mdat_max
            FROM m""",
      // the demux replay: n = len // 200 declared frames at 40 ms each;
      // sampled = frames 0, 2, 4, … — byte positions re-derived from the
      // SAME frame plan the builder wrote into stsz/stco
      "mm_demux_mp4" ->
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by FROM documents),
            s AS (SELECT doc_id, by, len(by) // 200 AS n FROM b),
            p AS (SELECT doc_id, by, n, (n + 1) // 2 AS ns,
                flatten(list_transform(range((n + 1) // 2), k ->
                  list_transform(range(200), j -> 2 * k * 200 + j))) AS offs
              FROM s),
            v AS (SELECT doc_id, n, ns,
                list_transform(offs, x ->
                  (strpos('0123456789ABCDEF', substr(by[(x + 1)::INT], 1, 1)) - 1) * 16
                    + strpos('0123456789ABCDEF', substr(by[(x + 1)::INT], 2, 1)) - 1)
                  AS bv
              FROM p)
            SELECT doc_id, n::BIGINT AS n_frames, 40::BIGINT AS frame_ms,
              ns::BIGINT AS n_sampled, (ns * 200)::BIGINT AS sampled_bytes,
              coalesce(list_aggregate(bv, 'sum'), 0)::BIGINT AS sampled_sum,
              coalesce(list_aggregate(bv, 'max'), 0)::BIGINT AS sampled_max
            FROM v""",
      // the video round-trip: frame k of a doc is payload slice
      // [64k, 64(k+1)) — one flat 8×8 block per byte (the mm_decode_jpeg
      // fixture), so every frame is 8×512 with sum = 64·Σbytes; pts from
      // the container's single stts run (40 ms)
      "mm_decode_video" ->
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(substr(hex(encode(text)), 1, 4096), '..') AS by
                FROM documents),
            s AS (SELECT doc_id, by[1:(len(by) - len(by) % 64)::INT] AS by
              FROM b WHERE len(by) >= 64),
            f AS (SELECT doc_id, by, unnest(range(len(by) // 64)) AS k FROM s),
            v AS (SELECT doc_id, k, by[(64*k+1)::INT] AS tl,
                list_transform(list_slice(by, (64*k+1)::INT, (64*k+64)::INT),
                  h -> (strpos('0123456789ABCDEF', substr(h, 1, 1)) - 1) * 16
                    + strpos('0123456789ABCDEF', substr(h, 2, 1)) - 1) AS bv
              FROM f)
            SELECT doc_id, k::INTEGER AS frame_idx, (k * 40)::BIGINT AS pts_ms,
              8::INTEGER AS width, 512::INTEGER AS height,
              4096::BIGINT AS n_px, (64 * list_sum(bv))::BIGINT AS sum_px,
              list_aggregate(bv, 'max')::INTEGER AS max_px, tl AS topleft_hex
            FROM v""",
      "mm_frames" ->
        """SELECT doc_id,
           (GREATEST(CAST(ceil(octet_length(encode(text))::DOUBLE / 256) AS BIGINT), 1) + 1) // 2
             AS n_frames,
           substring(hex(encode(text)), 1, 512) AS first_frame_hex
           FROM documents""",
      "mm_resize" ->
        """WITH b AS (SELECT doc_id,
             list_filter(regexp_extract_all(hex(encode(text)), '..'),
                         (x, i) -> (i - 1) % 4 = 0) AS kept
           FROM documents)
           SELECT doc_id, CAST(len(kept) AS BIGINT) AS resized_bytes,
             substring(coalesce(array_to_string(kept, ''), ''), 1, 128)
               AS resized_hex_prefix
           FROM b""",
      // AudioEnergy/AudioZeroCrossings kernels re-derived from the blob's
      // hex: 16-bit LE samples (lo + 256*hi, signed at 32768), per-256-
      // sample windows; CAST list_sum results (HUGEINT) back to BIGINT
      "mm_audio_energy" -> {
        def bv(idx: String) =
          s"((strpos('0123456789ABCDEF', substr(by[($idx)::INT], 1, 1)) - 1) * 16" +
            s" + strpos('0123456789ABCDEF', substr(by[($idx)::INT], 2, 1)) - 1)"
        raw"""WITH b AS (SELECT doc_id,
                regexp_extract_all(hex(encode(text)), '..') AS by FROM documents),
            s AS (SELECT doc_id, by, len(by) // 2 AS ns FROM b),
            r AS (SELECT doc_id, ns, list_transform(range(ns), i ->
                ${bv("2*i+1")} + 256 * ${bv("2*i+2")}) AS us FROM s),
            v AS (SELECT doc_id, ns, (ns + 255) // 256 AS nw,
                list_transform(us, x ->
                  CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS vs
                FROM r),
            e AS (SELECT doc_id, ns, nw, vs, list_transform(range(nw), w ->
                list_sum(list_transform(
                  vs[(w*256+1)::INT:least((w+1)*256, ns)::INT],
                  x -> x * x))) AS es FROM v)
            SELECT doc_id, CAST(nw AS BIGINT) AS n_windows,
              CAST(es[1] AS BIGINT) AS energy_first,
              CAST(list_aggregate(es, 'max') AS BIGINT) AS energy_max,
              CAST(coalesce(list_sum(list_transform(range(1, ns), i ->
                CASE WHEN (vs[(i+1)::INT] < 0) <> (vs[i::INT] < 0)
                  THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zc_total
            FROM e"""
      },
      // exact corpus × benchmark all-pairs Jaccard — the LSH candidates
      // plus exact verify must reproduce it (same 3-shingle substrate as
      // dedup_minhash)
      "decon_fuzzy" ->
        s"""WITH sh AS (SELECT doc_id, $shingles AS s FROM documents),
            b AS (SELECT doc_id AS bench_id, s AS bs FROM sh
                  WHERE doc_id % 97 = 0)
            SELECT sh.doc_id, b.bench_id,
              round(len(list_intersect(sh.s, b.bs))::DOUBLE
                / len(list_distinct(list_concat(sh.s, b.bs))), 6) AS jaccard
            FROM sh CROSS JOIN b
            WHERE len(list_intersect(sh.s, b.bs))::DOUBLE
              / len(list_distinct(list_concat(sh.s, b.bs))) >= 0.8""",
      "decon_overlap" -> {
        // word 5-gram shingles, distinct per doc — mirrors
        // DocDedup.shingles(n=5) ∘ array_distinct
        val sh5 =
          raw"""list_distinct(CASE WHEN len($toks) < 5
                THEN [array_to_string($toks, ' ')]
                ELSE list_transform(range(len($toks) - 4),
                  i -> $toks[i+1] || ' ' || $toks[i+2] || ' ' || $toks[i+3]
                       || ' ' || $toks[i+4] || ' ' || $toks[i+5]) END)"""
        s"""WITH sh AS (SELECT doc_id, unnest($sh5) AS sh FROM documents),
              b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
            SELECT sh.doc_id, count(*) AS n_hits
            FROM sh JOIN b USING (sh) GROUP BY sh.doc_id"""
      },
      "text_pii_scrub" ->
        raw"""WITH p AS (SELECT doc_id,
                text || ' contact u' || doc_id::VARCHAR || '@mail.example.org or 555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  || ' from 10.1.' || (doc_id % 256)::VARCHAR || '.9' AS t0
              FROM documents),
            s1 AS (SELECT doc_id,
                len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
                regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
              FROM p),
            s2 AS (SELECT doc_id, c1,
                len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
                regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
              FROM s1)
            SELECT doc_id,
              CAST(c1 + c2 + len(regexp_extract_all(t2, '\b\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_pii,
              md5(regexp_replace(t2, '\b\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')) AS scrub_md5
            FROM s2""",
      "sample_stratified" -> {
        // first 32 bits of md5('graft-sample:' || doc_id) as a uniform in
        // [0,1) — exactly Curation.hashUniform
        def nib(k: Int) =
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT doc_id, lang,
                md5('graft-sample:' || doc_id::VARCHAR) AS h FROM documents)
            SELECT doc_id, lang FROM d
            WHERE ($u32) / 4294967296.0 <
              CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3 WHEN 'fr' THEN 0.3
                WHEN 'de' THEN 0.2 WHEN 'zh' THEN 0.2 ELSE 0.0 END"""
      },
      "pack_sequences" ->
        raw"""WITH d AS (SELECT doc_id, lang, CAST(doc_id % 4 AS INTEGER) AS shard,
                CAST(len(regexp_extract_all(lower(trim(text)),
                  '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_tok
              FROM documents)
            SELECT doc_id, lang, shard, n_tok,
              CAST(floor((sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - n_tok) / 2048) AS BIGINT) AS seq_id
            FROM d""",
      "embed_quantize" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              m AS (SELECT vec_id, v, list_aggregate(v, 'min') AS mn,
                    list_aggregate(v, 'max') AS mx FROM e)
           SELECT vec_id, array_to_string(list_transform(v,
               x -> CASE WHEN mx = mn THEN '0'
                 ELSE ((round((x - mn) / (mx - mn) * 255) - 128)::INTEGER)::VARCHAR END),
             ',') AS q_csv
           FROM m""",
      "text_repetition" ->
        raw"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
              s AS (SELECT doc_id, toks, len(toks) AS nw,
                CASE WHEN len(toks) >= 2 THEN list_transform(range(len(toks) - 1),
                  i -> toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS bg,
                CASE WHEN len(toks) >= 3 THEN list_transform(range(len(toks) - 2),
                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) ELSE [] END AS tg
              FROM d)
            SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
              list_max(list_transform(list_distinct(toks),
                w -> len(list_filter(toks, t -> t = w))))::DOUBLE / nw AS top_word_frac,
              CASE WHEN nw >= 2 THEN list_max(list_transform(list_distinct(bg),
                  w -> len(list_filter(bg, t -> t = w))))::DOUBLE / (nw - 1)
                ELSE 0.0 END AS top_bigram_frac,
              CASE WHEN nw >= 3 THEN 1.0 - len(list_distinct(tg))::DOUBLE / (nw - 2)
                ELSE 0.0 END AS dup_trigram_frac,
              (top_word_frac <= 0.12 AND top_bigram_frac <= 0.08
                AND dup_trigram_frac <= 0.05) AS keep
            FROM s""",
      "text_doc_freq" ->
        raw"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
              occ AS (SELECT doc_id, unnest(toks) AS word FROM d),
              df AS (SELECT word, count(DISTINCT doc_id) AS df FROM occ GROUP BY word)
            SELECT occ.doc_id, count(*) AS n_tok,
              CAST(sum(df.df) AS BIGINT) AS sum_df,
              CAST(sum(CASE WHEN df.df <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
            FROM occ JOIN df USING (word) GROUP BY occ.doc_id""",
      // trigram novelty: distinct per-doc trigrams, df over docs, df=1
      // fraction on the nano ladder; <3-word docs report 0/0 → 0.0
      "text_ngram_novelty" ->
        raw"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
              tg AS (SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
                  i -> l[i::INT] || ' ' || l[(i+1)::INT] || ' ' || l[(i+2)::INT]))
                  AS g
                FROM d WHERE len(l) >= 3)),
              df3 AS (SELECT g, count(*) AS df FROM tg GROUP BY 1),
              per AS (SELECT tg.doc_id, count(*)::BIGINT AS n_tri,
                  sum(CASE WHEN df3.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel
                FROM tg JOIN df3 USING (g) GROUP BY 1)
            SELECT d0.doc_id,
              coalesce(per.n_tri, 0)::BIGINT AS n_tri,
              coalesce(per.n_novel, 0)::BIGINT AS n_novel,
              CASE WHEN coalesce(per.n_tri, 0) > 0
                THEN ((per.n_novel * 1000000000) // per.n_tri) / 1000000000.0
                ELSE 0.0 END AS novelty
            FROM documents d0 LEFT JOIN per ON d0.doc_id = per.doc_id""",
      // source-level novelty: the same trigram substrate grouped by source
      "corpus_source_novelty" ->
        raw"""WITH d AS (SELECT source, $toks AS l FROM documents),
              tg AS (SELECT DISTINCT source, g FROM (
                SELECT source, unnest(list_transform(range(1, len(l) - 1),
                  i -> l[i::INT] || ' ' || l[(i+1)::INT] || ' ' || l[(i+2)::INT]))
                  AS g
                FROM d WHERE len(l) >= 3)),
              sc AS (SELECT g, count(*) AS sc FROM tg GROUP BY 1)
            SELECT tg.source, count(*)::BIGINT AS n_tri,
              sum(CASE WHEN sc.sc = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
              ((sum(CASE WHEN sc.sc = 1 THEN 1 ELSE 0 END) * 1000000000)
                // count(*)) / 1000000000.0 AS novelty
            FROM tg JOIN sc USING (g) GROUP BY 1""",
      "text_tfidf_topk" ->
        raw"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents),
              scored AS (
                SELECT doc_id, term, tf, df.df,
                  CAST(round(tf * ln((n + 1.0) / (df.df + 1.0)) * 1000000) AS BIGINT)
                    AS score_micro
                FROM tf JOIN df USING (term) CROSS JOIN n)
            SELECT doc_id, term, tf, df, score_micro, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY score_micro DESC, term) AS rank FROM scored)
            WHERE rank <= 3""",
      "search_bm25" -> bm25Sql,
      "search_bm25_incr" -> bm25Sql,
      "search_bm25_stream" -> bm25Sql,
      // RM3 replay: pass 1 = bm25Sql's contribs → top-10 feedback docs;
      // expansion terms by occurrence count within them (orig terms
      // excluded, ties term asc); integer micro weights; pass 2 sums
      // weight·c_micro over the expanded term set
      "search_rm3" ->
        raw"""WITH q AS (SELECT unnest(['fast','table','scan','join','merge']) AS term),
            d AS (SELECT doc_id, $toks AS toks FROM documents),
            dl AS (SELECT doc_id, len(toks) AS dl FROM d),
            tok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term FROM d),
            tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf
              FROM tok GROUP BY 1, 2),
            df AS MATERIALIZED (SELECT term, count(DISTINCT doc_id) AS df
              FROM tok GROUP BY 1),
            stats AS (SELECT count(*) AS n,
                (sum(dl) * 1000000) // count(*) AS avgdl_micro FROM dl),
            c1 AS (SELECT tf.doc_id,
                CAST(round(
                  ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5)) *
                  (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl /
                    (avgdl_micro / 1000000.0))) * 1000000) AS BIGINT) AS c_micro
              FROM tf JOIN q USING (term) JOIN df USING (term)
                JOIN dl USING (doc_id) CROSS JOIN stats),
            fb AS (SELECT doc_id FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY sum(c_micro) DESC, doc_id) AS r
                FROM c1 GROUP BY doc_id) WHERE r <= 10),
            fbsel AS (SELECT term, tf FROM (
                SELECT t.term, count(*) AS tf,
                  row_number() OVER (ORDER BY count(*) DESC, t.term) AS r
                FROM tok t JOIN fb USING (doc_id)
                WHERE t.term NOT IN (SELECT term FROM q)
                GROUP BY t.term) WHERE r <= 8),
            fbtot AS (SELECT sum(tf) AS tot FROM fbsel),
            w AS (SELECT term, CAST(600000 AS BIGINT) AS w FROM q
              UNION ALL
              SELECT term, CAST((400000 * tf) // tot AS BIGINT) AS w
              FROM fbsel CROSS JOIN fbtot),
            c2 AS (SELECT tf.doc_id, w.w,
                CAST(round(
                  ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5)) *
                  (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl /
                    (avgdl_micro / 1000000.0))) * 1000000) AS BIGINT) AS c_micro
              FROM tf JOIN w USING (term) JOIN df USING (term)
                JOIN dl USING (doc_id) CROSS JOIN stats),
            scored AS (SELECT doc_id AS doc,
                CAST(sum(c_micro * w) AS BIGINT) AS score_wmicro,
                count(*) AS n_terms
              FROM c2 GROUP BY 1)
          SELECT doc, score_wmicro, n_terms, rank FROM (
            SELECT *, row_number() OVER (
              ORDER BY score_wmicro DESC, doc) AS rank
            FROM scored) WHERE rank <= 20""",
      "search_bm25_batch" ->
        raw"""WITH q AS (SELECT * FROM (VALUES
                ('q1','fast'),('q1','table'),('q1','scan'),
                ('q2','join'),('q2','merge'),
                ('q3','window'),('q3','sort'),('q3','stream')) AS t(qid, term)),
              d AS (SELECT doc_id, $toks AS toks FROM documents),
              dl AS (SELECT doc_id, len(toks) AS dl FROM d),
              tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
              stats AS (SELECT count(*) AS n,
                  (sum(dl) * 1000000) // count(*) AS avgdl_micro FROM dl),
              contrib AS (
                SELECT q.qid, tf.doc_id,
                  CAST(round(
                    ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5)) *
                    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl /
                      (avgdl_micro / 1000000.0))) * 1000000) AS BIGINT) AS c_micro
                FROM tf JOIN q USING (term) JOIN df USING (term)
                  JOIN dl USING (doc_id) CROSS JOIN stats),
              scored AS (SELECT qid, doc_id AS doc,
                  CAST(sum(c_micro) AS BIGINT) AS score_micro,
                  count(*) AS n_terms
                FROM contrib GROUP BY 1, 2)
            SELECT qid, doc, score_micro, n_terms, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score_micro DESC, doc) AS rank
              FROM scored)
            WHERE rank <= 10""",
      // Retrieval.hybridRrf: the bm25Sql scoring CTEs with probe-doc
      // distinct tokens as queries (top-21 minus self, re-ranked, top-20),
      // the sim_topk_bruteforce cosine (top-20, self excluded by the
      // join), fused by integer nano-unit reciprocal ranks
      "search_hybrid_rrf" -> (hybridTowersCtes + """,
              fused AS (SELECT qid, doc, count(*) AS n_lists,
                  CAST(sum(CAST(round(1000000000.0 / (60 + r)) AS BIGINT))
                    AS BIGINT) AS rrf_nano
                FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)
                GROUP BY 1, 2)
            SELECT qid, doc, n_lists, rrf_nano, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY qid
                ORDER BY rrf_nano DESC, doc) AS INTEGER) AS rank
              FROM fused)
            WHERE rank <= 10"""),
      // the same towers, ANTI-joined: lexical hits the dense list misses
      "mine_hard_negatives" -> (hybridTowersCtes + """
            SELECT qid, doc, CAST(r AS INTEGER) AS lex_rank
            FROM lex ANTI JOIN den USING (qid, doc)"""),
      // the converse anti-join: dense hits the lexical list misses
      "mine_paraphrase_pairs" -> (hybridTowersCtes + """
            SELECT qid, doc, CAST(r AS INTEGER) AS dense_rank
            FROM den ANTI JOIN lex USING (qid, doc)"""),
      "search_phrase" ->
        raw"""WITH d AS (SELECT doc_id, $toks AS t FROM documents),
              o AS (SELECT doc_id, len(list_filter(range(len(t) - 1),
                    i -> t[i+1] = 'table' AND t[i+2] = 'scan')) AS n_hits FROM d)
            SELECT doc_id AS doc, CAST(n_hits AS BIGINT) AS n_hits, rank FROM (
              SELECT *, row_number() OVER (ORDER BY n_hits DESC, doc_id) AS rank
              FROM o WHERE n_hits > 0)
            WHERE rank <= 20""",
      "corpus_source_overlap" -> {
        val sh5 =
          raw"""list_distinct(CASE WHEN len($toks) < 5
                THEN [array_to_string($toks, ' ')]
                ELSE list_transform(range(len($toks) - 4),
                  i -> $toks[i+1] || ' ' || $toks[i+2] || ' ' || $toks[i+3]
                       || ' ' || $toks[i+4] || ' ' || $toks[i+5]) END)"""
        s"""WITH g0 AS (SELECT source AS slice, unnest($sh5) AS g FROM documents),
              sh AS (SELECT DISTINCT slice, g FROM g0),
              sizes AS (SELECT slice, count(*) AS n_grams FROM sh GROUP BY 1),
              shared AS (SELECT a.slice AS slice_a, b.slice AS slice_b, count(*) AS shared
                FROM sh a JOIN sh b USING (g) WHERE a.slice < b.slice GROUP BY 1, 2)
            SELECT slice_a, slice_b, shared,
              sa.n_grams + sb.n_grams - shared AS union_grams,
              (shared * 1000000) // (sa.n_grams + sb.n_grams - shared) AS jaccard_micro
            FROM shared
              JOIN sizes sa ON sa.slice = slice_a
              JOIN sizes sb ON sb.slice = slice_b"""
      },
      // hashUniform rank order == lexicographic order of the first 8 hex
      // chars of the salted md5 (fixed-length lowercase hex compares like
      // the integer it encodes), ties broken by doc_id — same as Spark's
      // (u, id) ordering
      "cap_per_source" ->
        """SELECT doc_id, source FROM documents
           QUALIFY row_number() OVER (PARTITION BY source
             ORDER BY substr(md5('graft-cap:' || doc_id::VARCHAR), 1, 8),
                      doc_id) <= 15""",
      // winnowing: k=5 shingle md5s, min (hash, pos) struct per w=4 window
      // (leftmost tie via pos), distinct selections — the struct min and
      // string compare agree between engines (lexicographic, ASCII hex)
      "text_winnow" ->
        s"""WITH d AS (SELECT doc_id, $toks AS ts FROM documents),
            sh AS (SELECT doc_id, u.p,
                md5(array_to_string(ts[u.p+1:u.p+5], ' ')) AS h
              FROM d, unnest(list_transform(range(len(ts) - 4), x -> x)) AS u(p)),
            sel AS (SELECT doc_id,
                min(struct_pack(h := h, p := p)) OVER w AS s,
                count(*) OVER w AS c
              FROM sh
              WINDOW w AS (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
            SELECT DISTINCT doc_id, s.p AS pos, s.h AS fp FROM sel WHERE c = 4""",
      "text_heavy_hitters" ->
        s"""WITH tok AS (SELECT unnest($toks) AS term FROM documents)
            SELECT term, count(*) AS cnt FROM tok GROUP BY term
            HAVING count(*) * 100 >= (SELECT count(*) FROM tok)""",
      // winnow selection (same CTEs as text_winnow) → distinct (doc, fp)
      // → pairs sharing a fingerprint
      "dedup_winnow_pairs" ->
        s"""WITH d AS (SELECT doc_id, $toks AS ts FROM documents),
            sh AS (SELECT doc_id, u.p,
                md5(array_to_string(ts[u.p+1:u.p+5], ' ')) AS h
              FROM d, unnest(list_transform(range(len(ts) - 4), x -> x)) AS u(p)),
            sel AS (SELECT doc_id,
                min(struct_pack(h := h, p := p)) OVER w AS s,
                count(*) OVER w AS c
              FROM sh
              WINDOW w AS (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
            fp AS (SELECT DISTINCT doc_id, s.h AS fp FROM sel WHERE c = 4)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2""",
      // SemDeDup resolution: cell-restricted pairs (same assignment CTEs
      // as embed_neardup_cell) → transitive closure → min-id survivor
      "semantic_dedup_filter" ->
        s"""WITH RECURSIVE $ivfAssignCtes,
           p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM asn aa JOIN asn bb
                   ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
                 JOIN e a ON a.vec_id = aa.vec_id
                 JOIN e b ON b.vec_id = bb.vec_id
                 WHERE list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
           ed AS (SELECT id_a AS src, id_b AS dst FROM p
                  UNION SELECT id_b, id_a FROM p),
           walk(id, reach) AS (
             SELECT src, dst FROM ed
             UNION
             SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src),
           lab AS (SELECT id, min(reach) AS m FROM walk GROUP BY id)
           SELECT x.vec_id FROM embeddings x LEFT JOIN lab ON x.vec_id = lab.id
           WHERE lab.id IS NULL OR lab.m >= x.vec_id""",
      "text_oov_rate" ->
        s"""WITH tok AS (SELECT unnest($toks) AS term FROM documents),
            vocab AS (SELECT list(term) AS vl FROM (
              SELECT term FROM tok GROUP BY term
              HAVING count(*) * 1000 >= (SELECT count(*) FROM tok))),
            d AS (SELECT doc_id, $toks AS ts FROM documents)
            SELECT doc_id, len(ts)::BIGINT AS n_tok,
              len(list_filter(ts, t -> NOT list_contains(vl, t)))::BIGINT AS n_oov,
              round(len(list_filter(ts, t -> NOT list_contains(vl, t)))::DOUBLE
                / len(ts), 6) AS oov_frac
            FROM d CROSS JOIN vocab""",
      // rankScale then Morton bit-interleave, reproduced with integer ops
      // (the interleaved bits are disjoint, so sum == bitwise-or)
      "layout_zorder" ->
        """WITH s AS (SELECT doc_id,
             least(255, least(2047, greatest(0, n_chars)) * 256 // 2048) AS a,
             least(255, least(8191, greatest(0, doc_id)) * 256 // 8192) AS b
           FROM documents)
           SELECT doc_id, CAST(list_sum(list_transform(range(8), i ->
             (((a >> i::INT) & 1) << (2 * i::INT))
             + (((b >> i::INT) & 1) << (2 * i::INT + 1)))) AS BIGINT) AS zkey
           FROM s""",
      "text_dup_spans" ->
        s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           sp AS (SELECT doc_id, unnest(list_transform(range(1, len(l) - 18),
                    i -> md5(array_to_string(l[i::INT:(i+19)::INT], ' ')))) AS h
                  FROM d WHERE len(l) >= 20),
           f AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1)
           SELECT doc_id, count(*) AS n_spans,
             CAST(sum(CASE WHEN h IN (SELECT h FROM f) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup,
             round(sum(CASE WHEN h IN (SELECT h FROM f) THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS dup_frac
           FROM sp GROUP BY doc_id""",
      "text_cdc_dedup" -> {
        def nib(k: Int) = s"(strpos('0123456789abcdef', substr(wh, $k, 1)) - 1)"
        raw"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           t AS (SELECT doc_id, unnest(l) AS tok,
                   generate_subscripts(l, 1) AS p, l FROM d),
           w AS (SELECT doc_id, tok, p,
                   md5(array_to_string(l[(p-3)::INT:p::INT], ' ')) AS wh FROM t),
           hb AS (SELECT doc_id, tok, p,
                   CASE WHEN p >= 4 AND
                     (${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16
                       + ${nib(4)}) % 8 = 0
                     THEN 1 ELSE 0 END AS b FROM w),
           c AS (SELECT doc_id, tok, p,
                   coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
                 FROM hb),
           ch AS (SELECT doc_id, cid, md5(string_agg(tok, ' ' ORDER BY p)) AS h
                  FROM c GROUP BY doc_id, cid),
           f AS (SELECT h FROM ch GROUP BY h HAVING count(*) > 1)
           SELECT doc_id, count(*) AS n_chunks,
             CAST(sum(CASE WHEN h IN (SELECT h FROM f) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup,
             round(sum(CASE WHEN h IN (SELECT h FROM f) THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS dup_frac
           FROM ch GROUP BY doc_id"""
      },
      "text_span_scrub" ->
        s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           ch AS (SELECT doc_id, unnest(range(((len(l) - 1) // 10) + 1)) AS ci, l
                  FROM d),
           c2 AS (SELECT doc_id, ci,
                    array_to_string(l[(ci*10+1)::INT:(ci*10+10)::INT], ' ') AS chunk
                  FROM ch),
           mk AS (SELECT doc_id, ci, chunk,
                    row_number() OVER (PARTITION BY md5(chunk)
                      ORDER BY doc_id, ci) AS rn
                  FROM c2)
           SELECT doc_id, count(*) AS n_chunks,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
               ORDER BY ci), '') AS text_scrubbed
           FROM mk GROUP BY doc_id""",
      "text_lm_score" ->
        s"""WITH d AS (SELECT doc_id, $toks AS l FROM documents),
           tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                 i -> l[i::INT] || ' ' || l[(i+1)::INT] || ' ' || l[(i+2)::INT])) AS tg
             FROM d WHERE len(l) >= 3),
           c AS (SELECT tg, count(*) AS c FROM tri GROUP BY tg),
           tot AS (SELECT sum(c) AS n, count(*) AS v FROM c)
           SELECT tri.doc_id, count(*) AS n_tri,
             round(-avg(ln((c.c + 1.0) / (tot.n + tot.v))), 6) AS nll
           FROM tri JOIN c USING (tg) CROSS JOIN tot
           GROUP BY tri.doc_id""",
      "text_bpe_merges" -> {
        val ranks = (1 to 8).map(k =>
          s"SELECT $k AS merge_rank, lhs, rhs, cnt FROM t$k")
        s"""WITH $bpeTrainCtes
            ${ranks.mkString("\n UNION ALL ")}"""
      },
      // the encode pass replays the TRAINED merges over every document's
      // words (same training chain), then counts surviving symbols
      "text_bpe_encode" -> {
        val encRound = (k: Int) =>
          s"""e$k AS MATERIALIZED (SELECT e.doc_id AS doc_id,
                replace(e.seq, ' ' || t.lhs || '  ' || t.rhs || ' ',
                  ' ' || t.lhs || t.rhs || ' ') AS seq
                FROM e${k - 1} e CROSS JOIN t$k t)"""
        raw"""WITH $bpeTrainCtes,
            dw AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            e0 AS MATERIALIZED (SELECT doc_id, ' ' || coalesce(
                array_to_string(regexp_extract_all(w, '.'), '  '), '')
                || ' ' AS seq FROM dw),
            ${(1 to 8).map(encRound).mkString(",\n")}
            SELECT doc_id,
              sum(len(string_split(trim(seq), '  ')))::BIGINT AS n_bpe
            FROM e8 GROUP BY doc_id"""
      },
      // compression report: the encode replay joined back for source,
      // chars-per-token on the nano ladder
      "text_bpe_compression" -> {
        val encRound = (k: Int) =>
          s"""e$k AS MATERIALIZED (SELECT e.doc_id AS doc_id,
                replace(e.seq, ' ' || t.lhs || '  ' || t.rhs || ' ',
                  ' ' || t.lhs || t.rhs || ' ') AS seq
                FROM e${k - 1} e CROSS JOIN t$k t)"""
        raw"""WITH $bpeTrainCtes,
            dw AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            e0 AS MATERIALIZED (SELECT doc_id, ' ' || coalesce(
                array_to_string(regexp_extract_all(w, '.'), '  '), '')
                || ' ' AS seq FROM dw),
            ${(1 to 8).map(encRound).mkString(",\n")},
            enc AS (SELECT doc_id,
              sum(len(string_split(trim(seq), '  ')))::BIGINT AS n_bpe
              FROM e8 GROUP BY doc_id)
            SELECT d.source, sum(d.n_chars)::BIGINT AS total_chars,
              sum(enc.n_bpe)::BIGINT AS total_bpe,
              ((sum(d.n_chars)::BIGINT * 1000000000)
                // sum(enc.n_bpe)::BIGINT) / 1000000000.0 AS chars_per_token
            FROM documents d JOIN enc USING (doc_id) GROUP BY 1"""
      },
      // maintained ≡ rebuilt: the incremental path converges the word
      // counts to the full corpus, so it shares the training oracle
      "text_bpe_incr" -> {
        val ranks = (1 to 8).map(k =>
          s"SELECT $k AS merge_rank, lhs, rhs, cnt FROM t$k")
        s"""WITH $bpeTrainCtes
            ${ranks.mkString("\n UNION ALL ")}"""
      },
      // stream-maintained ≡ rebuilt, same as the incr path
      "text_bpe_stream" -> {
        val ranks = (1 to 8).map(k =>
          s"SELECT $k AS merge_rank, lhs, rhs, cnt FROM t$k")
        s"""WITH $bpeTrainCtes
            ${ranks.mkString("\n UNION ALL ")}"""
      },
      // unigram inventory: singles + top-64 multis ranked (cnt DESC, piece)
      "text_unigram_vocab" ->
        s"""WITH $uniTrainCtes
            SELECT rank, piece, cnt FROM uvoc""",
      // maintained ≡ rebuilt: signed-delta word counts converge to the
      // full corpus, so the incremental path shares the training oracle
      "text_unigram_incr" ->
        s"""WITH $uniTrainCtes
            SELECT rank, piece, cnt FROM uvoc""",
      // stream-maintained ≡ rebuilt, same as the incr path
      "text_unigram_stream" ->
        s"""WITH $uniTrainCtes
            SELECT rank, piece, cnt FROM uvoc""",
      // per-doc Viterbi encode: every word occurrence joins its DISTINCT-
      // word minimum cost; cost // CostBase = piece count, % = rank sum
      "text_unigram_encode" ->
        s"""WITH $uniEncodeCtes,
            ud AS (SELECT doc_id, unnest($toks) AS w FROM documents)
            SELECT ud.doc_id,
              sum(uwe.cost // 1000000000)::BIGINT AS n_tokens,
              sum(uwe.cost % 1000000000)::BIGINT AS rank_sum
            FROM ud JOIN uwe ON ud.w = uwe.w GROUP BY 1""",
      // the three families' replays composed in one query (BPE merge
      // rounds, the Viterbi DP, the greedy walk — each already verified
      // standalone), folded to corpus fertilities
      "text_tokenizer_bakeoff" -> {
        val encRound = (k: Int) =>
          s"""e$k AS MATERIALIZED (SELECT e.doc_id AS doc_id,
                replace(e.seq, ' ' || t.lhs || '  ' || t.rhs || ' ',
                  ' ' || t.lhs || t.rhs || ' ') AS seq
                FROM e${k - 1} e CROSS JOIN t$k t)"""
        val greedyRound = (t: Int) =>
          s"""ug$t AS MATERIALIZED (
                SELECT w, pos, np FROM ug${t - 1} WHERE pos >= len(w)
                UNION ALL
                SELECT b.w, b.pos + max(len(v.piece)) AS pos,
                  b.np + 1 AS np
                FROM ug${t - 1} b JOIN uvoc v
                  ON b.pos + len(v.piece) <= len(b.w)
                 AND substr(b.w, (b.pos + 1)::INT, len(v.piece)::INT) = v.piece
                WHERE b.pos < len(b.w)
                GROUP BY b.w, b.pos, b.np)"""
        raw"""WITH $bpeTrainCtes,
            dw AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            e0 AS MATERIALIZED (SELECT doc_id, ' ' || coalesce(
                array_to_string(regexp_extract_all(w, '.'), '  '), '')
                || ' ' AS seq FROM dw),
            ${(1 to 8).map(encRound).mkString(",\n")},
            bpetot AS (SELECT 'bpe' AS family,
                sum(len(string_split(trim(seq), '  ')))::BIGINT
                  AS total_tokens FROM e8),
            $uniEncodeCtes,
            ud AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            unitot AS (SELECT 'unigram' AS family,
                sum(uwe.cost // 1000000000)::BIGINT AS total_tokens
                FROM ud JOIN uwe ON ud.w = uwe.w),
            ug0 AS (SELECT w, 0 AS pos, 0::BIGINT AS np
              FROM (SELECT DISTINCT w FROM utk)),
            ${(1 to 8).map(greedyRound).mkString(",\n")},
            uge AS (
              SELECT dw.w AS w,
                CASE WHEN g.np IS NULL THEN error('greedy WordPiece replay: '
                  || 'word "' || dw.w || '" did not terminate in 8 rounds')
                ELSE g.np END AS np
              FROM (SELECT DISTINCT w FROM utk) dw
              LEFT JOIN (SELECT w, np FROM ug8 WHERE pos >= len(w)) g
                ON g.w = dw.w),
            wptot AS (SELECT 'wordpiece' AS family,
                sum(uge.np)::BIGINT AS total_tokens
                FROM ud JOIN uge ON ud.w = uge.w),
            ch AS (SELECT sum(n_chars)::BIGINT AS total_chars FROM documents),
            u AS (SELECT * FROM bpetot UNION ALL SELECT * FROM unitot
                  UNION ALL SELECT * FROM wptot)
            SELECT family, total_chars, total_tokens,
              ((total_chars * 1000000000) // total_tokens) / 1000000000.0
                AS chars_per_token
            FROM u CROSS JOIN ch"""
      },
      // greedy longest-match replay: terminal (pos = len) rows pass
      // through each round, active rows advance by the MAX matching
      // piece length — 8 rounds cover the oracle-scale word lengths
      "text_wordpiece_encode" -> {
        val greedyRound = (t: Int) =>
          s"""ug$t AS MATERIALIZED (
                SELECT w, pos, np FROM ug${t - 1} WHERE pos >= len(w)
                UNION ALL
                SELECT b.w, b.pos + max(len(v.piece)) AS pos,
                  b.np + 1 AS np
                FROM ug${t - 1} b JOIN uvoc v
                  ON b.pos + len(v.piece) <= len(b.w)
                 AND substr(b.w, (b.pos + 1)::INT, len(v.piece)::INT) = v.piece
                WHERE b.pos < len(b.w)
                GROUP BY b.w, b.pos, b.np)"""
        s"""WITH $uniTrainCtes,
            ug0 AS (SELECT w, 0 AS pos, 0::BIGINT AS np
              FROM (SELECT DISTINCT w FROM utk)),
            ${(1 to 8).map(greedyRound).mkString(",\n")},
            uge AS (
              -- terminal rows only, with loud non-termination: an active
              -- (pos < len) row surviving round 8 would otherwise join a
              -- PARTIAL piece count and silently under-count
              SELECT dw.w AS w,
                CASE WHEN g.np IS NULL THEN error('greedy WordPiece replay: '
                  || 'word "' || dw.w || '" did not terminate in 8 rounds')
                ELSE g.np END AS np
              FROM (SELECT DISTINCT w FROM utk) dw
              LEFT JOIN (SELECT w, np FROM ug8 WHERE pos >= len(w)) g
                ON g.w = dw.w),
            ud AS (SELECT doc_id, unnest($toks) AS w FROM documents)
            SELECT ud.doc_id, sum(uge.np)::BIGINT AS n_tokens
            FROM ud JOIN uge ON ud.w = uge.w GROUP BY 1"""
      },
      // the full per-doc rank sequence, pinned via md5 + a 12-id head
      "text_greedy_ids" ->
        s"""WITH $greedyIdsCtes
            SELECT doc_id, len(ids)::BIGINT AS n_ids,
              md5(array_to_string(ids, ',')) AS ids_md5,
              array_to_string(ids[1:12], ',') AS ids_head
            FROM docids""",
      // sharded sequential packing replay: shard = doc_id % 8, per-shard
      // running token offset (docs in id order, each + one EOS = 0),
      // global position // 256 = the sequence, md5 over the in-sequence
      // id order — exactly the mapPartitions packer's output
      "pack_token_ids" ->
        s"""WITH $greedyIdsCtes,
            wd AS (SELECT doc_id, doc_id % 8 AS shard,
                list_append(ids, 0) AS ids FROM docids),
            offs AS (SELECT doc_id, shard, ids,
                sum(len(ids)) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - len(ids) AS off FROM wd),
            tp AS (SELECT shard, off + t.ord - 1 AS gpos, t.id AS id
              FROM (SELECT shard, off, unnest(list_transform(
                  range(1, len(ids) + 1),
                  i -> {'ord': i, 'id': ids[i::INT]})) AS t FROM offs) x),
            seqs AS (SELECT shard, gpos // 256 AS seq_idx,
                gpos % 256 AS inpos, id FROM tp)
            SELECT shard::BIGINT AS shard, seq_idx::BIGINT AS seq_idx,
              count(*)::BIGINT AS n_ids,
              md5(string_agg(id::VARCHAR, ',' ORDER BY inpos)) AS ids_md5
            FROM seqs GROUP BY 1, 2""",
      // fertility report: the encode replay joined back for source,
      // chars-per-token on the nano ladder
      "text_unigram_compression" ->
        s"""WITH $uniEncodeCtes,
            ud AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            enc AS (SELECT ud.doc_id,
                sum(uwe.cost // 1000000000)::BIGINT AS n_tokens
              FROM ud JOIN uwe ON ud.w = uwe.w GROUP BY 1)
            SELECT d.source, sum(d.n_chars)::BIGINT AS total_chars,
              sum(enc.n_tokens)::BIGINT AS total_tokens,
              ((sum(d.n_chars)::BIGINT * 1000000000)
                // sum(enc.n_tokens)::BIGINT) / 1000000000.0 AS chars_per_token
            FROM documents d JOIN enc USING (doc_id) GROUP BY 1""",
      "corpus_grouping_sets" ->
        """SELECT coalesce(source, 'ALL') AS source,
             coalesce(lang, 'ALL') AS lang,
             GROUPING(source, lang)::BIGINT AS gid,
             count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
           FROM documents
           GROUP BY GROUPING SETS ((source, lang), (source), (lang))""",
      // per-doc NLL under the smoothed trigram model: the shared nano
      // ladder joined back onto each document's trigram stream (total
      // join — the corpus self-scores); per-trigram ln quantizes to
      // integer nano before the per-doc sum (merge-order-free)
      "text_kn_score" ->
        s"""WITH $knTriCtes,
            sc AS (SELECT tgf.doc_id, count(*)::BIGINT AS n_tri,
              sum(CAST(round(ln(m.p3_nano / 1000000000.0) * 1000000000.0)
                AS BIGINT)) AS nano
              FROM tgf JOIN m USING (w1, w2, w3)
              GROUP BY tgf.doc_id)
            SELECT doc_id, n_tri,
              round(-(nano / (n_tri * 1000000000.0)), 6) AS kn_nll
            FROM sc""",
      "text_kn_trigram" ->
        s"""WITH $knTriCtes
            SELECT w1, w2, w3, cnt, p3_nano / 1000000000.0 AS p_kn
            FROM m ORDER BY cnt DESC, w1, w2, w3 LIMIT 100""",
      "text_kn_bigram" ->
        s"""WITH $knLadderCtes
            SELECT w1, w2, cnt, pb_nano / 1000000000.0 AS p_kn
            FROM pb ORDER BY cnt DESC, w1, w2 LIMIT 100""",
      // stream-maintained ≡ rebuilt: drained counts equal the direct
      // build, so the estimation shares text_kn_bigram's oracle
      "text_kn_stream" ->
        s"""WITH $knLadderCtes
            SELECT w1, w2, cnt, pb_nano / 1000000000.0 AS p_kn
            FROM pb ORDER BY cnt DESC, w1, w2 LIMIT 100""",
      "dq_documents" ->
        """SELECT 'row_count' AS "constraint", count(*)::DOUBLE AS metric,
             (count(*) > 0)::BIGINT AS pass FROM documents
           UNION ALL SELECT 'doc_id_nulls',
             coalesce(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0)::DOUBLE,
             (coalesce(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0) = 0)::BIGINT
             FROM documents
           UNION ALL SELECT 'doc_id_dups',
             (count(*) - count(DISTINCT doc_id))::DOUBLE,
             (count(*) - count(DISTINCT doc_id) = 0)::BIGINT FROM documents
           UNION ALL SELECT 'text_empty',
             coalesce(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END), 0)::DOUBLE,
             (coalesce(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END), 0) = 0)::BIGINT
             FROM documents
           UNION ALL SELECT 'n_chars_mismatch',
             coalesce(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END), 0)::DOUBLE,
             (coalesce(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END), 0) = 0)::BIGINT
             FROM documents
           UNION ALL SELECT 'lang_invalid',
             coalesce(sum(CASE WHEN NOT lang IN ('en','zh','fr','es','de') THEN 1 ELSE 0 END), 0)::DOUBLE,
             (coalesce(sum(CASE WHEN NOT lang IN ('en','zh','fr','es','de') THEN 1 ELSE 0 END), 0) = 0)::BIGINT
             FROM documents
           UNION ALL SELECT 'n_chars_negative',
             coalesce(sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END), 0)::DOUBLE,
             (coalesce(sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END), 0) = 0)::BIGINT
             FROM documents""",
      "dq_k_anonymity" ->
        """WITH g AS (SELECT c_nationkey, c_mktsegment,
              CAST(sign(c_acctbal) AS INTEGER) AS bal_sign,
              count(*) AS n
            FROM customer GROUP BY 1, 2, 3)
           SELECT CAST(10 AS INTEGER) AS k,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(coalesce(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_violating_groups,
             CAST(coalesce(sum(CASE WHEN n < 10 THEN n ELSE 0 END), 0)
               AS BIGINT) AS rows_at_risk,
             CAST(min(n) AS BIGINT) AS min_group_size
           FROM g""",
      "dq_referential" -> {
        val edge = (name: String, c: String, ck: String, p: String, pk: String) =>
          s"""SELECT '$name' AS relation, c::DOUBLE AS orphans,
               (c = 0)::BIGINT AS pass FROM (SELECT count(*) AS c FROM $c ch
               WHERE NOT EXISTS (SELECT 1 FROM $p pa
                 WHERE pa.$pk = ch.$ck))"""
        Seq(
          edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
          edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
          edge("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          edge("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))
          .mkString("\nUNION ALL ")
      },
      "corpus_heaps" ->
        raw"""WITH tok AS (SELECT doc_id, unnest($toks) AS w FROM documents),
            mx AS (SELECT max(doc_id) AS m FROM documents)
            SELECT r.k::BIGINT AS decile,
              count(DISTINCT t.w)::BIGINT AS n_types,
              count(*)::BIGINT AS n_tokens
            FROM tok t CROSS JOIN mx CROSS JOIN range(1, 11) r(k)
            WHERE t.doc_id <= (mx.m * r.k) // 10
            GROUP BY 1""",
      // Good–Turing: r* on the nano ladder; NULL on the tail where no
      // N_{r+1} exists (both engines propagate null through the chain)
      "text_count_of_counts" ->
        raw"""WITH tk AS (SELECT unnest($toks) AS w FROM documents),
            wc AS (SELECT w, count(*)::BIGINT AS r FROM tk GROUP BY 1),
            byr AS (SELECT r, count(*)::BIGINT AS n_types FROM wc GROUP BY 1)
            SELECT a.r, a.n_types,
              (((a.r + 1) * b.n_types * 1000000000) // a.n_types)
                / 1000000000.0 AS r_star
            FROM byr a LEFT JOIN byr b ON b.r = a.r + 1""",
      // Curation.weightedSample: E-S key ln(u)/w in nano units, u from the
      // graft-wsample md5 draw clamped at 1e-12, top-100 (ties id asc)
      "sample_weighted" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT doc_id, n_chars,
              md5('graft-wsample:' || doc_id::VARCHAR) AS h FROM documents),
            u AS (SELECT doc_id, n_chars,
              greatest(($u32) / 4294967296.0, 1e-12) AS u FROM d)
            SELECT doc_id, n_chars AS w,
              CAST(round(ln(u) / CAST(n_chars AS DOUBLE) * 1000000000.0)
                AS BIGINT) AS key_nano
            FROM u ORDER BY key_nano DESC, doc_id LIMIT 100"""
      },
      "split_assign" -> {
        // same md5-uniform reconstruction as sample_stratified, salt
        // 'graft-split'. Thresholds: Spark's cumulative sum gives
        // 0.9500000000000001 vs the literal 0.95 here — no 32-bit draw
        // k/2^32 lands between them (spacing 2.3e-10 >> the 1e-16 gap;
        // nearest draw above 0.95 is 0.95000000019), so the CASE agrees
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT source, n_chars,
              md5('graft-split:' || doc_id::VARCHAR) AS h FROM documents),
            u AS (SELECT source, n_chars, ($u32) / 4294967296.0 AS u FROM d)
            SELECT CASE WHEN u < 0.9 THEN 'train'
                        WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split,
              source, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM u GROUP BY 1, 2"""
      },
      "corpus_profile" ->
        raw"""SELECT source, count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(regexp_extract_all(lower(trim(text)),
             '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))) AS BIGINT) AS total_tok,
           quantile_cont(n_chars, 0.5) AS med_chars
           FROM documents GROUP BY source""",
      "mix_budget" -> {
        // first 32 bits of md5('graft-mix:' || doc_id) as a uniform in
        // [0,1) — exactly Curation.hashUniform with the graft-mix salt
        def nib(k: Int) =
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH d AS (SELECT doc_id, source,
                CAST(len(regexp_extract_all(lower(trim(text)),
                  '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_tok,
                md5('graft-mix:' || doc_id::VARCHAR) AS h
              FROM documents),
            u AS (SELECT doc_id, source, n_tok, ($u32) / 4294967296.0 AS u FROM d),
            c AS (SELECT doc_id, source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY u, doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum_tok
              FROM u)
            SELECT doc_id, source, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
            FROM c WHERE cum_tok - n_tok <
              CASE source WHEN 'src0' THEN 10000000 WHEN 'src1' THEN 0 ELSE 800 END"""
      },
      "sketch_histogram" ->
        raw"""WITH d AS (SELECT source,
              CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_tok
              FROM documents)
            SELECT source, CAST(least(n_tok // 16, 63) AS INTEGER) AS bin,
              count(*) AS cnt
            FROM d GROUP BY 1, 2""",
      "events_rate_outliers" ->
        """WITH h AS (SELECT user_id, epoch_ns(ts) // 3600000000000 AS hour_idx,
                count(*) AS cnt
              FROM events GROUP BY 1, 2),
            m AS (SELECT user_id, round(quantile_cont(cnt, 0.5), 4) AS med
                  FROM h GROUP BY user_id)
            SELECT h.user_id, CAST(hour_idx * 3600 AS BIGINT) AS hour, cnt, med
            FROM h JOIN m USING (user_id) WHERE cnt > med * 2""",
      "mix_temperature" -> {
        def nib(k: Int) =
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH d AS (SELECT doc_id, source,
                CAST(len(regexp_extract_all(lower(trim(text)),
                  '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_tok,
                md5('graft-mix:' || doc_id::VARCHAR) AS h
              FROM documents),
            s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS ns
                  FROM d GROUP BY source),
            w AS (SELECT source, ns,
                    CAST(floor(pow(ns, 0.7)) AS BIGINT) AS w FROM s),
            tot AS (SELECT CAST(sum(ns) AS BIGINT) AS total,
                      CAST(sum(w) AS BIGINT) AS sumw FROM w),
            b AS (SELECT source,
                    CAST(CAST(floor(0.5 * total) AS HUGEINT) * w // sumw
                      AS BIGINT) AS budget
                  FROM w CROSS JOIN tot),
            u AS (SELECT doc_id, source, n_tok, ($u32) / 4294967296.0 AS u FROM d),
            c AS (SELECT doc_id, source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY u, doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum_tok
              FROM u)
            SELECT c.doc_id, c.source, c.n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
            FROM c JOIN b USING (source) WHERE cum_tok - n_tok < budget"""
      },
      // same md5-nibble bucket/sign derivation, same signed counts
      "text_feature_hash" -> {
        val sw = raw"regexp_extract_all(lower(trim(text)), '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')"
        val enc = "((strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16 " +
          "+ strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1) % 16 * 2 " +
          "+ CASE WHEN substr(md5(t), 3, 1) < '8' THEN 1 ELSE 0 END"
        val fs = (0 until 16).map(i =>
          s"len(list_filter(es, x -> x = ${i * 2 + 1}))::BIGINT" +
            s" - len(list_filter(es, x -> x = ${i * 2}))::BIGINT AS f$i")
          .mkString(", ")
        raw"""WITH d AS (SELECT doc_id, $sw AS ts FROM documents),
            e AS (SELECT doc_id, list_transform(ts, t -> $enc) AS es FROM d)
            SELECT doc_id, $fs FROM e"""
      },
      // probe-scored source ranks -> ordinal weights -> exact budget split
      // -> the mix_budget greedy fill (one derivation, both engines)
      "mix_quality_ranked" -> {
        def nib(k: Int) =
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH $probeSolve,
            ps AS (SELECT doc_id,
                CAST(det0 * 1000000000 // det AS BIGINT)
                + CAST(det1 * 1000000000 // det AS BIGINT) * x1
                + CAST(det2 * 1000000000 // det AS BIGINT) * x2 AS pred
              FROM d CROSS JOIN w),
            dd AS (SELECT doc_id, source,
                CAST(len(regexp_extract_all(lower(trim(text)),
                  '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_tok,
                md5('graft-mix:' || doc_id::VARCHAR) AS h
              FROM documents),
            st AS (SELECT source, CAST(sum(pred) AS HUGEINT) AS sp,
                count(*)::BIGINT AS n, CAST(sum(n_tok) AS BIGINT) AS t
              FROM dd JOIN ps USING (doc_id) GROUP BY source),
            rk AS (SELECT source, t,
                row_number() OVER (ORDER BY sp::DOUBLE / n DESC, source) AS r,
                count(*) OVER () AS ns FROM st),
            tot AS (SELECT CAST(sum(t) AS BIGINT) AS total FROM st),
            wgt AS (SELECT source, CAST(ns - r + 1 AS BIGINT) AS wt FROM rk),
            sw AS (SELECT CAST(sum(wt) AS BIGINT) AS sumw FROM wgt),
            bb AS (SELECT source,
                CAST(CAST(floor(0.25 * total) AS HUGEINT) * wt // sumw
                  AS BIGINT) AS budget
              FROM wgt CROSS JOIN tot CROSS JOIN sw),
            uu AS (SELECT doc_id, source, n_tok,
                ($u32) / 4294967296.0 AS u FROM dd),
            cc AS (SELECT doc_id, source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY u, doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum_tok
              FROM uu)
            SELECT cc.doc_id, cc.source, cc.n_tok,
              CAST(cum_tok AS BIGINT) AS cum_tok
            FROM cc JOIN bb USING (source) WHERE cum_tok - n_tok < budget"""
      },
      // the DIRECT global sketch: merged-per-source must equal it exactly
      "sketch_kmv_merge" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH h0 AS (SELECT md5('graft-kmv:' || text) AS h FROM documents),
            d AS (SELECT DISTINCT ($u32) / 4294967296.0 AS u FROM h0),
            r AS (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM d)
            SELECT count(*) AS n_kept,
              round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                ELSE 63.0 / max(u) END, 4) AS est_distinct
            FROM r WHERE rn <= 64"""
      },
      "sketch_distinct_kmv" -> {
        // Sketches.kmvDistinct: k=64 minimum md5-uniform draws over
        // DISTINCT texts per source; estimator (k-1)/u_k, exact below k
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH h0 AS (SELECT source, md5('graft-kmv:' || text) AS h FROM documents),
            d AS (SELECT DISTINCT source, ($u32) / 4294967296.0 AS u FROM h0),
            r AS (SELECT source, u,
                row_number() OVER (PARTITION BY source ORDER BY u) AS rn FROM d)
            SELECT source, count(*) AS n_kept,
              round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                ELSE 63.0 / max(u) END, 4) AS est_distinct
            FROM r WHERE rn <= 64 GROUP BY source"""
      },
      // Sketches.kmvIntersect: theta-style set algebra over the same
      // 64-draw sketches — θ = kth draw (1.0 when exhaustive), pair θ =
      // min, intersection |common u ≤ θ| / θ, union from the re-merged
      // bottom-64; Jaccard divides the UNROUNDED estimates
      "sketch_kmv_intersect" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH h0 AS (SELECT source, md5('graft-kmv:' || text) AS h FROM documents),
            d AS (SELECT DISTINCT source, ($u32) / 4294967296.0 AS u FROM h0),
            r AS (SELECT source, u,
                row_number() OVER (PARTITION BY source ORDER BY u) AS rn FROM d),
            sk AS (SELECT source, u FROM r WHERE rn <= 64),
            st AS (SELECT source, count(*) AS n_kept, max(u) AS uk
                FROM sk GROUP BY source),
            stt AS (SELECT source,
                CASE WHEN n_kept < 64 THEN 1.0 ELSE uk END AS theta FROM st),
            pr AS (SELECT a.source AS src_a, b.source AS src_b,
                LEAST(a.theta, b.theta) AS th
                FROM stt a, stt b WHERE a.source < b.source),
            cm AS (SELECT x.source AS src_a, y.source AS src_b, x.u
                FROM sk x JOIN sk y ON x.u = y.u AND x.source < y.source),
            cj AS (SELECT pr.src_a, pr.src_b, pr.th, count(cm.u) AS n_common
                FROM pr LEFT JOIN cm ON cm.src_a = pr.src_a
                  AND cm.src_b = pr.src_b AND cm.u <= pr.th
                GROUP BY 1, 2, 3),
            un AS (SELECT DISTINCT pr.src_a, pr.src_b, sk.u
                FROM pr JOIN sk ON sk.source = pr.src_a OR sk.source = pr.src_b),
            ur AS (SELECT src_a, src_b, u, row_number()
                OVER (PARTITION BY src_a, src_b ORDER BY u) AS rn FROM un),
            ug AS (SELECT src_a, src_b, count(*) AS n_u, max(u) AS uku
                FROM ur WHERE rn <= 64 GROUP BY 1, 2),
            ue AS (SELECT src_a, src_b,
                CASE WHEN n_u < 64 THEN n_u::DOUBLE ELSE 63.0 / uku END AS eu
                FROM ug),
            nax AS (SELECT pr.src_a, pr.src_b, count(*)::BIGINT AS na
                FROM pr JOIN sk ON sk.source = pr.src_a AND sk.u <= pr.th
                GROUP BY 1, 2),
            nbx AS (SELECT pr.src_a, pr.src_b, count(*)::BIGINT AS nb
                FROM pr JOIN sk ON sk.source = pr.src_b AND sk.u <= pr.th
                GROUP BY 1, 2)
            SELECT cj.src_a, cj.src_b, cj.n_common::BIGINT AS n_common,
              round(CASE WHEN cj.th < 1.0 THEN cj.n_common / cj.th
                ELSE cj.n_common::DOUBLE END, 4) AS est_intersect,
              round(ue.eu, 4) AS est_union,
              round((CASE WHEN cj.th < 1.0 THEN cj.n_common / cj.th
                ELSE cj.n_common::DOUBLE END) / ue.eu, 4) AS est_jaccard,
              round(CASE WHEN cj.th < 1.0
                THEN (coalesce(nax.na, 0) - cj.n_common) / cj.th
                ELSE (coalesce(nax.na, 0) - cj.n_common)::DOUBLE END, 4)
                AS est_only_a,
              round(CASE WHEN cj.th < 1.0
                THEN (coalesce(nbx.nb, 0) - cj.n_common) / cj.th
                ELSE (coalesce(nbx.nb, 0) - cj.n_common)::DOUBLE END, 4)
                AS est_only_b
            FROM cj JOIN ue ON cj.src_a = ue.src_a AND cj.src_b = ue.src_b
            LEFT JOIN nax ON cj.src_a = nax.src_a AND cj.src_b = nax.src_b
            LEFT JOIN nbx ON cj.src_a = nbx.src_a AND cj.src_b = nbx.src_b"""
      },
      // Sketches.bottomKQuantiles: 64 smallest md5-uniform draws per
      // source, quantiles as exact order statistics with pure-integer
      // ceil indices ((n+1)//2, (9n+9)//10 — FP ceil(0.9n) sits on
      // rounding boundaries); DuckDB lists are 1-based like element_at
      "sketch_quantile_bottomk" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d0 AS (SELECT source, n_chars::BIGINT AS v,
                doc_id::VARCHAR AS id,
                md5('graft-quant:' || doc_id::VARCHAR) AS h FROM documents),
            d AS (SELECT source, v, id, ($u32) / 4294967296.0 AS u FROM d0),
            r AS (SELECT source, v,
                row_number() OVER (PARTITION BY source ORDER BY u, id) AS rn
                FROM d),
            g AS (SELECT source, count(*) AS n_sample, list_sort(list(v)) AS vs
                FROM r WHERE rn <= 64 GROUP BY source)
            SELECT source, n_sample,
              vs[((n_sample + 1) // 2)::INT] AS p50,
              vs[((n_sample * 9 + 9) // 10)::INT] AS p90
            FROM g"""
      },
      // the merged sketch must equal the sketch over the whole table:
      // global bottom-64 of the per-source bottom-64s = global bottom-64
      "sketch_quantile_merge" -> {
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d0 AS (SELECT n_chars::BIGINT AS v, doc_id::VARCHAR AS id,
                md5('graft-quant:' || doc_id::VARCHAR) AS h FROM documents),
            d AS (SELECT v, id, ($u32) / 4294967296.0 AS u FROM d0),
            r AS (SELECT v, row_number() OVER (ORDER BY u, id) AS rn FROM d),
            g AS (SELECT count(*) AS n_sample, list_sort(list(v)) AS vs
                FROM r WHERE rn <= 64)
            SELECT n_sample,
              vs[((n_sample + 1) // 2)::INT] AS p50,
              vs[((n_sample * 9 + 9) // 10)::INT] AS p90
            FROM g"""
      },
      // Sketches.hllDistinct / hllMerge: 256 md5 registers, rho from hex
      // nibbles (ltrim counts zero nibbles, a 4-way CASE the bits inside
      // the first non-zero one), integer 2^(33-rho) harmonic sum, linear
      // counting below 2.5m — the merge is register-wise max, which must
      // equal the direct global sketch computed here
      "sketch_distinct_hll" -> hllOracleSql(perSource = true),
      // drained per-hour registers == the direct batch sketch over events
      "events_uniques_stream" -> hllOracleSqlOver(
        "SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour, " +
          "md5('graft-hll:' || user_id::VARCHAR) AS h FROM events " +
          "WHERE user_id IS NOT NULL",
        Some("hour")),
      // maintained-registers == direct-sketch: identical oracle by design
      "sketch_hll_incr" -> hllOracleSql(perSource = true),
      "sketch_hll_merge" -> hllOracleSql(perSource = false),
      // CMS join-size: per-side 4x1024 counters, est = min_r of the row
      // inner product, true size exact from the key join
      "sketch_join_size" -> {
        val nibAt = (src: String, k: String) =>
          s"(strpos('0123456789abcdef', substr($src, $k, 1)) - 1)::BIGINT"
        val colOfH =
          s"(${nibAt("h", "6")} * 256 + ${nibAt("h", "7")} * 16 + " +
            s"${nibAt("h", "8")}) % 1024"
        s"""WITH a0 AS (SELECT o_custkey::VARCHAR AS k FROM orders),
            b0 AS (SELECT c_custkey::VARCHAR AS k FROM customer
                   WHERE c_mktsegment = 'BUILDING'),
            rs AS (SELECT unnest(range(4)) AS r),
            ra AS (SELECT r, $colOfH AS c, count(*) AS ca FROM (
                SELECT r, md5('graft-cms:' || r || ':' || k) AS h
                FROM a0 CROSS JOIN rs) GROUP BY 1, 2),
            rb AS (SELECT r, $colOfH AS c, count(*) AS cb FROM (
                SELECT r, md5('graft-cms:' || r || ':' || k) AS h
                FROM b0 CROSS JOIN rs) GROUP BY 1, 2),
            ip AS (SELECT r, sum(ca * cb) AS ip
              FROM ra JOIN rb USING (r, c) GROUP BY 1)
            SELECT (SELECT count(*) FROM a0 JOIN b0 USING (k)) AS true_size,
                   (SELECT CAST(min(ip) AS BIGINT) FROM ip) AS est_size"""
      },
      // Sketches.cmsSketch/cmsEstimate: 4 salted md5 rows, column = hex
      // nibbles 6-8 mod 1024 (the DSIR bucket identity), estimate = min
      // over rows with absent cells as 0
      "sketch_freq_cms" -> {
        val nibAt = (src: String, k: String) =>
          s"(strpos('0123456789abcdef', substr($src, $k, 1)) - 1)::BIGINT"
        // column from the salted digest aliased `h` in the enclosing select
        val colOfH =
          s"(${nibAt("h", "6")} * 256 + ${nibAt("h", "7")} * 16 + " +
            s"${nibAt("h", "8")}) % 1024"
        raw"""WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)),
                  '\s+')) AS tok FROM documents),
              rs AS (SELECT unnest(range(4)) AS r),
              rc AS (SELECT r, $colOfH AS c FROM (
                  SELECT r, md5('graft-cms:' || r || ':' || tok) AS h
                  FROM t CROSS JOIN rs)),
              cells AS (SELECT r, c, count(*) AS cnt FROM rc GROUP BY 1, 2),
              probes AS (SELECT unnest(['fast','table','scan','join','merge',
                  'the','zzz_unseen']) AS term),
              pc AS (SELECT term, r, $colOfH AS c FROM (
                  SELECT term, r, md5('graft-cms:' || r || ':' || term) AS h
                  FROM probes CROSS JOIN rs)),
              est AS (SELECT term, min(coalesce(cnt, 0)) AS est_cnt
                FROM pc LEFT JOIN cells USING (r, c) GROUP BY 1),
              tru AS (SELECT term, count(*) AS cnt FROM t
                JOIN probes ON tok = term GROUP BY 1)
            SELECT probes.term, coalesce(tru.cnt, 0) AS cnt, est.est_cnt
            FROM probes LEFT JOIN tru USING (term) JOIN est USING (term)"""
      },
      // Curation.tokenDrift: even/odd doc halves, smoothed log rate
      // ratios, integer-micro ranking (ties term asc)
      "text_drift" ->
        raw"""WITH t AS (SELECT doc_id % 2 = 0 AS a,
                unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
              FROM documents),
            c AS (SELECT term,
                sum(CASE WHEN a THEN 1 ELSE 0 END) AS cnt_a,
                sum(CASE WHEN a THEN 0 ELSE 1 END) AS cnt_b
              FROM t GROUP BY 1),
            tot AS (SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb,
                count(*) AS v FROM c),
            r AS (SELECT term, cnt_a, cnt_b,
                CAST(round((ln((cnt_a + 1.0) / (na + v)) -
                  ln((cnt_b + 1.0) / (nb + v))) * 1000000) AS BIGINT)
                  AS lr_micro
              FROM c CROSS JOIN tot)
            SELECT term, CAST(cnt_a AS BIGINT) AS cnt_a,
              CAST(cnt_b AS BIGINT) AS cnt_b, lr_micro
            FROM r ORDER BY abs(lr_micro) DESC, term LIMIT 20""",
      // Curation.tokenEntropy: H = ln(n) − (Σ c·ln c)/n over per-doc
      // token counts
      "text_entropy" ->
        raw"""WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
                  '\s+')) AS w FROM documents),
              c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2)
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
              count(*) AS n_types,
              round(count(*)::DOUBLE / sum(c), 6) AS ttr,
              round(ln(sum(c)::DOUBLE) - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c), 6)
                AS entropy
            FROM c GROUP BY 1""",
      // Curation.chunkTokens: starts 0, 24, 48, … ≤ len−1; window = 32
      // tokens clamped to the end; hash = md5 of the space-joined chunk
      "text_chunking" ->
        raw"""WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)),
                  '\s+') AS toks FROM documents),
              c AS (SELECT doc_id,
                  unnest(range(0, ((len(toks) - 1) // 24) + 1)) AS chunk_idx,
                  toks FROM d),
              o AS (SELECT doc_id, chunk_idx,
                  toks[(chunk_idx * 24 + 1):least(chunk_idx * 24 + 32,
                    len(toks))] AS chunk FROM c)
            SELECT doc_id, chunk_idx, len(chunk)::BIGINT AS n_tok,
              md5(array_to_string(chunk, ' ')) AS chunk_hash FROM o""",
      "text_dsir" -> {
        // Curation.dsirWeights: unigram+bigram features, md5 nibbles 6-8
        // mod 1024 buckets, add-1-smoothed target(en)/raw log ratio summed
        // per doc. CASE WHEN t THEN 0 ELSE 1 (not WHEN NOT t) so a null
        // target flag lands on the raw side exactly like Spark's otherwise
        val nibAt = (src: String, k: String) =>
          s"(strpos('0123456789abcdef', substr($src, $k, 1)) - 1)::BIGINT"
        s"""WITH d AS (SELECT doc_id, (lang = 'en') AS t,
                string_split_regex(trim(lower(text)), '\\s+') AS toks
              FROM documents),
            f AS (
              SELECT doc_id, t, unnest(toks) AS f FROM d
              UNION ALL
              SELECT doc_id, t, unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS f FROM d),
            fh AS (SELECT doc_id, t, md5('graft-dsir:' || f) AS h FROM f),
            fb AS (SELECT doc_id, t,
                (${nibAt("h", "6")} * 256 + ${nibAt("h", "7")} * 16 +
                 ${nibAt("h", "8")}) % 1024 AS b FROM fh),
            c AS (SELECT b,
                sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
              FROM fb GROUP BY 1),
            tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM c),
            r AS (SELECT b, ln((ct + 1.0) / (nt + 1024)) -
                ln((cr + 1.0) / (nr + 1024)) AS lr FROM c CROSS JOIN tot)
            SELECT doc_id, count(*) AS n_feat, round(sum(lr), 6) AS logw
            FROM fb JOIN r USING (b) GROUP BY 1"""
      },
      "decon_bloom" -> {
        // Sketches.contaminationBloom: 2^16-bit bloom, 4 positions per
        // 5-gram = the last 4 nibbles of each 8-hex-char md5 slice (the
        // mod-2^16 identity). list_has_all against the distinct-position
        // list IS bitset membership — false positives reproduce exactly
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val pos = (j: Int) =>
          s"(${nib(j * 8 + 5)} * 4096 + ${nib(j * 8 + 6)} * 256 + " +
            s"${nib(j * 8 + 7)} * 16 + ${nib(j * 8 + 8)})"
        val allPos = (0 until 4).map(pos).mkString("[", ", ", "]")
        val sh5 =
          raw"""list_distinct(CASE WHEN len($toks) < 5
                THEN [array_to_string($toks, ' ')]
                ELSE list_transform(range(len($toks) - 4),
                  i -> $toks[i+1] || ' ' || $toks[i+2] || ' ' || $toks[i+3]
                       || ' ' || $toks[i+4] || ' ' || $toks[i+5]) END)"""
        s"""WITH sh AS (SELECT doc_id, unnest($sh5) AS g FROM documents),
            bh AS (SELECT DISTINCT md5(g) AS h FROM sh WHERE doc_id % 97 = 0),
            bp AS (SELECT DISTINCT p FROM
              (SELECT unnest($allPos) AS p FROM bh)),
            bloom AS (SELECT list(p) AS ps FROM bp),
            ph AS (SELECT doc_id, md5(g) AS h FROM sh)
            SELECT doc_id, count(*) AS n_maybe
            FROM ph CROSS JOIN bloom
            WHERE list_has_all(ps, $allPos)
            GROUP BY doc_id"""
      },
      "shuffle_order" -> {
        // Sketches.globalOrder: the sharded two-pass rank equals the flat
        // global rank because shards are contiguous hash ranges
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT doc_id,
              md5('graft-shuffle:' || doc_id::VARCHAR) AS h FROM documents),
            u AS (SELECT doc_id, ($u32) / 4294967296.0 AS u FROM d)
            SELECT doc_id,
              CAST(row_number() OVER (ORDER BY u, doc_id) - 1 AS BIGINT) AS pos
            FROM u"""
      },
      "export_shards" -> {
        // shard = global md5-uniform rank div 100; digest = md5 over the
        // shard's comma-joined ids in rank order
        val nib = (k: Int) =>
          s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)::BIGINT"
        val u32 = (1 to 8).map(k => s"${nib(k)} * ${1L << (4 * (8 - k))}")
          .mkString(" + ")
        raw"""WITH d AS (SELECT doc_id,
               len(regexp_extract_all(lower(trim(text)),
                 '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))::BIGINT AS n_tok,
               md5('graft-shuffle:' || doc_id::VARCHAR) AS h FROM documents),
             u AS (SELECT doc_id, n_tok, ($u32) / 4294967296.0 AS u FROM d),
             r AS (SELECT doc_id, n_tok,
               row_number() OVER (ORDER BY u, doc_id) - 1 AS pos FROM u)
             SELECT CAST(pos // 100 AS BIGINT) AS shard,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok,
               md5(string_agg(doc_id::VARCHAR, ',' ORDER BY pos)) AS ids_md5
             FROM r GROUP BY 1"""
      },
      // the round-trip digests must equal the same fold over the parquet
      // originals — one oracle body for all three formats
      // WARC round trip: every record field is an exact function of the
      // documents row — a reader that tore a member, skipped a record,
      // or mis-measured Content-Length hash-mismatches
      "fmt_warc_roundtrip" -> WarcRoundtripSql,
      // stream ≡ batch: the manifest drain must reproduce the batch
      // round-trip row for row
      "warc_ingest_stream" -> WarcRoundtripSql,
      "fmt_jsonl_roundtrip" -> FmtDigestSql,
      "fmt_csv_roundtrip" -> FmtDigestSql,
      "fmt_orc_roundtrip" -> FmtDigestSql,
      "layout_partition_prune" ->
        """SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS hour,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
           FROM events WHERE event_type = 'error' GROUP BY 1""",
      "corpus_quantiles" ->
        raw"""WITH d AS (SELECT source,
              CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS n_tok
              FROM documents)
            SELECT source, count(*) AS n_docs,
              round(quantile_cont(n_tok, 0.25), 4) AS p25_tokens,
              round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
              round(quantile_cont(n_tok, 0.9), 4) AS p90_tokens,
              round(quantile_cont(n_tok, 0.99), 4) AS p99_tokens
            FROM d GROUP BY source""",
      "cluster_kmeans" -> {
        // unrolled quantized-Lloyd: assignment → round(mean,6) centroids →
        // assignment, twice. The sc formula, tie rule (larger cell) and
        // 6-decimal quantization mirror Ivf.trainQuantized/assignCells
        // exactly; the rounding is what makes the cross-engine FP match.
        val asn = (ctab: String) =>
          s"""SELECT e.vec_id, CAST(c.cell AS INTEGER) AS cell
              FROM e CROSS JOIN $ctab c
              QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
                CASE WHEN e.vn * c.cn = 0 THEN 0.0
                  ELSE list_reduce(list_transform(range(64),
                    j -> e.v[j+1] * c.cv[j+1]), (a, b) -> a + b)
                    / (e.vn * c.cn) END DESC, c.cell DESC) = 1"""
        val means = (prev: String) =>
          s"""SELECT a.cell, ex.i, round(avg(ex.x), 6) AS m
              FROM (SELECT vec_id, unnest(v) AS x,
                    generate_subscripts(v, 1) AS i FROM e) ex
              JOIN $prev a ON a.vec_id = ex.vec_id GROUP BY 1, 2"""
        val cents = (m: String) =>
          s"""SELECT cell, list(m ORDER BY i) AS cv,
              sqrt(list_reduce(list_transform(list(m ORDER BY i),
                x -> x * x), (a, b) -> a + b)) AS cn
              FROM $m GROUP BY 1"""
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
              sqrt(list_reduce(list_transform(embedding::DOUBLE[],
                x -> x * x), (a, b) -> a + b)) AS vn
              FROM embeddings),
            c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8),
            cA AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                v AS cv, sqrt(list_reduce(list_transform(v, x -> x * x),
                  (a, b) -> a + b)) AS cn FROM c0),
            a0 AS (${asn("cA")}),
            m1 AS (${means("a0")}),
            c1 AS (${cents("m1")}),
            a1 AS (${asn("c1")}),
            m2 AS (${means("a1")}),
            c2 AS (${cents("m2")}),
            a2 AS (${asn("c2")})
            SELECT vec_id, cell FROM a2"""
      },
      "cluster_kmeanspar" -> {
        // full k-means|| replay: seed = min-id vector; two sampling
        // rounds (cost vs the candidate set in integer micro-units, φ an
        // exact integer sum, selection u20·φ < l·c·2^20 in HUGEINT);
        // candidate weights by nearest-candidate counts (ties → larger
        // idx, nearestCell's rule); top-8 by (weight DESC, id ASC) in
        // weight-rank cell order; one quantized Lloyd pass; assignment
        val sim =
          """CASE WHEN e.vn * c.cn = 0 THEN 0.0
             ELSE list_reduce(list_transform(range(64),
               j -> e.v[j+1] * c.cv[j+1]), (a, b) -> a + b)
               / (e.vn * c.cn) END"""
        def withNorm(candTab: String) =
          s"""(SELECT cv, sqrt(list_reduce(list_transform(cv, x -> x * x),
              (a, b) -> a + b)) AS cn
              FROM (SELECT v AS cv FROM $candTab))"""
        def costCte(name: String, candTab: String) =
          s"""$name AS (SELECT e.vec_id, e.v, e.vn,
                CAST(greatest(0, floor((1.0 - max($sim)) * 1000000.0))
                  AS BIGINT) AS cost
              FROM e CROSS JOIN ${withNorm(candTab)} c
              GROUP BY e.vec_id, e.v, e.vn)"""
        def hx(src: String, i: Int) =
          s"(strpos('0123456789abcdef', substr($src, $i, 1)) - 1)"
        def u20(salt: String) = {
          val h = s"md5('$salt:' || vec_id)"
          s"((((${hx(h, 1)} * 16 + ${hx(h, 2)}) * 16 + ${hx(h, 3)}) * 16" +
            s" + ${hx(h, 4)}) * 16 + ${hx(h, 5)})"
        }
        def selCte(name: String, costTab: String, salt: String) =
          s"""$name AS (SELECT vec_id, v FROM $costTab
              CROSS JOIN (SELECT CAST(coalesce(sum(cost), 0) AS BIGINT)
                AS phi FROM $costTab) p
              WHERE ${u20(salt)}::HUGEINT * phi::HUGEINT
                < 16 * cost::HUGEINT * 1048576)"""
        val asn = (ctab: String) =>
          s"""SELECT e.vec_id, CAST(c.cell AS INTEGER) AS cell
              FROM e CROSS JOIN $ctab c
              QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
                $sim DESC, c.cell DESC) = 1"""
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
              sqrt(list_reduce(list_transform(embedding::DOUBLE[],
                x -> x * x), (a, b) -> a + b)) AS vn
              FROM embeddings),
            c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
            ${costCte("k1", "c0")},
            ${selCte("s1", "k1", "kmpar:r1")},
            cand1 AS (SELECT vec_id, v FROM c0
              UNION SELECT vec_id, v FROM s1),
            ${costCte("k2", "cand1")},
            ${selCte("s2", "k2", "kmpar:r2")},
            cand AS (SELECT vec_id, v FROM cand1
              UNION SELECT vec_id, v FROM s2),
            cidx AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
              vec_id, v AS cv,
              sqrt(list_reduce(list_transform(v, x -> x * x),
                (a, b) -> a + b)) AS cn FROM cand),
            near AS (SELECT e.vec_id, c.idx
              FROM e CROSS JOIN (SELECT idx AS cell, idx, cv, cn FROM cidx) c
              QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
                $sim DESC, c.idx DESC) = 1),
            w AS (SELECT idx, count(*) AS w FROM near GROUP BY idx),
            topk AS (SELECT row_number() OVER (
                ORDER BY coalesce(w.w, 0) DESC, c.vec_id ASC) - 1 AS cell,
                c.cv, c.cn
              FROM cidx c LEFT JOIN w USING (idx)
              ORDER BY coalesce(w.w, 0) DESC, c.vec_id ASC LIMIT 8),
            a0 AS (${asn("topk")}),
            m1 AS (SELECT a.cell, ex.i, round(avg(ex.x), 6) AS m
              FROM (SELECT vec_id, unnest(v) AS x,
                    generate_subscripts(v, 1) AS i FROM e) ex
              JOIN a0 a ON a.vec_id = ex.vec_id GROUP BY 1, 2),
            c1 AS (SELECT cell, list(m ORDER BY i) AS cv,
              sqrt(list_reduce(list_transform(list(m ORDER BY i),
                x -> x * x), (a, b) -> a + b)) AS cn
              FROM m1 GROUP BY 1),
            a1 AS (${asn("c1")})
            SELECT vec_id, cell FROM a1"""
      },
      "sample_coreset" ->
        s"""WITH $coresetCtes
            SELECT vec_id, weight_nano FROM cw""",
      "cluster_coreset_kmeans" -> {
        // weighted-kmeans-on-the-coreset replay: the coreset draw (cw),
        // x in integer micro-units, seeds = 8 smallest-id coreset points,
        // two unrolled weighted iterations with HUGEINT ⌊Σw·x / Σw⌋
        // means, then the full-corpus assignment
        val simCp =
          """CASE WHEN cp.vn * c.cn = 0 THEN 0.0
             ELSE list_reduce(list_transform(range(64),
               j -> cp.v[j+1] * c.cv[j+1]), (a, b) -> a + b)
               / (cp.vn * c.cn) END"""
        val simE =
          """CASE WHEN e.vn * c.cn = 0 THEN 0.0
             ELSE list_reduce(list_transform(range(64),
               j -> e.v[j+1] * c.cv[j+1]), (a, b) -> a + b)
               / (e.vn * c.cn) END"""
        def iterCtes(i: Int, prev: String) =
          s"""a$i AS (SELECT cp.vec_id, c.cell FROM cp CROSS JOIN $prev c
                QUALIFY row_number() OVER (PARTITION BY cp.vec_id
                  ORDER BY $simCp DESC, c.cell DESC) = 1),
              m$i AS (SELECT a.cell, js.j,
                  CAST(sum(cp.w::HUGEINT * cp.xm[js.j + 1])
                    // sum(cp.w::HUGEINT) AS BIGINT) AS mm
                FROM a$i a JOIN cp USING (vec_id)
                CROSS JOIN (SELECT unnest(range(64)) AS j) js
                GROUP BY a.cell, js.j),
              c$i AS (SELECT cell, list(mm / 1000000.0 ORDER BY j) AS cv,
                  sqrt(list_reduce(list_transform(
                    list(mm / 1000000.0 ORDER BY j), x -> x * x),
                    (a, b) -> a + b)) AS cn
                FROM m$i GROUP BY cell)"""
        // Gonzalez farthest-point seeding, unrolled: seed 0 = smallest
        // id; each stage adds the point with the LOWEST max-similarity
        // to the chosen set (ties → smallest id)
        val gonzalez = (1 until 8).map { i =>
          s"""sd${i - 1} AS (SELECT s.ord AS cell, cp.v AS cv, cp.vn AS cn
                FROM sid${i - 1} s JOIN cp USING (vec_id)),
              g$i AS (SELECT cp.vec_id, max($simCp) AS ms
                FROM cp CROSS JOIN sd${i - 1} c
                WHERE cp.vec_id NOT IN (SELECT vec_id FROM sid${i - 1})
                GROUP BY cp.vec_id),
              pick$i AS (SELECT vec_id FROM g$i
                QUALIFY row_number() OVER (ORDER BY ms ASC, vec_id ASC) = 1),
              sid$i AS (SELECT ord, vec_id FROM sid${i - 1}
                UNION ALL SELECT $i AS ord, vec_id FROM pick$i)"""
        }.mkString(",\n")
        s"""WITH $coresetCtes,
            cp AS MATERIALIZED (SELECT c.vec_id, c.weight_nano AS w, e.v, e.vn,
                list_transform(e.v, x ->
                  CAST(floor(x * 1000000.0) AS BIGINT)) AS xm
              FROM cw c JOIN e USING (vec_id)),
            sid0 AS (SELECT 0 AS ord, vec_id FROM
              (SELECT vec_id FROM cp ORDER BY vec_id LIMIT 1)),
            $gonzalez,
            c0c AS (SELECT s.ord AS cell, cp.v AS cv, cp.vn AS cn
              FROM sid7 s JOIN cp USING (vec_id)),
            ${iterCtes(1, "c0c")},
            ${iterCtes(2, "c1")}
            SELECT e.vec_id, CAST(c.cell AS INTEGER) AS cell
            FROM e CROSS JOIN c2 c
            QUALIFY row_number() OVER (PARTITION BY e.vec_id
              ORDER BY $simE DESC, c.cell DESC) = 1"""
      },
      "embed_pca" -> {
        // μ and G quantize after their sums (the cross-engine merge-order
        // seam); every fold afterwards is index-ordered, so the power
        // iteration replays Pca.powerIterate's op sequence EXACTLY
        // (list_reduce starts at elt 1; Scala starts at 0.0 — equal since
        // 0.0 + x == x). Sign fix: first nonzero coordinate positive.
        val iter = (k: Int) =>
          s"""y$k AS MATERIALIZED (SELECT g.i AS i, list_reduce(list_transform(range(64),
                j -> g.grow[j+1] * p.v[j+1]),
                (a, b) -> a + b) AS y FROM grows g CROSS JOIN v${k - 1} p),
              n$k AS MATERIALIZED (SELECT sqrt(list_reduce(list_transform(yl, x -> x * x),
                (a, b) -> a + b)) AS nrm
                FROM (SELECT list(y ORDER BY i) AS yl FROM y$k)),
              v$k AS MATERIALIZED (SELECT list(y / n.nrm ORDER BY i) AS v
                FROM y$k CROSS JOIN n$k n GROUP BY n.nrm)"""
        val iters = (1 to 8).map(iter).mkString(",\n")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            ex AS (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i FROM e),
            mu AS (SELECT i, round(avg(x), 6) AS m FROM ex GROUP BY 1),
            muv AS (SELECT list(m ORDER BY i) AS mv FROM mu),
            cent AS (SELECT e.vec_id, list_transform(range(64),
                i -> e.v[i+1] - m.mv[i+1]) AS cv
                FROM e CROSS JOIN muv m),
            cx AS (SELECT vec_id, unnest(cv) AS x,
                generate_subscripts(cv, 1) AS i FROM cent),
            g0 AS MATERIALIZED (SELECT (a.i - 1) * 64 + (b.i - 1) AS k,
                round(sum(a.x * b.x), 6) AS gv
                FROM cx a JOIN cx b USING (vec_id) GROUP BY 1),
            grows AS MATERIALIZED (SELECT k // 64 AS i, list(gv ORDER BY k) AS grow
                FROM g0 GROUP BY 1),
            v0 AS (SELECT list_transform(range(64),
                i -> CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS v),
            $iters,
            sgn AS (SELECT CASE WHEN COALESCE(
                list_filter(v, x -> x <> 0.0)[1], 1.0) < 0
                THEN -1.0 ELSE 1.0 END AS s FROM v8),
            vf AS (SELECT list_transform(p.v, x -> x * g.s) AS v
                FROM v8 p CROSS JOIN sgn g)
            SELECT e.vec_id, round(list_reduce(list_transform(range(64),
              i -> (e.v[i+1] - m.mv[i+1]) * f.v[i+1]), (a, b) -> a + b),
              6) AS pc1
            FROM e CROSS JOIN muv m CROSS JOIN vf f"""
      },
      "embed_pca_incr" -> {
        // moment-path replay: EXACT integer micro-unit moments over the
        // full corpus (what the maintained state converges to, bit for
        // bit), truncated integer means (// truncates like JVM /),
        // integer centered scatter, then the same 8-step power
        // iteration and projection as embed_pca's oracle
        val iter = (k: Int) =>
          s"""y$k AS MATERIALIZED (SELECT g.i AS i, list_reduce(list_transform(range(64),
                j -> g.grow[j+1] * p.v[j+1]),
                (a, b) -> a + b) AS y FROM grows g CROSS JOIN v${k - 1} p),
              n$k AS MATERIALIZED (SELECT sqrt(list_reduce(list_transform(yl, x -> x * x),
                (a, b) -> a + b)) AS nrm
                FROM (SELECT list(y ORDER BY i) AS yl FROM y$k)),
              v$k AS MATERIALIZED (SELECT list(y / n.nrm ORDER BY i) AS v
                FROM y$k CROSS JOIN n$k n GROUP BY n.nrm)"""
        val iters = (1 to 8).map(iter).mkString(",\n")
        s"""WITH e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
                x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
              FROM embeddings),
            nn AS (SELECT count(*)::BIGINT AS n FROM e),
            ex AS (SELECT vec_id, unnest(q) AS x,
                generate_subscripts(q, 1) AS i FROM e),
            sx AS (SELECT i, sum(x)::BIGINT AS s FROM ex GROUP BY 1),
            mu AS (SELECT i, (s // nn.n)::BIGINT AS m FROM sx CROSS JOIN nn),
            muv AS (SELECT list(m ORDER BY i) AS mv FROM mu),
            sv AS (SELECT list(s ORDER BY i) AS sl FROM sx),
            qq AS MATERIALIZED (SELECT (a.i - 1) * 64 + (b.i - 1) AS k,
                sum(a.x * b.x)::BIGINT AS qs
                FROM ex a JOIN ex b USING (vec_id) GROUP BY 1),
            cm AS MATERIALIZED (SELECT k,
                (qs - sv.sl[(k // 64) + 1] * muv.mv[(k % 64) + 1]
                    - muv.mv[(k // 64) + 1] * sv.sl[(k % 64) + 1]
                    + nn.n * muv.mv[(k // 64) + 1] * muv.mv[(k % 64) + 1]
                  )::DOUBLE AS gv
                FROM qq CROSS JOIN sv CROSS JOIN muv CROSS JOIN nn),
            grows AS MATERIALIZED (SELECT k // 64 AS i,
                list(gv ORDER BY k) AS grow FROM cm GROUP BY 1),
            v0 AS (SELECT list_transform(range(64),
                i -> CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS v),
            $iters,
            sgn AS (SELECT CASE WHEN COALESCE(
                list_filter(v, x -> x <> 0.0)[1], 1.0) < 0
                THEN -1.0 ELSE 1.0 END AS s FROM v8),
            vf AS (SELECT list_transform(p.v, x -> x * g.s) AS v
                FROM v8 p CROSS JOIN sgn g)
            SELECT e.vec_id, round(list_reduce(list_transform(range(64),
              i -> (e.q[i+1] - m.mv[i+1])::DOUBLE * f.v[i+1]),
              (a, b) -> a + b) / 1000000.0, 6) AS pc1
            FROM e CROSS JOIN muv m CROSS JOIN vf f"""
      },
      "graph_copurchase" ->
        s"""WITH $basketCtes
            SELECT p1, p2, support FROM e""",
      "graph_degree" ->
        s"""WITH $basketCtes
            SELECT node, count(*) AS degree
            FROM (SELECT unnest([p1, p2]) AS node FROM e) GROUP BY 1""",
      // k-core peel replayed as 20 bounded rounds: each keeps only edges
      // whose BOTH endpoints have alive-degree >= 3; rounds past the
      // fixpoint are identity, so overshooting is safe
      "graph_kcore" -> {
        val peel = (t: Int) => {
          val prev = if (t == 1) "e" else s"ke${t - 1}"
          s"""kd$t AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
                SELECT unnest([p1, p2]) AS node FROM $prev) GROUP BY 1),
              ke$t AS MATERIALIZED (SELECT x.p1, x.p2 FROM $prev x
                JOIN kd$t a ON a.node = x.p1 AND a.deg >= 3
                JOIN kd$t b ON b.node = x.p2 AND b.deg >= 3)"""
        }
        s"""WITH $basketCtes,
            ${(1 to 20).map(peel).mkString(",\n")}
            SELECT node, count(*) AS degree
            FROM (SELECT unnest([p1, p2]) AS node FROM ke20) GROUP BY 1"""
      },
      "graph_basket_rules" ->
        s"""WITH $basketCtes,
            ig AS (SELECT l_partkey AS item,
                   count(DISTINCT l_orderkey) AS n_groups FROM lineitem GROUP BY 1),
            ng AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
            bidir AS (SELECT p1 AS ante, p2 AS cons, support FROM e
                     UNION ALL SELECT p2, p1, support FROM e)
            SELECT b.ante, b.cons,
              round(b.support::DOUBLE / ng.n, 6) AS support,
              round(b.support::DOUBLE / a.n_groups, 6) AS confidence,
              round((b.support::DOUBLE / a.n_groups)
                / (c.n_groups::DOUBLE / ng.n), 6) AS lift
            FROM bidir b
            JOIN ig a ON a.item = b.ante
            JOIN ig c ON c.item = b.cons
            CROSS JOIN ng""",
      "graph_triangles" ->
        s"""WITH $basketCtes,
            tri AS (SELECT ab.p1 AS a, ab.p2 AS b, bc.p2 AS c
                    FROM e ab JOIN e bc ON ab.p2 = bc.p1
                    JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2)
            SELECT node, count(*) AS triangles
            FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1""",
      "graph_pagerank" ->
        s"""WITH $basketCtes,
            sym AS (SELECT p1 AS src, p2 AS dst FROM e
                    UNION ALL SELECT p2, p1 FROM e),
            deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
            r0 AS (SELECT src AS node, 1000000000::BIGINT AS pr_nano FROM deg),
            r1 AS (SELECT s.dst AS node,
                   150000000 + (85 * sum(r.pr_nano // d.deg)) // 100 AS pr_nano
                   FROM sym s JOIN r0 r ON r.node = s.src
                   JOIN deg d ON d.src = s.src GROUP BY 1),
            r2 AS (SELECT s.dst AS node,
                   150000000 + (85 * sum(r.pr_nano // d.deg)) // 100 AS pr_nano
                   FROM sym s JOIN r1 r ON r.node = s.src
                   JOIN deg d ON d.src = s.src GROUP BY 1),
            r3 AS (SELECT s.dst AS node,
                   150000000 + (85 * sum(r.pr_nano // d.deg)) // 100 AS pr_nano
                   FROM sym s JOIN r2 r ON r.node = s.src
                   JOIN deg d ON d.src = s.src GROUP BY 1)
            SELECT node, round(pr_nano / 1e9, 6) AS pr FROM r3""",
      "graph_common_neighbors" ->
        s"""WITH $basketCtes,
            sym AS (SELECT p1 AS src, p2 AS dst FROM e
                    UNION ALL SELECT p2, p1 FROM e),
            deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
            cn AS (SELECT x.src AS a, y.src AS b, count(*) AS common
                   FROM sym x JOIN sym y ON x.dst = y.dst AND x.src < y.src
                   GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT cn.a, cn.b, cn.common,
              round(cn.common::DOUBLE / (da.deg + db.deg - cn.common), 6)
                AS jaccard
            FROM cn JOIN deg da ON da.src = cn.a
            JOIN deg db ON db.src = cn.b""",
      // Components.connectedComponents: cluster = smallest node id in the
      // component — a recursive min-label closure over the edge set
      "graph_components" ->
        s"""WITH RECURSIVE $basketCtes,
            ed AS (SELECT p1 AS src, p2 AS dst FROM e
                   UNION SELECT p2, p1 FROM e),
            walk(id, reach) AS (
              SELECT src, dst FROM ed
              UNION
              SELECT w.id, e2.dst FROM walk w JOIN ed e2 ON w.reach = e2.src)
            SELECT id, least(id, min(reach)) AS cluster
            FROM walk GROUP BY id""",
      "events_rfm" ->
        """WITH base AS (SELECT user_id,
             max(epoch_ns(ts) // 86400000000000) AS last_day,
             count(*) AS frequency, round(sum(value), 2) AS monetary
             FROM events GROUP BY 1),
           q AS (SELECT
             quantile_cont(last_day, 0.25) AS r1,
             quantile_cont(last_day, 0.5) AS r2,
             quantile_cont(last_day, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1,
             quantile_cont(frequency, 0.5) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary, 0.25) AS m1,
             quantile_cont(monetary, 0.5) AS m2,
             quantile_cont(monetary, 0.75) AS m3 FROM base)
           SELECT user_id, 20512 - last_day AS recency_days,
             frequency, monetary,
             1 + (last_day > r1)::INT + (last_day > r2)::INT
               + (last_day > r3)::INT AS r_score,
             1 + (frequency > f1)::INT + (frequency > f2)::INT
               + (frequency > f3)::INT AS f_score,
             1 + (monetary > m1)::INT + (monetary > m2)::INT
               + (monetary > m3)::INT AS m_score
           FROM base CROSS JOIN q""",
      "events_retention" ->
        """WITH e AS (SELECT user_id,
             epoch_ns(ts) // 86400000000000 AS day FROM events),
           c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
           SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
             count(DISTINCT e.user_id) AS users
           FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1, 2""",
      "events_moving_avg" ->
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
             value FROM events)
           SELECT user_id, event_id, us,
             round(avg(value) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mov_avg
           FROM e"""
    )
    // the streamed CMS drain must equal the one-shot build, and the
    // incrementally-merged component survivors the one-shot resolution —
    // identical oracles by construction
    base + ("sketch_cms_stream" -> base("sketch_freq_cms")) +
      ("dedup_resolve_incr" -> base("dedup_minhash_resolve"))
  }
}
