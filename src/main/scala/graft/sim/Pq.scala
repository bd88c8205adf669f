package graft.sim

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) for the ANN family: a
  * vector is split into `m` subspaces and each subvector quantized to its
  * nearest sub-centroid, so a 64-float embedding compresses to `m` small
  * codes — the storage/scan side of large-scale ANN (a billion-vector
  * corpus scans bytes of codes instead of KBs of floats). Search uses
  * ASYMMETRIC DISTANCE (ADC): per query, the distance from its subvector
  * to every sub-centroid is precomputed into an m×k lookup table, so the
  * per-pair cost is m table lookups — no float math against the corpus
  * row at all.
  *
  * Encode and ADC are exact functions of (vector, codebooks): ties
  * quantize to the LOWEST code, and with FIXED codebooks (the first k
  * vectors' subvectors — the oracle-checkable substrate, same trick as
  * the IVF assignment oracle) the ADC top-k is hash-checked end to end —
  * the approximation lives between ADC and TRUE distance, which the spec
  * measures as recall. [[trainCodebooks]] is deterministic up to the FP
  * merge order of its distributed means (same caveat as [[Ivf.train]]):
  * re-runs on identical partitioning reproduce, but codebooks are not
  * bit-pinned across arbitrary repartitioning — which is why the oracle
  * rows use the fixed variant.
  *
  * Reference scope: training-data extension surface (the reference engine
  * has no similarity search).
  */
object Pq {

  /** codebooks(m)(j) = sub-centroid j of subspace m. */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Fixed codebooks from the first `k` vectors (by id): deterministic,
    * re-derivable by any engine — the oracle substrate. */
  def fixedCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int): Codebooks = {
    import corpus.sparkSession.implicits._
    val seed = corpus.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), _.cast("double")))
      .as[Seq[Double]].collect().toSeq
    require(seed.nonEmpty && seed.head.size % m == 0,
      s"dim ${seed.headOption.map(_.size)} must divide into $m subspaces")
    val sub = seed.head.size / m
    (0 until m).map(mi => seed.map(v => v.slice(mi * sub, (mi + 1) * sub)))
  }

  /** Per-subspace deterministic Lloyd refinement of [[fixedCodebooks]] —
    * the trained path (same collect-per-iteration shape as
    * [[Ivf.train]]; codebooks are control data, kilobytes). Empty cells
    * keep their previous centroid. */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int = 2): Codebooks = {
    import corpus.sparkSession.implicits._
    var cbs = fixedCodebooks(corpus, idCol, vecCol, m, k)
    val sub = cbs.head.head.size
    val vecs = corpus.select(transform(col(vecCol), _.cast("double")).as("__v"))
    for (_ <- 0 until iters) {
      val enc = encodeExpr(col("__v"), cbs)
      // mean subvector per (subspace, code): one posexplode pass
      val means = vecs.select(posexplode(enc).as(Seq("__m", "__c")), col("__v"))
        .select(col("__m"), col("__c"),
          posexplode(slice(col("__v"), col("__m") * sub + 1, lit(sub)))
            .as(Seq("__pos", "__x")))
        .groupBy(col("__m"), col("__c"), col("__pos"))
        .agg(avg(col("__x")).as("__mean"))
        .as[(Int, Int, Int, Double)].collect()
        .groupBy(t => (t._1, t._2))
        .map { case ((mi, c), xs) => (mi, c) -> xs.sortBy(_._3).map(_._4).toSeq }
      cbs = cbs.zipWithIndex.map { case (cb, mi) =>
        cb.zipWithIndex.map { case (prev, c) => means.getOrElse((mi, c), prev) }
      }
    }
    cbs
  }

  /** Squared L2 between two equal-length double arrays, dim-sequential
    * fold (the FP order an external engine reproduces with a list fold). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ codes of a vector column: array of `m` codes, code = argmin
    * sub-centroid by squared L2, ties to the LOWEST code. Narrow
    * expression — codebooks ride as literals, no join, no shuffle. */
  def encodeExpr(vec: Column, cbs: Codebooks): Column = {
    val sub = cbs.head.head.size
    val v = transform(vec, _.cast("double"))
    array(cbs.zipWithIndex.map { case (cb, mi) =>
      val subv = slice(v, mi * sub + 1, sub)
      val scored = transform(typedlit(cb.zipWithIndex), e =>
        struct(sqDist(subv, e.getField("_1")), e.getField("_2"))
          .cast("struct<d:double,c:int>"))
      array_min(scored).getField("c")
    }: _*)
  }

  /** (idCol, codes array<int>) for a corpus. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cbs: Codebooks): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol), encodeExpr(col(vecCol), cbs).as("codes"))
  }

  /** ADC top-k: for each query, the k corpus vectors with the smallest
    * asymmetric distance Σ_m lut(q)(m)(code_m). Query LUTs are computed on
    * the driver (queries × m × k doubles — control data) and carried by a
    * broadcast local relation, so the corpus side touches ONLY its codes:
    * the per-pair expression is m array lookups and a fold, and the top-k
    * compiles to a WindowGroupLimit below the one query-count-bounded
    * exchange. Ranks tie-break on neighbor id. */
  /** Per-query ADC lookup tables, driver-side (queries × m × k doubles —
    * control data). Dim-sequential folds, the same FP order as the SQL
    * oracle's list folds. */
  private def queryLuts(queries: DataFrame, idCol: String, vecCol: String,
                        cbs: Codebooks): Seq[(Long, Seq[Double], Seq[Seq[Double]])] = {
    import queries.sparkSession.implicits._
    val m = cbs.size
    queries
      .select(col(idCol).cast("long"), transform(col(vecCol), _.cast("double")))
      .as[(Long, Seq[Double])].collect().toSeq
      .map { case (qid, qv) =>
        val sub = qv.size / m
        (qid, qv, cbs.zipWithIndex.map { case (cb, mi) =>
          val subq = qv.slice(mi * sub, (mi + 1) * sub)
          cb.map(c => subq.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
            acc + (x - y) * (x - y)
          })
        })
      }
  }

  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cbs: Codebooks, k: Int): DataFrame =
    adcTopKFromCodes(
      encode(corpus, idCol, vecCol, cbs)
        .select(col(idCol).as("neighbor_id"), col("codes")),
      queries, idCol, vecCol, cbs, k)

  /** [[adcTopK]] against an ALREADY-encoded `(neighbor_id, codes)` table —
    * encode-once/probe-many (the code table is the flat-PQ "index": 8
    * bytes per vector, persistable; encoding is the corpus-scale cost and
    * probing it again per query batch would pay it every time). */
  def adcTopKFromCodes(codes: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, cbs: Codebooks, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val qs = queryLuts(queries, idCol, vecCol, cbs).map(t => (t._1, t._3))
    val luts = broadcast(qs.toDF("query_id", "__lut"))
    val dist = aggregate(
      zip_with(col("__lut"), col("codes"), (lut, c) => element_at(lut, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    luts.join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
  }

  /** Persist the IVF-PQ code index: ONE corpus scan derives coarse cell +
    * PQ codes per row, written partitioned by cell — the build side of
    * build-once/probe-many. A probe then reads only its probed cells'
    * directories ([[probeCodeIndex]] — `PartitionFilters` on cell), so
    * per-query IO is Σ probed-cell code bytes, never the corpus. */
  def buildCodeIndex(corpus: DataFrame, idCol: String, vecCol: String,
                     cents: Seq[(Int, Seq[Double])], cbs: Codebooks,
                     path: String): Unit = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("neighbor_id"),
        Ivf.cellExpr(col(vecCol), cents).as("cell"),
        encodeExpr(col(vecCol), cbs).as("codes"),
        lit(0L).as("gen"))
      .repartition(cents.size, col("cell"))
      // gen as a partition column: redelivered update batches replace
      // their own gen subdirectories (dynamic overwrite below) — same
      // crash/idempotence layout as Ivf/Retrieval
      .write.mode("overwrite").partitionBy("cell", "gen")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(codesDir(path))
    // rebuild IS compaction: stale tombstones must not outlive the rows
    // they were horizoning (same rule as LshIndex/Ivf rebuilds)
    graft.core.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(tombstoneDir(path)))
    graft.core.GenPointer.commit(path, 0L)
  }

  private def codesDir(path: String): String = s"$path/codes"
  private def tombstoneDir(path: String): String = s"$path/tombstones"

  /** Log-structured maintenance of a [[buildCodeIndex]] index — the same
    * discipline as [[Ivf.updateIndex]]/LshIndex/Retrieval: upserts encode
    * and append to their (possibly NEW) cell's partition under `gen`, and
    * every upserted/deleted id gains an (id, upto_gen) tombstone that
    * kills its older rows wherever they live — a moved vector's stale row
    * sits in a cell the pruned probe may still read, so the horizon is by
    * id, not by cell. `gen` must increase per batch. Rebuild = compaction. */
  def updateCodeIndex(path: String, cents: Seq[(Int, Seq[Double])],
                      cbs: Codebooks, upserts: DataFrame, idCol: String,
                      vecCol: String, deletes: DataFrame, gen: Long): Unit = {
    GraftFunctions.register(upserts.sparkSession)
    // redelivery of an already-committed gen is a no-op
    if (graft.core.GenPointer.committed(path) != Long.MaxValue &&
        graft.core.GenPointer.committed(path) >= gen) return
    // dynamic partition overwrite: the batch writes ONLY …/gen=<gen>
    // partitions, so redelivering a crashed batch replaces its own partial
    // appends instead of duplicating code rows into the ADC ranking
    upserts.select(col(idCol).as("neighbor_id"),
        Ivf.cellExpr(col(vecCol), cents).as("cell"),
        encodeExpr(col(vecCol), cbs).as("codes"),
        lit(gen).as("gen"))
      .repartition(cents.size, col("cell"))
      .write.mode("overwrite").partitionBy("cell", "gen")
      .option("partitionOverwriteMode", "dynamic")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(codesDir(path))
    graft.core.KillPoint("ivfpq.codes")
    upserts.select(col(idCol).as("neighbor_id"))
      .unionByName(deletes.select(col(idCol).as("neighbor_id")))
      .distinct()
      .withColumn("upto_gen", lit(gen))
      .coalesce(1)
      .write.mode("overwrite").partitionBy("upto_gen")
      .option("partitionOverwriteMode", "dynamic")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(tombstoneDir(path))
    graft.core.KillPoint("ivfpq.tombstones")
    // the batch becomes visible HERE, atomically — a crash between the two
    // writes leaves it invisible (GenPointer's crash contract)
    graft.core.GenPointer.commit(path, gen)
    graft.core.KillPoint("ivfpq.committed")
  }

  /** Compaction of the code table WITHOUT re-encoding any vector — the
    * crash-consistent twin of [[buildCodeIndex]]-as-rebuild: surviving
    * rows rewrite into a staging directory at the CURRENT MAX generation
    * and swap in via [[graft.core.DirSwap]]; the tombstones (a SIBLING
    * directory here) then clear. Max-gen keeps every crash prefix
    * consistent: with tombstones still present the horizon
    * (`upto_gen <= max`) passes the rewritten rows. */
  def compactCodeIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): Unit = {
    graft.core.DirSwap.heal(codesDir(path))
    val live = liveCodes(spark, path, spark.read.parquet(codesDir(path)))
    val gen = live.agg(coalesce(max(col("gen")).cast("long"), lit(0L)))
      .head().getLong(0)
    val staging = codesDir(path) + "__compacting"
    live.withColumn("gen", lit(gen))
      .write.mode("overwrite").partitionBy("cell", "gen")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(staging)
    graft.core.DirSwap.swap(staging, codesDir(path))
    graft.core.KillPoint("ivfpq.compact.codes")
    graft.core.TempDirs.deleteRecursively(
      java.nio.file.Paths.get(tombstoneDir(path)))
    graft.core.KillPoint("ivfpq.compact.tombstones")
    // atLeast: a deletes-only final batch leaves max(live gen) < committed;
    // never regress the pointer (redelivery short-circuit contract)
    graft.core.GenPointer.commitAtLeast(path, gen)
  }

  /** Code rows surviving the tombstone horizon AND the committed-generation
    * pointer: row.gen ≤ committed (a torn batch's appends stay invisible)
    * and row.gen ≥ max(upto_gen ≤ committed) of its id. Tombstones are
    * change-batch-sized control data — the join broadcasts. */
  private def liveCodes(spark: org.apache.spark.sql.SparkSession,
                        path: String, codes: DataFrame): DataFrame = {
    val committed = graft.core.GenPointer.committed(path)
    val visible =
      if (committed == Long.MaxValue) codes
      else codes.filter(col("gen") <= committed)
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(tombstoneDir(path)))) visible
    else {
      val horizon = spark.read.parquet(tombstoneDir(path))
        .filter(col("upto_gen") <= committed)
        .groupBy(col("neighbor_id")).agg(max(col("upto_gen")).as("__upto"))
      visible.join(broadcast(horizon), Seq("neighbor_id"), "left")
        .filter(col("__upto").isNull || col("gen") >= col("__upto"))
        .drop("__upto")
    }
  }

  /** ADC top-k over a persisted [[buildCodeIndex]] — the probe side:
    * partition-pruned read of the probed cells, m lookups + an ordered
    * fold per candidate. Same semantics as [[ivfPqTopK]]. */
  def probeCodeIndex(queries: DataFrame, idCol: String, vecCol: String,
                     cents: Seq[(Int, Seq[Double])], cbs: Codebooks,
                     path: String, nProbe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = probeSets(queries, idCol, vecCol, cents, cbs, nProbe)
    val allProbed: Seq[Int] = qs.flatMap(_._2).distinct
    val luts = broadcast(qs.toDF("query_id", "__probe", "__lut"))
    val codes = liveCodes(spark, path, spark.read.parquet(codesDir(path))
      .filter(col("cell").isin(allProbed: _*))) // static partition prune
    val dist = aggregate(
      zip_with(col("__lut"), col("codes"), (lut, c) => element_at(lut, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    luts.join(codes,
        array_contains(col("__probe"), col("cell")) &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cell"),
        col("adc_dist"), col("rank"))
  }

  /** Per-query (probe cells, LUT) — the driver-side probe control data. */
  private def probeSets(queries: DataFrame, idCol: String, vecCol: String,
                        cents: Seq[(Int, Seq[Double])], cbs: Codebooks,
                        nProbe: Int): Seq[(Long, Seq[Int], Seq[Seq[Double]])] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    queryLuts(queries, idCol, vecCol, cbs).map { case (qid, qv, lut) =>
      val qn = math.sqrt(dot(qv, qv))
      val probed = cents.map { case (cell, cv) =>
        val den = qn * math.sqrt(cv.map(x => x * x).sum)
        (if (den == 0) 0.0 else dot(qv, cv) / den, cell)
      }.sortBy { case (s, cell) => (-s, -cell) }.take(nProbe).map(_._2)
      (qid, probed, lut)
    }
  }

  /** IVF-PQ (the FAISS billion-scale composite): each query probes its
    * `nProbe` nearest coarse cells (cosine, the IVF metric — scored on
    * the driver against the control-sized centroid set, ties to the
    * larger cell exactly like [[Ivf.assignCells]]), and ADC re-ranks ONLY
    * the vectors assigned to those cells. One corpus scan derives cell +
    * codes per row; with a persisted cell-partitioned code table the
    * probe becomes a partition-pruned read (the [[Ivf.Index]] layout) —
    * candidate cost is Σ probed-cell sizes, never the corpus. With fixed
    * centroids and codebooks the whole composite is an exact function of
    * the data (hash-checked); recall vs exact search is PqSpec's claim. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, cents: Seq[(Int, Seq[Double])],
                cbs: Codebooks, nProbe: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    // driver-side probe-cell selection: same cosine + tie rule as the
    // assignment expression (dim-sequential dot, 0-norm guard)
    val qs = probeSets(queries, idCol, vecCol, cents, cbs, nProbe)
    val luts = broadcast(qs.toDF("query_id", "__probe", "__lut"))
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      Ivf.cellExpr(col(vecCol), cents).as("cell"),
      encodeExpr(col(vecCol), cbs).as("codes"))
    val dist = aggregate(
      zip_with(col("__lut"), col("codes"), (lut, c) => element_at(lut, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
    luts.join(codes,
        array_contains(col("__probe"), col("cell")) &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cell"),
        col("adc_dist"), col("rank"))
  }
}
