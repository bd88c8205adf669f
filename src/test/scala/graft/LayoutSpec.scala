package graft

import graft.sources.Layout
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Scala reference Morton interleave. */
  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zOrder2 matches the reference interleave bit for bit") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
      .toDF("a", "b")
    val got = rows.select(col("a"), col("b"),
        Layout.zOrder2(col("a"), col("b"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 8), s"($a,$b)") }
  }

  test("rankScale buckets linearly and clamps at the edges") {
    val rows = Seq(-5L, 0L, 511L, 512L, 1023L, 5000L).toDF("v")
    val got = rows.select(Layout.rankScale(col("v"), 0L, 1023L, 2).as("s"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 2L, 3L, 3L))
  }

  test("z-ordered layout keeps BOTH dimensions' per-file ranges tight (data skipping)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val stats = docs.agg(min("n_chars"), max("n_chars"), min("doc_id"), max("doc_id"))
      .as[(Long, Long, Long, Long)].head()
    val (cLo, cHi, dLo, dHi) = stats
    val nFiles = 8

    def fileRanges(path: String): Seq[((Long, Long), (Long, Long))] = {
      val dir = new java.io.File(path)
      dir.listFiles.filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val one = spark.read.parquet(f.getAbsolutePath)
          .agg(min("n_chars"), max("n_chars"), min("doc_id"), max("doc_id"))
          .as[(Long, Long, Long, Long)].head()
        ((one._1, one._2), (one._3, one._4))
      }
    }
    // avg per-file coverage of a dimension, as a fraction of its global span
    def coverage(rs: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      rs.map { case (a, b) => (b - a + 1).toDouble / (hi - lo + 1) }.sum / rs.size

    val zDir = Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(docs,
      Layout.rankScale(col("n_chars"), cLo, cHi, 8),
      Layout.rankScale(col("doc_id"), dLo, dHi, 8),
      bits = 8, nFiles = nFiles, path = zDir)
    val zr = fileRanges(zDir)
    assert(zr.size >= nFiles - 1, s"expected ~$nFiles files, got ${zr.size}")
    val zChars = coverage(zr.map(_._1), cLo, cHi)
    val zIds = coverage(zr.map(_._2), dLo, dHi)

    // contrast: single-column sort — perfect on doc_id, useless on n_chars
    val sDir = Files.createTempDirectory("graft_sorted").toString
    docs.repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(sDir)
    val sr = fileRanges(sDir)
    val sChars = coverage(sr.map(_._1), cLo, cHi)

    // z-order: each file must cover a strict sub-range of BOTH dims
    assert(zChars <= 0.7, s"zorder n_chars coverage $zChars")
    assert(zIds <= 0.55, s"zorder doc_id coverage $zIds")
    // the id-sorted layout leaves n_chars unclustered — z-order beats it
    assert(sChars >= 0.8, s"sorted-by-id n_chars coverage $sChars (expected ~1)")
    assert(zChars < sChars, "z-order must improve the non-sort dimension")
    graft.core.TempDirs.deleteRecursively(java.nio.file.Paths.get(zDir))
    graft.core.TempDirs.deleteRecursively(java.nio.file.Paths.get(sDir))
  }
}
