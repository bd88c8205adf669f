package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-layout operators for scan-time data skipping — the storage-side
  * complement of predicate pushdown. Parquet readers skip whole files/row
  * groups whose column min/max stats exclude a predicate; those stats are
  * only selective if the writer CLUSTERED the data. Sorting by one column
  * gives perfect skipping on that column and none on any other; a Z-order
  * (Morton) key interleaves the bits of several columns so every file
  * covers a small hyper-rectangle — range predicates on ANY of the
  * interleaved dimensions skip most files. This is the layout Delta/
  * Iceberg `OPTIMIZE ZORDER BY` applies, built from plain expressions.
  *
  * The reference engine has no storage layout control (every read is a
  * REST call, vendor read_only.py:139-160); this is part of the
  * 100 TB extension surface.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative ints:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. A pure
    * codegen'd bit-op fold — engine-reproducible (same shifts work in any
    * SQL dialect), monotone in the interleaved hyper-rectangles. Inputs
    * must already be scaled to [0, 2^bits) — use [[rankScale]] for
    * arbitrary distributions. */
  def zOrder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val bi = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_.bitwiseOR(_))
  }

  /** Scale an arbitrary numeric column to [0, 2^bits) by clamping against
    * an inclusive [lo, hi] range (driver-known or from a stats pass):
    * linear bucketing, monotone, so z-curve locality follows value
    * locality. */
  def rankScale(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo)
    val buckets = 1L << bits
    // clamp into [lo, hi] BEFORE scaling: an out-of-range value must land
    // in the edge bucket, and clamping first also bounds the multiply to
    // (hi-lo+1)*2^bits — no long overflow, and the FP division below stays
    // exact (well under 2^53)
    val clamped = least(lit(hi), greatest(lit(lo), c.cast("long")))
    // integral division (Column./ on longs is FP division; floor+cast keeps
    // the bucket id exact)
    least(lit(buckets - 1),
      floor((clamped - lo) * buckets / (hi - lo + 1)).cast("long"))
  }

  /** Write `df` clustered by the Morton key of two scaled dimensions into
    * `nFiles` files: range-partition on the z-key (so each file owns a
    * contiguous z-range = a small hyper-rectangle in (a, b) space), sort
    * within partitions, drop the key. Parquet footer min/max on BOTH
    * source columns are then tight per file — a range predicate on either
    * column prunes most files at plan time. */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
                    nFiles: Int, path: String): Unit =
    df.withColumn("__z", zOrder2(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(path)
}
