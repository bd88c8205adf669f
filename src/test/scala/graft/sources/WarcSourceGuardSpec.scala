package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The >2 GiB-member guard on the range-read path: greedy split packing
  * emits ~splitBytes plus one member overhang, so a single gzip member
  * larger than 2 GiB would overflow `(end - start).toInt` to a negative
  * array size deep in an executor task. The guard must fail BY NAME at
  * plan time instead (the split list is control-sized — no 2 GiB fixture
  * needed, the plan row is tested directly). */
class WarcSourceGuardSpec extends AnyFunSuite with graft.SparkTestBase {

  test("a split wider than 2 GiB fails by name before any I/O") {
    val over = WarcMemberSplit("/nonexistent/huge.warc.gz", 0L,
      Int.MaxValue.toLong + 1L)
    val m = intercept[IllegalArgumentException] {
      WarcSource.readSplits(spark, Seq(over))
    }.getMessage
    assert(m.contains("2 GiB") && m.contains("huge.warc.gz"), m)
  }

  test("a split of exactly Int.MaxValue bytes passes the guard") {
    // guard accepts; the subsequent task fails on the nonexistent path,
    // proving the require is the only plan-time gate
    val edge = WarcMemberSplit("/nonexistent/edge.warc.gz", 0L,
      Int.MaxValue.toLong)
    val ex = intercept[Exception] {
      WarcSource.readSplits(spark, Seq(edge)).count()
    }
    assert(!ex.getMessage.contains("2 GiB"))
  }
}
