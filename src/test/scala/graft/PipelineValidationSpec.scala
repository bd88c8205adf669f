package graft

import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A21/A22 — DAG validation (reference validation.py:6-94,
  * tests/test_validation.py:11-163). */
class PipelineValidationSpec extends AnyFunSuite {
  private def mapSpec(src: String, tgt: String, v: Int = 1) =
    MapSpec(src, tgt, v, idCol = "id", fn = df => df.select(col("k").as("_mr_key"), col("id")))

  test("valid two-source map target + reduce passes") {
    val p = Pipeline(
      maps = Seq(mapSpec("a", "m"), mapSpec("b", "m")),
      reduces = Seq(ReduceSpec("m", "r", 1, CountReduce)))
    assert(p.mapSpecsByTarget("m").size == 2)
    assert(p.mappersBySource("a").size == 1)
  }

  test("duplicate (source, target) map handler rejected") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m"), mapSpec("a", "m")), Nil)
    }
  }

  test("duplicate reduce target rejected") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m")),
        Seq(ReduceSpec("m", "r", 1, CountReduce), ReduceSpec("m", "r", 2, CountReduce)))
    }
  }

  test("reduce source must be a map target") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m")), Seq(ReduceSpec("not_a_map", "r", 1, CountReduce)))
    }
  }

  test("target cannot be both map and reduce target") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m"), mapSpec("b", "r")),
        Seq(ReduceSpec("m", "r", 1, CountReduce)))
    }
  }

  test("map may not source from a reduce target (two-layer DAG)") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m"), mapSpec("r", "m2")),
        Seq(ReduceSpec("m", "r", 1, CountReduce)))
    }
  }

  test("versions must be positive") {
    assertThrows[IllegalArgumentException] {
      Pipeline(Seq(mapSpec("a", "m", v = 0)), Nil)
    }
  }
}
