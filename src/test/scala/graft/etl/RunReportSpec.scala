package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `etl_run_report` contract: one row per declared step of the reference's
  * full `main()` sequence, each count equal to re-running the step's own
  * registered query (the drift-proof identity), and every step key is a
  * registered query (the wrap cannot dangle). */
class RunReportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every step is a registered query with a registered oracle") {
    RunReport.Steps.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"step $k not registered")
      assert(SparkEntry.oracleSql.contains(k), s"step $k has no oracle to wrap")
    }
    assert(RunReport.Steps.size == 10, "the full main() sequence is 10 steps")
    assert(RunReport.Steps.distinct == RunReport.Steps)
  }

  test("per-step counts equal re-running the step's own query") {
    val got = SparkEntry.queries("etl_run_report")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == RunReport.Steps.toSet)
    RunReport.Steps.foreach { k =>
      val expect = SparkEntry.queries(k)(spark, sf).count()
      assert(got(k) == expect, s"step $k: report count != step count")
      graft.CacheRegistry.releaseAll()
    }
  }
}
