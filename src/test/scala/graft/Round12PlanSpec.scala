package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-12 operators — asserted at authoring
  * time so the 100 TB-safe shapes cannot silently regress. */
class Round12PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  test("graph_scc: final assembly is hash joins on uniform keys, no NLJ anywhere") {
    // the iterative FW-BW rounds materialize through stats-resetting
    // checkpoints, so the query's own plan is the label/size assembly —
    // it must stay equi-join-only (the labels and sizes key on scc_id)
    val p = plan("graph_scc")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no NLJ in the scc assembly")
    assert(p.contains("InMemoryTableScan"),
      "sizes and output read the cached label frame, not a recompute")
  }
}
