package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-9 operators — the properties that
  * matter at 100 TB and that correctness checks cannot see. */
class Round9PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String =
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    finally CacheRegistry.releaseAll()

  private def scanCount(p: String, table: String): Int =
    p.linesIterator.count(l => l.contains("FileScan") && l.contains(s"$table.parquet"))

  test("ts_lttb: bucket ledger broadcasts back; argmax is a partial min_by aggregate") {
    val p = plan("ts_lttb")
    assert(p.contains("BroadcastHashJoin"),
      "the B-row neighbor ledger must broadcast onto the points")
    assert(p.contains("partial_min_by") || p.contains("partial_min("),
      "per-bucket selection must partially aggregate map-side")
    assert(!p.contains("CartesianProduct"))
    assert(scanCount(p, "events") <= 2,
      "one scan for points (+1 tolerated for the checkpointed/calibrated base)")
  }

  test("text_kn_counts: type counts read the cached pair frame, no cartesian") {
    val p = plan("text_kn_counts")
    assert(!p.contains("CartesianProduct"))
    // the pair frame is cached and consumed three times (pairs + both type
    // counts) — the plan must read it via InMemoryTableScan, never re-run
    // the bigram explode per consumer (a FileScan line appears under each
    // InMemoryRelation subtree print, so scan-line counting can't see this)
    assert(p.contains("InMemoryTableScan"),
      "type counts must aggregate the cached single-scan pair frame")
  }

  test("graph_components: no cartesian, size readout is a hash join") {
    val p = plan("graph_components")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_weights: label and size joins stay hash joins") {
    val p = plan("dedup_weights")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("etl_dq_quarantine: the uniqueness rule joins on the table's own key") {
    val p = plan("etl_dq_quarantine")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("event_id"), "dup join keyed on event_id")
  }

  test("dedup_recall_eval: truth comes from the index join, never an all-pairs block join") {
    val p = plan("dedup_recall_eval")
    assert(!p.contains("CartesianProduct"))
    // the all-pairs form would join the sketch frame to itself on only
    // (lang, lb); the index form's equi-join carries the digest key g
    assert(p.contains("g#") || p.contains("[g]"),
      "pair join must carry the shingle digest in its keys")
  }

  test("ann_recall_eval: intersections broadcast (the eval set is bounded)") {
    val p = plan("ann_recall_eval")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "bounded eval frames must broadcast, not sort-merge")
  }

  test("sample_pps_systematic: within-bucket windows are partitioned (no corpus-wide window)") {
    val df = SparkEntry.queries("sample_pps_systematic")(spark, sf)
    val gw = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    // exactly the bucket-offset window over the ~sqrt(n) ledger survives;
    // the per-doc cumsum must be bucket-partitioned
    assert(gw.size <= 1, "at most the bounded bucket-ledger window is global")
    CacheRegistry.releaseAll()
  }
}
