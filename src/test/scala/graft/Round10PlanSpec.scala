package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-10 operators — the shapes that make
  * them 100 TB-safe, asserted so they cannot silently regress. */
class Round10PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  private def exchanges(p: String): Int =
    p.linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("stats_hll_distinct: one pruned scan, two agg shuffles, no join") {
    val p = plan("stats_hll_distinct")
    assert(!p.contains("Join"), "the sketch is pure aggregation")
    assert(exchanges(p) <= 2, "register agg + readout agg only")
    assert(!p.contains("props"), "scan must prune to (event_type, user_id)")
  }

  test("stream_distinct batch twin: same pure-aggregation shape with day in the key") {
    val p = plan("stream_distinct")
    assert(!p.contains("Join"))
    assert(exchanges(p) <= 2)
  }

  test("stats_sketch_eval: sketch readouts broadcast, never sort-merge") {
    val p = plan("stats_sketch_eval")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("text_collocations: totals broadcast as one-row sides; top-k is group-limited") {
    val p = plan("text_collocations")
    assert(!p.contains("CartesianProduct"))
    // the two one-row total frames are the only nested-loop sides
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2)
    // Catalyst turns the rank<=100 filter into a TakeOrderedAndProject
    // BELOW the window (even stronger than WindowGroupLimit: per-partition
    // top-100, then the rank window touches only the 100 survivors)
    assert(p.contains("TakeOrderedAndProject") || p.contains("WindowGroupLimit"),
      "the top-100 cut must push below the rank window")
  }

  test("text_zipf_fit: rank cut pushes as WindowGroupLimit, never a full vocab sort") {
    val p = plan("text_zipf_fit")
    assert(!p.contains("Join"), "the fit is pure aggregation over the ranked head")
    // the rank<=1000 cut must run BELOW the row_number window as a
    // per-partition group limit, so the exchange carries at most 1000
    // words per language — never the whole vocabulary
    assert(p.contains("WindowGroupLimit"),
      "the rank cut must push below the window as WindowGroupLimit")
    assert(exchanges(p) <= 2, "word-count agg + lang repartition only")
  }

  test("etl_freshness: one fact aggregate + a one-row frontier broadcast") {
    val p = plan("etl_freshness")
    // the global frontier day is a one-row aggregate broadcast onto the
    // per-type aggregate — never a window over the fact, never an SMJ
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      "exactly the one-row frontier cross-broadcast")
    assert(p.contains("IdentityBroadcastMode"), "frontier side must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.contains("FileScan")) == 2,
      "per-type agg and frontier each scan events once, nothing else")
  }

  test("stats_cms_eval: exact truth is a pushed-predicate pruned scan; joins broadcast") {
    val p = plan("stats_cms_eval")
    // the exact per-probe truth must push user_id < 25 into the parquet
    // scan (a 25-key sliver at any corpus scale, the whole point)
    assert(p.contains("LessThan(user_id,25)"),
      "truth scan must carry the pushed user_id<25 predicate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("sample_split_group: rides the staged pair graph, never re-detects") {
    graft.dedup.DedupClusters.verifiedPairs(spark, sf) // staged
    val p = plan("sample_split_group")
    // labels come from the hybrid component engine over the staged pairs:
    // driver union-find (LocalTableScan of labels) under the 2^20-edge
    // bound, distributed min-label (ExistingRDD checkpoint scans) above it
    assert(p.contains("LocalTableScan") || p.contains("ExistingRDD"),
      "labels must come from the staged pair graph")
    assert(!p.contains("minhash_sig") && !p.contains("shingles3"),
      "no near-dup re-detection inside the split")
    assert(p.contains("BroadcastHashJoin"), "label join broadcasts the cluster side")
  }
}
