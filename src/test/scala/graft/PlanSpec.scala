package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the physical-plan properties that matter at 100 TB: filters reach
  * the parquet scan, scans are column-pruned, dims broadcast, anti-joins
  * stay hash joins. A regression here won't flip correctness, so only this
  * spec would catch it. */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1 pushes the shipdate filter into the scan and prunes columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must be in PushedFilters")
    assert(!p.contains("l_orderkey"), "untouched columns must be pruned from the scan")
  }

  private def scanCount(p: String, table: String): Int =
    p.linesIterator.count(l => l.contains("FileScan") && l.contains(s"$table.parquet"))

  test("q13 avoids correlated-subquery nested loops (aggregation rewrite)") {
    val p = plan("q13_sole_late_supplier")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "EXISTS/NOT EXISTS must be rewritten to aggregations, not NLJs")
    assert(!p.contains("CartesianProduct"))
    assert(scanCount(p, "lineitem") == 1,
      "single-scan rewrite: exactly one lineitem FileScan, no join-back")
  }

  test("keyterms scans and explodes the corpus exactly once (df via window)") {
    val p = plan("text_keyterms")
    assert(scanCount(p, "documents") == 1,
      "df must derive from the tf aggregate, not a second corpus explode")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      "exactly one explode of the corpus")
  }

  test("q14 salted aggregation spreads the hot key over a salt stage") {
    val p = plan("q14_skew_agg")
    assert(p.contains("_salt"), "partial aggregate must be keyed by (k, salt)")
    assert(!p.contains("Expand"), "no distinct-expand in the salted plan")
  }

  test("dedup_spans uses the two-level aggregate, not a distinct expand") {
    val p = plan("dedup_spans")
    assert(!p.contains("Expand"), "count(distinct doc) must be the (digest, doc) pre-aggregate")
    assert(p.contains("Generate explode"), "span starts explode map-side")
  }

  test("q16 pre-aggregates orders before the left join (no wide fan-out)") {
    val p = plan("q16_cust_order_dist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(scanCount(p, "orders") == 1 && scanCount(p, "customer") == 1)
    // the aggregate must sit BELOW the join: the join carries per-custkey
    // counts, never raw order rows
    val joinIdx = p.linesIterator.indexWhere(_.contains("LeftOuter"))
    val aggIdx = p.linesIterator.indexWhere(l =>
      l.contains("HashAggregate(keys=[o_custkey"))
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      "per-custkey pre-aggregate must feed the join side")
  }

  test("stream_cep joins stay hash joins over one cached fact read") {
    val p = plan("stream_cep")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "forward as-of decomposition must never range-explode")
    assert(p.contains("InMemoryTableScan"),
      "stage slices and join-backs must read the tracked projection")
    CacheRegistry.releaseAll()
  }

  test("compact_plan and scene_detect are single-scan plans") {
    assert(scanCount(plan("etl_compact_plan"), "events") == 1)
    val sd = plan("mm_scene_detect")
    assert(scanCount(sd, "documents") == 1)
    assert(sd.linesIterator.count(_.contains("Generate explode")) == 1,
      "frame explode is the only row multiplier")
  }

  test("sample_split is a pure map-side projection (no exchange before sort)") {
    val p = plan("sample_split")
    assert(scanCount(p, "documents") == 1)
    // the only Exchange is the presentation sort's range partitioning
    assert(p.linesIterator.count(_.contains("Exchange")) == 1 &&
      p.contains("rangepartitioning"), "split assignment must not shuffle")
  }

  test("labelprop and mmr never degenerate to cartesian products") {
    assert(!plan("graph_labelprop").contains("CartesianProduct"))
    assert(!plan("emb_mmr").contains("CartesianProduct"))
  }

  test("q2 broadcasts dimension tables") {
    val p = plan("q2_revenue_topn")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join expected at this size")
  }

  test("ingest dedup is a window-pruned anti hash join") {
    val p = plan("etl_ingest_dedup")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(ts,"), "window filter must push to the scan")
  }

  test("zone assignment broadcasts the zone dim and prunes the fact scan") {
    val p = plan("etl_zone_assign")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("ReadSchema: struct<event_id:bigint>"),
      "fact scan should read only event_id (coords are derived)")
  }

  test("zone_multi assigns all 8 zone dims on one fact scan, zero fact shuffles") {
    val p = plan("etl_zone_multi")
    assert(scanCount(p, "events") == 1, "one fact scan feeds all 8 zone joins")
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 8,
      "8 broadcast containment joins, one per zone dim")
    assert(!p.contains("Exchange hashpartitioning"),
      "the fact side must never hash-shuffle")
  }

  test("intersection crash counts broadcast the intersections dim") {
    val p = plan("etl_intersection_crashcount")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("LessThan(p_partkey,100)"), "dim filter must push down")
    assert(p.contains("haversine_m"), "fused haversine expression must be in the join condition")
  }

  test("minhash banding reads the staged sketch, never recomputing signatures") {
    val p = plan("dedup_minhash_lsh")
    // the session-staged sketch (DedupQueries.stagedSketch) is an eager
    // localCheckpoint: the plan consumes its materialized blocks (an RDD
    // scan), so the 16 band projections CANNOT re-inline the shingle +
    // minhash_sig computation — the stronger form of the old repartition
    // barrier (zero minhash_sig calls in this plan at all)
    assert(!p.contains("minhash_sig"),
      "signatures must come from the staged checkpoint, not be recomputed")
    assert(p.contains("Scan ExistingRDD") || p.contains("ExistingRDD"),
      "the plan must read the materialized sketch blocks")
    graft.dedup.DedupQueries.clearSketchCache()
  }

  test("temperature sampling broadcasts the per-language rate table") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), "rate table must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("stream enrichment broadcasts the dim; the only hash shuffle is the agg") {
    val p = plan("stream_enrich")
    assert(p.contains("BroadcastHashJoin"), "nation dim must broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "one shuffle: the windowed aggregation")
  }

  test("frame sampling is scan → project → generate with no hash shuffle") {
    val p = plan("mm_frame_sample")
    assert(p.contains("Generate explode"), "frame fan-out must be a Generate")
    assert(!p.contains("Exchange hashpartitioning"), "no shuffle before the final sort")
    assert(!p.contains("join"), "no join of any kind")
  }

  test("semantic dedup broadcasts the within-cluster pair join, no cartesian") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"))
    // the O(n²)-risk join (pairs within a cluster) must be broadcast-built;
    // the final keep-flag attach on vec_id may stay a shuffle join — both
    // sides are key-partitioned and AQE broadcasts it when small
    assert(p.contains("BroadcastHashJoin"), "pair join must be broadcast")
  }
}
