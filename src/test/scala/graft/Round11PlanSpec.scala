package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-11 operators — asserted at authoring
  * time so the 100 TB-safe shapes cannot silently regress (the round-10
  * verdict's standing demand). */
class Round11PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  test("text_quality_classifier: scoring is broadcast/hash joins over doc_id, never SMJ/NLJ") {
    val p = plan("text_quality_classifier")
    assert(p.contains("BroadcastHashJoin"), "label/margin joins broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_rewrite_exact: window explode + digest min-agg, keeper join on dg, no NLJ") {
    val p = plan("dedup_rewrite_exact")
    assert(p.contains("explode(sequence"), "stride-1 windows and removed positions explode")
    assert(p.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("min(k")),
      "global first-occurrence keeper is one min aggregate on the digest")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("mm_scene_neardup: pair join keys on the scene digest; counts broadcast back") {
    val p = plan("mm_scene_neardup")
    assert(p.contains("scene_digest"), "the equi-join key is the scene digest")
    assert(p.contains("BroadcastHashJoin"), "per-video scene counts broadcast back")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("stream_quality_score: scoring is one shuffle-free projection (stream-deployable shape)") {
    val p = plan("stream_quality_score")
    assert(!p.contains("Join"), "the single-pass scorer joins nothing")
    assert(!p.contains("HashAggregate") && !p.contains("Window"),
      "no aggregate, no window — per-record expression only")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1 && !p.contains("hashpartitioning"),
      s"only the output sort's range exchange is allowed, saw $exchanges")
  }

  test("text_unigram_vocab: segmentation and usage ride broadcasts, never SMJ") {
    val p = plan("text_unigram_vocab")
    assert(p.contains("BroadcastHashJoin"), "word→pieces table and uses readout broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("ts_theilsen: pair medians rank-select on the cached daily aggregate, no collect") {
    val p = plan("ts_theilsen")
    assert(p.contains("InMemoryTableScan"), "pair sides and residuals read the cached daily aggregate")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "the median is a window rank-select")
    assert(!p.contains("CartesianProduct"))
  }

  test("ts_mannkendall: the pairwise sum self-joins the daily aggregate, never facts") {
    val p = plan("ts_mannkendall")
    assert(p.contains("InMemoryTableScan"), "both pair sides read the cached daily aggregate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("graph_assortativity: endpoint-degree joins reduce to one moments row, no NLJ") {
    val p = plan("graph_assortativity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("InMemoryTableScan"), "degree count and endpoint joins share the cached edges")
  }

  test("graph_modularity: uniform-key endpoint joins reduce to one row, no CartesianProduct") {
    val p = plan("graph_modularity")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("InMemoryTableScan"), "edges and community map are shared via cache")
  }

  test("sample_mix_eval: |langs|-key counts, broadcast total — only bounded NLJ sides") {
    val p = plan("sample_mix_eval")
    assert(p.contains("BroadcastHashJoin"), "kept counts broadcast against the full counts")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("text_lm_eval: split CASE pre-explode, uniform-key model joins, no NLJ") {
    val p = plan("text_lm_eval")
    // r14: the bigram pass is the staged LM rung (a materialized
    // checkpoint shared with text_lm_score), not a per-query cache
    assert(p.contains("Scan ExistingRDD") || p.contains("InMemoryTableScan"),
      "train counts and scoring share one materialized bigram pass")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    graft.text.LmScore.clearLmCache()
  }

  test("stats_bootstrap: pruned scan, no fact join — CI joins only |types|-row aggregates") {
    val p = plan("stats_bootstrap")
    assert(p.contains("BroadcastHashJoin"), "full-mean × CI join broadcasts the bounded side")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.linesIterator.exists(l => l.contains("ReadSchema") &&
      !l.contains("props") && !l.contains("user_id")),
      "the bootstrap scan prunes to event_type/event_id/value")
  }

  test("text_unigram_apply: one broadcast word→ids join, per-doc reassembly, never SMJ/NLJ") {
    val p = plan("text_unigram_apply")
    assert(p.contains("BroadcastHashJoin"), "the vocabulary-sized token table broadcasts")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }
}
