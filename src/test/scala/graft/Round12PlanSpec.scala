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

  test("graph_reciprocity: mutual count is a LeftSemi hash join; the only BNLJ is the one-row readout cross") {
    val p = plan("graph_reciprocity")
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    assert(p.contains("LeftSemi"), "mutual count must be a semi join, not a full pair join")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the one-row readout cross may BNLJ, found $bnlj")
  }

  test("text_kn_score: equi-joins only; the cached instance stream feeds model AND scoring") {
    val p = plan("text_kn_score")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "scoring joins must stay equi-joins")
    assert(p.contains("InMemoryTableScan"),
      "the bigram instance cache must feed the scoring join, not a re-explode")
  }

  test("ts_periodogram: trig table broadcasts; no NLJ; daily frame cached for both moment passes") {
    val p = plan("ts_periodogram")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "trig join must stay an equi-join")
    assert(p.contains("BroadcastHashJoin"), "the 104-row trig table must broadcast")
    assert(p.contains("InMemoryTableScan"),
      "the centered daily frame must feed sxx AND the moment pass from cache")
  }

  test("emb_whiten: whitening is one map pass — no join, no aggregate exchange before the sort") {
    val p = plan("emb_whiten")
    assert(!p.contains("Join"), "the whitening weights are constant-folded, never joined")
    assert(!p.contains("HashAggregate"), "scoring itself aggregates nothing")
  }

  test("text_ngram_novelty: shingle-keyed equi-joins only, no NLJ") {
    val p = plan("text_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "first-seen join must stay an equi-join")
    assert(p.contains("InMemoryTableScan"),
      "the shingle explode must feed min AND verdict from cache, not re-explode")
  }

  test("stats_linreg and stats_anova: one fact aggregate, everything after on the moment frame") {
    for (q <- Seq("stats_linreg", "stats_anova")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: the moment pass joins nothing")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      assert(p.contains("HashAggregate"), s"$q: moments are a hash aggregate")
    }
  }

  test("mm_keyframe_select: bounded per-video rounds — equi-joins and per-video windows only") {
    // since the r15 per-round lineage cut the greedy rounds (equi-joins +
    // per-video argmax windows) execute inside checkpointed jobs; the
    // returned plan is the declared sort over the final selected-set
    // checkpoint — none of the round subtrees may re-inline (the uncut
    // K=3 plan held 72 Exchanges)
    val p = plan("mm_keyframe_select")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "greedy rounds must stay equi-joins")
    assert(p.contains("Scan ExistingRDD"),
      "the result reads the final per-round checkpoint")
    assert(!p.contains("Join"), "round joins run inside the checkpointed jobs")
  }

  test("ann_cell_stats: the audit adds one aggregate over the compiled assignment — no extra shuffle of facts") {
    val p = plan("ann_cell_stats")
    assert(!p.contains("CartesianProduct"), "no all-pairs anywhere")
    assert(p.contains("HashAggregate"), "occupancy is a |cells|-key hash aggregate")
  }

  test("text_perplexity_buckets: the only SinglePartition window runs on the bounded score histogram") {
    val p = SparkEntry.queries("text_perplexity_buckets")(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    // the cumsum window must consume the score-histogram aggregate (a
    // HashAggregate feeds the sort under the window), never raw doc rows
    assert(p.contains("Window"), "bucket thresholds come from a window cumsum")
    assert(p.contains("BroadcastHashJoin"),
      "docs map to buckets via a broadcast of the bounded score table")
  }
}
