package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-14 operators and the staged-rung
  * refactors — asserted at authoring time so the 100 TB-safe shapes
  * cannot silently regress. */
class Round14PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  test("stream_late_data: ledger broadcasts back to the stream; no pair scan") {
    val p = plan("stream_late_data")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the batch-ledger join must stay an equi-join")
    assert(p.contains("BroadcastHashJoin"),
      "the per-batch watermark ledger (one row per micro-batch) broadcasts")
    assert(p.contains("HashAggregate"), "per-type counts are hash aggregates")
  }

  test("text_tokenizer_fertility: vocabulary-sized dictionary broadcasts against the exploded corpus") {
    val p = plan("text_tokenizer_fertility")
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    assert(p.contains("BroadcastHashJoin"),
      "the word->token-count model table is a broadcast join (the bpe_apply contract)")
    assert(p.contains("HashAggregate"), "per-language masses are hash aggregates")
  }

  test("graph_louvain: assembly is equi-join only over the staged rung") {
    val p = plan("graph_louvain")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "louvain assembly must stay equi-join-only")
    assert(p.contains("HashAggregate"), "community sizes are hash aggregates")
    GraphArtifacts_clear()
  }

  test("ann_knn_graph: final assembly is equi-join only (rounds materialize via checkpoints)") {
    val p = plan("ann_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the knn graph must never plan a pair scan")
  }

  test("staged graph rung: downstream consumer plans read the checkpoint, not a private re-derivation") {
    // triangles after the rung: the edge input is a materialized scan
    // (LogicalRDD), so the per-op distinct shuffle of the pre-rung plan is
    // gone; orientation joins and wedge join are unchanged equi-joins
    val p = plan("graph_triangles")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "triangles must read the staged simple-edge checkpoint")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    GraphArtifacts_clear()
  }

  test("text_perplexity_buckets: the one BNLJ is the bounded one-row scalar cross") {
    // post-rung the scored frame is a checkpoint, so the total-mass scalar
    // rides an explicit one-row broadcast cross (pre-rung it folded into
    // the inline chain) — the declared bounded class, never a pair scan
    val p = plan("text_perplexity_buckets")
    assert(!p.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the one-row scalar cross may BNLJ, found $bnlj")
    graft.text.LmScore.clearLmCache()
  }

  test("staged LM rung: text_lm_score is a read of the scored checkpoint plus a sort") {
    val p = plan("text_lm_score")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "lm_score must read the staged scored frame")
    // the whole add-one chain (explode, model joins) lives in the rung
    // build, not in the per-query plan
    assert(!p.contains("Generate"), "no per-query bigram explode after staging")
    graft.text.LmScore.clearLmCache()
  }

  private def GraphArtifacts_clear(): Unit = graph.GraphArtifacts.clearGraphCache()
}
