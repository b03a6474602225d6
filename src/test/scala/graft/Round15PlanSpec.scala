package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-15 operators and the staged band-index
  * refactor — asserted at authoring time so the 100 TB-safe shapes cannot
  * silently regress. */
class Round15PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  test("staged band index: ann_lsh_bucketed reads the checkpoint, not a private sign-bit pass") {
    val p = plan("ann_lsh_bucketed")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "lsh must read the staged band-index checkpoint")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"), "the probe set stays broadcast")
    sim.SimArtifacts.clearBandCache()
  }

  test("staged band index: dedup_embedding_lsh self-join runs over checkpoint blocks") {
    val p = plan("dedup_embedding_lsh")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "embedding-lsh must read the staged band-index checkpoint")
    assert(!p.contains("CartesianProduct"))
    sim.SimArtifacts.clearBandCache()
  }

  test("ann_graph_search: reads the staged graph rung (no descent re-run), hops lineage-cut") {
    // stage the graph first (a prior consumer in the session), then the
    // search's FINAL plan must be a bounded window over the last beam
    // CHECKPOINT — the r15 optimization cut each hop's lineage (the
    // emb_mmr greedy-loop contract: without it the final plan held
    // ~2^Hops copies of the hop-0 subtree, measured 7.3 s -> 2.0 s at
    // sf0.1), so neither the descent's window/distinct subtree nor the
    // hop joins may reappear in the returned plan.
    sim.AnnKnnGraph.queries("ann_knn_graph")(spark, sf).count()
    CacheRegistry.releaseAll()
    val p = plan("ann_graph_search")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "search must read the final beam checkpoint")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the walk is equi-join only")
    assert(!p.contains("Join"),
      "hop joins run inside the per-hop checkpointed jobs, not re-inlined")
    // pin the intent directly (r15 ADVICE: the old disjunct was vacuously
    // true): the ONE range exchange in the plan is the declared output
    // sort's — a second would mean a rung-wide re-sort crept back in
    assert("rangepartitioning\\(q_id".r.findAllMatchIn(p).size == 1,
      "exactly one q_id range exchange: the declared output sort's")
    sim.AnnKnnGraph.clearKnnCache()
    sim.SimArtifacts.clearBandCache()
  }

  test("staged band index: emb_bitext_mine candidate join runs over checkpoint blocks") {
    val p = plan("emb_bitext_mine")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      "bitext mining must read the staged band-index checkpoint")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    sim.SimArtifacts.clearBandCache()
  }
}
