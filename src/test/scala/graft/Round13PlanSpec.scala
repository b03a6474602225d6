package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-13 operators — asserted at authoring
  * time so the 100 TB-safe shapes cannot silently regress. */
class Round13PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.releaseAll()
    p
  }

  test("emb_bitext_mine: candidates come from the (band, bkey) equi-join — no broadcast NLJ, no cartesian") {
    // BOTH language sides are full corpora at 100 TB: the one legal shape
    // is the LSH-banded equi-join; any NLJ here is the quadratic
    // cross-language scan the margin design exists to avoid
    val p = plan("emb_bitext_mine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cross-language candidates must stay a banded equi-join")
    // since the r15 sim/bandIndex rung, the compiled hyperplane_bands pass
    // lives in the STAGING build; the query plan reads the banded
    // signature table off checkpoint blocks and explodes the band-key
    // array map-side (the Round15PlanSpec rung pins)
    assert(p.contains("Scan ExistingRDD") && p.contains("posexplode(bands"),
      "the staged band index feeds the join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "an equi-join strategy carries the candidate join")
  }

  test("mm_align_score: per-doc equi-joins and map-side aggregates only; the single window partitions by source") {
    val p = plan("mm_align_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "alignment is per-doc equi-joins, never a pair scan")
    assert(p.contains("HashAggregate"), "dot/norm sums are hash aggregates")
    // the audit window partitions by source — never a global single partition
    assert(!p.contains("SinglePartition"),
      "no global-window collapse: the audit rate partitions by source")
  }

  test("graph_betweenness: the assembly is equi-join only (iterative rounds materialize via checkpoints)") {
    val p = plan("graph_betweenness")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "betweenness assembly must stay equi-join-only")
    assert(p.contains("HashAggregate"), "the per-node accumulation is a hash aggregate")
  }

  test("mm_retrieval_eval: the only non-equi join is the bounded-pool cross; the sparse dot is a dim equi-join") {
    val p = plan("mm_retrieval_eval")
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the declared PoolN-bounded cross may BNLJ, found $bnlj")
    assert(p.contains("HashAggregate"), "featVec/dot sums are hash aggregates")
  }

  test("sample_epoch_alloc and sample_curriculum: no pair scans; windows only on declared bounded frames") {
    for (q <- Seq("sample_epoch_alloc", "sample_curriculum")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: no CartesianProduct")
      assert(p.contains("HashAggregate"), s"$q: the corpus pass is a hash aggregate")
    }
  }

  test("graph_anf: register merges materialize via checkpoints; the only BNLJ is the one-row plateau cross") {
    val p = plan("graph_anf")
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"only the one-row nf_final cross may BNLJ, found $bnlj")
    assert(p.contains("HashAggregate"), "per-h totals are hash aggregates")
  }

  test("ts_matrix_profile: subsequence pairing is a type-keyed equi-join, no NLJ anywhere") {
    val p = plan("ts_matrix_profile")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the all-pairs stage must stay the bounded type-keyed equi-join")
    assert(p.contains("HashAggregate"))
  }

  test("stats_mannwhitney: pairwise work confined to the types-microframe; the fact pass is one hash aggregate") {
    val p = plan("stats_mannwhitney")
    assert(!p.contains("CartesianProduct"), "no CartesianProduct")
    assert(p.contains("HashAggregate"), "daily integerization is a hash aggregate")
  }
}
