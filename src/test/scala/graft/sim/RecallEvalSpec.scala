package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ann_recall_eval` contract: recall is the exact intersection ratio of
  * EVERY shipped approximate variant's output against brute force
  * (replayed from the ops' own results — the eval cannot drift from what
  * it evaluates), bounded in [0,1], every method covers the full query
  * set, and the method list is exactly the engine's approximate-ANN
  * surface. */
class RecallEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val methodToKey = Map(
    "ivf" -> "ann_ivf", "lsh" -> "ann_lsh_bucketed",
    "multiprobe" -> "ann_multiprobe", "pq" -> "ann_pq",
    "ivfpq" -> "ann_ivfpq", "hamming" -> "ann_hamming_rerank",
    "knngraph" -> "ann_knn_graph", "graphsearch" -> "ann_graph_search")

  test("recall replays from the evaluated operators' own outputs, all eight variants") {
    def pairs(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = pairs("ann_topk_brute")
    val byMethod = methodToKey.map { case (m, k) => m -> pairs(k) }
    val got = SparkEntry.queries("ann_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet == methodToKey.keySet,
      "one row group per shipped approximate variant")
    got.foreach { case (method, q, k, nHit, recall) =>
      val ex = exact(q)
      assert(k == ex.size.toLong)
      val expHit = ex.intersect(byMethod(method).getOrElse(q, Set.empty)).size.toLong
      assert(nHit == expHit, s"$method q=$q")
      assert(recall == math.rint(nHit.toDouble / k * 10000) / 10000)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // full query-set coverage per method
    val qs = exact.keySet
    methodToKey.keys.foreach { m =>
      assert(got.filter(_._1 == m).map(_._2).toSet == qs, s"$m covers all queries")
    }
  }

  test("the method list IS the approximate-ANN surface (no variant ships unaudited)") {
    // every ann_* registered query except the exact baseline, the evals
    // (recall_eval audits retrieval; cell_stats audits cost — it returns
    // cells, not neighbor lists, so recall@k is undefined for it), and
    // the non-top-k shapes (filtered/range) must appear
    val annTopk = SparkEntry.queries.keys.filter(_.startsWith("ann_")).toSet --
      Set("ann_topk_brute", "ann_recall_eval", "ann_cell_stats",
        "ann_filtered", "ann_range_search")
    assert(methodToKey.values.toSet == annTopk,
      s"recall eval must audit exactly $annTopk")
    assert(RecallEval.Methods.map(_._1) == RecallEval.Methods.map(_._1).sorted,
      "deterministic method order")
  }
}
