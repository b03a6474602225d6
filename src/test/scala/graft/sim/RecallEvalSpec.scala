package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ann_recall_eval` contract: recall is the exact intersection ratio of
  * the two variants' outputs against brute force (replayed from the ops'
  * own results — the eval cannot drift from what it evaluates), bounded in
  * [0,1], and both methods cover the full query set. */
class RecallEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("recall replays from the evaluated operators' own outputs") {
    def pairs(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = pairs("ann_topk_brute")
    val byMethod = Map("ivf" -> pairs("ann_ivf"), "lsh" -> pairs("ann_lsh_bucketed"))
    val got = SparkEntry.queries("ann_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
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
    byMethod.keys.foreach { m =>
      assert(got.filter(_._1 == m).map(_._2).toSet == qs, s"$m covers all queries")
    }
  }
}
