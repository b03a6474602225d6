package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_kcore` contract: the fixed-round peel equals a driver-side
  * peel-to-fixpoint replay (fixpoint witness: the budget is sufficient on
  * the test graph), membership/degree invariants hold, and the core is
  * nontrivial. */
class KCoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[Long, (Boolean, Long)] =
    KCore.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap

  /** Driver-side peel to TRUE fixpoint over the same shared graph. */
  private lazy val (replayCore: Map[Long, Int], replayRounds: Int) = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    var adj = Triangles.simpleEdges(docs, n).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSeq
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= KCore.CoreK).keySet
      val next = adj.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != adj.size
      adj = next
      rounds += 1
    }
    (adj.groupBy(_._1).view.mapValues(_.size).toMap, rounds)
  }

  test("every document gets exactly one row") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(got.size.toLong == nDocs)
  }

  test("fixed-round peel equals the peel-to-fixpoint replay") {
    assert(replayRounds <= KCore.PeelRounds,
      s"test graph needs $replayRounds rounds > budget ${KCore.PeelRounds}")
    got.foreach { case (id, (inCore, d)) =>
      assert(inCore == replayCore.contains(id), s"node $id membership")
      assert(d == replayCore.getOrElse(id, 0).toLong, s"node $id degree")
    }
  }

  test("membership invariants: core degree >= k inside, 0 outside") {
    got.foreach { case (id, (inCore, d)) =>
      if (inCore) assert(d >= KCore.CoreK, s"node $id: core degree $d < k")
      else assert(d == 0L, s"node $id: out of core with degree $d")
    }
  }

  test("the 3-core is nontrivial: some nodes kept, some peeled") {
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
  }
}
