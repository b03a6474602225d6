package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `graph_hits` contract: the integer fixed-point iteration equals a
  * driver-side replay, scores are normalized and non-negative, and the
  * hub/authority roles separate on the known hub structure of the
  * citation graph. */
class HitsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[Long, (Long, Long)] =
    Hits.hits(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private lazy val replay: Map[Long, (Long, Long)] = {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
    val n = docs.count()
    val edges = PageRank.citationEdges(docs, n).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val verts = docs.collect().map(_.getLong(0)).toSeq
    var hub = verts.map(_ -> Hits.Scale / n).toMap
    var auth = hub
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val s = raw.values.sum
      verts.map(v => v -> raw.get(v).map(r => r * Hits.Scale / s).getOrElse(0L)).toMap
    }
    for (_ <- 1 to Hits.Iters) {
      auth = norm(edges.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum).toMap)
      hub = norm(edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum).toMap)
    }
    verts.map(v => v -> (auth(v), hub(v))).toMap
  }

  test("operator equals the driver-side integer replay") {
    assert(got == replay)
  }

  test("scores are non-negative and sum-normalized to ~Scale") {
    val authSum = got.values.map(_._1).sum
    val hubSum = got.values.map(_._2).sum
    assert(got.values.forall(v => v._1 >= 0L && v._2 >= 0L))
    // div truncation loses < 1 per node
    assert(authSum <= Hits.Scale && authSum > Hits.Scale - got.size)
    assert(hubSum <= Hits.Scale && hubSum > Hits.Scale - got.size)
  }

  test("authority concentrates on the % 100 hub targets") {
    // every doc emits (doc_id % 100) % n — nodes 0..99 receive that whole
    // edge class, so top authorities must come from them
    val topAuth = got.toSeq.sortBy(-_._2._1).take(10).map(_._1)
    assert(topAuth.forall(_ < 100L), s"top authorities not in the hub class: $topAuth")
  }
}
