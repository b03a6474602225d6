package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class TrianglesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[Long, (Long, Long)] =
    Triangles.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  /** Driver-side brute force on the same derived graph: for every edge
    * (u,v), count common neighbors — each triangle counted 3 times. */
  test("per-node counts equal a brute-force common-neighbor replay") {
    val n = Tables.documents(spark, sf).count()
    val ids = 0L until n
    val und = ids.flatMap(i => Seq(
      (i * 2654435761L) % n, (i % 100L) % n, (i / 7L) % n).map(j => i -> j))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triPerNode = ids.map { v =>
      val nb = adj.getOrElse(v, Set.empty)
      // triangles at v = closed wedges at v, each counted twice (u,w)/(w,u)
      v -> nb.toSeq.map(u => (nb & adj.getOrElse(u, Set.empty)).size).sum / 2L
    }.toMap
    assert(got.view.mapValues(_._2).toMap == triPerNode)
    val degrees = ids.map(v => v -> adj.getOrElse(v, Set.empty).size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == degrees)
  }

  test("the graph actually has triangles and hub nodes carry more of them") {
    val total = got.values.map(_._2).sum / 3 // each triangle on 3 nodes
    assert(total > 0, "degenerate test graph: no triangles at all")
    val hubs = got.filter(_._1 < 100L).values.map(_._2)
    val rest = got.filter(_._1 >= 100L).values.map(_._2)
    assert(hubs.sum.toDouble / hubs.size > rest.sum.toDouble / rest.size,
      "hub mean triangle count must exceed non-hub mean")
  }
}
