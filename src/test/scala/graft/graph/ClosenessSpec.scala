package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `graph_closeness` contract: every readout replays against a
  * driver-side multi-source BFS over the corpus graph; a planted P₄ pins
  * each node's harmonic sum as its exact small rational; an isolated
  * node pins the reaches-nothing zero convention. */
class ClosenessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver BFS replica: hop distances from each landmark, capped. */
  private def replica(nodes: Seq[Long], edges: Seq[(Long, Long)], k: Int, maxHops: Int)
    : Map[Long, (Long, Long)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val lms = nodes.sorted.take(k)
    val dists = lms.map { l =>
      var vis = Map(l -> 0)
      var frontier = Set(l)
      for (d <- 1 to maxHops) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- vis.keySet
        vis ++= next.map(_ -> d)
        frontier = next
      }
      vis
    }
    nodes.map { v =>
      val ds = dists.flatMap(_.get(v)).filter(_ >= 1)
      v -> (ds.size.toLong, ds.map(d => 60L / d).sum)
    }.toMap
  }

  test("all readouts replay against a driver multi-source BFS on the corpus at sf0.001") {
    val n = graft.Tables.documents(spark, sf).count()
    val nodes = (0L until n).toSeq
    val edges = nodes.flatMap { id =>
      Seq((id * 2654435761L) % n, (id % 100L) % n, (id / 7L) % n)
        .filter(_ != id).map(d => (math.min(id, d), math.max(id, d)))
    }.distinct
    val expect = replica(nodes, edges, Closeness.K, Closeness.MaxHops)
    val got = SparkEntry.queries("graph_closeness")(spark, sf).collect()
    assert(got.length == n && got.nonEmpty)
    got.foreach { r =>
      val (nr, h60) = expect(r.getLong(0))
      assert(r.getLong(1) == nr && r.getLong(2) == h60,
        s"node ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), replica ($nr, $h60)")
      assert(r.getDouble(3) == round6(h60.toDouble / 60.0))
    }
  }

  private def runOn(nodes: Seq[Long], edges: Seq[(Long, Long)]) = {
    val rows = Closeness.closenessOf(spark, nodes.toDF("doc_id"),
      edges.toDF("u", "v")).collect()
    rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
  }

  test("P4 path pins every harmonic sum exactly") {
    // 0—1—2—3, all 4 nodes are landmarks (K=8 > 4):
    // H(0) = 1 + 1/2 + 1/3 = 11/6 → h60 = 110; H(1) = 1 + 1 + 1/2 → 150
    val got = runOn(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(got(0L) == ((3L, 110L, round6(110.0 / 60.0))))
    assert(got(1L) == ((3L, 150L, 2.5)))
    assert(got(2L) == ((3L, 150L, 2.5)))
    assert(got(3L) == ((3L, 110L, round6(110.0 / 60.0))))
  }

  test("an isolated node reaches nothing and reads closeness 0, never NULL") {
    val got = runOn(Seq(0L, 1L, 9L), Seq((0L, 1L)))
    assert(got(9L) == ((0L, 0L, 0.0)))
    assert(got(0L) == ((1L, 60L, 1.0)))
  }
}
