package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `graph_neighbor_jaccard` is exact w.r.t. its declared capped-apex
  * metric, so the spec replays the whole definition driver-side. */
class NeighborsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[(Long, Long), (Long, Long, Double)] =
    Neighbors.neighborJaccard(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("distributed capped-neighborhood Jaccard equals the driver replay") {
    val n = Tables.documents(spark, sf).count()
    val und = (0L until n).flatMap(i => Seq(
      (i * 2654435761L) % n, (i % 100L) % n, (i / 7L) % n).map(j => i -> j))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val cappedAdj = adj.map { case (v, nbs) =>
      v -> nbs.filter(nb => deg(nb) <= Neighbors.ApexDfCap).toSet
    }
    val expect = (for {
      (a, na) <- cappedAdj.toSeq
      (b, nb) <- cappedAdj.toSeq
      if a < b
      common = (na & nb).size.toLong
      if common >= Neighbors.MinCommon
    } yield {
      val union = na.size + nb.size - common
      val j = BigDecimal(common.toDouble / union)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b) -> (common, union.toLong, j)
    }).toMap
    assert(got == expect)
    assert(got.nonEmpty, "graph must produce candidate pairs")
  }

  test("scores are sane: bounded and symmetric-by-construction ids ordered") {
    got.foreach { case ((a, b), (common, union, j)) =>
      assert(a < b)
      assert(common <= union)
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
