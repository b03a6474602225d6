package graft.etl

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Generative check of the grid-DBSCAN: on random point clouds the
  * cell-decomposed operator must equal a brute-force all-pairs replay —
  * the class of bug this targets is cell-geometry truncation (a neighbor
  * reachable across a cell border the 3×3 stencil misses; one such bug
  * was caught by hand during development). Fixed-seed generator loop (the
  * scalatest-scalacheck bridge is not on the offline classpath). */
class GeoClusterPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Eps = 0.004
  private val Scale = GeoCluster.LngScale
  private val MinPts = 3L

  // points concentrated in a ~6x6-cell box so cross-cell adjacency is common
  private val pt = for {
    x <- Gen.chooseNum(0.0, 6 * Eps / Scale)
    y <- Gen.chooseNum(0.0, 6 * Eps)
  } yield (-74.1 + x, 40.6 + y)

  private def cloud(seed: Long, n: Int): Seq[(Long, Double, Double)] =
    (0 until n * 4).iterator
      .flatMap(i => pt.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed + i)))
      .take(n).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }.toSeq

  private def brute(pts: Seq[(Long, Double, Double)]): Map[Long, (Long, Boolean, Option[Long])] = {
    val nbrs = pts.map { case (id, x, y) =>
      id -> pts.filter { case (_, x2, y2) =>
        val dlat = y - y2; val dlng = (x - x2) * Scale
        dlat * dlat + dlng * dlng <= Eps * Eps
      }.map(_._1).toSet
    }.toMap
    val core = nbrs.filter(_._2.size >= MinPts).keySet
    var label = Map.empty[Long, Long]
    core.toSeq.sorted.foreach { c =>
      if (!label.contains(c)) {
        var frontier = Set(c); var seen = Set(c)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(f => nbrs(f) & core) -- seen
          seen ++= frontier
        }
        val m = seen.min
        seen.foreach(x => label += x -> m)
      }
    }
    pts.map { case (id, _, _) =>
      val cl =
        if (core(id)) Some(label(id))
        else {
          val cn = (nbrs(id) & core).map(label)
          if (cn.nonEmpty) Some(cn.min) else None
        }
      id -> (nbrs(id).size.toLong, core(id), cl)
    }.toMap
  }

  (0 until 4).foreach { round =>
    test(s"random cloud $round: cell-decomposed DBSCAN equals all-pairs brute force") {
      val pts = cloud(1000L * round + 7L, 50)
      val got = GeoCluster.dbscan(pts.toDF("event_id", "lng", "lat"),
        Eps, MinPts, Scale).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      graft.CacheRegistry.releaseAll()
      val expect = brute(pts)
      val diffs = (got.keySet ++ expect.keySet).filter(k => got.get(k) != expect.get(k))
      assert(diffs.isEmpty, s"diffs at $diffs: got=${diffs.map(got.get)} expect=${diffs.map(expect.get)}")
      // the generated cloud must actually exercise clustering
      if (round == 0) assert(expect.values.exists(_._2) && expect.values.exists(!_._2))
    }
  }
}
