package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_geo_cluster` contract: textbook DBSCAN semantics on planted
  * geometry (core/border/noise, cluster separation, border ties to the
  * lowest label), plus a full driver-side replay of the operator's
  * md5-coordinate pipeline. */
class GeoClusterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val Eps = GeoCluster.Eps0
  private val Scale = GeoCluster.LngScale

  private def run(pts: Seq[(Long, Double, Double)]): Map[Long, (Long, Boolean, Option[Long])] = {
    import spark.implicits._
    val out = GeoCluster.dbscan(pts.toDF("event_id", "lng", "lat"),
      Eps, GeoCluster.MinPts, Scale).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("planted geometry: core blob, border, noise, and cluster separation") {
    val d = Eps / 4
    // blob A around (-74.0, 40.7): 5 mutually-within-eps points (ids 10..14)
    val blobA = Seq(
      (10L, -74.0, 40.7), (11L, -74.0 + d, 40.7), (12L, -74.0, 40.7 + d),
      (13L, -74.0 - d, 40.7), (14L, -74.0, 40.7 - d))
    // blob B far away (ids 20..24)
    val blobB = blobA.map { case (id, x, y) => (id + 10L, x + 0.1, y + 0.1) }
    // border: north along LAT (the unscaled axis) — within eps of exactly
    // blob A's north point, too sparse to be core itself
    val border = (30L, -74.0, 40.7 + d + Eps * 0.9)
    // noise: alone
    val noise = (40L, -73.9, 40.6)
    val got = run(blobA ++ blobB :+ border :+ noise)
    blobA.foreach { case (id, _, _) =>
      assert(got(id)._2, s"$id must be core")
      assert(got(id)._3.contains(10L), s"$id in cluster 10")
    }
    blobB.foreach { case (id, _, _) =>
      assert(got(id)._2 && got(id)._3.contains(20L), s"$id in cluster 20")
    }
    assert(!got(30L)._2 && got(30L)._3.contains(10L), s"border: ${got(30L)}")
    assert(!got(40L)._2 && got(40L)._3.isEmpty, s"noise: ${got(40L)}")
  }

  /** One eps expressed in raw longitude degrees under the scaled metric. */
  private val Ex = Eps / Scale

  test("a border point between two clusters takes the LOWEST label and does not merge them") {
    // all x-offsets in Ex units so lng distances equal their eps multiples
    def blob(baseId: Long, x: Double, y: Double) = Seq(
      (baseId, x, y), (baseId + 1, x + Ex / 4, y), (baseId + 2, x, y + Eps / 4),
      (baseId + 3, x - Ex / 4, y), (baseId + 4, x, y - Eps / 4))
    // blob edges 1.7 eps apart (no direct link); the midpoint reaches a's
    // east point (101) at 0.8 eps and b's west point (203) at 0.9 eps
    val a = blob(100L, -74.0, 40.7)
    val b = blob(200L, -74.0 + 2.2 * Ex, 40.7)
    val mid = (300L, -74.0 + 1.05 * Ex, 40.7)
    val got = run(a ++ b :+ mid)
    assert(got(300L)._3.contains(100L), s"border tie must take the lowest label: ${got(300L)}")
    assert(!got(300L)._2)
    // the bridge point must NOT merge the clusters (it is not core)
    assert(b.forall { case (id, _, _) => got(id)._3.contains(200L) },
      "a border bridge merged two clusters")
  }

  test("operator equals a full driver-side replay at sf0.001") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = graft.Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0))
    val pts = ids.map { id =>
      val hx = md5hex(id.toString)
      val lng = -74.25 + (java.lang.Long.parseLong(hx.substring(0, 8), 16) % 100000L) / 100000.0 * 0.5
      val lat = 40.50 + (java.lang.Long.parseLong(hx.substring(8, 16), 16) % 100000L) / 100000.0 * 0.4
      (id, lng, lat)
    }
    // replay: brute-force neighborhoods at the density-adaptive radius
    val eps = GeoCluster.epsFor(ids.length.toLong)
    val nbrs = pts.map { case (id, x, y) =>
      id -> pts.filter { case (_, x2, y2) =>
        val dlat = y - y2; val dlng = (x - x2) * Scale
        dlat * dlat + dlng * dlng <= eps * eps
      }.map(_._1).toSet
    }.toMap
    val core = nbrs.filter(_._2.size >= GeoCluster.MinPts).keySet
    // components of the core-core graph (BFS)
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
    val expect = pts.map { case (id, _, _) =>
      val cl =
        if (core(id)) Some(label(id))
        else {
          val coreNb = (nbrs(id) & core).map(label)
          if (coreNb.nonEmpty) Some(coreNb.min) else None
        }
      id -> (nbrs(id).size.toLong, core(id), cl)
    }.toMap
    val got = GeoCluster.geoCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    graft.CacheRegistry.releaseAll()
    val diffs = (got.keySet ++ expect.keySet)
      .filter(k => got.get(k) != expect.get(k)).toSeq.sorted
    assert(diffs.isEmpty,
      s"${diffs.size} diffs, first: " + diffs.take(5).map(k =>
        s"$k got=${got.get(k)} expect=${expect.get(k)}").mkString("; "))
  }

  test("hot-cell salting: a degenerate pileup cell yields identical output, pair mass split across shards") {
    import spark.implicits._
    // 500 points piled onto ONE coordinate (a stadium pileup: every pair
    // within eps, one cell holds the whole blob) + a normal far-away blob
    val d = Eps / 4
    val pile = (0 until 500).map(i => (1000L + i, -74.0, 40.7))
    val blob = Seq((10L, -73.8, 40.6), (11L, -73.8 + d, 40.6),
      (12L, -73.8, 40.6 + d), (13L, -73.8 - d, 40.6), (14L, -73.8, 40.6 - d))
    val pts = (pile ++ blob).toDF("event_id", "lng", "lat")

    def collect(hotOcc: Long) = {
      val out = GeoCluster.dbscan(pts, Eps, GeoCluster.MinPts, Scale,
        hotOccupancy = hotOcc, cellSalt = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      graft.CacheRegistry.releaseAll()
      out
    }
    val plain = collect(Long.MaxValue) // cap never fires
    val salted = collect(100L)         // the pile cell (500 > 100) salts
    assert(salted == plain,
      "salting is a physical re-shard only — labels, cores, counts identical")
    // sanity: the pile really is one eps-cluster of mutual neighbors
    val pileRows = plain.filter(_._1 >= 1000L)
    assert(pileRows.forall(r => r._2 == 500L && r._3 && r._4.contains(1000L)))
  }
}
