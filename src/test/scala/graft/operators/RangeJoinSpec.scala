package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.etl.Synth

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def points = {
    val id = col("event_id")
    Tables.events(spark, TestSpark.sf)
      .select(id, Synth.cartoLng(id).as("lng"), Synth.cartoLat(id).as("lat"))
      .filter(col("lng").isNotNull)
  }

  private def zones = Tables.region(spark, TestSpark.sf).select(
    col("r_name").as("zone"),
    (lit(-74.25) + col("r_regionkey") * lit(0.1)).as("west"),
    (lit(-74.25) + (col("r_regionkey") + lit(1)) * lit(0.1)).as("east"),
    lit(40.50).as("south"), lit(40.90).as("north"))

  test("cell-decomposed containment join equals the nested-loop join exactly") {
    val nested = points.join(zones,
        col("lng") >= col("west") && col("lng") < col("east") &&
        col("lat") >= col("south") && col("lat") < col("north"))
      .select("event_id", "zone")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val cells = RangeJoin.pointInBox(points, zones, "lng", "lat")
      .select("event_id", "zone")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cells == nested)
    assert(cells.nonEmpty)
  }

  test("the cell join plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInBox(points, zones, "lng", "lat")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must not plan a nested loop:\n$plan")
    assert(plan.contains("_cx") && plan.contains("_cy"), "join keys must be the cell indices")
  }

  test("boxes straddling many cells and points on cell boundaries stay exact") {
    import spark.implicits._
    // one big box covering everything, one sliver, a boundary point
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.05, 0.05), (3L, 0.049999, 0.1), (4L, -0.2, 0.3))
      .toDF("pid", "lng", "lat")
    val boxes = Seq(("big", -1.0, 1.0, -1.0, 1.0), ("sliver", 0.04, 0.05, 0.0, 0.2))
      .toDF("name", "west", "east", "south", "north")
    val got = RangeJoin.pointInBox(pts, boxes, "lng", "lat")
      .select("pid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set((1L, "big"), (2L, "big"), (3L, "big"), (4L, "big"), (3L, "sliver"))
    assert(got == expected)
  }

  test("sliver box straddling a cell edge catches points between edge and hi") {
    import spark.implicits._
    // cellDeg = 0.05; box hi sits 1e-13 above the 0.05 cell edge; the point
    // at exactly 0.05 is in [west, east) but hashes to the NEXT cell — the
    // nudge-based upper bound missed it (ADVICE r2)
    val pts = Seq((1L, 0.05, 0.01), (2L, 0.0500000000002, 0.01)).toDF("pid", "lng", "lat")
    val boxes = Seq(("straddle", 0.0499999, 0.0500000000001, 0.0, 0.1))
      .toDF("name", "west", "east", "south", "north")
    val got = RangeJoin.pointInBox(pts, boxes, "lng", "lat")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"point at the edge must match the straddling sliver, got $got")
  }

  // --- pointInZones: the past-broadcast multipolygon path -----------------

  /** A zone dim in the exact etl_zone_multi ring shape (main hexagon +
    * satellite diamond), but at a cardinality no broadcast should carry —
    * the census-blocks regime. Zones are laid out disjoint on a 50-wide
    * grid. */
  private def bigZones(n: Int) = {
    val cx = (lit(-74.25) + (col("id") % 50).cast("double") * lit(0.02) + lit(0.01))
    val cy = (lit(40.50) + floor(col("id") / 50).cast("double") * lit(0.012) + lit(0.004))
    val rx = lit(0.006); val ry = lit(0.003); val sy = cy - ry - lit(0.002)
    spark.range(n).select(col("id").as("zone_id"),
      array(
        array(cx + rx, cy, cx + rx / 2, cy + ry, cx - rx / 2, cy + ry,
          cx - rx, cy, cx - rx / 2, cy - ry, cx + rx / 2, cy - ry),
        array(cx + rx / 2, sy, cx, sy + lit(0.001), cx - rx / 2, sy,
          cx, sy - lit(0.001))).as("rings"))
  }

  private def manyPoints(n: Int) =
    spark.range(n).select(col("id").as("pid"),
      (lit(-74.25) + (col("id") % 200).cast("double") * lit(0.005)).as("lng"),
      (lit(40.50) + floor(col("id") / 200).cast("double") * lit(0.0019)).as("lat"))

  test("pointInZones equals the broadcast multipolygon join on a large zone dim") {
    graft.geo.GeoFunctions.register(spark)
    val zs = bigZones(2000)
    val pts = manyPoints(5000)
    val viaBroadcast = pts.join(broadcast(zs),
        graft.geo.GeoFunctions.pointInMultiPoly(col("lng"), col("lat"), col("rings")))
      .select("pid", "zone_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCells = RangeJoin.pointInZones(pts, zs, "lng", "lat")
      .select("pid", "zone_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCells == viaBroadcast,
      s"missing=${viaBroadcast -- viaCells} extra=${viaCells -- viaBroadcast}")
    assert(viaCells.nonEmpty, "the synthetic layout must produce assignments")
  }

  test("pointInZones plans as a cell equi-join with the exact residual, no NLJ") {
    val plan = RangeJoin.pointInZones(manyPoints(5000), bigZones(2000), "lng", "lat")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must not plan a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("_cx") && plan.contains("_cy"), "join keys must be the cell indices")
    assert(plan.contains("point_in_multipolygon"),
      "the exact ray cast must remain as the residual predicate")
  }

  test("pointInZones stays exact for points on cell edges and empty-ring zones") {
    import spark.implicits._
    // square zone [0, 0.08]²: contains the cell-edge point (0.05, 0.05)
    // (cellDeg = 0.05 puts it in the next cell) and not (0.09, 0.01)
    val zs = Seq((1L, Seq(Seq(0.0, 0.0, 0.08, 0.0, 0.08, 0.08, 0.0, 0.08)),
        "square"),
      (2L, Seq.empty[Seq[Double]], "empty"))
      .toDF("zone_id", "rings", "name")
      .select(col("zone_id"), col("rings").cast("array<array<double>>"), col("name"))
    val pts = Seq((1L, 0.05, 0.05), (2L, 0.09, 0.01), (3L, 0.01, 0.01))
      .toDF("pid", "lng", "lat")
    val got = RangeJoin.pointInZones(pts, zs, "lng", "lat")
      .select("pid", "zone_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (3L, 1L)), s"got $got")
  }

  test("tiny cellDeg with a wide zone yields no duplicate matches (no key fold collision)") {
    import spark.implicits._
    // at cellDeg = 1e-3 this zone's bbox spans >2000 lat cells; a folded
    // composite cell id (cx * stride + cy) would collide across rows and
    // duplicate (point, zone) matches — the pair join must emit each once
    val zs = Seq((1L, Seq(Seq(0.0, 0.0, 3.0, 0.0, 3.0, 3.0, 0.0, 3.0))))
      .toDF("zone_id", "rings")
      .select(col("zone_id"), col("rings").cast("array<array<double>>"))
    val pts = Seq((1L, 1.5, 1.5), (2L, 2.9, 0.1), (3L, 3.5, 1.0))
      .toDF("pid", "lng", "lat")
    val got = RangeJoin.pointInZones(pts, zs, "lng", "lat", cellDeg = 1e-3)
      .select("pid", "zone_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == Seq((1L, 1L), (2L, 1L)), s"got $got")
  }

  test("degenerate boxes (hi <= lo) yield empty results, not a runtime error") {
    import spark.implicits._
    val pts = Seq((1L, 0.5, 0.5)).toDF("pid", "lng", "lat")
    val boxes = Seq(
      ("inverted", 1.0, 0.0, 0.0, 1.0),  // east <= west
      ("flat", 0.0, 1.0, 0.5, 0.5),      // north <= south
      ("ok", 0.0, 1.0, 0.0, 1.0))
      .toDF("name", "west", "east", "south", "north")
    val got = RangeJoin.pointInBox(pts, boxes, "lng", "lat")
      .select("pid", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "ok")))
  }
}
