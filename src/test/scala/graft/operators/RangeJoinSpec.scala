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
    assert(plan.contains("_cell"), "join key must be the cell id")
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
