package graft.geo

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("scalar haversine matches known distances") {
    // ~1 degree of latitude ≈ 111.2 km on this sphere
    val d = GeoFunctions.haversineMeters(40.0, -74.0, 41.0, -74.0)
    assert(math.abs(d - 111229) < 200, s"got $d")
    assert(GeoFunctions.haversineMeters(40.5, -74.0, 40.5, -74.0) == 0.0)
  }

  test("codegen expression equals composed-builtin formula on real data") {
    GeoFunctions.register(spark)
    val df = (0L until 1000L).toDF("id").select(
      (lit(40.0) + col("id") % 97 / 100.0).as("lat1"), (lit(-74.2) + col("id") % 89 / 100.0).as("lng1"),
      (lit(40.3) + col("id") % 83 / 100.0).as("lat2"), (lit(-73.9) + col("id") % 79 / 100.0).as("lng2"))
    val cmp = df.select(
      GeoFunctions.haversineM(col("lat1"), col("lng1"), col("lat2"), col("lng2")).as("custom"),
      GeoFunctions.haversineComposed(col("lat1"), col("lng1"), col("lat2"), col("lng2")).as("composed"))
      .filter(abs(col("custom") - col("composed")) > 1e-9)
    assert(cmp.count() == 0)
  }

  test("expression is null-safe") {
    GeoFunctions.register(spark)
    val r = Seq((Option.empty[Double], 1.0)).toDF("a", "b")
      .select(GeoFunctions.haversineM(col("a"), col("b"), col("b"), col("b")))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("ray-cast point-in-polygon: unit-square cases, scalar and expression agree") {
    GeoFunctions.register(spark)
    // unit square (0,0)-(1,1)
    val sq = Seq(1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0)
    def mk(xs: Seq[Double]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
    assert(GeoFunctions.pointInPolygon(0.5, 0.5, mk(sq)))
    assert(!GeoFunctions.pointInPolygon(1.5, 0.5, mk(sq)))
    assert(!GeoFunctions.pointInPolygon(-0.1, 0.5, mk(sq)))
    assert(!GeoFunctions.pointInPolygon(0.5, 1.5, mk(sq)))
    // concave L-shape: (0,0)-(2,0)-(2,1)-(1,1)-(1,2)-(0,2); (1.5,1.5) is outside
    val ell = Seq(0.0, 0.0, 2.0, 0.0, 2.0, 1.0, 1.0, 1.0, 1.0, 2.0, 0.0, 2.0)
    assert(GeoFunctions.pointInPolygon(0.5, 0.5, mk(ell)))
    assert(GeoFunctions.pointInPolygon(1.5, 0.5, mk(ell)))
    assert(GeoFunctions.pointInPolygon(0.5, 1.5, mk(ell)))
    assert(!GeoFunctions.pointInPolygon(1.5, 1.5, mk(ell)))
    // expression path (codegen) agrees with the static scalar on a grid
    val pts = (0 until 400).map(i => (i % 20 * 0.13 - 0.2, i / 20 * 0.13 - 0.2))
    val df = pts.toDF("x", "y").select(col("x"), col("y"),
      GeoFunctions.pointInPoly(col("x"), col("y"),
        array(ell.map(lit): _*)).as("in_poly"))
    df.collect().foreach { r =>
      assert(r.getBoolean(2) ==
        GeoFunctions.pointInPolygon(r.getDouble(0), r.getDouble(1), mk(ell)),
        s"(${r.getDouble(0)}, ${r.getDouble(1)})")
    }
  }

  test("multipolygon containment: OR over rings, scalar and expression agree") {
    GeoFunctions.register(spark)
    def mk(xs: Seq[Double]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
    def mkRings(rs: Seq[Seq[Double]]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rs.map(mk).toArray[Any])
    // two disjoint unit squares: (0,0)-(1,1) and (2,0)-(3,1)
    val r1 = Seq(1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0)
    val r2 = Seq(3.0, 0.0, 3.0, 1.0, 2.0, 1.0, 2.0, 0.0)
    val rings = mkRings(Seq(r1, r2))
    assert(GeoFunctions.pointInMultiPolygon(0.5, 0.5, rings), "main ring hit")
    assert(GeoFunctions.pointInMultiPolygon(2.5, 0.5, rings), "satellite ring hit")
    assert(!GeoFunctions.pointInMultiPolygon(1.5, 0.5, rings), "gap between rings")
    assert(!GeoFunctions.pointInMultiPolygon(3.5, 0.5, rings))
    assert(!GeoFunctions.pointInMultiPolygon(0.5, 0.5, mkRings(Nil)), "empty multipolygon")
    // expression path (codegen) agrees with the static scalar on a grid
    val ringsCol = array(array(r1.map(lit): _*), array(r2.map(lit): _*))
    val pts = (0 until 400).map(i => (i % 20 * 0.21 - 0.2, i / 20 * 0.11 - 0.2))
    pts.toDF("x", "y")
      .select(col("x"), col("y"), GeoFunctions.pointInMultiPoly(col("x"), col("y"), ringsCol))
      .collect().foreach { r =>
        assert(r.getBoolean(2) ==
          GeoFunctions.pointInMultiPolygon(r.getDouble(0), r.getDouble(1), rings),
          s"(${r.getDouble(0)}, ${r.getDouble(1)})")
      }
  }

  test("zone_multi assigns via satellite rings too (multipolygon semantics live)") {
    val df = graft.etl.EtlQueries.zoneMulti(spark, graft.TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // at least one event must land in some zone across the 8 dims
    assert(rows.exists(r => (1 to 8).exists(!r.isNullAt(_))))
  }

  test("zone-polygon query: broadcast + ray-cast, fact side never shuffles") {
    val p = graft.etl.EtlQueries.zonePolygon(spark, graft.TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"zone dim must broadcast:\n$p")
    assert(p.contains("point_in_polygon"), "exact ray-cast must be in the join predicate")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle (only the output-sort range exchange is allowed):\n$p")
  }
}
