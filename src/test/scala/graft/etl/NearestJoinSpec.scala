package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.RangeJoin

class NearestJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("cell-decomposed snap equals the brute-force nearest join exactly") {
    val crashes = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), Synth.cartoLng(col("event_id")).as("lng"),
        Synth.cartoLat(col("event_id")).as("lat"))
      .filter(col("lng").isNotNull)
    val k = col("p_partkey")
    val ix = Tables.part(spark, TestSpark.sf).filter(k < 1600)
      .select(k.as("intersection_id"),
        (lit(-74.25) + (k % 40) * lit(0.0125) + lit(0.00625)).as("ilng"),
        (lit(40.50) + (k / lit(40)).cast("long") % 40 * lit(0.01) + lit(0.005)).as("ilat"))

    // brute force: unrestricted cross product, same exact metric + argmin
    val dlat = col("lat") - col("ilat")
    val dlon = (col("lng") - col("ilng")) * lit(NearestJoin.LngScale)
    val w = Window.partitionBy(col("event_id")).orderBy(col("d2"), col("intersection_id"))
    val brute = crashes.crossJoin(ix)
      .withColumn("d2", dlat * dlat + dlon * dlon)
      .filter(col("d2") <= NearestJoin.R2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "intersection_id", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val snapped = NearestJoin.nearestIntersection(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(snapped == brute)
    assert(snapped.nonEmpty)
    // k=1: one row per crash
    assert(snapped.size == snapped.map(_._1).size)
  }

  test("out-of-range points drop; every emitted distance is within the radius") {
    val out = NearestJoin.nearestIntersection(spark, TestSpark.sf)
    val ds = out.select("d2").collect().map(_.getDouble(0))
    assert(ds.forall(_ <= NearestJoin.R2))
    // null-island rows (id % 97 == 0, at (0,0)) are geocoded but nowhere
    // near the grid — they must be absent, not snapped to something 40° away
    val ids = out.select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(id => id % 97 != 0 || id % 19 == 0))
  }

  test("snap plans as a cell equi-join — no nested loop, no cartesian") {
    val plan = NearestJoin.nearestIntersection(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"must stay an equi-join:\n$plan")
    assert(plan.contains("_cx") && plan.contains("_cy"), "join keys must be the cell indices")
  }

  test("equidistant sites break ties to the lowest site key") {
    import spark.implicits._
    // point at lng 2.0 sits exactly midway between sites at 1.0 and 3.0:
    // dlon is ±1.0 (exactly representable), so d2 is bit-equal both ways
    val pts = Seq((10L, 2.0, 0.0)).toDF("pid", "lng", "lat")
    val sites = Seq((7L, 3.0, 0.0), (4L, 1.0, 0.0)).toDF("sid", "slng", "slat")
    val got = RangeJoin.nearestInRadius(pts, sites, "lng", "lat", "slng", "slat",
        "pid", "sid", r2 = 2.0, lngScale = 1.0, cellDeg = 1.0)
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 4L)))
  }

  test("a point inside several radii snaps only to the closest site") {
    import spark.implicits._
    val pts = Seq((1L, 0.30, 0.0)).toDF("pid", "lng", "lat")
    val sites = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.9, 0.0))
      .toDF("sid", "slng", "slat")
    val got = RangeJoin.nearestInRadius(pts, sites, "lng", "lat", "slng", "slat",
        "pid", "sid", r2 = 1.0, lngScale = 1.0, cellDeg = 0.25)
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}
