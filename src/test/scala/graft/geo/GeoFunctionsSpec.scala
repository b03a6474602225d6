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
}
