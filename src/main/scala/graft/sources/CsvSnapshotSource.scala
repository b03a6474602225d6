package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV snapshot source — the reference's bulk-repair input format
  * (findgeomupdates/1a-fetch_carto.py & 1b-fetch_soda.py produce
  * CrashData-CARTO.csv / CrashData-SODA.csv; fixtallies/1-diffs.py consumes
  * similar dumps). Explicit schema (no inference pass), header,
  * PERMISSIVE with a corrupt-record column, and the same geometry-diff
  * convenience the reference's 2-make_diffs_csv.py applies.
  */
object CsvSnapshotSource {

  val schema: StructType = StructType(Seq(
    StructField("socrata_id", LongType),
    StructField("date_val", TimestampType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("_corrupt_record", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .filter(col("_corrupt_record").isNull && col("socrata_id").isNotNull)
      .drop("_corrupt_record")

  /** The diffs step (findgeomupdates/2-make_diffs_csv.py): records whose
    * position moved ≥ `thresholdMeters` between two snapshots, or that
    * gained a geometry. */
  def geomDiffs(oldSnap: DataFrame, newSnap: DataFrame,
      thresholdMeters: Double = 15.0): DataFrame = {
    val o = oldSnap.select(col("socrata_id"),
      col("longitude").as("old_lng"), col("latitude").as("old_lat"))
    val n = newSnap.select(col("socrata_id"),
      col("longitude").as("new_lng"), col("latitude").as("new_lat"))
    val spark = oldSnap.sparkSession
    graft.geo.GeoFunctions.register(spark)
    o.join(n, "socrata_id")
      .filter(col("new_lng").isNotNull && col("new_lat").isNotNull)
      .withColumn("reason",
        when(col("old_lng").isNull, lit("geocoded"))
          .when(graft.geo.GeoFunctions.haversineM(
            col("old_lat"), col("old_lng"), col("new_lat"), col("new_lng")) >= thresholdMeters,
            lit("moved"))
          .otherwise(lit(null).cast("string")))
      .filter(col("reason").isNotNull)
      .select("socrata_id", "new_lng", "new_lat", "reason")
  }
}
