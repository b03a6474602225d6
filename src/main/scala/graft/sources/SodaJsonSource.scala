package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SODA-style JSON source (the reference's input surface, main.py:79-132).
  *
  * Socrata's SODA API returns JSON arrays of string-typed records — tallies
  * and ids arrive as strings, coordinates may be absent, and five
  * `contributing_factor_vehicle_N` / `vehicle_type_codeN` fields carry
  * comma-separated lists (main.py:135-163, 856-872). This source reads such
  * payloads (files or a mounted API dump) with an explicit schema — never
  * schema inference, which would require an extra pass over 100 TB — and
  * normalizes types the same way `format_soda_response` does.
  *
  * PERMISSIVE mode keeps malformed records in `_corrupt_record` instead of
  * failing the job; the reference's equivalent is its email-alert path.
  */
object SodaJsonSource {

  /** String-typed wire schema, as SODA actually sends it. */
  val wireSchema: StructType = StructType(Seq(
    StructField("collision_id", StringType),
    StructField("crash_date", StringType),
    StructField("crash_time", StringType),
    StructField("latitude", StringType),
    StructField("longitude", StringType),
    StructField("on_street_name", StringType),
    StructField("off_street_name", StringType),
    StructField("cross_street_name", StringType),
    StructField("zip_code", StringType),
    StructField("number_of_motorist_killed", StringType),
    StructField("number_of_motorist_injured", StringType),
    StructField("number_of_cyclist_killed", StringType),
    StructField("number_of_cyclist_injured", StringType),
    StructField("number_of_pedestrians_killed", StringType),
    StructField("number_of_pedestrians_injured", StringType),
    StructField("number_of_persons_killed", StringType),
    StructField("number_of_persons_injured", StringType),
    StructField("contributing_factor_vehicle_1", StringType),
    StructField("contributing_factor_vehicle_2", StringType),
    StructField("vehicle_type_code1", StringType),
    StructField("vehicle_type_code2", StringType),
    StructField("_corrupt_record", StringType)))

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(wireSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Comma-split, trimmed, de-quoted, blank-dropped multi-value fields
    * (format_string_for_postgres_array, main.py:135-163). */
  private def parseList(cols: Seq[org.apache.spark.sql.Column]) =
    filter(
      transform(split(concat_ws(",", cols.map(c => coalesce(c, lit(""))): _*), ","),
        x => regexp_replace(trim(x), "'", "")),
      x => x =!= "")

  /** Typed, normalized crash records (format_soda_response, main.py:185-298):
    * timestamp assembled from date+time, tallies as longs with derived
    * persons totals when absent, nullable coordinates, factor/vehicle
    * arrays. Malformed wire records are excluded (filter on corrupt col). */
  def normalize(raw: DataFrame): DataFrame = {
    def num(c: String) = col(c).cast("long")
    raw
      .filter(col("_corrupt_record").isNull && col("collision_id").isNotNull)
      .select(
        col("collision_id").cast("long").as("socrata_id"),
        to_timestamp(
          concat(substring(col("crash_date"), 1, 10), lit(" "), col("crash_time")),
          "yyyy-MM-dd H:mm").as("date_val"),
        col("latitude").cast("double").as("latitude"),
        col("longitude").cast("double").as("longitude"),
        trim(coalesce(col("on_street_name"), lit(""))).as("on_street_name"),
        trim(coalesce(col("off_street_name"), lit(""))).as("off_street_name"),
        trim(coalesce(col("cross_street_name"), lit(""))).as("cross_street_name"),
        coalesce(col("zip_code"), lit("")).as("zip_code"),
        num("number_of_motorist_killed").as("mk"),
        num("number_of_motorist_injured").as("mi"),
        num("number_of_cyclist_killed").as("ck"),
        num("number_of_cyclist_injured").as("ci"),
        num("number_of_pedestrians_killed").as("pk"),
        num("number_of_pedestrians_injured").as("pi"),
        col("number_of_persons_killed").cast("long").as("tk_raw"),
        col("number_of_persons_injured").cast("long").as("ti_raw"),
        parseList(Seq(col("contributing_factor_vehicle_1"), col("contributing_factor_vehicle_2")))
          .as("contributing_factor"),
        parseList(Seq(col("vehicle_type_code1"), col("vehicle_type_code2")))
          .as("vehicle_type"))
      // main.py:252-255 — rare records lack persons totals; derive from parts
      .withColumn("tk", coalesce(col("tk_raw"), col("mk") + col("ck") + col("pk")))
      .withColumn("ti", coalesce(col("ti_raw"), col("mi") + col("ci") + col("pi")))
      .drop("tk_raw", "ti_raw")
      .withColumn("year", year(col("date_val")).cast("long"))
      .withColumn("month", month(col("date_val")).cast("long"))
  }

  def read(spark: SparkSession, path: String): DataFrame = normalize(readRaw(spark, path))
}
