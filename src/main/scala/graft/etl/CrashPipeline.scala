package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Synth._

/** The reference's whole daily run (main.py:1132-1197) as ONE composable
  * batch plan instead of a sequence of warehouse UPDATEs:
  *
  *   normalize → bbox-filter geometry → zone containment join → vehicle
  *   crosswalk flags → blame allocation — producing the fully-enriched
  *   crash table the CARTO warehouse converges to after the reference's
  *   batch jobs all complete.
  *
  * Because it is one declarative plan, Catalyst fuses the stages: the fact
  * table is scanned once, every enrichment is a broadcast against it, and
  * the 8 sequential UPDATE passes of the reference (each a full table write)
  * collapse into zero intermediate materializations.
  */
object CrashPipeline {

  def enrichedCrashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val id = col("event_id")

    // normalize + geometry hygiene (filter_carto_data, main.py:378-405)
    val lngRaw = cartoLng(id)
    val latRaw = cartoLat(id)
    val outside = lngRaw.isNotNull && !inExtent(lngRaw, latRaw)
    val base = Tables.events(s, dir).select(
      id, col("ts"),
      year(col("ts")).cast("long").as("year"), month(col("ts")).cast("long").as("month"),
      col("event_type"),
      mk(id).as("mk"), mi(id).as("mi"), ck(id).as("ck"), ci(id).as("ci"),
      pk(id).as("pk"), Synth.pi(id).as("pi"), tk(id).as("tk"), ti(id).as("ti"),
      when(outside, lit(null).cast("double")).otherwise(lngRaw).as("lng"),
      when(outside, lit(null).cast("double")).otherwise(latRaw).as("lat"))

    // zone containment (update_borough et al, main.py:408-533)
    val zones = Tables.region(s, dir).select(
      col("r_name").as("zone"),
      (lit(-74.25) + col("r_regionkey") * lit(0.1)).as("west"),
      (lit(-74.25) + (col("r_regionkey") + lit(1)) * lit(0.1)).as("east"))
    val zoned = base.join(broadcast(zones),
      col("lng") >= col("west") && col("lng") < col("east") &&
        col("lat") >= lit(40.50) && col("lat") < lit(40.90), "left")
      .drop("west", "east")

    // vehicle crosswalk flags (update_hasvehicle, main.py:1082-1102)
    val vehicles = filter(array(col("event_type"),
      when(id % 4 === 0, lit("click")).when(id % 4 === 1, lit("purchase")).otherwise(lit(""))),
      x => x =!= "")
    val cw = Seq(
      ("POINTER", "click"), ("POINTER", "view"),
      ("CONVERT", "purchase"), ("CONVERT", "signup"),
      ("FAIL", "error")).toDF("cls", "alias")
    val flagged = zoned.withColumn("vehicles", vehicles)
      .join(broadcast(cw), array_contains(col("vehicles"), col("alias")), "left")
      .groupBy(zoned.columns.map(col) :+ col("vehicles"): _*)
      .agg(
        coalesce(max(when(col("cls") === "POINTER", lit(true))), lit(false)).as("has_pointer"),
        coalesce(max(when(col("cls") === "CONVERT", lit(true))), lit(false)).as("has_convert"),
        coalesce(max(when(col("cls") === "FAIL", lit(true))), lit(false)).as("has_fail"))

    // blame allocation (update_blame_allocations, main.py:650-790)
    flagged
      .withColumn("has_other", !(col("has_pointer") || col("has_convert") || col("has_fail")))
      .withColumn("bike_blame", col("has_pointer") && !col("has_convert") && !col("has_fail"))
      .withColumn("blame_factor",
        when(col("bike_blame"), lit(1.0) / col("has_pointer").cast("int"))
          .otherwise(lit(1.0) / nullif(
            col("has_convert").cast("int") + col("has_fail").cast("int") + col("has_other").cast("int"),
            lit(0))))
      .withColumn("injured_allocated", round(col("blame_factor") * col("ti"), 4))
      .withColumn("killed_allocated", round(col("blame_factor") * col("tk"), 4))
  }
}
