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

    // zone containment (update_borough et al, main.py:408-533): the fast
    // box zone plus ALL 8 multipolygon zone dims — the reference's real
    // daily breadth — each a broadcast ride on the same single fact scan
    val zones = Tables.region(s, dir).select(
      col("r_name").as("zone"),
      (lit(-74.25) + col("r_regionkey") * lit(0.1)).as("west"),
      (lit(-74.25) + (col("r_regionkey") + lit(1)) * lit(0.1)).as("east"))
    val zoned = EtlQueries.withMultiZones(s, dir,
      base.join(broadcast(zones),
        col("lng") >= col("west") && col("lng") < col("east") &&
          col("lat") >= lit(40.50) && col("lat") < lit(40.90), "left")
        .drop("west", "east"))

    // vehicle crosswalk flags (update_hasvehicle, main.py:1082-1102): the
    // per-class alias lists are driver-collected constants, so every flag is
    // a map-side arrays_overlap — the fact side is never exchanged (the
    // previous formulation broadcast-NLJ'd an alias dim and re-collapsed
    // with a groupBy over a ~20-column composite key: a full fact shuffle)
    val flagged = EtlQueries.withCrosswalkFlags(s,
      zoned.withColumn("vehicles", vehicleArr(id)))

    // blame allocation (update_blame_allocations, main.py:650-790): the full
    // 8-mode × 4-victim × {injured,killed} matrix, all in-projection
    EtlQueries.withAllocations(EtlQueries.withBlame(flagged))
      .withColumn("blame_factor", round(col("blame_factor_raw"), 4))
      .drop("blame_factor_raw")
  }
}
