package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-analytics sketches — the operators that replace their exact
  * twins at 100 TB, where countDistinct is a full shuffle of every key and
  * an exact percentile is a global sort. Both sketches here are map-side
  * mergeable (HLL++ registers, Greenwald-Khanna summaries), so the plan is
  * one partial-agg pass regardless of cardinality.
  *
  * The query emits the approximate and exact answers side by side: the
  * driver does a rows-only check (approximation is engine-specific, so no
  * DuckDB hash parity), and SketchSpec pins the error envelope — HLL++ at
  * rsd=0.02 and the quantile sketch at accuracy=1000 must land within 5%
  * of exact on the test distributions.
  */
object SketchQueries {

  def approxReport(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("approx_p95"),
        expr("percentile(value, 0.95)").as("exact_p95"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("event_type"))
  }

  /** The sketch columns alone — the production shape. Without the exact
    * twins the whole aggregation is one partial-agg pass with a single
    * exchange; the exact countDistinct in `approxReport` is what forces
    * Spark's two-phase distinct expansion (a second full shuffle). The
    * pair of plans is the scale argument, and SketchSpec pins both. */
  def sketchOnly(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("approx_p95"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("event_type"))
  }

  /** Fixed-width histogram per type: bin = floor(value / width), the exact
    * distribution report behind dashboards and skew diagnostics. Pure
    * integer bin arithmetic (no quantile estimation), one map-side
    * combinable groupBy — the 100 TB plan is identical. */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.events(s, dir)
      .select(col("event_type"), floor(col("value") / 50.0).cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", (col("bin") * 50.0))
      .select("event_type", "bin", "bin_lo", "n")
      .orderBy(col("event_type"), col("bin"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_approx"    -> (approxReport _),
    "stats_histogram" -> (histogram _))

  val oracles: Map[String, String] = Map(
    "stats_histogram" ->
      """SELECT event_type, floor(value / 50.0)::BIGINT AS bin,
        | (floor(value / 50.0) * 50.0) AS bin_lo, count(*) AS n
        |FROM events GROUP BY 1, 2, 3 ORDER BY event_type, bin""".stripMargin)
}
