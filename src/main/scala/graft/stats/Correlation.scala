package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** #35e Cross-series Pearson correlation (SURVEY.md §2).
  *
  * Which event streams move together day to day — the screening matrix
  * behind every "metric A predicts metric B" dashboard, and the
  * multivariate companion to `ts_anomaly`'s univariate z (the reference
  * eyeballs exactly this relationship between injury and fatality tallies
  * across zones). Emits every type pair's sample correlation and
  * covariance over the days BOTH series observed.
  *
  * Determinism contract (the checklist pattern): daily values are rounded
  * to whole units and carried as BIGINT, all five moment sums (Σa, Σb,
  * Σab, Σa², Σb²) are exact integer window-free aggregates — order-
  * independent under any partitioning — and the final Pearson/covariance
  * arithmetic is one fixed-form IEEE expression over those exact
  * integers, written identically in both engines. Fixed-point range: with
  * daily unit values < 10^6 and < 10^4 observed days, n·Σab < 10^19 ≈
  * 2^63 — the scale/range trade is declared, not accidental.
  *
  * Scale posture: one fact pass → |types × days| aggregate; the pair
  * self-join runs on the aggregate (≤ |types|² · days rows), never on
  * facts; the pair groupBy is map-side combinable. */
object Correlation {

  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("value"))).cast("long").as("vi"))
    // persist: both sides of the pair join read the same daily aggregate
    val d = graft.CacheRegistry.track(daily)
    val a = d.select(col("event_type").as("type_a"), col("day"), col("vi").as("va"))
    val b = d.select(col("event_type").as("type_b"), col("day"), col("vi").as("vb"))
    val m = a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("va")).as("sa"), sum(col("vb")).as("sb"),
        sum(col("va") * col("vb")).as("sab"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"))
    val n = col("n_days")
    val covNum = (n * col("sab") - col("sa") * col("sb")).cast("double")
    val varA = (n * col("saa") - col("sa") * col("sa")).cast("double")
    val varB = (n * col("sbb") - col("sb") * col("sb")).cast("double")
    m.filter(n >= 2)
      .select(col("type_a"), col("type_b"), n,
        round(covNum / n / (n - 1), 4).as("cov"),
        when(varA > 0 && varB > 0,
          round(covNum / sqrt(varA) / sqrt(varB), 4)).as("pearson"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_corr" -> (corrMatrix _))

  val oracles: Map[String, String] = Map(
    "stats_corr" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day,
        |  CAST(round(sum(value)) AS BIGINT) AS vi
        | FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_days,
        |  sum(a.vi) AS sa, sum(b.vi) AS sb, sum(a.vi * b.vi) AS sab,
        |  sum(a.vi * a.vi) AS saa, sum(b.vi * b.vi) AS sbb
        | FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, n_days,
        | round((n_days * sab - sa * sb)::DOUBLE / n_days / (n_days - 1), 4) AS cov,
        | CASE WHEN (n_days * saa - sa * sa) > 0 AND (n_days * sbb - sb * sb) > 0
        |  THEN round((n_days * sab - sa * sb)::DOUBLE
        |    / sqrt((n_days * saa - sa * sa)::DOUBLE)
        |    / sqrt((n_days * sbb - sb * sb)::DOUBLE), 4) END AS pearson
        |FROM p WHERE n_days >= 2
        |ORDER BY type_a, type_b""".stripMargin)
}
