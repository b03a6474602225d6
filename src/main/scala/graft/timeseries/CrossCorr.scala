package graft.timeseries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** #34k `ts_cross_corr` — lead-lag cross-correlation between event-type
  * pairs (SURVEY.md §2).
  *
  * The "does stream A predict stream B tomorrow?" detector: `stats_corr`
  * answers only the same-day question, `ts_autocorr` only the
  * self-periodicity one — the cross-correlation function at lags
  * −[[MaxLag]]..+[[MaxLag]] is what finds the pipeline-latency /
  * cause-effect offset between two feeds (a positive peak lag means
  * type_a leads type_b by that many days). Per pair the peak row — max
  * |r|, ties to the smallest then most-negative lag, a total order — is
  * flagged so a dashboard reads one row per pair.
  *
  * Determinism contract (`stats_corr` verbatim): whole-unit BIGINT daily
  * values, five exact integer moment sums per (pair, lag) — order-
  * independent under any partitioning — one fixed-form IEEE Pearson at the
  * end, and peak selection on the ROUNDED statistic through a total order.
  *
  * Scale posture: one fact pass → the |types × days| daily aggregate
  * (cached: both join sides read it); the lag explode multiplies the
  * AGGREGATE ×(2·MaxLag+1), never facts; the pair join keys on
  * (event_type, day) — uniform by construction; the peak window partitions
  * by pair over ≤ 2·MaxLag+1 rows. */
object CrossCorr {

  val MaxLag = 7L
  val MinPairs = 8L

  def crossCorr(s: SparkSession, dir: String): DataFrame = {
    // persist: both sides of the lagged pair join read the same daily aggregate
    val d = graft.CacheRegistry.track(
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(round(sum(col("value"))).cast("long").as("vi"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("ed"), col("vi")))
    val a = d.select(col("event_type").as("type_a"), col("ed"), col("vi").as("va"))
    val b = d.select(col("event_type").as("type_b"), col("ed").as("bed"), col("vi").as("vb"))
      .withColumn("lag", explode(sequence(lit(-MaxLag), lit(MaxLag))))
      .withColumn("ed", col("bed") - col("lag"))
    val m = a.join(b, Seq("ed")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("va")).as("sa"), sum(col("vb")).as("sb"),
        sum(col("va") * col("vb")).as("sab"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"))
    val n = col("n_days")
    val num = (n * col("sab") - col("sa") * col("sb")).cast("double")
    val varA = (n * col("saa") - col("sa") * col("sa")).cast("double")
    val varB = (n * col("sbb") - col("sb") * col("sb")).cast("double")
    val scored = m.filter(n >= MinPairs)
      .select(col("type_a"), col("type_b"), col("lag"), n,
        when(varA > 0 && varB > 0,
          round(num / sqrt(varA) / sqrt(varB), 4)).as("ccf"))
    val peak = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(coalesce(abs(col("ccf")), lit(-1.0)).desc, abs(col("lag")), col("lag"))
    scored
      .withColumn("is_peak", row_number().over(peak) === 1)
      .orderBy(col("type_a"), col("type_b"), col("lag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_cross_corr" -> (crossCorr _))

  val oracles: Map[String, String] = Map(
    "ts_cross_corr" ->
      s"""WITH d AS (SELECT event_type, (ts::DATE - DATE '1970-01-01') AS ed,
         |  CAST(round(sum(value)) AS BIGINT) AS vi
         | FROM events GROUP BY event_type, ts::DATE),
         |l AS (SELECT unnest(range(-$MaxLag, ${MaxLag + 1})) AS lag),
         |m AS (SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         |  count(*)::BIGINT AS n_days,
         |  sum(a.vi)::BIGINT AS sa, sum(b.vi)::BIGINT AS sb,
         |  sum(a.vi * b.vi)::BIGINT AS sab,
         |  sum(a.vi * a.vi)::BIGINT AS saa, sum(b.vi * b.vi)::BIGINT AS sbb
         | FROM d a, l, d b
         | WHERE a.event_type < b.event_type AND b.ed = a.ed + l.lag
         | GROUP BY 1, 2, 3),
         |sc AS (SELECT type_a, type_b, lag, n_days,
         |  CASE WHEN (n_days * saa - sa * sa) > 0 AND (n_days * sbb - sb * sb) > 0
         |   THEN round((n_days * sab - sa * sb)::DOUBLE
         |     / sqrt((n_days * saa - sa * sa)::DOUBLE)
         |     / sqrt((n_days * sbb - sb * sb)::DOUBLE), 4) END AS ccf
         | FROM m WHERE n_days >= $MinPairs)
         |SELECT type_a, type_b, lag, n_days, ccf,
         | row_number() OVER (PARTITION BY type_a, type_b
         |   ORDER BY coalesce(abs(ccf), -1) DESC, abs(lag), lag) = 1 AS is_peak
         |FROM sc ORDER BY type_a, type_b, lag""".stripMargin)
}
