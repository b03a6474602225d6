package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** #17b Data-quality audit report (SURVEY.md §2).
  *
  * The reference runs data-quality repair as scattered one-off scripts
  * (null-geometry backfill `fixnullgeom/`, tally mismatch `fixtallies/`,
  * late-arrival audit `backlog/`); a warehouse wants the CHECKS as one
  * standing report the scheduler alerts on. Each row is one named check
  * with its violation count and the scanned population — the shape a DQ
  * dashboard ingests directly.
  *
  * Checks cover the three DQ families: completeness (nulls), validity
  * (domain ranges), and referential integrity (orphaned foreign keys —
  * the classic fact→dim anti-join). Every check is a map-side-combinable
  * conditional aggregate over ONE scan of its table; the two referential
  * checks are anti-join shapes where the dim side ships as a broadcast
  * (or at true scale, the `etl_ingest_bloom` sketch path). The final
  * report is a union of per-check single rows — constant size however
  * large the inputs.
  */
object DqReport {

  def dqReport(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // completeness + validity over one events scan
    val evChecks = ev.agg(
      count(lit(1)).as("n"),
      sum(when(col("props").isNull || col("props") === "", 1L).otherwise(0L)).as("null_props"),
      sum(when(col("value") < 0.0 || col("value").isNull, 1L).otherwise(0L)).as("bad_value"),
      sum(when(col("user_id").isNull || col("user_id") < 0L, 1L).otherwise(0L)).as("bad_user"))
    val evRows = evChecks.select(explode(array(
      struct(lit("events").as("tbl"), lit("null_props").as("check"),
        col("null_props").as("violations"), col("n").as("population")),
      struct(lit("events").as("tbl"), lit("negative_or_null_value").as("check"),
        col("bad_value").as("violations"), col("n").as("population")),
      struct(lit("events").as("tbl"), lit("bad_user_id").as("check"),
        col("bad_user").as("violations"), col("n").as("population")))).as("r"))
      .select(col("r.*"))
    // uniqueness: duplicated event ids (two-level aggregate, no distinct expand)
    val dupIds = ev.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1L, col("c"))), lit(0L)).as("violations"),
        coalesce(sum(col("c")), lit(0L)).as("population"))
      .select(lit("events").as("tbl"), lit("duplicate_event_id").as("check"),
        col("violations"), col("population"))
    // referential integrity: facts whose FK misses the dim — a broadcast
    // LEFT join + one conditional aggregate gives violations AND the
    // population in a single fact pass (an anti-join would need a second
    // pass, or a 1×1 cross join, for the denominator)
    def orphanCheck(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
        tbl: String, name: String): DataFrame =
      fact.select(col(fk))
        .join(broadcast(dim.select(col(pk)).distinct()), col(fk) === col(pk), "left")
        .agg(sum(when(col(pk).isNull, 1L).otherwise(0L)).as("violations"),
          count(lit(1)).as("population"))
        .select(lit(tbl).as("tbl"), lit(name).as("check"),
          coalesce(col("violations"), lit(0L)).as("violations"), col("population"))
    val liOrphans = orphanCheck(Tables.lineitem(s, dir), "l_orderkey",
      Tables.orders(s, dir), "o_orderkey", "lineitem", "orphan_orderkey")
    val ordOrphans = orphanCheck(Tables.orders(s, dir), "o_custkey",
      Tables.customer(s, dir), "c_custkey", "orders", "orphan_custkey")
    evRows.unionByName(dupIds).unionByName(liOrphans).unionByName(ordOrphans)
      .orderBy(col("tbl"), col("check"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_dq_report" -> (dqReport _))

  val oracles: Map[String, String] = Map(
    "etl_dq_report" ->
      """WITH ev AS (
        | SELECT 'events' AS tbl, 'null_props' AS chk,
        |  sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)::BIGINT AS violations,
        |  count(*)::BIGINT AS population FROM events
        | UNION ALL
        | SELECT 'events', 'negative_or_null_value',
        |  sum(CASE WHEN value < 0.0 OR value IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(*)::BIGINT FROM events
        | UNION ALL
        | SELECT 'events', 'bad_user_id',
        |  sum(CASE WHEN user_id IS NULL OR user_id < 0 THEN 1 ELSE 0 END)::BIGINT,
        |  count(*)::BIGINT FROM events
        | UNION ALL
        | SELECT 'events', 'duplicate_event_id',
        |  coalesce((SELECT sum(c) FROM (SELECT count(*) AS c FROM events
        |    GROUP BY event_id HAVING count(*) > 1)), 0)::BIGINT,
        |  count(*)::BIGINT FROM events
        | UNION ALL
        | SELECT 'lineitem', 'orphan_orderkey',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders))::BIGINT,
        |  (SELECT count(*) FROM lineitem)::BIGINT
        | UNION ALL
        | SELECT 'orders', 'orphan_custkey',
        |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer))::BIGINT,
        |  (SELECT count(*) FROM orders)::BIGINT)
        |SELECT tbl, chk AS "check", violations, population
        |FROM ev ORDER BY tbl, chk""".stripMargin)
}
