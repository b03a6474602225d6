package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Compaction, ZOrder}
import graft.sources.WarehouseSink

/** The reference's whole daily run (main.py:1132-1197) composed ON DISK —
  * not the per-piece specs (CrashPipelineSpec, SourcesSpec, ZOrderSpec,
  * CompactionSpec) but the chain a production night actually executes:
  *
  *   enrich → warehouse merge → z-order layout → compaction →
  *   same-day replay (idempotence) → next-day delta merge whose
  *   incremental aggregate equals a full recompute.
  *
  * Every hop is verified by a content fingerprint over the stored table, so
  * a hop that drops, duplicates, or corrupts rows fails here even if each
  * operator is individually green. Runs at sf0.1 — the largest local SF —
  * because composition bugs (partition-type coercion, dynamic-overwrite
  * scope, lineage-to-self-path) only surface with real multi-partition
  * tables.
  */
class DailyRunSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.1"

  private val aggKeys = Seq(col("year"), col("month"), col("event_type"))

  /** Order-insensitive content fingerprint over the identity + the columns
    * every downstream consumer reads (tallies, zone, blame). */
  private def fingerprint(df: DataFrame): (Long, Long) = {
    val r = df
      .select(xxhash64(col("event_id"), col("event_type"), col("ti"), col("tk"),
        col("zone"), col("blame_factor")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head
    (r.getLong(0), r.getLong(1))
  }

  private def injuredByMonth(df: DataFrame): Map[(Long, Long, String), Long] =
    df.groupBy(aggKeys: _*).agg(sum(col("ti")).as("injured"))
      .collect()
      .map(r => (r.getAs[Number]("year").longValue(), r.getAs[Number]("month").longValue(),
        r.getAs[String]("event_type")) -> r.getAs[Long]("injured"))
      .toMap

  test("daily run composes on disk: merge, layout, compaction, replay, incremental delta") {
    val root = Files.createTempDirectory("dailyrun").toString
    val wh = s"$root/crashes"

    // The enriched batch is consumed by many hops below; checkpoint once so
    // the (deliberately heavy) enrichment plan runs a single time.
    val enriched = CrashPipeline.enrichedCrashes(spark, sf).localCheckpoint(true)

    // Day 1: the warehouse copy is the rows the reference's CARTO table
    // holds (the inCarto %10!=3 convention — the %10==3 slice arrives late,
    // tomorrow). First merge == first load.
    val day1 = enriched.filter(col("event_id") % 10 =!= 3)
    val n1 = day1.count()
    WarehouseSink.merge(spark, day1, wh, "event_id")
    val loaded = spark.read.parquet(wh)
    assert(loaded.count() == n1, "first load must conserve the batch")
    assert(loaded.select("event_id").distinct().count() == n1, "keys unique after load")
    val fp0 = fingerprint(loaded)

    // Layout: z-order the warehouse for 2-D box pruning. Row set must be
    // conserved bit-for-bit — layout is never allowed to edit content.
    val zpath = s"$root/crashes_z"
    val cellx = floor((col("lng") + lit(74.25)) / lit(0.5) * lit(1024.0)).cast("long")
    val celly = floor((col("lat") - lit(40.50)) / lit(0.4) * lit(1024.0)).cast("long")
    ZOrder.writeClustered(
      loaded.withColumn("cellx", coalesce(cellx, lit(-1L)))
        .withColumn("celly", coalesce(celly, lit(-1L))),
      "cellx", "celly", 10, files = 8, path = zpath)
    val clustered = spark.read.parquet(zpath)
    assert(fingerprint(clustered) == fp0, "z-order rewrite must conserve content")

    // Compaction: rewrite the warehouse into size-targeted files in place.
    val filesBefore = spark.read.parquet(wh).inputFiles.length
    Compaction.compact(spark, wh, targetRowsPerFile = 500000,
      partitionCols = Seq("year", "month"))
    val compacted = spark.read.parquet(wh)
    assert(compacted.inputFiles.length <= filesBefore,
      "compaction must not increase the file count")
    assert(fingerprint(compacted) == fp0, "compaction must conserve content")

    // Same-day replay: the reference re-runs main() after a partial failure
    // and relies on NOT IN for convergence. Merging the SAME batch again
    // must converge to the same table — row conservation, unique keys,
    // identical fingerprint.
    WarehouseSink.merge(spark, day1, wh, "event_id")
    val replayed = spark.read.parquet(wh)
    assert(replayed.count() == n1, "replay must not grow the table")
    assert(replayed.select("event_id").distinct().count() == n1,
      "replay must not duplicate any event_id")
    assert(fingerprint(replayed) == fp0, "replay must converge to the same table")

    // Day 2: refreshed tallies (%13 rows, ti bumped upstream) plus the
    // late-arriving %10==3 slice. The two slices are disjoint by
    // construction — a changed row is one the warehouse already holds.
    val changed = enriched
      .filter(col("event_id") % 13 === 0 && col("event_id") % 10 =!= 3)
      .withColumn("ti", col("ti") + lit(1L))
    val late = enriched.filter(col("event_id") % 10 === 3)
    val delta = changed.unionByName(late).localCheckpoint(true)

    // Incremental maintenance (the etl_incr_agg shape): old aggregate off
    // the pre-delta warehouse + the delta's net contribution, where net =
    // new tally minus the warehouse's prior copy (0 for inserts).
    val oldAgg = injuredByMonth(replayed)
    val prior = replayed.select(col("event_id"), col("ti").as("old_ti"))
    val deltaNet = delta.join(prior, Seq("event_id"), "left")
      .groupBy(aggKeys: _*)
      .agg(sum(col("ti") - coalesce(col("old_ti"), lit(0L))).as("injured"))
      .collect()
      .map(r => (r.getAs[Number]("year").longValue(), r.getAs[Number]("month").longValue(),
        r.getAs[String]("event_type")) -> r.getAs[Long]("injured"))
      .toMap
    val incremental = (oldAgg.keySet ++ deltaNet.keySet).map { k =>
      k -> (oldAgg.getOrElse(k, 0L) + deltaNet.getOrElse(k, 0L))
    }.toMap

    // Merge the delta, then fully recompute the same aggregate from the
    // merged warehouse: incremental and full recompute must agree exactly.
    WarehouseSink.merge(spark, delta, wh, "event_id")
    val merged = spark.read.parquet(wh)
    assert(merged.count() == enriched.count(),
      "after the late slice lands, the warehouse holds every event exactly once")
    assert(merged.select("event_id").distinct().count() == enriched.count())
    val full = injuredByMonth(merged)
    assert(incremental == full,
      "incremental aggregate must equal a full recompute over the merged warehouse")

    // And the changed rows actually won their key collisions.
    val bumped = merged.join(changed.select(col("event_id"), col("ti").as("want_ti")), "event_id")
      .filter(col("ti") =!= col("want_ti")).count()
    assert(bumped == 0, "batch must win on key collision (refreshed tallies visible)")
  }
}
