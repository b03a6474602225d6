package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class CrashPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("pipeline preserves every crash record and enriches consistently") {
    val out = CrashPipeline.enrichedCrashes(spark, sf).cache()
    try {
      assert(out.count() == Tables.events(spark, sf).count(),
        "enrichment must be 1:1 — no drops, no dup explosion")
      // zone is set iff geometry survived the bbox filter
      assert(out.filter(col("zone").isNotNull && col("lng").isNull).count() == 0)
      assert(out.filter(col("lng").isNotNull && col("zone").isNull).count() == 0,
        "every in-extent point falls in exactly one zone box")
      // all 8 multipolygon zone dims ride the same scan (the reference's
      // 8 UPDATE passes, main.py:408-533) and EVERY dim must actually
      // assign — a per-type offset/bbox regression that silences 7 of the
      // 8 columns would pass an exists-based check
      EtlQueries.ZoneTypes.foreach { zt =>
        assert(out.columns.contains(zt), s"missing zone dim $zt")
        assert(out.filter(col(zt).isNotNull).count() > 0, s"zone dim $zt never assigns")
      }
      // blame factor is a valid allocation share
      assert(out.filter(col("blame_factor") <= 0.0 || col("blame_factor") > 1.0).count() == 0)
      // allocated counts never exceed raw tallies
      assert(out.filter(col("persons_injured_allocated") > col("ti")).count() == 0)
      // bike blame only when no motor vehicle is involved (main.py:672-678)
      val motor = Seq("motorcycle", "busvan", "car", "suv", "truck", "other")
        .map(c => col(s"hasvehicle_$c")).reduce(_ || _)
      assert(out.filter(col("bike_blame") && motor).count() == 0)
      // no-vehicle-data rows fall into the unspecified catch-all with full blame
      val sum8 = EtlQueries.ModeClasses
        .map(c => col(s"hasvehicle_$c").cast("int")).reduce(_ + _)
      assert(out.filter(sum8 === 0 &&
        (!col("hasvehicle_other_unspecified") || col("blame_factor") =!= 1.0)).count() == 0)
      // per-mode columns sum back to the allocated total across blamed modes
      val byModeInj = EtlQueries.ModeClasses
        .map(m => col(s"persons_injured_by$m")).reduce(_ + _)
      assert(out.filter(abs(byModeInj -
        col("persons_injured_allocated") *
          EtlQueries.ModeClasses.map(m => m match {
            case "bike" | "scooter" => (col("bike_blame") && col(s"hasvehicle_$m")).cast("int")
            case "other" => col("hasvehicle_other_unspecified").cast("int")
            case _ => col(s"hasvehicle_$m").cast("int")
          }).reduce(_ + _)) > 1e-9).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("pipeline is a single fused plan: one fact scan, no shuffle at all") {
    val p = CrashPipeline.enrichedCrashes(spark, sf).queryExecution.executedPlan.toString
    val factScans = p.linesIterator.count(l => l.contains("events.parquet") && l.contains("FileScan"))
    assert(factScans == 1, s"fact table must be scanned once, saw $factScans")
    assert(!p.contains("SortMergeJoin"), "all enrichments must broadcast")
    // the crosswalk/blame surface is pure projection now — with the zone dim
    // broadcast, the whole enrichment plan must contain zero shuffle
    // Exchanges (the 5-row zone BroadcastExchange is the one allowed)
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Exchange rangepartitioning"),
      s"enrichment must not shuffle the fact table:\n$p")
  }

  test("crosswalk flags query plans with no hash exchange before the flags") {
    val p = EtlQueries.vehicleCrosswalk(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"flags must be map-side only (rangepartitioning for the output sort is fine):\n$p")
    val p2 = EtlQueries.blameAllocation(spark, sf).queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange hashpartitioning"),
      s"blame matrix must be map-side only:\n$p2")
  }
}
