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
      // blame factor is a valid allocation share
      assert(out.filter(col("blame_factor") <= 0.0 || col("blame_factor") > 1.0).count() == 0)
      // allocated counts never exceed raw tallies
      assert(out.filter(col("injured_allocated") > col("ti")).count() == 0)
      // exactly one vehicle class takes blame when nothing else is flagged
      assert(out.filter(col("has_other") &&
        (col("has_pointer") || col("has_convert") || col("has_fail"))).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("pipeline is a single fused plan: one fact scan, broadcasts only") {
    val p = CrashPipeline.enrichedCrashes(spark, sf).queryExecution.executedPlan.toString
    val factScans = p.linesIterator.count(l => l.contains("events.parquet") && l.contains("FileScan"))
    assert(factScans == 1, s"fact table must be scanned once, saw $factScans")
    assert(!p.contains("SortMergeJoin"), "all enrichments must broadcast")
  }
}
