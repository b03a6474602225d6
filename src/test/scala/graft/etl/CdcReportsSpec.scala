package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import Synth._

class CdcReportsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("incrementally maintained state equals a from-scratch recompute of the refreshed source") {
    val id = col("event_id")
    // ground truth: aggregate the refreshed (soda) tallies over the full
    // merged keyset — what a full recompute would store
    val full = Tables.events(spark, sf)
      .groupBy(year(col("ts")).cast("long").as("yr"), month(col("ts")).cast("long").as("mon"),
        col("event_type"))
      .agg(sum(sodaTi(id)).as("expected"))
    val incr = EtlQueries.incrementalAgg(spark, sf)
    val joined = incr.join(full, Seq("yr", "mon", "event_type"), "full_outer").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(5) && !r.isNullAt(6), s"group mismatch: $r")
      assert(r.getLong(5) == r.getLong(6),
        s"incremental new_injured ${r.getLong(5)} != recompute ${r.getLong(6)} for $r")
    }
  }

  test("reconciliation classes are all populated and partition the window keyset") {
    val rows = EtlQueries.reconcile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("new", "deleted_upstream", "changed", "unchanged"))
    val id = col("event_id")
    val windowKeys = Tables.eventsSince(spark, sf, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
      .filter((id % 37 =!= 5) || inCarto(id))
      .count()
    assert(rows.values.sum == windowKeys, "every window key must appear in exactly one class")
  }

  test("reconcile prunes both sides to the refresh window before the join") {
    val p = EtlQueries.reconcile(spark, sf).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("GreaterThanOrEqual(ts,")) == 2,
      "both scans must carry the pushed window filter")
  }
}
