package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("HLL distinct counts land within 5% of exact; quantile sketch within 5% of exact") {
    val rows = SketchQueries.approxReport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approxU, exactU) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approxU - exactU).toDouble / exactU <= 0.05,
        s"${r.getString(0)}: HLL $approxU vs exact $exactU")
      val (ap50, ep50) = (r.getDouble(3), r.getDouble(4))
      val (ap95, ep95) = (r.getDouble(5), r.getDouble(6))
      assert(math.abs(ap50 - ep50) / math.max(ep50, 1e-9) <= 0.05, s"p50 $ap50 vs $ep50")
      assert(math.abs(ap95 - ep95) / math.max(ep95, 1e-9) <= 0.05, s"p95 $ap95 vs $ep95")
    }
  }

  test("sketch-only aggregation is one partial-agg pass; the exact twin costs a second shuffle") {
    val sketch = SketchQueries.sketchOnly(spark, sf).queryExecution.executedPlan.toString
    assert(sketch.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "HLL + quantile sketches must aggregate in a single exchange")
    assert(!sketch.contains("Exchange SinglePartition"), "no global single-partition funnel")
    // the exact countDistinct foil triggers Spark's two-phase distinct
    // expansion — exactly the extra fact-table shuffle the sketch avoids
    val report = SketchQueries.approxReport(spark, sf).queryExecution.executedPlan.toString
    assert(report.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2)
  }

  test("sketches are deterministic across runs (driver hash-compare safety)") {
    val a = SketchQueries.approxReport(spark, sf).collect().map(_.toString).toSeq
    val b = SketchQueries.approxReport(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
