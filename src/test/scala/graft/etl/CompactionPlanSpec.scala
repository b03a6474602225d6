package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_compact_plan`: driver-side replay of the fill rule, partition
  * integrity (contiguous day ranges, exact file/byte conservation), and the
  * cumulative-target guarantee for non-final bins. */
class CompactionPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bins equal a driver-side replay and conserve the ledger exactly") {
    val ledger = graft.Tables.events(spark, sf)
      .selectExpr("trunc(to_date(ts), 'month') AS month", "to_date(ts) AS day",
        s"octet_length(props) + ${CompactionPlan.RowOverhead} AS b")
      .groupBy("month", "day")
      .agg(org.apache.spark.sql.functions.expr("count(*)").as("n"),
        org.apache.spark.sql.functions.expr("sum(b)").as("bytes"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // replay: per month, cumulative-before div Target
    val assigned = ledger.groupBy(_._1).toSeq.flatMap { case (month, files) =>
      var cum = 0L
      files.sortBy(_._2).map { case (_, day, n, bytes) =>
        val bin = cum / CompactionPlan.TargetBytes
        cum += bytes
        (month, bin, day, n, bytes)
      }.toSeq
    }
    val expected = assigned.groupBy(t => (t._1, t._2)).map { case ((m, bin), fs) =>
      (m, bin) -> ((fs.length.toLong, fs.map(_._5).sum, fs.map(_._4).sum,
        fs.map(_._3).min, fs.map(_._3).max,
        fs.count(_._5 < CompactionPlan.SmallBytes).toLong))
    }
    val got = CompactionPlan.plan(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDate(5).toString, r.getDate(6).toString, r.getLong(7)))).toMap
    assert(got == expected)
    // conservation: every ledger file in exactly one bin, bytes add up
    assert(got.values.map(_._1).sum == ledger.length)
    assert(got.values.map(_._2).sum == ledger.map(_._4).sum)
  }

  test("non-final bins reach the target multiple; ranges are contiguous") {
    val rows = CompactionPlan.plan(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(3),
        r.getDate(5).toString, r.getDate(6).toString))
    rows.groupBy(_._1).foreach { case (month, bins) =>
      val sorted = bins.sortBy(_._2)
      // bin ids are dense from 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"$month bin ids")
      // cumulative bytes through every non-final bin reach the next multiple
      var cum = 0L
      sorted.dropRight(1).foreach { case (_, bin, bytes, _, _) =>
        cum += bytes
        assert(cum >= (bin + 1) * CompactionPlan.TargetBytes,
          s"$month bin $bin cumulative $cum below target multiple")
      }
      // day ranges never interleave
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4, s"$month bins ${a._2},${b._2} overlap")
        case _ =>
      }
    }
  }

  test("a burst of tiny files coalesces into one planned file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // 20 days × ~40 bytes/day: far below target — all 20 files must bin together
    spark.sql(
      """SELECT id AS event_id, (1704110400 + id * 86400 div 10) * 1000000000 AS ts,
        | id % 3 AS user_id, 'x' AS event_type, 1.0 AS value,
        | '{"k": 1}' AS props
        |FROM range(200)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = CompactionPlan.plan(spark, dir).collect()
    assert(rows.length == 1, s"expected one bin, got ${rows.length}")
    assert(rows.head.getLong(2) >= 20L, s"files in bin: ${rows.head.getLong(2)}")
    assert(rows.head.getLong(7) == rows.head.getLong(2), "all inputs are small files")
  }
}
