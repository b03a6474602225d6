package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class DqReportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[(String, String), (Long, Long)] =
    DqReport.dqReport(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap

  test("report covers all seven checks with consistent populations") {
    assert(got.keySet == Set(
      ("events", "null_props"), ("events", "negative_or_null_value"),
      ("events", "bad_user_id"), ("events", "duplicate_event_id"),
      ("events", "value_above_ceiling"),
      ("lineitem", "orphan_orderkey"), ("orders", "orphan_custkey")))
    val nEvents = Tables.events(spark, sf).count()
    got.filter(_._1._1 == "events").values.foreach { case (v, pop) =>
      assert(pop == nEvents)
      assert(v >= 0L && v <= pop)
    }
    assert(got(("lineitem", "orphan_orderkey"))._2 == Tables.lineitem(spark, sf).count())
    assert(got(("orders", "orphan_custkey"))._2 == Tables.orders(spark, sf).count())
  }

  test("referential checks agree with a driver-side anti-join replay") {
    val orderKeys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val orphans = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .count(r => !orderKeys.contains(r.getLong(0)))
    assert(got(("lineitem", "orphan_orderkey"))._1 == orphans.toLong)
    val custKeys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val ordOrphans = Tables.orders(spark, sf).select("o_custkey").collect()
      .count(r => !custKeys.contains(r.getLong(0)))
    assert(got(("orders", "orphan_custkey"))._1 == ordOrphans.toLong)
  }
}
