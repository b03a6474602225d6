package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Q7/Q8 analogs: driver replays of the exact integer-cents aggregates and
  * the cut-before-join plan discipline (both fact sides reduced by
  * broadcasts BEFORE the orderkey fact⋈fact join — the only big shuffle). */
class Q23Q24Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def nationOf(table: String, keyCol: String, natCol: String): Map[Long, String] = {
    val nations = graft.Tables.nation(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    (if (table == "supplier") graft.Tables.supplier(spark, sf) else graft.Tables.customer(spark, sf))
      .selectExpr(keyCol, natCol).collect()
      .map(r => r.getLong(0) -> nations(r.getInt(1))).toMap
  }

  test("q23: cross-nation trade volume equals a driver replay in exact cents") {
    val suppNat = nationOf("supplier", "s_suppkey", "s_nationkey")
    val custNat = nationOf("customer", "c_custkey", "c_nationkey")
    val orderCust = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pair = Set(CoreQueries.Q23NationA, CoreQueries.Q23NationB)
    val agg = scala.collection.mutable.Map[(String, String, Int), (Long, Long)]()
    graft.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_suppkey", "year(l_shipdate) AS y",
        "l_extendedprice", "l_discount").collect().foreach { r =>
        val sn = suppNat(r.getLong(1))
        val cn = custNat(orderCust(r.getLong(0)))
        if (pair(sn) && pair(cn) && sn != cn) {
          val cents = math.round(r.getDouble(3) * (1 - r.getDouble(4)) * 100)
          val k = (sn, cn, r.getInt(2))
          val (n, c) = agg.getOrElse(k, (0L, 0L))
          agg(k) = (n + 1, c + cents)
        }
      }
    val expect = agg.toSeq.map { case ((sn, cn, y), (n, c)) =>
      (sn, cn, y, n, BigDecimal(c) / 100) }.sortBy(t => (t._1, t._2, t._3))
    val got = SparkEntry.queries("q23_nation_volume")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        BigDecimal(r.getDouble(4)))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "the chosen nation pair must trade at the gate SF")
    assert(got.map(_._1).toSet == Set(CoreQueries.Q23NationA, CoreQueries.Q23NationB),
      "both directions must appear")
  }

  test("q24: market share equals a driver replay — one division over exact cents") {
    val nations = graft.Tables.nation(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val regionKeys = graft.Tables.region(spark, sf)
      .filter(col("r_name") === CoreQueries.Q24Region)
      .collect().map(_.getInt(0)).toSet
    val regionCust = graft.Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_nationkey").collect()
      .filter(r => regionKeys(nations(r.getInt(1))._2)).map(_.getLong(0)).toSet
    val suppIsNat = graft.Tables.supplier(spark, sf)
      .selectExpr("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> (nations(r.getInt(1))._1 == CoreQueries.Q24Nation)).toMap
    val orderInfo = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey", "year(o_orderdate) AS y").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val agg = scala.collection.mutable.Map[Int, (Long, Long, Long)]()
    graft.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        val (custkey, y) = orderInfo(r.getLong(0))
        if (regionCust(custkey)) {
          val cents = math.round(r.getDouble(2) * (1 - r.getDouble(3)) * 100)
          val nat = if (suppIsNat(r.getLong(1))) cents else 0L
          val (a, b, n) = agg.getOrElse(y, (0L, 0L, 0L))
          agg(y) = (a + nat, b + cents, n + 1)
        }
      }
    val expect = agg.toSeq.map { case (y, (nat, all, n)) =>
      (y, BigDecimal(math.round(nat.toDouble / all * 10000)) / 10000,
        BigDecimal(all) / 100, n) }.sortBy(_._1)
    val got = SparkEntry.queries("q24_market_share")(spark, sf).collect()
      .map(r => (r.getInt(0), BigDecimal(r.getDouble(1)), BigDecimal(r.getDouble(2)),
        r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    assert(got.exists(_._2 > 0), "the nation must hold some share in some year")
  }

  test("q23/q24 plans: single scan per fact, dims broadcast, no window, no cartesian") {
    for (q <- Seq("q23_nation_volume", "q24_market_share")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(p.linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem.parquet")) == 1,
        s"$q: lineitem must be scanned exactly once")
      assert(p.linesIterator.count(l => l.contains("FileScan") && l.contains("orders.parquet")) == 1,
        s"$q: orders must be scanned exactly once")
      assert(p.contains("BroadcastHashJoin"), s"$q: dim cuts must broadcast")
      assert(!p.contains("Window"), s"$q: no window anywhere")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q: no cartesian/NLJ")
    }
  }
}
