package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Q4/Q10/Q12 analogs: driver replays + the plan shapes that scale
  * (correlated-EXISTS-as-semi-join, TakeOrderedAndProject top-N, one
  * fact⋈fact join with conditional sums). */
class Q25Q27Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def ms(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  private lazy val orders = graft.Tables.orders(spark, sf)
    .selectExpr("o_orderkey", "o_orderdate", "o_orderpriority").collect()
    .map(r => (r.getLong(0), ms(r.get(1)), r.getString(2)))
  private lazy val lines = graft.Tables.lineitem(spark, sf)
    .selectExpr("l_orderkey", "l_shipdate", "l_returnflag",
      "l_extendedprice", "l_discount").collect()
    .map(r => (r.getLong(0), ms(r.get(1)), r.getString(2),
      r.getDouble(3), r.getDouble(4)))

  private val DayMs = 86400000L

  test("q25: correlated EXISTS replay — slow-lineitem orders per priority") {
    val qLo = java.sql.Timestamp.valueOf(CoreQueries.Q25Quarter._1).getTime
    val qHi = java.sql.Timestamp.valueOf(CoreQueries.Q25Quarter._2).getTime
    val shipByOrder = lines.groupBy(_._1)
    val expect = orders.iterator
      .filter(o => o._2 >= qLo && o._2 < qHi)
      .filter(o => shipByOrder.getOrElse(o._1, Array.empty)
        .exists(l => l._2 > o._2 + CoreQueries.Q25LateDays * DayMs))
      .toSeq.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q25_priority_check")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q26: top-N lost-revenue replay in exact cents with total-order ties") {
    val qLo = java.sql.Timestamp.valueOf(CoreQueries.Q26Quarter._1).getTime
    val qHi = java.sql.Timestamp.valueOf(CoreQueries.Q26Quarter._2).getTime
    val custOf = graft.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), ms(r.get(2)))).toMap
    val agg = scala.collection.mutable.Map[Long, (Long, Long)]()
    lines.foreach { case (ok, _, rf, price, disc) =>
      val (ck, odate) = custOf(ok)
      if (rf == "R" && odate >= qLo && odate < qHi) {
        val cents = math.round(price * (1 - disc) * 100)
        val (c, n) = agg.getOrElse(ck, (0L, 0L))
        agg(ck) = (c + cents, n + 1)
      }
    }
    val expect = agg.toSeq.map { case (ck, (c, n)) => (ck, c, n) }
      .sortBy(t => (-t._2, t._1)).take(CoreQueries.Q26TopN)
    val got = SparkEntry.queries("q26_returned_customers")(spark, sf).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(3) * 100), r.getLong(4))).toSeq
      .sortBy(t => (-t._2, t._1))
    assert(got == expect)
    assert(got.size == CoreQueries.Q26TopN)
  }

  test("q27: conditional-sum replay over one late-line join") {
    val odateOf = orders.map(o => o._1 -> (o._2, o._3)).toMap
    val crit = Set("1-URGENT", "2-HIGH")
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_linestatus", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getString(1), ms(r.get(2))))
    val tall = rows.filter { case (ok, _, ship) =>
      ship > odateOf(ok)._1 + CoreQueries.Q27LateDays * DayMs }
    val byStatus = tall.groupBy(_._2).view.mapValues { g =>
      val high = g.count(t => crit(odateOf(t._1)._2)).toLong
      (high, g.size.toLong - high)
    }.toMap
    val got = SparkEntry.queries("q27_late_priority")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == byStatus)
    assert(got.nonEmpty)
  }

  test("plans: q25 semi-join, q26 TakeOrdered top-N, q27 single join — no cartesians") {
    val p25 = SparkEntry.queries("q25_priority_check")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p25.contains("LeftSemi"), "the EXISTS must plan as a semi join")
    assert(!p25.contains("CartesianProduct"))
    val p26 = SparkEntry.queries("q26_returned_customers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p26.contains("TakeOrderedAndProject"),
      "the top-N must be per-partition heads, not a global sort")
    assert(p26.contains("PushedFilters") || p26.contains("l_returnflag"),
      "the returnflag predicate must reach the scan")
    val p27 = SparkEntry.queries("q27_late_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p27.linesIterator.count(l => l.contains("FileScan") &&
      l.contains("lineitem.parquet")) == 1)
    assert(p27.linesIterator.count(l => l.contains("FileScan") &&
      l.contains("orders.parquet")) == 1)
    assert(!p27.contains("CartesianProduct"))
  }
}
