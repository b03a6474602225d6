package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `q15_top_supplier`: driver-side replay of the view + max + tie
  * semantics, and the no-global-window plan shape. */
class Q15Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("top supplier equals the driver-side replay (ties all returned)") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .collect()
      .filter { r =>
        // NTZ column collects as LocalDateTime
        val d = r.getAs[java.time.LocalDateTime](3)
        !d.isBefore(java.time.LocalDateTime.parse("1996-01-01T00:00")) &&
          d.isBefore(java.time.LocalDateTime.parse("1996-04-01T00:00"))
      }
      .map(r => (r.getLong(0), r.getDouble(1) * (1 - r.getDouble(2))))
    val rev = li.groupBy(_._1).view.mapValues(v =>
      BigDecimal(v.map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val mx = rev.values.max
    val expect = rev.filter(_._2 == mx).keySet
    val got = CoreQueries.q15TopSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    graft.CacheRegistry.releaseAll()
    assert(got.map(_._1).toSet == expect, s"got ${got.toSeq} expect $expect")
    assert(got.forall(_._2 == mx))
    val names = Tables.supplier(spark, sf).select("s_suppkey").collect()
      .map(_.getLong(0)).toSet
    assert(expect.subsetOf(names), "winner must resolve in the supplier dim")
  }

  test("the max is a broadcast, not a global window") {
    val p = CoreQueries.q15TopSupplier(spark, sf).queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    assert(!p.contains("Window"), "Q15 must not use a global window for the max")
  }
}
