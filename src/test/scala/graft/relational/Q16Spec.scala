package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `q16_cust_order_dist`: driver-side replay including the zero-order
  * bucket, and total-customer conservation. */
class Q16Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("distribution equals a driver-side replay and conserves customers") {
    val perCust = graft.Tables.orders(spark, sf)
      .filter("o_orderpriority <> '1-URGENT'")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = graft.Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = CoreQueries.q16CustOrderDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.sum == custs.length, "every customer in exactly one bucket")
    // the left join's whole point: zero-order customers are present iff any exist
    val zeroCusts = custs.count(c => !perCust.contains(c)).toLong
    assert(got.getOrElse(0L, 0L) == zeroCusts)
  }
}
