package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `q18_big_orders`: threshold tightness and survivor conservation against
  * a driver-side replay. */
class Q18Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("exactly the above-threshold orders survive, with their context") {
    val sums = graft.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.expr("round(sum(l_quantity), 2)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qualifying = sums.filter(_._2 > CoreQueries.Q18MinQty)
    val rows = CoreQueries.q18BigOrders(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == qualifying.keySet,
      "survivors must be exactly the above-threshold orders")
    rows.foreach { r =>
      assert(r.getDouble(5) == qualifying(r.getLong(0)), s"sum_qty for ${r.getLong(0)}")
      assert(r.getDouble(5) > CoreQueries.Q18MinQty)
    }
    // ordering: sum_qty desc, then orderkey
    val key = rows.map(r => (-r.getDouble(5), r.getLong(0))).toSeq
    assert(key == key.sorted, "presentation order must be (sum_qty desc, orderkey)")
  }
}
