package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `q22_idle_balance`: threshold and anti-join semantics against a
  * driver-side replay. */
class Q22Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("idle above-average customers per nation equal a driver replay") {
    val custs = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val buyers = graft.Tables.orders(spark, sf)
      .filter(s"o_orderdate >= timestamp'${CoreQueries.Q22Dormant}'")
      .select("o_custkey").collect()
      .map(_.getLong(0)).toSet
    val nations = graft.Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val pos = custs.map(_._3).filter(_ > 0)
    val avgBal = pos.sum / pos.length
    val idle = custs.filter(c => c._3 > avgBal && !buyers.contains(c._1))
    val expected = idle.groupBy(c => nations(c._2)).view.mapValues { cs =>
      (cs.length.toLong, BigDecimal(cs.map(_._3).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = CoreQueries.q22IdleBalance(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (n, (c, bal)) =>
      assert(c == expected(n)._1, s"$n count")
      assert(math.abs(bal - expected(n)._2) < 0.02, s"$n balance $bal vs ${expected(n)._2}")
    }
  }
}
