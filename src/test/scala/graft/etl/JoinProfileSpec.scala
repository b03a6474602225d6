package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_join_profile`: driver-side replay on the corpus and a planted
  * dataset with orphans and childless parents. */
class JoinProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("profile equals a driver-side replay") {
    val perCust = graft.Tables.orders(spark, sf).groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = graft.Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val orphan = perCust.filter { case (c, _) => !custs.contains(c) }.values.sum
    val counts = custs.toSeq.map(c => perCust.getOrElse(c, 0L))
    val r = JoinProfile.profile(spark, sf).collect().head
    assert(r.getLong(0) == perCust.values.sum)
    assert(r.getLong(1) == custs.size.toLong)
    assert(r.getLong(2) == orphan)
    assert(r.getLong(3) == counts.count(_ == 0L).toLong)
    assert(r.getLong(4) == counts.min && r.getLong(5) == counts.max)
  }

  test("orphans and childless parents are counted, rates reflect them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jp").toString
    import spark.implicits._
    // customers 1..5; orders: 3 for cust 1, 1 for cust 2, 2 orphaned (cust 99)
    Seq(1L, 2L, 3L, 4L, 5L).toDF("c_custkey")
      .selectExpr("c_custkey", "concat('c', c_custkey) AS c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L), (14L, 99L), (15L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .selectExpr("o_orderkey", "o_custkey", "'O' AS o_orderstatus",
        "100.0 AS o_totalprice", "timestamp'2024-01-01' AS o_orderdate",
        "'3-MEDIUM' AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = JoinProfile.profile(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L)
    assert(r.getLong(2) == 2L, "two orphaned orders")
    assert(r.getLong(3) == 3L, "customers 3,4,5 are childless")
    assert(r.getLong(4) == 0L && r.getLong(5) == 3L)
    assert(r.getDouble(6) == BigDecimal(4.0 / 6).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(7) == 0.8, "4 matched orders / 5 customers")
  }
}
