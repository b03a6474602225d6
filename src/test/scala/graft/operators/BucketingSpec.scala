package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("co-bucketed fact join plans with zero exchanges") {
    val root = Files.createTempDirectory("buckets").toString
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf).select("l_orderkey", "l_extendedprice"),
      "li_b", s"$root/li", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_totalprice"),
      "o_b", s"$root/o", "o_orderkey", 4)
    try {
      val joined = spark.table("li_b").hint("MERGE")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scan must be bucket-aware")
      // and it computes the same thing as the unbucketed join
      val expected = Tables.lineitem(spark, TestSpark.sf)
        .join(Tables.orders(spark, TestSpark.sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      ()
    }
  }
}
