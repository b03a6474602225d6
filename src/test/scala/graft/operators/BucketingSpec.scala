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

  test("q2 over co-bucketed fact copies: the fact join key never shuffles") {
    val root = Files.createTempDirectory("buckets_q2").toString
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      "li_b2", s"$root/li", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf).select("o_orderkey", "o_custkey"),
      "o_b2", s"$root/o", "o_orderkey", 4)
    try {
      val bucketed = graft.relational.CoreQueries.q2From(
        spark.table("li_b2").hint("MERGE"), spark.table("o_b2"),
        Tables.customer(spark, TestSpark.sf).select("c_custkey", "c_name", "c_nationkey"),
        Tables.nation(spark, TestSpark.sf).select("n_nationkey", "n_name"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "the fact join must stay an SMJ")
      // the agg/window exchanges on (n_name, …) remain — it is the JOIN
      // KEYS that must never appear under an Exchange
      assert(!plan.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey"))),
        s"the bucketed fact join must not shuffle its keys:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scans must be bucket-aware")
      // same answer as the plain q2
      val expected = graft.SparkEntry.queries("q2_revenue_topn")(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
      assert(bucketed.collect().map(_.toString).toSeq == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b2")
      spark.sql("DROP TABLE IF EXISTS o_b2")
      ()
    }
  }
}
