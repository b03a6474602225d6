package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.etl.Synth

class RewriteContainmentJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def points = {
    val id = col("event_id")
    Tables.events(spark, TestSpark.sf)
      .select(id, Synth.cartoLng(id).as("lng"), Synth.cartoLat(id).as("lat"))
      .filter(col("lng").isNotNull)
  }

  private def zones = Tables.region(spark, TestSpark.sf).select(
    col("r_name").as("zone"),
    (lit(-74.25) + col("r_regionkey") * lit(0.1)).as("west"),
    (lit(-74.25) + (col("r_regionkey") + lit(1)) * lit(0.1)).as("east"),
    lit(40.50).as("south"), lit(40.90).as("north"))

  private def boxJoin = points.join(zones,
    col("lng") >= col("west") && col("lng") < col("east") &&
      col("lat") >= col("south") && col("lat") < col("north"))
    .select("event_id", "zone")

  test("rule rewrites the containment join to a cell equi-join with identical results") {
    RewriteContainmentJoin.install(spark)
    val baseline = boxJoin.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    spark.conf.set(RewriteContainmentJoin.ConfKey, "true")
    try {
      val rewritten = boxJoin
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"rule should remove the nested loop:\n$plan")
      assert(plan.contains("_gcell"), "cell key must drive the join")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == baseline)
    } finally spark.conf.set(RewriteContainmentJoin.ConfKey, "false")
  }

  test("rule is inert when disabled or on non-matching joins") {
    RewriteContainmentJoin.install(spark)
    assert(boxJoin.queryExecution.executedPlan.toString.contains("NestedLoop"))
    spark.conf.set(RewriteContainmentJoin.ConfKey, "true")
    try {
      // equi-join: no box pattern, must be untouched
      val o = Tables.orders(spark, TestSpark.sf)
      val c = Tables.customer(spark, TestSpark.sf)
      val eq = o.join(c, col("o_custkey") === col("c_custkey"))
      assert(!eq.queryExecution.executedPlan.toString.contains("_gcell"))
    } finally spark.conf.set(RewriteContainmentJoin.ConfKey, "false")
  }
}
