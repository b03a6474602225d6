package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Q2 analog: driver replay of the exact integer-cents min-cost winner set
  * (including tie semantics), plus the plan shape that scales — one fact
  * scan, aggregate-of-aggregate broadcast back, no window over the fact. */
class Q21Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q21: min-cost suppliers equal a driver replay, ties kept") {
    val regionSupp = graft.Tables.supplier(spark, sf)
      .join(graft.Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf).filter(col("r_name") === CoreQueries.Q21Region),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(regionSupp.nonEmpty, "the region must hold suppliers at this SF")

    val cost = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .collect()
      .filter(r => r.getDouble(3) > 0 && regionSupp.contains(r.getLong(1)))
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) / r.getDouble(3) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val minPerPart = cost.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val expect = cost.collect {
      case ((part, supp), c) if c == minPerPart(part) => (part, supp, c)
    }.toSeq.sorted

    val got = SparkEntry.queries("q21_min_cost_supplier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q21 keeps every tied winner (planted two-supplier tie)") {
    import spark.implicits._
    // planted: part 1 traded at the same min unit price by two suppliers;
    // part 2 has a unique winner. Replays the operator's algebra on a frame
    // with a tie the synthetic corpus may never produce.
    val li = Seq(
      (1L, 10L, 200.0, 2.0),  // unit 100.00 → 10000 cents (tie)
      (1L, 11L, 100.0, 1.0),  // unit 100.00 → 10000 cents (tie)
      (1L, 12L, 300.0, 2.0),  // unit 150.00 — loses
      (2L, 10L, 50.0, 1.0),   // unique winner
      (2L, 11L, 60.0, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val cost = li.filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice") / col("l_quantity") * 100).cast("long"))
        .as("cost_cents"))
    val mn = cost.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("cost_cents")).as("min_cents"))
    val winners = cost.join(broadcast(mn),
        col("l_partkey") === col("m_partkey") && col("cost_cents") === col("min_cents"))
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winners == Set((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("q21 plan: one fact scan, region semi before the aggregate, min broadcast back, no window") {
    val p = SparkEntry.queries("q21_min_cost_supplier")(spark, sf)
      .queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    assert(p.contains("LeftSemi"), "region supplier cut must reach the fact as a semi-join")
    // every lineitem FileScan line in the printout must sit under an
    // InMemoryTableScan (the cached plan's text, not a live rescan) — the
    // Q11 cached-aggregate printout artifact
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      "both min and join-back consumers must read the cached cost aggregate")
    assert(p.linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem.parquet"))
      <= p.linesIterator.count(_.contains("InMemoryTableScan")),
      "no live lineitem scan outside the cached cost aggregate")
    assert(!p.contains("Window"), "the per-part min is never a window over the fact")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "join-back and dims must broadcast")
  }
}
