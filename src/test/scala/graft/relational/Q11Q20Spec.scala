package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Q11/Q20 analogs: driver-side replays of the exact integer thresholds,
  * plus the plan shapes that make them scale — one fact scan each, scalar
  * broadcast for Q11, no fact self-join for Q20. */
class Q11Q20Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private lazy val lineitem = graft.Tables.lineitem(spark, sf)
    .selectExpr("l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
      "l_quantity", "year(l_shipdate) AS yr").collect()

  test("q11: important parts equal a driver replay of the integer share threshold") {
    val perPart = lineitem
      .map(r => r.getLong(0) -> math.round(r.getDouble(2) * (1 - r.getDouble(3)) * 100))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = perPart.values.sum
    val n = perPart.size
    val expect = perPart.filter { case (_, v) =>
      CoreQueries.Q11MeanDen * v * n > CoreQueries.Q11MeanNum * total }
      .map { case (k, v) => (k, math.rint(v.toDouble / 100.0 * 100) / 100) }
      .toSeq.sortBy { case (k, v) => (-v, k) }
    val got = SparkEntry.queries("q11_important_stock")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    graft.CacheRegistry.releaseAll()
    assert(got == expect)
    assert(got.nonEmpty, "threshold must select a non-trivial head")
  }

  test("q11 plan: one lineitem scan feeding a cached aggregate; total is a scalar broadcast, no window") {
    val p = planOf("q11_important_stock")
    graft.CacheRegistry.releaseAll()
    // both consumers (total + share filter) must read the CACHED per-part
    // aggregate — the FileScan text appearing under each InMemoryTableScan
    // is the cached plan's printout, not a second scan
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      "per-part aggregate must be reused for the total, not rescanned")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the one-row total must broadcast")
    assert(!p.contains("Window"), "no global rank/window in the share filter")
  }

  test("q20: concentrated suppliers equal a driver replay of the two-scope aggregate") {
    val brandParts = graft.Tables.part(spark, sf)
      .filter(org.apache.spark.sql.functions.col("p_brand") === CoreQueries.Q20Brand)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val per = lineitem.filter(r => brandParts.contains(r.getLong(0)))
      .map(r => ((r.getLong(1), r.getLong(0)),
        (if (r.getInt(5) == CoreQueries.Q20Year) math.round(r.getDouble(4) * 100) else 0L,
          math.round(r.getDouble(4) * 100))))
      .groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    val expect = per.collect { case ((supp, _), (q95, qall)) if q95 * 2 > qall => supp }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q20_part_supplier")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expect)
    assert(expect.nonEmpty, "the year-concentration gate must fire on the corpus")
  }

  test("q20 plan: single lineitem scan, brand semi-join broadcast, no fact self-join") {
    val p = planOf("q20_part_supplier")
    assert(p.linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem.parquet")) == 1,
      "the correlated two-scope compare must be ONE conditional aggregate, not a self-join")
    assert(p.contains("LeftSemi"), "brand filter must reach lineitem as a semi-join")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "dims broadcast; nothing joins fact-to-fact")
  }
}
