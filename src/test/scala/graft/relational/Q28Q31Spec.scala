package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Q3/Q5/Q9/Q16 analogs — the four shapes that complete the TPC-H map:
  * driver replays in exact integer cents plus the plan disciplines that
  * scale (broadcast cuts BEFORE fact joins, TakeOrderedAndProject top-N,
  * aggregate-broadcast-back instead of a fact shuffle on (part,supplier),
  * broadcast anti for NOT IN). */
class Q28Q31Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def ms(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  private lazy val lines = graft.Tables.lineitem(spark, sf)
    .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), ms(r.get(6))))
  private lazy val orders = graft.Tables.orders(spark, sf)
    .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority").collect()
    .map(r => (r.getLong(0), r.getLong(1), ms(r.get(2)), r.getString(3)))
  private lazy val custNation = graft.Tables.customer(spark, sf)
    .selectExpr("c_custkey", "c_nationkey", "c_mktsegment").collect()
    .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
  private lazy val suppNation = graft.Tables.supplier(spark, sf)
    .selectExpr("s_suppkey", "s_nationkey").collect()
    .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def cents(price: Double, disc: Double): Long =
    math.round(price * (1 - disc) * 100)

  test("q28: in-flight top-N replay — segment cut, both date cuts, exact cents") {
    val cut = java.sql.Timestamp.valueOf(CoreQueries.Q28CutDate).getTime
    val ordOf = orders.map(o => o._1 -> o).toMap
    val agg = scala.collection.mutable.Map[Long, Long]()
    lines.foreach { case (ok, _, _, _, price, disc, ship) =>
      val o = ordOf(ok)
      if (ship > cut && o._3 < cut && custNation(o._2)._2 == CoreQueries.Q28Segment)
        agg(ok) = agg.getOrElse(ok, 0L) + cents(price, disc)
    }
    val expect = agg.toSeq.sortBy(t => (-t._2, t._1)).take(CoreQueries.Q28TopN)
    val got = SparkEntry.queries("q28_ship_priority")(spark, sf).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    assert(got.toSeq == expect)
    assert(got.length == CoreQueries.Q28TopN)
  }

  test("q29: same-nation constraint replay — region scope, one order year") {
    val lo = java.sql.Timestamp.valueOf(CoreQueries.Q29Year._1).getTime
    val hi = java.sql.Timestamp.valueOf(CoreQueries.Q29Year._2).getTime
    val nations = graft.Tables.nation(spark, sf)
      .join(graft.Tables.region(spark, sf).filter(
        org.apache.spark.sql.functions.col("r_name") === CoreQueries.Q29Region),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .selectExpr("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val ordOf = orders.map(o => o._1 -> o).toMap
    val agg = scala.collection.mutable.Map[String, (Long, Long)]()
    lines.foreach { case (ok, _, sk, _, price, disc, _) =>
      val o = ordOf(ok)
      val cNat = custNation(o._2)._1
      val sNat = suppNation(sk)
      if (o._3 >= lo && o._3 < hi && cNat == sNat && nations.contains(cNat)) {
        val name = nations(cNat)
        val (c, n) = agg.getOrElse(name, (0L, 0L))
        agg(name) = (c + cents(price, disc), n + 1)
      }
    }
    val got = SparkEntry.queries("q29_local_volume")(spark, sf).collect()
      .map(r => r.getString(0) -> (math.round(r.getDouble(1) * 100), r.getLong(2))).toMap
    assert(got == agg.toMap)
    assert(got.nonEmpty)
  }

  test("q30: profit replay — observed min unit cost per (part,supplier), exact cents") {
    val word = CoreQueries.Q30PartWord
    val widgetParts = graft.Tables.part(spark, sf)
      .filter(org.apache.spark.sql.functions.col("p_name").contains(word))
      .selectExpr("p_partkey").collect().map(_.getLong(0)).toSet
    val sliver = lines.filter(l => widgetParts(l._2))
    val costOf = sliver.groupBy(l => (l._2, l._3)).view.mapValues(g =>
      g.map(l => math.round(l._5 / l._4 * 100)).min).toMap
    val nationName = graft.Tables.nation(spark, sf)
      .selectExpr("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val yearOf = orders.map { o =>
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.setTimeInMillis(o._3)
      o._1 -> c.get(java.util.Calendar.YEAR)
    }.toMap
    val agg = scala.collection.mutable.Map[(String, Int), (Long, Long)]()
    sliver.foreach { case (ok, pk, sk, qty, price, disc, _) =>
      val key = (nationName(suppNation(sk)), yearOf(ok))
      val profit = cents(price, disc) - costOf((pk, sk)) * qty.toLong
      val (p, n) = agg.getOrElse(key, (0L, 0L))
      agg(key) = (p + profit, n + 1)
    }
    val got = SparkEntry.queries("q30_product_profit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (math.round(r.getDouble(2) * 100), r.getLong(3))).toMap
    assert(got == agg.toMap)
    assert(got.nonEmpty)
    // every line's cost is <= its own unit price, so profit >= 0 per line
    // need not hold per group only if rounding moved it — sanity: the min
    // unit cost times qty can never exceed that line's own revenue by more
    // than the discount share; just pin totals are finite and counts match
    assert(got.values.map(_._2).sum == sliver.length)
  }

  test("q31: distinct-supplier histogram replay — part cuts + complaint anti-join") {
    val parts = graft.Tables.part(spark, sf)
      .selectExpr("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val bad = graft.Tables.supplier(spark, sf)
      .filter(org.apache.spark.sql.functions.col("s_acctbal") < 0)
      .selectExpr("s_suppkey").collect().map(_.getLong(0)).toSet
    val sizes = CoreQueries.Q31Sizes.toSet
    val expect = lines.iterator
      .map(l => (l._2, l._3))
      .filter { case (pk, sk) =>
        val (b, t, z) = parts(pk)
        b != CoreQueries.Q31ExcludeBrand && t != CoreQueries.Q31ExcludeType &&
          sizes(z) && !bad(sk)
      }
      .map { case (pk, sk) => (parts(pk), sk) }.toSet
      .groupBy((t: ((String, String, Int), Long)) => t._1).view
      .mapValues(_.map(_._2).size.toLong).toMap
    val got = SparkEntry.queries("q31_supplier_parts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("plans: broadcast cuts before fact joins, TakeOrdered top-N, no cartesians") {
    val p28 = SparkEntry.queries("q28_ship_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p28.contains("TakeOrderedAndProject"),
      "q28 top-N must be per-partition heads, not a global sort")
    assert(p28.contains("LeftSemi"), "q28 segment cut must be a semi join")
    assert(!p28.contains("CartesianProduct"))
    val p29 = SparkEntry.queries("q29_local_volume")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p29.contains("BroadcastHashJoin") || p29.contains("BroadcastExchange"),
      "q29 dim cuts must be broadcasts")
    assert(!p29.contains("CartesianProduct"))
    val q30 = SparkEntry.queries("q30_product_profit")(spark, sf)
    val p30 = q30.queryExecution.executedPlan.toString
    assert(p30.contains("LeftSemi"), "q30 part-name cut must be a semi join")
    assert(!p30.contains("CartesianProduct"))
    // the cost join-back must be a broadcast hash join on (part, supplier)
    // — the FACT side never shuffles for it (the only (l_partkey,
    // l_suppkey) exchange in the plan carries |pairs| partial aggregates)
    assert(p30.linesIterator.exists(l => l.contains("BroadcastHashJoin") &&
      l.contains("c_partkey")),
      "q30 cost aggregate must broadcast back onto the fact")
    graft.CacheRegistry.releaseAll()
    val p31 = SparkEntry.queries("q31_supplier_parts")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p31.contains("LeftAnti"), "q31 complaint cut must be an anti join")
    assert(p31.contains("BroadcastHashJoin"))
    assert(!p31.contains("CartesianProduct"))
    // two-level distinct expansion: the count(DISTINCT suppkey) must run
    // as partial-distinct aggregates (the exchange carries deduped
    // (bucket, suppkey) pairs, never raw fact rows) — a single-level plan
    // would show no partial_count(distinct ...) phase
    assert(p31.contains("partial_count(distinct"),
      "q31 distinct count must be the two-level partial-distinct aggregate")
    assert(!p31.contains("Expand"),
      "single distinct column must not trigger the multi-distinct Expand")
  }
}
