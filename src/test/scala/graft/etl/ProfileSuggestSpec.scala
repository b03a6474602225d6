package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `etl_profile_suggest` + `q19_disc_revenue` shapes: driver-side replays
  * plus a planted feed with nulls and duplicate keys. */
class ProfileSuggestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("profile equals a driver-side replay on the corpus") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("cast(event_id as string) AS event_id",
        "cast(unix_micros(ts) as string) AS ts", "cast(user_id as string) AS user_id",
        "event_type", "cast(value as string) AS value", "props")
      .collect()
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = ProfileSuggest.suggest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got.keySet == cols.toSet)
    cols.zipWithIndex.foreach { case (c, i) =>
      val vs = ev.map(r => if (r.isNullAt(i)) null else r.getString(i))
      val nNull = vs.count(_ == null).toLong
      val ndv = vs.filter(_ != null).distinct.length.toLong
      val exp = (vs.length.toLong, nNull, ndv, nNull == 0,
        ndv > 0 && ndv == vs.length - nNull,
        ndv >= 1 && ndv <= ProfileSuggest.EnumMaxValues)
      assert(got(c) == exp, s"$c: ${got(c)} vs $exp")
    }
    // the synthetic feed: ids unique, types a small enum
    assert(got("event_id")._5, "event_id must suggest unique")
    assert(got("event_type")._6, "event_type must suggest enum")
  }

  test("a nullable non-unique feed drops the corresponding suggestions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    spark.sql(
      """SELECT CAST(id % 50 AS BIGINT) AS event_id,
        | (1704067200 + id) * 1000000000 AS ts, id % 7 AS user_id,
        | 'x' AS event_type, 1.0 AS value,
        | CASE WHEN id % 3 = 0 THEN NULL ELSE 'p' END AS props
        |FROM range(100)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ProfileSuggest.suggest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(!got("event_id")._3, "duplicated ids must not suggest unique")
    assert(!got("props")._2, "nullable props must not suggest not-null")
    assert(got("ts")._3, "unique ts still suggests unique")
  }

  test("q19 branches are disjoint and equal a driver replay") {
    val rows = graft.relational.CoreQueries.q19DiscRevenue(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val joined = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.part(spark, sf),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .selectExpr("p_brand", "p_size", "l_quantity",
        "l_extendedprice * (1 - l_discount) AS rev").collect()
    def branch(b: String, s: Int, q: Double): String =
      if (b == "Brand#11" && s >= 1 && s <= 15 && q >= 1 && q <= 11) "small"
      else if (b == "Brand#22" && s >= 1 && s <= 25 && q >= 10 && q <= 20) "medium"
      else if (b == "Brand#33" && s >= 1 && s <= 35 && q >= 20 && q <= 30) "large"
      else null
    val exp = joined.map(r => (branch(r.getString(0), r.getInt(1), r.getDouble(2)), r.getDouble(3)))
      .filter(_._1 != null).groupBy(_._1).view
      .mapValues(g => (g.length.toLong,
        BigDecimal(g.map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toMap
    assert(rows.keySet == exp.keySet)
    rows.foreach { case (b, (n, rev)) =>
      assert(n == exp(b)._1, s"$b count")
      assert(math.abs(rev - exp(b)._2) < 0.02, s"$b revenue $rev vs ${exp(b)._2}")
    }
  }
}
