package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_contingency`: driver-side replay of the exact-integer residual
  * arithmetic and a planted weekday-concentrated type that must flag. */
class ContingencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cells equal a driver-side replay of the integer form") {
    val cells = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "pmod(unix_date(to_date(ts)) + 3, 7) AS dow")
      .groupBy("event_type", "dow").count().collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val got = Concentration.contingency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case ((t, w), o) =>
      val d = (o * n - rt(t) * ct(w)).toDouble
      val e = (rt(t) * ct(w)).toDouble / n
      val contrib = d * d / n.toDouble / (rt(t) * ct(w))
      val exp = (o, round4(e), round4(contrib),
        contrib > Concentration.ResidFlag * Concentration.ResidFlag)
      assert(got((t, w)) == exp, s"($t,$w): ${got((t, w))} vs $exp")
    }
    // the synthetic feed is weekday-uniform: nothing should flag
    assert(got.values.forall(!_._4), s"uniform corpus flagged: $got")
  }

  test("a weekday-concentrated type flags its cell") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    // 'weekly' fires only every 7th day; 'flat' daily — the concentration
    // must surface as deviant cells for 'weekly'
    spark.sql(
      """SELECT id AS event_id, (1704067200 + (id * 7) * 86400) * 1000000000 AS ts,
        | 1 AS user_id, 'weekly' AS event_type, 1.0 AS value, '' AS props
        |FROM range(50)
        |UNION ALL
        |SELECT 1000 + id, (1704067200 + id * 86400) * 1000000000,
        | 1, 'flat', 1.0, '' FROM range(350)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Concentration.contingency(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(5)).toMap
    assert(got.exists { case ((t, _), dev) => t == "weekly" && dev },
      s"concentrated type must flag: $got")
  }
}
