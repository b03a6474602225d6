package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ts_trend`: driver-side replay of the exact-moment OLS, a planted exact
  * line (R² = 1, flagged), and a flat series (slope 0, not flagged). */
class TrendSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("trend equals a driver-side replay of the exact moments") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "datediff(to_date(ts), date'1970-01-01') AS ed", "value")
      .groupBy("event_type", "ed")
      .agg(org.apache.spark.sql.functions.expr("cast(round(sum(value)) as long)").as("vi"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val got = CrossCorr.trend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val ed0 = rows.map(_._2).min
      val pts = rows.map(p => (p._2 - ed0, p._3))
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val dxy = (n * sxy - sx * sy).toDouble
      val dxx = (n * sxx - sx * sx).toDouble
      val dyy = (n * syy - sy * sy).toDouble
      val slope = dxy / dxx
      val expTrending = dxy * dxy / dxx / dyy >= CrossCorr.TrendR2 &&
        math.abs(slope) >= CrossCorr.TrendSlope
      val exp = (n, r(slope, 6), r((sy.toDouble - slope * sx) / n, 4),
        r(dxy * dxy / dxx / dyy, 4), expTrending)
      assert(got(t) == exp, s"$t: ${got(t)} vs $exp")
    }
  }

  test("an exact line flags trending with R² = 1; a flat series does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString
    spark.sql(
      """SELECT id AS event_id, (1704067200 + id * 86400) * 1000000000 AS ts,
        | 1 AS user_id, 'line' AS event_type,
        | CAST(100 + 5 * id AS DOUBLE) AS value, '' AS props
        |FROM range(30)
        |UNION ALL
        |SELECT 100 + id, (1704067200 + id * 86400) * 1000000000,
        | 1, 'flat', 42.0, '' FROM range(30)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CrossCorr.trend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))).toMap
    assert(got("line") == ((5.0, Some(1.0), true)), s"line: ${got("line")}")
    val flat = got("flat")
    assert(flat._1 == 0.0 && !flat._3, s"flat: $flat")
  }
}
