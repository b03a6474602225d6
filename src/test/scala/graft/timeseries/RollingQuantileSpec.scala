package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ts_rolling_quantile`: driver-side replay of the exact order statistics
  * and gap-correctness on a sparse planted series. */
class RollingQuantileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("p50/p90 equal a driver-side replay over observed trailing days") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "datediff(to_date(ts), date'1970-01-01') AS ed", "value")
      .groupBy("event_type", "ed")
      .agg(org.apache.spark.sql.functions.expr("cast(round(sum(value)) as long)").as("vi"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val got = RollingQuantile.rollingQuantile(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    var checked = 0
    byType.foreach { case (t, days) =>
      days.keys.foreach { d =>
        val window = ((d - RollingQuantile.WindowDays + 1) to d)
          .flatMap(ed => days.get(ed).map(v => (v, ed))).sortBy(identity)
        val n = window.length
        val vs = window.map(_._1)
        val p50 = (vs(((n + 1) / 2 - 1).toInt) + vs(((n + 2) / 2 - 1).toInt)).toDouble / 2.0
        val p90 = vs(((9 * n + 9) / 10 - 1).toInt)
        assert(got((t, d)) == ((n.toLong, p50, p90)),
          s"($t,$d): ${got((t, d))} vs ($n,$p50,$p90)")
        checked += 1
      }
    }
    assert(checked > 100, s"replay barely exercised: $checked")
  }

  test("gaps shrink the window instead of polluting it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rq").toString
    // observed days 0,1,2, then a gap, then 10: day 10's window is only day 10
    spark.sql(
      """SELECT id AS event_id,
        | (1704067200L + element_at(array(0L, 1L, 2L, 10L), int(id + 1)) * 86400) * 1000000000 AS ts,
        | 1 AS user_id, 'x' AS event_type,
        | CAST(100 * (id + 1) AS DOUBLE) AS value, '' AS props
        |FROM range(4)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = RollingQuantile.rollingQuantile(spark, dir).collect()
      .map(r => r.getDate(1).toLocalDate.toEpochDay - 19723 ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // 2024-01-01 = epoch day 19723
    assert(got(0L) == ((1L, 100.0, 100L)))
    assert(got(1L) == ((2L, 150.0, 200L)))   // {100,200}: p50 midpoint, p90 max
    assert(got(2L) == ((3L, 200.0, 300L)))
    assert(got(10L) == ((1L, 400.0, 400L)), s"gap window polluted: ${got(10L)}")
  }
}
