package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_gini` / `stats_ks`: driver-side replays on the synthetic corpus
  * plus planted flag/no-flag cases for each statistic. */
class ConcentrationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def writeEvents(dir: String, rows: String): Unit =
    spark.range(0).sparkSession.sql(rows)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("gini equals a driver-side replay of the exact integer form") {
    val counts = graft.Tables.events(spark, sf)
      .groupBy("event_type", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Concentration.gini(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == counts.keySet)
    counts.foreach { case (t, cs) =>
      val n = cs.length.toLong
      val s = cs.sum
      val w = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      val g = BigDecimal((2.0 * w - (n + 1) * s) / (n.toDouble * s))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(t) == ((n, s, g)), s"type $t: ${got(t)} vs ($n,$s,$g)")
    }
  }

  test("a one-whale corpus flags concentrated; a uniform one does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gini").toString
    writeEvents(dir,
      """SELECT id AS event_id, (1704110400 + id) * 1000000000 AS ts,
        | CASE WHEN id < 900 THEN CAST(0 AS BIGINT) ELSE id END AS user_id,
        | 'whale' AS event_type, 1.0 AS value, '' AS props
        |FROM range(1000)
        |UNION ALL
        |SELECT 10000 + id, (1704110400 + id) * 1000000000, id % 100,
        | 'uniform', 1.0, '' FROM range(1000)""".stripMargin)
    val got = Concentration.gini(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(got("whale")._2, s"whale corpus must flag: ${got("whale")}")
    assert(!got("uniform")._2, s"uniform corpus must not flag: ${got("uniform")}")
    assert(got("uniform")._1 == 0.0, "identical per-user counts have G = 0")
  }

  test("ks equals a driver-side exact-integer replay") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_date(to_date(ts)) AS ed",
        "cast(round(value * 100) as long) AS v").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val eds = rows.map(_._2)
    val mid = (eds.min + eds.max) / 2
    val got = Concentration.ks(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(5))).toMap
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val s1 = rs.filter(_._2 <= mid).map(_._3)
      val s2 = rs.filter(_._2 > mid).map(_._3)
      val (n1, n2) = (s1.length.toLong, s2.length.toLong)
      val values = (s1 ++ s2).distinct.sorted
      val dnum = values.map { x =>
        math.abs(s1.count(_ <= x) * n2 - s2.count(_ <= x) * n1)
      }.max
      val d4 = BigDecimal(dnum.toDouble / (n1 * n2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val shifted = dnum.toDouble / (n1 * n2) >
        Concentration.KsCoeff * math.sqrt((n1 + n2).toDouble / (n1 * n2))
      assert(got(t) == ((n1, n2, d4, shifted)), s"type $t: ${got(t)} vs ($n1,$n2,$d4,$shifted)")
    }
  }

  test("a variance-doubled second half flags at constant mean; a stable feed does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ks").toString
    // day 0..99; first half values 100±10 (tight), second half 100±40 (wide):
    // the mean never moves, only the shape — exactly what KS exists to catch
    writeEvents(dir,
      """SELECT id AS event_id, (1704110400 + (id * 86400 div 20)) * 1000000000 AS ts,
        | id % 7 AS user_id, 'drift' AS event_type,
        | CAST(CASE WHEN id < 1000 THEN 100 + (id % 21) - 10
        |      ELSE 100 + (id % 81) - 40 END AS DOUBLE) AS value, '' AS props
        |FROM range(2000)
        |UNION ALL
        |SELECT 10000 + id, (1704110400 + (id * 86400 div 20)) * 1000000000,
        | id % 7, 'stable', CAST(100 + (id % 21) - 10 AS DOUBLE), '' FROM range(2000)""".stripMargin)
    val got = Concentration.ks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(5))).toMap
    assert(got("drift")._2, s"shape drift must flag: ${got("drift")}")
    assert(!got("stable")._2, s"stable feed must not flag: ${got("stable")}")
  }
}
