package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ts_cross_corr`: driver-side replay of the exact-moment CCF and a
  * planted 2-day lead that must peak at lag +2. */
class CrossCorrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("ccf equals a driver-side replay of the exact integer moments") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "datediff(to_date(ts), date'1970-01-01') AS ed", "value")
      .groupBy("event_type", "ed")
      .agg(org.apache.spark.sql.functions.expr("cast(round(sum(value)) as long)").as("vi"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val types = byType.keys.toSeq.sorted
    val got = CrossCorr.crossCorr(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))).toMap
    for (ta <- types; tb <- types if ta < tb; lag <- -CrossCorr.MaxLag to CrossCorr.MaxLag) {
      val sa = byType(ta); val sb = byType(tb)
      val pairs = sa.keys.toSeq.filter(ed => sb.contains(ed + lag))
        .map(ed => (sa(ed), sb(ed + lag)))
      if (pairs.length >= CrossCorr.MinPairs) {
        val n = pairs.length.toLong
        val (svA, svB) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sab = pairs.map(p => p._1 * p._2).sum
        val saa = pairs.map(p => p._1 * p._1).sum
        val sbb = pairs.map(p => p._2 * p._2).sum
        val varA = (n * saa - svA * svA).toDouble
        val varB = (n * sbb - svB * svB).toDouble
        val exp = if (varA > 0 && varB > 0)
          Some(BigDecimal((n * sab - svA * svB).toDouble / math.sqrt(varA) / math.sqrt(varB))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
        val (gn, gc, _) = got((ta, tb, lag))
        assert(gn == n && gc == exp, s"($ta,$tb,$lag): ($gn,$gc) vs ($n,$exp)")
      } else assert(!got.contains((ta, tb, lag)))
    }
    // exactly one peak per emitted pair
    got.keys.groupBy(k => (k._1, k._2)).foreach { case (p, ks) =>
      assert(ks.count(k => got(k)._3) == 1, s"pair $p peak count")
    }
  }

  test("a planted 2-day lead peaks at lag +2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ccf").toString
    // 'aaa' carries a strong day-varying signal; 'bbb' repeats it 2 days later
    spark.sql(
      """SELECT id AS event_id, (1704110400 + (id div 5) * 86400) * 1000000000 AS ts,
        | id % 7 AS user_id, 'aaa' AS event_type,
        | CAST(100 + 97 * sin(CAST(id div 5 AS DOUBLE) * 0.7) AS DOUBLE) AS value,
        | '' AS props
        |FROM range(300)
        |UNION ALL
        |SELECT 10000 + id, (1704110400 + ((id div 5) + 2) * 86400) * 1000000000,
        | id % 7, 'bbb',
        | CAST(100 + 97 * sin(CAST(id div 5 AS DOUBLE) * 0.7) AS DOUBLE), ''
        |FROM range(300)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = CrossCorr.crossCorr(spark, dir).collect()
      .filter(r => r.getString(0) == "aaa" && r.getString(1) == "bbb")
    val peak = rows.find(_.getBoolean(5)).get
    assert(peak.getLong(2) == 2L, s"peak at lag ${peak.getLong(2)}, expected +2")
    assert(peak.getDouble(4) > 0.99, s"peak ccf ${peak.getDouble(4)}")
  }
}
