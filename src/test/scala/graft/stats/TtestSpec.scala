package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_ttest` contract: exact driver-side replay of the Welch statistic
  * from the integer moments, flag consistency, and a planted level
  * separation that must flag (and a same-level pair that must not). */
class TtestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collectT(dir: String) = {
    val out = Correlation.ttestMatrix(spark, dir).collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)), r.getBoolean(7)))).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("welch t equals a driver-side replay from the daily integer values") {
    import org.apache.spark.sql.functions.{col, to_date, sum => ssum, round => sround}
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sround(ssum(col("value"))).cast("long").as("vi"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val byType = daily.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = collectT(sf)
    assert(got.nonEmpty)
    got.foreach { case ((ta, tb), (na, nb, t, sep)) =>
      val (va, vb) = (byType(ta), byType(tb))
      assert(na == va.size.toLong && nb == vb.size.toLong)
      def mom(v: Seq[Long]) = (v.size.toLong, v.sum, v.map(x => x * x).sum)
      val (n1, s1, ss1) = mom(va); val (n2, s2, ss2) = mom(vb)
      if (n1 >= 2 && n2 >= 2 && (n1 * ss1 - s1 * s1) + (n2 * ss2 - s2 * s2) > 0) {
        val var1 = (n1 * ss1 - s1 * s1).toDouble / (n1 * (n1 - 1))
        val var2 = (n2 * ss2 - s2 * s2).toDouble / (n2 * (n2 - 1))
        val expect = BigDecimal((s1.toDouble / n1 - s2.toDouble / n2) /
          math.sqrt(var1 / n1 + var2 / n2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(t.contains(expect), s"($ta,$tb): $t != $expect")
        assert(sep == (math.abs(expect) >= Correlation.TtestFlag))
      } else assert(t.isEmpty && !sep)
    }
  }

  test("a planted 10x level separation flags; a same-level pair does not") {
    // 20 days x 3 types: lo1/lo2 ~ 100 +- small noise, hi ~ 1000
    val dir = java.nio.file.Files.createTempDirectory("graft_ttest").toString
    spark.range(60)
      .selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'hi' WHEN id % 3 = 1 THEN 'lo1' ELSE 'lo2' END AS event_type",
        "(1704110400L + (id div 3) * 86400L) * 1000000000L AS ts",
        "CASE WHEN id % 3 = 0 THEN 1000.0 + (id % 7) ELSE 100.0 + (id % 7) END AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = collectT(dir)
    assert(got(("hi", "lo1"))._4, "10x separation must flag")
    assert(got(("hi", "lo2"))._4, "10x separation must flag")
    assert(!got(("lo1", "lo2"))._4, s"same-level pair flagged: ${got(("lo1", "lo2"))}")
  }
}
