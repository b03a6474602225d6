package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_benford`: driver-side replay, the non-Benford synthetic corpus is
  * flagged, and a planted log-uniform sample (Weyl sequence exponents —
  * equidistributed, hence Benford) passes every digit. */
class BenfordSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collect(dir: String) =
    SketchQueries.benford(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap

  test("digits equal a driver-side replay; the four-decade corpus passes") {
    val values = graft.Tables.events(spark, sf).select("value").collect()
      .map(_.getDouble(0))
      .map(v => BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      .filter(_ > 0)
    val counts = values.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val got = collect(sf)
    assert(got.keySet == counts.keySet)
    got.foreach { case (d, (n, share, exp, chi2, dev)) =>
      assert(n == counts(d), s"digit $d count")
      val s4 = BigDecimal(n.toDouble / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(share == s4)
      assert(exp == SketchQueries.BenfordShares(d.toInt - 1))
      val expChi = BigDecimal((s4 - exp) * (s4 - exp) / exp * total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(chi2 == expChi, s"digit $d chi2")
      assert(dev == (math.abs(s4 - exp) > 0.02))
    }
    // the four-decade synthetic value column lands close to Benford — the
    // audit passes it (the planted single-decade test below is the flag case)
    assert(got.values.forall(!_._5), s"near-Benford corpus flagged: $got")
  }

  test("a single-decade uniform corpus is flagged") {
    // values uniform in [100, 1000): every leading digit equally likely
    // (share ~0.111), far from Benford's 0.301 for digit 1
    val dir = java.nio.file.Files.createTempDirectory("graft_benford_flat").toString
    spark.range(3600)
      .selectExpr("id AS event_id", "(1704110400L + id) * 1000000000L AS ts",
        "id % 7 AS user_id", "'x' AS event_type",
        "100.0 + (id % 900) AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = collect(dir)
    assert(planted(1L)._5, s"digit 1 must flag on flat data: ${planted(1L)}")
    assert(planted.values.count(_._5) >= 2, s"flat corpus barely flagged: $planted")
  }

  test("a planted log-uniform sample passes every digit") {
    // value = 10^(3 * frac(i * phi)): equidistributed exponents => Benford
    val dir = java.nio.file.Files.createTempDirectory("graft_benford").toString
    spark.range(4000)
      .selectExpr("id AS event_id", "(1704110400L + id) * 1000000000L AS ts",
        "id % 7 AS user_id", "'x' AS event_type",
        "pow(10.0, 3.0 * ((id * 0.6180339887498949) % 1.0)) AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = collect(dir)
    assert(planted.size == 9, s"digits seen: ${planted.keySet}")
    planted.foreach { case (d, (_, share, exp, _, dev)) =>
      assert(!dev, s"digit $d deviant on log-uniform data: share $share vs $exp")
    }
  }
}
