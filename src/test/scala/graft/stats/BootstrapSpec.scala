package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `stats_bootstrap` contract: the whole Poisson-bootstrap chain replays
  * from first principles driver-side (md5 multiplicities, exact-integer
  * weighted sums, fixed-form replicate means, order-statistic CI), the
  * hash multiplicities actually behave like Poisson(1) (mean ≈ 1, capped
  * at MaxK), a planted constant-valued type pins the degenerate interval
  * (ci_lo = ci_hi = the constant — weights cannot move a constant mean),
  * and the full-corpus mean sits inside its own CI. */
class BootstrapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def weight(eventId: Long, b: Int): Long = {
    val h = java.lang.Long.parseLong(md5hex(eventId.toString).take(12), 16)
    val hu = ((2L * b + 1L) * h + 40503L * b + 13L) % Bootstrap.HSpace
    Bootstrap.Thresholds.count(t => hu >= t).toLong
  }

  private def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("the full chain replays from first principles at sf0.001") {
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val rows = graft.Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r0(r.getDouble(2) * 10000.0)))
    val got = SparkEntry.queries("stats_bootstrap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (tpe, nRows, meanFull, nReps, ciLo, ciHi) =>
      val mine = rows.filter(_._1 == tpe)
      assert(nRows == mine.length.toLong)
      assert(meanFull == r4(mine.map(_._3).sum.toDouble / mine.length / 10000.0))
      val means = (0 until Bootstrap.B).flatMap { b =>
        var skv = 0L; var sk = 0L
        mine.foreach { case (_, id, vi) =>
          val k = weight(id, b); skv += k * vi; sk += k
        }
        if (sk > 0L) Some(skv.toDouble / sk / 10000.0) else None
      }.sorted
      assert(nReps == means.length.toLong)
      val off = (means.length * 25) / 1000
      assert(ciLo == r4(means(off)), s"$tpe ci_lo diverged")
      assert(ciHi == r4(means(means.length - off - 1)), s"$tpe ci_hi diverged")
      assert(ciLo <= meanFull && meanFull <= ciHi,
        s"$tpe: full mean $meanFull outside [$ciLo, $ciHi]")
    }
  }

  test("hash multiplicities behave like Poisson(1): mean ~ 1, capped at MaxK") {
    val n = 20000
    val ws = (0 until n).map(i => weight(i.toLong, i % Bootstrap.B))
    val mean = ws.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.02, s"mean multiplicity $mean drifted from 1")
    assert(ws.max <= Bootstrap.MaxK.toLong)
    // the zero class carries e^-1 of the mass (the resample-misses-row rate)
    val p0 = ws.count(_ == 0L).toDouble / n
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"P(k=0) $p0 drifted from 1/e")
  }

  test("planted constant-valued type yields the degenerate interval at the constant") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("boot").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((1 to 50).map(i => (i.toLong, ts, i.toLong, "flat", 7.25, "{}")) ++
      (1 to 50).map(i => (100L + i, ts, i.toLong, "mixed", i.toDouble, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("stats_bootstrap")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(4), r.getDouble(5)))).toMap
    val (fMean, fLo, fHi) = got("flat")
    assert(fMean == 7.25 && fLo == 7.25 && fHi == 7.25,
      s"constant type must pin the degenerate CI: $fMean [$fLo, $fHi]")
    val (_, mLo, mHi) = got("mixed")
    assert(mLo < mHi, "a dispersed type must produce a non-degenerate CI")
  }
}
