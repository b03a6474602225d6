package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ts_theilsen` contract: slope and intercept replay from first
  * principles driver-side (pairwise slopes, the declared order-statistic
  * median rule for both); a planted exact linear series pins slope and
  * intercept EXACTLY (every pairwise slope identical); a planted series
  * with 25% corrupted days must still recover the clean slope — the
  * robustness property that is the operator's reason to exist (and where
  * `ts_trend`'s least-squares line demonstrably bends). */
class TheilSenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val p = s.length
    (s((p + 1) / 2 - 1) + s(p / 2)) / 2.0
  }

  private def replica(daily: Seq[(Long, Long)]): (Long, Double, Double) = {
    val d = daily.sortBy(_._1)
    val slopes = for (i <- d.indices; j <- i + 1 until d.length)
      yield (d(j)._2 - d(i)._2).toDouble / (d(j)._1 - d(i)._1)
    val sl = median(slopes)
    val ed0 = d.map(_._1).min
    val resid = d.map { case (ed, vi) => vi.toDouble - sl * (ed - ed0).toDouble }
    (slopes.length.toLong, sl, median(resid))
  }

  private def r(x: Double, s: Int): Double = java.math.BigDecimal.valueOf(x)
    .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("slope and intercept replay from first principles at sf0.001") {
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(datediff(to_date(ts), date'1970-01-01') as long) AS ed", "value")
      .collect().map(rr => (rr.getString(0), rr.getLong(1), rr.getDouble(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((tpe, ed), g) => (tpe, ed, r0(g.map(_._3).sum)) }
      .toSeq.groupBy(_._1)
    val got = SparkEntry.queries("ts_theilsen")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { rr =>
      val tpe = rr.getString(0)
      val (np, sl, ic) = replica(daily(tpe).map(t => (t._2, t._3)))
      assert(rr.getLong(1) == daily(tpe).size.toLong)
      assert(rr.getLong(2) == np, s"$tpe n_pairs diverged")
      assert(rr.getDouble(3) == r(sl, 6), s"$tpe slope diverged")
      assert(rr.getDouble(4) == r(ic, 4), s"$tpe intercept diverged")
    }
    graft.CacheRegistry.releaseAll()
  }

  private def writeEvents(d: String, rows: Seq[(Long, String, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, day, tpe, v) =>
      (id, java.sql.Timestamp.valueOf(s"$day 12:00:00"), id % 10, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
  }

  test("exact linear series pins slope/intercept exactly; 25% corruption cannot bend it") {
    val d = java.nio.file.Files.createTempDirectory("tsen").toString
    val days = (1 to 20).map(i => f"2024-01-$i%02d")
    // clean: v = 100 + 3*x; corrupt: same line, every 4th day +1000
    writeEvents(d,
      days.zipWithIndex.map { case (day, i) => (i.toLong, day, "clean", 100.0 + 3.0 * i) } ++
        days.zipWithIndex.map { case (day, i) =>
          (100L + i, day, "dirty", 100.0 + 3.0 * i + (if (i % 4 == 3) 1000.0 else 0.0)) })
    val got = SparkEntry.queries("ts_theilsen")(spark, d).collect()
      .map(rr => rr.getString(0) -> ((rr.getDouble(3), rr.getDouble(4)))).toMap
    assert(got("clean") == ((3.0, 100.0)),
      s"exact line must give slope 3, intercept 100: ${got("clean")}")
    assert(got("dirty")._1 == 3.0,
      s"Theil-Sen must shrug off 25% corrupted days: ${got("dirty")}")
    graft.CacheRegistry.releaseAll()
  }
}
