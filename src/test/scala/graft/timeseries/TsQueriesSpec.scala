package graft.timeseries

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TsQueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def resampled =
    TsQueries.resampleDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2), r.getBoolean(3), r.getDouble(4)))

  test("resample produces a dense calendar per type with real gap days") {
    val rows = resampled
    assert(rows.exists(_._4), "test signal must contain gap days")
    rows.groupBy(_._1).foreach { case (tpe, days) =>
      val sorted = days.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._2.plusDays(1), s"$tpe: calendar must be dense at ${a._2}")
        case _ =>
      }
      // boundary days carry data by construction (span is min..max active day)
      assert(!sorted.head._4 && !sorted.last._4)
    }
  }

  test("gap days carry the last observed value forward and count zero events") {
    val rows = resampled
    rows.groupBy(_._1).values.foreach { days =>
      val sorted = days.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur._4 =>
          assert(cur._3 == 0L, "gap day must have n_events = 0")
          assert(cur._5 == prev._5, s"gap at ${cur._2} must carry ${prev._5}, got ${cur._5}")
        case _ =>
      }
    }
  }

  test("moving average over a 7-day range frame matches a recomputed window") {
    val byKey = TsQueries.movingAvg(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(2)), (r.getDouble(3), r.getLong(4))))
    val days = byKey.map { case ((tpe, ed), _) => (tpe, ed) }
    // recompute each frame brute-force from the daily aggregate
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "value")
      .collect()
      .map(r => (r.getString(0), LocalDate.parse(r.getString(1)).toEpochDay, r.getDouble(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, vs) => k -> vs.map(_._3).sum }
    byKey.foreach { case ((tpe, ed), (mavg, present)) =>
      val frame = daily.collect { case ((t, d), v) if t == tpe && d >= ed - 6 && d <= ed => v }
      assert(frame.nonEmpty)
      assert(present == frame.size.toLong, s"$tpe@$ed: days_present")
      val expected = BigDecimal(frame.sum / frame.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mavg - expected) < 1e-9, s"$tpe@$ed: $mavg vs $expected")
    }
    assert(days.nonEmpty)
  }

  test("anomaly flags: z iff enough history, threshold honored, spike detected") {
    val rows = TsQueries.anomaly(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, hist, z, anom) =>
      if (hist < TsQueries.MinHistoryDays)
        assert(z.isEmpty, s"$tpe: z with only $hist history days")
      assert(anom == z.exists(v => math.abs(v) >= TsQueries.AnomZ),
        s"$tpe: flag must be |z| >= ${TsQueries.AnomZ}")
    }
    assert(rows.exists(_._3.isDefined), "mature days must be scored")
    // a planted 100x spike on a synthetic stable stream must be flagged.
    // ts is written as raw NANOS (long) — the shape Tables.events reads
    // (TIMESTAMP(NANOS) under the nanosAsLong conf); 1704110400 =
    // 2024-01-01T12:00:00Z, one row per (type, day) over 30 days × 2 types
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_anom").toString
    spark.range(60)
      .selectExpr("concat('type_', id % 2) AS event_type",
        "(1704110400L + (id div 2) * 86400L) * 1000000000L AS ts",
        "CASE WHEN id = 58 THEN 5000.0 ELSE 40.0 + (id % 7) END AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flagged = TsQueries.anomaly(spark, dir)
      .filter("is_anomaly").collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(flagged.toSeq == Seq(("type_0", "2024-01-30")), s"got ${flagged.toSeq}")
  }

  test("interpolate: observed days keep their value, gap days sit on the straight line") {
    val rows = TsQueries.interpolate(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getBoolean(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.exists(_._3), "test signal must contain gap days")
    rows.groupBy(_._1).foreach { case (tpe, days) =>
      val sorted = days.sortBy(_._2)
      // dense calendar, data on both boundaries
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2.plusDays(1), s"$tpe: hole at ${a._2}")
        case _ =>
      }
      assert(!sorted.head._3 && !sorted.last._3)
      val observed = sorted.filter(!_._3).map(d => (d._2.toEpochDay, d._4))
      sorted.filter(_._3).foreach { case (_, day, _, v, span) =>
        val d = day.toEpochDay
        val (pd, pv) = observed.filter(_._1 < d).maxBy(_._1)
        val (nd, nv) = observed.filter(_._1 > d).minBy(_._1)
        val expect = BigDecimal(pv + (nv - pv) * (d - pd) / (nd - pd))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(v - expect) < 1e-9, s"$tpe $day: $v != $expect")
        assert(span.contains(nd - pd), s"$tpe $day: span $span != ${nd - pd}")
      }
      // observed days: exact rounded daily value, no span
      sorted.filter(!_._3).foreach { case (_, _, _, _, span) => assert(span.isEmpty) }
    }
  }

  test("ewma equals a driver-side replay of the integer-weight definition") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.sum("value").as("raw_value"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        BigDecimal(r.getDouble(2) * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap
    val w = TsQueries.EwmaWeights
    val got = TsQueries.ewma(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        (r.getDouble(3), r.getLong(4))))
    assert(got.length == daily.size, "one ewma row per observed (type, day)")
    got.foreach { case ((tpe, ed), (ewma, present)) =>
      val contribs = (0 until TsQueries.EwmaWindow)
        .flatMap(k => daily.get((tpe, ed - k)).map(vc => (vc, w(k))))
      assert(present == contribs.size.toLong)
      val num = contribs.map { case (vc, wk) => vc * wk }.sum
      val den = contribs.map(_._2).sum
      val expect = BigDecimal(num.toDouble / den / 100.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ewma == expect, s"$tpe day $ed: $ewma != $expect")
    }
    // convexity: a normalized positive-weight average stays inside the
    // envelope of its contributing values
    got.foreach { case ((tpe, ed), (ewma, _)) =>
      val vs = (0 until TsQueries.EwmaWindow)
        .flatMap(k => daily.get((tpe, ed - k))).map(_ / 100.0)
      assert(ewma >= vs.min - 0.01 && ewma <= vs.max + 0.01)
    }
  }

  test("changepoint equals a driver-side replay and nails a planted level shift") {
    import org.apache.spark.sql.functions.{col, to_date, sum => ssum}
    // replay on the real corpus
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(ssum("value").as("raw"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        BigDecimal(r.getDouble(2)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap
    val got = TsQueries.changepoint(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
    val byType = daily.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    got.foreach { case ((tpe, ed), (nl, nr, score, _)) =>
      val days = byType(tpe)
      val vs = days.map(d => daily((tpe, d)))
      val i = days.indexOf(ed)
      assert(nl == i + 1L && nr == days.size - i - 1L)
      val (l, rr) = vs.splitAt(i + 1)
      val expect = BigDecimal(math.abs(l.sum.toDouble / l.size - rr.sum.toDouble / rr.size) *
        math.sqrt(l.size.toLong * rr.size.toDouble / vs.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == expect, s"$tpe@$ed: $score != $expect")
    }
    // exactly one peak per type, at the max score (ties → earliest day)
    got.groupBy(_._1._1).foreach { case (tpe, rows) =>
      val peaks = rows.filter(_._2._4)
      assert(peaks.length == 1, s"$tpe: ${peaks.length} peaks")
      val best = rows.maxBy { case ((_, d), (_, _, s2, _)) => (s2, -d) }
      assert(peaks.head._1 == best._1)
    }
    // planted shift: a stable series that jumps at a known day must peak
    // exactly at the jump under the implemented statistic
    val vs = (0 until 40).map(d => if (d < 20) 100.0 else 500.0)
    val scores = (0 until 39).map { i =>
      val (l, rr) = vs.splitAt(i + 1)
      math.abs(l.sum / l.size - rr.sum / rr.size) * math.sqrt(l.size * rr.size.toDouble / vs.size)
    }
    assert(scores.indexOf(scores.max) == 19, "statistic must peak at the planted shift")
  }

  test("ewma touches the fact table once: both consumers read the cached daily aggregate") {
    try {
      val p = TsQueries.ewma(spark, sf).queryExecution.executedPlan.toString
      // both consumers (contribution fan-out + observed-day join-back) must
      // read the cached daily aggregate; FileScan lines inside the cached
      // plan's build subtree still print, so count consumers, not scans
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) == 2)
    } finally graft.CacheRegistry.releaseAll()
  }

  test("autocorr equals a driver-side replay and nails a planted period") {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date, sum => ssum}
    // epoch day computed in-query (datediff, the operator's own definition)
    // — r.getDate round-trips through the JVM default TZ and can shift days
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(ssum("value").as("raw"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("ed"), col("raw"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        BigDecimal(r.getDouble(2)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap
    val got = TsQueries.autocorr(spark, sf).collect().map(r =>
      ((r.getString(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
    graft.CacheRegistry.releaseAll()
    assert(got.nonEmpty)
    got.foreach { case ((tpe, lag), (nPairs, acf)) =>
      // note: .toSeq BEFORE collect — collecting (va, vb) tuples out of a
      // Map would rebuild a Map keyed on va and silently dedup pairs
      val pairs = daily.toSeq.collect {
        case ((t, d), va) if t == tpe && daily.contains((t, d + lag)) =>
          (va, daily((t, d + lag)))
      }
      assert(nPairs == pairs.size.toLong, s"$tpe lag $lag: pair count")
      assert(nPairs >= TsQueries.AcfMinPairs)
      val n = pairs.size.toLong
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val sab = pairs.map(p => p._1 * p._2).sum
      val saa = pairs.map(p => p._1 * p._1).sum
      val sbb = pairs.map(p => p._2 * p._2).sum
      val va = n * saa - sa * sa; val vb = n * sbb - sb * sb
      if (va > 0 && vb > 0) {
        val expect = BigDecimal((n * sab - sa * sb).toDouble /
          math.sqrt(va.toDouble) / math.sqrt(vb.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(acf.contains(expect), s"$tpe lag $lag: $acf != $expect")
        assert(math.abs(expect) <= 1.0001)
      } else assert(acf.isEmpty)
    }
    // a planted alternating series must show strong negative lag-1 and
    // strong positive lag-2 autocorrelation (same nanos-long write shape
    // as the anomaly spec)
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_acf").toString
    spark.range(30)
      .selectExpr("'t' AS event_type",
        "(1704110400L + id * 86400L) * 1000000000L AS ts",
        "CASE WHEN id % 2 = 0 THEN 100.0 ELSE 200.0 END AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = TsQueries.autocorr(spark, dir).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) 0.0 else r.getDouble(3))).toMap
    graft.CacheRegistry.releaseAll()
    assert(planted(1L) < -0.9, s"lag-1 on alternating series: ${planted(1L)}")
    assert(planted(2L) > 0.9, s"lag-2 on alternating series: ${planted(2L)}")
  }

  test("forecast equals a driver-side replay and reproduces a pure weekly cycle") {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date, sum => ssum, round => sround}
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sround(sround(ssum(col("value")), 2) * 100).cast("long").as("vi"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("ed"), col("vi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = TsQueries.forecast(spark, sf).collect().map(r =>
      ((r.getString(0), r.getLong(2)), (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    graft.CacheRegistry.releaseAll()
    assert(got.nonEmpty)
    val byType = daily.groupBy(_._1)
    got.foreach { case ((tpe, h), (dow, level, seasonal, fc)) =>
      val series = byType(tpe).map(t => (t._2, t._3)).sortBy(_._1)
      val lastEd = series.map(_._1).max
      assert(dow == (lastEd + h + 3) % 7)
      val last7 = series.sortBy(-_._1).take(TsQueries.LevelDays.toInt).map(_._2)
      val lvl = last7.sum.toDouble / last7.size / 100.0
      val all = series.map(_._2)
      val mAll = all.sum.toDouble / all.size / 100.0
      val dowVals = series.filter(t => (t._1 + 3) % 7 == dow).map(_._2)
      val seas = if (dowVals.isEmpty) 0.0 else dowVals.sum.toDouble / dowVals.size / 100.0 - mAll
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(level == r4(lvl), s"$tpe h$h level")
      assert(seasonal == r4(seas), s"$tpe h$h seasonal")
      assert(fc == r4(lvl + seas), s"$tpe h$h forecast")
    }
    assert(got.count(_._1._2 == 1L) == byType.size, "one h=1 row per type")
    // a pure weekly cycle must forecast itself: v(day) = 100 + 10*dow
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_fc").toString
    spark.range(28)
      .selectExpr("'t' AS event_type",
        "(1704110400L + id * 86400L) * 1000000000L AS ts",
        "100.0 + 10.0 * ((19723 + id + 3) % 7) AS value") // 19723 = 2024-01-01 epoch day
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = TsQueries.forecast(spark, dir).collect()
      .map(r => r.getLong(3) -> r.getDouble(6)).toMap
    graft.CacheRegistry.releaseAll()
    (0L until 7L).foreach { d =>
      assert(math.abs(planted(d) - (100.0 + 10.0 * d)) < 1e-9,
        s"dow $d: ${planted(d)} != ${100.0 + 10.0 * d}")
    }
  }

  test("MAD outliers equal a driver-side replay and catch a planted spike z hides less robustly") {
    import org.apache.spark.sql.functions.{col, to_date, sum => ssum, round => sround}
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .agg(sround(ssum(col("value"))).cast("long").as("vi"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val got = TsQueries.outlierMad(spark, sf).collect().map(r =>
      ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    graft.CacheRegistry.releaseAll()
    assert(got.keySet == daily.map(_._1).toSet)
    daily.groupBy(_._1._1).foreach { case (tpe, rows) =>
      val vs = rows.map(_._2.toDouble)
      val med = median(vs)
      val mad = median(vs.map(v => math.abs(v - med)))
      rows.foreach { case ((_, day), vi) =>
        val (gvi, gmed, gmad, flag) = got((tpe, day))
        assert(gvi == vi && gmed == med && gmad == mad, s"$tpe $day stats")
        assert(flag == (math.abs(vi - med) > TsQueries.MadK * TsQueries.MadC * mad),
          s"$tpe $day flag")
      }
    }
    // planted: stable 40..46 + one 5000 spike — MAD flags exactly the spike
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_mad").toString
    spark.range(30)
      .selectExpr("'t' AS event_type",
        "(1704110400L + id * 86400L) * 1000000000L AS ts",
        "CASE WHEN id = 17 THEN 5000.0 ELSE 40.0 + (id % 7) END AS value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flagged = TsQueries.outlierMad(spark, dir).filter("is_outlier").collect()
      .map(r => r.getDate(1).toString)
    graft.CacheRegistry.releaseAll()
    assert(flagged.toSeq == Seq("2024-01-18"), s"got ${flagged.toSeq}")
  }

  test("resample touches the fact table once: explode runs on aggregated rows") {
    val p = TsQueries.resampleDaily(spark, sf).queryExecution.executedPlan.toString
    // the calendar explode must sit above the per-type min/max aggregate,
    // never against the raw scan — one Generate, fed by an aggregate
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1)
    val genIdx = p.linesIterator.indexWhere(_.contains("Generate explode"))
    val aggBelow = p.linesIterator.drop(genIdx).exists(_.contains("HashAggregate"))
    assert(aggBelow, "explode must consume the min/max aggregate, not raw facts")
  }
}
