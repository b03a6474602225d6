package graft.timeseries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ts_holtwinters` contract: the discounted-LS level/trend + frozen
  * weekday-seasonal forecast replays from first principles on the corpus;
  * planted anchors pin the exact semantics — a constant series forecasts
  * itself (level = const, trend = 0, seasonal = 0), and a pure weekday
  * cycle over full weeks is recovered EXACTLY (integer seasonal indices,
  * zero trend, forecast = level + index); a trending series must carry a
  * positive per-day trend into the horizon (the capability `ts_forecast`'s
  * flat level lacks). */
class HoltWintersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def rnd4(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** First-principles replica of hwFrom over (type, ed, cents) rows. */
  private def replica(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Double, Double, Double, Double)] =
    rows.groupBy(_._1).flatMap { case (et, rs) =>
      val byEd = rs.map(r => r._2 -> r._3)
      val lastEd = byEd.map(_._1).max
      val sa = byEd.map(_._2).sum
      val na = byEd.size
      val s0: Map[Long, Long] = byEd.groupBy { case (ed, _) => (ed + 3) % 7 }
        .map { case (dw, g) =>
          dw -> java.math.BigDecimal.valueOf(
              g.map(_._2).sum.toDouble / g.size - sa.toDouble / na)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        }
      val win = byEd.filter(_._1 > lastEd - TsQueries.EwmaWindow)
      var (sw, sk, skk, sx, skx) = (0L, 0L, 0L, 0L, 0L)
      win.foreach { case (ed, vi) =>
        val k = lastEd - ed
        val w = TsQueries.EwmaWeights(k.toInt)
        val x = vi - s0((ed + 3) % 7)
        sw += w; sk += w * k; skk += w * k * k; sx += w * x; skx += w * k * x
      }
      val disc = sw.toDouble * skk.toDouble - sk.toDouble * sk.toDouble
      val slope =
        if (disc > 0) (sw.toDouble * skx.toDouble - sk.toDouble * sx.toDouble) / disc
        else 0.0
      val level = (sx.toDouble - slope * sk.toDouble) / sw.toDouble
      (1L to TsQueries.ForecastH).map { h =>
        val dow = (lastEd + h + 3) % 7
        val sc = s0.getOrElse(dow, 0L).toDouble
        (et, h) -> ((rnd4(level / 100.0), rnd4(-slope / 100.0),
          rnd4(sc / 100.0), rnd4((level + h * (-slope) + sc) / 100.0)))
      }
    }

  private def collectHw(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Double, Double, Double, Double)] = {
    val got = HoltWinters.hwFrom(rows.toDF("event_type", "ed", "vi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    graft.CacheRegistry.releaseAll()
    got
  }

  test("forecast replays from first principles on the corpus daily series") {
    val base = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value")).as("raw_value"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("ed"),
        round(round(col("raw_value"), 2) * 100).cast("long").as("vi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = replica(base)
    val got = SparkEntry.queries("ts_holtwinters")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    graft.CacheRegistry.releaseAll()
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(v == exp(k), s"$k: $v != ${exp(k)}") }
  }

  test("constant series forecasts itself exactly: level = const, trend = 0, seasonal = 0") {
    val rows = (0L until 20L).map(ed => ("t", ed, 5000L))
    val got = collectHw(rows)
    (1L to 7L).foreach { h =>
      assert(got(("t", h)) == ((50.0, 0.0, 0.0, 50.0)), s"h=$h: ${got(("t", h))}")
    }
  }

  test("pure weekday cycle over full weeks is recovered exactly") {
    // vi = 10000 + 100·dow over exactly 3 weeks: each weekday mean is
    // 10000 + 100·dow, global mean 10300 → integer seasonal indices
    // 100·(dow−3); deseasonalized x ≡ 10300 → zero trend, level 103.00,
    // forecast = 103 + (dow − 3) exactly.
    val rows = (0L until 21L).map { ed =>
      val dow = (ed + 3) % 7
      ("t", ed, 10000L + 100L * dow)
    }
    val got = collectHw(rows)
    (1L to 7L).foreach { h =>
      val dow = (20L + h + 3) % 7
      val expSeason = (100L * dow - 300L).toDouble / 100.0
      assert(got(("t", h)) == ((103.0, 0.0, expSeason, 103.0 + expSeason)),
        s"h=$h dow=$dow: ${got(("t", h))}")
    }
  }

  test("a trending series carries a positive per-day trend into the horizon") {
    // 3 units/day growth. The frozen weekday indices absorb the
    // within-week part of a pure trend (deseasonalized x becomes a weekly
    // staircase — the declared bias of frozen indices vs full coupled HW),
    // so the recency-weighted slope reads below the raw 3.0; pin that it
    // is still a MATERIAL positive trend plus exact replica equality —
    // the capability under test is "growth reaches the horizon at all",
    // which seasonal-naive ts_forecast structurally cannot do.
    val rows = (0L until 21L).map(ed => ("t", ed, 10000L + 300L * ed))
    val got = collectHw(rows)
    val exp = replica(rows)
    got.foreach { case (k, v) => assert(v == exp(k), s"$k: $v != ${exp(k)}") }
    val trend = got(("t", 1L))._2
    assert(trend > 1.0 && trend < 4.0, s"trend $trend out of band")
    assert(got(("t", 7L))._4 > got(("t", 1L))._4,
      "forecast must grow across the horizon for a growing series")
  }
}
