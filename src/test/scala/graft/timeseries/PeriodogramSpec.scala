package graft.timeseries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ts_periodogram` contract: every readout replays from first principles
  * on the corpus daily frame under the frozen trig table; planted series
  * pin the physics — a 7-periodic spike train dominates at period 7 with
  * exactly the 1/3 variance share its three-harmonic spectrum predicts, a
  * Nyquist alternation pins power_frac = 2.0 exactly (the DFT-endpoint
  * factor), and a constant series pins the NULL guard. */
class PeriodogramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private val trig: Map[(Int, Int), (Long, Long)] =
    Periodogram.Trig.map { case (p, k, c, s) => (p, k) -> (c, s) }.toMap

  /** Pure-Scala periodogram over a (type, ed, vi) daily frame. */
  private def replica(daily: Seq[(String, Long, Long)])
    : Map[(String, Long), (Long, Long, Long, Option[Double], Boolean)] = {
    daily.groupBy(_._1).flatMap { case (et, rows) =>
      val n = rows.size.toLong
      val mc = java.math.BigDecimal.valueOf(rows.map(_._3).sum.toDouble / n)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val xs = rows.map { case (_, ed, vi) => (ed, vi - mc) }
      val sxx = xs.map { case (_, x) => x * x }.sum
      val per = (2 to 14).map { p =>
        val sc = xs.map { case (ed, x) => x * trig((p, (ed % p).toInt))._1 }.sum
        val ss = xs.map { case (ed, x) => x * trig((p, (ed % p).toInt))._2 }.sum
        val pf = if (sxx > 0) Some(round6(2.0 * (sc.toDouble * sc.toDouble +
          ss.toDouble * ss.toDouble) / (n.toDouble * sxx.toDouble * math.pow(2.0, 40))))
        else None
        (p.toLong, sc, ss, pf)
      }
      val dom = per.sortBy { case (p, _, _, pf) => (-pf.getOrElse(-1.0), p) }.head._1
      per.map { case (p, sc, ss, pf) =>
        (et, p) -> (n, sc, ss, pf, sxx > 0 && p == dom)
      }
    }
  }

  test("all readouts replay from first principles on the corpus at sf0.001") {
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value")).as("raw"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("ed"),
        round(round(col("raw"), 2) * 100).cast("long").as("vi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = replica(daily)
    val got = SparkEntry.queries("ts_periodogram")(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (n, sc, ss, pf, dom) = expect((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == sc && r.getLong(4) == ss,
        s"${r.getString(0)}/p=${r.getLong(1)}: moment mismatch")
      pf match {
        case Some(v) => assert(r.getDouble(5) == v)
        case None => assert(r.isNullAt(5))
      }
      assert(r.getBoolean(6) == dom)
    }
    graft.CacheRegistry.releaseAll()
  }

  private def runOn(daily: Seq[(String, Long, Long)]) = {
    val rows = Periodogram.periodogramFrom(spark,
      daily.toDF("event_type", "ed", "vi")).collect()
    graft.CacheRegistry.releaseAll()
    rows
  }

  test("7-periodic spike train: dominant at period 7 with exactly its 1/3 harmonic share") {
    // x = (6a,-a,...,-a) repeating, 4 full weeks: zero mean exactly; the
    // spike's variance splits equally across the 3 conjugate harmonic
    // pairs (1/7, 2/7, 3/7) and the integer grid only measures 1/7 → the
    // fundamental carries 1/3 of Σx², and nothing else on the grid sees it
    val daily = (0L until 28L).map(d =>
      ("spike", d, if (d % 7 == 0) 600L else -100L))
    val rows = runOn(daily)
    val dom = rows.filter(_.getBoolean(6))
    assert(dom.length == 1 && dom.head.getLong(1) == 7L,
      s"dominant must be the fundamental: ${dom.toSeq}")
    assert(math.abs(dom.head.getDouble(5) - 1.0 / 3.0) < 0.01,
      s"fundamental share must be ~1/3: ${dom.head.getDouble(5)}")
  }

  test("Nyquist alternation: power_frac = 2.0 exactly at p = 2") {
    val daily = (0L until 28L).map(d => ("alt", d, if (d % 2 == 0) 100L else -100L))
    val rows = runOn(daily)
    val p2 = rows.find(_.getLong(1) == 2L).get
    assert(p2.getDouble(5) == 2.0 && p2.getBoolean(6),
      s"Nyquist cosine has squared norm n, not n/2: $p2")
  }

  test("constant series: NULL power, no dominant row") {
    val rows = runOn((0L until 10L).map(d => ("flat", d, 500L)))
    assert(rows.length == 13)
    rows.foreach { r => assert(r.isNullAt(5) && !r.getBoolean(6)) }
  }
}
