package graft.timeseries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ts_mannkendall` contract: S, the tie-corrected var18, z, and the
  * verdict replay from first principles driver-side at sf0.001; a planted
  * strictly-increasing series pins S = n(n−1)/2 with `trending`; a planted
  * constant series pins the all-ties guard (var18 = 0 ⇒ z NULL, never a
  * fake trend). */
class MannKendallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def replica(daily: Seq[(java.time.LocalDate, Long)])
      : (Long, Long, Long, Option[Double], Boolean) = {
    val vs = daily.sortBy(_._1.toEpochDay).map(_._2)
    val n = vs.length.toLong
    val s = (for (i <- vs.indices; j <- i + 1 until vs.length)
      yield java.lang.Long.signum(vs(j) - vs(i)).toLong).sum
    val tie18 = vs.groupBy(identity).values
      .map { g => val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie18
    val z = if (var18 > 0)
      Some(if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0)
    else None
    (n, s, var18, z, z.exists(v => math.abs(v) >= MannKendall.ZBound))
  }

  private def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("S, var18, z, and the verdict replay from first principles at sf0.001") {
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((tpe, day), g) =>
        (tpe, java.time.LocalDate.parse(day), r0(g.map(_._3).sum)) }
      .toSeq.groupBy(_._1)
    val got = SparkEntry.queries("ts_mannkendall")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val tpe = r.getString(0)
      val (n, s, var18, z, trend) = replica(daily(tpe).map(t => (t._2, t._3)))
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == var18,
        s"$tpe integer stats diverged")
      z match {
        case Some(v) => assert(r.getDouble(4) == r4(v), s"$tpe z diverged")
        case None => assert(r.isNullAt(4))
      }
      assert(r.getBoolean(5) == trend)
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

  test("strictly increasing series pins S = n(n-1)/2 and trends; constant series never does") {
    val d = java.nio.file.Files.createTempDirectory("mk").toString
    val days = (1 to 20).map(i => f"2024-01-$i%02d")
    writeEvents(d,
      days.zipWithIndex.map { case (day, i) => (i.toLong, day, "up", (i + 1) * 10.0) } ++
        days.zipWithIndex.map { case (day, i) => (100L + i, day, "flat", 5.0) })
    val got = SparkEntry.queries("ts_mannkendall")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val up = got("up")
    assert(up.getLong(2) == 20L * 19L / 2L, "monotone S must be every pair")
    assert(up.getBoolean(5), "a strictly increasing series must trend")
    val flat = got("flat")
    assert(flat.getLong(2) == 0L && flat.getLong(3) == 0L)
    assert(flat.isNullAt(4) && !flat.getBoolean(5),
      "all-ties variance 0 must yield NULL z and no trend")
    graft.CacheRegistry.releaseAll()
  }
}
