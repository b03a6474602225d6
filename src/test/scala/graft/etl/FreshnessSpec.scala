package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `etl_freshness` contract: staleness is measured against the corpus
  * frontier (never wall-clock), replays driver-side, and a planted
  * silent feed crosses the SLA while live feeds do not. */
class FreshnessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("staleness replays from per-type max days vs the corpus frontier") {
    val days = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
    val frontier = days.map(_._2).max
    val byType = days.groupBy(_._1)
    val got = SparkEntry.queries("etl_freshness")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == byType.keySet)
    got.foreach { r =>
      val t = r.getString(0)
      val lastDay = byType(t).map(_._2).max
      assert(r.getLong(1) == byType(t).size.toLong)
      assert(r.getDate(2).toLocalDate.toEpochDay == lastDay)
      assert(r.getLong(3) == frontier - lastDay)
      assert(r.getBoolean(4) == (frontier - lastDay > Freshness.StaleDays))
    }
  }

  test("a planted silent feed crosses the SLA; live feeds stay fresh") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("fresh").toString
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    (Seq((0L, ts(100), 1L, 1.0, "live", "{}"), (1L, ts(99), 2L, 1.0, "live", "{}")) ++
      Seq((2L, ts(80), 3L, 1.0, "silent", "{}")))
      .toDF("event_id", "ts", "user_id", "value", "event_type", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("etl_freshness")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got("live") == (0L, false))
    assert(got("silent") == (20L, true), "20 days behind must flag stale")
  }
}
