package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.timeseries.TsQueries

class StreamAnomalySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[StreamAnomaly.DailyVolume]])
      : Seq[StreamAnomaly.VolFlag] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamAnomaly.DailyVolume]
    val q = StreamAnomaly.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("anom_out").as[StreamAnomaly.VolFlag].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS anom_out"); () }
  }

  test("stream equals the oracle-checked batch twin, however the feed is micro-batched") {
    val batchRows = StreamAnomaly.volumeAnomalyBatch(spark, sf).collect()
    assert(batchRows.nonEmpty)
    val expected = batchRows.map { r =>
      val epochDay = r.getDate(1).toLocalDate.toEpochDay
      (r.getString(0), epochDay, r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))
    }.toSet

    // the finalized feed: one point per (type, day), in event-time order
    val feed = expected.toSeq.sortBy(p => (p._2, p._1))
      .map(p => StreamAnomaly.DailyVolume(p._1, p._2, p._3))

    for (nSplits <- Seq(1, 7)) {
      val batches = feed.grouped(math.max(1, feed.length / nSplits)).toSeq
      val got = runStream(batches)
        .map(f => (f.event_type, f.epoch_day, f.n_events, f.hist_days, f.z, f.is_anomaly)).toSet
      assert(got == expected,
        s"$nSplits-split stream diverged: missing ${expected -- got}, extra ${got -- expected}")
    }
  }

  test("a planted volume spike is flagged on exactly its day, and re-delivered days are dropped") {
    // 40 days of mildly varying volume (variance > 0, no flags), then a 10×
    // day: only day 40 clears |z| >= AnomZ. A copy of already-finalized day
    // 5 arrives late in the final batch and must be ignored, not reflagged.
    val stable = (0L until 40L).map(d =>
      StreamAnomaly.DailyVolume("purchase", d, 100L + (d % 3)))
    val spike = StreamAnomaly.DailyVolume("purchase", 40L, 1000L)
    val replay = StreamAnomaly.DailyVolume("purchase", 5L, 999L)
    val got = runStream(Seq(stable.take(20), stable.drop(20), Seq(spike, replay)))
    assert(got.count(_.epoch_day == 5L) == 1, "re-delivered day must not re-emit")
    assert(got.filter(_.is_anomaly).map(_.epoch_day) == Seq(40L))
    val z = got.find(_.epoch_day == 40L).get.z.get
    assert(z > TsQueries.AnomZ, s"spike z should be far over the threshold, got $z")
    // warm-up days (< MinHistoryDays of history) carry no z
    assert(got.filter(_.hist_days < TsQueries.MinHistoryDays).forall(_.z.isEmpty))
  }

  test("state stays bounded at HistDays entries per key") {
    // 400 days for one type: the retained ring must never exceed HistDays,
    // which the trailing window semantics themselves verify — day d's
    // history count is capped at HistDays regardless of stream length
    val long = (0L until 400L).map(d =>
      StreamAnomaly.DailyVolume("click", d, 50L + (d % 5)))
    val got = runStream(Seq(long))
    assert(got.length == 400)
    assert(got.map(_.hist_days).max == StreamAnomaly.HistDays)
    // after warm-up every day sees exactly HistDays of history (no gaps fed)
    assert(got.filter(_.epoch_day >= StreamAnomaly.HistDays).forall(_.hist_days == StreamAnomaly.HistDays))
  }
}
