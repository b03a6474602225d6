package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[StreamTopK.DailyUserCount]])
      : Seq[StreamTopK.TopkRow] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamTopK.DailyUserCount]
    val q = StreamTopK.topkStream(input.toDS())
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("topk_out").as[StreamTopK.TopkRow].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS topk_out"); () }
  }

  test("stream equals the oracle-checked batch twin, however the feed is micro-batched") {
    val batchRows = StreamTopK.topkBatch(spark, sf).collect()
    assert(batchRows.nonEmpty)
    val expected = batchRows.map { r =>
      (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2),
        r.getLong(3), r.getLong(4))
    }.toSet

    // the finalized feed: every (type, day, user) count, a day's rows
    // always within one batch (the upstream append-mode co-arrival
    // contract); split points only ever fall BETWEEN days
    val counts = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "user_id")
      .groupBy("event_type", "day", "user_id").count()
      .collect().map(r => StreamTopK.DailyUserCount(r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay, r.getLong(2), r.getLong(3)))
      .sortBy(c => (c.epoch_day, c.event_type, c.user_id))
    val days = counts.map(_.epoch_day).distinct.sorted
    for (nSplits <- Seq(1, 5)) {
      val cut = days.grouped(math.max(1, days.length / nSplits)).toSeq
      val batches = cut.map(ds => counts.filter(c => ds.contains(c.epoch_day)).toSeq)
      val got = runStream(batches)
        .map(t => (t.event_type, t.epoch_day, t.user_id, t.n, t.rk)).toSet
      assert(got == expected,
        s"$nSplits-split stream diverged: missing ${expected -- got}, extra ${got -- expected}")
    }
  }

  test("ties rank to the lowest user id and re-delivered days are dropped") {
    val day0 = Seq(
      StreamTopK.DailyUserCount("view", 100L, 9L, 5L),
      StreamTopK.DailyUserCount("view", 100L, 2L, 5L),
      StreamTopK.DailyUserCount("view", 100L, 7L, 5L),
      StreamTopK.DailyUserCount("view", 100L, 1L, 4L))
    val replay = Seq(StreamTopK.DailyUserCount("view", 100L, 50L, 99L))
    val got = runStream(Seq(day0, replay))
    // three-way tie at n=5: users 2, 7, 9 in id order; user 1 misses TopN
    assert(got.map(t => (t.rk, t.user_id)).sorted == Seq((1L, 2L), (2L, 7L), (3L, 9L)))
    // the re-delivered day must not re-rank (user 50 never appears)
    assert(!got.exists(_.user_id == 50L))
  }

  test("each emitted day is immutable and exactly TopN-bounded per key") {
    val feed = (0L until 20L).flatMap { d =>
      (0L until 10L).map(u =>
        StreamTopK.DailyUserCount("click", d, u, 1L + ((u + d) % 4)))
    }
    val got = runStream(Seq(feed.take(50), feed.drop(50)))
    got.groupBy(t => (t.event_type, t.epoch_day)).foreach { case (k, rows) =>
      assert(rows.length <= StreamTopK.TopN, s"$k emitted ${rows.length} rows")
      assert(rows.map(_.rk).sorted == (1L to rows.length).toSeq)
    }
  }
}
