package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.{Event, Session}

/** End-to-end Structured Streaming: MemoryStream → watermarked transforms →
  * memory sink, across multiple micro-batches with late data. */
class EventStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1704067200000L + minutes * 60000L)

  test("watermarked windowed aggregation emits closed windows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedAgg(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_agg").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(20), 2, "view", 3.0))
      q.processAllAvailable()
      // push watermark far past the first hour so its windows close
      input.addData(Event(4, ts(180), 1, "click", 4.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(360), 1, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
      val clicks = rows.find(r => r.getString(1) == "click" && r.getTimestamp(0) == ts(0))
      assert(clicks.isDefined, s"first-hour click window missing: ${rows.mkString(";")}")
      assert(clicks.get.getLong(2) == 2L)
      assert(clicks.get.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap timeout and splits on gaps") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then 30 min gap → new session
      input.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(35), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark way past everything so all sessions time out
      input.addData(Event(4, ts(600), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1200), 2, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
      val u1 = sessions.filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.toSeq}")
      assert(u1(0).n_events == 2 && u1(0).sum_value == 3.0)
      assert(u1(0).session_start == ts(0) && u1(0).session_end == ts(5))
      assert(u1(1).n_events == 1 && u1(1).session_start == ts(35))
    } finally q.stop()
  }

  test("late within-watermark events extend a session backwards or form a past session") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600, watermark = "2 hours")
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      // open a session at t=30min
      input.addData(Event(1, ts(30), 1, "click", 1.0))
      q.processAllAvailable()
      // late cross-batch event 5 min BEFORE the session start (within gap):
      // must merge and move session_start back, not corrupt it
      input.addData(Event(2, ts(25), 1, "click", 2.0))
      q.processAllAvailable()
      // late event 24 min before the (new) start — more than the 10-min gap:
      // its own, already-elapsed session
      input.addData(Event(3, ts(1), 1, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to flush the open session
      input.addData(Event(4, ts(600), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1200), 2, "click", 1.0))
      q.processAllAvailable()
      val u1 = spark.table("late_sessions").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.toSeq}")
      assert(u1(0).session_start == ts(1) && u1(0).session_end == ts(1) && u1(0).n_events == 1)
      assert(u1(1).session_start == ts(25) && u1(1).session_end == ts(30) && u1(1).n_events == 2)
      assert(u1(1).sum_value == 3.0)
    } finally q.stop()
  }

  test("several late events within gap of each other merge into one past session") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600, watermark = "2 hours")
      .writeStream.format("memory").queryName("late_merge").outputMode("append").start()
    try {
      // open a session far ahead at t=50min
      input.addData(Event(1, ts(50), 1, "click", 1.0))
      q.processAllAvailable()
      // one batch delivers two late events at t=0 and t=5 (within gap of
      // each other, both more than gap before the open session): they must
      // form ONE past session [0, 5] with n=2, not two singletons
      input.addData(Event(2, ts(0), 1, "view", 2.0), Event(3, ts(5), 1, "view", 3.0))
      q.processAllAvailable()
      val past = spark.table("late_merge").as[Session].collect().filter(_.user_id == 1)
      assert(past.length == 1, s"expected one merged past session, got ${past.toSeq}")
      assert(past.head.session_start == ts(0) && past.head.session_end == ts(5))
      assert(past.head.n_events == 2 && past.head.sum_value == 5.0)
    } finally q.stop()
  }

  test("stream-stream interval join emits matches and expires state by watermark") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStream.intervalJoin(purchases.toDS(), clicks.toDS(), windowMinutes = 30)
      .writeStream.format("memory").queryName("pc_join").outputMode("append").start()
    try {
      clicks.addData(
        Event(10, ts(0), 1, "click", 1.0),   // 20 min before purchase → match
        Event(11, ts(15), 1, "click", 1.0),  // 5 min before → match
        Event(12, ts(0), 2, "click", 1.0))   // other user → no match
      purchases.addData(Event(20, ts(20), 1, "purchase", 9.0))
      q.processAllAvailable()
      // a click 40 min before the purchase: outside the interval
      clicks.addData(Event(13, ts(40), 1, "click", 1.0))
      purchases.addData(Event(21, ts(80), 1, "purchase", 9.0))
      q.processAllAvailable()
      // advance both watermarks far past everything to flush appends
      clicks.addData(Event(14, ts(600), 9, "click", 1.0))
      purchases.addData(Event(22, ts(600), 9, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("pc_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((20L, 10L)) && got.contains((20L, 11L)))
      assert(!got.exists(_._2 == 12L), "cross-user click must not match")
      assert(!got.contains((21L, 13L)), "click outside the 30-min interval must not match")
      assert(got.contains((22L, 14L)), "same-timestamp click within interval matches")
    } finally q.stop()
  }

  test("stream-stream interval join agrees with the batch twin on the driver data") {
    val batch = StreamQueries.intervalJoin(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.Tables.events(spark, TestSpark.sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val streamShaped = EventStream.intervalJoin(
        ev.filter(_.event_type == "purchase"), ev.filter(_.event_type == "click"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamShaped == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed agg agrees with the batch twin on the same data") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(70), 2, "click", 3.0))
    val input = MemoryStream[Event]
    val q = EventStream.windowedAgg(input.toDS(), watermark = "1 minute")
      .writeStream.format("memory").queryName("parity_stream").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(Event(99, ts(10000), 9, "x", 0.0)) // close everything
      q.processAllAvailable()
      val streamed = spark.table("parity_stream")
        .filter($"event_type" =!= "x")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStream.windowedAgg(events.toDS().coalesce(1), watermark = "0 seconds")
      // batch mode ignores watermark; same groupBy produces the same windows
      val batchRows = batch.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batchRows)
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim and agrees with batch") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((0L, "ALPHA"), (1L, "BETA"), (2L, "GAMMA")).toDF("nk", "n_name")
    val events = Seq(
      Event(1, ts(0), 25, "click", 1.0),  // user 25 % 25 = 0 -> ALPHA
      Event(2, ts(10), 25, "click", 2.0),
      Event(3, ts(20), 26, "view", 3.0))  // 26 % 25 = 1 -> BETA
    val input = MemoryStream[Event]
    val q = EventStream.enrichedWindowAgg(input.toDS(), dim, watermark = "1 minute")
      .writeStream.format("memory").queryName("enrich_stream").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(Event(99, ts(10000), 25, "x", 0.0)) // close everything
      q.processAllAvailable()
      val streamed = spark.table("enrich_stream")
        .filter($"window_start" < ts(9000))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == Set(
        (ts(0), "ALPHA", 2L, 3.0),
        (ts(0), "BETA", 1L, 3.0)))
    } finally q.stop()
  }
}
