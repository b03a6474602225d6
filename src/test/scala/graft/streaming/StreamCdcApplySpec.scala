package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** `stream_cdc_apply`: the continuous snapshot converges to the
  * oracle-checked batch twin however the feed is micro-batched; stale,
  * out-of-order, and re-delivered records never emit. */
class StreamCdcApplySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[Event]]): Seq[StreamCdcApply.SnapshotRow] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamCdcApply.snapshotStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("cdc_out").as[StreamCdcApply.SnapshotRow].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS cdc_out"); () }
  }

  test("stream converges to the batch twin, however the feed is micro-batched") {
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val expected = StreamCdcApply.snapshotBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .toSet
    for (nSplits <- Seq(1, 5)) {
      val size = math.max(1, events.size / nSplits)
      val emissions = runStream(events.grouped(size).toSeq)
      // the view per key = its LAST emission (largest delivered count)
      val finalRows = emissions.groupBy(_.user_id).values
        .map(_.maxBy(_.n_versions))
        .map(r => (r.user_id, r.version_event_id, r.latest_type, r.latest_value, r.n_versions))
        .toSet
      assert(finalRows == expected, s"$nSplits-split stream diverged")
    }
  }

  test("stale, out-of-order, and re-delivered records never emit") {
    def ev(id: Long, t: String, v: Double) =
      Event(id, Timestamp.valueOf(t), 1L, "update", v)
    val newer = ev(10, "2024-01-05 10:00:00", 5.0)
    val older = ev(3, "2024-01-02 09:00:00", 1.0)
    val emissions = runStream(Seq(
      Seq(older, newer),   // both in one batch: one emission, the winner
      Seq(older),          // out-of-order replay of the older version
      Seq(newer)))         // re-delivery of the current winner
    assert(emissions.size == 1, s"got $emissions")
    val e = emissions.head
    assert(e.version_event_id == 10L && e.latest_value == 5.0 && e.n_versions == 2L)
  }
}
