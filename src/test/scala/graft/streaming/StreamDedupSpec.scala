package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

class StreamDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)

  test("streaming dedup drops re-delivered events across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamDedup.dedupStream(input.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0))
      q.processAllAvailable()
      // re-delivery of event 1 (the reference's overlapping-window refetch)
      // plus one genuinely new event, same micro-batch pattern
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(10), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"event 1 must appear exactly once, got ${ids.toSeq}")
    } finally q.stop()
  }
}
