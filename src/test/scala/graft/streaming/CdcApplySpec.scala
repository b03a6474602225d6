package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

class CdcApplySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, t: String, value: Double) =
    Event(id, Timestamp.valueOf(t), id % 5, "update", value)

  private def tableState(path: String): Seq[(Long, Double)] =
    spark.read.parquet(path).select("event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq

  test("batch apply merges inserts and updates; replaying a batch is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/wh"
    val b1 = Seq(ev(1, "2024-01-05 10:00:00", 1.0), ev(2, "2024-01-06 10:00:00", 2.0)).toDS()
    EventStream.applyCdcBatch(b1, dir)
    assert(tableState(dir) == Seq(1L -> 1.0, 2L -> 2.0))

    // batch 2: update id 2 (two changes in one batch — latest ts wins), insert id 3
    val b2 = Seq(
      ev(2, "2024-01-07 09:00:00", 20.0), ev(2, "2024-01-07 11:00:00", 22.0),
      ev(3, "2024-01-07 12:00:00", 3.0)).toDS()
    EventStream.applyCdcBatch(b2, dir)
    val after = tableState(dir)
    assert(after == Seq(1L -> 1.0, 2L -> 22.0, 3L -> 3.0))

    // replay (failure recovery re-delivers the same micro-batch)
    EventStream.applyCdcBatch(b2, dir)
    assert(tableState(dir) == after, "replayed batch must converge to the same table")
  }

  test("an update that moves a key across month partitions leaves no stale duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("cdcmove").toString + "/wh"
    EventStream.applyCdcBatch(Seq(ev(1, "2024-01-05 10:00:00", 1.0)).toDS(), dir)
    // corrected timestamp relocates the row from 2024/01 to 2024/02
    EventStream.applyCdcBatch(Seq(ev(1, "2024-02-03 10:00:00", 7.0)).toDS(), dir)
    val rows = spark.read.parquet(dir)
      .select("event_id", "value", "year", "month").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
    assert(rows.toSeq == Seq((1L, 7.0, 2024, 2)),
      s"old-partition duplicate must be removed: ${rows.toSeq}")
  }

  test("same-ts changes in one batch pick a deterministic winner, replays included") {
    val dir = java.nio.file.Files.createTempDirectory("cdctie").toString + "/wh"
    val tied = Seq(ev(5, "2024-01-05 10:00:00", 3.0), ev(5, "2024-01-05 10:00:00", 9.0)).toDS()
    EventStream.applyCdcBatch(tied, dir)
    assert(tableState(dir) == Seq(5L -> 9.0), "higher value must win the ts tie")
    EventStream.applyCdcBatch(tied, dir)
    assert(tableState(dir) == Seq(5L -> 9.0))
  }

  test("streaming end-to-end: the change stream maintains the warehouse exactly-once") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("cdcstream").toString
    val input = MemoryStream[Event]
    val q = EventStream.cdcApply(input.toDS(), s"$base/wh", s"$base/ckpt")
    try {
      input.addData(ev(10, "2024-01-05 10:00:00", 1.0), ev(11, "2024-01-05 11:00:00", 2.0))
      q.processAllAvailable()
      assert(tableState(s"$base/wh") == Seq(10L -> 1.0, 11L -> 2.0))

      input.addData(ev(11, "2024-01-06 09:00:00", 5.0), ev(12, "2024-01-06 10:00:00", 6.0))
      q.processAllAvailable()
      assert(tableState(s"$base/wh") == Seq(10L -> 1.0, 11L -> 5.0, 12L -> 6.0))
    } finally q.stop()
  }
}
