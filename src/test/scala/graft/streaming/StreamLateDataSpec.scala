package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** `stream_late_data` contract: (1) the declared per-batch watermark
  * arithmetic classifies a planted corpus exactly; (2) a REAL Structured
  * Streaming run (MemoryStream split into the same micro-batches, a
  * watermarked per-row stateful operator) drops EXACTLY the rows the
  * declared arithmetic calls `dropped` — Spark's own
  * `numRowsDroppedByWatermark` is the witness. */
class StreamLateDataSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1704067200000L + minutes * 60000L)

  /** Planted scenario (BatchSize = 1000, delay = 30 min).
    * Batch 0 (ids 0-2): establishes max ts = t(100); all on_time.
    * Batch 1 (ids 1000-1003): prev_max = t(100) →
    *   id 1000 ts t(110) ≥ prev_max            → on_time
    *   id 1001 ts t(90)  ∈ [t(70), t(100))     → late_ok
    *   id 1002 ts t(50)  < t(70) = wm          → dropped
    *   id 1003 ts t(170) ≥ prev_max            → on_time
    * Batch 2 (id 2000): prev_max = t(170) →
    *   id 2000 ts t(120) < t(140) = wm         → dropped */
  private val planted = Seq(
    (0L, ts(0), 1L, "a", 1.0), (1L, ts(100), 1L, "a", 1.0), (2L, ts(40), 2L, "b", 1.0),
    (1000L, ts(110), 1L, "a", 1.0), (1001L, ts(90), 2L, "b", 1.0),
    (1002L, ts(50), 3L, "a", 1.0), (1003L, ts(170), 1L, "b", 1.0),
    (2000L, ts(120), 4L, "a", 1.0))

  test("declared arithmetic: planted batches classify exactly") {
    val dir = java.nio.file.Files.createTempDirectory("late_data").toString
    planted.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamLateData.lateData(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // type a: ids 0,1 on_time; 1000 on_time; 1002 dropped; 2000 dropped
    assert(got("a") == ((5L, 3L, 0L, 2L, (2L * 1000000L) / 5L)), s"a: ${got("a")}")
    // type b: id 2 on_time; 1001 late_ok; 1003 on_time
    assert(got("b") == ((3L, 2L, 1L, 0L, 0L)), s"b: ${got("b")}")
  }

  test("real micro-batch replay: Spark's numRowsDroppedByWatermark matches the declared dropped set") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    // per-row stateful op (streaming dedup): its late filter is the
    // row-level watermark drop the declared arithmetic models
    val q = input.toDS()
      .withWatermark("ts", s"${StreamLateData.DelayMinutes} minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("late_acct").outputMode("append").start()
    try {
      def batch(ids: Seq[Long]): Unit = {
        input.addData(planted.filter(p => ids.contains(p._1))
          .map(p => Event(p._1, p._2, p._3, p._4, p._5)))
        q.processAllAvailable()
      }
      batch(Seq(0L, 1L, 2L))
      batch(Seq(1000L, 1001L, 1002L, 1003L))
      batch(Seq(2000L))
      val dropped = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 2L, s"streaming dropped $dropped, declared arithmetic says 2")
      val sunk = spark.table("late_acct").collect().map(_.getLong(0)).toSet
      assert(sunk == Set(0L, 1L, 2L, 1000L, 1001L, 1003L),
        s"survivors must be exactly the non-dropped ids: $sunk")
    } finally q.stop()
  }
}
