package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.WarehouseSink
import EventStream.Event

/** The reference's daily load (fetch → dedup → upsert, main.py:1132-1197)
  * as a continuous pipeline: stream → foreachBatch → WarehouseSink.merge.
  * Each micro-batch is merged by (year, month) partition with
  * batch-wins-on-key semantics, so re-delivered and corrected records
  * converge exactly like the batch upsert path.
  */
class StreamUpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int) = new Timestamp(1704067200000L + day * 86400000L)

  test("streaming foreachBatch upsert into the partitioned warehouse converges") {
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("swh").toString + "/t"
    val input = MemoryStream[Event]
    val q = input.toDS()
      .withColumn("year", year(col("ts")).cast("long"))
      .withColumn("month", month(col("ts")).cast("long"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        WarehouseSink.merge(batch.sparkSession, batch, path, "event_id")
      }
      .start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(path).count() == 2)

      // re-delivery of event 1 with corrected value + a new event
      input.addData(Event(1, ts(0), 1, "click", 9.0), Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(path).orderBy("event_id")
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toSeq
      assert(rows == Seq((1L, 9.0), (2L, 2.0), (3L, 3.0)),
        s"batch must win on key collision: $rows")
    } finally q.stop()
  }
}
