package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** File-based streaming end-to-end: readStream over a parquet directory →
  * windowed aggregation → parquet writeStream with checkpoint, using
  * Trigger.AvailableNow. This is the reference's scheduled-poll loop
  * (main.py:1132-1197) as a restartable incremental stream: new files
  * appearing in the source directory are exactly-once processed on the next
  * trigger thanks to the checkpoint. */
class FileStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("parquet readStream → window agg → parquet sink via AvailableNow, incrementally") {
    val root = Files.createTempDirectory("fstream").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")

    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    def run(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
      val q = stream.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: two events in hour 0, late-window closer in hour 10
    Seq((1L, ts(0), "click", 1.0), (2L, ts(20), "click", 2.0), (3L, ts(600), "view", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(src)
    run()
    val afterFirst = spark.read.parquet(out).filter(col("event_type") === "click").collect()
    assert(afterFirst.length == 1 && afterFirst.head.getAs[Long]("n") == 2L,
      s"hour-0 click window must be emitted once closed: ${afterFirst.mkString(";")}")

    // batch 2: only the new file is processed (checkpoint), closing hour 10
    Seq((4L, ts(2000), "click", 5.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(src)
    run()
    val views = spark.read.parquet(out).filter(col("event_type") === "view").collect()
    assert(views.length == 1 && views.head.getAs[Double]("sum_v") == 1.0)
    // hour-0 click window must NOT be duplicated by the second run
    val clicks = spark.read.parquet(out).filter(col("event_type") === "click").collect()
    assert(clicks.length == 1, s"exactly-once: ${clicks.mkString(";")}")
  }
}
