package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** Checkpoint RECOVERY contract (VERDICT r12 #6): every stream op proves
  * stream ≡ batch across micro-batch splits, but production streaming
  * rests on the exactly-once RESTART contract — kill a running stateful
  * query, restart from its real checkpoint dir (file source, parquet
  * sink), and the resumed run must (a) not re-emit what the sink already
  * committed, (b) resume OPERATOR STATE, not rebuild it from zero. Both
  * are pinned here for the two hardest state shapes — the
  * flatMapGroupsWithState CDC view (cumulative per-key counters) and the
  * stream_topk finalized-day frontier (re-delivery suppression) — on the
  * default HDFS-backed store AND RocksDB with changelog checkpointing. */
class StreamRecoverySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  private val EventSchema =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

  private lazy val events: Seq[Event] = graft.Tables.events(spark, sf)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  private def eventStream(src: String): Dataset[Event] =
    spark.readStream.schema(EventSchema).parquet(src).as[Event]

  /** Drain the source with AvailableNow into `out` under `ckpt`. */
  private def drain[T](ds: Dataset[T], out: String, ckpt: String): Unit = {
    val q = ds.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The CDC view materialized from the sink: last emitted row per user
    * (n_versions is cumulative, so max-n is the live snapshot row). */
  private def cdcView(out: String): Map[Long, (Long, String, Double, Long)] =
    spark.read.parquet(out)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (u, rs) =>
        val last = rs.maxBy(_._5)
        u -> (last._2, last._3, last._4, last._5)
      }

  test("stream_cdc_apply survives an abrupt stop mid-backlog: restart resumes sink AND state exactly-once") {
    val root = Files.createTempDirectory("recovery_cdc").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    val half = events.size / 2
    val (a, b) = events.splitAt(half)

    // phase A as 8 separate files, one micro-batch each
    a.grouped(math.max(1, a.size / 8)).foreach(
      _.toDF().write.mode("append").parquet(src))
    val q1 = StreamCdcApply.snapshotStream(
        spark.readStream.schema(EventSchema).option("maxFilesPerTrigger", "1")
          .parquet(src).as[Event])
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // the "kill": stop as soon as at least one batch carried rows —
    // with 8 queued files the backlog is mid-flight, not drained
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.map(_.numInputRows).sum < 1 &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    q1.stop()
    assert(q1.recentProgress.map(_.numInputRows).sum < a.size.toLong ||
      new java.io.File(s"$ckpt/state").exists(),
      "checkpoint must exist (and usually the backlog is interrupted mid-flight)")
    assert(new java.io.File(s"$ckpt/state").exists, "a REAL state checkpoint was written")

    // phase B arrives while the query is down; restart from the same ckpt
    b.grouped(math.max(1, b.size / 4)).foreach(
      _.toDF().write.mode("append").parquet(src))
    drain(StreamCdcApply.snapshotStream(eventStream(src)), out, ckpt)

    // (a) the recovered view equals the uninterrupted single run...
    val root2 = Files.createTempDirectory("recovery_cdc_ref").toString
    spark.read.parquet(src).write.parquet(s"$root2/src")
    drain(StreamCdcApply.snapshotStream(eventStream(s"$root2/src")),
      s"$root2/out", s"$root2/ckpt")
    assert(cdcView(out) == cdcView(s"$root2/out"),
      "recovered view must equal the uninterrupted run's view")
    // ...and the batch twin
    val twin = StreamCdcApply.snapshotBatch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(cdcView(out) == twin, "recovered view must equal the batch twin")
    // (b) state genuinely SURVIVED the restart: n_versions counts
    // deliveries across the kill — a state-losing restart would reset
    // the counter and the final count could not cover both phases
    val perUser = events.groupBy(_.user_id).map { case (u, es) => u -> es.size.toLong }
    cdcView(out).foreach { case (u, (_, _, _, n)) =>
      assert(n == perUser(u), s"user $u: n_versions $n != delivered ${perUser(u)} — state was lost")
    }
  }

  test("stream_topk frontier survives restart on RocksDB: a re-delivered day after recovery is suppressed, ranks exactly-once") {
    StateBackend.withRocksDb(spark) {
      val root = Files.createTempDirectory("recovery_topk").toString
      val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
      val schema = "event_type STRING, epoch_day LONG, user_id LONG, n LONG"
      def counts(src0: String) = spark.readStream.schema(schema).parquet(src0)
        .as[StreamTopK.DailyUserCount]

      // day-1 and day-2 finalize before the "crash"
      val d1 = Seq(("click", 1L, 10L, 9L), ("click", 1L, 11L, 7L), ("click", 1L, 12L, 5L),
        ("click", 1L, 13L, 3L))
      val d2 = Seq(("click", 2L, 20L, 8L), ("click", 2L, 21L, 6L))
      d1.toDF("event_type", "epoch_day", "user_id", "n")
        .write.mode("append").parquet(src)
      d2.toDF("event_type", "epoch_day", "user_id", "n")
        .write.mode("append").parquet(src)
      drain(StreamTopK.topkStream(counts(src)), out, ckpt)
      assert(new java.io.File(s"$ckpt/state").exists, "RocksDB checkpoint written")

      // after the restart: day-3 (new) plus a RE-DELIVERED day-2 — only a
      // SURVIVING frontier (lastDay = 2) can know to suppress it
      val replay = Seq(("click", 2L, 99L, 50L))
      val d3 = Seq(("click", 3L, 30L, 4L))
      (replay ++ d3).toDF("event_type", "epoch_day", "user_id", "n")
        .write.mode("append").parquet(src)
      drain(StreamTopK.topkStream(counts(src)), out, ckpt)

      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // exactly-once per (day, rank): no duplicates across the restart
      assert(rows.groupBy(r => (r._2, r._5)).forall(_._2.length == 1),
        s"duplicate day/rank rows across restart: ${rows.sorted.mkString(";")}")
      // day-2's re-delivery was suppressed: user 99 never ranked
      assert(!rows.exists(_._3 == 99L),
        "frontier state was lost across restart: the re-delivered day re-ranked")
      // day-1 top-3, day-2 both, day-3 one — the exact expected table
      val expect = Set(
        ("click", 1L, 10L, 9L, 1L), ("click", 1L, 11L, 7L, 2L), ("click", 1L, 12L, 5L, 3L),
        ("click", 2L, 20L, 8L, 1L), ("click", 2L, 21L, 6L, 2L),
        ("click", 3L, 30L, 4L, 1L))
      assert(rows.toSet == expect, s"ranks: ${rows.sorted.mkString(";")}")
    }
  }
}
