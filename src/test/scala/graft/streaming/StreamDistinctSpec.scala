package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stream_distinct` contract: the stateful streaming path emits exactly
  * the oracle-checked batch twin's rows however the finalized register
  * feed is micro-batched, the estimator fold is bit-identical to the
  * batch Column math, and re-delivered days are dropped. */
class StreamDistinctSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[StreamDistinct.RegRow]])
      : Seq[StreamDistinct.DistinctRow] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamDistinct.RegRow]
    val q = StreamDistinct.distinctStream(input.toDS())
      .writeStream.format("memory").queryName("dist_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("dist_out").as[StreamDistinct.DistinctRow].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS dist_out"); () }
  }

  test("stream equals the oracle-checked batch twin, however the feed is micro-batched") {
    val batchRows = StreamDistinct.distinctBatch(spark, sf).collect()
    assert(batchRows.nonEmpty)
    val expected = batchRows.map { r =>
      (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
    }.toSet

    // the finalized register feed: one (type, day, bucket) max-rho row
    // each, a day's rows always within one batch (the upstream
    // append-mode co-arrival contract)
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "user_id")
    val regs = graft.stats.Hll.registers(ev, Seq("event_type", "day"))
      .collect().map(r => StreamDistinct.RegRow(r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getLong(2), r.getLong(3)))
      .sortBy(r => (r.epoch_day, r.event_type, r.bucket))
    val days = regs.map(_.epoch_day).distinct.sorted
    for (nSplits <- Seq(1, 5)) {
      val cut = days.grouped(math.max(1, days.length / nSplits)).toSeq
      val batches = cut.map(ds => regs.filter(r => ds.contains(r.epoch_day)).toSeq)
      val got = runStream(batches)
        .map(t => (t.event_type, t.epoch_day, t.n_buckets, t.v_zero,
          t.s_scaled, t.est_distinct)).toSet
      assert(got == expected,
        s"$nSplits-split stream diverged: missing ${expected -- got}, extra ${got -- expected}")
    }
  }

  test("re-delivered days are dropped; registers merge to the day's max") {
    val day0 = Seq(
      StreamDistinct.RegRow("view", 100L, 3L, 7L),
      StreamDistinct.RegRow("view", 100L, 9L, 2L))
    val replay = Seq(StreamDistinct.RegRow("view", 100L, 3L, 50L))
    val got = runStream(Seq(day0, replay))
    assert(got.length == 1)
    val r = got.head
    val (occ, v, s, est) = StreamDistinct.estimate(Seq((3L, 7L), (9L, 2L)))
    assert((r.n_buckets, r.v_zero, r.s_scaled, r.est_distinct) == (occ, v, s, est))
  }
}
