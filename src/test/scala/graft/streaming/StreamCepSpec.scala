package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** `stream_cep`: the streaming automaton equals the oracle-checked batch
  * twin however the feed is micro-batched, and the planted sequence cases
  * (per-occurrence matching, gap expiry, first-stage greediness, silence
  * on re-delivery) behave per the declared SKIP TO NEXT ROW semantics. */
class StreamCepSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[Event]]): Seq[StreamCep.CepMatch] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamCep.cepStream(input.toDS())
      .writeStream.format("memory").queryName("cep_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("cep_out").as[StreamCep.CepMatch].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS cep_out"); () }
  }

  test("stream equals the batch twin, however the feed is micro-batched") {
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val expected = StreamCep.cepBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(expected.nonEmpty, "corpus must contain matches for the spec to bite")
    for (nSplits <- Seq(1, 7)) {
      val size = math.max(1, events.size / nSplits)
      val got = runStream(events.grouped(size).toSeq)
        .map(m => (m.user_id, m.a_id, m.b_id, m.c_id, m.ab_secs, m.bc_secs)).toSet
      assert(got == expected, s"$nSplits-split stream diverged from batch")
    }
  }

  test("planted sequences: per-anchor matches, gap expiry, greedy first-stage") {
    def ev(id: Long, t: String, tpe: String) =
      Event(id, Timestamp.valueOf(t), 1L, tpe, 1.0)
    val feed = Seq(
      // anchor 1: clean A -> B -> C
      ev(1, "2024-01-01 08:00:00", "view"),
      ev(2, "2024-01-01 09:00:00", "click"),
      // anchor 2: opens before the C, shares nothing (its first B is later)
      ev(3, "2024-01-01 09:30:00", "view"),
      ev(4, "2024-01-01 10:00:00", "purchase"), // completes anchor 1 only
      ev(5, "2024-01-01 11:00:00", "click"),    // anchor 2's first B
      ev(6, "2024-01-01 12:00:00", "purchase"), // completes anchor 2
      // anchor 3: B arrives 13 h later -> expired, never matches
      ev(7, "2024-01-02 08:00:00", "view"),
      ev(8, "2024-01-02 21:30:00", "click"),
      ev(9, "2024-01-02 22:00:00", "purchase"))
    val got = runStream(Seq(feed))
      .map(m => (m.a_id, m.b_id, m.c_id)).toSet
    assert(got == Set((1L, 2L, 4L), (3L, 5L, 6L)), s"got $got")
    // re-delivery of the whole feed is silent
    val redelivered = runStream(Seq(feed, feed))
      .map(m => (m.a_id, m.b_id, m.c_id))
    assert(redelivered.size == 2, s"re-delivery emitted: $redelivered")
  }
}
