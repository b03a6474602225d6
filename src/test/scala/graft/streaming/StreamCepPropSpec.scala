package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** Generative `stream_cep` check: on random event feeds, the streaming
  * automaton must equal the declarative batch twin under every micro-batch
  * split — the stream ≡ batch contract stressed beyond the planted cases
  * (random inter-arrival times around the gap boundary, interleaved users,
  * pattern-irrelevant noise types). */
class StreamCepPropSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Event]]): Set[(Long, Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamCep.cepStream(input.toDS())
      .writeStream.format("memory").queryName("cep_prop_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("cep_prop_out").as[StreamCep.CepMatch].collect()
        .map(m => (m.user_id, m.a_id, m.b_id, m.c_id)).toSet
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS cep_prop_out"); () }
  }

  (1 to 4).foreach { seed =>
    test(s"random feed $seed: stream equals batch under 1-, 3-, and 9-way splits") {
      val rnd = new scala.util.Random(9000 + seed)
      val types = Array("view", "click", "purchase", "error", "signup")
      // inter-arrival times cluster around the 12 h gap so expiry boundaries
      // are actually exercised; 5 users interleave
      var t = 1704067200000L
      val events = (0 until 400).map { i =>
        t += (rnd.nextInt(8) + 1) * 7200000L // 2..16 h steps
        Event(i.toLong, new Timestamp(t + rnd.nextInt(1000)), rnd.nextInt(5).toLong,
          types(rnd.nextInt(types.length)), 1.0)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cepprop$seed").toString
      events.toDF()
        .selectExpr("event_id", "unix_micros(ts) * 1000 AS ts", "user_id",
          "event_type", "value", "'' AS props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = StreamCep.cepBatch(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val ordered = events.sortBy(e => (e.ts.getTime, e.event_id))
      for (splits <- Seq(1, 3, 9)) {
        val size = math.max(1, ordered.size / splits)
        val got = runStream(ordered.grouped(size).toSeq)
        assert(got == batch, s"seed $seed splits $splits: stream ${got.size} vs batch ${batch.size}")
      }
    }
  }
}
