package graft.text

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Streaming reservoir ≡ batch sample: feeding the corpus through a
  * micro-batched stream, the bottom-k over all shard-reservoir emissions
  * must equal the oracle-checked batch `sample_reservoir`, however the
  * feed is split — the incremental-maintainability contract of the
  * hash-priority bottom-k sketch, plus the bounded-state claim. */
class StreamReservoirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[Reservoir.DocIn]]): Seq[Reservoir.ResRow] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Reservoir.DocIn]
    val q = Reservoir.reservoirStream(input.toDS())
      .writeStream.format("memory").queryName("rsv_out")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("rsv_out").as[Reservoir.ResRow].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS rsv_out"); () }
  }

  test("stream bottom-k over emissions equals the batch sample, for any batching") {
    val expected = SparkEntry.queries("sample_reservoir")(spark, sf).collect()
      .map(r => (r.getString(3), r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "n_chars").collect()
      .map(r => Reservoir.DocIn(r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    for (nBatches <- Seq(1, 4, 9)) {
      val batches = docs.grouped(math.max(1, docs.length / nBatches)).toSeq
      val emitted = runStream(batches)
      val sample = emitted.map(e => (e.priority, e.doc_id, e.lang, e.n_chars))
        .distinct.sortBy(e => (e._1, e._2)).take(Reservoir.TargetK)
      assert(sample == expected, s"$nBatches-batch stream diverged")
      // bounded state: the final emission of each shard is <= k rows
      assert(emitted.groupBy(_.shard).size <= Reservoir.NumShards)
    }
  }

  test("a later batch displaces only worse-ranked rows (monotone improvement)") {
    // ids chosen so batch 2 injects a new global-best priority
    val all = (0L until 200L).map(i => Reservoir.DocIn(i, "en", i))
    val (b1, b2) = all.splitAt(100)
    val emitted = runStream(Seq(b1, b2))
    val afterB1 = emitted.take(emitted.length) // all emissions
    // final reservoirs: reconstruct per shard from the LAST emission set =
    // bottom-k per shard over everything fed
    val finalPerShard = all.groupBy(d => (d.doc_id % Reservoir.NumShards).toInt)
      .map { case (sh, ds) =>
        sh -> ds.map(d => (Reservoir.md5Hex(d.doc_id.toString), d.doc_id))
          .sortBy(identity).take(Reservoir.TargetK).toSet
      }
    finalPerShard.foreach { case (sh, exp) =>
      val got = afterB1.filter(_.shard == sh).map(e => (e.priority, e.doc_id))
        .distinct.sortBy(identity).take(exp.size).toSet
      assert(got == exp, s"shard $sh reservoir")
    }
  }
}
