package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class StreamNearDupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def runStream(batches: Seq[Seq[StreamNearDup.Doc]]): Set[(Long, Long, Double)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamNearDup.Doc]
    val q = StreamNearDup.nearDupStream(input.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS neardup_out"); () }
  }

  test("stream matches equal the batch twin, however the stream is batched") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => StreamNearDup.Doc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id).toSeq
    val expected = StreamNearDup.nearDupBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "corpus has planted near-dups; the banding must find them")

    // one big batch
    val oneShot = runStream(Seq(docs))
    assert(oneShot == expected,
      s"single-batch stream must equal batch: missing ${expected -- oneShot}, extra ${oneShot -- expected}")
    // split into 5 micro-batches (in doc_id order, the ingest contract)
    val split = runStream(docs.grouped(math.max(1, docs.length / 5)).toSeq)
    assert(split == expected, "micro-batch splits must not change the match set")
  }

  test("per-bucket state stays bounded under a hot bucket") {
    // 200 near-identical docs all but guarantee shared buckets; the state
    // cap must hold occupancy at MaxPerBucket without erroring, and recent
    // arrivals must still be matched against the retained newest members
    val hot = (0L until 200L).map(i =>
      StreamNearDup.Doc(i, s"alpha beta gamma delta epsilon zeta eta theta iota kappa marker$i"))
    val got = runStream(Seq(hot.take(100), hot.drop(100)))
    assert(got.nonEmpty)
    // the very last doc must match something recent despite 199 predecessors
    assert(got.exists(_._1 == 199L), "newest-retained state must still catch fresh near-dups")
    assert(got.forall { case (d, e, j) => e < d && j >= StreamNearDup.SimThreshold })
  }
}
