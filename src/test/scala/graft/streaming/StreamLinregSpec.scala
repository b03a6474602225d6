package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class LrRow(event_type: String, y: Long, x1: Long, x2: Long)

/** `stream_linreg` contract — the triangle: (1) the batch twin equals the
  * registered `stats_linreg` row for row; (2) the streaming aggregation
  * emits coefficients bit-identical to batch however the event feed is
  * micro-batched; (3) the mid-stream update trajectory IS the batch
  * answer of each prefix (integer moments make stream ≡ batch exact, not
  * approximate). */
class StreamLinregSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def asTuple(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      if (r.isNullAt(3)) null else r.getDouble(3),
      if (r.isNullAt(4)) null else r.getDouble(4),
      if (r.isNullAt(5)) null else r.getDouble(5))

  test("batch twin equals the registered stats_linreg row for row") {
    val twin = StreamLinreg.modelBatch(spark, sf).collect().map(asTuple).toSeq
    val batch = graft.SparkEntry.queries("stats_linreg")(spark, sf)
      .collect().map(asTuple).toSeq
    assert(twin == batch && twin.nonEmpty)
  }

  test("stream equals batch however the feed is micro-batched; prefixes replay too") {
    val facts = graft.stats.Linreg.factFrame(spark, sf).as[LrRow].collect().toSeq
    val expected = StreamLinreg.modelBatch(spark, sf).collect().map(asTuple).toSet
    for (nSplits <- Seq(1, 4)) {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[LrRow]
      val q = StreamLinreg.modelFrame(input.toDF())
        .writeStream.format("memory").queryName("lr_out")
        .outputMode("update").start()
      try {
        val batches = facts.grouped(math.max(1, facts.length / nSplits)).toSeq
        var fed = Seq.empty[LrRow]
        batches.foreach { b =>
          fed ++= b
          input.addData(b); q.processAllAvailable()
          // update-mode sink appends every refresh; the LAST row per type
          // is the live model — and must equal the batch answer of the
          // prefix fed so far
          val live = spark.table("lr_out").withColumn("rn", monotonically_increasing_id())
            .orderBy(col("rn")).collect()
            .map(r => r.getString(0) -> asTuple(r)).toMap.values.toSet
          val prefix = StreamLinreg.modelFrame(fed.toDF()).collect().map(asTuple).toSet
          assert(live == prefix,
            s"$nSplits-split prefix of ${fed.length}: live model diverged from batch prefix")
        }
        val finalLive = spark.table("lr_out").withColumn("rn", monotonically_increasing_id())
          .orderBy(col("rn")).collect()
          .map(r => r.getString(0) -> asTuple(r)).toMap.values.toSet
        assert(finalLive == expected, s"$nSplits-split final model diverged from batch")
      } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS lr_out"); () }
    }
  }
}
