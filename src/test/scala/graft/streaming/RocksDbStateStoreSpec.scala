package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryProgress
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import EventStream.Event

/** StateBackend contract: the stateful operators run UNMODIFIED on the
  * RocksDB state store — identical output to the default HDFS-backed
  * provider across micro-batch splits — and the query progress proves the
  * backend is really RocksDB (rocksdb* custom metrics, state rows > 0). */
class RocksDbStateStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private lazy val events: Seq[Event] = graft.Tables.events(spark, sf)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  /** Run a streaming transform over 4 micro-batches; return the emitted
    * rows and every progress event. */
  private def run[T](name: String, transform: Dataset[Event] => Dataset[T])
      : (Seq[T], Seq[StreamingQueryProgress]) = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = transform(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.size / 4)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      (spark.table(name).as[T](transform(input.toDS()).encoder).collect().toSeq,
        q.recentProgress.toSeq)
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  private def assertRocksDbLive(progress: Seq[StreamingQueryProgress]): Unit = {
    val ops = progress.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "stateful query must report state operators")
    assert(ops.map(_.numRowsTotal).max > 0, "state must hold rows")
    val metricKeys = ops.flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
    assert(metricKeys.exists(_.startsWith("rocksdb")),
      s"progress must carry rocksdb state metrics, got: ${metricKeys.distinct.take(8)}")
  }

  test("stream_cep emits identical matches on RocksDB, with live rocksdb state metrics") {
    val (default, defProg) = run("cep_hdfs", StreamCep.cepStream _)
    assert(defProg.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
      .forall(!_.startsWith("rocksdb")), "control run must be on the default store")
    val (rocks, prog) = StateBackend.withRocksDb(spark) {
      run("cep_rocks", StreamCep.cepStream _)
    }
    assertRocksDbLive(prog)
    assert(rocks.toSet == default.toSet, "RocksDB output diverged from default store")
    assert(default.nonEmpty)
  }

  test("stream_cdc_apply snapshots are identical on RocksDB, with live rocksdb state metrics") {
    val (default, _) = run("cdc_hdfs", StreamCdcApply.snapshotStream _)
    val (rocks, prog) = StateBackend.withRocksDb(spark) {
      run("cdc_rocks", StreamCdcApply.snapshotStream _)
    }
    assertRocksDbLive(prog)
    // per-key convergence: the final emission per user matches
    def finalView(rows: Seq[StreamCdcApply.SnapshotRow]) =
      rows.groupBy(_.user_id).view.mapValues(_.maxBy(_.n_versions)).toMap
    assert(finalView(rocks) == finalView(default))
    assert(default.nonEmpty)
  }
}
