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

  /** Generic two-store runner for arbitrary input row types. */
  private def runOn[I: org.apache.spark.sql.Encoder, T](name: String, feed: Seq[Seq[I]],
      transform: Dataset[I] => Dataset[T]): (Seq[T], Seq[StreamingQueryProgress]) = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[I]
    val q = transform(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed.foreach { b => input.addData(b); q.processAllAvailable() }
      (spark.table(name).as[T](transform(input.toDS()).encoder).collect().toSeq,
        q.recentProgress.toSeq)
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  private def maxStateRows(progress: Seq[StreamingQueryProgress]): Long = {
    val ops = progress.flatMap(_.stateOperators)
    if (ops.isEmpty) 0L else ops.map(_.numRowsTotal).max
  }

  /** Both stores, equality + live-rocksdb + declared state bound. */
  private def bothStores[I: org.apache.spark.sql.Encoder, T](name: String, feed: Seq[Seq[I]],
      transform: Dataset[I] => Dataset[T], stateBound: Long, boundWhat: String): Unit = {
    val (default, defProg) = runOn(s"${name}_hdfs", feed, transform)
    val (rocks, prog) = StateBackend.withRocksDb(spark) {
      runOn(s"${name}_rocks", feed, transform)
    }
    assertRocksDbLive(prog)
    assert(rocks.toSet == default.toSet, s"$name: RocksDB output diverged from default store")
    assert(default.nonEmpty, s"$name must emit")
    Seq("default" -> defProg, "rocksdb" -> prog).foreach { case (store, p) =>
      assert(maxStateRows(p) <= stateBound,
        s"$name state on $store exceeded its declared bound ($boundWhat): " +
          s"${maxStateRows(p)} > $stateBound")
    }
  }

  test("stream_sessionize emits identical sessions on RocksDB; state stays O(active users)") {
    val feed = events.grouped(math.max(1, events.size / 4)).toSeq
    val nUsers = events.map(_.user_id).distinct.size.toLong
    bothStores("sess", feed, (d: Dataset[Event]) => EventStream.sessionize(d),
      stateBound = nUsers, boundWhat = "one open session per user")
  }

  test("stream_neardup emits identical matches on RocksDB; state stays <= one row per band bucket") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[StreamNearDup.Doc]
      .collect().sortBy(_.doc_id).toSeq
    val feed = docs.grouped(math.max(1, docs.size / 4)).toSeq
    bothStores("ndup", feed, (d: Dataset[StreamNearDup.Doc]) => StreamNearDup.nearDupStream(d),
      stateBound = graft.dedup.MinHashLsh.Bands.toLong * docs.size,
      boundWhat = "<= Bands x docs bucket rows, each ring-capped at MaxPerBucket")
  }

  test("stream_topk emits identical ranks on RocksDB; state is one frontier per event type") {
    val counts = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day", "user_id")
      .groupBy("event_type", "day", "user_id").count()
      .collect().map(r => StreamTopK.DailyUserCount(r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay, r.getLong(2), r.getLong(3)))
      .sortBy(c => (c.epoch_day, c.event_type, c.user_id)).toSeq
    val days = counts.map(_.epoch_day).distinct.sorted
    val feed = days.grouped(math.max(1, days.length / 4))
      .map(ds => counts.filter(c => ds.contains(c.epoch_day))).toSeq
    val nTypes = counts.map(_.event_type).distinct.size.toLong
    bothStores("tk", feed, (d: Dataset[StreamTopK.DailyUserCount]) => StreamTopK.topkStream(d),
      stateBound = nTypes, boundWhat = "one last-day frontier per event type")
  }

  test("stream_anomaly emits identical flags on RocksDB; state is one ring buffer per event type") {
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "cast(to_date(ts) as string) AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => StreamAnomaly.DailyVolume(r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay, r.getLong(2)))
      .sortBy(d => (d.epoch_day, d.event_type)).toSeq
    val days = daily.map(_.epoch_day).distinct.sorted
    val feed = days.grouped(math.max(1, days.length / 4))
      .map(ds => daily.filter(c => ds.contains(c.epoch_day))).toSeq
    val nTypes = daily.map(_.event_type).distinct.size.toLong
    bothStores("anom", feed, (d: Dataset[StreamAnomaly.DailyVolume]) => StreamAnomaly.anomalyStream(d),
      stateBound = nTypes, boundWhat = "one HistDays ring buffer per event type")
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
