package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True Structured Streaming paths (SURVEY.md §2 #31-32).
  *
  * The reference is a scheduled batch poller (fetch last 2 months, dedup,
  * load — main.py:79-132). Spark-natively that becomes a continuous
  * pipeline: `readStream` → event-time windows with watermarks for the
  * rolling aggregations, and `flatMapGroupsWithState` for gap-based
  * sessions. Batch twins with identical semantics live in StreamQueries so
  * the DuckDB oracle can check the logic; these streaming versions are
  * exercised end-to-end (MemoryStream, multiple batches, late data) in
  * EventStreamSpec.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Watermarked tumbling-window counts per event type. Late events beyond
    * the watermark are dropped; state is bounded by watermark horizon —
    * the property that keeps this runnable forever at 100 TB/day. */
  def windowedAgg(events: Dataset[Event], watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment: each event joins a broadcast dimension
    * table, then aggregates per window × dim attribute. The static side is
    * re-read per micro-batch by Spark but never shuffles the stream; state
    * is bounded by the watermark exactly as in windowedAgg. Batch twin with
    * identical semantics: StreamQueries.enrich (oracle-checked). */
  def enrichedWindowAgg(events: Dataset[Event], dim: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") % 25 === col("nk"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_name"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: purchases joined to the same user's
    * clicks in the preceding `windowMinutes`. Both sides are watermarked,
    * and the join condition bounds the click's event time relative to the
    * purchase's, so Spark can expire click state once the watermark passes
    * c.ts + window — state is O(events in the interval horizon), the
    * property that lets the join run forever. Batch twin with identical
    * semantics: StreamQueries.intervalJoin (oracle-checked). */
  def intervalJoin(purchases: Dataset[Event], clicks: Dataset[Event],
      windowMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark).alias("p")
    val c = clicks.withWatermark("ts", watermark).alias("c")
    p.join(c, expr(
      s"""p.user_id = c.user_id AND
         |c.ts <= p.ts AND
         |c.ts >= p.ts - INTERVAL $windowMinutes MINUTES""".stripMargin))
      .select(col("p.event_id").as("purchase_id"), col("c.event_id").as("click_id"),
        col("p.user_id").as("user_id"))
  }

  /** One micro-batch of the CDC apply: collapse the batch to its latest
    * change per key (latest ts wins — a batch can carry several updates for
    * one record), derive the sink's partition columns, and run the
    * idempotent keyed merge. Factored out of the stream so the replay
    * property is directly testable. */
  def applyCdcBatch(batch: Dataset[Event], path: String): Unit = {
    // tie-break beyond ts: a change feed at second granularity can carry
    // two same-ts changes for one key, and a replayed batch must pick the
    // SAME winner (a real feed would order by its change sequence number;
    // content columns stand in for one here)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("ts").desc, col("value").desc, col("event_type").desc)
    val latest = batch.toDF()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
    // relocateKeys: an update may carry a corrected ts that moves the row
    // to another month partition — the old partition must be rewritten too
    graft.sources.WarehouseSink.merge(batch.sparkSession, latest, path, "event_id",
      relocateKeys = true)
  }

  /** CDC apply sink: the change stream merged into the warehouse via
    * foreachBatch. Structured Streaming re-delivers the last uncommitted
    * micro-batch on failure recovery, so the sink sees at-least-once — but
    * WarehouseSink.merge is idempotent (batch wins per key, partitions
    * rewritten whole), so replays converge to the same table: exactly-once
    * TABLE STATE without a transactional sink. The reference reaches the
    * same property through its NOT-IN guard (main.py:368-371). */
  def cdcApply(changes: Dataset[Event], path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[Event], _: Long) => applyCdcBatch(b, path))
      .start()

  /** Gap-based sessionization with event-time timeout: a session closes when
    * the watermark passes its end + gap, at which point it is emitted.
    * State per user is one open session — O(active users), not O(events). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = StreamQueries.SessionGapSeconds,
      watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
          } else {
            // Sweep-merge the open session and every batch event as time
            // intervals: adjacent intervals within the gap coalesce, so
            // several late events within gap of each other form ONE past
            // session (per-event special-casing fragmented them), and a
            // late event inside the open session's gap extends it backwards.
            // Everything but the latest interval is closed immediately —
            // with event-time timeout only the open session can wait.
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val items = (state.getOption.toList ++
              sorted.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value)))
              .sortBy(iv => (iv.start, iv.end))
            val merged = items.foldLeft(List.empty[SessionState]) {
              case (h :: t, iv) if iv.start - h.end <= gapMs =>
                SessionState(h.start, math.max(h.end, iv.end), h.n + iv.n, h.sum + iv.sum) :: t
              case (acc, iv) => iv :: acc
            }
            merged match {
              case open :: closed =>
                state.update(open)
                state.setTimeoutTimestamp(open.end + gapMs)
                closed.reverseIterator.map(s =>
                  Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
              case Nil => Iterator.empty
            }
          }
      }
  }
}
