package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pruned parquet loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each loader is a plain `spark.read.parquet` — column pruning and filter
  * pushdown are left to Catalyst, which propagates the query's `select`s and
  * `filter`s down into the scan (visible as ReadSchema / PushedFilters in
  * `explain("formatted")`). At 100 TB these become partitioned tables; the
  * loaders are the single seam where partition-pruned paths would be applied.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects, so it's read as raw nanos via the
    * legacy conf and truncated to micros (the same truncation DuckDB
    * applies loading TIMESTAMP_NS) — or as plain timestamp[us], which
    * Spark reads as TIMESTAMP_NTZ. Both normalize to a session-TZ (UTC)
    * TimestampType column with identical values, chosen off the actual
    * file schema so a driver-side regeneration of the test data cannot
    * break the loaders. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** events with `ts >= cutoff`, filtered on the RAW stored column so the
    * predicate pushes into the parquet scan (a filter on a converted
    * timestamp column cannot — `timestamp_micros(ts div 1000) >= c` wraps
    * the column in an expression). Exact for whole-microsecond cutoffs:
    * floor(ns/1000) >= c_us  ⟺  ns >= c_us·1000. At 100 TB this is the
    * difference between scanning a window and scanning history. */
  def eventsSince(s: SparkSession, d: String, cutoff: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        val cutoffNanos = cutoff.getTime * 1000000L
        raw.filter(col("ts") >= cutoffNanos)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.filter(col("ts") >= lit(cutoff).cast(TimestampNTZType))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw.filter(col("ts") >= cutoff)
    }
  }
  /** events with `ts <= cutoff`, filtered on the RAW stored column (the
    * [[eventsSince]] contract mirrored for the time-travel scan): exact
    * for whole-microsecond cutoffs — floor(ns/1000) <= c_us ⟺
    * ns < (c_us+1)·1000. */
  def eventsUntil(s: SparkSession, d: String, cutoff: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        val limitNanos = (cutoff.getTime * 1000L + 1L) * 1000L
        raw.filter(col("ts") < limitNanos)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.filter(col("ts") <= lit(cutoff).cast(TimestampNTZType))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw.filter(col("ts") <= cutoff)
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
