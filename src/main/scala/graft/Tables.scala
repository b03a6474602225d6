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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy conf) and truncate to a micros
    * timestamp — the same truncation DuckDB applies when it loads
    * TIMESTAMP_NS into its micros TIMESTAMP, so both engines see identical
    * values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** events with `ts >= cutoff`, filtered on the RAW nanos long so the
    * predicate pushes into the parquet scan (a filter on the converted
    * timestamp column cannot — `timestamp_micros(ts div 1000) >= c` wraps
    * the column in an expression). Exact for whole-microsecond cutoffs:
    * floor(ns/1000) >= c_us  ⟺  ns >= c_us·1000. At 100 TB this is the
    * difference between scanning a window and scanning history. */
  def eventsSince(s: SparkSession, d: String, cutoff: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cutoffNanos = cutoff.getTime * 1000000L
    table(s, d, "events")
      .filter(col("ts") >= cutoffNanos)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
