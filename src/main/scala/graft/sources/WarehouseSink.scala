package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse sink — the CARTO-table analog (main.py:301-375, 793-807).
  *
  * The reference upserts into one mutable PostGIS table with chunked INSERT
  * … WHERE NOT IN queries and periodic VACUUM FULL. The Spark-native shape
  * is an immutable, partitioned parquet table maintained by partition
  * overwrite:
  *
  *  - rows are partitioned by (year, month) — the reference's own derived
  *    columns — so an incremental batch touches only the month partitions it
  *    contains (dynamic partition overwrite), never the rest of history;
  *  - the merge is set-based: new rows anti-joined in, changed rows replace
  *    their old versions; no driver-side chunk loops, no rate-limit sleeps;
  *  - idempotent: re-running the same batch converges to the same table
  *    (the reference relies on NOT IN for that);
  *  - no VACUUM: partitions are rewritten whole, there is no bloat.
  */
object WarehouseSink {

  /** Write a full snapshot, partitioned for incremental maintenance. */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy("year", "month")
      .parquet(path)

  /** Merge an incremental batch into the warehouse by (year, month)
    * partition overwrite. `key` identifies records (socrata_id/event_id).
    * Only partitions present in `batch` are rewritten. */
  def merge(spark: SparkSession, batch: DataFrame, path: String, key: String): Unit = {
    val existing =
      // Only a genuinely-absent warehouse means "first load". Any other
      // failure (transient IO, corrupt footer) must abort the merge —
      // treating it as first-load would overwrite the batch's partitions
      // with batch-only data and silently drop existing rows.
      try Some(spark.read.parquet(path))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" => None
      }
    val merged =
      existing match {
        case None => batch
        case Some(existing) =>
        // months touched by this batch (small driver list — months, not rows)
        val touched = batch.select("year", "month").distinct()
        val existingTouched = existing.join(broadcast(touched), Seq("year", "month"), "left_semi")
        // batch wins on key collision (changed tallies / moved geometries)
        val kept = existingTouched.join(batch.select(key), Seq(key), "left_anti")
        // break lineage: Spark refuses to overwrite a path its own plan
        // reads. At production scale this sink would be a table format with
        // real MERGE (Delta/Iceberg); checkpointing the delta keeps the
        // parquet variant correct and still partition-local.
        kept.unionByName(batch).localCheckpoint(true)
      }
    // dynamic overwrite scoped to THIS write only — setting it on the shared
    // session would silently change later full-snapshot Overwrite semantics
    merged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month")
      .parquet(path)
  }
}
