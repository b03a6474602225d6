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
    * Only partitions present in `batch` are rewritten.
    *
    * `relocateKeys = true` additionally rewrites partitions that hold an
    * OLD version of a batch key — required when an update can change the
    * partition columns themselves (a corrected crash_date moves the row
    * to another month): without it the old partition keeps a stale
    * duplicate, because the partition-scoped delete never looks there. */
  def merge(spark: SparkSession, batch: DataFrame, path: String, key: String,
      relocateKeys: Boolean = false): Unit = {
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
    val (merged, emptiedParts) =
      existing match {
        case None => (batch, Array.empty[(Any, Any)])
        case Some(existing) =>
        // months touched by this batch (small driver list — months, not rows)
        val batchMonths = batch.select("year", "month").distinct()
        val touched =
          if (!relocateKeys) batchMonths
          else batchMonths.unionByName(
            existing.join(batch.select(key), Seq(key), "left_semi")
              .select("year", "month").distinct()).distinct()
        val existingTouched = existing.join(broadcast(touched), Seq("year", "month"), "left_semi")
        // batch wins on key collision (changed tallies / moved geometries)
        val kept = existingTouched.join(batch.select(key), Seq(key), "left_anti")
        // break lineage: Spark refuses to overwrite a path its own plan
        // reads. At production scale this sink would be a table format with
        // real MERGE (Delta/Iceberg); checkpointing the delta keeps the
        // parquet variant correct and still partition-local.
        val merged = kept.unionByName(batch).localCheckpoint(true)
        // dynamic overwrite only rewrites partitions PRESENT in `merged`; a
        // relocation that empties a partition would leave its old file (and
        // the stale key) behind. Collect the emptied set NOW — post-write,
        // `existing`'s file listing is stale. A table format does this
        // deletion transactionally; this is the parquet-path equivalent.
        val emptied =
          if (!relocateKeys) Array.empty[(Any, Any)]
          else touched.exceptAll(merged.select("year", "month").distinct())
            .distinct().collect().map(r => (r.get(0), r.get(1)))
        (merged, emptied)
      }
    // dynamic overwrite scoped to THIS write only — setting it on the shared
    // session would silently change later full-snapshot Overwrite semantics
    merged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month")
      .parquet(path)
    if (emptiedParts.nonEmpty) {
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptiedParts.foreach { case (y, m) =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"year=$y/month=$m"), true)
      }
    }
  }
}
