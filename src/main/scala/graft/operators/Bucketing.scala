package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers (SURVEY.md §5 — co-located joins).
  *
  * At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
  * both sides bucketed (and sorted) by the join key moves that exchange to
  * write time, once, instead of every query: Spark's bucketed scan exposes
  * the hash partitioning to the planner, so a sort-merge join over two
  * tables bucketed the same way needs NO Exchange at read time — verified
  * by BucketingSpec against the physical plan.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
