package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction (SURVEY.md §5 ops note).
  *
  * Incremental ingest (the reference appends a few hundred rows per day)
  * accumulates small files; at 100 TB the scan cost becomes dominated by
  * file-open overhead and the driver's file-listing memory. Compaction
  * rewrites a table to ~`targetRowsPerFile` rows per file using
  * repartition + maxRecordsPerFile, preserving partition columns.
  */
object Compaction {

  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long,
      partitionCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val writer = df.repartition(files)
      .localCheckpoint(true) // self-overwrite: break lineage to the input path
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRowsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
