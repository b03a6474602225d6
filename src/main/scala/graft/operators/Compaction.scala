package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction (SURVEY.md §5 ops note).
  *
  * Incremental ingest (the reference appends a few hundred rows per day)
  * accumulates small files; at 100 TB the scan cost becomes dominated by
  * file-open overhead and the driver's file-listing memory. Compaction
  * rewrites a table into size-targeted files using repartition +
  * maxRecordsPerFile, preserving partition columns.
  *
  * The output file count is sized from the table's on-disk BYTES (a
  * driver-side file listing — metadata only), not a count() of the rows:
  * counting would add a full extra scan of the very table being compacted.
  */
object Compaction {

  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024

  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = DefaultTargetFileBytes): Unit = {
    val df = spark.read.parquet(path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = df.inputFiles.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val writer = df.repartition(files)
      .localCheckpoint(true) // self-overwrite: break lineage to the input path
      .write
      .mode(SaveMode.Overwrite)
      // row cap as a skew guard on top of the byte-based sizing
      .option("maxRecordsPerFile", targetRowsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
