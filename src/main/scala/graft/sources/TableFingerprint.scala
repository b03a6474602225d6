package graft.sources

import org.apache.spark.sql.SparkSession

/** File-level content fingerprint of a parquet table: names, sizes, and
  * mtimes of its files — a listing, not a data scan (the same check a table
  * format does against its snapshot id). Spark writes fresh UUID part-file
  * names on every overwrite, so ANY rewrite of the data — even an in-place
  * same-size one — changes the fingerprint. Used to key derived-artifact
  * caches (trained centroids, signature stores) so they can never serve
  * results for data that is no longer there. */
object TableFingerprint {

  def of(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString(",")
  }
}
