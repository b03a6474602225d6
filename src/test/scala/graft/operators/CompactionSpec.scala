package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("compaction collapses small files without changing data") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    // 40 tiny appends → ≥40 files
    (0 until 40).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.mode("append").parquet(path)
    }
    def parquetFiles = new java.io.File(path).listFiles.count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 40)
    val beforeData = spark.read.parquet(path).collect().map(r => (r.getLong(0), r.getString(1))).toSet

    Compaction.compact(spark, path, targetRowsPerFile = 20L)

    assert(parquetFiles <= 4, s"expected ≤4 files after compaction, got $parquetFiles")
    val afterData = spark.read.parquet(path).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterData == beforeData)
  }
}
