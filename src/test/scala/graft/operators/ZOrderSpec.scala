package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def cells = graft.etl.EtlQueries.zorder(spark, sf)
    .select("event_id", "cellx", "celly")

  /** Per-file (minx, maxx, miny, maxy) — what parquet footer stats expose. */
  private def fileBoxes(path: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("cellx"), max("cellx"), min("celly"), max("celly"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("z-order prunes 2-D box queries to fewer files than a single-column sort") {
    // a dense 128×128 grid makes the file-box geometry exact: linear sort
    // yields 2-cell-wide full-height strips, z-order yields 16×16 blocks
    import spark.implicits._
    val grid = spark.range(128L * 128L)
      .select((col("id") % 128).as("cellx"), expr("id div 128").as("celly"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeClustered(grid, "cellx", "celly", 7, 64, s"$dir/z")
    grid.repartitionByRange(64, col("cellx"))
      .sortWithinPartitions("cellx", "celly")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val zBoxes = fileBoxes(s"$dir/z")
    val linBoxes = fileBoxes(s"$dir/linear")

    // simulate min/max pruning for a grid of square box queries: count the
    // files whose stats-range intersects each query box
    def touched(boxes: Array[(Long, Long, Long, Long)],
        queries: Seq[(Long, Long, Long, Long)]) = queries.map { case (x0, x1, y0, y1) =>
      boxes.count { case (mnx, mxx, mny, mxy) => mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1 }
    }.sum.toDouble / queries.size
    val queries = for (qx <- 0 until 128 by 32; qy <- 0 until 128 by 32)
      yield (qx.toLong, qx + 15L, qy.toLong, qy + 15L)
    val (zTouched, linTouched) = (touched(zBoxes, queries), touched(linBoxes, queries))
    assert(zTouched < linTouched * 0.6,
      s"z-order touches $zTouched files/query, linear $linTouched — no locality win")
    // and the real crash-grid layout also wins, even if sparsity mutes it
    ZOrder.writeClustered(cells, "cellx", "celly", 10, 64, s"$dir/zev")
    cells.repartitionByRange(64, col("cellx"))
      .sortWithinPartitions("cellx", "celly")
      .write.mode("overwrite").parquet(s"$dir/linev")
    val evQueries = for (qx <- 0 until 1024 by 128; qy <- 0 until 1024 by 128)
      yield (qx.toLong, qx + 63L, qy.toLong, qy + 63L)
    assert(touched(fileBoxes(s"$dir/zev"), evQueries) <
      touched(fileBoxes(s"$dir/linev"), evQueries))
  }

  test("z-values are curve-consistent: interleave round-trips the cell ids") {
    val rows = cells
      .withColumn("zval", ZOrder.zValue(col("cellx"), col("celly"), 10))
      .limit(500).collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val xBack = (0 until 10).map(k => ((z >> (2 * k)) & 1L) << k).sum
      val yBack = (0 until 10).map(k => ((z >> (2 * k + 1)) & 1L) << k).sum
      assert(xBack == x && yBack == y, s"z=$z does not round-trip ($x,$y)")
    }
  }
}
