package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `ann_cell_stats` contract: the audit replays from the family's own
  * assignment chain on the corpus (composition — counts, shares,
  * occupancy, integer-ten-thousandths mean cosine) and conserves mass;
  * a planted skewed corpus pins exact occupancy ratios, singleton-cell
  * mean cosine 1.0, and the dead-centroid row (a duplicate centroid's
  * cell emits n = 0 with NULL tightness — the row the audit exists to
  * surface). */
class AnnCellStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def roundAt(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("replays from the family's assignment chain on the corpus; mass conserved") {
    import org.apache.spark.sql.functions._
    graft.functions.HashExprs.register(spark)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = e.count()
    val cells = math.min(AnnIvf.cellsFor(n), n).toInt
    val cents = e.filter(col("vec_id") < cells).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val assigned = CentroidAssign.withBestCell(e, cents)
      .select(col("cell").cast("long"), col("cos_center")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 10000))
    val byCell = assigned.groupBy(_._1)
    val got = SparkEntry.queries("ann_cell_stats")(spark, sf).collect()
    assert(got.length == cells)
    assert(got.map(_.getLong(1)).sum == n, "every vector lands in exactly one cell")
    got.foreach { r =>
      val members = byCell.getOrElse(r.getLong(0), Array.empty)
      assert(r.getLong(1) == members.length)
      assert(r.getDouble(2) == roundAt(members.length.toDouble / n, 6))
      assert(r.getDouble(3) == roundAt(members.length.toDouble * cells / n, 4))
      if (members.nonEmpty)
        assert(r.getDouble(4) ==
          roundAt(members.map(_._2).sum.toDouble / members.length / 10000.0, 4))
      else assert(r.isNullAt(4))
    }
  }

  test("planted skew: exact occupancy ratios, singleton tightness 1.0, dead centroid emits 0") {
    val d = java.nio.file.Files.createTempDirectory("cellstats").toString
    def basis(i: Int): Seq[Float] =
      (0 until 64).map(j => if (j == i) 1.0f else 0.0f)
    // 16 centroids = basis vectors, EXCEPT e1 duplicates e0 (dead centroid:
    // everything that would land in cell 1 ties to the lower id 0);
    // 4 extra vectors lean toward e0 → cell 0 is the hot cell
    val lean = (0 until 64).map(j => if (j == 0) 0.9f else if (j == 2) 0.1f else 0.0f)
    val rows = (0L until 16L).map { i =>
      (i, if (i == 1L) basis(0) else basis(i.toInt), 0)
    } ++ (16L until 20L).map(i => (i, lean, 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("ann_cell_stats")(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toMap
    assert(got.size == 16)
    // cell 0: e0 + duplicate e1 + 4 leaners = 6 of 20 → occ 6·16/20 = 4.8
    assert(got(0L)._1 == 6L && got(0L)._2 == 4.8, s"hot cell: ${got(0L)}")
    // cell 1: dead centroid — the audit's reason to exist
    assert(got(1L) == ((0L, 0.0, -1.0)), s"dead centroid must emit n=0: ${got(1L)}")
    // singleton cells: their own centroid only, tightness exactly 1.0
    (2L until 16L).foreach { c =>
      assert(got(c) == ((1L, 0.8, 1.0)), s"singleton cell $c: ${got(c)}")
    }
  }
}
