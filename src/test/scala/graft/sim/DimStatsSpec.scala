package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `emb_dim_stats`: driver-side replay of the quantized moments plus a
  * planted corpus with one dead and one dominant dimension. */
class DimStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("per-dimension stats equal a driver-side quantized replay") {
    val vecs = graft.Tables.embeddings(spark, sf).collect()
      .map(_.getSeq[Float](1).toArray)
    val dims = vecs.head.length
    val got = VectorOps.embDimStats(spark, sf).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getBoolean(5), row.getBoolean(6))).toMap
    val quant = vecs.map(_.map(x =>
      BigDecimal(x.toDouble * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val vnums = (0 until dims).map { d =>
      val xs = quant.map(_(d))
      val n = xs.length.toLong
      (d, n, xs.sum, n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    }
    val totV = vnums.map(_._4).sum
    vnums.foreach { case (d, n, sx, vnum) =>
      val exp = (n, r(sx.toDouble / n / 1000000.0, 6),
        r(vnum.toDouble / n / n / 1e12, 6),
        r(vnum.toDouble / totV, 4), vnum == 0L,
        vnum.toDouble * dims > totV.toDouble * VectorOps.DominantX)
      assert(got(d.toLong) == exp, s"dim $d: ${got(d.toLong)} vs $exp")
    }
  }

  test("a planted dead dimension and a dominant dimension flag correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    import spark.implicits._
    // dim 0 constant (dead); dim 1 swings ±1 (dominant); dims 2..7 tiny noise
    val rows = (0L until 100L).map { i =>
      val v = Array.fill(8)(0.001f * (i % 3))
      v(0) = 0.25f
      v(1) = if (i % 2 == 0) 1.0f else -1.0f
      (i, v, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.embDimStats(spark, dir).collect()
      .map(row => row.getLong(0) -> (row.getBoolean(5), row.getBoolean(6))).toMap
    assert(got(0L)._1, "constant dim must flag dead")
    assert(got(1L)._2, "high-variance dim must flag dominant")
    assert(!got(2L)._1 && !got(2L)._2, s"noise dim misflagged: ${got(2L)}")
  }
}
