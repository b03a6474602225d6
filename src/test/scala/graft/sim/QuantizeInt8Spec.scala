package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `emb_quantize_int8` contract: codes land in [0,255], extremes map to the
  * rails, constant dims code to 0 with zero error, the reconstruction error
  * respects the half-step bound, and the corpus run replays driver-side. */
class QuantizeInt8Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("planted geometry: rails, midpoints, constant dims") {
    val dim = QuantizeInt8.Dim
    // dim 0: values {0, 1} — rails; dim 1: constant 0.5; dim 2: {0, 0.5, 1}
    // — 0.5 codes to round(127.5) = 128 (HALF_UP); rest zeros
    def v(a: Double, c: Double): Seq[Double] =
      Seq(a, 0.5, c) ++ Seq.fill(dim - 3)(0.0)
    val d = java.nio.file.Files.createTempDirectory("qint8").toString
    Seq(0L -> v(0.0, 0.0), 1L -> v(1.0, 0.5), 2L -> v(0.0, 1.0))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("emb_quantize_int8")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1).split('|').map(_.toLong).toSeq,
        r.getDouble(2)))
    assert(out.map(o => o._2.head) sameElements Array(0L, 255L, 0L), "rails")
    assert(out.forall(_._2(1) == 0L), "constant dim codes to 0")
    assert(out.map(_._2(2)).toSeq == Seq(0L, 128L, 255L), "HALF_UP midpoint")
    assert(out.forall(_._3 <= 0.5 / 255.0 + 1e-12),
      "reconstruction error bounded by half a quantization step")
    assert(out.forall(o => o._2.forall(c => c >= 0L && c <= 255L)))
  }

  test("corpus run equals a driver replay") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val dim = e.head._2.length
    val mins = Array.tabulate(dim)(i => e.map(_._2(i)).min)
    val scales = Array.tabulate(dim)(i => (e.map(_._2(i)).max - mins(i)) / 255.0)
    def half(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val expect = e.map { case (id, v) =>
      val codes = Array.tabulate(dim)(i =>
        if (scales(i) == 0.0) 0L else half((v(i) - mins(i)) / scales(i)))
      val err = Array.tabulate(dim)(i =>
        math.abs(mins(i) + codes(i) * scales(i) - v(i))).max
      (id, codes.mkString("|"), math.rint(err * 1e9) / 1e9)
    }.toSeq
    val got = SparkEntry.queries("emb_quantize_int8")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
