package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `ann_range_search` is exact by construction — the spec replays the
  * radius filter driver-side and pins the semantic relationship with
  * brute-force top-k (range = quality bound, k-NN = count bound). */
class RangeSearchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private lazy val vectors: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private lazy val got: Seq[(Long, Long, Double)] =
    SimQueries.annRangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("range search equals the driver-side radius replay") {
    val expect = (for {
      q <- 0L until 10L
      (nId, e) <- vectors if nId != q
      c = cos(vectors(q), e) if c >= SimQueries.RangeTau
    } yield (q, nId, c)).toSet
    assert(got.toSet == expect)
    assert(got.nonEmpty, "tau must fire on the test corpus")
  }

  test("every top-k hit above tau is a range hit, and vice versa") {
    val topk = SimQueries.annTopkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val rangeSet = got.map(t => (t._1, t._2)).toSet
    topk.filter(_._3 >= SimQueries.RangeTau).foreach { case (q, n, _) =>
      assert(rangeSet((q, n)), s"top-k hit ($q,$n) above tau missing from range")
    }
    // a probe's range hits beyond its k-th neighbor are allowed; but any
    // range hit scoring ABOVE the probe's k-th top-k score must be in top-k
    val kth = topk.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val topkSet = topk.map(t => (t._1, t._2)).toSet
    got.foreach { case (q, n, c) =>
      if (c > kth.getOrElse(q, Double.MaxValue)) assert(topkSet((q, n)))
    }
  }
}
