package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AnnPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("ADC scores match a driver-side replay of the PQ definition") {
    val got = AnnPq.annTopkPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)

    // replay: codebooks from the first NBooks vectors, cosine argmax codes,
    // LUT dots, ascending-subspace sum — entirely in plain Scala
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val books = math.min(AnnPq.NBooks, all.size)
    val cb = Array.tabulate(AnnPq.NSub) { s =>
      (0 until books).map(c => all(c.toLong).slice(s * AnnPq.SubDim, (s + 1) * AnnPq.SubDim)).toArray
    }
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def code(v: Array[Double], s: Int): Int =
      (0 until books).minBy { c =>
        val sc = BigDecimal(cos(v.slice(s * AnnPq.SubDim, (s + 1) * AnnPq.SubDim), cb(s)(c)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (-sc, c)
      }
    def adc(q: Array[Double], v: Array[Double]): Double = {
      var acc = 0.0
      for (s <- 0 until AnnPq.NSub)
        acc += dot(q.slice(s * AnnPq.SubDim, (s + 1) * AnnPq.SubDim), cb(s)(code(v, s)))
      BigDecimal(acc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (qId, nId, _, score) =>
      val expect = adc(all(qId), all(nId))
      assert(math.abs(expect - score) < 1e-9,
        s"ADC mismatch for ($qId,$nId): spark=$score replay=$expect")
    }
  }

  test("PQ recall against brute-force top-k clears the floor") {
    val brute = SimQueries.annTopkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pq = AnnPq.annTopkPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = brute.keys.toSeq.sorted.map { q =>
      val b = brute(q); val p = pq.getOrElse(q, Set.empty)
      b.intersect(p).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    // 16-entry codebooks over unstructured random floats are a worst case
    // for PQ; the floor pins that the approximation still concentrates far
    // above chance (random top-10 of ~n candidates recalls ~10/n ≈ 2%)
    assert(mean >= 0.2, s"mean recall@10 $mean below floor; per-query: $recalls")
  }

  test("codes stay within the codebook and every query emits at most TopK ranked rows") {
    val rows = AnnPq.annTopkPq(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.length <= AnnPq.TopK)
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length.toLong))
    }
  }
}
