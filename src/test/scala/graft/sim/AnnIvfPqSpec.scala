package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AnnIvfPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // driver-side replay of the whole IVFADC definition in plain Scala:
  // cells, residual codebooks, codes, per-query cterm + LUT ADC
  private lazy val all = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
  private lazy val cells = math.min(AnnIvf.cellsFor(all.size), all.size)
  private lazy val cents = (0 until cells).map(i => all(i.toLong)).toArray
  private def dot(a: Array[Double], b: Array[Double]) =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def rank6(v: Array[Double], cs: Array[Array[Double]], k: Int): Seq[Int] =
    cs.zipWithIndex.map { case (c, i) =>
      val raw = dot(v, c) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c, c)))
      val s = if (raw.isNaN) Double.NegativeInfinity
        else BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (s, i)
    }.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2).toSeq
  private lazy val cb = {
    val res = (cells until cells + AnnIvfPq.NBooks).map { v =>
      val e = all(v.toLong); val c = cents(rank6(e, cents, 1).head)
      Array.tabulate(e.length)(i => e(i) - c(i))
    }
    Array.tabulate(AnnIvfPq.NSub)(s =>
      res.map(_.slice(s * AnnIvfPq.SubDim, (s + 1) * AnnIvfPq.SubDim)).toArray)
  }
  test("scores match a driver-side replay of the IVFADC definition") {
    val got = AnnIvfPq.annTopkIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (qId, nId, _, score) =>
      val q = all(qId); val v = all(nId)
      val cell = rank6(v, cents, 1).head
      val cent = cents(cell)
      val res = Array.tabulate(v.length)(i => v(i) - cent(i))
      var adc = 0.0
      for (s <- 0 until AnnIvfPq.NSub) {
        val rs = res.slice(s * AnnIvfPq.SubDim, (s + 1) * AnnIvfPq.SubDim)
        val code = rank6(rs, cb(s), 1).head
        adc += dot(q.slice(s * AnnIvfPq.SubDim, (s + 1) * AnnIvfPq.SubDim), cb(s)(code))
      }
      val expect = BigDecimal(dot(q, cent) + adc)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(expect - score) < 1e-9,
        s"IVFADC mismatch for ($qId,$nId): spark=$score replay=$expect")
    }
  }

  test("every returned candidate lives in one of its query's probed cells") {
    val got = AnnIvfPq.annTopkIvfPq(spark, sf).collect()
    got.foreach { r =>
      val probed = rank6(all(r.getLong(0)), cents, AnnIvfPq.NProbe).toSet
      val nCell = rank6(all(r.getLong(1)), cents, 1).head
      assert(probed.contains(nCell),
        s"candidate ${r.getLong(1)} of query ${r.getLong(0)} outside probed cells")
    }
  }

  test("IVFADC recall against brute-force top-k clears the floor") {
    val brute = SimQueries.annTopkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val got = AnnIvfPq.annTopkIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = brute.keys.toSeq.sorted.map { q =>
      val b = brute(q); b.intersect(got.getOrElse(q, Set.empty)).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe/cells pruning ON TOP of 16-entry PQ over unstructured random
    // floats — the compounded worst case; the floor pins "far above the
    // ~2% chance rate", not production recall (structured embeddings and
    // trained codebooks are what lift it there)
    assert(mean >= 0.1, s"mean recall@10 $mean below floor; per-query: $recalls")
  }

  test("rank integrity: contiguous ranks from 1, at most TopK per query") {
    val rows = AnnIvfPq.annTopkIvfPq(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= AnnIvfPq.TopK)
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length.toLong))
    }
  }
}
