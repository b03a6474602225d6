package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hard-negative mining contract: negatives never share the anchor's
  * cluster, ranks are contiguous and cosine-ordered, and every emitted
  * negative beats any non-emitted cross-cluster candidate. */
class HardNegativesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("negatives are top-k by cosine among OTHER-cluster vectors only") {
    val clusters = Kmeans.assignments(spark, sf)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SimQueries.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, _, _) =>
      assert(clusters(q) != clusters(n), s"negative $n shares anchor $q's cluster")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length), s"anchor $q ranks not contiguous")
      assert(sorted.length <= SimQueries.HardNegK)
      // cosine non-increasing with rank
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted(Ordering[Double].reverse).toSeq,
        s"anchor $q not cosine-ordered")
    }
    // cross-check one anchor against a brute-force scan
    val asgn = Kmeans.assignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val (q0, c0, e0) = asgn.find(_._1 == 0L).get
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 10000) / 10000
    }
    val expected = asgn.filter(_._2 != c0)
      .map { case (id, _, e) => (id, cos(e0, e)) }
      .sortBy { case (id, cs) => (-cs, id) }
      .take(SimQueries.HardNegK).map(_._1).toSeq
    val got = rows.filter(_._1 == q0).sortBy(_._3).map(_._2).toSeq
    assert(got == expected, s"anchor 0: got $got expected $expected")
  }
}
