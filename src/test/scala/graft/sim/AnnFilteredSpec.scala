package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AnnFilteredSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val vectors: Map[Long, (Int, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "label", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
      .toMap

  test("filtered search returns exactly the label-constrained brute-force top-k") {
    val got = SimQueries.annFiltered(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.groupBy(_._1).foreach { case (qId, rows) =>
      val (qLabel, qEmb) = vectors(qId)
      // every neighbor shares the query's label — the filter is semantic,
      // not a post-hoc truncation
      assert(rows.forall(_._2 == qLabel))
      val expect = vectors.toSeq
        .collect { case (nId, (l, e)) if l == qLabel && nId != qId => (nId, cos(qEmb, e)) }
        .sortBy { case (nId, c) => (-c, nId) }
        .take(10)
      val gotPairs = rows.sortBy(_._4).map(r => (r._3, r._5)).toSeq
      assert(gotPairs == expect, s"query $qId")
    }
  }
}
