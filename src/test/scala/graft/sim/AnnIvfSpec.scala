package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnIvfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("IVF ANN returns ranked neighbours with recall comparable to LSH") {
    val brute = SimQueries.annTopkBrute(spark, sf)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnIvf.annTopkIvf(spark, sf)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.10, s"recall@10 = $recall")
    // every query gets a full result page (cells are dense enough)
    val perQuery = ivf.groupBy(_._1).map(_._2.size)
    assert(perQuery.forall(_ == 10))
  }
}
