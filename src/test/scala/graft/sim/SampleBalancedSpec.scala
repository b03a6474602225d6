package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `sample_balanced` contract: every label is capped at exactly the
  * minority-class size, selection follows the content-stable hash order,
  * and the sample is reproducible. */
class SampleBalancedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val labels: Map[Long, Int] =
    Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val got: Seq[(Long, Int, Long)] =
    VectorOps.sampleBalanced(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("every class is capped at exactly the minority size") {
    val classSizes = labels.values.groupBy(identity).view.mapValues(_.size).toMap
    val minN = classSizes.values.min
    val sampled = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sampled.keySet == classSizes.keySet)
    assert(sampled.values.forall(_ == minN), s"uneven sample: $sampled")
    assert(got.size < labels.size, "nothing dropped — no imbalance to test on")
  }

  test("selection equals the hash-order replay and is reproducible") {
    val minN = labels.values.groupBy(identity).values.map(_.size).min
    val expect = labels.toSeq.groupBy(_._2).flatMap { case (l, vs) =>
      vs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(minN)
        .zipWithIndex.map { case (id, i) => (id, l, i + 1L) }
    }.toSet
    assert(got.toSet == expect)
    val again = VectorOps.sampleBalanced(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }
}
