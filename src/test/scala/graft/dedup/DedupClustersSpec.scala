package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupClustersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chain, triangle, pair resolve to min labels") {
    // chain 1-2-3-4, triangle 10-11-12 (with redundant edge), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a_id", "b_id")
    val got = DedupClusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("clusters over real near-dup pairs: canonical is the min member and closed under membership") {
    val rows = DedupClusters.clusters(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, canon) => assert(canon <= doc) }
    val members = rows.map(_._1).toSet
    rows.foreach { case (_, canon) => assert(members.contains(canon), s"canonical $canon must itself be clustered") }
  }
}
