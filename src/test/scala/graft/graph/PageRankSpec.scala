package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class PageRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val got: Map[Long, Long] =
    PageRank.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("distributed fixpoint equals an exact driver-side replay of the recurrence") {
    val n = Tables.documents(spark, sf).count()
    val ids = 0L until n
    val edges = ids.flatMap(i => Seq(
      i -> (i * 2654435761L) % n, i -> (i % 100L) % n, i -> (i / 7L) % n))
    val r0 = PageRank.Scale / n
    val base = 15L * r0 / 100L
    var r = ids.map(_ -> r0).toMap
    for (_ <- 1 to PageRank.Iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / 3L }.sum
      }
      r = ids.map(i => i -> (base + PageRank.Damp * in.getOrElse(i, 0L) / 100L)).toMap
    }
    assert(got == r)
  }

  test("hub documents accumulate authority; mass is conserved up to truncation") {
    val hubs = got.filter(_._1 < 100L).values
    val rest = got.filter(_._1 >= 100L).values
    assert(rest.nonEmpty && hubs.nonEmpty)
    // docs 0-99 receive ~n/100 in-links each from the `% 100` edge class
    assert(hubs.sum.toDouble / hubs.size > rest.sum.toDouble / rest.size,
      "hub mean rank must exceed non-hub mean rank")
    val total = got.values.sum
    // each of the Iters rounds truncates at most ~1 unit per edge term and
    // per damping division — mass stays within a whisker of Scale
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale * 99L / 100L, s"mass collapsed to $total")
    // every node keeps at least the teleport term
    val n0 = got.size.toLong
    val base = 15L * (PageRank.Scale / n0) / 100L
    assert(got.values.forall(_ >= base))
  }
}
