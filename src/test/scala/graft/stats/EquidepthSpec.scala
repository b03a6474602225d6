package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `stats_equidepth`: depth balance within one row, ordered non-overlapping
  * bounds, exact row conservation, and NTILE split agreement with the
  * standard definition. */
class EquidepthSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("buckets are depth-balanced, ordered, and conserve rows") {
    val rows = Concentration.equidepth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byType = rows.groupBy(_._1)
    val totals = graft.Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"$t bucket ids")
      assert(sorted.map(_._3).sum == totals(t), s"$t row conservation")
      // depth balance: standard NTILE — max and min bucket sizes differ <= 1
      assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1, s"$t depth skew")
      // the first n mod B buckets carry the extra row
      val n = totals(t); val b = sorted.length
      val extra = (n % b).toInt
      sorted.zipWithIndex.foreach { case ((_, _, cnt, _, _), i) =>
        val expect = n / b + (if (i < extra) 1 else 0)
        assert(cnt == expect, s"$t bucket ${i + 1}: $cnt vs $expect")
      }
      // bounds are ordered and non-overlapping across buckets
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._5 <= c._4, s"$t bounds overlap: $a $c")
        case _ =>
      }
      sorted.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    }
  }
}
