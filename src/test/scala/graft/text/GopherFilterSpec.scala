package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GopherFilterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("verdicts are consistent with the recorded stats, and both verdicts occur") {
    val rows = TextQueries.gopherFilter(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4), r.getString(5)))
    assert(rows.exists(_._4) && rows.exists(!_._4), "filter must both keep and drop")
    rows.foreach { case (nWords, meanLen, uniqRatio, keep, reasons) =>
      val expected = Seq(
        if (nWords < 25) Some("too_few_words") else None,
        if (nWords > 10000) Some("too_many_words") else None,
        if (meanLen < 3.0 || meanLen > 10.0) Some("word_len_out_of_range") else None,
        if (uniqRatio < 0.35) Some("low_uniqueness") else None).flatten.mkString("|")
      assert(reasons == expected, s"reasons mismatch for stats ($nWords, $meanLen, $uniqRatio)")
      assert(keep == reasons.isEmpty)
    }
  }

  test("filter is a map-side-only plan (no shuffle before the presentation sort)") {
    val p = TextQueries.gopherFilter(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"))
  }
}
