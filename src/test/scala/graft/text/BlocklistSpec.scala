package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `text_blocklist`: driver-side replay, and all three verdicts must fire
  * on the corpus (strict hit, frequency saturation, keep). */
class BlocklistSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("verdicts equal the replay and all outcomes fire") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = TextQueries.blocklist(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val ws = text.split("\\s+")
      val nb = ws.count(TextQueries.BlockedWords.contains)
      val ns = ws.count(TextQueries.StrictWords.contains)
      val frac = BigDecimal(nb.toDouble / ws.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val verdict =
        if (ns > 0) "drop_strict"
        else if (frac > TextQueries.BlockFracMax) "drop_frequency"
        else "keep"
      val (gn, gnb, gns, gfrac, gv) = got(id)
      assert(gn == ws.length.toLong && gnb == nb.toLong && gns == ns.toLong)
      assert(gfrac == frac && gv == verdict, s"doc $id")
    }
    val verdicts = got.values.map(_._5).toSet
    assert(verdicts == Set("keep", "drop_frequency", "drop_strict"),
      s"outcomes not all exercised: $verdicts")
  }
}
