package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("learned merges replay exactly from an independent dictionary pass") {
    import org.apache.spark.sql.functions._
    // rebuild the word dictionary without the production code path
    val dict = graft.Tables.documents(spark, sf).collect()
      .flatMap(_.getString(1).split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }.toArray
    val expected = BpeTrain.learn(dict, BpeTrain.NumMerges)
    val actual = BpeTrain.trainMerges(spark, sf)
    assert(actual == expected)
    assert(actual.size == BpeTrain.NumMerges)
    // merges must be genuine bigrams of earlier symbols
    actual.foreach { case (a, b) => assert(a.nonEmpty && b.nonEmpty) }
  }

  test("known toy dictionary learns the textbook merge order") {
    // "aaab"×3, "aab"×1. Round 1: (a,a)=2·3+1=7 beats (a,b)=4 → merge "aa".
    // Round 2: (aa,a)=3 ties (a,b)=3; the lexicographically smaller pair
    // ("a","b") wins the tie-break.
    val dict = Array("aaab" -> 3L, "aab" -> 1L)
    val merges = BpeTrain.learn(dict, 2)
    assert(merges.head == ("a", "a"), s"round 1 must merge the most frequent pair: $merges")
    assert(merges(1) == ("a", "b"), s"round 2 tie must break lexicographically: $merges")
    assert(BpeTrain.tokensOf("aaab", merges) == 2) // [aa, ab]
    assert(BpeTrain.tokensOf("aab", merges) == 2)  // [aa, b]
  }

  test("BPE token counts compress and are bounded by character counts") {
    val rows = BpeTrain.bpeVocab(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nChar, nBpe, comp) =>
      assert(nBpe >= 1 && nBpe <= nChar, s"doc $doc: $nBpe tokens vs $nChar chars")
      assert(comp >= 1.0, s"doc $doc: merges can only shrink the sequence")
    }
    // the 10 merges must actually fire somewhere
    assert(rows.exists { case (_, nChar, nBpe, _) => nBpe < nChar })
  }
}
