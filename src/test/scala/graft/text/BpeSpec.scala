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

  test("frequency floor and top-N cap bound the dictionary deterministically") {
    val full = BpeTrain.wordCounts(spark, sf)
    assert(full.nonEmpty)
    // floor=1 is the non-pruning default: identical dictionary set
    assert(BpeTrain.wordCounts(spark, sf, minFreq = 1L).toSet == full.toSet)
    // floor=2 drops exactly the singletons, nothing else
    val floored = BpeTrain.wordCounts(spark, sf, minFreq = 2L)
    assert(floored.toSet == full.filter(_._2 >= 2L).toSet)
    // cap keeps the top-N by (n desc, word) — a deterministic prefix
    val capped = BpeTrain.wordCounts(spark, sf, maxWords = 10)
    assert(capped.length == 10)
    assert(capped.toSeq == full.sortBy { case (w, n) => (-n, w) }.take(10).toSeq)
    // merges learned under the non-pruning defaults match the unbounded pass
    assert(BpeTrain.learn(full, BpeTrain.NumMerges) ==
      BpeTrain.learn(BpeTrain.wordCounts(spark, sf, minFreq = 1L, maxWords = Int.MaxValue),
        BpeTrain.NumMerges))
  }

  test("broadcast-join tokenization path matches the map-literal path") {
    // force the join path by setting the literal threshold below the dict size
    val viaJoin = BpeTrain.bpeVocabImpl(spark, sf, mapLiteralMax = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val viaLiteral = BpeTrain.bpeVocab(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaJoin.nonEmpty)
    assert(viaJoin.toSeq == viaLiteral.toSeq)
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

  test("bpe_apply token streams replay driver-side and agree with the vocab op") {
    val dict = BpeTrain.wordCounts(spark, sf)
    val merges = BpeTrain.learn(dict, BpeTrain.NumMerges)
    val vocab = dict.iterator
      .flatMap { case (w, _) => BpeTrain.symbolsOf(w, merges) }.toSet.toSeq.sorted
    val ids = vocab.iterator.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    val known = dict.map(_._1).toSet
    val expect = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq
          .filter(known).flatMap(w => BpeTrain.symbolsOf(w, merges).map(ids))
        (r.getLong(0), toks.length.toLong, toks.mkString("|"))
      }.sortBy(_._1).toSeq
    val got = BpeTrain.bpeApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
    assert(got.exists(_._2 > 0))
    // cross-op identity: the emitted stream length IS the vocab op's count
    val vocabCounts = BpeTrain.bpeVocab(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, n, _) =>
      assert(vocabCounts(id) == n, s"doc $id: stream length $n != vocab count")
    }
    // ids are content-stable ranks: every id addresses the sorted vocab
    assert(got.iterator.filter(_._3.nonEmpty).flatMap(_._3.split('|'))
      .map(_.toLong).forall(i => i >= 0 && i < vocab.length))
  }
}
