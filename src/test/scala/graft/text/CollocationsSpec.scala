package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_collocations` contract: PMI replays driver-side from the corpus
  * counts, the noise floor and report budget hold, and on a planted
  * corpus an always-together pair outranks an equally-frequent pair of
  * independent words (the association-vs-frequency property that
  * distinguishes this from `text_ngram_freq`). */
class CollocationsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("PMI replays from corpus counts; floor and budget hold") {
    val docs = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    val tokens = docs.flatMap(_.split("\\s+", -1))
    val bigrams = docs.flatMap { t =>
      val ws = t.split("\\s+", -1)
      ws.iterator.zip(ws.iterator.drop(1)).map { case (a, b) => s"$a $b" }.toSeq
    }
    val cW = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cAb = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (nu, nb) = (tokens.size.toDouble, bigrams.size.toDouble)
    val got = SparkEntry.queries("text_collocations")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= Collocations.TopK)
    assert(got.map(_.getLong(5)).toSeq == (1L to got.length.toLong), "rk consecutive")
    got.foreach { r =>
      val (bg, ab, a, b, pmi) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(ab >= Collocations.MinPairCount, "noise floor")
      assert(ab == cAb(bg) && a == cW(bg.split(" ", 2)(0)) && b == cW(bg.split(" ", 2)(1)))
      val expect = math.rint(
        math.log((ab.toDouble * nu * nu) / (a.toDouble * b * nb)) / math.log(2.0)
          * 10000) / 10000
      assert(math.abs(pmi - expect) < 2e-4, s"$bg pmi $pmi vs $expect")
    }
    // ranked by pmi desc, bigram asc
    val keys = got.map(r => (-r.getDouble(4), r.getString(0))).toSeq
    assert(keys == keys.sorted, "PMI rank order")
  }

  test("planted corpus: association outranks raw frequency") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("colloc").toString
    // "neural network": 6 co-occurrences, each word ONLY in the pair.
    // "the cat" / "the dog": 'the' is frequent and promiscuous — same
    // pair count (6) but far higher marginals => lower PMI.
    val docs =
      (1 to 6).map(i => s"neural network item$i") ++
      (1 to 6).map(i => s"the cat item$i") ++
      (1 to 6).map(i => s"the dog item$i") ++
      (1 to 12).map(i => s"the filler$i extra$i")
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_collocations")(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got.contains("neural network") && got.contains("the cat"))
    assert(got("neural network") > got("the cat"),
      "exclusive pair must out-PMI the frequent-word pair")
  }
}
