package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_lm_eval` contract: the whole held-out-perplexity chain replays
  * from first principles driver-side (md5 split buckets, train-only
  * add-one bigram model, integer whole-bit surprisal, per-split
  * aggregate), the split histogram agrees with the registered
  * `sample_split` assignment (the composition identity), and a planted
  * corpus pins the OOV floor: a held-out doc of bigrams never seen in
  * train costs exactly ⌊log₂V⌋ bits per bigram. */
class LmEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def splitOf(text: String): String = {
    val b = java.lang.Long.parseLong(md5hex(text).take(6), 16) % SampleSplit.Buckets
    if (b < SampleSplit.TrainThreshold) "train"
    else if (b < SampleSplit.ValThreshold) "val" else "test"
  }

  private def bigrams(text: String): Seq[String] =
    text.split("\\s+", -1).sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")).toSeq

  private def replica(docs: Seq[(Long, String)]): Map[String, (Long, Long, Long, Double)] = {
    val rows = docs.flatMap { case (id, t) =>
      bigrams(t).map(bg => (id, splitOf(t), bg, bg.split(" ", 2)(0)))
    }
    val tr = rows.filter(_._2 == "train")
    val v = tr.map(_._3.split(" ", 2)(1)).distinct.size.toLong
    val cbg = tr.groupBy(_._3).map { case (k, g) => k -> g.size.toLong }
    val cw = tr.groupBy(_._4).map { case (k, g) => k -> g.size.toLong }
    def bits(bg: String, w1: String): Long = {
      val q = (cw.getOrElse(w1, 0L) + v) / (cbg.getOrElse(bg, 0L) + 1L)
      if (q <= 0L) 0L else (63 - java.lang.Long.numberOfLeadingZeros(q)).toLong
    }
    rows.groupBy(_._2).map { case (split, g) =>
      val tb = g.map(r => bits(r._3, r._4)).sum
      val r4 = java.math.BigDecimal.valueOf(tb.toDouble / g.size)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      split -> ((g.map(_._1).distinct.size.toLong, g.size.toLong, tb, r4))
    }
  }

  test("the full held-out chain replays from first principles at sf0.001") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = replica(docs)
    val got = SparkEntry.queries("text_lm_eval")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet && got.nonEmpty)
    exp.foreach { case (split, e) =>
      assert(got(split) == e, s"split $split diverged: ${got(split)} != $e")
    }
  }

  test("split histogram agrees with the registered sample_split assignment") {
    val fromSplit = SparkEntry.queries("sample_split")(spark, sf).collect()
      .groupBy(_.getString(2)).map { case (k, g) => k -> g.length.toLong }
    val fromEval = SparkEntry.queries("text_lm_eval")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 docs all have >= 10 words, so every doc scores >= 1 bigram
    assert(fromEval == fromSplit,
      s"per-split doc counts diverged: $fromEval vs $fromSplit")
  }

  test("planted OOV held-out doc costs exactly floor(log2 V) bits per bigram") {
    import spark.implicits._
    // salt-search texts into the splits we need (the split IS a pure
    // function of the text — same property that makes it leakage-safe)
    def mint(base: String, want: String): String =
      Iterator.from(0).map(i => s"$base salt$i").find(splitOf(_) == want).get
    val trainDocs = (1 to 8).map(i => mint(s"the cat sat on mat $i and the dog ran", "train"))
    val oov = mint("zzq qqz zqz qzq zzqq qqzz", "test") // no word overlaps train
    val all = (trainDocs :+ oov).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = java.nio.file.Files.createTempDirectory("lmeval").toString
    all.map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val v = trainDocs.flatMap(t => bigrams(t).map(_.split(" ", 2)(1))).distinct.size.toLong
    val floorBits = (63 - java.lang.Long.numberOfLeadingZeros(v)).toLong
    val got = SparkEntry.queries("text_lm_eval")(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (nBg, tb, avg) = got("test")
    assert(nBg == bigrams(oov).size.toLong)
    assert(tb == nBg * floorBits && avg == floorBits.toDouble,
      s"OOV floor diverged: $tb bits over $nBg bigrams, expected $floorBits each")
    assert(got("train")._3 < avg, "memorized train slice must score below the OOV floor")
  }
}
