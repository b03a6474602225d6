package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class LmScoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val corpus: Seq[(Long, Array[String])] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+", -1))).toSeq

  /** Independent model replay: bigram counts, first-word counts, vocab. */
  private lazy val (cbg, cw, v) = {
    val bgs = corpus.flatMap { case (_, w) => w.dropRight(1).zip(w.drop(1)) }
    (bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      bgs.groupBy(_._1).view.mapValues(_.size.toLong).toMap,
      bgs.map(_._2).distinct.size.toLong)
  }

  private def bits(b: (String, String)): Long = {
    val den = cw(b._1) + v
    val num = cbg(b) + 1
    63L - java.lang.Long.numberOfLeadingZeros(den / num) // floor(log2)
  }

  test("bit surprisal equals the driver-side integer replay, doc by doc") {
    val got = LmScore.lmScore(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got.keySet == corpus.map(_._1).toSet)
    corpus.foreach { case (id, w) =>
      val bs = w.dropRight(1).zip(w.drop(1)).map(bits)
      val (n, total, suspect) = got(id)
      assert(n == bs.length.toLong, s"doc $id")
      assert(total == bs.sum, s"doc $id")
      val expectSuspect = bs.nonEmpty &&
        BigDecimal(bs.sum.toDouble / bs.length).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= LmScore.SuspectBits
      assert(suspect == expectSuspect, s"doc $id")
    }
  }

  test("the gate splits the corpus and rare continuations cost more bits") {
    val got = LmScore.lmScore(spark, sf).collect().map(_.getBoolean(4))
    assert(got.exists(identity) && got.exists(!_),
      "threshold must separate fluent from suspect docs on the test corpus")
    // formula sanity: for one first word, a rarer continuation never costs
    // fewer bits than a more common one
    val byW1 = cbg.keys.groupBy(_._1).filter(_._2.size >= 2)
    assert(byW1.nonEmpty)
    byW1.take(20).foreach { case (_, bgs) =>
      val sorted = bgs.toSeq.sortBy(b => -cbg(b))
      sorted.sliding(2).foreach {
        case Seq(common, rare) => assert(bits(common) <= bits(rare))
        case _ =>
      }
    }
  }
}
