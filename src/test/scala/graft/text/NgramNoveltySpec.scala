package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_ngram_novelty` contract: every readout replays from a driver
  * first-seen ledger over the shared 3-shingle space; a planted corpus
  * pins the exact-copy zero, the stitched-from-seen-parts case pairwise
  * dedup misses, within-doc repetition counting once, and the
  * no-evidence NULL for shingle-less docs. */
class NgramNoveltySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def shingles(text: String): Set[String] = {
    val w = text.split("\\s+", -1)
    (0 until math.max(0, w.length - 2)).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  private def replica(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val first = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, t) =>
      shingles(t).foreach(g => if (!first.contains(g)) first(g) = id)
    }
    docs.map { case (id, t) =>
      val sh = shingles(t)
      id -> (sh.size.toLong, sh.count(g => first(g) == id).toLong)
    }.toMap
  }

  test("all readouts replay from a driver first-seen ledger on the corpus at sf0.001") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expect = replica(docs)
    val got = SparkEntry.queries("text_ngram_novelty")(spark, sf).collect()
    assert(got.length == docs.length && got.nonEmpty)
    got.foreach { r =>
      val (ng, nv) = expect(r.getLong(0))
      assert(r.getLong(1) == ng && r.getLong(2) == nv,
        s"doc ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), replica ($ng, $nv)")
      if (ng > 0) {
        assert(r.getDouble(3) == round6(nv.toDouble / ng))
        assert(r.getBoolean(4) == (round6(nv.toDouble / ng) < NgramNovelty.DerivativeMax))
      } else assert(r.isNullAt(3) && !r.getBoolean(4))
    }
    graft.CacheRegistry.releaseAll()
  }

  test("planted corpus: exact copy scores 0; stitched-from-seen-parts is flagged; repetition counts once") {
    val d = java.nio.file.Files.createTempDirectory("novelty").toString
    Seq(
      (0L, "a b c d e"),             // grams abc bcd cde — all first here
      (1L, "a b c d e"),             // exact copy → novelty 0
      (2L, "p q r s t"),             // fresh → novelty 1
      (3L, "a b c d q r s t u"),     // stitched from docs 0+2 with ONE new gram region
      (4L, "x y x y x y x y"),       // internal repetition: 2 distinct grams, all novel
      (5L, "one two"))               // too short for a 3-shingle → no evidence
      .map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("text_ngram_novelty")(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3),
          r.getBoolean(4))).toMap
    assert(got(1L) == ((3L, 0L, 0.0, true)), s"exact copy: ${got(1L)}")
    assert(got(2L) == ((3L, 3L, 1.0, false)))
    // doc 3 grams: abc bcd (seen), cdq dqr (new), qrs rst (seen), stu (new):
    // 7 grams, 3 novel → 0.428571 < 0.5 → flagged though no pair is a near-dup
    assert(got(3L) == ((7L, 3L, round6(3.0 / 7.0), true)), s"stitched: ${got(3L)}")
    assert(got(4L)._1 == 2L && got(4L)._2 == 2L, s"repetition must count once: ${got(4L)}")
    assert(got(5L) == ((0L, 0L, null, false)), s"no-evidence doc: ${got(5L)}")
    assert(got(0L)._3 == 1.0)
  }
}
