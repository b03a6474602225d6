package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_kn_score` contract: per-doc KN bits replay from first principles
  * on the corpus; the model counts are EXACTLY the registered
  * `text_kn_counts` artifact (the deploy-side composition pin); and a
  * planted continuation-count corpus shows the KN signal in whole bits —
  * two bigrams identical in raw count, context count, and successor
  * diversity separate on N₁₊(•w2) alone. */
class KnScoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def instancesOf(docId: Long, text: String): Seq[(Long, String, String)] = {
    val w = text.split("\\s+", -1)
    (0 until math.max(0, w.length - 1)).map(i => (docId, w(i), w(i + 1)))
      .filter(p => p._2.nonEmpty && p._3.nonEmpty)
  }

  /** First-principles interpolated-KN whole-bit replica (D = 1/2). */
  private def knReplica(inst: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
    val pairs = inst.groupBy(i => (i._2, i._3)).map { case (k, v) => k -> v.size.toLong }
    val t = pairs.size.toLong
    val c1 = pairs.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val nSucc = pairs.keys.groupBy(_._1).map { case (w1, ks) => w1 -> ks.size.toLong }
    val nPrec = pairs.keys.groupBy(_._2).map { case (w2, ks) => w2 -> ks.size.toLong }
    inst.groupBy(_._1).map { case (doc, is) =>
      val bits = is.map { case (_, w1, w2) =>
        val a = math.max(2L * pairs((w1, w2)) - 1L, 0L) * t + nSucc(w1) * nPrec(w2)
        val b = 2L * c1(w1) * t
        java.lang.Long.toBinaryString(b / a).length.toLong - 1L
      }
      doc -> (is.size.toLong, bits.sum)
    }
  }

  test("per-doc bits replay from first principles on the corpus at sf0.001") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = knReplica(docs.toSeq.flatMap { case (id, t) => instancesOf(id, t) })
    val got = SparkEntry.queries("text_kn_score")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nb, tb) = expect.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getLong(1) == nb && r.getLong(2) == tb,
        s"doc ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), replica ($nb, $tb)")
      if (nb > 0) {
        val avg = java.math.BigDecimal.valueOf(tb.toDouble / nb)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        assert(r.getDouble(3) == avg)
        assert(r.getBoolean(4) == (avg >= KnScore.SuspectBits))
      } else assert(!r.getBoolean(4) && r.isNullAt(3))
    }
    graft.CacheRegistry.releaseAll()
  }

  test("the scorer's model IS the registered text_kn_counts artifact") {
    // recompute every doc's bits using ONLY the kn_counts output (plus its
    // derivable c1 = Σ n per w1 and T = row count) — drift between the
    // published artifact and the scorer's internal counts fails here
    val kn = SparkEntry.queries("text_kn_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val t = kn.size.toLong
    val c1 = kn.toSeq.groupBy(_._1._1)
      .map { case (w1, rs) => w1 -> rs.map(_._2._1).sum }
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docs.toSeq.flatMap { case (id, txt) => instancesOf(id, txt) }
      .groupBy(_._1).map { case (doc, is) =>
        val bits = is.map { case (_, w1, w2) =>
          val (n, nSucc, _) = kn((w1, w2))
          val nPrec = kn((w1, w2))._3
          val a = math.max(2L * n - 1L, 0L) * t + nSucc * nPrec
          java.lang.Long.toBinaryString(2L * c1(w1) * t / a).length.toLong - 1L
        }
        doc -> bits.sum
      }
    val got = SparkEntry.queries("text_kn_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    expect.foreach { case (doc, tb) =>
      assert(got(doc) == tb, s"doc $doc: artifact-derived $tb, scorer ${got(doc)}")
    }
    graft.CacheRegistry.releaseAll()
  }

  test("planted continuation-count separation (the San Francisco signal in whole bits)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("knscore").toString
    // (p,x) and (p,y): identical c12=1, c1(p)=2, n_succ(p)=2 — they differ
    // ONLY in the continuation count (x follows 9 distinct words, y one).
    // T=10: p(x|p) = (10 + 2·9)/40 = 0.7 → 0 bits;
    //       p(y|p) = (10 + 2·1)/40 = 0.3 → floor(log2(40//12)) = 1 bit.
    val base = Seq((0L, "p x"), (1L, "p y")) ++
      "abcdefgh".zipWithIndex.map { case (c, i) => (2L + i, s"$c x") }
    base.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("text_kn_score")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(0L) == 0L, "high-continuation bigram must cost 0 bits")
    assert(rows(1L) == 1L, "low-continuation bigram must cost 1 bit")
    graft.CacheRegistry.releaseAll()
  }
}
