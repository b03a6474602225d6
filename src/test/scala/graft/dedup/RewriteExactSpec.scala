package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `dedup_rewrite_exact` — ExactSubstr boundary extension: stride-1
  * sliding-window digests remove a duplicated passage to the exact word at
  * ANY offset (the case `dedup_rewrite`'s disjoint chunks leave ragged),
  * replayed fully driver-side at sf0.001. */
class RewriteExactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val L = DedupQueries.RewriteSpan

  private def md5d(s: String): Seq[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).toSeq

  /** Driver replica of the full definition: doc texts in,
    * (n_words, n_kept, cleaned_text) out. */
  private def replica(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val wins = corpus.flatMap { case (id, text) =>
      val w = text.split("\\s+", -1)
      (0 to w.length - L).map { p =>
        (id, p.toLong, md5d(w.slice(p, p + L).mkString(" ")))
      }
    }
    val k0 = wins.groupBy(_._3).map { case (dg, is) =>
      dg -> is.map { case (id, p, _) => id * DedupQueries.RewritePosCap + p }.min
    }
    val removed: Map[Long, Set[Long]] = wins
      .filter { case (id, p, dg) => id * DedupQueries.RewritePosCap + p != k0(dg) }
      .flatMap { case (id, p, _) => (p until p + L).map(id -> _) }
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    corpus.map { case (id, text) =>
      val w = text.split("\\s+", -1)
      val rp = removed.getOrElse(id, Set.empty)
      val kept = w.indices.filterNot(i => rp.contains(i.toLong)).map(w)
      id -> (w.length.toLong, kept.length.toLong, kept.mkString(" "))
    }.toMap
  }

  test("distributed exact rewrite equals the driver-side replay at sf0.001") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = DedupQueries.rewriteExact(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    graft.CacheRegistry.releaseAll()
    val exp = replica(corpus)
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, g) => assert(g == exp(id), s"doc $id diverged") }
  }

  test("a passage duplicated at a non-chunk-aligned offset is removed exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("rwx").toString
    // 20-word passage; doc 1 repeats it at word offset 5 — NOT a multiple
    // of the 8-word chunk stride, so dedup_rewrite's aligned chunks cannot
    // remove it cleanly
    val passage = (1 to 20).map(k => s"p$k").mkString(" ")
    val a = ((1 to 4).map(k => s"a$k") :+ passage).mkString(" ")
    val pre = (1 to 5).map(k => s"b$k").mkString(" ")
    val post = (1 to 6).map(k => s"c$k").mkString(" ")
    val b = s"$pre $passage $post"
    Seq((0L, a, "en", "synth", a.length.toLong), (1L, b, "en", "synth", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val got = DedupQueries.rewriteExact(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    graft.CacheRegistry.releaseAll()
    // doc 0 (first occurrence) keeps everything
    assert(got(0L) == (24L, 24L, a), "first occurrence must survive whole")
    // doc 1 loses EXACTLY the 20 passage words — prefix and suffix intact
    assert(got(1L) == (31L, 11L, s"$pre $post"),
      s"duplicated passage must be removed to the exact word: ${got(1L)}")

    // contrast: the chunk-aligned rewrite leaves passage fragments behind
    val ragged = DedupQueries.rewrite(spark, d).collect()
      .filter(_.getLong(0) == 1L).head.getString(3)
    graft.CacheRegistry.releaseAll()
    assert(ragged.split("\\s+").exists(_.startsWith("p")),
      "precondition: aligned chunks leave partial passage words (the gap this op closes)")
  }

  test("documents shorter than the window are untouched") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("rwx_short").toString
    val t = "only five words here now"
    Seq((0L, t, "en", "synth", t.length.toLong), (1L, t, "en", "synth", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = DedupQueries.rewriteExact(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.CacheRegistry.releaseAll()
    // both identical 5-word docs survive: no 8-word window exists to match
    assert(got == Map(0L -> t, 1L -> t))
  }
}
