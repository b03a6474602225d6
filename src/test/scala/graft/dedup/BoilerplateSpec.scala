package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `text_boilerplate` is exact (drop EVERY instance of a chunk digest seen
  * in ≥ BoilerMinDocs distinct docs), so the spec replays the definition
  * driver-side at sf0.001, pins the all-copies-drop contrast with
  * `dedup_rewrite`'s first-occurrence rule on a planted corpus, and checks
  * the counting invariants. */
class BoilerplateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val Span = DedupQueries.RewriteSpan

  private def chunksOf(text: String): Seq[(Long, String)] = {
    val w = text.split("\\s+")
    val nc = math.ceil(w.length.toDouble / Span).toLong
    (0L until nc).map(p =>
      (p, w.slice((p * Span).toInt, (p * Span).toInt + Span).mkString(" ")))
  }

  private def replay(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val inst = corpus.flatMap { case (id, text) =>
      chunksOf(text).map { case (p, c) => (id, p, c) }
    }
    val boiler = inst.groupBy(_._3).collect {
      case (c, is) if is.map(_._1).distinct.size >= DedupQueries.BoilerMinDocs => c
    }.toSet
    corpus.map { case (id, text) =>
      val cs = chunksOf(text)
      val kept = cs.filterNot { case (_, c) => boiler(c) }
      id -> (cs.size.toLong, kept.size.toLong, kept.map(_._2).mkString(" "))
    }.toMap
  }

  private def collectOp(dir: String): Map[Long, (Long, Long, Long, String)] = {
    val out = DedupQueries.boilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("operator equals the driver-side replay on the corpus") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val truth = replay(corpus)
    val got = collectOp(sf)
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, (nc, nk, nd, text)) =>
      val (tnc, tnk, ttext) = truth(id)
      assert(nc == tnc && nk == tnk && nd == nc - nk, s"doc $id counts")
      assert(text == ttext, s"doc $id text")
    }
    // the threshold must actually fire on the test corpus
    assert(got.values.exists(_._3 > 0L), "no boilerplate dropped at sf0.001")
  }

  test("boilerplate drops ALL copies while dedup_rewrite keeps the first") {
    import spark.implicits._
    val header = (1 to Span).map(i => s"boiler$i").mkString(" ")
    val docs = (0L until 4L).map { id =>
      val tail = (1 to Span).map(i => s"unique${id}_$i").mkString(" ")
      (id, s"$header $tail")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = collectOp(dir)
    // every doc loses the shared header (even doc 0, the first occurrence)
    got.foreach { case (id, (nc, nk, nd, text)) =>
      assert(nc == 2L && nk == 1L && nd == 1L, s"doc $id: $nc/$nk/$nd")
      assert(!text.contains("boiler"), s"doc $id kept boilerplate: $text")
      assert(text.contains(s"unique${id}_1"), s"doc $id lost unique tail")
    }
    // contrast: the first-occurrence rule keeps one header copy
    val rw = DedupQueries.rewrite(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.CacheRegistry.releaseAll()
    assert(rw(0L).contains("boiler1") && !rw(1L).contains("boiler1"))
  }

  test("below-threshold recurrence survives everywhere") {
    import spark.implicits._
    val shared = (1 to Span).map(i => s"dup$i").mkString(" ")
    // only TWO docs share the chunk — under BoilerMinDocs = 3
    val docs = Seq(
      (0L, s"$shared a1 a2 a3 a4 a5 a6 a7 a8"),
      (1L, s"$shared b1 b2 b3 b4 b5 b6 b7 b8"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8"))
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler2").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = collectOp(dir)
    assert(got.values.forall(_._3 == 0L), "nothing may drop below the df threshold")
    assert(got(0L)._4.contains("dup1") && got(1L)._4.contains("dup1"))
  }
}
