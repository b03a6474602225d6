package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `text_langid_segments` + `emb_decontaminate`: driver-side replays and
  * the planted cases each operator exists for. */
class LangidSegmentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val en = Seq("the", "a", "line", "customer")
  private val tool = Seq("spark", "query", "table", "join", "scan")
  private val data = Seq("data", "row", "column", "value", "key")

  private def segLang(sw: Seq[String]): String = {
    val (ce, ct, cd) = (sw.count(en.contains), sw.count(tool.contains), sw.count(data.contains))
    if (ce >= ct && ce >= cd) "en" else if (ct >= cd) "tool" else "data"
  }

  test("segment votes equal a driver-side replay") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = TextQueries.langidSegments(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    docs.foreach { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      val segs = ws.grouped(TextQueries.SegWords.toInt).map(segLang).toSeq
      val votes = segs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (dom, v) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      val n = segs.length.toLong
      val share = BigDecimal(1.0 - v.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((n, dom, share, v < n)), s"doc $id: ${got(id)}")
    }
  }

  test("a half-en half-tool doc flags mixed; the doc-level vote cannot see it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seg").toString
    import spark.implicits._
    val half1 = ("the customer line a " * 16).trim  // 64 words, all en-marked
    val half2 = ("spark query table join " * 16).trim // 64 words, all tool-marked
    Seq((0L, s"$half1 $half2", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val seg = TextQueries.langidSegments(spark, dir).collect().head
    assert(seg.getBoolean(4), "segment pass must flag mixed")
    assert(seg.getDouble(3) == 0.5, s"minority share ${seg.getDouble(3)}")
    val doc = TextQueries.langid(spark, dir).collect().head
    val docLang = doc.getString(4)
    val _ = docLang // the doc-level vote picks ONE language; no mixed signal exists
  }

  test("a benchmark-identical corpus vector flags contaminated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    import spark.implicits._
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat / 6f)
    // bench = ids 0..19 (vectors v(100..119)); corpus 20..59; corpus id 30
    // is an exact copy of bench 5's vector
    val rows = (0L until 60L).map { i =>
      val vec = if (i == 30L) v(105) else v(i.toInt + 100)
      (i, vec, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.sim.SimQueries.embDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got(30L) == ((5L, 1.0, true)), s"planted copy: ${got(30L)}")
    assert(got.keySet == (20L until 60L).toSet, "every corpus vector is audited")
  }
}
