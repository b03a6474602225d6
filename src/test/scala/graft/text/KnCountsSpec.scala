package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `text_kn_counts` contract: counts replay driver-side from the shared
  * whitespace tokenization, the KN identities hold (Σ over bigrams of a
  * row's type counts equals the distinct-neighbor sets), and a planted
  * "San Francisco"-style corpus shows the continuation-count signal. */
class KnCountsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def bigramsOf(text: String): Seq[(String, String)] = {
    val w = text.split("\\s+", -1)
    (0 until math.max(0, w.length - 1)).map(i => (w(i), w(i + 1)))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
  }

  test("corpus run equals a driver replay") {
    val texts = graft.Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val pair = texts.flatMap(bigramsOf).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val succ = pair.keys.groupBy(_._1).map { case (w1, ks) => w1 -> ks.size.toLong }
    val prec = pair.keys.groupBy(_._2).map { case (w2, ks) => w2 -> ks.size.toLong }
    val expect = pair.toSeq.map { case ((w1, w2), n) =>
      (w1, w2, n, succ(w1), prec(w2)) }
      .sortBy { case (w1, w2, n, _, _) => (-n, w1, w2) }
    val got = SparkEntry.queries("text_kn_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("planted continuation-count asymmetry (the San Francisco signal)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("kn").toString
    // 'francisco' occurs 3 times but ONLY after 'san' (continuation 1);
    // 'door' occurs 3 times after 3 different words (continuation 3)
    Seq(
      (0L, "san francisco the door", "en", "t", 22L),
      (1L, "san francisco a door", "en", "t", 20L),
      (2L, "san francisco one door", "en", "t", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("text_kn_counts")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(("san", "francisco")) == (3L, 1L, 1L))
    // raw frequency equal (3 each), but continuation counts separate them
    assert(rows(("the", "door"))._3 == 3L, "door continues 3 distinct contexts")
    assert(rows(("san", "francisco"))._3 == 1L, "francisco continues only 'san'")
  }
}
