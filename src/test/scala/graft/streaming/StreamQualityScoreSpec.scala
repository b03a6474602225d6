package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.text.QualityClassifier

/** `stream_quality_score` contract — the three sides of the triangle:
  * (1) the SINGLE-PASS map-side scorer is numerically identical to the
  * classifier's distributed explode→groupBy→window margin chain on every
  * corpus doc; (2) the streaming deployment emits row-identical scores to
  * the registered batch twin however the doc feed is micro-batched (the
  * scorer is stateless, so append mode holds nothing back); (3) the
  * expression replays from first principles — a driver-side JVM replica
  * (md5 bigram hashing, signed sums, HALF_UP L2 integerization, aux
  * stats, bias) reproduces the margin on planted docs, including the
  * no-bigram and repeated-word edges the real corpus never exercises. */
case class QsDocRow(doc_id: Long, text: String)

class StreamQualityScoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("single-pass scorer equals the distributed training-chain margins doc-by-doc") {
    val batch = StreamQualityScore.scoreBatch(spark, sf)
      .select("doc_id", "margin_i", "score", "pred").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(batch.nonEmpty)
    val chain = QualityClassifier.queries("text_quality_classifier")(spark, sf)
      .select("doc_id", "margin_i", "score", "pred").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(batch.toSeq == chain.toSeq,
      s"single-pass scorer diverged from the distributed chain: " +
        s"${batch.toSet -- chain.toSet}")
  }

  test("stream equals the batch twin however the doc feed is micro-batched") {
    val w = QualityClassifier.modelFor(spark, sf)
    assert(w.length == QualityClassifier.BiasDim + 1)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[QsDocRow].collect()
      .sortBy(_.doc_id)
    val expected = StreamQualityScore.scoreBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    for (nSplits <- Seq(1, 4)) {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[QsDocRow]
      val q = StreamQualityScore.scoreFrame(input.toDF(), w)
        .writeStream.format("memory").queryName("qs_out")
        .outputMode("append").start()
      try {
        docs.grouped(math.max(1, docs.length / nSplits)).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val got = spark.table("qs_out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
          .toSet
        assert(got == expected,
          s"$nSplits-split stream diverged: missing ${expected -- got}, " +
            s"extra ${got -- expected}")
      } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS qs_out"); () }
    }
  }

  // ---- first-principles driver replica -------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** JVM replica of [[QualityClassifier.mapSideMargin]] built only from the
    * published convention (40-bit md5-prefix hash, 64 buckets, ±1 second
    * hash sign, HALF_UP round-0 L2 integerization, gopher aux stats). */
  private def replicaMargin(w: Array[Long], text: String): Long = {
    def r0(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val D = QualityClassifier.Dims
    val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val wr = Array.fill(D)(0L)
    ws.sliding(2).filter(_.length == 2).foreach { p =>
      val h = java.lang.Long.parseLong(md5hex(p.mkString(" ")).take(10), 16)
      wr((h % D).toInt) += (h / D % 2) * 2 - 1
    }
    val ss = wr.map(v => v * v).sum
    val mfBigrams = if (ss > 0)
      (0 until D).map(j => w(j) * r0(wr(j).toDouble * 1e4 / math.sqrt(ss.toDouble))).sum
    else 0L
    val gw = text.split("\\s+") // gopher convention: raw split, no filter
    val nWords = gw.length.toLong
    val lenX = math.min(r0(math.log(nWords.toDouble + 1.0) * 1000.0), 10000L)
    val uniqRatio = java.math.BigDecimal.valueOf(gw.distinct.length.toDouble / nWords)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val uniqX = r0(uniqRatio * 1e4)
    mfBigrams + w(QualityClassifier.LenDim) * lenX +
      w(QualityClassifier.UniqDim) * uniqX + w(QualityClassifier.BiasDim) * 10000L
  }

  test("expression replays from first principles on planted docs (no-bigram edges included)") {
    // fixed non-trivial weights: distinct primes so any term mix-up shifts
    // the margin; includes negative weights
    val w = Array.tabulate(QualityClassifier.BiasDim + 1)(j =>
      (if (j % 2 == 0) 1L else -1L) * (3L + 2L * j))
    val docs = Seq(
      QsDocRow(1L, "the quick brown fox jumps over the lazy dog"),
      QsDocRow(2L, "word"), // one word: no bigrams, ss = 0
      QsDocRow(3L, "dup dup dup dup dup"), // one repeated bigram bucket
      QsDocRow(4L, "a b a b a b c d c d")) // collisions + repeats
    val got = StreamQualityScore.scoreFrame(docs.toDF(), w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { d =>
      assert(got(d.doc_id) == replicaMargin(w, d.text),
        s"doc ${d.doc_id}: expression ${got(d.doc_id)} != replica ${replicaMargin(w, d.text)}")
    }
    // verdict boundary is the exact integer compare
    val pred = StreamQualityScore.scoreFrame(docs.toDF(), w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    docs.foreach(d => assert(pred(d.doc_id) == (replicaMargin(w, d.text) >= 0L)))
  }
}
