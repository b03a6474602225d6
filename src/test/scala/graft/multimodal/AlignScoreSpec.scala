package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `mm_align_score` — the CLIP-score gate's contract, pinned: an aligned
  * pair clears the gate, a shuffled-caption pair drops (the gate's reason
  * to exist), undecodable media drops with a NULL score, and the whole
  * planted dir replays first-principles in the driver. */
class AlignScoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  /** Driver replica of the stand-in encoder + cosine — independent
    * re-derivation of the 40-bit md5 feature hash and the exact-integer
    * cosine. */
  private def featVec(text: String): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foldLeft(Map.empty[Long, Long]) {
      (acc, t) =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)
        val h = java.lang.Long.parseLong(hex, 16)
        val dim = h % 64
        val sign = (h / 64) % 2 * 2 - 1
        acc.updated(dim, acc.getOrElse(dim, 0L) + sign)
    }.filter(_._2 != 0L)
  }

  private def align(text: String): Option[Double] = {
    val cap = featVec(text.take(80))
    val med = featVec(text.drop(80))
    val ssc = cap.values.map(w => w * w).sum
    val ssm = med.values.map(w => w * w).sum
    if (ssc <= 0 || ssm <= 0) None
    else {
      val dot = cap.keysIterator.map(d => cap(d) * med.getOrElse(d, 0L)).sum
      Some(BigDecimal(dot.toDouble / (math.sqrt(ssc.toDouble) * math.sqrt(ssm.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("planted pairs: aligned clears the gate, shuffled caption drops, undecodable media drops NULL — and the driver replica matches exactly") {
    val alignedWords = "red fox jumps over the lazy dog near the quiet river bank today "
    val aligned = alignedWords * 4 // caption tokens dominate the body too
    val shuffled = ("quantum chess tournament entropy ledger " * 2).take(80) +
      "marinara sauce recipe fresh basil garlic simmer tomato olive oil pasta dinner plate"
    val short = "too short to decode any media payload" // <= 80 chars: no media
    val docs = Seq(
      (0L, aligned, "en", "srcA", aligned.length.toLong),
      (1L, shuffled, "en", "srcA", shuffled.length.toLong),
      (2L, short, "en", "srcB", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_align").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("mm_align_score")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3), r.getDouble(4)))
      .toMap
    graft.CacheRegistry.releaseAll()
    // the aligned pair: caption vocabulary IS the body vocabulary — high score, kept
    assert(out(0L)._1.exists(_ >= AlignScore.AlignTau), s"aligned pair must clear: ${out(0L)}")
    assert(out(0L)._2, "aligned pair kept")
    // the shuffled caption: disjoint vocabularies — the gate's reason to exist
    assert(out(1L)._1.exists(_ < AlignScore.AlignTau), s"shuffled caption must fail: ${out(1L)}")
    assert(!out(1L)._2, "shuffled-caption pair dropped")
    // undecodable media: NULL score, dropped
    assert(out(2L)._1.isEmpty, "no media payload -> NULL align_score")
    assert(!out(2L)._2, "undecodable media dropped")
    // exact first-principles replay of every score
    Seq(0L -> aligned, 1L -> shuffled, 2L -> short).foreach { case (id, text) =>
      assert(out(id)._1 == align(text), s"doc $id: engine ${out(id)._1} != replica ${align(text)}")
    }
    // per-source audit rates: srcA 1/2 kept, srcB 0/1
    assert(out(0L)._3 == 0.5 && out(1L)._3 == 0.5, "srcA keep rate 0.5")
    assert(out(2L)._3 == 0.0, "srcB keep rate 0.0")
  }

  test("corpus: kept iff align_score >= tau, audit rate equals the recount, one row per document") {
    val rows = graft.SparkEntry.queries("mm_align_score")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "gate verdicts cover every pair")
    rows.foreach { r =>
      val kept = r.getBoolean(3)
      val cleared = !r.isNullAt(2) && r.getDouble(2) >= AlignScore.AlignTau
      assert(kept == cleared, s"kept flag must be the threshold verdict: $r")
    }
    val bySource = rows.groupBy(_.getString(1))
    bySource.foreach { case (src, rs) =>
      val expect = BigDecimal(rs.count(_.getBoolean(3)).toDouble / rs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      rs.foreach(r => assert(r.getDouble(4) == expect, s"$src audit rate"))
    }
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "the corpus gate is non-degenerate: both keeps and drops exist")
  }
}
