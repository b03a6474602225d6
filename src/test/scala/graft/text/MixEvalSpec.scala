package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** `sample_mix_eval` contract: the whole audit replays from first
  * principles driver-side (T=2 keep-rate formula, md5 bucket draw, all
  * readouts), the kept counts agree with the registered
  * `sample_temperature` output (the composition identity), and a planted
  * single-language corpus pins the analytic threshold exactly
  * (one lang ⇒ kr = 0.4 ⇒ threshold = round(0.4·2²⁰) = 419430). */
class MixEvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(docId: Long): Long =
    java.lang.Long.parseLong(md5hex(docId.toString).take(6), 16) % 1048576L

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("the audit replays from first principles at sf0.001") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val tot = docs.length.toDouble
    val sSum = byLang.values.map(g => math.sqrt(g.length.toDouble)).sum
    val thr = byLang.map { case (lang, g) =>
      val n = g.length.toDouble
      val kr = math.min(1.0, 0.4 * tot * math.sqrt(n) / sSum / n)
      lang -> java.math.BigDecimal.valueOf(kr * 1048576L)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val kept = byLang.map { case (lang, g) =>
      lang -> g.count(d => bucket(d._1) < thr(lang)).toLong
    }
    val totalKept = kept.values.sum
    val got = SparkEntry.queries("sample_mix_eval")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val lang = r.getString(0)
      val n = byLang(lang).length.toLong
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == kept(lang), s"$lang n_kept diverged")
      assert(r.getLong(3) == thr(lang), s"$lang threshold diverged")
      assert(r.getDouble(4) == r6(thr(lang).toDouble / 1048576.0))
      assert(r.getDouble(5) == r6(kept(lang).toDouble / n))
      assert(r.getDouble(6) ==
        r6(kept(lang).toDouble / n - thr(lang).toDouble / 1048576.0))
      assert(r.getDouble(7) == r6(kept(lang).toDouble / totalKept))
      // the concentration claim the audit exists to check: the achieved
      // rate sits within 4 binomial sigmas of the published target
      val p = thr(lang).toDouble / 1048576.0
      val bound = 4.0 * math.sqrt(p * (1.0 - p) / n) + 1e-9
      assert(math.abs(r.getDouble(6)) < bound,
        s"$lang rate gap ${r.getDouble(6)} beyond 4 sigma ($bound)")
    }
  }

  test("composition identity: n_kept equals the registered sampler's per-lang output") {
    val fromSampler = SparkEntry.queries("sample_temperature")(spark, sf).collect()
      .groupBy(_.getString(1)).map { case (k, g) => k -> g.length.toLong }
    val fromEval = SparkEntry.queries("sample_mix_eval")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).filter(_._2 > 0L).toMap
    assert(fromEval == fromSampler)
  }

  test("planted single-language corpus pins the analytic T=2 threshold exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mixeval").toString
    (1 to 200).map(i => (i.toLong, s"doc body $i", "en", "synth", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val row = SparkEntry.queries("sample_mix_eval")(spark, d).collect().head
    // one lang: kr = 0.4·tot·sqrt(n)/(sqrt(n)·n) = 0.4
    assert(row.getLong(3) == 419430L, s"threshold ${row.getLong(3)} != round(0.4*2^20)")
    assert(row.getDouble(4) == 0.4)
    assert(row.getDouble(7) == 1.0, "single lang must own the whole kept share")
  }
}
