package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `text_winnow` contract: exact driver-side replay of the window-min
  * selection, the 2/(w+1) expected density band, and the winnowing
  * guarantee — docs sharing a run of ≥ w+k−1 words share a fingerprint. */
class WinnowSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val K = TextQueries.WinK
  private val W = TextQueries.WinW
  private val Cap = TextQueries.WinPosCap

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def fingerprints(text: String): Set[(Long, Long)] = {
    val w = text.split("\\s+")
    val ng = w.length - (K - 1)
    if (ng < W) return Set.empty
    val packed = (0 until ng).map { p =>
      val gh = java.lang.Long.parseLong(md5hex(w.slice(p, p + K).mkString(" ")).take(10), 16)
      gh * Cap + (Cap - 1 - p)
    }
    (0 to ng - W).map { i =>
      val m = packed.slice(i, i + W).min
      (Cap - 1 - (m % Cap), m / Cap)
    }.toSet
  }

  test("operator equals the driver-side replay on the corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, t) =>
      fingerprints(t).map { case (p, h) => (id, p, h) }
    }.toSet
    val got = TextQueries.winnow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("fingerprint density sits in the 2/(w+1) band") {
    val perDoc = TextQueries.winnow(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val words = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").length)).toMap
    val densities = perDoc.map { case (id, nFp) =>
      val nWin = words(id) - (K - 1) - W + 1
      nFp.toDouble / nWin
    }
    val mean = densities.sum / densities.size
    // theoretical expectation 2/(w+1) = 0.4 on random hashes
    assert(mean > 0.25 && mean < 0.55, s"mean density $mean out of band")
  }

  test("winnow pairs equal the driver-side replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> fingerprints(t).map(_._2) }.toMap
    val df = perDoc.toSeq.flatMap { case (id, hs) => hs.map(h => (h, id)) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expect = (for {
      (a, ha) <- perDoc.toSeq; (b, hb) <- perDoc.toSeq if a < b
      shared = (ha & hb).count(h => df(h) <= TextQueries.WinDfCap)
      if shared >= TextQueries.WinMinShared
    } yield (a, b, shared.toLong)).toSet
    val got = TextQueries.winnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.CacheRegistry.releaseAll()
    assert(got == expect)
  }

  test("a fingerprint held by more docs than the df cap generates no pairs") {
    import spark.implicits._
    val shared = (1 to W + K - 1).map(i => s"cap$i").mkString(" ")
    val docs = (0L until TextQueries.WinDfCap + 5L).map { id =>
      val tail = (1 to 8).map(i => s"t${id}_$i").mkString(" ")
      (id, s"$shared $tail")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_cap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = TextQueries.winnowPairs(spark, dir).collect()
    graft.CacheRegistry.releaseAll()
    assert(rows.isEmpty, s"boilerplate fingerprints paired: ${rows.length} rows")
  }

  test("a shared run of >= w+k-1 words yields a shared fingerprint hash") {
    val shared = (1 to W + K - 1).map(i => s"run$i").mkString(" ")
    val a = s"alpha1 alpha2 alpha3 alpha4 $shared omega1 omega2 omega3"
    val b = s"beta1 beta2 $shared gamma1 gamma2 gamma3 gamma4 gamma5"
    val fa = fingerprints(a).map(_._2)
    val fb = fingerprints(b).map(_._2)
    assert((fa & fb).nonEmpty, "winnowing guarantee violated in the replay")
    // and through the operator itself
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    Seq((0L, a), (1L, b)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.winnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val ha = rows.collect { case (0L, h) => h }.toSet
    val hb = rows.collect { case (1L, h) => h }.toSet
    assert((ha & hb).nonEmpty, "operator missed the shared-run fingerprint")
  }
}
