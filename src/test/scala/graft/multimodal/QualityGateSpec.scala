package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** `mm_quality_gate`: replayed rule-by-rule, every metadata rule fires on
  * the corpus, and the duplicate rule (absent from the dup-free synthetic
  * corpus) is exercised on a planted one — keeper survives, copies drop. */
class QualityGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collect(dir: String) = {
    val out = MultimodalQueries.qualityGate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getString(6))).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("rules equal a driver-side replay; every metadata rule fires") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val digests = docs.groupBy(d => new String(d._2)).values
    val keeper = docs.map { case (id, t) => (id, t) }.groupBy(_._2).view
      .mapValues(g => (g.size, g.map(_._1).min)).toMap
    val got = collect(sf)
    docs.foreach { case (id, text) =>
      val bl = text.getBytes("UTF-8").length.toLong
      val w = 32 + bl % 64
      val h = 32 + id % 48
      val (nc, keep0) = keeper(text)
      val reasons = Seq(
        if (w < 64 || h < 40) Some("too_small") else None,
        if (w > h * 2 || h > w * 2) Some("bad_aspect") else None,
        if (bl < 120) Some("payload_too_small") else None,
        if (nc > 1 && id != keep0) Some("duplicate_payload") else None
      ).flatten.mkString("|")
      val (gbl, gw, gh, gkeep, gr) = got(id)
      assert(gbl == bl && gw == w && gh == h, s"doc $id meta")
      assert(gr == reasons && gkeep == reasons.isEmpty, s"doc $id verdict")
    }
    val fired = got.values.flatMap(_._5.split('|')).filter(_.nonEmpty).toSet
    assert(Set("too_small", "bad_aspect", "payload_too_small").subsetOf(fired), s"$fired")
    val _ = digests
  }

  test("duplicate payloads drop, the min-id keeper survives the dup rule") {
    import spark.implicits._
    // long texts so no size rule interferes with the dup rule on keepers
    val long1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val long2 = (1 to 40).map(i => s"x$i").mkString(" ")
    val docs = Seq((5L, long1, "s"), (9L, long1, "s"), (11L, long1, "s"), (20L, long2, "s"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mmq").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = collect(dir)
    assert(!got(5L)._5.contains("duplicate_payload"), s"keeper flagged: ${got(5L)}")
    Seq(9L, 11L).foreach(id =>
      assert(got(id)._5.contains("duplicate_payload"), s"copy $id not flagged"))
    assert(!got(20L)._5.contains("duplicate_payload"))
  }
}
