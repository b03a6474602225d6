package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ImportanceResampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  private val B = ImportanceResample.Buckets

  private def bucket(bg: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 6)
    java.lang.Long.parseLong(hex, 16) % B
  }

  private def bigrams(text: String): Seq[String] = {
    val w = text.split("\\s+", -1)
    (0 until math.max(0, w.length - 1)).map(i => w(i) + " " + w(i + 1))
  }

  /** Plain-Scala replay of the whole DSIR definition over a (doc, lang,
    * text) corpus: bucket counts, integer weights, quota, exact rank. */
  private def replay(rows: Seq[(Long, String, String)]): Seq[(Long, Long, Long)] = {
    val occ = rows.flatMap { case (id, lang, text) =>
      bigrams(text).map(bg => (id, lang, bucket(bg)))
    }
    val cntT = occ.filter(_._2 == ImportanceResample.TargetLang)
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cntR = occ.filter(_._2 != ImportanceResample.TargetLang)
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (cntT.values.sum, cntR.values.sum)
    val pool = rows.filter(_._2 != ImportanceResample.TargetLang)
    val quota = pool.size.toLong / ImportanceResample.KeepDenom
    val weights = occ.filter(_._2 != ImportanceResample.TargetLang)
      .groupBy(o => (o._1, o._3)).toSeq
      .map { case ((id, b), os) =>
        id -> os.size.toLong * ((cntT.getOrElse(b, 0L) + 1L) * (nr + B)
          - (cntR.getOrElse(b, 0L) + 1L) * (nt + B))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    weights.sortBy { case (id, wt) => (-wt, id) }.zipWithIndex
      .map { case ((id, wt), i) => (id, wt, i + 1L) }
      .filter(_._3 <= quota)
  }

  test("weights, quota, and ranks match a driver-side replay of the DSIR definition") {
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expect = replay(corpus)
    val got = ImportanceResample.sampleImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got == expect, s"first diff: ${got.zip(expect).find(p => p._1 != p._2)}")
  }

  test("a pool doc written in the target's vocabulary outranks same-language gibberish") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val enText = (0 until 60).map(i => s"common${i % 12}").mkString(" ")
    val rows = Seq(
      (0L, "en", enText), (1L, "en", enText),
      // pool: doc 2 reuses the target vocabulary, docs 3..9 do not
      (2L, "de", enText)) ++
      (3L to 9L).map(i => (i, "de", (0 until 60).map(j => s"rare${i}_$j").mkString(" ")))
    rows.toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = ImportanceResample.sampleImportance(spark, tmp).collect()
    // quota = 8/4 = 2 docs; the target-like doc must be rank 1
    assert(got.length == 2)
    assert(got.head.getLong(0) == 2L && got.head.getLong(2) == 1L,
      s"expected target-like doc 2 at rank 1, got ${got.toSeq}")
  }

  test("selection is the exact top quarter: boundary dominance and quota size") {
    val corpus = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val poolSize = corpus.count(_._2 != ImportanceResample.TargetLang)
    val got = ImportanceResample.sampleImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == poolSize / ImportanceResample.KeepDenom.toInt)
    // every selected (weight, doc_id) dominates every excluded one
    val selected = got.map(_._1).toSet
    val all = replayAllWeights(corpus)
    val worstIn = got.map { case (id, wt) => (wt, id) }.minBy { case (wt, id) => (wt, -id) }
    all.filterNot(p => selected.contains(p._1)).foreach { case (id, wt) =>
      assert(wt < worstIn._1 || (wt == worstIn._1 && id > worstIn._2),
        s"excluded doc $id ($wt) dominates selected boundary $worstIn")
    }
  }

  private def replayAllWeights(rows: Seq[(Long, String, String)]): Seq[(Long, Long)] = {
    val occ = rows.flatMap { case (id, lang, text) =>
      bigrams(text).map(bg => (id, lang, bucket(bg)))
    }
    val cntT = occ.filter(_._2 == ImportanceResample.TargetLang)
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cntR = occ.filter(_._2 != ImportanceResample.TargetLang)
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (cntT.values.sum, cntR.values.sum)
    occ.filter(_._2 != ImportanceResample.TargetLang)
      .groupBy(o => (o._1, o._3)).toSeq
      .map { case ((id, b), os) =>
        id -> os.size.toLong * ((cntT.getOrElse(b, 0L) + 1L) * (nr + B)
          - (cntR.getOrElse(b, 0L) + 1L) * (nt + B))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
  }
}
