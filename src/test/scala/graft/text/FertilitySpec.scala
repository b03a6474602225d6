package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `text_tokenizer_fertility` contract: (1) a planted language whose words
  * never merge pays a large BPE premium while English anchors at exactly
  * 1.0; (2) the per-language token masses are EXACTLY the apply ops' token
  * streams re-aggregated (the composition identity — fertility can never
  * disagree with `text_bpe_apply` / `text_unigram_apply`); (3) masses
  * recount from the planted corpus by hand. */
class FertilitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** en: one hyper-frequent word that two merges collapse to 1 token.
    * zz: eight words of six distinct chars each, no shared pairs — far
    * more distinct pairs than the 10-merge budget can cover. */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("fertility").toString
    val en = (0 until 6).map(i => (i.toLong, "aaaa aaaa aaaa aaaa", "en", "synth", 19L))
    val zzWords = Seq("bcdfgh", "jklmnp", "qrstvw", "xyz012", "345678", "9ABCDE",
      "FGHIJK", "LMNOPQ")
    val zz = (0 until 4).map(i =>
      ((10 + i).toLong, zzWords.mkString(" "), "zz", "synth", 55L))
    (en ++ zz).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted never-merge language pays a large BPE premium; English anchors at 1.0") {
    val rows = Fertility.queries("text_tokenizer_fertility")(spark, plantedDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    graft.CacheRegistry.releaseAll()
    val bpeEn = rows(("bpe", "en"))
    val bpeZz = rows(("bpe", "zz"))
    assert(bpeEn.getDouble(8) == 1.0, s"en premium must be exactly 1.0: $bpeEn")
    // en: 24 occurrences of 'aaaa', two merges collapse it to one token
    assert(bpeEn.getLong(2) == 24L && bpeEn.getLong(4) == 24L,
      s"en must tokenize at 1 token/word: $bpeEn")
    // zz: 8 words x 6 chars x 4 docs = 192 char slots; at most 8 remaining
    // merges can each save one slot per occurrence -> >= (48-8)*4 tokens
    assert(bpeZz.getLong(4) >= 160L, s"zz must stay nearly unmerged: $bpeZz")
    assert(bpeZz.getDouble(8) >= 2.0,
      s"zz premium must be large (got ${bpeZz.getDouble(8)})")
    // masses recount by hand: words and bytes per language
    assert(bpeEn.getLong(2) == 24L && bpeEn.getLong(5) == 96L, s"en masses: $bpeEn")
    assert(bpeZz.getLong(2) == 32L && bpeZz.getLong(5) == 192L, s"zz masses: $bpeZz")
    // OOV is zero on the planted corpus (floor 1, cap far above)
    assert(rows.values.forall(_.getLong(3) == 0L))
  }

  test("composition identity: per-language token mass equals the apply ops' streams re-aggregated") {
    val sf = TestSpark.sf
    val langOf = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
    def applyMass(key: String): Map[String, Long] = {
      val m = graft.SparkEntry.queries(key)(spark, sf)
        .join(langOf, Seq("doc_id"))
        .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.CacheRegistry.releaseAll()
      m
    }
    val fert = Fertility.queries("text_tokenizer_fertility")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    graft.CacheRegistry.releaseAll()
    val bpe = applyMass("text_bpe_apply")
    val uni = applyMass("text_unigram_apply")
    bpe.foreach { case (lang, t) =>
      assert(fert(("bpe", lang)) == t, s"bpe $lang: fertility ${fert(("bpe", lang))} != apply $t")
    }
    uni.foreach { case (lang, t) =>
      assert(fert(("unigram", lang)) == t, s"unigram $lang mismatch")
    }
  }
}
