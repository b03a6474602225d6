package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Recall contract of the collision-count amplification
  * (DedupQueries.MinBandMatches / EditMinBandMatches): requiring >= k of
  * 64 signature components to collide cuts verify mass but must NOT drop
  * any pair that the output threshold would keep. Three checks:
  *
  *  1. A planted BORDERLINE pair (shingle Jaccard ~0.11-0.15, barely above
  *     the 0.10 output cut — the worst case for amplification, where
  *     E[component matches] ~ 7 of 64) still surfaces in
  *     `dedup_ngram_jaccard`.
  *  2. A planted localized-edit pair at edit_ratio ~0.15 (inside the 0.2
  *     contract but near it) still surfaces in `dedup_edit_distance`
  *     under the stricter EditMinBandMatches=4.
  *  3. On the gate corpus, every candidate the amplification DROPS
  *     (matches == 1) verifies BELOW the 0.10 Jaccard output threshold —
  *     the "0 empirical misses" claim checked mechanically, not assumed.
  */
class BandAmplificationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ~60 words each; B shares one 14-word run with A (12 shared shingles,
  // ~104 union) => Jaccard ~0.115, just above the 0.10 output threshold
  private val sharedRun =
    "the committee reviewed the annual budget proposal during the late evening session on thursday"
  private val fillerA =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november " +
      "oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two " +
      "three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen"
  private val fillerB =
    "apple banana cherry damson elderberry fig grape honeydew imbe jackfruit kiwi lemon mango " +
      "nectarine orange peach quince raspberry strawberry tangerine ugli vanilla watermelon " +
      "ximenia yuzu zucchini red blue green yellow purple orange silver golden copper bronze " +
      "iron steel granite marble"
  private val docA = s"$fillerA $sharedRun"
  private val docB = s"$fillerB $sharedRun"

  // localized-edit pair: one contiguous rewrite, edit ratio ~0.15, word
  // shingle Jaccard still ~0.6 (E[matches] ~ 38 >> EditMinBandMatches)
  private val editBase =
    "records from the northern station show that rainfall totals for the month of march " +
      "exceeded the historical average by a wide margin according to the survey published " +
      "by the regional office last week"
  private val editVar = editBase.replace(
    "exceeded the historical average by a wide margin",
    "fell short of the seasonal norm by some distance")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("bandamp").toString
    val rows = Seq((1L, docA), (2L, docB), (3L, editBase), (4L, editVar))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("borderline Jaccard pair (~0.11) survives MinBandMatches=2") {
    val out = DedupQueries.ngramJaccard(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    graft.CacheRegistry.releaseAll()
    val j = out.getOrElse((1L, 2L),
      fail(s"planted borderline pair (1,2) missing; got ${out.keySet}"))
    assert(j >= 0.10 && j <= 0.20, s"planted pair should be borderline, got $j")
  }

  test("localized-edit pair (ratio ~0.15) survives EditMinBandMatches=4") {
    val out = DedupQueries.editDistance(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    graft.CacheRegistry.releaseAll()
    val ratio = out.getOrElse((3L, 4L),
      fail(s"planted edit pair (3,4) missing; got ${out.keySet}"))
    assert(ratio > 0.05 && ratio <= MaxRatio, s"expected near-bound ratio, got $ratio")
  }
  private val MaxRatio = DedupQueries.MaxEditRatio

  test("gate corpus: every amplification-dropped candidate is below the output threshold") {
    val sf = TestSpark.sf
    val all = DedupQueries.bandedCandidates(spark, sf, minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    val kept = DedupQueries.bandedCandidates(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheRegistry.releaseAll()
    assert(kept.subsetOf(all), "counting can only shrink the candidate set")
    assert(all.size > kept.size,
      s"amplification should cut candidates on the gate corpus (${all.size} vs ${kept.size})")
    val dropped = all -- kept
    if (dropped.nonEmpty) {
      // verify the dropped pairs' TRUE Jaccard driver-side: none may reach
      // the 0.10 output threshold, else amplification lost a real pair
      graft.functions.HashExprs.register(spark)
      val sh = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), DedupQueries.shingles(col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val offenders = dropped.filter { case (a, b) =>
        val (sa, sb) = (sh(a), sh(b))
        val inter = (sa & sb).size.toDouble
        val uni = (sa | sb).size.toDouble
        uni > 0 && inter / uni >= 0.10
      }
      assert(offenders.isEmpty,
        s"amplification dropped ${offenders.size} pairs above the output threshold: " +
          offenders.take(5))
    }
  }
}
