package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cache release contract (CacheRegistry): every operator that persists
  * an intermediate tracks it, and after an entry point finishes a query and
  * calls `releaseAll()`, NO InMemoryRelation remains in the session's
  * CacheManager — a long-lived pipeline session must not accumulate dead
  * cached tables. */
class CacheReleaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // every query whose plan persists an intermediate via CacheRegistry.
  // (dedup_ngram_jaccard left this list in round 9: its staging moved to
  // the session-scoped localCheckpoint artifacts — stagedSketch /
  // bandedPairCounts — which live OUTSIDE the CacheManager by design;
  // PlanSpec pins that form instead.)
  private val persisting =
    Seq("dedup_minhash_lsh", "stream_neardup", "dedup_incremental",
      "dedup_containment", "dedup_winnow_pairs", "text_boilerplate", "ts_autocorr",
      "stats_ttest", "emb_drift", "ts_forecast", "ts_outlier_mad", "q15_top_supplier",
      "etl_geo_cluster", "mm_quality_gate", "stats_corr", "ts_cross_corr",
      "etl_schema_drift", "emb_mmr", "stats_ks", "stream_cep",
      "ts_rolling_quantile")

  persisting.foreach { name =>
    test(s"$name leaves no cached relation behind after releaseAll") {
      // other suites share the session and may have cached frames; start clean
      spark.sharedState.cacheManager.clearCache()
      SparkEntry.queries(name)(spark, sf).count()
      assert(!spark.sharedState.cacheManager.isEmpty,
        s"$name is expected to persist an intermediate while running")
      CacheRegistry.releaseAll()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left a cached relation after releaseAll")
    }
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    CacheRegistry.releaseAll()
    CacheRegistry.releaseAll()
  }
}
