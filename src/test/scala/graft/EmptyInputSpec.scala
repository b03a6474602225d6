package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input hardening: every window/sequence/explode-heavy operator
  * must return an empty result on an empty (but schema-complete) table, not
  * throw — the round-1 advice theme (illegal sequence bounds on degenerate
  * boxes) generalized. An empty fixture is written once per table by
  * truncating the sf0.001 data to 0 rows, preserving schema exactly. */
class EmptyInputSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    // events.ts is TIMESTAMP(NANOS); read it the way Tables.events does.
    // The truncated copy stores ts as plain INT64, which the same conf
    // reads back identically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("events", "documents", "embeddings", "region", "nation", "customer",
      "supplier", "part", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"${TestSpark.sf}/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // the operators whose plans lean on sequence()/explode/windows/collects —
  // the shapes that historically break on empty or degenerate input
  private val risky = Seq(
    "text_chunk", "dedup_spans", "etl_scd2", "q11_funnel", "q12_retention",
    "ts_resample", "ts_moving_avg", "etl_pivot", "etl_backlog_check",
    "stream_late_data", "text_tokenizer_fertility", "graph_louvain", "ann_knn_graph",
    "text_pack", "text_ngram_freq", "etl_zorder", "stats_histogram",
    "q14_skew_agg", "emb_project", "emb_normalize", "q10_cube", "text_bpe_vocab",
    "etl_zone_multi", "etl_ingest_bloom", "stats_heavy_hitters",
    "text_domain_mix", "text_html_strip", "stream_neardup",
    // the kmeans family trains a model from the corpus — an empty corpus
    // must yield empty assignments, not a failed `require`
    "emb_kmeans", "dedup_semantic", "dedup_embedding_cosine", "ann_ivf",
    "dedup_incremental", "mm_phash_neardup", "mm_frame_overlap",
    "text_pipeline_report", "emb_hard_negatives", "ts_anomaly",
    "emb_incremental_assign", "stream_anomaly", "ann_pq", "ann_ivfpq",
    "sample_importance", "etl_nearest_intersection",
    "etl_fuzzy_crosswalk", "ts_interpolate", "stats_kmv_distinct", "stream_topk",
    "graph_pagerank", "graph_triangles", "etl_k_anonymize", "ts_ewma",
    "dedup_rewrite", "emb_pca", "dedup_cdc_chunks", "stats_corr",
    "graph_neighbor_jaccard", "ts_changepoint", "emb_outliers", "ann_filtered",
    "etl_dq_report", "graph_bfs", "etl_survivorship", "text_lm_score",
    "stats_cms", "ts_autocorr", "graph_kcore", "text_boilerplate", "emb_drift",
    "ann_range_search", "stats_ttest", "text_winnow", "dedup_winnow_pairs",
    "ts_forecast", "etl_l_diversity", "etl_pseudonymize", "ts_outlier_mad",
    "sample_balanced", "graph_hits", "q15_top_supplier", "etl_time_travel",
    "etl_geo_cluster", "text_blocklist", "mm_quality_gate", "etl_gdpr_delete",
    "stream_cdc_apply", "stats_benford", "etl_record_linkage", "sample_split",
    "stats_gini", "stats_ks", "ts_cross_corr", "etl_compact_plan",
    "etl_schema_drift", "q16_cust_order_dist", "emb_mmr", "stream_cep",
    "mm_scene_detect", "stats_equidepth", "graph_labelprop",
    "stats_contingency", "ts_rolling_quantile", "ann_multiprobe",
    "q18_big_orders", "text_hash_embed", "ts_trend", "etl_join_profile",
    "q19_disc_revenue", "etl_profile_suggest", "emb_dim_stats",
    "text_langid_segments", "emb_decontaminate", "q22_idle_balance",
    // round-9 additions: calibration-row / model-artifact early-outs
    "ts_lttb", "graph_components", "sample_reservoir", "text_kn_counts",
    "sample_pps_systematic", "sample_kcenter", "emb_quantize_int8",
    "text_bpe_apply", "dedup_ngram_jaccard", "dedup_edit_distance",
    "dedup_minhash_lsh", "ann_recall_eval", "dedup_recall_eval",
    "etl_run_report", "dedup_weights", "etl_dq_quarantine",
    "stats_hll_distinct", "stats_sketch_eval", "text_collocations",
    "stream_distinct", "sample_split_group", "text_zipf_fit", "etl_freshness",
    "stats_cms_eval",
    // round-11 additions
    "text_quality_classifier", "dedup_rewrite_exact", "mm_scene_neardup",
    "text_unigram_vocab", "text_classifier_eval", "stream_quality_score",
    "text_unigram_apply", "stats_bootstrap", "text_lm_eval",
    "sample_mix_eval", "graph_modularity", "ts_mannkendall", "ts_theilsen",
    "graph_assortativity",
    // round-12 additions
    "graph_scc", "ts_holtwinters", "text_pii_audit", "text_pii_scrub",
    "model_registry", "graph_reciprocity", "text_kn_score", "ts_periodogram",
    "text_perplexity_buckets", "emb_whiten", "graph_closeness", "stats_linreg",
    "text_ngram_novelty", "mm_keyframe_select", "stream_linreg", "stats_anova",
    "graph_coreness", "ann_cell_stats",
    // round-13 additions
    "emb_bitext_mine", "mm_align_score", "graph_betweenness",
    "mm_retrieval_eval", "sample_epoch_alloc", "sample_curriculum",
    "stats_mannwhitney", "graph_anf", "ts_matrix_profile",
    // round-15 additions
    "ann_graph_search", "dedup_knn_semantic")

  risky.foreach { name =>
    test(s"$name returns cleanly on empty input") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      val _ = rows // any row count is fine (cube/backlog emit totals); no throw is the contract
    }
  }
}
