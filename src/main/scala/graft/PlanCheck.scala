package graft
/** Dumps formatted physical plans for the headline queries — run with
  * an output file arg to regenerate PLANS.md. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("plans")
    val d = "/root/testdata/sf0.01"
    val names = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q5_local_supplier_volume", "q6_revenue_forecast", "doc_wordcount",
      "emb_cosine_topk", "asof_native", "dedup_lsh_pairs", "sort_topk",
      "q9_profit_rollup", "q21_waiting_supplier", "dedup_ngram_jaccard",
      "dedup_embedding_lsh", "emb_ann_ivf", "window_trailing_30d",
      "sql_grouping_sets", "unpivot_status", "doc_decontaminate",
      "doc_mixture_sample", "text_pack_sequences",
      "text_bm25_topk", "text_tfidf_top_terms", "text_repetition_quality",
      "doc_chunk_windows", "emb_kmeans_assign",
      "emb_semantic_dedup", "graph_pagerank_dups", "dedup_bloom_incremental",
      "ev_anomaly_3sigma", "text_vocab_oov",
      "q8_market_share", "q16_supplier_count", "q20_dominant_supplier",
      "text_unigram_surprisal", "text_collocations",
      "text_duplicate_spans", "doc_cdc_chunks", "doc_importance_score",
      "text_heavy_hitters", "emb_ann_quantized", "ev_heavy_users",
      "sql_set_ops_all", "mm_resize_stats",
      "ev_session_transitions", "doc_source_overlap", "layout_zorder_stats",
      "doc_snapshot_diff", "doc_incremental_stats",
      "sql_lateral_topk", "doc_token_budget_select",
      "text_bpe_merge_round", "text_bigram_perplexity",
      "text_dedup_span_rewrite", "retrieval_rrf_fusion",
      "sql_recursive_spine", "sql_recursive_hierarchy",
      "doc_quality_deciles", "dedup_lsh_precision",
      "emb_truncation_energy",
      "graph_triangle_count", "text_winnowing_pairs",
      "ev_gap_fill_locf", "doc_weighted_sample", "agg_string_collect",
      "retrieval_mmr", "audit_null_profile", "ev_lateness_audit",
      "ev_rolling_active_users", "ev_cusum_changepoint",
      "emb_centroid_margin", "text_kneser_ney", "agg_countmin_confirm",
      "emb_pq_adc_topk", "mm_scene_cuts", "ev_rfm_segments",
      "emb_pca_power", "ev_audience_overlap", "ev_forecast_backtest",
      "dedup_survivorship", "dedup_prefix_filter_pairs", "ev_ks_drift",
      "audit_benford", "mm_audio_vad", "ev_top_paths",
      "text_lang_confusion",
      "ev_time_to_convert", "ev_copresence_affinity", "ev_markov_entropy",
      "text_zipf_slope", "text_js_divergence", "text_heaps_checkpoints",
      "emb_pair_distance_hist", "audit_value_mad",
      "asof_native_forward", "emb_ann_recall_eval", "text_feature_hashing",
      "ev_survival_curve", "emb_dim_covariance",
      "ev_funnel_windowed", "ev_new_vs_returning", "ev_power_users_pareto",
      "audit_schema_profile", "emb_ivf_balance", "agg_pivot_multi",
      "mm_phash_buckets", "ev_bot_regularity",
      "ev_ltv_cohorts", "emb_ann_recall_sweep", "sketch_daily_merge",
      "text_bpe_apply", "graph_degree_assortativity", "ev_psi_drift",
      "retrieval_query_expansion", "text_quality_dup_calibration",
      "text_memorization_grams", "audit_l_diversity",
      "mm_phash_neardup_pairs", "emb_matryoshka_recall",
      "agg_market_basket", "emb_centroid_drift", "ev_streak_lengths",
      "layout_shard_balance", "graph_kcore", "agg_backlog_aging",
      "dedup_cluster_density", "ev_attribution_time_decay",
      "sketch_pair_overlap", "ev_hazard_censored")
    val out = new StringBuilder
    out ++= "# PLANS — formatted physical plans for headline queries\n\n"
    out ++= "Regenerate: `sbt \"runMain graft.PlanCheck PLANS.md\"` " +
      "(sf0.01; plan shapes are pinned by PlanSpec).\n"
    out ++=
      """
        |## Order-determinism audit (VERDICT r1 #10)
        |
        |Every query whose OUTPUT depends on row order (top-k `LIMIT`,
        |`row_number`/rank windows) was swept for float-only tie-breaks —
        |the class where Spark and an oracle engine can legally disagree:
        |
        || query | ordering | tie-break after float |
        ||---|---|---|
        || q3_shipping_priority | revenue DESC | o_orderkey |
        || q10_returned_items | revenue DESC | c_custkey |
        || sort_topk | l_extendedprice DESC | l_orderkey, l_linenumber |
        || sql_top_customers | total_spend DESC | c_custkey |
        || window_top_per_key / topk_per_key_agg | o_totalprice DESC | o_orderkey |
        || emb_cosine_topk | cos DESC | c_id |
        || emb_ann_ivf | cos DESC | vec_id (c_id) |
        || q15_top_supplier | MAX equality join | supplier key output |
        || text_bm25_topk | score_e6 DESC (integer-snapped) | doc_id |
        || text_tfidf_top_terms | score_e6 DESC (integer-snapped) | term |
        || emb_kmeans_assign | d2 ASC (bit-deterministic fold) | cid |
        || doc_stratified_sample | md5 hash ASC (string, engine-identical) | doc_id |
        || q11_important_value | exact cents v DESC | l_partkey |
        || q16_supplier_count | supplier_cnt DESC | p_brand, p_type, p_size |
        || q18_large_volume_customer | STORED o_totalprice DESC (no arithmetic) | o_orderkey |
        || text_collocations | pair_count DESC (exact long) | word_a, word_b |
        || text_heavy_hitters | exact count DESC | word |
        |
        |All ranked floats are themselves engine-identical (integer-cents
        |money sums, or fixed left-to-right double folds for cosine), and
        |every ranking carries an integer key tie-break, so rank/limit
        |results are total-order deterministic in both engines. Queries
        |without LIMIT/rank windows are order-insensitive: the driver
        |sorts rows by all columns before hashing.
        |""".stripMargin
    for (n <- names) {
      val p = SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out ++= s"\n## $n\n\n```\n$p```\n"
      println(s"===== $n")
      println(p)
    }
    if (args.nonEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), out.toString)
    spark.stop()
  }
}
