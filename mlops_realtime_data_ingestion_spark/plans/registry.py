"""Central query registry — the single source consumed by
``__spark_entry__.py`` (driver contract) and ``bench.py``."""

from __future__ import annotations

from .spec import QuerySpec

# Queries that already have a green row in CORRECTNESS_r01.json. The
# driver's per-round correctness run caps the number of queries it
# checks (round 1 recorded exactly the first 50 of 103), so the
# registry enumerates not-yet-driver-checked queries FIRST to maximize
# cumulative driver-visible coverage across rounds. Purely an ordering
# concern — every query runs identically wherever it sits.
_R1_CHECKED = frozenset({
    "flagship_tx_window_1min", "a6_minute_bucket", "p1_dedup_keep_first",
    "s10_latest_per_key", "f6_json_extract", "f1_epoch_roundtrip",
    "f4_base64_json", "f5_json_encode_size", "f7_f8_scalar_math",
    "a7_minmax_span", "sliding_window_agg", "session_window_agg",
    "tpch_q1_pricing_summary", "agg_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_pivot", "agg_unpivot", "agg_percentiles",
    "join_orders_customer_segment", "join_3way_brand_nation",
    "join_left_order_counts", "join_semi_big_spenders",
    "join_anti_no_big_orders", "j2_positional_zip",
    "asof_join_last_purchase", "range_join_attribution",
    "join_salted_skew", "dq_orders_report", "o2_topk_orders",
    "set_ops_user_cohorts", "w1_train_test_split",
    "w2_expanding_validation_windows", "w4_forecast_index",
    "a8_ordered_gather", "wf_rank_lag_lead", "wf_running_sum",
    "wf_rolling_time_range", "sessionize_events", "scd2_price_history",
    "wf_first_last_nth", "metrics_rmse_wql",
    "monitoring_consecutive_breach", "threshold_update_rule",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
})


# Queries with a green row in CORRECTNESS_r02.json (49 of the 50 the
# driver checked in round 2 — ``embedding_normalize_quantize`` errored
# in the driver's canonicalizer and is deliberately EXCLUDED so its
# fixed flat-schema version is re-checked in round 3).
_R2_CHECKED = frozenset({
    "forecast_seasonal_naive", "forecast_backtest_rmse_wql",
    "sim_search_ivf_kmeans", "text_repetition_metrics", "text_vocab_oov",
    "curation_funnel", "text_kwic_udtf", "hll_distinct_users",
    "dedup_survivors", "tpch_q10_returned_items", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier_cnt",
    "tpch_q17_small_qty_revenue", "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_predicates", "tpch_q22_dormant_customers",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q11_important_stock",
    "tpch_q12_late_shipments", "tpch_q13_customer_distribution",
    "tpch_q20_excess_shipments", "tpch_q21_waiting_suppliers",
    "dedup_exact_fingerprint", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine", "sim_search_cosine_topk",
    "sim_search_lsh_topk", "text_quality_score", "text_lang_id",
    "text_token_count", "text_fingerprint", "embedding_stats",
    "kmeans_embedding_clusters", "ts_profile_topk",
    "multimodal_frame_sample", "streaming_stream_join",
    "split_hash_assign", "export_shards", "pack_sequences_greedy",
    "sample_per_source_topk", "sample_stratified",
    "decontam_ngram_overlap", "text_heavy_hitters",
    "text_heavy_hitters_cms",
})

# Queries with a green hash-match row in CORRECTNESS_r03.json. The
# three r3 rows-only streaming queries are NOT listed:
# streaming_pipeline_e2e and streaming_breach_alarm gained full SQL
# oracles in round 4 and should be (re-)checked first; s1_http_poll
# stays rows-only (live-source shape) but has had its weak check.
_R3_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "approx_quantiles_by_type",
    "approx_quantiles_value", "boilerplate_chunks", "bpe_top_merges",
    "cdc_snapshot_diff", "decontam_semantic", "dedup_cc_star",
    "dedup_connected_components", "dedup_incremental_lsh",
    "doc_chunk_sliding", "drift_psi_events", "embedding_hard_negatives",
    "embedding_normalize_quantize", "embedding_pq_codes",
    "f1_epoch_roundtrip", "f4_base64_json", "f5_json_encode_size",
    "f6_json_extract", "f7_f8_scalar_math", "feature_mutual_info",
    "flagship_tx_window_1min", "funnel_view_click_purchase",
    "fuzzy_join_part_names", "graph_pagerank_topk", "hll_merge_identity",
    "hll_users_by_type", "join_bloom_prefilter", "multimodal_decode",
    "multimodal_resize", "p1_dedup_keep_first", "retrieval_eval_ann",
    "rollup_incremental_merge", "s10_latest_per_key",
    "sample_domain_mixture", "sample_weighted_docs", "session_window_agg",
    "sliding_window_agg", "split_leakage_safe", "table_stats_orders",
    "text_bm25_topk", "text_perplexity_filter", "text_pii_redact",
    "text_tfidf_topk", "token_pmi_topk", "ts_anomaly_zscore",
    "s1_http_poll_ingest",
})

# Queries with a green hash-match row in CORRECTNESS_r04.json.
_R4_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "ab_test_ztest", "agg_cube",
    "agg_distinct", "agg_grouping_sets", "agg_pivot", "agg_rollup",
    "agg_unpivot", "asof_join_cogrouped_purchase", "bpe_encode_documents",
    "ccnet_ppl_buckets", "clustering_eval_purity", "corr_matrix_lineitem",
    "dataset_card_report", "dedup_semdedup", "dsir_select_en",
    "embedding_jl_projection", "entity_resolution_part_names",
    "f1_epoch_roundtrip", "f4_base64_json", "f5_json_encode_size",
    "f6_json_extract", "f7_f8_scalar_math", "flagship_tx_window_1min",
    "k_anonymity_customers", "mv_join_incremental", "p1_dedup_keep_first",
    "passage_dedup_spans", "quality_classifier_hashed", "retention_cohorts",
    "s10_latest_per_key", "session_window_agg", "sim_search_ivfpq",
    "sim_search_mmr_topk", "skew_report_lineitem", "sliding_window_agg",
    "split_ngram_novelty", "streaming_breach_alarm",
    "streaming_pipeline_e2e", "table_stats_orders_sketch",
    "tpch_q11_true", "tpch_q1_pricing_summary", "tpch_q20_true",
    "tpch_q2_true", "tpch_q9_true", "ts_cusum_alerts", "ts_trend_per_user",
    "vocab_zipf_slope",
})

# Queries with a green hash-match row in CORRECTNESS_r05.json (all 50
# of round 5's driver sample were green, including the r4 red row
# wf_cumulative_distinct_users).
_R5_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "agg_cube", "agg_distinct",
    "agg_grouping_sets", "agg_percentiles", "agg_pivot", "agg_rollup",
    "agg_unpivot", "asof_join_cogrouped_purchase",
    "asof_join_last_purchase", "dedup_cdc_chunks", "dedup_containment",
    "dedup_survivors_best_quality", "dq_orders_report",
    "eval_calibration_ece", "f1_epoch_roundtrip", "f4_base64_json",
    "f5_json_encode_size", "f6_json_extract", "f7_f8_scalar_math",
    "flagship_tx_window_1min", "hll_user_overlap",
    "interval_overlap_orders", "j2_positional_zip",
    "join_3way_brand_nation", "join_anti_no_big_orders",
    "join_left_order_counts", "join_orders_customer_segment",
    "join_salted_skew", "join_semi_big_spenders", "o2_topk_orders",
    "p1_dedup_keep_first", "passages_sliding_window",
    "range_join_attribution", "s10_latest_per_key",
    "sample_temperature_mixture", "session_window_agg",
    "set_ops_user_cohorts", "sliding_window_agg",
    "streaming_record_highs", "substring_dedup_chains",
    "substring_span_rows", "substring_strip_text",
    "tpch_q1_pricing_summary", "ts_anomaly_mad", "ts_ewma_smooth",
    "ts_gapfill_interpolate", "ts_seasonal_decompose",
    "wf_cumulative_distinct_users",
})

# Queries whose LAST driver check was red. These enumerate ahead of
# everything else so the fix is guaranteed into the next round's
# 50-query driver sample. r5 had zero red rows (r4's single red,
# wf_cumulative_distinct_users, re-verified green in r5).
_LAST_RED = frozenset()

# Queries with a green hash-match row in CORRECTNESS_r06.json (all 50
# of round 6's driver sample were green, including the first-ever
# hash check of s1_http_poll_ingest and all 8 round-6-changed
# queries).
_R6_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "a8_ordered_gather",
    "agg_cube", "agg_distinct", "agg_grouping_sets", "agg_percentiles",
    "agg_pivot", "agg_rollup", "agg_unpivot",
    "asof_join_cogrouped_purchase", "asof_join_last_purchase",
    "dedup_cdc_chunks", "dedup_containment", "dq_orders_report",
    "dsir_select_en", "f1_epoch_roundtrip", "f4_base64_json",
    "f5_json_encode_size", "f6_json_extract", "f7_f8_scalar_math",
    "flagship_tx_window_1min", "forecast_backtest_rmse_wql",
    "forecast_seasonal_naive", "j2_positional_zip",
    "join_3way_brand_nation", "join_anti_no_big_orders",
    "join_left_order_counts", "join_orders_customer_segment",
    "join_salted_skew", "join_semi_big_spenders", "o2_topk_orders",
    "p1_dedup_keep_first", "passages_sliding_window",
    "range_join_attribution", "s10_latest_per_key",
    "s1_http_poll_ingest", "session_window_agg", "set_ops_user_cohorts",
    "sliding_window_agg", "substring_dedup_chains",
    "substring_dedup_incremental", "substring_span_rows",
    "substring_strip_text", "tpch_q1_pricing_summary", "ts_anomaly_mad",
    "w1_train_test_split", "w2_expanding_validation_windows",
    "w4_forecast_index", "wf_rank_lag_lead",
})

# Queries whose last driver check was the WEAK rows-only/no-oracle
# path but which have since gained a full SQL oracle (ranked with the
# red tier so the new oracle gets its first hash check). Round 6's
# sole entry, s1_http_poll_ingest, hash-verified green in r6 and
# moved to _R6_CHECKED; the tier is currently empty.
_ORACLE_NEEDS_FIRST_CHECK = frozenset()

# Queries with a green hash-match row in CORRECTNESS_r07.json (all 50
# of round 7's driver sample were green, including all 12 round-7-
# changed plans and the 3 brand-new rows).
_R7_CHECKED = frozenset({
    "a8_ordered_gather", "dedup_cdc_chunks", "dedup_cdc_chunks_join",
    "dedup_containment", "dedup_containment_incremental",
    "dedup_incremental_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "forecast_backtest_rmse_wql", "forecast_seasonal_naive",
    "fuzzy_join_part_names", "interval_overlap_orders",
    "metrics_rmse_wql", "monitoring_consecutive_breach",
    "passage_dedup_spans", "passage_dedup_spans_join",
    "scd2_price_history", "sessionize_events", "split_ngram_novelty",
    "streaming_record_highs", "substring_dedup_incremental",
    "substring_strip_text", "text_repetition_metrics",
    "threshold_update_rule", "tpch_q10_returned_items",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_cnt", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers", "tpch_q19_disjunctive_predicates",
    "tpch_q22_dormant_customers", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "ts_cusum_alerts", "ts_ewma_smooth", "ts_gapfill_interpolate",
    "ts_seasonal_decompose", "ts_trend_per_user", "w1_train_test_split",
    "w2_expanding_validation_windows", "w4_forecast_index",
    "wf_cumulative_distinct_users", "wf_first_last_nth",
    "wf_rank_lag_lead", "wf_rolling_time_range", "wf_running_sum",
})

# Queries with a green hash-match row in CORRECTNESS_r08.json (all 50
# of round 8's driver sample were green, including all 7 of
# _CHANGED_R8 — the round-8 drift-safe-bounds tier, now folded in —
# and the 4 brand-new round-8 rows).
_R8_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "agg_cube", "agg_distinct",
    "agg_grouping_sets", "agg_percentiles", "agg_pivot", "agg_rollup",
    "agg_unpivot", "asof_join_cogrouped_purchase",
    "asof_join_last_purchase", "dedup_cc_star",
    "dedup_connected_components", "dedup_containment",
    "dedup_containment_incremental", "dedup_containment_index_serve",
    "dedup_ngram_jaccard", "dedup_simhash_combi",
    "dedup_simhash_incremental", "dedup_simhash_index_serve",
    "dedup_survivors", "dq_orders_report", "f1_epoch_roundtrip",
    "f4_base64_json", "f5_json_encode_size", "f6_json_extract",
    "f7_f8_scalar_math", "flagship_tx_window_1min", "j2_positional_zip",
    "join_3way_brand_nation", "join_anti_no_big_orders",
    "join_left_order_counts", "join_orders_customer_segment",
    "join_salted_skew", "join_semi_big_spenders", "metrics_rmse_wql",
    "o2_topk_orders", "p1_dedup_keep_first", "range_join_attribution",
    "s10_latest_per_key", "scd2_price_history", "session_window_agg",
    "sessionize_events", "set_ops_user_cohorts", "sliding_window_agg",
    "split_leakage_safe", "tpch_q1_pricing_summary", "wf_first_last_nth",
    "wf_rolling_time_range", "wf_running_sum",
})

# Queries with a green hash-match row in CORRECTNESS_r09.json (all 50
# of round 9's driver sample were green, including all 3 of
# _CHANGED_R9 — the round-9 rewritten-plan tier, now folded in — the
# 4 brand-new IVF-PQ lifecycle rows, and the 43 stalest rows the
# _LAST_GREEN rotation surfaced).
_R9_CHECKED = frozenset({
    "approx_quantiles_by_type", "approx_quantiles_value",
    "boilerplate_chunks", "bpe_top_merges", "cdc_snapshot_diff",
    "curation_funnel", "decontam_ngram_overlap", "decontam_semantic",
    "dedup_embedding_cosine", "dedup_exact_fingerprint",
    "dedup_minhash_lsh", "dedup_survivors_best_quality",
    "doc_chunk_sliding", "drift_psi_events", "embedding_hard_negatives",
    "embedding_normalize_quantize", "embedding_stats", "export_shards",
    "hll_distinct_users", "kmeans_embedding_clusters",
    "multimodal_frame_sample", "pack_sequences_greedy",
    "sample_per_source_topk", "sample_stratified",
    "sim_search_cosine_topk", "sim_search_ivf_kmeans",
    "sim_search_ivfpq_index_update", "sim_search_ivfpq_rerank",
    "sim_search_ivfpq_sampled", "sim_search_ivfpq_serve",
    "sim_search_lsh_topk", "split_hash_assign", "streaming_stream_join",
    "text_fingerprint", "text_heavy_hitters", "text_heavy_hitters_cms",
    "text_kwic_udtf", "text_lang_id", "text_quality_score",
    "text_token_count", "text_vocab_oov", "tpch_q11_important_stock",
    "tpch_q12_late_shipments", "tpch_q13_customer_distribution",
    "tpch_q20_excess_shipments", "tpch_q21_waiting_suppliers",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "ts_profile_topk",
})

# (Round 10's changed tier was empty — the banding-math rewrite,
# index-cache move, and ivfpq guard could not alter certified
# outputs; see the r10 fold below.)

# Queries with a green hash-match row in CORRECTNESS_r10.json (all 50
# of round 10's driver sample were green, including both brand-new
# 64-bit simhash rows and the 44 stalest r3/r4-era certifications the
# rotation surfaced — the staleness drain: after this fold nothing
# predates r6).
_R10_CHECKED = frozenset({
    "ab_test_ztest", "bpe_encode_documents", "ccnet_ppl_buckets",
    "clustering_eval_purity", "corr_matrix_lineitem",
    "dataset_card_report", "dedup_semdedup", "dedup_simhash64",
    "dedup_simhash64_index_serve", "dsir_select_en",
    "embedding_jl_projection", "embedding_pq_codes",
    "entity_resolution_part_names", "eval_calibration_ece",
    "feature_mutual_info", "funnel_view_click_purchase",
    "graph_pagerank_topk", "hll_merge_identity", "hll_user_overlap",
    "hll_users_by_type", "join_bloom_prefilter",
    "k_anonymity_customers", "multimodal_decode", "multimodal_resize",
    "mv_join_incremental", "quality_classifier_hashed",
    "retention_cohorts", "retrieval_eval_ann",
    "rollup_incremental_merge", "sample_domain_mixture",
    "sample_temperature_mixture", "sample_weighted_docs",
    "sim_search_ivfpq", "sim_search_mmr_topk", "skew_report_lineitem",
    "streaming_breach_alarm", "streaming_pipeline_e2e",
    "table_stats_orders", "table_stats_orders_sketch", "text_bm25_topk",
    "text_perplexity_filter", "text_pii_redact", "text_tfidf_topk",
    "token_pmi_topk", "tpch_q11_true", "tpch_q20_true", "tpch_q2_true",
    "tpch_q9_true", "ts_anomaly_zscore", "vocab_zipf_slope",
})

# Queries with a green hash-match row in CORRECTNESS_r11.json (all 50
# of round 11's driver sample were green, including both _CHANGED_R11
# Arrow-cdc rows — now folded in — and the 46 stalest r6/r7-era rows
# plus 2 r8-era rows the rotation surfaced; after this fold nothing
# predates r8).
_R11_CHECKED = frozenset({
    "a6_minute_bucket", "a7_minmax_span", "a8_ordered_gather",
    "agg_cube", "agg_distinct", "dedup_cdc_chunks",
    "dedup_cdc_chunks_join", "dedup_incremental_lsh", "dedup_simhash",
    "forecast_backtest_rmse_wql", "forecast_seasonal_naive",
    "fuzzy_join_part_names", "interval_overlap_orders",
    "monitoring_consecutive_breach", "passage_dedup_spans",
    "passage_dedup_spans_join", "passages_sliding_window",
    "s1_http_poll_ingest", "split_ngram_novelty",
    "streaming_record_highs", "substring_dedup_chains",
    "substring_dedup_incremental", "substring_span_rows",
    "substring_strip_text", "text_repetition_metrics",
    "threshold_update_rule", "tpch_q10_returned_items",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_cnt", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_predicates", "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "ts_anomaly_mad", "ts_cusum_alerts",
    "ts_ewma_smooth", "ts_gapfill_interpolate",
    "ts_seasonal_decompose", "ts_trend_per_user",
    "w1_train_test_split", "w2_expanding_validation_windows",
    "w4_forecast_index", "wf_cumulative_distinct_users",
    "wf_rank_lag_lead",
})

# Queries whose Spark implementation changed in round 12 in a way the
# driver should re-certify: the shingle-position frame these rows
# consume was switched from the per-doc pandas path to the
# whole-batch Arrow/numpy path (functions/hashing_pandas
# .shingle_position_rows — VERDICT r11 task 3, the cdc template).
# Output is bit-identical by construction (parity pinned in
# tests/test_round12_plans.py) and re-verified against the DuckDB
# oracles at sf0.01 + sf0.1 this round, but the plan is new, so the
# rows get priority re-certification. Only the two passage rows
# switched: the 100x A/B measured arrow wins there (best-of-3 4.33
# vs 5.01 s window, 6.01 vs 8.04 s join) but a wash on
# substring_dedup_chains and a reproducible 1.8x LOSS on
# substring_span_rows, which both stay on the per-doc pandas path
# (SCALE.md round 12).
#
# The optimization round adds the kmeans-assign rewrite rows: the
# row_number-window argmin inside kmeans_iterate / ivfpq_index_update
# became a partial-aggregable min(struct(d, cluster)) and the
# interpreted sq_dist HOF fold gained a codegen flat-expression
# spelling for statically-known dims (operators/similarity.py
# _argmin_assign / _flat_sq_dist). Bit-identical by construction
# (IEEE 0.0+t0==t0 + lexicographic struct-min == window first row;
# parity pinned at three levels in tests/test_round12_plans.py) and
# re-verified vs the DuckDB oracles at sf0.01 + sf0.1 this round,
# but the plans are new -> priority re-certification. With the fused
# backtest row, 13 changed + the 37 stalest r8-era rows fill the
# 50-query sample (the 9 spillover r8 rows lead the r13 sample).
# Queries with a green hash-match row in CORRECTNESS_r12.json (all 50
# of round 12's driver sample were green, including all 13 of
# _CHANGED_R12 — the round-12 argmin/fused-backtest/Arrow-shingling
# tier, now folded in — and the 37 stalest r8-era rows the rotation
# surfaced; after this fold the stalest tier is the 9 remaining
# r8-era rows, which lead the r13 sample).
_R12_CHECKED = frozenset({
    "agg_grouping_sets", "agg_percentiles", "agg_pivot", "agg_rollup",
    "agg_unpivot", "asof_join_cogrouped_purchase",
    "asof_join_last_purchase", "clustering_eval_purity",
    "dedup_cc_star", "dedup_connected_components", "dedup_containment",
    "dedup_containment_incremental", "dedup_containment_index_serve",
    "dedup_ngram_jaccard", "dedup_semdedup", "dedup_simhash_combi",
    "dedup_simhash_incremental", "dedup_simhash_index_serve",
    "dedup_survivors", "dq_orders_report", "embedding_pq_codes",
    "f1_epoch_roundtrip", "f4_base64_json", "f5_json_encode_size",
    "f6_json_extract", "f7_f8_scalar_math", "flagship_tx_window_1min",
    "forecast_backtest_rmse_wql", "j2_positional_zip",
    "join_3way_brand_nation", "join_anti_no_big_orders",
    "join_left_order_counts", "join_orders_customer_segment",
    "join_salted_skew", "join_semi_big_spenders",
    "kmeans_embedding_clusters", "metrics_rmse_wql", "o2_topk_orders",
    "p1_dedup_keep_first", "passage_dedup_spans",
    "passage_dedup_spans_join", "range_join_attribution",
    "s10_latest_per_key", "scd2_price_history", "sim_search_ivf_kmeans",
    "sim_search_ivfpq", "sim_search_ivfpq_index_update",
    "sim_search_ivfpq_rerank", "sim_search_ivfpq_sampled",
    "sim_search_ivfpq_serve",
})

# Queries whose Spark implementation changed in round 13 (optimization
# round 2) in a way the driver should re-certify:
#
# - the IVF-PQ family: the m per-subspace kmeans trainings now run
#   FUSED in one Lloyd chain per iteration over the posexploded
#   (s, subvector) frame (operators/similarity.py _pq_train_all,
#   guide §2.2 — m-fold fewer stages/broadcasts per build), the PQ
#   codes are stored WIDE (one (id, codes array) row per vector), and
#   the query-time ADC reads a per-query broadcast lookup MAP with
#   element_at instead of joining candidates x m code rows against a
#   LUT frame and re-aggregating (guide §3.1). Bit-identical by
#   construction (same argmin candidates/tie-breaks, same integer-
#   scaled means, same decimal sum of the same 6dp entries) — parity
#   pinned in tests/test_round13_plans.py, oracle-verified at
#   sf0.001/0.01/0.1 this round; plans/r13 has the before/after plans
#   (sim_search_ivfpq Exchange 192 -> 86, embedding_pq_codes 80 -> 20).
#
# - the containment/ngram verify joins: shuffle_hash instead of
#   sort-merge (merge hints / planner default) so the array-carrying
#   shingle side streams without the sort whose buffers were the
#   measured 3.8 GB 100x spill class (guide §3.1/§5). Join semantics
#   unchanged — candidates and verification math untouched.
#
# - the minhash-LSH / embedding-LSH verify and member-expansion
#   joins: same shuffle_hash treatment (wash-to-small-win at 100x,
#   same spill-class immunity) — and on dedup_minhash_lsh the sf0.1
#   plan previously STATICALLY BROADCAST the post-UDF signature frame
#   (the round-7 broadcast-audit OOM class with no hint in place);
#   the hint closes that scale hazard (plans/r13 before: 0 SMJ/0 SHJ,
#   broadcast verify; after: 4 ShuffledHashJoin).
_CHANGED_R13 = frozenset({
    "sim_search_ivfpq", "sim_search_ivfpq_rerank",
    "sim_search_ivfpq_sampled", "sim_search_ivfpq_index_update",
    "sim_search_ivfpq_serve", "embedding_pq_codes",
    "dedup_containment", "dedup_containment_incremental",
    "dedup_containment_index_serve", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_incremental_lsh",
    "dedup_embedding_cosine",
})

_ROUNDS: tuple[tuple[int, frozenset], ...] = (
    (1, _R1_CHECKED), (2, _R2_CHECKED), (3, _R3_CHECKED),
    (4, _R4_CHECKED), (5, _R5_CHECKED), (6, _R6_CHECKED),
    (7, _R7_CHECKED), (8, _R8_CHECKED), (9, _R9_CHECKED),
    (10, _R10_CHECKED), (11, _R11_CHECKED), (12, _R12_CHECKED),
)

# name -> most recent round with a green driver row (absent = never).
_LAST_GREEN: dict[str, int] = {}
for _rnd, _names in _ROUNDS:
    for _n in _names:
        _LAST_GREEN[_n] = _rnd

_DRIVER_CHECKED = (
    frozenset(_LAST_GREEN) - _LAST_RED - _ORACLE_NEEDS_FIRST_CHECK
)


def _priority_order(specs: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Enumerate red-last-round queries first (their fix must be
    re-verified by the driver), then round-13-changed queries (their
    old green rows certify stale code), then never-driver-green
    oracled queries, then never-checked rows-only queries (their
    driver check is weaker), then queries with a green driver row
    ordered by last-green round ASCENDING (VERDICT r8 task 2: the old
    module-insertion order within this tier left dedup_minhash_lsh
    six rounds stale while newer rows were re-checked; staleness-
    first ordering drains the oldest backlog — after the r12 fold the
    stalest tier is 9 r8-era rows; round 13's 50-query sample is the
    10 changed rows + those 9 + the stalest r9-era rows, so after r13
    nothing green should predate r9).
    Within the oracled groups, flat-schema guarantees hold for every
    oracled query (see tests/test_registry.py) so the driver's pandas
    canonicalizer can hash each one."""

    def rank(item: tuple[str, QuerySpec]) -> tuple[int, int, str]:
        name, spec = item
        if name in _LAST_RED or name in _ORACLE_NEEDS_FIRST_CHECK:
            return (0, 0, name)
        if name in _CHANGED_R13:
            return (1, 0, name)
        if name in _DRIVER_CHECKED:
            return (4, _LAST_GREEN[name], name)
        if spec.oracle is None:
            return (3, 0, name)
        return (2, 0, name)

    return dict(sorted(specs.items(), key=rank))


def all_specs() -> dict[str, QuerySpec]:
    # Imports are local so a syntax error in one group is debuggable
    # without killing the whole registry import path.
    from . import reference_queries

    specs: dict[str, QuerySpec] = {}
    for module in (reference_queries,):
        overlap = specs.keys() & module.SPECS.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        specs.update(module.SPECS)
    try:
        from . import relational_queries

        specs.update(relational_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import timeseries_queries

        specs.update(timeseries_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import tpch_queries

        specs.update(tpch_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import extension_queries

        specs.update(extension_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import streaming_queries

        specs.update(streaming_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import training_queries

        specs.update(training_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import quality_queries

        specs.update(quality_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import profiling_queries

        specs.update(profiling_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import tpch_partsupp

        specs.update(tpch_partsupp.SPECS)
    except ImportError:
        pass
    try:
        from . import curation_queries

        specs.update(curation_queries.SPECS)
    except ImportError:
        pass
    return _priority_order(specs)
