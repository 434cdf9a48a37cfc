"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` publish the full named-query registry
from cqdg_etl_spark.queries (one entry per implemented operator from
SURVEY.md §2 plus the training-data operators). Queries without a
SQL-expressible semantics (e.g. LSH banding) omit the oracle entry and
get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cqdg_etl_spark.queries import REGISTRY

# Driver correctness-row ordering. The driver caps a round at 50 rows,
# so _FRONT position is the publication priority.
_FRONT = [
    # Mechanically derived at the round-8 window build (second
    # session): `python tools/verification_state.py front` after the
    # r07 promote (zero roll-over — all 50 r7 rows verified), the
    # datapipe16 publication, and this round's bundled broadcast-hint
    # audit. Debt-prefix policy (tests/test_verification_state.py):
    # positions 1-5 the datapipe16 publication (never
    # driver-verified); positions 6-14 the nine names staled by the
    # corpus-sized-broadcast closure edits (retrieval.py dl,
    # sparse_sim.py norms, quality.py component map — values
    # re-oracle-checked, plans intentionally changed); positions
    # 15-50 drain the r1/r2 backlog oldest-first (36 slots; COVERAGE
    # round-8 delta restates the SLA arithmetic: backlog 50 -> 14,
    # round 9 clears the tail alongside the datapipe17 publication).
    # Positions 51+ are the rest of the registry
    # oldest-verified-round first.
    "ann_topk_ivf_pq_rerank",
    "dd_minhash_calibration",
    "dd_dup_cluster_size_profile",
    "pf_robust_zscore_event_value",
    "tx_source_js_divergence",
    "tx_repetition_metrics",
    "tx_c4_rule_filter",
    "tx_pii_redaction",
    "dd_canonical_per_cluster",
    "dd_tfidf_cosine_pairs",
    "ret_bm25_topk",
    "ret_hybrid_rrf",
    "pipe_corpus_curation_e2e",
    "emb_topk_recall_eval",
    "f9_truthy_conversion_flag",
    "p7_null_default_status",
    "f13_monthly_order_buckets",
    "w1_top_order_per_customer",
    "w2_running_customer_spend",
    "j1_hash_id_resolution",
    "j3_theta_left_lookup",
    "a4_first_per_group",
    "f2_f11_display_wrap",
    "f7_array_contains_tokens",
    "u1_age_years",
    "j_salted_skew_join",
    "agg_exact_percentiles",
    "agg_cube_priority_status",
    "set_intersect_except_buyers",
    "agg_unpivot_order_metrics",
    "ops_global_sort_daily",
    "j_bloom_filtered_join",
    "ops_zorder_orders",
    "ev_tumbling_hourly",
    "ev_sessionize",
    "ev_hopping_halfhour",
    "ev_funnel_transitions",
    "ev_top3_users_per_type",
    "ev_moving_avg_3",
    "ev_weekly_retention",
    "ev_anomaly_robust_z",
    "ev_tumbling_hourly_stream",
    "ev_stream_dedup_keys",
    "ev_stream_view_purchase_join",
    "ev_stream_enrich_static",
    "ev_stream_hopping_halfhour",
    "ev_stream_session_windows",
    "ev_stream_stateful_totals",
    "pipe_customer_document",
    "ev_asof_purchase_view",
    "ev_range_error_near_signup",
    "etl_scd2_customer_merge",
    "tx_quality_features",
    "tx_language_id",
    "tx_token_counts_by_source",
    "tx_winnowing_fingerprints",
    "mm_media_meta",
    "ds_train_val_split",
    "ds_stratified_sample",
    "tx_quality_quantile_filter",
    "tx_quality_calibrated_udf",
    "mm_png_header_roundtrip",
    "tx_sentences_udtf",
    "q9_profit_by_nation_year",
    "ev_stream_left_outer_join",
    "sql_recursive_supplier_tree",
    "sql_scalar_udf_revenue",
    "mm_media_features",
    "pf_expect_orders",
    "tx_top_bigrams",
    "pf_histogram_totalprice",
    "ds_mixture_weighted_sample",
    "tx_bigram_lm_score",
    "ev_json_props",
    "graph_pagerank_coparts",
    "graph_triangle_counts",
    "agg_grouping_sets_mix",
    "ev_range_frame_hourly_avg",
    "ev_group_order_stats_pandas",
    "fe_hashing_trick",
    "etl_snapshot_diff",
    "etl_incremental_rollup",
    "etl_keep_latest_event",
    "sk_linear_count_users",
    "ev_variant_props",
    "src_pysource_docs_stats",
    "tx_pmi_bigrams",
    "fe_zscore_by_lang",
    "q15_top_supplier",
    "q11_important_part_value",
    "ev_rfm_segments",
    "pipe_clinical_e2e",
    "graph_label_propagation",
    "fe_winsorize_totalprice",
    "mb_association_rules",
    "pf_ks_totalprice_drift",
    "pf_benford_totalprice",
    "tx_fingerprints",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "tx_cms_heavy_hitters",
    "ds_chunk_documents",
    "pf_profile_orders",
    "ds_deterministic_shuffle",
    "ds_interleave_sources",
    "ds_per_group_sample",
    "pf_equidepth_nchars_by_lang",
    "agg_modern_functions",
    "ev_markov_transitions",
    "etl_merge_upsert",
    "ds_dsir_logweights",
    "sk_hll_users",
    "graph_adamic_adar",
    "tx_ccnet_buckets",
    "sk_hll_users_by_type",
    "ev_resample_ffill",
    "ev_cusum_drift",
    "sk_hll_union_intersection",
    "pf_psi_totalprice_drift",
    "tx_vocab_coverage",
    "ev_trend_daily",
    "ds_pps_systematic_sample",
    "ds_quality_budget_select",
    "ds_temperature_mixture",
    "tx_inverted_index",
    "tx_bpe_first_merges",
    "tx_source_kl_divergence",
    "ann_topk_gemm",
    "emb_covariance_cells",
    "pf_key_skew_profile",
    "ev_conversion_latency_quantiles",
    "fe_target_encoding_loo",
    "ds_shard_assignment",
    "sql_pipe_syntax_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q21_last_shipper",
    "q2_min_cost_supplier",
    "q16_supplier_part_variety",
    "q20_heavy_shippers",
    "j2_left_join_order_counts",
    "j5_full_outer_summary_merge",
    "j6_cross_domain_zero_fill",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_lsh_multiprobe",
    "ann_topk_ivf",
    "emb_label_centroids",
    "emb_quantize_int8",
    "emb_pq_codes",
    "ann_topk_pq_adc",
    "emb_hard_negatives",
    "emb_hard_negatives_banded",
    "emb_label_noise_scores",
    "tx_source_vocab_overlap",
    "tx_zipf_fit",
    "dd_paragraph_dedup",
    "ds_length_buckets",
    "tx_langid_eval_confusion",
    "mm_mp4_demux_stats",
    "ds_waterfill_budget",
    "graph_kcore_peel",
    "sql_group_by_all_lateral",
    "emb_dim_variance_topk",
    "j_semi_anti_customers",
    "a1_nest_orders_per_customer",
    "a2_collect_set_segments",
    "a3_count_distinct_customers",
    "a7_array_normalize_months",
    "a6_distinct_union_nations",
    "agg_rollup_status_priority",
    "agg_pivot_status",
    "f1_business_key_hash",
    "f3_split_explode_tokens",
    "f5_regexp_extract_priority",
    "f6_rlike_part_filter",
    "dd_exact_fingerprint_groups",
    "dd_ngram_jaccard_pairs",
    "dd_minhash_lsh_candidates",
    "dd_simhash_near_pairs",
    "dd_embedding_cosine_pairs",
    "dd_duplicate_clusters",
    "tx_tfidf_term_stats",
    "dd_minhash_verified_pairs",
    "dd_semantic_prune",
    "dd_span_dedup",
    "dd_fuzzy_name_pairs",
    "dd_ppjoin_pairs",
    "tx_novelty_score",
    "ds_softdedup_weights",
    "emb_centroid_separation",
    "dd_cross_source_leakage",
    "dd_containment_pairs",
    "ds_cluster_safe_split",
    "dd_lsh_recall_eval",
    "ev_ewma_smoothed",
    "dd_truncation_prefix_pairs",
    "tx_syllable_complexity",
    "tx_shingle_novelty",
    "ev_seasonal_outliers",
    "ds_stratified_kfold",
    "ds_weighted_sample_wor",
    "ds_rendezvous_rebalance",
    "graph_personalized_pagerank",
    "dd_lsh_param_audit",
    "tx_bpe_pretoken_stats",
    "ev_strict_funnel_3step",
    "emb_intra_class_dispersion",
]


def _ordered_names() -> list[str]:
    front = [n for n in _FRONT if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    return front + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 star join) on /root/testdata/sf0.001."""
    return REGISTRY["q5_local_supplier_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
