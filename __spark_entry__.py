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

# Round 4 clears the driver-verification debt (VERDICT r3 #1): the
# driver caps a round at 50 correctness rows, so positions 1-40 are
# EXACTLY the 40 names owed a driver row — 32 round-3 additions that
# were never driver-verified (past the r03 cap) followed by the 8
# whose implementation changed after their last row (the text.py
# shingle let-binding, commit 821bb17, and the clinical fixture
# staging cache, c81f6d1). Positions 41-48 are names whose plans
# changed THIS round (see the block comment below), then
# re-confirmations of the oldest green rows.
# tools/verification_state.py maintains the stale set mechanically
# from committed plan/source hashes.
_FRONT = [
    # -- never driver-verified (round-3 additions past the r03 cap) --
    "agg_modern_functions",
    "ev_markov_transitions",
    "etl_merge_upsert",
    "ds_dsir_logweights",
    "sk_hll_users",
    "graph_adamic_adar",
    "ann_topk_pq_adc",
    "tx_ccnet_buckets",
    "sk_hll_users_by_type",
    "ev_resample_ffill",
    "emb_hard_negatives",
    "ev_cusum_drift",
    "sk_hll_union_intersection",
    "pf_psi_totalprice_drift",
    "ds_softdedup_weights",
    "tx_vocab_coverage",
    "ev_trend_daily",
    "ds_pps_systematic_sample",
    "ds_quality_budget_select",
    "ds_temperature_mixture",
    "tx_inverted_index",
    "tx_bpe_first_merges",
    "emb_label_noise_scores",
    "graph_label_propagation",
    "fe_winsorize_totalprice",
    "mb_association_rules",
    "pf_ks_totalprice_drift",
    "pf_benford_totalprice",
    "tx_source_kl_divergence",
    "tx_source_vocab_overlap",
    "tx_zipf_fit",
    "emb_centroid_separation",
    # -- stale: code changed after their last driver row -------------
    "dd_ngram_jaccard_pairs",
    "tx_fingerprints",
    "tx_cms_heavy_hitters",
    "tx_tfidf_term_stats",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "ds_chunk_documents",
    "pipe_clinical_e2e",
    # -- changed or added in round 4 ---------------------------------
    # (positions 41-50: plan or semantics changed this round — the rfm
    # global-rank quartiles, the judge-requested banded miner, the
    # q11/q15 scalar-broadcast rewrites, the PPJoin length+positional
    # filters, and the consumers of the global_rank/global_cumsum
    # persist fix — the two-job range-boundary consistency bug found
    # by the r4 tie-skew stress test)
    "ev_rfm_segments",
    "emb_hard_negatives_banded",
    "q11_important_part_value",
    "q15_top_supplier",
    "ds_deterministic_shuffle",
    "ds_interleave_sources",
    "ds_per_group_sample",
    "pf_equidepth_nchars_by_lang",
    # position 49: ppjoin gained the length + positional filters this
    # round (plan change -> fresh row needed)
    "dd_ppjoin_pairs",
    # position 50: the 9th consumer of the global_rank/global_cumsum
    # persist fix (672274b) — the other 8 are already above
    "pf_profile_orders",
    # -- re-confirmation of previously-green rows, oldest first (the
    #    driver cap fills remaining slots from here in order) --------
    "q5_local_supplier_volume",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "dd_exact_fingerprint_groups",
    "dd_duplicate_clusters",
    "ann_topk_bruteforce",
    "dd_embedding_cosine_pairs",
    "dd_minhash_lsh_candidates",
    "dd_minhash_verified_pairs",
    "dd_simhash_near_pairs",
    "dd_fuzzy_name_pairs",
    "dd_semantic_prune",
    "dd_span_dedup",
    "dd_canonical_per_cluster",
    "dd_tfidf_cosine_pairs",
    "ann_topk_lsh",
    "ann_topk_lsh_multiprobe",
    "ann_topk_ivf",
    "emb_pq_codes",
    "emb_label_centroids",
    "emb_quantize_int8",
    "mm_media_features",
    "mm_media_meta",
    "mm_png_header_roundtrip",
    "tx_c4_rule_filter",
    "tx_pii_redaction",
    "tx_top_bigrams",
    "tx_pmi_bigrams",
    "tx_bigram_lm_score",
    "tx_novelty_score",
    "tx_quality_features",
    "tx_language_id",
    "tx_token_counts_by_source",
    "tx_winnowing_fingerprints",
    "tx_sentences_udtf",
    "tx_quality_quantile_filter",
    "tx_quality_calibrated_udf",
    "tx_repetition_metrics",
    "pf_expect_orders",
    "pf_histogram_totalprice",
    "fe_hashing_trick",
    "fe_zscore_by_lang",
    "ds_train_val_split",
    "ds_stratified_sample",
    "ds_mixture_weighted_sample",
    "sk_linear_count_users",
    "etl_snapshot_diff",
    "etl_incremental_rollup",
    "etl_keep_latest_event",
    "etl_scd2_customer_merge",
    "graph_pagerank_coparts",
    "graph_triangle_counts",
    "ev_json_props",
    "ev_variant_props",
    "ev_tumbling_hourly",
    "ev_sessionize",
    "ev_hopping_halfhour",
    "ev_funnel_transitions",
    "ev_top3_users_per_type",
    "ev_moving_avg_3",
    "ev_weekly_retention",
    "ev_anomaly_robust_z",
    "ev_range_frame_hourly_avg",
    "ev_group_order_stats_pandas",
    "ev_asof_purchase_view",
    "ev_range_error_near_signup",
    "ev_stream_left_outer_join",
    "ev_tumbling_hourly_stream",
    "ev_stream_dedup_keys",
    "ev_stream_view_purchase_join",
    "ev_stream_enrich_static",
    "ev_stream_hopping_halfhour",
    "ev_stream_session_windows",
    "ev_stream_stateful_totals",
    "agg_grouping_sets_mix",
    "agg_cube_priority_status",
    "agg_unpivot_order_metrics",
    "set_intersect_except_buyers",
    "ops_global_sort_daily",
    "ops_zorder_orders",
    "j_bloom_filtered_join",
    "sql_recursive_supplier_tree",
    "sql_scalar_udf_revenue",
    "ret_bm25_topk",
    "ret_hybrid_rrf",
    "src_pysource_docs_stats",
    "pipe_customer_document",
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
