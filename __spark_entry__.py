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

# Rounds 1+2 driver CORRECTNESS covered 100/116 registry names (the
# driver caps a round at 50). Round 3 front-loads the 16 names that
# have never had a driver row (positions 1-16), then q9 — the one
# query whose implementation changed after its r01 row (de-vacuated
# '%green%'→'%red%' in round 2) — then the rest of the registry so the
# remaining ~33 slots re-confirm previously-green names.
_FRONT = [
    # -- never driver-verified (r01+r02 capped them out) ------------
    "dd_minhash_lsh_candidates",
    "dd_minhash_verified_pairs",
    "dd_simhash_near_pairs",
    "ann_topk_lsh",
    "ann_topk_lsh_multiprobe",
    "ann_topk_ivf",
    "mm_media_features",
    "tx_c4_rule_filter",
    "tx_pii_redaction",
    "dd_canonical_per_cluster",
    "tx_top_bigrams",
    "pf_profile_orders",
    "pf_expect_orders",
    "emb_label_centroids",
    "pf_histogram_totalprice",
    "emb_quantize_int8",
    # -- changed since its last driver row --------------------------
    "q9_profit_by_nation_year",
    # -- new in round 3 (never driver-verified) ---------------------
    "dd_semantic_prune",
    "ds_mixture_weighted_sample",
    "tx_bigram_lm_score",
    "ev_json_props",
    "dd_span_dedup",
    "ev_stream_left_outer_join",
    "graph_pagerank_coparts",
    "dd_fuzzy_name_pairs",
    "graph_triangle_counts",
    "agg_grouping_sets_mix",
    "ev_range_frame_hourly_avg",
    "ev_group_order_stats_pandas",
    "ds_deterministic_shuffle",
    "fe_hashing_trick",
    "etl_snapshot_diff",
    "etl_incremental_rollup",
    "dd_tfidf_cosine_pairs",
    "ds_interleave_sources",
    "emb_pq_codes",
    "etl_keep_latest_event",
    "ds_per_group_sample",
    "sk_linear_count_users",
    "ev_variant_props",
    "src_pysource_docs_stats",
    "sql_recursive_supplier_tree",
    "sql_scalar_udf_revenue",
    "ret_bm25_topk",
    "ret_hybrid_rrf",
    "dd_ppjoin_pairs",
    "tx_pmi_bigrams",
    "pf_equidepth_nchars_by_lang",
    "fe_zscore_by_lang",
    "tx_novelty_score",
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
    "sk_hll_union_intersection",
    "tx_source_kl_divergence",
    "tx_source_vocab_overlap",
    "tx_zipf_fit",
    "emb_centroid_separation",
    # -- implementation changed in round 3 (word_shingles/char_ngrams
    #    let-binding + chunk_documents materialization touched every
    #    shingle/chunk-based plan; values identical, but the driver row
    #    is the hard signal) — re-queued per VERDICT r2 #2 ------------
    "tx_tfidf_term_stats",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "ds_chunk_documents",
    "tx_cms_heavy_hitters",
    "tx_fingerprints",
    # -- re-confirmation of previously-green rows (driver cap fills
    #    the remaining slots from here in order) --------------------
    "dd_embedding_cosine_pairs",
    "dd_ngram_jaccard_pairs",
    "dd_exact_fingerprint_groups",
    "dd_duplicate_clusters",
    "ann_topk_bruteforce",
    "pipe_clinical_e2e",
    "pipe_customer_document",
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
    "ev_rfm_segments",
    "ev_anomaly_robust_z",
    "ev_tumbling_hourly_stream",
    "ev_stream_dedup_keys",
    "ev_stream_view_purchase_join",
    "ev_stream_enrich_static",
    "ev_stream_hopping_halfhour",
    "ev_stream_session_windows",
    "ev_stream_stateful_totals",
    "ev_asof_purchase_view",
    "ev_range_error_near_signup",
    "etl_scd2_customer_merge",
    "tx_quality_features",
    "tx_language_id",
    "tx_token_counts_by_source",
    "tx_fingerprints",
    "tx_winnowing_fingerprints",
    "tx_cms_heavy_hitters",
    "tx_sentences_udtf",
    "mm_media_meta",
    "tx_tfidf_term_stats",
    "ds_train_val_split",
    "ds_stratified_sample",
    "ds_decontaminate_vs_benchmark",
    "ds_pack_sequences",
    "ds_chunk_documents",
    "tx_quality_quantile_filter",
    "tx_quality_calibrated_udf",
    "mm_png_header_roundtrip",
    "tx_repetition_metrics",
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
