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
    # Mechanically derived at the round-9 window build: `python
    # tools/verification_state.py front` after the r08 promote (zero
    # roll-over — all 50 r8 rows verified) and the datapipe17
    # publication. Debt-prefix policy (tests/test_verification_state
    # .py): positions 1-9 the datapipe17 publication (never
    # driver-verified); positions 10-22 the 13-name r2 currency tail
    # (hash-unchanged since their rows — currency debt, not
    # correctness doubt; VERDICT r8 #2 lists them); positions 23-50
    # drain the r3 backlog oldest-first. This round's closure edits
    # (nest.py broadcast-hint removal, graph_metrics modularity
    # membership, datapipe20 ADVICE fixes) staled ZERO published
    # names — the tool confirmed no hash-stale entries. Positions
    # 51+ are the rest of the registry oldest-verified-round first.
    "tx_char_entropy_quality",
    "ev_survival_km",
    "ds_curriculum_interleave",
    "graph_hits_scores",
    "ev_peak_concurrency",
    "graph_type_affinity",
    "tx_vocab_growth_curve",
    "ev_dau_wau_stickiness",
    "ds_stochastic_round_resample",
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
