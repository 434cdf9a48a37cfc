"""Data-selection importance weights (DSIR — Xie et al. 2023,
arXiv:2302.03169): score every raw-pool document by how target-like it
is under hashed n-gram unigram/bigram feature distributions, so a
curation pipeline can importance-resample a 100 TB crawl toward a
small high-quality target corpus WITHOUT running a neural classifier
over every document.

Formulation (the paper's, made engine-exact):

    features(d)   = hashed bigrams of d (md5 mod ``n_buckets``)
    p_t[b], p_r[b] = add-one-smoothed bucket probabilities under the
                     target / raw corpora
    log w(d)      = Σ_{b ∈ features(d)}  ln(p_t[b] / p_r[b])

Engine determinism: each per-feature log ratio is ``round(ln(x), 6)``
(the package's libm convention — ln differs in the last ulp across
libms; at 6 dp both engines round identically), and the per-document
sum accumulates the ROUNDED terms in DECIMAL(38,6), which is
associative — no partitioning or engine can reorder its value.

Scale shape — why this works at 100 TB where a classifier doesn't:
- The feature space is FIXED (``n_buckets`` rows, default 1024): both
  distribution tables aggregate with map-side partial combine down to
  ≤ n_buckets rows regardless of corpus size, then BROADCAST to the
  scoring join — the raw corpus never shuffles to meet them.
- Scoring = one explode of the corpus bigram stream + a broadcast hash
  join + one per-doc re-aggregate (single shuffle on doc id, map-side
  combined). Nothing in the plan grows with target-corpus size.
- The smoothed ratio table is computed ONCE from two scalar totals
  (broadcast one-row frames), so adding target corpora is free.

No counterpart in the reference (clinical ETL); this is a
training-data-pipeline primitive per the engine brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.operators.lm import _bigrams


def _feature_stream(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """(doc, bucket) — one row per bigram occurrence, bucket = portable
    32-bit md5-prefix hash (8 hex chars) of 'w1 w2' mod n_buckets (the
    fe_hashing_trick convention, bigram-keyed)."""
    big = _bigrams(df, text_col, id_col)
    return big.select(
        "doc",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", "w1", "w2")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR log importance weight over the raw pool.

    Returns (id, n_feats, log_weight): ``log_weight`` is the decimal
    sum of 6-dp-rounded per-feature ln(p_target/p_raw); positive =
    more target-like than the pool average. Documents with < 2 tokens
    have no features and are omitted (no evidence either way — the
    same contract as bigram_lm_scores).

    Resampling downstream is ``ds_mixture_weighted_sample`` /
    Gumbel-top-k on ``log_weight``; this operator only produces the
    weights so the (cheap) scoring pass and the (policy-laden)
    sampling pass stay independent.
    """
    from pyspark import StorageLevel

    # Evaluation-count discipline (r11): unpersisted, the raw feature
    # stream ran THREE times (bucket counts, the totals' re-evaluation
    # of the counts, final scoring join) and the target stream twice —
    # 5 corpus tokenizations per call. Persist the compact (doc,
    # bucket) stream (two longs per bigram occurrence — far narrower
    # than the text it came from) and the ≤ n_buckets-row count
    # tables; each corpus is now tokenized exactly once.
    raw_feats = _feature_stream(raw, text_col, id_col, n_buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tgt_feats = _feature_stream(target, text_col, id_col, n_buckets)

    # Bucket count tables: ≤ n_buckets rows each after map-side combine.
    raw_counts = (
        raw_feats.groupBy("bucket")
        .agg(F.count("*").alias("cr"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tgt_counts = (
        tgt_feats.groupBy("bucket")
        .agg(F.count("*").alias("ct"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    raw_total = raw_counts.agg(F.sum("cr").alias("nr"))
    tgt_total = tgt_counts.agg(F.sum("ct").alias("nt"))

    # Full bucket domain so unseen-on-one-side buckets still smooth:
    # p = (c + 1) / (N + B). The ratio table is tiny and broadcast.
    buckets = raw.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    ratios = (
        buckets.join(raw_counts, "bucket", "left")
        .join(tgt_counts, "bucket", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("nt") + n_buckets).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")
                        / (F.col("nr") + n_buckets).cast("double")
                    )
                ),
                6,
            ).alias("log_ratio"),
        )
    )
    return (
        raw_feats.join(F.broadcast(ratios), "bucket")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(
                F.sum(F.col("log_ratio").cast("decimal(38,6)")).cast("double"),
                6,
            ).alias("log_weight"),
        )
        .select(F.col("doc").alias(id_col), "n_feats", "log_weight")
    )
