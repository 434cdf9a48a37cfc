"""Round-3 batch 4: grouped HLL cardinality, gap-filled forward-fill
resampling, contrastive hard-negative mining, and CUSUM drift
detection.

Oracle conventions as per the package: portable md5 hashes, exact
dyadic float sums where order-independence matters, pinned op
SEQUENCES (sort + left-to-right recurrence) where it can't, round(·, 6)
on cosines and round(·, 2) on sketch estimates, total-order
tiebreakers on every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import _sql_cos
from cqdg_etl_spark.queries.registry import load, query

_HLL_M = 256  # p=8

# ------------------------------------------------- grouped HLL


@query(
    "sk_hll_users_by_type",
    tags=("datapipe", "sketch", "cardinality"),
    oracle=f"""
        WITH h AS (
          SELECT event_type,
                 CAST(('0x' || substring(md5('hll'
                   || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM events
        ),
        r AS (
          SELECT event_type, h % {_HLL_M} AS reg,
                 (h // {_HLL_M}) % 4294967296 AS hsfx
          FROM h
        ),
        rho AS (
          SELECT event_type, reg,
                 CASE WHEN hsfx = 0 THEN 33
                      ELSE 33 - length(format('{{:b}}', hsfx))
                 END AS rho
          FROM r
        ),
        regs AS (
          SELECT event_type, reg, max(rho) AS mx
          FROM rho GROUP BY event_type, reg
        ),
        agg AS (
          SELECT event_type,
                 sum(CAST(1.0 AS DOUBLE)
                     / CAST(1::BIGINT << mx AS DOUBLE)) AS sp,
                 count(*) AS np
          FROM regs GROUP BY event_type
        ),
        est AS (
          SELECT event_type,
                 sp + CAST({_HLL_M} - np AS DOUBLE) AS s,
                 {_HLL_M} - np AS n_zero
          FROM agg
        )
        SELECT event_type, {_HLL_M} AS m, CAST(n_zero AS BIGINT) AS n_zero,
               round(CASE WHEN (CAST(0.7213 AS DOUBLE)
                        / (CAST(1.0 AS DOUBLE)
                           + CAST(1.079 AS DOUBLE) / {_HLL_M}.0))
                       * {_HLL_M}.0 * {_HLL_M}.0 / s <= {2.5 * _HLL_M}
                      AND n_zero > 0
                     THEN {_HLL_M}.0 * ln({_HLL_M}.0
                                          / CAST(n_zero AS DOUBLE))
                     ELSE (CAST(0.7213 AS DOUBLE)
                           / (CAST(1.0 AS DOUBLE)
                              + CAST(1.079 AS DOUBLE) / {_HLL_M}.0))
                          * {_HLL_M}.0 * {_HLL_M}.0 / s
                END, 2) AS estimate
        FROM est
    """,
)
def sk_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user HLL (p=8) via the grouped sketch
    cascade (operators/sketches.py::hll_grouped): absent registers are
    never materialized — their harmonic contribution (1.0 each) and
    zero-count (m − n_present) fall out of the present-register
    aggregate alone, so the plan is two shrinking shuffles with no
    per-group register densification. The mergeable grouped-cardinality
    shape for millions of groups at 100 TB."""
    from cqdg_etl_spark.operators.sketches import hll_grouped

    ev = load(spark, sf_dir, "events")
    return hll_grouped(ev, "event_type", "user_id", p=8)


# --------------------------------------- gap-fill + forward fill


@query(
    "ev_resample_ffill",
    tags=("events", "temporal", "resample"),
    oracle="""
        WITH obs AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket_ts, value,
                 row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
          WHERE event_type = 'purchase' AND user_id % 5 = 0
        ),
        o AS (SELECT user_id, bucket_ts, value FROM obs WHERE rn = 1),
        b AS (
          SELECT user_id, min(bucket_ts) AS mn, max(bucket_ts) AS mx
          FROM o GROUP BY user_id
        ),
        grid AS (
          SELECT user_id,
                 unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                   AS bucket_ts
          FROM b
        ),
        j AS (
          SELECT g.user_id, g.bucket_ts, o.value
          FROM grid g LEFT JOIN o
            ON o.user_id = g.user_id AND o.bucket_ts = g.bucket_ts
        )
        SELECT user_id,
               strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_hour,
               last_value(value IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value
        FROM j
    """,
)
def ev_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled purchase-value series per sampled user
    (user_id % 5 = 0), forward-filled — pandas ``resample().ffill()``
    semantics as a distributed operator (operators/temporal.py::
    resample_ffill). The fact is read once; the dense grid is
    sequence()-generated, never shuffled from the fact."""
    from cqdg_etl_spark.operators.temporal import resample_ffill

    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0)
    )
    out = resample_ffill(
        ev, "user_id", "ts", "value", step="1 hour",
        tiebreak_cols=["event_id"],
    )
    # package convention: timestamps cross the oracle boundary as
    # formatted strings (pandas ns- vs us-precision dtypes differ)
    return out.select(
        "user_id",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_hour"
        ),
        "value",
    )


# ------------------------------------- contrastive hard negatives


@query(
    "emb_hard_negatives",
    tags=("datapipe", "ann", "training"),
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                          embedding AS qe
                   FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                          embedding AS ce
                   FROM embeddings WHERE vec_id >= 10),
             scored AS (
               SELECT query_id, query_label, neighbor_id, neighbor_label,
                      {_sql_cos('qe', 'ce')} AS cos
               FROM q CROSS JOIN c
               WHERE query_label <> neighbor_label
             )
        SELECT query_id, query_label, neighbor_id, neighbor_label,
               rank, round(cos, 6) AS cos
        FROM (SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
              ) AS rank FROM scored)
        WHERE rank <= 3
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: top-3
    most-cosine-similar OTHER-label corpus vectors per query vector
    (operators/similarity.py::hard_negatives) — label filter before
    the rank window, broadcast query side, per-side norm projections."""
    from cqdg_etl_spark.operators.similarity import hard_negatives

    emb = load(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        k=3,
    )


def _sql_hard_negatives_banded(k: int = 3, min_cos: float = 0.0) -> str:
    """DuckDB oracle for the banded corpus×corpus miner: reuses the
    bit-exact banded-pair construction from datapipe._sql_banded_cosine_pairs
    (same ±1 hyperplanes, fold order, band packing), symmetrizes the
    undirected pairs, then label filter + rank window — mirroring
    operators/similarity.hard_negatives_banded clause for clause."""
    from cqdg_etl_spark.queries.datapipe import _sql_banded_cosine_pairs

    return f"""
        WITH pairs AS ({_sql_banded_cosine_pairs(min_cos)}),
        sym AS (
          SELECT doc_a AS query_id, doc_b AS neighbor_id, cos FROM pairs
          UNION ALL
          SELECT doc_b AS query_id, doc_a AS neighbor_id, cos FROM pairs
        ),
        scored AS (
          SELECT s.query_id, ql.label AS query_label,
                 s.neighbor_id, nl.label AS neighbor_label, s.cos
          FROM sym s
          JOIN embeddings ql ON ql.vec_id = s.query_id
          JOIN embeddings nl ON nl.vec_id = s.neighbor_id
          WHERE ql.label <> nl.label
        )
        SELECT query_id, query_label, neighbor_id, neighbor_label,
               rank, cos
        FROM (SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
              ) AS rank FROM scored)
        WHERE rank <= {k}
    """


@query(
    "emb_hard_negatives_banded",
    tags=("datapipe", "ann", "training"),
    oracle=_sql_hard_negatives_banded(),
)
def emb_hard_negatives_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus×corpus hard-negative mining, 100-TB shape
    (operators/similarity.py::hard_negatives_banded): banded-SRP
    candidate pairs (equi-key shuffle hash join — no broadcast cross
    join, no BNLJ) symmetrized, label-mismatch filter, top-3 rank
    window per query over candidates only. This registers the scale
    path the brute-force ``emb_hard_negatives`` docstring prescribes
    (VERDICT r3 #6)."""
    from cqdg_etl_spark.operators.similarity import hard_negatives_banded

    emb = load(spark, sf_dir, "embeddings")
    return hard_negatives_banded(emb, k=3)


# ----------------------------------------------- CUSUM drift


_CUSUM_TARGET = 60.0
_CUSUM_H = 500.0


@query(
    "ev_cusum_drift",
    tags=("events", "anomaly", "stateful"),
    oracle=f"""
        WITH RECURSIVE ordered AS (
          SELECT user_id, value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events WHERE event_type = 'purchase'
        ),
        cusum AS (
          SELECT user_id, rn,
                 greatest(CAST(0.0 AS DOUBLE),
                          (CAST(0.0 AS DOUBLE) + value)
                          - CAST({_CUSUM_TARGET} AS DOUBLE)) AS s
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.user_id, o.rn,
                 greatest(CAST(0.0 AS DOUBLE),
                          (c.s + o.value)
                          - CAST({_CUSUM_TARGET} AS DOUBLE)) AS s
          FROM cusum c
          JOIN ordered o
            ON o.user_id = c.user_id AND o.rn = c.rn + 1
        )
        SELECT user_id,
               count(*) AS n_points,
               CAST(sum(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alarms,
               round(max(s), 6) AS max_s
        FROM cusum
        GROUP BY user_id
    """,
)
def ev_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection on per-user purchase values
    (target 60, alarm threshold 500) — the genuinely-sequential
    recurrence S_i = max(0, (S_{{i-1}} + x_i) − target) as a JVM
    aggregate fold (operators/pandas_ops.py::cusum_drift); the
    oracle replays the identical double-op sequence as a recursive
    CTE, so even float state hash-matches."""
    from cqdg_etl_spark.operators.pandas_ops import cusum_drift

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    out = cusum_drift(
        ev, "user_id", ["ts", "event_id"], "value",
        target=_CUSUM_TARGET, threshold=_CUSUM_H,
    )
    return out.select(
        "user_id", "n_points", "n_alarms", F.round("max_s", 6).alias("max_s")
    )


# ----------------------------------- HLL set algebra (union / ∩ est)


def _hll_est_cte(tag: str, pred: str) -> str:
    """CTE chain computing the compact-form HLL estimate for the
    user-id multiset filtered by ``pred``. The compact (no-fill) form
    equals `hll_estimate`'s densified sum exactly: both are EXACT
    dyadic double sums (order-independent for p ≤ 10), so the two
    summation shapes produce bit-identical doubles."""
    return f"""
        h_{tag} AS (
          SELECT CAST(('0x' || substring(md5('hll'
                   || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM events WHERE {pred}
        ),
        r_{tag} AS (
          SELECT h % {_HLL_M} AS reg,
                 (h // {_HLL_M}) % 4294967296 AS hsfx
          FROM h_{tag}
        ),
        regs_{tag} AS (
          SELECT reg, max(CASE WHEN hsfx = 0 THEN 33
                               ELSE 33 - length(format('{{:b}}', hsfx))
                          END) AS mx
          FROM r_{tag} GROUP BY reg
        )"""


def _hll_est_expr(tag: str) -> str:
    alpha = f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / {_HLL_M}.0))"
    return f"""
        est_{tag} AS (
          SELECT round(CASE WHEN {alpha} * {_HLL_M}.0 * {_HLL_M}.0 / s
                              <= {2.5 * _HLL_M} AND n_zero > 0
                 THEN {_HLL_M}.0 * ln({_HLL_M}.0 / CAST(n_zero AS DOUBLE))
                 ELSE {alpha} * {_HLL_M}.0 * {_HLL_M}.0 / s END, 2) AS e
          FROM (
            SELECT sum(CAST(1.0 AS DOUBLE)
                       / CAST(1::BIGINT << mx AS DOUBLE))
                     + CAST({_HLL_M} - count(*) AS DOUBLE) AS s,
                   {_HLL_M} - count(*) AS n_zero
            FROM regs_{tag}
          ) t
        )"""


@query(
    "sk_hll_union_intersection",
    tags=("datapipe", "sketch", "cardinality"),
    oracle=f"""
        WITH {_hll_est_cte('a', "event_type = 'purchase' AND value > 200")},
        {_hll_est_cte('b', "event_type = 'error' AND value > 200")},
        regs_u AS (
          SELECT reg, max(mx) AS mx FROM (
            SELECT reg, mx FROM regs_a
            UNION ALL SELECT reg, mx FROM regs_b
          ) t GROUP BY reg
        ),
        {_hll_est_expr('a')},
        {_hll_est_expr('b')},
        {_hll_est_expr('u')}
        SELECT est_a.e AS est_a, est_b.e AS est_b, est_u.e AS est_union,
               round(est_a.e + est_b.e - est_u.e, 2) AS est_intersection
        FROM est_a, est_b, est_u
    """,
)
def sk_hll_union_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch ALGEBRA: distinct high-value purchasers, distinct
    high-value error users, their union via per-register max merge (`hll_merge` — the
    property that makes the sketch shardable), and the inclusion-
    exclusion intersection estimate. One row: (est_a, est_b,
    est_union, est_intersection). The union NEVER rescans data — it
    is a 2·m-row register merge, which is exactly how per-day /
    per-shard sketches compose at 100 TB."""
    from cqdg_etl_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = load(spark, sf_dir, "events")
    ra = hll_registers(
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 200)),
        "user_id",
    )
    rb = hll_registers(
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 200)),
        "user_id",
    )
    ea = hll_estimate(ra).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge([ra, rb])).select(
        F.col("estimate").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 2
            ).alias("est_intersection"),
        )
    )
