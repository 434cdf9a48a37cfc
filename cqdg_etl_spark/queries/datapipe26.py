"""Round-18 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→25: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe26.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 11–17 belong to the
datapipe19–25 publications; these wait their turn by design.

To publish (round 18): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe26.py::_BNLJ_OK /
_GLOBAL_WINDOW_OK into the fleet lint (the orphan test enforces the
copies).

Batch theme: model-facing readiness — the numbers a team reads the
week before training or shipping. Simplified silhouette per label
(is the labeling geometrically coherent enough to trust as
supervision), truncated Katz centrality on the co-purchase graph
(attenuated path-count influence, the damped complement of pagerank),
A/B power analysis (the minimum detectable effect the current user
count and variance can even see — run BEFORE the experiment),
Holt linear forecasting over the daily event series (level + trend
state, one-step MAE, the 7-day-ahead number a capacity plan
consumes), Q-Q deciles of order value across an era split (the
distribution-shape drift view KS's single max-gap collapses), and
the Lorenz curve of user activity at deciles (the cumulative-share
curve behind the staged Gini/Theil scalars). No reference
counterpart (Ferlab-Ste-Justine/cqdg-etl has no analytics of this
kind); every shape is chosen for the 100-TB target and documented
per query.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.registry import REGISTRY, Query, load

STAGED: dict[str, Query] = {}


def _staged(name: str, oracle: str | None = None, bench: bool = False,
            tags: tuple[str, ...] = ()):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def register() -> None:
    """Publish the staged queries into the driver registry (round 18)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

_DIM = 64


# ------------------------------------ simplified silhouette


def _sql_silhouette(dim: int = _DIM) -> str:
    def l2sq_cv(v: str, cv: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"k -> (CAST({v}[k] AS DOUBLE) - {cv}[k]) "
            f"* (CAST({v}[k] AS DOUBLE) - {cv}[k])))"
        )

    return f"""
        WITH f AS (
          SELECT vec_id, label, k AS d,
                 CAST(embedding[k] AS DOUBLE) AS x
          FROM embeddings, range(1, {dim + 1}) t(k)
        ),
        comp AS (
          SELECT label, d,
                 CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*) AS m
          FROM f GROUP BY label, d
        ),
        cent AS MATERIALIZED (
          SELECT label, list(m ORDER BY d) AS cv FROM comp GROUP BY label
        ),
        dists AS (
          SELECT e.vec_id, e.label AS own_label, c.label AS c_label,
                 sqrt({l2sq_cv('e.embedding', 'c.cv')}) AS dist
          FROM embeddings e CROSS JOIN cent c
        ),
        ab AS (
          SELECT vec_id, own_label,
                 max(CASE WHEN c_label = own_label THEN dist END) AS a,
                 min(CASE WHEN c_label <> own_label THEN dist END) AS b
          FROM dists GROUP BY vec_id, own_label
        ),
        sil AS (
          SELECT vec_id, own_label AS label,
                 CASE WHEN b IS NOT NULL
                       AND greatest(a, b) > 0 THEN
                   CAST({_SQL_Q6.format(x="(b - a) / greatest(a, b)")}
                     AS DECIMAL(18,6))
                 WHEN b IS NOT NULL THEN CAST(0 AS DECIMAL(18,6))
                 END AS s
          FROM ab
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
               CASE WHEN count(s) > 0 THEN
                 {_SQL_Q6.format(
                     x='''CAST(sum(s) AS DOUBLE)
                        / CAST(count(s) AS DOUBLE)''')}
               END AS mean_silhouette
        FROM sil GROUP BY label ORDER BY label
    """


@_staged(
    "emb_silhouette_simplified",
    bench=True,
    tags=("datapipe", "embedding", "clustering"),
    oracle=_sql_silhouette(),
)
def emb_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label: a = distance to the OWN
    label's centroid, b = distance to the nearest OTHER label's
    centroid, s = (b−a)/max(a,b) ∈ [−1, 1], averaged per label — the
    centroid-based silhouette (Hruschka et al.) that replaces the
    classic O(n²) pairwise form with one pass against |labels|
    centroids. Labels near 0 or negative are geometrically incoherent
    supervision; the pre-training readiness read next to
    emb_label_noise_scores (kNN votes) and emb_mahalanobis_outliers
    (per-vector aberrance).

    Determinism: centroids are the fleet recipe (exact DECIMAL(38,12)
    per-dim sums ÷ count); per-(vector, centroid) distance is the
    shared left-to-right Σ(a−b)² fold + one sqrt (the IVF/semantic-
    prune recipe, Arrow closure vs list_transform — bit-identical);
    each s is one pinned chain quantized at 6 dp into decimal; both
    degenerate branches are pinned (a = b = 0 → s = 0; a single
    corpus-wide label → b undefined → NULL silhouette).

    Scale shape: one posexplode aggregate to the |labels|·d centroid
    frame, a bounded driver collect of that frame into an Arrow
    closure (the ann_topk_ivf index-build class), ONE vectorized
    Arrow pass over the corpus, one per-label hash aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    f = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("d0", "xf")
    ).select(
        "label", (F.col("d0") + 1).alias("d"),
        F.col("xf").cast("double").alias("x"),
    )
    comp = f.groupBy("label", "d").agg(
        (F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
         / F.count("*")).alias("m")
    )
    cent_rows = sorted(
        comp.groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("d", "m"))).alias("cv"))
        .collect(),
        key=lambda r: r["label"],
    )  # ascending labels — np.searchsorted below requires sorted keys
    labels = np.asarray([r["label"] for r in cent_rows], dtype=np.int64)
    mat = np.asarray(
        [[dm["m"] for dm in r["cv"]] for r in cent_rows], dtype=np.float64
    )

    @F.pandas_udf("struct<a:double, b:double>")
    def ab(v: pd.Series, lab: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"a": [], "b": []})
        M = np.stack(v.values).astype(np.float64)
        n = M.shape[0]
        dists = np.empty((n, len(labels)), dtype=np.float64)
        for j in range(len(labels)):
            diff = M - mat[j][None, :]
            dists[:, j] = np.sqrt(
                np.add.accumulate(diff * diff, axis=1)[:, -1]
            )
        own_idx = np.searchsorted(labels, lab.values.astype(np.int64))
        a = dists[np.arange(n), own_idx]
        if len(labels) > 1:
            masked = dists.copy()
            masked[np.arange(n), own_idx] = np.inf
            b = masked.min(axis=1)
        else:
            # None (object dtype), NOT np.nan: Spark's isNotNull() is
            # TRUE for NaN, so a NaN here would reach the decimal cast
            # and only become the intended NULL silhouette through the
            # non-ANSI NaN->decimal coercion — which throws under
            # spark.sql.ansi.enabled=true (ADVICE r10).
            b = np.full(n, None, dtype=object)
        return pd.DataFrame({"a": a, "b": b})

    sil = emb.select(
        "label", ab(F.col("embedding"), F.col("label")).alias("r")
    ).select(
        "label", F.col("r.a").alias("a"), F.col("r.b").alias("b")
    ).select(
        "label",
        F.when(
            F.col("b").isNotNull() & (F.greatest("a", "b") > 0),
            _q6((F.col("b") - F.col("a")) / F.greatest("a", "b"))
            .cast("decimal(18,6)"),
        ).when(
            F.col("b").isNotNull(), F.lit(0).cast("decimal(18,6)")
        ).alias("s"),
    )
    return sil.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.when(
            F.count("s") > 0,
            _q6(F.sum("s").cast("double") / F.count("s").cast("double")),
        ).alias("mean_silhouette"),
    ).orderBy("label")


# ------------------------------------ truncated Katz centrality

_KATZ_ALPHA = 0.05
_KATZ_ROUNDS = 3

_SQL_COPARTS = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM op a JOIN op b USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey
        )"""


def _sql_katz(alpha: float = _KATZ_ALPHA, rounds: int = _KATZ_ROUNDS) -> str:
    ctes = [f"""
        sym AS (
          SELECT src AS u, dst AS v FROM pairs
          UNION ALL SELECT dst AS u, src AS v FROM pairs
        ),
        x0 AS (
          SELECT DISTINCT u AS node, CAST(1 AS DECIMAL(18,6)) AS x
          FROM sym
        )"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
        x{i} AS (
          SELECT s.v AS node,
                 CAST({_SQL_Q6.format(
                     x=f'''{alpha} * CAST(sum(p.x) AS DOUBLE)''')}
                   AS DECIMAL(18,6)) AS x
          FROM sym s JOIN x{i - 1} p ON p.node = s.u
          GROUP BY s.v
        )""")
    parts = " UNION ALL ".join(
        f"SELECT node, x FROM x{i}" for i in range(1, rounds + 1)
    )
    return f"""
        WITH {_SQL_COPARTS},
        {",".join(ctes)}
        SELECT node, CAST(sum(x) AS DOUBLE) AS katz
        FROM ({parts}) GROUP BY node ORDER BY node
    """


@_staged(
    "graph_katz_centrality",
    tags=("datapipe", "graph", "centrality", "iterative"),
    oracle=_sql_katz(),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality on the part co-purchase graph:
    katz(v) = Σ_{i=1..3} α^i · (#paths of length i ending at v),
    α = 0.05 — attenuated path-count influence, the damped complement
    of pagerank (which normalizes by degree) and HITS (which
    normalizes by the dominant eigenvalue): Katz rewards sheer
    reachable volume, so a part bridging two dense brands outranks an
    equally-connected part inside one. Truncation at 3 hops is the
    standard practical cut (α^4·paths is noise at α=0.05) and keeps
    the computation a fixed pipeline, not a convergence loop.

    Determinism: the per-round message sum runs on exact
    DECIMAL(18,6) scores (sums order-free), and each round's α-damp
    is ONE pinned double multiply re-quantized at 6 dp into decimal —
    both engines carry identical state into every round (the label-
    propagation unrolled-oracle discipline). Node set = endpoints of
    the edge frame; isolated parts have no path mass and no row.

    Scale shape: each round is one edge-keyed equi-join + one
    map-side-combinable hash aggregate (the pagerank shape). The edge
    frame is PERSISTED and each round's scores are eagerly
    localCheckpointed (the HITS discipline): without that, round i's
    lazy plan re-derives every earlier round AND the order-pair
    self-join — the final union would execute the candidate
    generation ~k² times over. The checkpoint cost is 3 small jobs
    inside fn(); the edge cache is dropped before returning so no
    frame leaks into the session (ADVICE r7 #3). On a real cluster
    swap localCheckpoint for .checkpoint() on durable storage
    (operators/graph._truncate note)."""
    from pyspark import StorageLevel

    from cqdg_etl_spark.queries.datapipe18 import _coparts_edges

    e = _coparts_edges(spark, sf_dir)
    sym = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionAll(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "x", F.lit(1).cast("decimal(18,6)")
    )
    rounds = []
    for _ in range(_KATZ_ROUNDS):
        x = (
            sym.join(x, sym["u"] == x["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(
                _q6(F.lit(_KATZ_ALPHA) * F.sum("x").cast("double"))
                .cast("decimal(18,6)").alias("x")
            )
            .localCheckpoint()  # eager: cut lineage, reuse in union
        )
        rounds.append(x)
    sym.unpersist()
    allr = rounds[0]
    for r in rounds[1:]:
        allr = allr.unionAll(r)
    return (
        allr.groupBy("node")
        .agg(F.sum("x").cast("double").alias("katz"))
        .orderBy("node")
    )


# ------------------------------------ A/B power analysis (MDE)

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621   # 80% power


@_staged(
    "ev_ab_power_mde",
    tags=("datapipe", "events", "experiment"),
    oracle=f"""
        WITH pu AS (
          SELECT user_id,
                 CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                         1, 8)) AS BIGINT) % 2 AS grp,
                 CAST(sum(CAST(value AS DECIMAL(18,6)))
                      AS DECIMAL(38,6)) AS y
          FROM events GROUP BY user_id
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(y * y) AS DECIMAL(38,12)) AS qy
          FROM pu
        ),
        m AS (
          SELECT n, n_a, CAST(n - n_a AS BIGINT) AS n_b,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
                 (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var_y
          FROM s WHERE n >= 2
        )
        SELECT n AS n_users, n_a, n_b,
               {_SQL_Q6.format(x="mean_y")} AS mean_value,
               CASE WHEN var_y > 0 THEN
                 {_SQL_Q6.format(x="sqrt(var_y)")}
               END AS sd_value,
               CASE WHEN var_y > 0 AND n_a >= 1 AND n_b >= 1 THEN
                 {_SQL_Q6.format(
                     x=f'''({_Z_ALPHA} + {_Z_BETA})
                           * sqrt(var_y * (1.0 / CAST(n_a AS DOUBLE)
                                           + 1.0 / CAST(n_b AS DOUBLE)))''')}
               END AS mde_abs,
               CASE WHEN var_y > 0 AND n_a >= 1 AND n_b >= 1
                     AND mean_y > 0 THEN
                 {_SQL_Q6.format(
                     x=f'''({_Z_ALPHA} + {_Z_BETA})
                           * sqrt(var_y * (1.0 / CAST(n_a AS DOUBLE)
                                           + 1.0 / CAST(n_b AS DOUBLE)))
                           / mean_y''')}
               END AS mde_rel
        FROM m
    """,
)
def ev_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis on per-user value sums: with users split
    into two arms by the fleet md5 hash (parity of the 32-bit
    bucket), the minimum detectable effect at α = 5% two-sided /
    80% power is MDE = (z_{{α/2}} + z_β)·√(σ²(1/n_a + 1/n_b)) — the
    number to read BEFORE running an experiment: an effect smaller
    than mde_rel of the mean is invisible at this user count, no
    matter how long the test runs. Pairs with ev_cuped_adjustment
    (staged dp25): CUPED's variance_reduction shrinks var_y and this
    query's MDE by √(1−ρ²).

    Determinism: per-user sums accumulate DECIMAL(18,6)-cast values
    (the fleet money recipe); the moment sums are exact decimals; σ²
    is the pinned sample-variance chain (n·Σy² − (Σy)²)/(n(n−1));
    the z constants are shared literals (Normal quantiles are not a
    SQL builtin on either engine); MDE chains are pinned and
    quantized at 6 dp, NULL-guarded for n < 2, zero variance, an
    empty arm, and (for mde_rel) a non-positive mean.

    Scale shape: one per-user hash aggregate, one 1-row rollup — no
    join anywhere."""
    ev = load(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
               16, 10).cast("long") % 2
    )
    pu = ev.groupBy("user_id").agg(
        F.first(grp).alias("grp"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(38,6)").alias("y"),
    )
    s = pu.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,12)").alias("qy"),
    )
    nd = F.col("n").cast("double")
    m = s.filter(F.col("n") >= 2).select(
        "n", "n_a",
        (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
        (F.col("sy").cast("double") / nd).alias("mean_y"),
        (
            (nd * F.col("qy").cast("double")
             - F.col("sy").cast("double") * F.col("sy").cast("double"))
            / (nd * (F.col("n") - 1).cast("double"))
        ).alias("var_y"),
    )
    arm_ok = (F.col("n_a") >= 1) & (F.col("n_b") >= 1)
    mde = (
        F.lit(_Z_ALPHA + _Z_BETA)
        * F.sqrt(
            F.col("var_y")
            * (1.0 / F.col("n_a").cast("double")
               + 1.0 / F.col("n_b").cast("double"))
        )
    )
    return m.select(
        F.col("n").alias("n_users"), "n_a", "n_b",
        _q6(F.col("mean_y")).alias("mean_value"),
        F.when(F.col("var_y") > 0, _q6(F.sqrt(F.col("var_y"))))
        .alias("sd_value"),
        F.when((F.col("var_y") > 0) & arm_ok, _q6(mde)).alias("mde_abs"),
        F.when(
            (F.col("var_y") > 0) & arm_ok & (F.col("mean_y") > 0),
            _q6(mde / F.col("mean_y")),
        ).alias("mde_rel"),
    )


# ------------------------------------ Holt linear forecast

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7


@_staged(
    "ev_holt_forecast",
    tags=("datapipe", "events", "timeseries", "stateful"),
    oracle=f"""
        WITH RECURSIVE daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1
        ),
        b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        spine AS (
          SELECT CAST(unnest(range(b.d0, b.d1 + 1)) AS BIGINT) AS day
          FROM b
        ),
        ordered AS (
          SELECT row_number() OVER (ORDER BY s.day) AS rn,
                 CAST(coalesce(d.cnt, 0) AS DOUBLE) AS x
          FROM spine s LEFT JOIN daily d USING (day)
        ),
        holt AS (
          SELECT rn, x, x AS l, CAST(0.0 AS DOUBLE) AS b,
                 CAST(0 AS BIGINT) AS ae6
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.rn, o.x,
                 {_HOLT_ALPHA} * o.x
                   + {1.0 - _HOLT_ALPHA} * (h.l + h.b) AS l,
                 {_HOLT_BETA} * (({_HOLT_ALPHA} * o.x
                   + {1.0 - _HOLT_ALPHA} * (h.l + h.b)) - h.l)
                   + {1.0 - _HOLT_BETA} * h.b AS b,
                 h.ae6 + CAST(floor(abs(o.x - (h.l + h.b))
                                    * 1000000.0 + 0.5) AS BIGINT) AS ae6
          FROM holt h JOIN ordered o ON o.rn = h.rn + 1
        ),
        fin AS (
          SELECT l, b, ae6,
                 (SELECT count(*) FROM ordered) AS n
          FROM holt WHERE rn = (SELECT max(rn) FROM holt)
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               {_SQL_Q6.format(x="l")} AS level,
               {_SQL_Q6.format(x="b")} AS trend,
               {_SQL_Q6.format(x=f"l + {_HOLT_H} * b")} AS forecast_7d,
               CASE WHEN n >= 2 THEN
                 {_SQL_Q6.format(
                     x='''(CAST(ae6 AS DOUBLE) / 1000000.0)
                        / CAST(n - 1 AS DOUBLE)''')}
               END AS mae
        FROM fin
    """,
)
def ev_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double exponential) smoothing over the zero-filled
    daily event-count series: level/trend state with α = 0.5,
    β = 0.3, initialized l₁ = x₁, b₁ = 0, plus the in-sample one-step
    MAE and the 7-day-ahead forecast l + 7b — the capacity-planning
    number the seasonality/ACF/changepoint family feeds into. A
    genuinely sequential recurrence (the trend update references the
    level update within the same step), so it runs as a grouped-map
    Pandas op over the BOUNDED daily frame (the series length is the
    calendar span, not the corpus — one group is the documented
    exception to the entity-sized-groups rule, same class as the
    CUSUM/EWMA precedents).

    Determinism: the Pandas op evaluates the recurrence left-to-right
    with plain double ops in the exact op-for-op order the oracle's
    recursive CTE replays (the ev_cusum_drift discipline), so even
    float state hash-matches; each one-step absolute error is
    integer-quantized to micros before summing (order-free exact),
    and all four outputs are quantized at 6 dp at the very end. MAE
    is NULL-guarded at n_days < 2.

    Scale shape: the corpus collapses to one (day, count) aggregate;
    the spine explode, the single-group Pandas pass, and the 1-row
    output all live on that calendar-bounded frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("x"),
        F.lit(1).alias("g"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("day", kind="mergesort")
        xs = g["x"].tolist()
        level = xs[0]
        trend = 0.0
        ae6 = 0
        for x in xs[1:]:
            pred = level + trend
            ae6 += int(math.floor(abs(x - pred) * 1000000.0 + 0.5))
            new_level = _HOLT_ALPHA * x + (1.0 - _HOLT_ALPHA) * (level + trend)
            trend = _HOLT_BETA * (new_level - level) + (1.0 - _HOLT_BETA) * trend
            level = new_level
        return pd.DataFrame(
            {"n_days": [len(xs)], "l": [level], "b": [trend], "ae6": [ae6]}
        )

    fin = filled.groupBy("g").applyInPandas(
        run, "n_days long, l double, b double, ae6 long"
    )
    return fin.select(
        "n_days",
        _q6(F.col("l")).alias("level"),
        _q6(F.col("b")).alias("trend"),
        _q6(F.col("l") + _HOLT_H * F.col("b")).alias("forecast_7d"),
        F.when(
            F.col("n_days") >= 2,
            _q6(
                (F.col("ae6").cast("double") / 1000000.0)
                / (F.col("n_days") - 1).cast("double")
            ),
        ).alias("mae"),
    )


# ------------------------------------ Q-Q deciles across eras

_QQ_SPLIT = "1998-01-01"


@_staged(
    "pf_qq_deciles",
    tags=("datapipe", "profile", "drift"),
    oracle=f"""
        WITH sl AS (
          SELECT CASE WHEN o_orderdate < TIMESTAMP '{_QQ_SPLIT}'
                      THEN 0 ELSE 1 END AS era,
                 o_totalprice AS x
          FROM orders
        ),
        qa AS (
          SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS qs,
                 CAST(count(*) AS BIGINT) AS n
          FROM sl WHERE era = 0
        ),
        qb AS (
          SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS qs,
                 CAST(count(*) AS BIGINT) AS n
          FROM sl WHERE era = 1
        )
        SELECT CAST(d AS INT) AS decile,
               round(qa.qs[d], 6) AS q_early,
               round(qb.qs[d], 6) AS q_late,
               round(qb.qs[d] - qa.qs[d], 6) AS gap
        FROM range(1, 10) t(d), qa, qb
        WHERE qa.n > 0 AND qb.n > 0
        ORDER BY decile
    """,
)
def pf_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q deciles of order value across the era split (orders before
    vs since 1998-01-01, the _QQ_SPLIT literal): the nine matched
    quantile pairs and their gaps
    — the distribution-SHAPE drift view that KS's single max-gap
    collapses into one number. A uniform gap is inflation; a gap
    growing with the decile is a fattening tail; pf_ks_totalprice
    fires on both, this says which. Empty eras yield no rows (both
    sides agree).

    Determinism: Spark `percentile` and DuckDB `quantile_cont` are
    the same interpolated type-7 quantile, verified bit-equal after
    6-dp rounding on this fleet (the agg_exact_percentiles
    precedent); the era predicate is a shared timestamp literal.

    Scale shape: exact interpolated percentiles sort within the two
    era groups — kept exact here because the oracle contract demands
    determinism; at 100 TB swap in `approx_percentile` (t-digest,
    mergeable map-side sketch), the documented trade of the
    percentile family."""
    o = load(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderdate").cast("timestamp")
            < F.lit(_QQ_SPLIT).cast("timestamp"),
            0,
        ).otherwise(1).alias("era"),
        F.col("o_totalprice").alias("x"),
    )
    pcts = "array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)"
    q = o.groupBy("era").agg(
        F.expr(f"percentile(x, {pcts})").alias("qs"),
        F.count("*").alias("n"),
    )
    qa = q.filter(F.col("era") == 0).select(
        F.posexplode("qs").alias("d0", "q_early")
    ).select((F.col("d0") + 1).cast("int").alias("decile"), "q_early")
    qb = q.filter(F.col("era") == 1).select(
        F.posexplode("qs").alias("d0", "q_late")
    ).select((F.col("d0") + 1).cast("int").alias("decile"), "q_late")
    return (
        qa.join(qb, "decile")
        .select(
            "decile",
            F.round("q_early", 6).alias("q_early"),
            F.round("q_late", 6).alias("q_late"),
            F.round(F.col("q_late") - F.col("q_early"), 6).alias("gap"),
        )
        .orderBy("decile")
    )


# ------------------------------------ Lorenz curve deciles

_LORENZ_DECILES = 10


@_staged(
    "ev_lorenz_curve_deciles",
    tags=("datapipe", "events", "inequality"),
    oracle=f"""
        WITH c AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY user_id
        ),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS nu,
                 CAST(sum(x) AS BIGINT) AS ne
          FROM c
        ),
        rk AS (
          SELECT x, row_number() OVER (ORDER BY x, user_id) AS rn
          FROM c
        ),
        bkt AS (
          SELECT CAST((rn * {_LORENZ_DECILES} + tot.nu - 1) // tot.nu
                      AS BIGINT) AS decile,
                 CAST(count(*) AS BIGINT) AS users_in,
                 CAST(sum(x) AS BIGINT) AS events_in
          FROM rk, tot GROUP BY 1
        ),
        cum AS (
          SELECT decile, users_in, events_in,
                 CAST(sum(users_in) OVER (
                   ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cu,
                 CAST(sum(events_in) OVER (
                   ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS ce
          FROM bkt
        )
        SELECT cum.decile, users_in, events_in,
               {_SQL_Q6.format(
                   x="CAST(cu AS DOUBLE) / CAST(tot.nu AS DOUBLE)")}
                 AS cum_user_share,
               {_SQL_Q6.format(
                   x="CAST(ce AS DOUBLE) / CAST(tot.ne AS DOUBLE)")}
                 AS cum_event_share
        FROM cum, tot ORDER BY decile
    """,
)
def ev_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of user activity at deciles: users ranked by
    ascending event count, bucketed into ten equal-population groups,
    and the cumulative share of users vs events at each boundary —
    the CURVE behind the staged Gini (dp19) and Theil (dp23) scalars.
    cum_event_share at decile 9 answers "what do the bottom 90% of
    users contribute"; 1 − that is the whale share a sampling or
    rate-limiting policy must plan for.

    Determinism: pure integer arithmetic until the two final share
    ratios — ranks from the range-partitioned ``global_rank`` over
    the (count, user_id) total order, ceiling-division decile
    buckets (`div`, never a float floor at a boundary), exact
    integer bucket sums and ≤10-row running sums via
    ``global_cumsum``.

    Scale shape: one per-user aggregate, one range-partitioned rank
    pass over it, a ≤10-row bucket rollup, and the 1-row totals
    scalar fan-out (the reviewed bounded-BNLJ class)."""
    from cqdg_etl_spark.operators.ranking import global_cumsum, global_rank

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("x"))
    tot = c.agg(
        F.count("*").cast("long").alias("nu"),
        F.sum("x").cast("long").alias("ne"),
    )
    rk = global_rank(c, [F.col("x"), F.col("user_id")], "rn")
    bkt = (
        rk.join(F.broadcast(tot))
        .select(
            F.expr(f"(rn * {_LORENZ_DECILES} + nu - 1) div nu")
            .cast("bigint").alias("decile"),
            "x",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("users_in"),
            F.sum("x").cast("long").alias("events_in"),
        )
    )
    cum = global_cumsum(
        bkt, [F.col("decile")], ["users_in", "events_in"], ["cu", "ce"]
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "decile", "users_in", "events_in",
            _q6(F.col("cu").cast("double") / F.col("nu").cast("double"))
            .alias("cum_user_share"),
            _q6(F.col("ce").cast("double") / F.col("ne").cast("double"))
            .alias("cum_event_share"),
        )
        .orderBy("decile")
    )

