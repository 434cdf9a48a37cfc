"""Round-16 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→23: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe24.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 11–15 belong to the
datapipe19–23 publications; these wait their turn by design.

To publish (round 16): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe24.py::_BNLJ_OK /
_GLOBAL_WINDOW_OK into the fleet lint (the orphan test enforces the
copies).

Batch theme: distributional diagnostics — the statistical instruments
that read whether two corpus slices, a time series, or an embedding
space LOOK the way the pipeline assumes. Mann-Whitney U rank-sum
(the nonparametric two-sample location test — are source A's document
lengths drawn from the same distribution as the rest), lag-1..7
autocorrelation of the daily event count (the ACF fingerprint a
forecaster or anomaly detector conditions on), Fano-factor burstiness
per event type (variance/mean of daily counts — Poisson ≈ 1,
bursty ≫ 1), a Heaps-law OLS fit over the vocabulary growth curve
(the β exponent that says whether vocabulary growth is natural text
or OCR churn), per-label diagonal-Mahalanobis embedding outliers
(the mislabel/contamination shortlist), and the entropy rate of the
event-type Markov chain (how predictable the behavioral stream is,
the compressibility bound next to ev_markov_transitions). No
reference counterpart (Ferlab-Ste-Justine/cqdg-etl has no analytics
of this kind); every shape is chosen for the 100-TB target and
documented per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries import datapipe17 as _dp17
from cqdg_etl_spark.queries.registry import REGISTRY, Query, load

STAGED: dict[str, Query] = {}


def _staged(name: str, oracle: str | None = None, bench: bool = False,
            tags: tuple[str, ...] = ()):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def register() -> None:
    """Publish the staged queries into the driver registry (round 16)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


# ------------------------------------ Mann-Whitney U rank-sum

_MW_LANG = "en"


@_staged(
    "pf_mann_whitney_u",
    tags=("datapipe", "profile", "stats"),
    oracle=f"""
        WITH v AS (
          SELECT n_chars AS val,
                 CAST(sum(CASE WHEN lang = '{_MW_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS a_v,
                 CAST(count(*) AS BIGINT) AS t_v
          FROM documents GROUP BY n_chars
        ),
        c AS (
          SELECT a_v, t_v,
                 CAST(sum(t_v) OVER (
                   ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_t
          FROM v
        ),
        s AS (
          SELECT CAST(sum(CAST(a_v * (2 * (cum_t - t_v) + t_v + 1)
                               AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS r2a,
                 CAST(sum(CAST(t_v * t_v * t_v - t_v AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS ties,
                 CAST(sum(a_v) AS BIGINT) AS n_a,
                 CAST(sum(t_v) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_values
          FROM c
        ),
        u AS (
          SELECT n_a, CAST(n - n_a AS BIGINT) AS n_b, n, n_values, ties,
                 CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)
                      AS DECIMAL(38,0)) AS u2a
          FROM s
        ),
        z AS (
          SELECT *,
                 CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   AS sigma2
          FROM u
          WHERE n >= 2
        )
        SELECT n_a, n_b, n_values,
               CAST(u2a AS DOUBLE) / 2.0 AS u_a,
               CASE WHEN n_a >= 1 AND n_b >= 1 AND sigma2 > 0 THEN
                 {_SQL_Q6.format(
                     x='''(CAST(u2a AS DOUBLE)
                           - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                          / 2.0 / sqrt(sigma2)''')}
               END AS z,
               CASE WHEN n_a >= 1 AND n_b >= 1 THEN
                 {_SQL_Q6.format(
                     x='''CAST(u2a AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                          - 1.0''')}
               END AS r_rank_biserial
        FROM z
    """,
)
def pf_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test of document length (n_chars)
    between the '{lang}' slice and the rest of the corpus — the
    nonparametric answer to "is this source's length distribution
    shifted", robust where the t-test's normality assumption is junk
    (lengths are heavy-tailed). Outputs U for group A, the
    tie-corrected normal-approximation z, and the rank-biserial
    effect size r = 2U/(n_a·n_b) − 1 ∈ [−1, 1].

    Midranks without per-row ranks: group rows by VALUE — for a value
    with t tied rows and running total c rows at-or-below, each tied
    row's midrank is (2(c−t) + t + 1)/2, so A's doubled rank-sum is
    2R_A = Σ_v a_v·(2(c_v−t_v) + t_v + 1), all exact integers
    (DECIMAL(38,0) against 100-TB counts: a_v·c_v ~ 10²⁴). The only
    float ops are the final z and r chains, both pinned and quantized
    at 6 dp; σ² carries the standard Σ(t³−t) tie correction and z is
    NULL-guarded for degenerate inputs (one group empty, all values
    tied → σ² = 0). No continuity correction (documented; both
    engines agree by construction).

    Scale shape: one hash aggregate to the VALUE frame (bounded by
    distinct lengths, corpus-independent), the running total via the
    range-partitioned ``global_cumsum`` (never a single-task window),
    and a 1-row final rollup."""
    from cqdg_etl_spark.operators.ranking import global_cumsum

    docs = load(spark, sf_dir, "documents")
    v = docs.groupBy(F.col("n_chars").alias("val")).agg(
        F.sum(F.when(F.col("lang") == _MW_LANG, 1).otherwise(0))
        .cast("long").alias("a_v"),
        F.count("*").cast("long").alias("t_v"),
    )
    c = global_cumsum(v, [F.col("val")], "t_v", "cum_t")
    s = c.agg(
        F.sum(
            (F.col("a_v")
             * (2 * (F.col("cum_t") - F.col("t_v")) + F.col("t_v") + 1))
            .cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("r2a"),
        F.sum(
            (F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v"))
            .cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("ties"),
        F.sum("a_v").cast("long").alias("n_a"),
        F.sum("t_v").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_values"),
    )
    u = s.select(
        "n_a",
        (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
        "n", "n_values", "ties",
        (F.col("r2a")
         - F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1))
        .cast("decimal(38,0)").alias("u2a"),
    )
    z = u.filter(F.col("n") >= 2).withColumn(
        "sigma2",
        F.col("n_a").cast("double") * F.col("n_b").cast("double") / 12.0
        * (
            (F.col("n") + 1).cast("double")
            - F.col("ties").cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
        ),
    )
    ok = (F.col("n_a") >= 1) & (F.col("n_b") >= 1)
    return z.select(
        "n_a", "n_b", "n_values",
        (F.col("u2a").cast("double") / 2.0).alias("u_a"),
        F.when(
            ok & (F.col("sigma2") > 0),
            _q6(
                (
                    F.col("u2a").cast("double")
                    - F.col("n_a").cast("double") * F.col("n_b").cast("double")
                )
                / 2.0 / F.sqrt(F.col("sigma2"))
            ),
        ).alias("z"),
        F.when(
            ok,
            _q6(
                F.col("u2a").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                - 1.0
            ),
        ).alias("r_rank_biserial"),
    )


# ------------------------------------ daily-count autocorrelation

_ACF_MAX_LAG = 7


@_staged(
    "ev_acf_daily_counts",
    tags=("datapipe", "events", "timeseries"),
    oracle=f"""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1
        ),
        b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        spine AS (
          SELECT CAST(unnest(range(b.d0, b.d1 + 1)) AS BIGINT) AS day
          FROM b
        ),
        filled AS (
          SELECT s.day, CAST(coalesce(d.cnt, 0) AS BIGINT) AS cnt
          FROM spine s LEFT JOIN daily d USING (day)
        ),
        st AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cnt) AS BIGINT) AS s,
                 CAST(sum(CAST(cnt * cnt AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS q
          FROM filled
        ),
        md AS (
          SELECT n,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                 CAST(q AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS den
          FROM st
        ),
        pairs AS (
          SELECT l.lag, a.cnt AS xa, bb.cnt AS xb, md.m, md.den, md.n
          FROM filled a
          CROSS JOIN (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag) l
          JOIN filled bb ON bb.day = a.day + l.lag
          CROSS JOIN md
        )
        SELECT CAST(lag AS INT) AS lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CASE WHEN any_value(den) > 0 THEN
                 {_SQL_Q6.format(
                     x='''CAST(sum(CAST({t} AS DECIMAL(38,6)))
                               AS DOUBLE) / any_value(den)'''.format(
                         t=_SQL_Q6.format(
                             x="(CAST(xa AS DOUBLE) - m)"
                               " * (CAST(xb AS DOUBLE) - m)")))}
               END AS acf
        FROM pairs
        GROUP BY lag ORDER BY lag
    """,
)
def ev_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily total event count at lags 1–7 —
    the ACF fingerprint that says whether the stream has day-over-day
    momentum, a weekly cycle (spike at lag 7 — read next to
    ev_dow_seasonality), or is white noise; any forecaster or
    burst detector conditions on exactly this. Days with no events
    count as 0 (the spine is densified from min to max day), so a
    silent outage reads as real negative correlation, not a missing
    row. Complements pf_autocorr_daily (datapipe19), which reads
    PER-TYPE lag-1/lag-7 predictability over observed days only —
    this one is the full 7-lag ACF of the aggregate stream with the
    zero-filled calendar the textbook estimator assumes.

    ACF convention: r_k = Σ_t (x_t−m)(x_{{t+k}}−m) / Σ_t (x_t−m)²
    with the FULL-series mean and denominator (the standard sample
    ACF, not per-lag Pearson). Counts are exact integers; the
    denominator is the pinned chain Σx² − (Σx)²/n on exact sums; each
    lag-pair product is one pinned IEEE chain quantized at 6 dp into
    decimal, summed exactly; NULL-guarded when the series is constant
    (den = 0).

    Scale shape: the corpus collapses to one (day, count) aggregate
    (bounded by the time span, not the corpus); the day spine comes
    from one explode of a 1-row (min, max) aggregate; lag pairs are a
    day-keyed equi-join of that bounded frame against itself fanned
    by the 7-row lag grid; the 1-row (mean, den) scalar fan-out is
    the reviewed bounded-BNLJ class."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    b = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = b.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    st = filled.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum((F.col("cnt") * F.col("cnt")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("q"),
    )
    md = st.select(
        "n",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("m"),
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("den"),
    )
    lags = filled.select(
        "day", F.col("cnt").alias("xa"),
        F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("lag"),
    ).withColumn("day_b", F.col("day") + F.col("lag"))
    pairs = (
        lags.join(
            filled.select(F.col("day").alias("day_b"),
                          F.col("cnt").alias("xb")),
            "day_b",
        )
        .join(F.broadcast(md))
    )
    # DECIMAL(38,6), not (18,6): the per-pair product is unbounded
    # (daily counts at the 100-TB target overflow ±1e12 capacity) and
    # Spark's non-ANSI overflow cast silently NULLs the term while
    # DuckDB raises — an engine divergence (ADVICE r10).
    term = _q6(
        (F.col("xa").cast("double") - F.col("m"))
        * (F.col("xb").cast("double") - F.col("m"))
    ).cast("decimal(38,6)")
    return (
        pairs.groupBy(F.col("lag").cast("int").alias("lag"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.when(
                F.first("den") > 0,
                _q6(F.sum(term).cast("double") / F.first("den")),
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ------------------------------------ Fano-factor burstiness


@_staged(
    "ev_fano_burstiness",
    tags=("datapipe", "events", "timeseries"),
    oracle=f"""
        WITH daily AS (
          SELECT event_type,
                 epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ),
        s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(sum(CAST(cnt * cnt AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS q
          FROM daily GROUP BY event_type
        )
        SELECT event_type, n_days, total,
               {_SQL_Q6.format(
                   x='''CAST(total AS DOUBLE)
                      / CAST(n_days AS DOUBLE)''')} AS mean_daily,
               CASE WHEN n_days >= 2 AND total > 0 THEN
                 {_SQL_Q6.format(
                     x='''(CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
                           - CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
                          / (CAST(n_days AS DOUBLE)
                             * CAST(n_days - 1 AS DOUBLE))
                          / (CAST(total AS DOUBLE)
                             / CAST(n_days AS DOUBLE))''')}
               END AS fano
        FROM s ORDER BY event_type
    """,
)
def ev_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, sample-variance/mean) of the
    per-day event count, per event type, over that type's OBSERVED
    days — the one-number burstiness test: a Poisson arrival process
    reads ≈ 1, a bursty/overdispersed one ≫ 1, an unnaturally regular
    one ≪ 1. The capacity-planning complement of
    ev_session_powerlaw_alpha (sessions) and ev_acf_daily_counts
    (memory): Fano says how big the spikes are relative to the mean.

    Determinism: per-day counts exact integers; sample variance from
    the pinned chain (n·Σx² − (Σx)²)/(n(n−1)) on exact sums (Σx² in
    DECIMAL(38,0) — BIGINT overflows at 100-TB daily counts), one
    final division; NULL-guarded at n_days < 2 (variance undefined —
    the Welch/ANOVA discipline). Averaging over OBSERVED days only is
    documented (a type absent most days is judged on its active days;
    zero-filling would dilute every sparse type toward Fano = mean).

    Scale shape: the corpus collapses to one (type, day) aggregate,
    then one |types|-bounded rollup — no join anywhere."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("cnt").cast("long").alias("total"),
        F.sum((F.col("cnt") * F.col("cnt")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("q"),
    )
    nd = F.col("n_days").cast("double")
    tot = F.col("total").cast("double")
    return s.select(
        "event_type", "n_days", "total",
        _q6(tot / nd).alias("mean_daily"),
        F.when(
            (F.col("n_days") >= 2) & (F.col("total") > 0),
            _q6(
                (nd * F.col("q").cast("double") - tot * tot)
                / (nd * (F.col("n_days") - 1).cast("double"))
                / (tot / nd)
            ),
        ).alias("fano"),
    ).orderBy("event_type")


# ------------------------------------ Heaps-law OLS fit


@_staged(
    "tx_heaps_law_fit",
    bench=True,
    tags=("datapipe", "text", "vocabulary"),
    oracle=f"""
        WITH curve AS (
          SELECT * FROM ({_dp17.STAGED["tx_vocab_growth_curve"].oracle})
        ),
        pts AS (
          SELECT CAST({_SQL_Q6.format(
                     x="ln(CAST(cum_tokens AS DOUBLE))")}
                   AS DECIMAL(18,6)) AS x,
                 CAST({_SQL_Q6.format(
                     x="ln(CAST(cum_vocab AS DOUBLE))")}
                   AS DECIMAL(18,6)) AS y
          FROM curve WHERE cum_tokens > 0 AND cum_vocab > 0
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS d,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx,
                 CAST(sum(y * y) AS DECIMAL(38,12)) AS syy
          FROM pts
        ),
        m AS (
          SELECT d,
                 CAST(d AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
                 CAST(d AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
                 CAST(d AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
          FROM s
        )
        SELECT d AS n_points,
               CASE WHEN d >= 2 AND varxn > 0 THEN
                 {_SQL_Q6.format(x="covn / varxn")}
               END AS beta,
               CASE WHEN d >= 2 AND varxn > 0 THEN
                 {_SQL_Q6.format(
                     x="(syd - covn / varxn * sxd) / CAST(d AS DOUBLE)")}
               END AS ln_k,
               CASE WHEN d >= 2 AND varxn > 0 AND varyn > 0 THEN
                 {_SQL_Q6.format(x="covn * covn / (varxn * varyn)")}
               END AS r2
        FROM m
    """,
)
def tx_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law fit V(N) ≈ K·N^β over the vocabulary growth curve:
    OLS of ln V on ln N across the {d} decile checkpoints of
    tx_vocab_growth_curve (this query CONSUMES that one's exact
    integer curve — one recipe, two readings). Natural text sits at
    β ≈ 0.4–0.6; β → 1 flags OCR/spam vocabulary churn, β → 0 a
    templated corpus; R² says whether a power law describes the curve
    at all. The one-row scalar a mixture designer reads before
    trusting token-count extrapolations.

    Determinism: the curve is pure integer arithmetic
    (tx_vocab_growth_curve's contract); each checkpoint's (ln N, ln V)
    is one pinned ln quantized at 6 dp into decimal; the five OLS
    sums over ≤10 rows are exact decimal (x·y products widen to
    DECIMAL(38,12)); β, ln K, R² are pinned double chains on those
    exact sums, NULL-guarded for degenerate curves (fewer than 2
    nonzero checkpoints, zero x-variance). β and ln K share the
    ``covn/varxn`` slope subexpression on both engines.

    Scale shape: inherits the curve's (range-partitioned cumsums,
    token-keyed min-agg, ≤10-row grid — and its reviewed 1-row
    total-token BNLJ); the fit itself is one aggregate over ≤10
    rows."""
    curve = _dp17.tx_vocab_growth_curve(spark, sf_dir)
    pts = curve.filter(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).select(
        _q6(F.log(F.col("cum_tokens").cast("double")))
        .cast("decimal(18,6)").alias("x"),
        _q6(F.log(F.col("cum_vocab").cast("double")))
        .cast("decimal(18,6)").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("d"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,12)").alias("syy"),
    )
    dd = F.col("d").cast("double")
    m = s.select(
        "d",
        (dd * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        .alias("covn"),
        (dd * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        .alias("varxn"),
        (dd * F.col("syy").cast("double")
         - F.col("sy").cast("double") * F.col("sy").cast("double"))
        .alias("varyn"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    fit_ok = (F.col("d") >= 2) & (F.col("varxn") > 0)
    return m.select(
        F.col("d").alias("n_points"),
        F.when(fit_ok, _q6(F.col("covn") / F.col("varxn"))).alias("beta"),
        F.when(
            fit_ok,
            _q6(
                (F.col("syd") - F.col("covn") / F.col("varxn") * F.col("sxd"))
                / F.col("d").cast("double")
            ),
        ).alias("ln_k"),
        F.when(
            fit_ok & (F.col("varyn") > 0),
            _q6(
                F.col("covn") * F.col("covn")
                / (F.col("varxn") * F.col("varyn"))
            ),
        ).alias("r2"),
    )


# ------------------------------------ Mahalanobis label outliers

_MAHA_TOPK = 3


@_staged(
    "emb_mahalanobis_outliers",
    bench=True,
    tags=("datapipe", "embedding", "outliers"),
    oracle=f"""
        WITH f AS (
          SELECT vec_id, label,
                 generate_subscripts(embedding, 1) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ),
        st AS (
          SELECT label, dim,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s,
                 CAST(sum(CAST(x * x AS DECIMAL(38,12)))
                      AS DECIMAL(38,12)) AS q
          FROM f GROUP BY label, dim
        ),
        mv AS (
          SELECT label, dim,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
          FROM st
        ),
        terms AS (
          SELECT f.vec_id, f.label,
                 CASE WHEN mv.var > 0 THEN
                   CAST({_SQL_Q6.format(
                       x="(f.x - mv.mu) * (f.x - mv.mu) / mv.var")}
                     AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END AS t
          FROM f JOIN mv ON f.label = mv.label AND f.dim = mv.dim
        ),
        md AS (
          SELECT vec_id, label,
                 CAST(sum(t) AS DOUBLE) AS md2
          FROM terms GROUP BY vec_id, label
        ),
        rk AS (
          SELECT label, vec_id, md2,
                 row_number() OVER (
                   PARTITION BY label ORDER BY md2 DESC, vec_id
                 ) AS rnk
          FROM md
        )
        SELECT label, CAST(rnk AS INT) AS rnk, vec_id, md2
        FROM rk WHERE rnk <= {_MAHA_TOPK}
        ORDER BY label, rnk
    """,
)
def emb_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label diagonal-Mahalanobis outliers: for every vector, the
    squared distance Σ_dim (x−μ_ld)²/σ²_ld to its OWN label's per-
    dimension mean under that label's per-dimension variance, and the
    top-{k} most aberrant vectors per label — the mislabel /
    contamination shortlist a curation pass reviews first (the
    distance-normalized complement of emb_label_noise_scores' kNN
    vote). Diagonal covariance by design: the full-matrix inverse is
    a d×d driver-side solve that belongs to an offline step; the
    diagonal form stays one aggregate + one map-side term.

    Determinism: per-(label, dim) sums are exact DECIMAL(38,12)
    accumulations (the fleet embedding recipe); μ and population σ²
    are pinned double chains on those exact sums (population, not
    sample: no n−1 degenerate case); zero-variance dims contribute 0
    on both engines (same pinned subtraction → same branch); each
    term is quantized at 6 dp into decimal, the per-vector sum is
    exact; the rank orders by (md2 DESC, vec_id) — a total order.

    Scale shape: one posexplode aggregate to the (label, dim) frame
    (|labels|·d rows — bounded), one equi-join of that bounded frame
    back onto the exploded corpus by (label, dim), one hash aggregate
    per vector, and a per-LABEL rank window (partitioned — never
    global)."""
    e = load(spark, sf_dir, "embeddings")
    f = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("dim0", "xf"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    st = f.groupBy("label", "dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,12)"))
        .cast("decimal(38,12)").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    mv = st.select(
        "label", "dim",
        mu.alias("mu"),
        (F.col("q").cast("double") / F.col("n").cast("double") - mu * mu)
        .alias("var"),
    )
    terms = f.join(F.broadcast(mv), ["label", "dim"]).select(
        "vec_id", "label",
        F.when(
            F.col("var") > 0,
            _q6(
                (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
                / F.col("var")
            ).cast("decimal(18,6)"),
        ).otherwise(F.lit(0).cast("decimal(18,6)")).alias("t"),
    )
    md = terms.groupBy("vec_id", "label").agg(
        F.sum("t").cast("double").alias("md2")
    )
    w = W.partitionBy("label").orderBy(F.desc("md2"), "vec_id")
    return (
        md.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _MAHA_TOPK)
        .select("label", "rnk", "vec_id", "md2")
        .orderBy("label", "rnk")
    )


# ------------------------------------ Markov-chain entropy rate


@_staged(
    "ev_entropy_rate_markov",
    tags=("datapipe", "events", "markov"),
    oracle=f"""
        WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS next_type
          FROM events
        ),
        c AS (
          SELECT event_type AS from_type, next_type AS to_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2
        ),
        m AS (
          SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
          FROM c GROUP BY from_type
        ),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(count(DISTINCT from_type) AS BIGINT) AS n_states
          FROM c
        ),
        terms AS (
          SELECT CAST({_SQL_Q6.format(
              x='''CAST(c.n AS DOUBLE) / CAST(tot.nn AS DOUBLE)
                   * ln(CAST(m.n_from AS DOUBLE)
                        / CAST(c.n AS DOUBLE))''')}
                AS DECIMAL(18,6)) AS t
          FROM c JOIN m USING (from_type) CROSS JOIN tot
        ),
        h AS (
          SELECT CAST(sum(t) AS DECIMAL(38,6)) AS hsum,
                 CAST(count(*) AS BIGINT) AS n_cells
          FROM terms
        )
        SELECT tot.n_states, tot.nn AS n_transitions, h.n_cells,
               {_SQL_Q6.format(x="CAST(h.hsum AS DOUBLE)")}
                 AS entropy_rate,
               CASE WHEN tot.n_states >= 2 THEN
                 {_SQL_Q6.format(
                     x="ln(CAST(tot.n_states AS DOUBLE))")}
               END AS max_entropy,
               CASE WHEN tot.n_states >= 2 THEN
                 {_SQL_Q6.format(
                     x='''CAST(h.hsum AS DOUBLE)
                        / ln(CAST(tot.n_states AS DOUBLE))''')}
               END AS normalized
        FROM h CROSS JOIN tot
    """,
)
def ev_entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event-type Markov chain:
    H = Σ_s π(s) Σ_t p(t|s)·(−ln p(t|s)) with π the empirical
    transition-origin weights — nats per step of genuine surprise in
    the behavioral stream, i.e. the compressibility bound next to
    ev_markov_transitions' raw matrix. ``normalized`` divides by
    ln(n_states): 1 = the stream is an i.i.d. uniform type sampler
    (no sequential structure to exploit), → 0 = nearly deterministic
    flows (strong funnel structure).

    Determinism: the chain counts come from the fleet lead() recipe
    over the (ts, event_id) total order; each cell's term
    (n_st/N)·ln(n_s/n_st) is one pinned IEEE chain quantized at 6 dp
    into decimal (ln argument ≥ 1 → every term ≥ 0, no log-of-zero:
    only observed cells exist), the sum is exact, and the normalized
    ratio is NULL-guarded at n_states < 2.

    Scale shape: per-user lead windows (bounded per user), one hash
    aggregate to the ≤|types|² cell frame, a from_type-keyed
    broadcast marginal join, and a 1-row (N, n_states) scalar
    fan-out (the reviewed bounded-BNLJ class)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("long").alias("n"))
    m = c.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    tot = c.agg(
        F.sum("n").cast("long").alias("nn"),
        F.countDistinct("from_type").cast("long").alias("n_states"),
    )
    terms = (
        c.join(F.broadcast(m), "from_type")
        .join(F.broadcast(tot))
        .select(
            _q6(
                F.col("n").cast("double") / F.col("nn").cast("double")
                * F.log(
                    F.col("n_from").cast("double") / F.col("n").cast("double")
                )
            ).cast("decimal(18,6)").alias("t")
        )
    )
    h = terms.agg(
        F.sum("t").cast("decimal(38,6)").alias("hsum"),
        F.count("*").cast("long").alias("n_cells"),
    )
    ln_states = F.log(F.col("n_states").cast("double"))
    return h.join(F.broadcast(tot)).select(
        "n_states",
        F.col("nn").alias("n_transitions"),
        "n_cells",
        _q6(F.col("hsum").cast("double")).alias("entropy_rate"),
        F.when(F.col("n_states") >= 2, _q6(ln_states)).alias("max_entropy"),
        F.when(
            F.col("n_states") >= 2,
            _q6(F.col("hsum").cast("double") / ln_states),
        ).alias("normalized"),
    )
