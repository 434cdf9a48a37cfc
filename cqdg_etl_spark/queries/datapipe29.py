"""Bonus staged batch (datapipe29) — NOT yet in the driver registry.

Same staging discipline as datapipe13→28: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe29.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Unlike datapipe19–28 this batch
has no pinned publication round: it rides whichever future window has
front slots to spare (publishing two batches in one round is fine —
the driver verifies the front 50 names), or stays staged as verified
surface.

Batch theme: frequency-domain, extreme-value, and error-control
audits — the estimator classes the suite did not yet cover.
A literal-trig periodogram of the daily event stream (which cycle
actually dominates — the spectral complement of ev_acf_daily_counts'
lag view), a Gumbel block-maxima fit with a 26-week return level
(what peak should capacity planning expect — extreme-value theory on
the daily counts), Benjamini–Hochberg FDR control over per-type
location shifts (the multiple-comparisons step every per-segment
dashboard skips, with distribution-free Chebyshev p-values), an
equi-width-histogram quantile-sketch audit against exact percentiles
(the mergeable one-pass quantile estimate and its guaranteed error
bound — the quantile analog of sk_cms_error_audit), a Theil–Sen
robust trend on daily order revenue (the median-of-slopes line that
shrugs off the outlier days OLS chases), and a functional-dependency
audit over assumed intra-table invariants (the schema-discovery
complement of pf_fk_candidate_audit's cross-table containment).
No reference counterpart (Ferlab-Ste-Justine/cqdg-etl has no
analytics of this kind); every shape is chosen for the 100-TB target
and documented per query.
"""

from __future__ import annotations

import math

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
    """Publish the staged queries into the driver registry (any round
    with spare front slots)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

_DAY_US = 86_400_000_000


# ------------------------------------ periodogram of daily counts

# Candidate periods in days. 2..14 covers the Nyquist-legal short
# cycles through the two-week band; the weekly cycle (P=7) is the
# expected peak on human-driven event streams.
_PGRAM_PERIODS = tuple(range(2, 15))

# Literal trig spine: cos/sin of 2π·phase/P computed in PYTHON and
# embedded as 17-digit repr literals in BOTH engines. This is the
# whole determinism story — JVM Math.cos and libm cos are not
# guaranteed bit-identical for arbitrary arguments, so neither engine
# ever evaluates a trig function; they only multiply shared double
# literals. 104 rows total (Σ P for P in 2..14), broadcast-joined.
_PGRAM_SPINE = tuple(
    (p, ph, math.cos(2.0 * math.pi * ph / p), math.sin(2.0 * math.pi * ph / p))
    for p in _PGRAM_PERIODS
    for ph in range(p)
)


def _sql_periodogram() -> str:
    spine = ", ".join(
        f"({p}, {ph}, {c!r}, {s!r})" for p, ph, c, s in _PGRAM_SPINE
    )
    return f"""
        WITH daily AS (
          SELECT epoch_us(ts) // {_DAY_US} AS d,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1
        ),
        spine(p, ph, c, s) AS (VALUES {spine}),
        tot AS (
          SELECT CAST(min(d) AS BIGINT) AS d0,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS sy
          FROM daily
        ),
        periods(p) AS (
          SELECT unnest(range({_PGRAM_PERIODS[0]},
                              {_PGRAM_PERIODS[-1] + 1}))
        ),
        phased AS (
          SELECT periods.p,
                 CAST((daily.d - tot.d0) % periods.p AS INT) AS ph,
                 daily.y,
                 CAST(tot.sy AS DOUBLE) / tot.n AS ybar
          FROM daily CROSS JOIN tot CROSS JOIN periods
        ),
        terms AS (
          SELECT phased.p,
                 CAST((phased.y - phased.ybar) * sp.c
                      AS DECIMAL(38,12)) AS tc,
                 CAST((phased.y - phased.ybar) * sp.s
                      AS DECIMAL(38,12)) AS ts
          FROM phased
          JOIN spine sp
            ON sp.p = phased.p AND sp.ph = phased.ph
        ),
        spec AS (
          SELECT p, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(tc) AS DOUBLE) AS cc,
                 CAST(sum(ts) AS DOUBLE) AS ss
          FROM terms GROUP BY p
        )
        SELECT p AS period_days, n_days,
               {_SQL_Q6.format(x="(cc * cc + ss * ss) / n_days")} AS power
        FROM spec ORDER BY period_days
    """


@_staged(
    "ev_periodogram_daily",
    tags=("datapipe", "events", "spectral"),
    oracle=_sql_periodogram(),
)
def ev_periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the daily event-count series at the
    candidate periods 2..14 days: power(P) = (C² + S²)/n with
    C = Σ_d (y_d − ȳ)·cos(2π·idx_d/P), S likewise with sin. The
    frequency-domain complement of ev_acf_daily_counts — the ACF says
    "correlated at lag 7", the periodogram says which cycle carries
    the most variance (P=7 on human-driven streams).

    Determinism: no engine ever evaluates a trig function — cos/sin
    of every (period, phase) pair are Python-computed 17-digit repr
    literals shared by both engines (_PGRAM_SPINE), so each term is
    a product of identical doubles; terms are quantized to
    DECIMAL(38,12) BEFORE summing (the ACF per-pair precedent,
    ADVICE r10 — sum order becomes irrelevant and the ±1e12-count
    headroom at 100 TB fits 38,12), the day index is the epoch_us
    div recipe (no datediff parity risk), and the final power is one
    pinned double expression + the fleet _q6.

    Scale shape: ONE events scan → |days| daily frame; the 1-row
    (d0, n, Σy) scalar fans onto it (reviewed bounded-BNLJ class);
    the 104-row literal spine joins BROADCAST on the (P, phase)
    equi-key after a per-day modulo — never a corpus-sized cross
    join; the spectrum aggregate is |periods|-bounded (13 rows)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d")
        )
        .groupBy("d").agg(F.count("*").cast("long").alias("y"))
    )
    tot = daily.agg(
        F.min("d").cast("long").alias("d0"),
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    spine = F.broadcast(
        spark.createDataFrame(
            list(_PGRAM_SPINE), "p int, ph int, c double, s double"
        )
    )
    phased = (
        daily.join(F.broadcast(tot))
        .select(
            "d", "y",
            (F.col("sy").cast("double") / F.col("n")).alias("ybar"),
            F.explode(
                F.array(*[F.lit(p) for p in _PGRAM_PERIODS])
            ).alias("p"),
            F.col("d0"),
        )
        .select(
            "p", "y", "ybar",
            ((F.col("d") - F.col("d0")) % F.col("p"))
            .cast("int").alias("ph"),
        )
    )
    dev = F.col("y") - F.col("ybar")
    terms = phased.join(spine, ["p", "ph"]).select(
        "p",
        (dev * F.col("c")).cast("decimal(38,12)").alias("tc"),
        (dev * F.col("s")).cast("decimal(38,12)").alias("ts"),
    )
    return (
        terms.groupBy("p")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("tc").cast("double").alias("cc"),
            F.sum("ts").cast("double").alias("ss"),
        )
        .select(
            F.col("p").alias("period_days"),
            "n_days",
            _q6(
                (F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss"))
                / F.col("n_days")
            ).alias("power"),
        )
        .orderBy("period_days")
    )


# ------------------------------------ Gumbel block maxima

# Euler–Mascheroni, √6/π, and −ln(−ln(1−1/26)) as Python-computed
# shared literals — the return-level quantile factor never touches an
# engine ln.
_EULER_GAMMA = 0.5772156649015329
_SQRT6_OVER_PI = math.sqrt(6.0) / math.pi
_GUMBEL_BLOCKS = 26
_RET_FACTOR = -math.log(-math.log(1.0 - 1.0 / _GUMBEL_BLOCKS))


def _sql_gumbel() -> str:
    return f"""
        WITH daily AS (
          SELECT epoch_us(ts) // {_DAY_US} AS d,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1
        ),
        d0 AS (SELECT CAST(min(d) AS BIGINT) AS d0 FROM daily),
        blocks AS (
          SELECT (daily.d - d0.d0) // 7 AS w,
                 CAST(max(daily.y) AS BIGINT) AS m
          FROM daily CROSS JOIN d0 GROUP BY 1
        ),
        mom AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(m AS DECIMAL(19,0))) AS DOUBLE) AS sm,
                 CAST(sum(CAST(m AS DECIMAL(19,0))
                          * CAST(m AS DECIMAL(19,0))) AS DOUBLE) AS sq
          FROM blocks
        ),
        fit AS (
          SELECT n, sm / n AS mean,
                 CASE WHEN n < 2 THEN NULL
                      ELSE sqrt((sq - sm * sm / n) / (n - 1))
                           * {_SQRT6_OVER_PI!r}
                 END AS beta
          FROM mom
        )
        SELECT n AS n_blocks,
               {_SQL_Q6.format(x="mean")} AS block_mean,
               {_SQL_Q6.format(x=f"mean - {_EULER_GAMMA!r} * beta")}
                 AS gumbel_mu,
               {_SQL_Q6.format(x="beta")} AS gumbel_beta,
               {_SQL_Q6.format(
                   x=f"mean - {_EULER_GAMMA!r} * beta"
                     f" + beta * {_RET_FACTOR!r}")} AS return_level_26w
        FROM fit
    """


@_staged(
    "ev_gumbel_block_maxima",
    tags=("datapipe", "events", "extremes"),
    oracle=_sql_gumbel(),
)
def ev_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value fit of the daily event-count peaks: weekly block
    maxima → Gumbel(μ, β) by method of moments (β = s·√6/π,
    μ = m̄ − γβ), and the 26-block return level
    μ + β·(−ln(−ln(1−1/26))) — "the daily peak you should see about
    once a half-year". The capacity-planning number a mean+3σ rule
    silently understates for heavy-tailed peaks; block-maxima EVT is
    the principled version and is two bounded aggregates on top of
    the daily frame.

    Determinism: daily counts and block maxima are exact BIGINTs; the
    moment sums Σm and Σm² are carried in DECIMAL(19,0) products
    (m² at the 100-TB target overflows BIGINT — the Neyman precedent,
    ADVICE r10 — Spark would wrap silently, DuckDB would raise);
    γ, √6/π, and the return-level quantile factor are Python-computed
    shared literals so neither engine evaluates ln; sqrt is IEEE on
    both; the n<2 degenerate case yields NULL β (and NULL-propagated
    μ / return level) on both engines.

    Scale shape: ONE events scan → |days| daily frame → |weeks| block
    frame → a 1-row moment aggregate; the only join is the 1-row
    min-day scalar onto the daily frame (reviewed bounded-BNLJ
    class). Nothing downstream of the first aggregate exceeds the
    calendar span."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d")
        )
        .groupBy("d").agg(F.count("*").cast("long").alias("y"))
    )
    d0 = daily.agg(F.min("d").cast("long").alias("d0"))
    md = F.col("m").cast("decimal(19,0)")
    mom = (
        daily.join(F.broadcast(d0))
        .select(F.expr("(d - d0) div 7").alias("w"), "y")
        .groupBy("w").agg(F.max("y").cast("long").alias("m"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(md).cast("double").alias("sm"),
            F.sum(md * md).cast("double").alias("sq"),
        )
    )
    mean = F.col("sm") / F.col("n")
    beta = F.when(
        F.col("n") < 2, F.lit(None).cast("double")
    ).otherwise(
        F.sqrt(
            (F.col("sq") - F.col("sm") * F.col("sm") / F.col("n"))
            / (F.col("n") - 1)
        ) * F.lit(_SQRT6_OVER_PI)
    )
    fit = mom.select(F.col("n"), mean.alias("mean"), beta.alias("beta"))
    mu = F.col("mean") - F.lit(_EULER_GAMMA) * F.col("beta")
    return fit.select(
        F.col("n").alias("n_blocks"),
        _q6(F.col("mean")).alias("block_mean"),
        _q6(mu).alias("gumbel_mu"),
        _q6(F.col("beta")).alias("gumbel_beta"),
        _q6(mu + F.col("beta") * F.lit(_RET_FACTOR)).alias(
            "return_level_26w"
        ),
    )


# ------------------------------------ Benjamini–Hochberg FDR

_BH_Q = 0.10


def _sql_bh_fdr() -> str:
    return f"""
        WITH mid AS (
          SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
          FROM events
        ),
        eras AS (
          SELECT event_type,
                 CASE WHEN epoch_us(ts) <= mid.mid THEN 0 ELSE 1 END AS era,
                 CAST(value AS DECIMAL(18,6)) AS v
          FROM events CROSS JOIN mid
        ),
        per_type AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
                 CAST(sum(CASE WHEN era = 0 THEN v END) AS DECIMAL(38,6))
                   AS sv1,
                 CAST(sum(CASE WHEN era = 1 THEN v END) AS DECIMAL(38,6))
                   AS sv2,
                 CAST(sum(CASE WHEN era = 0 THEN v * v END)
                      AS DECIMAL(38,12)) AS sq1,
                 CAST(sum(CASE WHEN era = 1 THEN v * v END)
                      AS DECIMAL(38,12)) AS sq2
          FROM eras GROUP BY event_type
        ),
        stats AS (
          SELECT event_type, n1, n2,
                 CASE WHEN n1 < 2 OR n2 < 2 THEN NULL ELSE
                   (CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2)
                   / sqrt(
                       (CAST(sq1 AS DOUBLE)
                        - CAST(sv1 AS DOUBLE) * CAST(sv1 AS DOUBLE) / n1)
                       / (n1 - 1) / n1
                       + (CAST(sq2 AS DOUBLE)
                          - CAST(sv2 AS DOUBLE) * CAST(sv2 AS DOUBLE) / n2)
                       / (n2 - 1) / n2
                     )
                 END AS z
          FROM per_type
        ),
        pvals AS (
          SELECT event_type, n1, n2,
                 CASE WHEN z IS NULL OR z * z = 0 THEN 1.0
                      ELSE least(1.0, 1.0 / (z * z))
                 END AS p,
                 coalesce(z * z, 0.0) AS z2
          FROM stats
        ),
        ranked AS (
          SELECT event_type, n1, n2, p, z2,
                 row_number() OVER (ORDER BY p, event_type) AS r,
                 count(*) OVER () AS m
          FROM pvals
        ),
        cut AS (
          SELECT *,
                 max(CASE WHEN p <= r * {_BH_Q!r} / m THEN r END) OVER ()
                   AS kstar
          FROM ranked
        )
        SELECT event_type,
               n1 AS n_early, n2 AS n_late,
               {_SQL_Q6.format(x="z2")} AS z_squared,
               {_SQL_Q6.format(x="p")} AS p_chebyshev,
               CAST(r AS BIGINT) AS bh_rank,
               {_SQL_Q6.format(x=f"r * {_BH_Q!r} / m")} AS bh_threshold,
               CASE WHEN kstar IS NOT NULL AND r <= kstar
                    THEN TRUE ELSE FALSE END AS discovered
        FROM cut ORDER BY bh_rank
    """


@_staged(
    "ev_bh_fdr_event_types",
    tags=("datapipe", "events", "stats"),
    oracle=_sql_bh_fdr(),
)
def ev_bh_fdr_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (q = 0.10) over per-event-type
    location shifts between the early and late halves of the stream:
    Welch-style z per type, a distribution-free Chebyshev p-value
    p = min(1, 1/z²), then the BH step-up — the multiple-comparisons
    correction every "which segments moved?" dashboard needs and
    almost none apply. Chebyshev (not a normal CDF) is deliberate
    twice over: event values are heavy-tailed so the conservative
    bound is the defensible p, and neither engine has a portable
    erf — the normal tail would force a non-shared approximation.

    Determinism: the era midpoint is the integer-div epoch recipe
    (the CUPED precedent, ADVICE r10); per-era sums carry
    DECIMAL(38,6) / DECIMAL(38,12) (v² of the money-recipe values —
    exact on both engines); z is one pinned double expression over
    the exact sums; p and the BH thresholds are pure arithmetic on
    identical doubles; ranks tie-break on (p, event_type) so the
    step-up is order-deterministic; types with n<2 in either era get
    p = 1 (never discovered) on both engines.

    Scale shape: ONE events scan with the 1-row midpoint scalar
    fanned on (reviewed bounded-BNLJ class), one per-(type, era)
    partial-aggregated rollup, then row_number/count/max windows over
    the |event_type|-bounded frame (reviewed bounded-global-window
    class — the frame is the type catalog, never the corpus)."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("mid")
    )
    v = F.col("value").cast("decimal(18,6)")
    eras = ev.join(F.broadcast(mid)).select(
        "event_type",
        F.when(F.unix_micros(F.col("ts")) <= F.col("mid"), 0)
        .otherwise(1).alias("era"),
        v.alias("v"),
    )
    per_type = eras.groupBy("event_type").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0))
        .cast("long").alias("n2"),
        F.sum(F.when(F.col("era") == 0, F.col("v")))
        .cast("decimal(38,6)").alias("sv1"),
        F.sum(F.when(F.col("era") == 1, F.col("v")))
        .cast("decimal(38,6)").alias("sv2"),
        F.sum(F.when(F.col("era") == 0, F.col("v") * F.col("v")))
        .cast("decimal(38,12)").alias("sq1"),
        F.sum(F.when(F.col("era") == 1, F.col("v") * F.col("v")))
        .cast("decimal(38,12)").alias("sq2"),
    )
    sv1d, sv2d = F.col("sv1").cast("double"), F.col("sv2").cast("double")
    sq1d, sq2d = F.col("sq1").cast("double"), F.col("sq2").cast("double")
    z = F.when(
        (F.col("n1") < 2) | (F.col("n2") < 2), F.lit(None).cast("double")
    ).otherwise(
        (sv1d / F.col("n1") - sv2d / F.col("n2"))
        / F.sqrt(
            (sq1d - sv1d * sv1d / F.col("n1"))
            / (F.col("n1") - 1) / F.col("n1")
            + (sq2d - sv2d * sv2d / F.col("n2"))
            / (F.col("n2") - 1) / F.col("n2")
        )
    )
    stats = per_type.select("event_type", "n1", "n2", z.alias("z"))
    p = F.when(
        F.col("z").isNull() | (F.col("z") * F.col("z") == 0), F.lit(1.0)
    ).otherwise(F.least(F.lit(1.0), F.lit(1.0) / (F.col("z") * F.col("z"))))
    pvals = stats.select(
        "event_type", "n1", "n2", p.alias("p"),
        F.coalesce(F.col("z") * F.col("z"), F.lit(0.0)).alias("z2"),
    )
    from pyspark.sql import Window as W

    w_all = W.orderBy("p", "event_type")
    w_frame = W.partitionBy()
    ranked = pvals.select(
        "*",
        F.row_number().over(w_all).alias("r"),
        F.count("*").over(w_frame).alias("m"),
    )
    cut = ranked.withColumn(
        "kstar",
        F.max(
            F.when(
                F.col("p") <= F.col("r") * F.lit(_BH_Q) / F.col("m"),
                F.col("r"),
            )
        ).over(w_frame),
    )
    return cut.select(
        "event_type",
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        _q6(F.col("z2")).alias("z_squared"),
        _q6(F.col("p")).alias("p_chebyshev"),
        F.col("r").cast("long").alias("bh_rank"),
        _q6(F.col("r") * F.lit(_BH_Q) / F.col("m")).alias("bh_threshold"),
        (F.col("kstar").isNotNull() & (F.col("r") <= F.col("kstar")))
        .alias("discovered"),
    ).orderBy("bh_rank")


# ------------------------------------ histogram quantile audit

_HQ_BINS = 256
_HQ_QS = (0.5, 0.9, 0.99)


def _sql_hist_quantile() -> str:
    qcols = ", ".join(
        f"quantile_cont(o_totalprice, {q!r}) AS e{i}"
        for i, q in enumerate(_HQ_QS)
    )
    evals = " UNION ALL ".join(
        f"SELECT {q!r} AS q, e{i} AS exact_q FROM ex"
        for i, q in enumerate(_HQ_QS)
    )
    return f"""
        WITH mm AS (
          SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders
        ),
        bins AS (
          SELECT least({_HQ_BINS - 1},
                       CAST(floor((o_totalprice - mm.mn)
                                  / ((mm.mx - mm.mn) / {_HQ_BINS}))
                            AS INT)) AS b,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM orders CROSS JOIN mm
          GROUP BY 1
        ),
        cum AS (
          SELECT b, cnt,
                 sum(cnt) OVER (ORDER BY b) AS cum
          FROM bins
        ),
        ex AS (SELECT {qcols} FROM orders),
        exact_q AS ({evals}),
        spine(q) AS (VALUES ({_HQ_QS[0]!r}), ({_HQ_QS[1]!r}),
                            ({_HQ_QS[2]!r})),
        hit AS (
          SELECT spine.q, min(cum.b) AS bstar
          FROM spine CROSS JOIN mm
          JOIN cum ON cum.cum >= spine.q * mm.n
          GROUP BY spine.q
        ),
        est AS (
          SELECT hit.q,
                 mm.n,
                 (mm.mx - mm.mn) / {_HQ_BINS} AS w,
                 mm.mn + ((mm.mx - mm.mn) / {_HQ_BINS})
                   * (cum.b + (hit.q * mm.n - (cum.cum - cum.cnt))
                              / cum.cnt) AS est_v
          FROM hit
          JOIN cum ON cum.b = hit.bstar
          CROSS JOIN mm
        )
        SELECT est.q,
               est.n AS n_rows,
               {_SQL_Q6.format(x="est.est_v")} AS est_quantile,
               {_SQL_Q6.format(x="exact_q.exact_q")} AS exact_quantile,
               {_SQL_Q6.format(x="abs(est.est_v - exact_q.exact_q)")}
                 AS abs_err,
               {_SQL_Q6.format(x="est.w")} AS bin_width
        FROM est JOIN exact_q ON est.q = exact_q.q
        ORDER BY est.q
    """


@_staged(
    "sk_histogram_quantile_audit",
    tags=("datapipe", "sketches", "profiling"),
    oracle=_sql_hist_quantile(),
)
def sk_histogram_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile sketch audited against exact
    percentiles: one 256-bin histogram of o_totalprice (the mergeable
    one-pass sketch every engine can maintain map-side), quantiles
    read off the cumulative bins with within-bin linear
    interpolation, and the error vs the exact sort-based percentile —
    with the bin width reported as the sketch's resolution: the
    histogram pins the CDF-inverse quantile to one bin, so the error
    vs the exact type-7 percentile converges to ≤ one bin width as n
    grows (the two quantile conventions themselves differ by O(1/n)
    observations at small n — the fixture exercises exactly that
    gap). The quantile analog of sk_cms_error_audit: report the
    error the sketch actually made next to its resolution.

    Determinism: bin indexing is one pinned double expression over
    the exact 1-row (min, max) scalar (identical parquet doubles →
    identical bins on both engines); bin counts and the cumulative
    sums are exact BIGINTs; the interpolation is pure arithmetic on
    exact counts; the exact side is Spark `percentile` == DuckDB
    `quantile_cont` (the agg_exact_percentiles parity precedent —
    exact sorts, the documented trade vs approx_percentile at the
    100-TB target where this audit would sample first).

    Scale shape: ONE orders scan for the histogram (map-side combine
    to ≤256 partials per partition), ONE for the exact percentiles;
    the 1-row min/max scalar and the 3-row quantile spine fan onto
    bounded frames (reviewed bounded-BNLJ class); the cumulative
    window orders the ≤256-bin frame (reviewed bounded-global-window
    class — the frame is the bin catalog, never the corpus)."""
    orders = load(spark, sf_dir, "orders")
    mm = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count("*").cast("long").alias("n"),
    )
    w_expr = (F.col("mx") - F.col("mn")) / F.lit(_HQ_BINS)
    bins = (
        orders.join(F.broadcast(mm))
        .select(
            F.least(
                F.lit(_HQ_BINS - 1),
                F.floor((F.col("o_totalprice") - F.col("mn")) / w_expr)
                .cast("int"),
            ).alias("b")
        )
        .groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    )
    from pyspark.sql import Window as W

    cum = bins.select(
        "b", "cnt", F.sum("cnt").over(W.partitionBy().orderBy("b")).alias("cum")
    )
    exact = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q!r})").alias(f"e{i}")
            for i, q in enumerate(_HQ_QS)
        ]
    )
    exact_q = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"), F.col(f"e{i}").alias("exact_q")
                    )
                    for i, q in enumerate(_HQ_QS)
                ]
            )
        ).alias("x")
    ).select("x.q", "x.exact_q")
    spine = spark.createDataFrame([(q,) for q in _HQ_QS], "q double")
    hit = (
        F.broadcast(spine)
        .join(F.broadcast(mm))
        .join(cum, F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q").agg(F.min("b").alias("bstar"))
    )
    est = (
        hit.join(cum, F.col("b") == F.col("bstar"))
        .join(F.broadcast(mm))
        .select(
            "q",
            F.col("n").alias("n_rows"),
            w_expr.alias("w"),
            (
                F.col("mn")
                + w_expr
                * (
                    F.col("b")
                    + (F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                )
            ).alias("est_v"),
        )
    )
    return (
        est.join(exact_q, "q")
        .select(
            "q",
            "n_rows",
            _q6(F.col("est_v")).alias("est_quantile"),
            _q6(F.col("exact_q")).alias("exact_quantile"),
            _q6(F.abs(F.col("est_v") - F.col("exact_q"))).alias("abs_err"),
            _q6(F.col("w")).alias("bin_width"),
        )
        .orderBy("q")
    )


# ------------------------------------ Theil–Sen robust trend


def _sql_theil_sen() -> str:
    return f"""
        WITH daily AS (
          SELECT epoch_us(o_orderdate) // {_DAY_US} AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                      AS DECIMAL(38,6)) AS rev
          FROM orders GROUP BY 1
        ),
        d0 AS (SELECT CAST(min(d) AS BIGINT) AS d0 FROM daily),
        idx AS (
          SELECT CAST(daily.d - d0.d0 AS BIGINT) AS i,
                 CAST(rev AS DOUBLE) AS r
          FROM daily CROSS JOIN d0
        ),
        pairs AS (
          SELECT (b.r - a.r) / (b.i - a.i) AS slope
          FROM idx a JOIN idx b ON a.i < b.i
        ),
        sen AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 quantile_cont(slope, 0.5) AS slope
          FROM pairs
        ),
        res AS (
          SELECT CAST(count(*) AS BIGINT) AS n_days,
                 quantile_cont(idx.r - sen.slope * idx.i, 0.5) AS icept,
                 any_value(sen.n_pairs) AS n_pairs,
                 any_value(sen.slope) AS slope
          FROM idx CROSS JOIN sen
        )
        SELECT n_days, n_pairs,
               {_SQL_Q6.format(x="slope")} AS sen_slope,
               {_SQL_Q6.format(x="icept")} AS sen_intercept
        FROM res
    """


@_staged(
    "pf_theil_sen_daily_revenue",
    tags=("datapipe", "profiling", "robust"),
    oracle=_sql_theil_sen(),
)
def pf_theil_sen_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order revenue: the median of
    all pairwise slopes (and the median-residual intercept) — the
    trend line with a 29% breakdown point, vs the OLS line
    (ev_trend_daily's machinery) a single promo-day outlier can
    steer. The robust-regression entry the profiling family lacked.

    Determinism: daily revenue is the DECIMAL(18,6)→(38,6) money
    recipe (exact), the day index is the epoch_us div recipe; each
    pairwise slope is one pinned double division of exact inputs;
    both medians are exact interpolated quantiles (Spark
    `percentile` == DuckDB `quantile_cont`).

    Scale shape: the pair enumeration is a non-equi self-join on the
    DAILY frame — |days|², bounded by the calendar span squared
    (~1e6 cells for three years), never the corpus (reviewed
    bounded-BNLJ class, like the Little's-law spine); the corpus
    itself is touched by exactly ONE scan into the daily rollup. The
    1-row min-day and slope scalars fan onto bounded frames."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr(
                f"unix_micros(cast(o_orderdate as timestamp))"
                f" div {_DAY_US}"
            ).alias("d"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("p"),
        )
        .groupBy("d").agg(F.sum("p").cast("decimal(38,6)").alias("rev"))
    )
    d0 = daily.agg(F.min("d").cast("long").alias("d0"))
    idx = daily.join(F.broadcast(d0)).select(
        (F.col("d") - F.col("d0")).cast("long").alias("i"),
        F.col("rev").cast("double").alias("r"),
    )
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = a.join(b, F.col("a.i") < F.col("b.i")).select(
        ((F.col("b.r") - F.col("a.r")) / (F.col("b.i") - F.col("a.i")))
        .alias("slope")
    )
    sen = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("slope"),
    )
    res = (
        idx.join(F.broadcast(sen))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.expr("percentile(r - slope * i, 0.5)").alias("icept"),
            F.first("n_pairs").alias("n_pairs"),
            F.first("slope").alias("slope"),
        )
    )
    return res.select(
        "n_days", "n_pairs",
        _q6(F.col("slope")).alias("sen_slope"),
        _q6(F.col("icept")).alias("sen_intercept"),
    )


# ------------------------------------ functional-dependency audit

# Candidate FDs (relation, determinant, dependent). The first and
# fifth hold by construction (keys); the rest are the plausible-but-
# false invariants a pipeline might assume — the audit quantifies how
# false.
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "event_id", "user_id"),
    ("events", "user_id", "event_type"),
)


def _sql_fd_audit() -> str:
    parts = []
    for rel, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
        SELECT '{rel}' AS rel, '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violating_lhs,
               CAST(max(nv) AS BIGINT) AS max_fanout,
               {_SQL_Q6.format(
                   x="CAST(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END)"
                     " AS DOUBLE) / count(*)")} AS violation_rate,
               sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
        FROM (
          SELECT {lhs}, count(*) AS nv
          FROM (SELECT DISTINCT {lhs}, {rhs} FROM {rel})
          GROUP BY {lhs}
        )""")
    return (" UNION ALL ".join(parts)
            + " ORDER BY rel, lhs_col, rhs_col")


@_staged(
    "pf_fd_violation_audit",
    tags=("datapipe", "profiling", "schema"),
    oracle=_sql_fd_audit(),
)
def pf_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over assumed intra-table
    invariants: for each candidate determinant → dependent pair, the
    share of determinant values that map to MORE than one dependent
    value (violation rate), the worst fan-out, and a holds flag. The
    intra-table complement of pf_fk_candidate_audit's cross-table
    containment — together they are the schema-discovery pass that
    validates the invariants a pipeline silently assumes before it
    groups, joins, or dedups on them.

    Determinism: counting only — DISTINCT pairs, exact BIGINT counts,
    one pinned double division for the rate; the candidate list is a
    shared literal; output ordered by the candidate key.

    Scale shape: per candidate ONE scan → map-side-combined DISTINCT
    on the (lhs, rhs) equi-key → a per-lhs count → a 1-row rollup;
    six bounded-output aggregates unioned — no join anywhere, so
    nothing to go quadratic. At the 100-TB target each candidate is
    exactly the cost of one distinct-aggregate over its table."""
    out = None
    for rel, lhs, rhs in _FD_CANDIDATES:
        t = load(spark, sf_dir, rel)
        per_lhs = (
            t.select(F.col(lhs).alias("lhs"), F.col(rhs).alias("rhs"))
            .distinct()
            .groupBy("lhs").agg(F.count("*").alias("nv"))
        )
        row = per_lhs.agg(
            F.count("*").cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
            .cast("long").alias("violating_lhs"),
            F.max("nv").cast("long").alias("max_fanout"),
        ).select(
            F.lit(rel).alias("rel"),
            F.lit(lhs).alias("lhs_col"),
            F.lit(rhs).alias("rhs_col"),
            "n_lhs", "violating_lhs", "max_fanout",
            _q6(
                F.col("violating_lhs").cast("double") / F.col("n_lhs")
            ).alias("violation_rate"),
            (F.col("violating_lhs") == 0).alias("fd_holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rel", "lhs_col", "rhs_col")
