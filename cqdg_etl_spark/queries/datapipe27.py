"""Round-19 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→26: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe27.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 11–18 belong to the
datapipe19–26 publications; these wait their turn by design.

To publish (round 19): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe27.py::_BNLJ_OK /
_GLOBAL_WINDOW_OK into the fleet lint (the orphan test enforces the
copies).

Batch theme: uncertainty and allocation — putting error bars and
budgets on what the other queries report. Wilson confidence intervals
on per-type user reach (the interval that stays sane at p→0/1 where
the Wald CI breaks), the diagonal participation ratio of the
embedding space (effective dimensionality — how many of the 64 dims
carry signal), a Count-Min error audit (measured overestimate
distribution vs the εN guarantee — the calibration read before
trusting sketch counts), Neyman optimal sample allocation across
sources (minimum-variance stratified sampling, exact integer
largest-remainder rounding), Tukey-fence outlier rates per source
(the IQR robustness screen), and 3-step absorption probability into
'purchase' (first-passage mass of the behavioral Markov chain). No
reference counterpart (Ferlab-Ste-Justine/cqdg-etl has no analytics
of this kind); every shape is chosen for the 100-TB target and
documented per query.
"""

from __future__ import annotations

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
    """Publish the staged queries into the driver registry (round 19)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

_Z95 = 1.959964  # two-sided 95%


# ------------------------------------ Wilson CI on user reach


@_staged(
    "ev_reach_wilson_ci",
    tags=("datapipe", "events", "stats"),
    oracle=f"""
        WITH tot AS (
          SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events
        ),
        reach AS (
          SELECT event_type,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS k
          FROM events GROUP BY event_type
        ),
        base AS (
          SELECT event_type, k, tot.n,
                 CAST(k AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p,
                 {_Z95} * {_Z95} / CAST(tot.n AS DOUBLE) AS zz
          FROM reach CROSS JOIN tot
        )
        SELECT event_type, n AS n_users, k AS n_reached,
               {_SQL_Q6.format(x="p")} AS p_hat,
               {_SQL_Q6.format(
                   x=f'''(p + zz / 2.0
                          - {_Z95} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                          + zz * zz / 4.0
                                            / ({_Z95} * {_Z95})))
                         / (1.0 + zz)''')} AS ci_low,
               {_SQL_Q6.format(
                   x=f'''(p + zz / 2.0
                          + {_Z95} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                                          + zz * zz / 4.0
                                            / ({_Z95} * {_Z95})))
                         / (1.0 + zz)''')} AS ci_high
        FROM base ORDER BY event_type
    """,
)
def ev_reach_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type user reach (share of all users with ≥1 event of
    the type) with the Wilson 95% score interval — the CI that stays
    inside [0, 1] and stays honest at p̂ → 0 or 1 where the naive
    Wald ±z√(p(1−p)/n) collapses to a zero-width lie. The error bar
    every reach/conversion dashboard should carry; k = n (every user
    reached) still yields a sub-1 lower bound, exactly the right
    skepticism at small n.

    Wilson: (p̂ + z²/2n ± z√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). The
    z²/4n² term is written as zz·zz/4/z² with zz = z²/n — the SAME
    textual chain on both engines, so the IEEE result is identical;
    quantized at 6 dp. No degenerate guards needed: n ≥ 1 whenever a
    row exists and the radicand is non-negative by construction.

    Scale shape: one distinct (type, user) aggregate + one distinct
    user count, a 1-row total fanned onto the |types| frame (the
    reviewed bounded-BNLJ class)."""
    ev = load(spark, sf_dir, "events")
    tot = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    reach = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("k")
    )
    base = reach.join(F.broadcast(tot)).select(
        "event_type", "k", "n",
        (F.col("k").cast("double") / F.col("n").cast("double")).alias("p"),
        (F.lit(_Z95) * F.lit(_Z95) / F.col("n").cast("double")).alias("zz"),
    )
    p, zz = F.col("p"), F.col("zz")
    rad = F.sqrt(
        p * (1.0 - p) / F.col("n").cast("double")
        + zz * zz / 4.0 / (_Z95 * _Z95)
    )
    return base.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("k").alias("n_reached"),
        _q6(p).alias("p_hat"),
        _q6((p + zz / 2.0 - _Z95 * rad) / (1.0 + zz)).alias("ci_low"),
        _q6((p + zz / 2.0 + _Z95 * rad) / (1.0 + zz)).alias("ci_high"),
    ).orderBy("event_type")


# ------------------------------------ participation ratio

_DIM = 64


@_staged(
    "emb_effective_dim_diag",
    tags=("datapipe", "embedding", "spectrum"),
    oracle=f"""
        WITH f AS (
          SELECT k AS d, CAST(embedding[k] AS DOUBLE) AS x
          FROM embeddings, range(1, {_DIM} + 1) t(k)
        ),
        st AS (
          SELECT d, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s,
                 CAST(sum(CAST(x * x AS DECIMAL(38,12)))
                      AS DECIMAL(38,12)) AS q
          FROM f GROUP BY d
        ),
        lam AS (
          SELECT d,
                 CAST({_SQL_Q6.format(
                     x='''CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))''')}
                   AS DECIMAL(18,6)) AS v
          FROM st
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS dims,
                 CAST(sum(v) AS DECIMAL(38,6)) AS sv,
                 CAST(sum(v * v) AS DECIMAL(38,12)) AS qv,
                 CAST(max(v) AS DECIMAL(18,6)) AS mx
          FROM lam
        )
        SELECT dims,
               {_SQL_Q6.format(x="CAST(sv AS DOUBLE)")} AS total_variance,
               CASE WHEN CAST(qv AS DOUBLE) > 0 THEN
                 {_SQL_Q6.format(
                     x='''CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                        / CAST(qv AS DOUBLE)''')}
               END AS participation_ratio,
               CASE WHEN CAST(sv AS DOUBLE) > 0 THEN
                 {_SQL_Q6.format(
                     x="CAST(mx AS DOUBLE) / CAST(sv AS DOUBLE)")}
               END AS top1_var_share
        FROM agg
    """,
)
def emb_effective_dim_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective dimensionality of the embedding space under the
    diagonal (per-dimension variance) spectrum: participation ratio
    PR = (Σλ)²/Σλ² ∈ [1, d] — d when variance is spread evenly, → 1
    under representation collapse — plus the top-1 variance share.
    The cheap anisotropy read next to emb_covariance_cells (full
    matrix) and the staged power-iteration PC: PR needs no
    eigensolve, so it runs as a routine health check.

    Determinism: per-dim sums are exact DECIMAL(38,12) accumulations
    (the fleet embedding recipe); each population variance is one
    pinned chain quantized at 6 dp into decimal; the PR sums over the
    d-row frame are exact decimals and the two ratios are pinned,
    NULL-guarded for the all-zero corpus (Σλ² = 0).

    Scale shape: one posexplode aggregate to the d-row frame, one
    d-row rollup — no join anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    f = emb.select(
        F.posexplode(F.col("embedding")).alias("d0", "xf")
    ).select(
        (F.col("d0") + 1).alias("d"), F.col("xf").cast("double").alias("x")
    )
    st = f.groupBy("d").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,12)"))
        .cast("decimal(38,12)").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .cast("decimal(38,12)").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    lam = st.select(
        _q6(F.col("q").cast("double") / F.col("n").cast("double") - mu * mu)
        .cast("decimal(18,6)").alias("v")
    )
    agg = lam.agg(
        F.count("*").cast("long").alias("dims"),
        F.sum("v").cast("decimal(38,6)").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("qv"),
        F.max("v").cast("decimal(18,6)").alias("mx"),
    )
    return agg.select(
        "dims",
        _q6(F.col("sv").cast("double")).alias("total_variance"),
        F.when(
            F.col("qv").cast("double") > 0,
            _q6(
                F.col("sv").cast("double") * F.col("sv").cast("double")
                / F.col("qv").cast("double")
            ),
        ).alias("participation_ratio"),
        F.when(
            F.col("sv").cast("double") > 0,
            _q6(F.col("mx").cast("double") / F.col("sv").cast("double")),
        ).alias("top1_var_share"),
    )


# ------------------------------------ CMS error audit


@_staged(
    "sk_cms_error_audit",
    tags=("datapipe", "sketch", "calibration"),
    oracle=f"""
        WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
        ),
        ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
        hashes AS (
          SELECT d,
                 CAST(CAST(concat('0x', substr(md5(concat(d, ':', token)),
                                               1, 8))
                      AS BIGINT) % 1024 AS INTEGER) AS bucket
          FROM toks CROSS JOIN ds
        ),
        sketch AS (
          SELECT d, bucket, count(*) AS cnt FROM hashes GROUP BY d, bucket
        ),
        exact AS (
          SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM toks GROUP BY token
        ),
        est AS (
          SELECT e.token, e.exact_cnt,
                 CAST(min(s.cnt) AS BIGINT) AS cms
          FROM exact e
          CROSS JOIN ds
          JOIN sketch s
            ON s.d = ds.d
           AND s.bucket = CAST(CAST(concat('0x',
                 substr(md5(concat(ds.d, ':', e.token)), 1, 8))
                 AS BIGINT) % 1024 AS INTEGER)
          GROUP BY e.token, e.exact_cnt
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS stream FROM toks)
        SELECT CAST(count(*) AS BIGINT) AS n_tokens,
               any_value(n.stream) AS stream_size,
               CAST(sum(CASE WHEN cms = exact_cnt THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact,
               CAST(max(cms - exact_cnt) AS BIGINT) AS max_overestimate,
               {_SQL_Q6.format(
                   x='''CAST(sum(cms - exact_cnt) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)''')} AS mean_overestimate,
               {_SQL_Q6.format(
                   x='''CAST(sum(CASE WHEN CAST(cms - exact_cnt AS DOUBLE)
                                   <= 2.718281828459045 / 1024.0
                                      * CAST(n.stream AS DOUBLE)
                              THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE)''')}
                 AS frac_within_bound
        FROM est CROSS JOIN n
    """,
)
def sk_cms_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch error audit over EVERY distinct token (not
    just the heavy hitters): the measured overestimate distribution —
    how many tokens the depth-4 × width-1024 sketch counts exactly,
    the worst overestimate, the mean, and the fraction within the
    theoretical εN bound (ε = e/width; the guarantee holds per query
    with probability 1 − e^{{−depth}} ≈ 98.2%, so frac_within_bound
    should sit near-or-above that). The calibration a pipeline reads
    before replacing exact token counts with the sketch at 100 TB —
    sk_kmv_distinct_users' companion for the frequency (not
    cardinality) axis.

    Determinism: the sketch is the fleet md5-bucket recipe (engine-
    portable, the tx_cms_heavy_hitters oracle recipe verbatim);
    overestimates are exact integers (CMS error is one-sided by
    construction — an estimate below exact would be a bug this audit
    would surface as a negative max); the two ratios are pinned
    chains quantized at 6 dp.

    Scale shape: one token aggregate for exact counts, one
    depth×width-bounded sketch aggregate, a broadcast sketch join
    onto the distinct-token frame (sketches.cms_estimate), one 1-row
    rollup with the stream-size scalar (the reviewed bounded-BNLJ
    class). The exact side is the expensive one — at 100 TB the audit
    runs on a sampled token slice, documented here."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens
    from cqdg_etl_spark.operators import sketches

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        normalize_ws(F.col("text")).alias("norm")
    ).filter(F.col("norm") != "").select(
        F.explode(tokens(F.col("norm"))).alias("token")
    )
    sketch = sketches.count_min_sketch(toks, "token")
    exact = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    est = sketches.cms_estimate(sketch, exact, "token")
    n = toks.agg(F.count("*").cast("long").alias("stream"))
    over = F.col("cms_estimate") - F.col("exact_cnt")
    bound = F.lit(2.718281828459045 / 1024.0) * F.col("stream").cast("double")
    return (
        est.join(F.broadcast(n))
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.first("stream").alias("stream_size"),
            F.sum(F.when(over == 0, 1).otherwise(0))
            .cast("long").alias("n_exact"),
            F.max(over).cast("long").alias("max_overestimate"),
            _q6(F.sum(over).cast("double") / F.count("*").cast("double"))
            .alias("mean_overestimate"),
            _q6(
                F.sum(
                    F.when(over.cast("double") <= bound, 1).otherwise(0)
                ).cast("double")
                / F.count("*").cast("double")
            ).alias("frac_within_bound"),
        )
    )


# ------------------------------------ Neyman allocation

_NEYMAN_BUDGET = 1000


@_staged(
    "ds_neyman_allocation",
    tags=("datapipe", "sampling", "allocation"),
    oracle=f"""
        WITH s AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS nh,
                 CAST(sum(CAST(n_chars AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS sx,
                 CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
                      AS DECIMAL(38,0)) AS qx
          FROM documents GROUP BY source
        ),
        sig AS (
          SELECT source, nh,
                 CASE WHEN nh >= 2 THEN
                   CAST(floor(sqrt(
                     (CAST(nh AS DOUBLE) * CAST(qx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)))
                     * 1000000.0 + 0.5) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS s6
          FROM s
        ),
        w AS (
          -- HUGEINT (int128), not BIGINT: 1000*nh*s6 wraps int64 for
          -- moderately large strata (~1e7 docs at sigma~5e3 chars);
          -- mirrors Spark's DECIMAL(38,0) carry (ADVICE r10).
          SELECT source, nh, CAST(nh AS HUGEINT) * s6 AS m FROM sig
        ),
        t AS (SELECT CAST(sum(m) AS HUGEINT) AS tot FROM w),
        quota AS (
          SELECT source, nh, m,
                 CAST(({_NEYMAN_BUDGET} * m) // tot AS BIGINT) AS base,
                 ({_NEYMAN_BUDGET} * m) % tot AS rem
          FROM w CROSS JOIN t WHERE tot > 0
        ),
        lo AS (
          SELECT CAST({_NEYMAN_BUDGET} - sum(base) AS BIGINT) AS leftover
          FROM quota
        ),
        rk AS (
          SELECT source, nh, base, rem,
                 row_number() OVER (ORDER BY rem DESC, source) AS r
          FROM quota
        )
        SELECT source, nh AS n_docs,
               CAST(base + CASE WHEN r <= lo.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS n_alloc
        FROM rk CROSS JOIN lo
        ORDER BY source
    """,
)
def ds_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a 1000-sample budget (the
    _NEYMAN_BUDGET literal) across
    sources: n_h ∝ N_h·σ_h (stratum size × stratum std of document
    length) — the minimum-variance stratified design, vs the
    proportional-only allocation ds_stratified_sample uses; a
    high-variance source gets oversampled exactly as much as its
    heterogeneity warrants. Single-document strata carry σ := 0 and
    receive 0 (no variance to estimate — documented); the whole
    result is empty when every stratum is degenerate (Σ N·σ = 0).

    EXACT integer arithmetic end to end (no float floor at a quota
    boundary): σ_h is quantized ONCE to integer micro-units
    s6 = floor(σ·10⁶ + ½) from the pinned sample-variance chain on
    exact integer sums; weights m_h = N_h·s6 are exact integers;
    base_h = (B·m_h) div (Σm) and remainder (B·m_h) mod (Σm) are
    exact integer division; the leftover B − Σbase goes to the
    largest remainders via the range-partitioned ``global_rank``
    (ties → source name). Σ n_alloc = B exactly, pinned by the
    fixture test.

    Scale shape: one per-source aggregate, one 1-row total fan-out
    (the reviewed bounded-BNLJ class), one range-partitioned rank
    over the |sources| frame."""
    from cqdg_etl_spark.operators.ranking import global_rank

    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum(F.col("n_chars").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars"))
        .cast("decimal(38,0)").alias("qx"),
    )
    nhd = F.col("nh").cast("double")
    var = (
        (nhd * F.col("qx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        / (nhd * (F.col("nh") - 1).cast("double"))
    )
    sig = s.select(
        "source", "nh",
        F.when(
            F.col("nh") >= 2,
            F.floor(F.sqrt(var) * 1000000.0 + 0.5).cast("long"),
        ).otherwise(F.lit(0)).alias("s6"),
    )
    # DECIMAL(38,0), not BIGINT: 1000*nh*s6 wraps int64 for moderately
    # large strata (~1e7 docs at sigma~5e3 chars) and Spark's non-ANSI
    # long multiply wraps SILENTLY while DuckDB errors loudly —
    # breaking the exact-integer contract (ADVICE r10). The quotient
    # base <= B fits long; the remainder stays decimal (sort key only).
    w = sig.select(
        "source", "nh",
        (F.col("nh").cast("decimal(38,0)") * F.col("s6")).alias("m"),
    )
    t = w.agg(F.sum("m").cast("decimal(38,0)").alias("tot"))
    quota = (
        w.join(F.broadcast(t))
        .filter(F.col("tot") > 0)
        .select(
            "source", "nh",
            F.expr(f"({_NEYMAN_BUDGET} * m) div tot")
            .cast("long").alias("base"),
            (F.lit(_NEYMAN_BUDGET) * F.col("m") % F.col("tot"))
            .alias("rem"),
        )
    )
    lo = quota.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("base")).cast("long").alias("leftover")
    )
    rk = global_rank(
        quota, [(-F.col("rem")).alias("nrem"), F.col("source")], "r"
    )
    return (
        rk.join(F.broadcast(lo))
        .select(
            "source",
            F.col("nh").alias("n_docs"),
            (
                F.col("base")
                + F.when(F.col("r") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("n_alloc"),
        )
        .orderBy("source")
    )



# ------------------------------------ Tukey outlier rates


@_staged(
    "pf_tukey_outlier_rates",
    tags=("datapipe", "profile", "outliers"),
    oracle=f"""
        WITH q AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n,
                 quantile_cont(n_chars, 0.25) AS q1,
                 quantile_cont(n_chars, 0.75) AS q3
          FROM documents GROUP BY source
        ),
        f AS (
          SELECT source, n, q1, q3,
                 q1 - 1.5 * (q3 - q1) AS lo,
                 q3 + 1.5 * (q3 - q1) AS hi
          FROM q
        )
        SELECT d.source, any_value(f.n) AS n_docs,
               round(any_value(f.q1), 6) AS q1,
               round(any_value(f.q3), 6) AS q3,
               CAST(sum(CASE WHEN d.n_chars < f.lo OR d.n_chars > f.hi
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               {_SQL_Q6.format(
                   x='''CAST(sum(CASE WHEN d.n_chars < f.lo
                                   OR d.n_chars > f.hi
                              THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(any_value(f.n) AS DOUBLE)''')}
                 AS outlier_rate
        FROM documents d JOIN f USING (source)
        GROUP BY d.source ORDER BY d.source
    """,
)
def pf_tukey_outlier_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier rates of document length per source: the
    share of documents outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the
    robust screen (fences from quartiles, immune to the outliers they
    flag) that complements the z-score family (fe_zscore_by_lang,
    pf_robust_zscore_event_value); a source whose rate jumps is a
    scraper change before it is a distribution-test alarm. A
    zero-IQR source (≥75% of docs the same length) degenerates to
    "anything ≠ the common length is an outlier" — the honest robust
    answer, exercised by a fixture.

    Determinism: quartiles are the exact interpolated type-7 form
    (Spark `percentile` == DuckDB `quantile_cont`, the
    agg_exact_percentiles precedent); the fences are one shared
    IEEE chain applied identically before the strict comparisons
    (integer lengths vs an identical double — same branch on both
    engines); the rate is one pinned ratio quantized at 6 dp.

    Scale shape: one per-source quartile aggregate (exact percentile
    sorts within source groups — swap in approx_percentile at 100 TB,
    the documented percentile-family trade), a broadcast
    source-keyed fence join back onto the scan, one per-source
    rollup."""
    docs = load(spark, sf_dir, "documents")
    q = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    f = q.select(
        "source", "n", "q1", "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = (F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi"))
    return (
        docs.join(F.broadcast(f), "source")
        .groupBy("source")
        .agg(
            F.first("n").alias("n_docs"),
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.sum(F.when(out, 1).otherwise(0)).cast("long")
            .alias("n_outliers"),
            _q6(
                F.sum(F.when(out, 1).otherwise(0)).cast("double")
                / F.first("n").cast("double")
            ).alias("outlier_rate"),
        )
        .orderBy("source")
    )


# ------------------------------------ 3-step absorption

_ABS_TARGET = "purchase"
_ABS_STEPS = 3


def _sql_absorption() -> str:
    ctes = [f"""
        seq AS (
          SELECT event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS next_type
          FROM events
        ),
        c AS (
          SELECT event_type AS s, next_type AS t,
                 CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        m AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns FROM c GROUP BY s),
        p AS (
          SELECT c.s, c.t,
                 CAST({_SQL_Q6.format(
                     x="CAST(c.n AS DOUBLE) / CAST(m.ns AS DOUBLE)")}
                   AS DECIMAL(18,6)) AS p
          FROM c JOIN m USING (s)
        ),
        a1 AS (
          SELECT s, CAST(coalesce(sum(CASE WHEN t = '{_ABS_TARGET}'
                                      THEN p END), 0)
                         AS DECIMAL(18,6)) AS a
          FROM p GROUP BY s
        )"""]
    for i in range(2, _ABS_STEPS + 1):
        ctes.append(f"""
        a{i} AS (
          SELECT p.s,
                 CAST({_SQL_Q6.format(
                     x=f'''CAST(sum(CASE WHEN p.t = '{_ABS_TARGET}'
                                    THEN p.p
                                    ELSE p.p * coalesce(prev.a, 0)
                                    END) AS DOUBLE)''')}
                   AS DECIMAL(18,6)) AS a
          FROM p LEFT JOIN a{i - 1} prev
            ON prev.s = p.t AND p.t <> '{_ABS_TARGET}'
          GROUP BY p.s
        )""")
    return f"""
        WITH {",".join(ctes)}
        SELECT a1.s AS start_type,
               CAST(a1.a AS DOUBLE) AS p_within_1,
               CAST(a2.a AS DOUBLE) AS p_within_2,
               CAST(a3.a AS DOUBLE) AS p_within_3
        FROM a1 JOIN a2 USING (s) JOIN a3 ON a3.s = a1.s
        ORDER BY start_type
    """


@_staged(
    "ev_absorption_3step",
    tags=("datapipe", "events", "markov"),
    oracle=_sql_absorption(),
)
def ev_absorption_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-passage probability into 'purchase' (_ABS_TARGET) within
    1, 2, and 3
    transitions, per starting event type, under the empirical Markov
    chain: a_k(s) = P(s→target) + Σ_{{t≠target}} P(s→t)·a_{{k−1}}(t) —
    the absorption ladder that turns ev_markov_transitions' raw
    matrix into "how close is each behavior to converting", and the
    quantity a session-abandonment intervention is actually ranked
    by. Monotone in k by construction (pinned by a fixture).

    Determinism: transition probabilities come from the fleet lead()
    recipe and are quantized ONCE at 6 dp into decimal; each ladder
    round multiplies decimal p by the previous decimal a (exact),
    sums exactly, and re-quantizes the round result at 6 dp — both
    engines carry identical state into every round (the Katz/label-
    propagation unrolled-oracle discipline). Types that never reach
    the target in k steps read exactly 0, not NULL.

    Scale shape: the corpus collapses to the ≤|types|² probability
    frame immediately; each ladder round is one bounded-frame join +
    aggregate, k fixed at 3."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("s"), F.col("next_type").alias("t")
    ).agg(F.count("*").cast("long").alias("n"))
    m = c.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    p = c.join(F.broadcast(m), "s").select(
        "s", "t",
        _q6(F.col("n").cast("double") / F.col("ns").cast("double"))
        .cast("decimal(18,6)").alias("p"),
    )
    a = p.groupBy("s").agg(
        F.coalesce(
            F.sum(F.when(F.col("t") == _ABS_TARGET, F.col("p"))),
            F.lit(0),
        ).cast("decimal(18,6)").alias("a")
    )
    ladder = [a]
    for _ in range(_ABS_STEPS - 1):
        prev = ladder[-1].select(
            F.col("s").alias("t"), F.col("a").alias("prev_a")
        )
        nxt = (
            p.join(
                F.broadcast(prev),
                (p["t"] == prev["t"]) & (p["t"] != _ABS_TARGET),
                "left",
            )
            .groupBy("s")
            .agg(
                _q6(
                    F.sum(
                        F.when(p["t"] == _ABS_TARGET, F.col("p")).otherwise(
                            F.col("p") * F.coalesce(F.col("prev_a"), F.lit(0))
                        )
                    ).cast("double")
                ).cast("decimal(18,6)").alias("a")
            )
        )
        ladder.append(nxt)
    a1, a2, a3 = ladder
    return (
        a1.select(F.col("s").alias("start_type"),
                  F.col("a").cast("double").alias("p_within_1"))
        .join(a2.select(F.col("s").alias("start_type"),
                        F.col("a").cast("double").alias("p_within_2")),
              "start_type")
        .join(a3.select(F.col("s").alias("start_type"),
                        F.col("a").cast("double").alias("p_within_3")),
              "start_type")
        .orderBy("start_type")
    )

