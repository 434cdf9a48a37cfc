"""Round-17 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→24: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe25.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 11–16 belong to the
datapipe19–24 publications; these wait their turn by design.

To publish (round 17): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe25.py::_BNLJ_OK /
_GLOBAL_WINDOW_OK into the fleet lint (the orphan test enforces the
copies).

Batch theme: calibration and provenance — the instruments that read
whether the pipeline's own estimates and attributions can be trusted.
Spearman rank correlation (monotone dependence without the linearity
assumption — is order value drifting with calendar time), CUPED
variance reduction (the pre-period covariate adjustment every
experimentation platform runs; θ and the achieved variance cut),
Simpson diversity per source (repeat-probability and effective
vocabulary — the concentration complement of the entropy family), a
KMV (k-minimum-values) distinct sketch with its exact calibration
error (the third sketch family next to HLL and linear counting —
mergeable bottom-k hashes, deterministic via the fleet md5 recipe),
a retention half-life fit (exponential decay OLS over the pooled
retention curve — the one-number summary of ev_weekly_retention's
triangle), and Burrows-style stylometric delta between sources
(z-scored top-word profiles — the authorship/provenance distance
behind contamination triage). No reference counterpart
(Ferlab-Ste-Justine/cqdg-etl has no analytics of this kind); every
shape is chosen for the 100-TB target and documented per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
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
    """Publish the staged queries into the driver registry (round 17)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


# ------------------------------------ Spearman rank correlation


def _sql_spearman() -> str:
    def ranks(col: str, cte: str) -> str:
        """Per-VALUE doubled midranks: 2r = 2·(cum−t) + t + 1."""
        return f"""
        {cte} AS (
          SELECT val, CAST(2 * (cum - t) + t + 1 AS BIGINT) AS r2
          FROM (
            SELECT val, t,
                   CAST(sum(t) OVER (
                     ORDER BY val
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM (SELECT {col} AS val, CAST(count(*) AS BIGINT) AS t
                  FROM o GROUP BY 1)
          )
        )"""

    return f"""
        WITH o AS (
          SELECT o_totalprice AS x,
                 epoch_us(o_orderdate) // 86400000000 AS y
          FROM orders
        ),
        {ranks("x", "rx")},
        {ranks("y", "ry")},
        rows_r AS (
          SELECT rx.r2 AS a, ry.r2 AS b
          FROM o JOIN rx ON o.x = rx.val JOIN ry ON o.y = ry.val
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(a AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sa,
                 CAST(sum(CAST(b AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sb,
                 CAST(sum(CAST(a AS DECIMAL(38,0)) * b) AS DECIMAL(38,0))
                   AS sab,
                 CAST(sum(CAST(a AS DECIMAL(38,0)) * a) AS DECIMAL(38,0))
                   AS saa,
                 CAST(sum(CAST(b AS DECIMAL(38,0)) * b) AS DECIMAL(38,0))
                   AS sbb
          FROM rows_r
        ),
        m AS (
          SELECT n,
                 CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS covn,
                 CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS varan,
                 CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS varbn
          FROM s
        )
        SELECT n AS n_rows,
               CASE WHEN varan > 0 AND varbn > 0 THEN
                 {_SQL_Q6.format(x="covn / sqrt(varan * varbn)")}
               END AS spearman_rho
        FROM m
    """


@_staged(
    "pf_spearman_rho",
    tags=("datapipe", "profile", "stats"),
    oracle=_sql_spearman(),
)
def pf_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between order value (o_totalprice)
    and calendar time (epoch-day of o_orderdate) — monotone
    dependence with no linearity or normality assumption, the drift
    probe that catches "values creep up over time" even when the
    relationship saturates. ρ is Pearson on MIDRANKS (the exact
    tie-handling form, not the 6Σd² shortcut that is wrong under
    ties).

    Midranks without per-row sorting: each side collapses to its
    VALUE frame (bounded by distinct values, corpus-independent),
    the running total comes from the range-partitioned
    ``global_cumsum``, and each row picks up its value's DOUBLED
    midrank 2r = 2(c−t)+t+1 — an exact integer — via two equi-joins.
    Pearson on the doubled ranks equals Pearson on the ranks (both
    variables scale by 2). All sums are exact DECIMAL(38,0) on
    integers (rank products ~n² → 10²⁴ at fleet scale); the single
    IEEE chain is the final covn/√(varan·varbn), quantized at 6 dp
    and NULL-guarded when either side is constant (zero variance).

    Scale shape: two value-frame aggregates + two range-partitioned
    cumsums + two equi-joins back onto the fact rows + one 1-row
    rollup. No global window, no scalar fan-out."""
    from cqdg_etl_spark.operators.ranking import global_cumsum

    # o_orderdate arrives as TIMESTAMP_NTZ from parquet; the session
    # is pinned to UTC, so the cast preserves the instant and makes
    # unix_micros applicable (the registry.load ts recipe, inline).
    o = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("y"),
    )

    def rank2(col: str) -> DataFrame:
        v = o.groupBy(F.col(col).alias("val")).agg(
            F.count("*").cast("long").alias("t")
        )
        c = global_cumsum(v, [F.col("val")], "t", "cum")
        return c.select(
            "val",
            (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1)
            .cast("long").alias("r2"),
        )

    rx = rank2("x").withColumnRenamed("r2", "a")
    ry = rank2("y").withColumnRenamed("r2", "b")
    rows_r = (
        o.join(rx, o["x"] == rx["val"])
        .drop("val")
        .join(ry, o["y"] == ry["val"])
        .select("a", "b")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = rows_r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec("a")).cast("decimal(38,0)").alias("sa"),
        F.sum(dec("b")).cast("decimal(38,0)").alias("sb"),
        F.sum(dec("a") * F.col("b")).cast("decimal(38,0)").alias("sab"),
        F.sum(dec("a") * F.col("a")).cast("decimal(38,0)").alias("saa"),
        F.sum(dec("b") * F.col("b")).cast("decimal(38,0)").alias("sbb"),
    )
    nd = F.col("n").cast("double")
    m = s.select(
        "n",
        (nd * F.col("sab").cast("double")
         - F.col("sa").cast("double") * F.col("sb").cast("double"))
        .alias("covn"),
        (nd * F.col("saa").cast("double")
         - F.col("sa").cast("double") * F.col("sa").cast("double"))
        .alias("varan"),
        (nd * F.col("sbb").cast("double")
         - F.col("sb").cast("double") * F.col("sb").cast("double"))
        .alias("varbn"),
    )
    return m.select(
        F.col("n").alias("n_rows"),
        F.when(
            (F.col("varan") > 0) & (F.col("varbn") > 0),
            _q6(F.col("covn") / F.sqrt(F.col("varan") * F.col("varbn"))),
        ).alias("spearman_rho"),
    )


# ------------------------------------ CUPED variance reduction


@_staged(
    "ev_cuped_adjustment",
    tags=("datapipe", "events", "experiment"),
    oracle=f"""
        WITH b AS (
          SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
          FROM events
        ),
        per_user AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN epoch_us(ts) <= b.mid
                          THEN CAST(value AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
                      AS DECIMAL(38,6)) AS x,
                 CAST(sum(CASE WHEN epoch_us(ts) > b.mid
                          THEN CAST(value AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
                      AS DECIMAL(38,6)) AS y
          FROM events CROSS JOIN b
          GROUP BY user_id
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx,
                 CAST(sum(y * y) AS DECIMAL(38,12)) AS syy
          FROM per_user
        ),
        m AS (
          SELECT n,
                 CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
                 CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
                 CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
          FROM s
        )
        SELECT n AS n_users,
               {_SQL_Q6.format(x="sxd / CAST(n AS DOUBLE)")} AS mean_pre,
               {_SQL_Q6.format(x="syd / CAST(n AS DOUBLE)")} AS mean_post,
               CASE WHEN varxn > 0 THEN
                 {_SQL_Q6.format(x="covn / varxn")}
               END AS theta,
               CASE WHEN varxn > 0 AND varyn > 0 THEN
                 {_SQL_Q6.format(x="covn * covn / (varxn * varyn)")}
               END AS variance_reduction
        FROM m
    """,
)
def ev_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): split
    the stream at its midpoint timestamp, use each user's pre-period
    value sum as the covariate X for their post-period sum Y, and
    report θ = cov(X,Y)/var(X) and the achieved variance reduction
    ρ² = cov²/(var_X·var_Y) — the fraction of post-period metric
    variance the adjustment Y−θ(X−X̄) removes. The single most-used
    variance-reduction trick in online experimentation; ρ² is the
    power multiplier an A/B platform gets for free.

    Determinism: the midpoint is integer epoch-microsecond arithmetic
    on the global (min, max); per-user sums accumulate
    DECIMAL(18,6)-cast values (the fleet money recipe — double
    summation order flips last ulps between engines); the five moment
    sums are exact decimals (x·y widens to DECIMAL(38,12)); θ, the
    means, and ρ² are pinned double chains on those exact sums,
    NULL-guarded for zero pre- or post-period variance. Users with
    no pre-period events carry X = 0 (the covariate is genuinely
    zero, not missing — documented).

    Scale shape: one 1-row (min, max) aggregate fanned onto the scan
    (the reviewed bounded-BNLJ class), one per-user hash aggregate,
    one 1-row moment rollup."""
    ev = load(spark, sf_dir, "events")
    # Integer floor division (div), NOT double /2 cast long: the cast
    # truncates toward zero while the oracle's // floors — for
    # pre-1970 (negative epoch) timestamps with an odd sum the two
    # mids differ by 1 microsecond, flipping boundary events between
    # the pre/post periods (ADVICE r10).
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).select(F.expr("(mn + mx) div 2").cast("long").alias("mid"))
    dec0 = F.lit(0).cast("decimal(18,6)")
    per_user = (
        ev.join(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") <= F.col("mid"),
                       F.col("value").cast("decimal(18,6)"))
                .otherwise(dec0)
            ).cast("decimal(38,6)").alias("x"),
            F.sum(
                F.when(F.unix_micros("ts") > F.col("mid"),
                       F.col("value").cast("decimal(18,6)"))
                .otherwise(dec0)
            ).cast("decimal(38,6)").alias("y"),
        )
    )
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,12)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    m = s.select(
        "n",
        (nd * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        .alias("covn"),
        (nd * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        .alias("varxn"),
        (nd * F.col("syy").cast("double")
         - F.col("sy").cast("double") * F.col("sy").cast("double"))
        .alias("varyn"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    return m.select(
        F.col("n").alias("n_users"),
        _q6(F.col("sxd") / nd).alias("mean_pre"),
        _q6(F.col("syd") / nd).alias("mean_post"),
        F.when(F.col("varxn") > 0,
               _q6(F.col("covn") / F.col("varxn"))).alias("theta"),
        F.when(
            (F.col("varxn") > 0) & (F.col("varyn") > 0),
            _q6(F.col("covn") * F.col("covn")
                / (F.col("varxn") * F.col("varyn"))),
        ).alias("variance_reduction"),
    )


# ------------------------------------ Simpson diversity per source


@_staged(
    "tx_simpson_diversity",
    tags=("datapipe", "text", "diversity"),
    oracle="""
        WITH t AS (
          SELECT source, unnest(string_split(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
        ),
        c AS (
          SELECT source, tok, CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY 1, 2
        ),
        s AS (
          SELECT source,
                 CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(CAST(n * (n - 1) AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS rep,
                 CAST(max(n) AS BIGINT) AS top1
          FROM c GROUP BY source
        )
        SELECT source, n_tokens, n_types,
               CASE WHEN n_tokens >= 2 THEN
                 floor((CAST(rep AS DOUBLE)
                        / (CAST(n_tokens AS DOUBLE)
                           * CAST(n_tokens - 1 AS DOUBLE)))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS simpson_lambda,
               CASE WHEN n_tokens >= 2 AND rep > 0 THEN
                 floor(((CAST(n_tokens AS DOUBLE)
                         * CAST(n_tokens - 1 AS DOUBLE))
                        / CAST(rep AS DOUBLE))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS inv_simpson,
               floor((CAST(top1 AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                     * 1000000.0 + 0.5) / 1000000.0 AS berger_parker
        FROM s ORDER BY source
    """,
)
def tx_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity per source: λ = Σ n_t(n_t−1)/(N(N−1)) is the
    probability two tokens drawn without replacement are the SAME
    type (repeat concentration — the unbiased finite-sample form);
    1/λ is the effective vocabulary size under that lens (Hill number
    of order 2), and Berger–Parker top1/N is the single-type
    dominance floor. The concentration complement of the entropy
    family (tx_source_kl_divergence, ev_entropy_rate_markov):
    entropy weighs the tail, Simpson weighs the head — a template-
    spam source shows λ collapsing toward its top token long before
    entropy moves.

    Determinism: token counts exact integers; Σn(n−1) accumulates in
    DECIMAL(38,0) (n² at fleet scale overflows BIGINT); λ, 1/λ and
    the dominance ratio are single pinned IEEE chains quantized at
    6 dp, NULL-guarded for N < 2 (λ undefined) and rep = 0 (1/λ
    infinite — every token unique).

    Scale shape: one (source, token) hash aggregate, one
    |sources|-bounded rollup — no join anywhere."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", normalize_ws(F.col("text")).alias("norm")
    ).filter(F.col("norm") != "").select(
        "source", F.explode(tokens(F.col("norm"))).alias("tok")
    )
    c = t.groupBy("source", "tok").agg(F.count("*").cast("long").alias("n"))
    s = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum((F.col("n") * (F.col("n") - 1)).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("rep"),
        F.max("n").cast("long").alias("top1"),
    )
    ntd = F.col("n_tokens").cast("double")
    return s.select(
        "source", "n_tokens", "n_types",
        F.when(
            F.col("n_tokens") >= 2,
            _q6(F.col("rep").cast("double")
                / (ntd * (F.col("n_tokens") - 1).cast("double"))),
        ).alias("simpson_lambda"),
        F.when(
            (F.col("n_tokens") >= 2) & (F.col("rep") > 0),
            _q6((ntd * (F.col("n_tokens") - 1).cast("double"))
                / F.col("rep").cast("double")),
        ).alias("inv_simpson"),
        _q6(F.col("top1").cast("double") / ntd).alias("berger_parker"),
    ).orderBy("source")


# ------------------------------------ KMV distinct sketch

_KMV_K = 64
_KMV_BUCKETS = 64
_KMV_ALL = "__all__"


def _sql_kmv() -> str:
    h = ("CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) "
         "AS BIGINT)")
    return f"""
        WITH hs AS (
          SELECT DISTINCT event_type, {h} AS h FROM events
        ),
        hg AS (
          SELECT DISTINCT CAST('{_KMV_ALL}' AS VARCHAR) AS event_type,
                 {h} AS h
          FROM events
        ),
        uni AS (SELECT * FROM hs UNION ALL SELECT * FROM hg),
        rk AS (
          SELECT event_type, h,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY h
                 ) AS rnk,
                 count(*) OVER (PARTITION BY event_type) AS n_hashes
          FROM uni
        ),
        est AS (
          SELECT event_type,
                 CASE WHEN any_value(n_hashes) >= {_KMV_K} THEN
                   {_SQL_Q6.format(
                       x=f'''CAST({_KMV_K} - 1 AS DOUBLE)
                           / (CAST(max(CASE WHEN rnk = {_KMV_K}
                                        THEN h END) AS DOUBLE)
                              / 1152921504606846976.0)''')}
                 ELSE CAST(any_value(n_hashes) AS DOUBLE)
                 END AS n_kmv,
                 CAST(any_value(n_hashes) AS BIGINT) AS n_exact
          FROM rk GROUP BY event_type
        )
        SELECT event_type, n_exact, n_kmv,
               {_SQL_Q6.format(
                   x='''abs(n_kmv - CAST(n_exact AS DOUBLE))
                      / CAST(n_exact AS DOUBLE)''')} AS rel_err
        FROM est ORDER BY event_type
    """


@_staged(
    "sk_kmv_distinct_users",
    tags=("datapipe", "sketch", "cardinality"),
    oracle=_sql_kmv(),
)
def sk_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=64) distinct-user sketch per event
    type plus the merged '__all__' row, CALIBRATED against the exact
    count: the estimator keeps the k smallest 60-bit md5 hashes of
    the id domain and reads n̂ = (k−1)/u_k with u_k the k-th minimum
    normalized to [0,1) — the third sketch family next to HLL
    (register max) and linear counting (bitmap), and the one whose
    union is trivially exact (bottom-k of a union = bottom-k of the
    merged bottom-k sets). rel_err against the exact count is the
    calibration a capacity planner reads before trusting the sketch
    at higher cardinalities. Fewer than k distinct hashes → the
    sketch IS the exact count (the KMV small-set rule).

    Determinism: hashes are the fleet md5 recipe (15 hex digits →
    integer, identical on both engines); hash collisions across
    distinct users merge on both engines identically (the sketch
    estimates the HASH-set size, documented); the only float ops are
    the final normalization/ratio chains, quantized at 6 dp.

    Scale shape: the engine takes the k-th minimum WITHOUT a
    per-type sort of corpus-sized partitions: hashes are first
    bucketed mod 64 and ranked within (event_type, bucket) — each
    window partition is ~1/64 of a type — then the ≤64·k survivors
    take one tiny second-stage window per type. The exact count
    rides the same distinct frame. The oracle ranks per type
    directly (DuckDB's scale is irrelevant)."""
    ev = load(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hs = ev.select("event_type", h.alias("h")).distinct()
    hg = ev.select(
        F.lit(_KMV_ALL).alias("event_type"), h.alias("h")
    ).distinct()
    uni = hs.unionAll(hg)
    # Stage 1: rank within (type, bucket) — bounded fan-in per task.
    w1 = W.partitionBy("event_type", "bucket").orderBy("h")
    stage1 = (
        uni.withColumn("bucket", F.pmod(F.col("h"), F.lit(_KMV_BUCKETS)))
        .withColumn("r1", F.row_number().over(w1))
    )
    survivors = stage1.filter(F.col("r1") <= _KMV_K)
    # Stage 2: global per-type rank over <= buckets*k survivors.
    w2 = W.partitionBy("event_type").orderBy("h")
    ranked = survivors.withColumn("rnk", F.row_number().over(w2))
    counts = uni.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    kth = ranked.filter(F.col("rnk") == _KMV_K).select(
        "event_type", F.col("h").alias("hk")
    )
    est = counts.join(kth, "event_type", "left").select(
        "event_type", "n_exact",
        F.when(
            F.col("n_exact") >= _KMV_K,
            _q6(
                F.lit(float(_KMV_K - 1))
                / (F.col("hk").cast("double") / F.lit(1152921504606846976.0))
            ),
        ).otherwise(F.col("n_exact").cast("double")).alias("n_kmv"),
    )
    return est.select(
        "event_type", "n_exact", "n_kmv",
        _q6(
            F.abs(F.col("n_kmv") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_err"),
    ).orderBy("event_type")


# ------------------------------------ retention half-life


@_staged(
    "ev_retention_halflife",
    tags=("datapipe", "events", "retention"),
    oracle=f"""
        WITH uw AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // (86400000000 * 7) AS week
          FROM events
        ),
        firsts AS (
          SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id
        ),
        mx AS (SELECT max(week) AS max_week FROM uw),
        sizes AS (
          SELECT cohort, CAST(count(*) AS BIGINT) AS size
          FROM firsts GROUP BY cohort
        ),
        act AS (
          SELECT f.cohort, CAST(u.week - f.cohort AS BIGINT) AS age,
                 CAST(count(*) AS BIGINT) AS active
          FROM uw u JOIN firsts f USING (user_id)
          GROUP BY 1, 2
        ),
        pooled AS (
          SELECT a.age,
                 CAST(sum(a.active) AS BIGINT) AS active,
                 CAST(sum(s.size) AS BIGINT) AS eligible
          FROM act a
          JOIN sizes s USING (cohort) CROSS JOIN mx
          WHERE a.age >= 1 AND a.cohort + a.age <= mx.max_week
          GROUP BY a.age
        ),
        pts AS (
          SELECT CAST(age AS DECIMAL(18,6)) AS x,
                 CAST({_SQL_Q6.format(
                     x='''ln(CAST(active AS DOUBLE)
                           / CAST(eligible AS DOUBLE))''')}
                   AS DECIMAL(18,6)) AS y
          FROM pooled WHERE active > 0 AND eligible > 0
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS d,
                 CAST(sum(x) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(y) AS DECIMAL(38,6)) AS sy,
                 CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
                 CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx
          FROM pts
        ),
        m AS (
          SELECT d,
                 CAST(d AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
                 CAST(d AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn
          FROM s
        )
        SELECT d AS n_ages,
               CASE WHEN d >= 2 AND varxn > 0 THEN
                 {_SQL_Q6.format(x="covn / varxn")}
               END AS decay_slope,
               CASE WHEN d >= 2 AND varxn > 0 AND covn < 0 THEN
                 {_SQL_Q6.format(x="-ln(2.0) / (covn / varxn)")}
               END AS halflife_weeks
        FROM m
    """,
)
def ev_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: pool ev_weekly_retention's triangle across
    cohorts (rate(age) = Σ active / Σ eligible over cohorts OBSERVED
    at that age), fit ln(rate) = α + β·age by OLS over ages ≥ 1, and
    read the exponential half-life −ln2/β — the one-number engagement
    decay a capacity/LTV model consumes instead of the whole
    triangle. β ≥ 0 (retention not decaying) → half-life NULL, the
    honest answer rather than a negative week count.

    Determinism: week = integer epoch-microsecond division (7-day
    blocks from the epoch, calendar-free); active/eligible are exact
    integers; each age's ln(rate) is one pinned ln quantized at 6 dp
    into decimal; the OLS sums over the bounded age frame are exact
    decimals and β is one pinned division. Right-censoring is handled
    by the eligibility filter (a cohort only pools into ages its
    observation window covers — no survivor bias from young cohorts).

    Scale shape: one distinct (user, week) aggregate, a user-keyed
    equi-join onto first-weeks, a (cohort, age) aggregate bounded by
    the time span squared, a 1-row max-week scalar fan-out (the
    reviewed bounded-BNLJ class), and an OLS aggregate over the
    bounded age frame."""
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("week").alias("cohort"))
    mx = uw.agg(F.max("week").alias("max_week"))
    sizes = firsts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("size")
    )
    act = (
        uw.join(firsts, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("age"))
        .agg(F.count("*").cast("long").alias("active"))
    )
    pooled = (
        act.join(F.broadcast(sizes), "cohort")
        .join(F.broadcast(mx))
        .filter(
            (F.col("age") >= 1)
            & (F.col("cohort") + F.col("age") <= F.col("max_week"))
        )
        .groupBy("age")
        .agg(
            F.sum("active").cast("long").alias("active"),
            F.sum("size").cast("long").alias("eligible"),
        )
    )
    pts = pooled.filter(
        (F.col("active") > 0) & (F.col("eligible") > 0)
    ).select(
        F.col("age").cast("decimal(18,6)").alias("x"),
        _q6(
            F.log(
                F.col("active").cast("double")
                / F.col("eligible").cast("double")
            )
        ).cast("decimal(18,6)").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("long").alias("d"),
        F.sum("x").cast("decimal(38,6)").alias("sx"),
        F.sum("y").cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
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
    )
    fit_ok = (F.col("d") >= 2) & (F.col("varxn") > 0)
    slope = F.col("covn") / F.col("varxn")
    return m.select(
        F.col("d").alias("n_ages"),
        F.when(fit_ok, _q6(slope)).alias("decay_slope"),
        F.when(
            fit_ok & (F.col("covn") < 0),
            _q6(-F.log(F.lit(2.0)) / slope),
        ).alias("halflife_weeks"),
    )


# ------------------------------------ stylometric delta

_DELTA_TOPK = 20


def _sql_delta() -> str:
    norm = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
    return f"""
        WITH t AS (
          SELECT source, unnest(string_split({norm}, ' ')) AS tok
          FROM documents WHERE {norm} <> ''
        ),
        top AS (
          SELECT tok FROM (
            SELECT tok, CAST(count(*) AS BIGINT) AS n
            FROM t GROUP BY tok
            ORDER BY n DESC, tok LIMIT {_DELTA_TOPK}
          )
        ),
        ns AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_s
          FROM t GROUP BY source
        ),
        cnt AS (
          SELECT t.source, t.tok, CAST(count(*) AS BIGINT) AS n
          FROM t JOIN top USING (tok) GROUP BY 1, 2
        ),
        grid AS (
          SELECT ns.source, top.tok, ns.n_s FROM ns CROSS JOIN top
        ),
        fr AS (
          SELECT g.source, g.tok,
                 CAST({_SQL_Q6.format(
                     x='''CAST(coalesce(c.n, 0) AS DOUBLE)
                        / CAST(g.n_s AS DOUBLE)''')}
                   AS DECIMAL(18,6)) AS f
          FROM grid g
          LEFT JOIN cnt c ON c.source = g.source AND c.tok = g.tok
        ),
        wstats AS (
          SELECT tok,
                 CAST(count(*) AS BIGINT) AS ns_cnt,
                 CAST(sum(f) AS DECIMAL(38,6)) AS sf,
                 CAST(sum(f * f) AS DECIMAL(38,12)) AS qf
          FROM fr GROUP BY tok
        ),
        wz AS (
          SELECT tok,
                 CAST(sf AS DOUBLE) / CAST(ns_cnt AS DOUBLE) AS mu,
                 CAST(qf AS DOUBLE) / CAST(ns_cnt AS DOUBLE)
                 - (CAST(sf AS DOUBLE) / CAST(ns_cnt AS DOUBLE))
                   * (CAST(sf AS DOUBLE) / CAST(ns_cnt AS DOUBLE)) AS var
          FROM wstats
        ),
        z AS (
          SELECT fr.source, fr.tok,
                 CASE WHEN wz.var > 0 THEN
                   CAST({_SQL_Q6.format(
                       x="(CAST(fr.f AS DOUBLE) - wz.mu) / sqrt(wz.var)")}
                     AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END AS z
          FROM fr JOIN wz USING (tok)
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_words,
               {_SQL_Q6.format(
                   x='''CAST(sum(CAST(abs(a.z - b.z) AS DECIMAL(18,6)))
                             AS DOUBLE) / CAST(count(*) AS DOUBLE)''')}
                 AS delta
        FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
    """


@_staged(
    "tx_stylometric_delta",
    tags=("datapipe", "text", "stylometry"),
    oracle=_sql_delta(),
)
def tx_stylometric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between sources: z-score each source's relative
    frequency of the corpus' top-20 tokens against the cross-source
    distribution of that token, then Delta(a,b) = mean_w |z_aw −
    z_bw| — the classic stylometric distance. Two sources scraping
    the same upstream (or one laundering another's text) sit at a
    conspicuously small Delta; a source whose function-word profile
    drifts release-over-release is flagged before any semantic model
    runs. Provenance triage next to dd_cross_source_leakage's
    verbatim-overlap matrix.

    Determinism: the top-k vocabulary is (count DESC, token) — a
    total order; relative frequencies are quantized at 6 dp into
    decimal on the DENSE source×token grid (absent counts are real
    zeros); per-token mean/population-variance are pinned chains on
    exact decimal sums; zero-variance tokens contribute 0 to every
    pair on both engines (same pinned subtraction → same branch);
    |z_a − z_b| re-quantizes into decimal so the pair mean is an
    exact sum with one final division.

    Scale shape: one (token) count + TakeOrderedAndProject for the
    top-k (never a global sort), one (source, token) count
    semi-joined to the broadcast top-k, then EVERYTHING downstream
    lives on the |sources|×20 grid — the dense grid cross of two
    tiny dims is the reviewed j6-class exception, and the pair join
    is token-keyed over that bounded frame."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source", normalize_ws(F.col("text")).alias("norm")
    ).filter(F.col("norm") != "").select(
        "source", F.explode(tokens(F.col("norm"))).alias("tok")
    )
    top = (
        t.groupBy("tok").agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(_DELTA_TOPK)
        .select("tok")
    )
    ns = t.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    cnt = (
        t.join(F.broadcast(top), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    grid = ns.crossJoin(F.broadcast(top))
    fr = grid.join(cnt, ["source", "tok"], "left").select(
        "source", "tok",
        _q6(
            F.coalesce(F.col("n"), F.lit(0)).cast("double")
            / F.col("n_s").cast("double")
        ).cast("decimal(18,6)").alias("f"),
    )
    wstats = fr.groupBy("tok").agg(
        F.count("*").cast("long").alias("ns_cnt"),
        F.sum("f").cast("decimal(38,6)").alias("sf"),
        F.sum(F.col("f") * F.col("f")).cast("decimal(38,12)").alias("qf"),
    )
    mu = F.col("sf").cast("double") / F.col("ns_cnt").cast("double")
    wz = wstats.select(
        "tok", mu.alias("mu"),
        (F.col("qf").cast("double") / F.col("ns_cnt").cast("double")
         - mu * mu).alias("var"),
    )
    z = fr.join(F.broadcast(wz), "tok").select(
        "source", "tok",
        F.when(
            F.col("var") > 0,
            _q6((F.col("f").cast("double") - F.col("mu"))
                / F.sqrt(F.col("var"))).cast("decimal(18,6)"),
        ).otherwise(F.lit(0).cast("decimal(18,6)")).alias("z"),
    )
    a = z.select(F.col("source").alias("source_a"), "tok",
                 F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "tok",
                 F.col("z").alias("zb"))
    pairs = a.join(b, "tok").filter(F.col("source_a") < F.col("source_b"))
    term = F.abs(F.col("za") - F.col("zb")).cast("decimal(18,6)")
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            _q6(F.sum(term).cast("double") / F.count("*").cast("double"))
            .alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )

