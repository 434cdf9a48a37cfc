"""Round-12 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→19: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe20.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 9–11 belong to the
datapipe17/18/19 publications; these wait their turn by design.

To publish (round 12): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe20.py::_BNLJ_OK into the
fleet lint (the orphan test enforces the copy).

Batch theme: selection and comparison — the decisions a pipeline
makes between corpora and between variants. Content-defined chunk
dedup (token-boundary CDC — the insertion-robust complement of the
fixed-span dedup), greedy max-coverage document selection (the
submodular facility-location heuristic behind coverage-driven data
curation, 5 unrolled steps), cohort LTV curves (cumulative revenue by
signup cohort — the longitudinal complement of weekly retention),
Welch's t-test over exact sufficient statistics (the A/B decision
primitive), MRR retrieval evaluation (the rank-of-first-relevant
complement of nDCG), and degree assortativity (one Pearson r over
edge-end degrees — do hubs link to hubs). No reference counterpart
(Ferlab-Ste-Justine/cqdg-etl has no analytics of this kind); every
shape is chosen for the 100-TB target and documented per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import SQL_TOKS
from cqdg_etl_spark.queries.datapipe4 import _BM25_Q, _sql_bm25
from cqdg_etl_spark.queries.registry import REGISTRY, Query, load

STAGED: dict[str, Query] = {}


def _staged(name: str, oracle: str | None = None, bench: bool = False,
            tags: tuple[str, ...] = ()):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def register() -> None:
    """Publish the staged queries into the driver registry (round 12)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention — the round-8 lesson).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


# ------------------------------------ content-defined chunk dedup

# A token is a chunk BOUNDARY iff its 60-bit md5 prefix ≡ 0 (mod _CDC_D)
# — boundaries depend only on token content, so an insertion near the
# start of a document shifts every fixed-width span but leaves all
# later CDC chunks identical (the rsync/LBFS argument, at token
# granularity). Expected chunk length = _CDC_D tokens.
_CDC_D = 8


@_staged(
    "dd_cdc_chunk_dedup",
    tags=("datapipe", "dedup", "cdc"),
    oracle=f"""
        WITH tl AS (SELECT doc_id, source,
                           {SQL_TOKS.format(c="text")} AS toks
                    FROM documents),
        pos AS (
          SELECT doc_id, source, toks[CAST(i AS INT)] AS tok,
                 CAST(i AS BIGINT) AS pos
          FROM tl, UNNEST(range(1, len(toks) + 1)) AS t(i)
        ),
        marked AS (
          SELECT doc_id, source, tok, pos,
                 CASE WHEN CAST('0x' || substring(md5(tok), 1, 15)
                           AS BIGINT) % {_CDC_D} = 0
                      THEN 1 ELSE 0 END AS is_boundary
          FROM pos
        ),
        chunked AS (
          SELECT doc_id, source, tok, pos,
                 sum(is_boundary) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS chunk_id
          FROM marked
        ),
        chunks AS (
          SELECT doc_id, source, chunk_id,
                 md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
                 CAST(count(*) AS BIGINT) AS n_tokens
          FROM chunked GROUP BY doc_id, source, chunk_id
        ),
        firsts AS (
          SELECT fp, min(struct_pack(d := doc_id, c := chunk_id))
                   AS first
          FROM chunks GROUP BY fp
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN doc_id = first.d
                              AND chunk_id = first.c
                        THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_chunks,
               CAST(sum(CASE WHEN doc_id = first.d
                              AND chunk_id = first.c
                        THEN 0 ELSE n_tokens END) AS BIGINT)
                 AS dup_tokens,
               {_SQL_Q6.format(
                   x="CAST(sum(CASE WHEN doc_id = first.d"
                     " AND chunk_id = first.c THEN 0 ELSE 1 END)"
                     " AS DOUBLE) / count(*)")} AS dup_chunk_frac
        FROM chunks JOIN firsts USING (fp)
        GROUP BY source ORDER BY source
    """,
)
def dd_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup at token granularity: a token opens
    a new chunk when its portable 60-bit hash ≡ 0 mod 8 (expected
    chunk ≈ 8 tokens), so chunk boundaries are INSERTION-ROBUST — an
    edit near the head of a document shifts every fixed-width span
    (dd_span_dedup's failure mode, by design) but leaves all chunks
    after the next boundary byte-identical (the rsync/LBFS argument).
    Emits per-source dedup stats: chunk count, duplicate chunks
    (global first occurrence kept, lexicographic (doc_id, chunk_id)
    struct ordering — no packed-key overflow at any document
    length), duplicate token mass, duplicate fraction.

    Scale shape: tokenize → one per-DOC running-sum window (partition
    = one document, bounded by doc length) → chunk fingerprints via a
    map-side-combinable (doc, chunk) aggregate → first-occurrence
    resolution as a hash aggregate on the fingerprint (hot chunks
    never serialize on one reducer) → per-source stats. All
    expressions JVM-side; md5 keeps the fingerprint engine-portable.
    """
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = load(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", "source",
        F.posexplode(tokens(normalize_ws(F.col("text")))).alias("p0", "tok"),
    ).select(
        "doc_id", "source", "tok",
        (F.col("p0") + 1).cast("long").alias("pos"),
    )
    is_boundary = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        % _CDC_D == 0
    ).cast("int")
    chunked = pos.withColumn("is_boundary", is_boundary).withColumn(
        "chunk_id",
        F.sum("is_boundary").over(
            W.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    chunks = (
        chunked.groupBy("doc_id", "source", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("fp"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )
    # First occurrence by lexicographic (doc_id, chunk_id) STRUCT
    # ordering (ADVICE r8): the previous doc_id*1e6+chunk_id packed
    # key loses ordering/uniqueness once a document has >=1e6 chunks
    # (~8M tokens) — struct-min has no such cliff, stays a pure hash
    # aggregate (no per-fp window), and orders identically in both
    # engines.
    firsts = chunks.groupBy("fp").agg(
        F.min(F.struct(F.col("doc_id"), F.col("chunk_id"))).alias("first")
    )
    j = chunks.join(firsts, "fp")
    is_first = (F.col("doc_id") == F.col("first.doc_id")) & (
        F.col("chunk_id") == F.col("first.chunk_id")
    )
    is_dup = F.when(is_first, 0).otherwise(1)
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(is_dup).cast("long").alias("n_dup_chunks"),
            F.sum(
                F.when(is_first, 0).otherwise(F.col("n_tokens"))
            ).cast("long").alias("dup_tokens"),
            _q6(
                F.sum(is_dup).cast("double") / F.count("*")
            ).alias("dup_chunk_frac"),
        )
        .orderBy("source")
    )


# ------------------------------------ greedy max-coverage selection

_COV_K = 5
_COV_NGRAM = 3


def _sql_greedy_coverage(k: int = _COV_K) -> str:
    toks = SQL_TOKS.format(c="text")
    steps = []
    prev_cov = None
    prev_picks = None
    picks_union = []
    for i in range(1, k + 1):
        gain_from = (
            "ds" if prev_cov is None
            else f"""(
              SELECT d.doc_id, d.sh FROM ds d
              LEFT JOIN {prev_cov} c ON d.sh = c.sh
              WHERE c.sh IS NULL
            )"""
        )
        exclude = (
            "" if prev_picks is None
            else f" WHERE doc_id NOT IN (SELECT doc_id FROM {prev_picks})"
        )
        steps.append(f"""
        g{i} AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
          FROM {gain_from} GROUP BY doc_id
        ),
        w{i} AS (
          SELECT doc_id, gain FROM g{i}{exclude}
          ORDER BY gain DESC, doc_id LIMIT 1
        ),
        p{i} AS (
          {"SELECT doc_id FROM w" + str(i) if prev_picks is None
           else f"SELECT doc_id FROM {prev_picks}"
                f" UNION ALL SELECT doc_id FROM w{i}"}
        ),
        cov{i} AS (
          {"" if prev_cov is None else f"SELECT sh FROM {prev_cov}"
           " UNION "}SELECT DISTINCT d.sh FROM ds d
          JOIN w{i} ON d.doc_id = w{i}.doc_id
        )""")
        picks_union.append(
            f"SELECT {i} AS step, doc_id, gain,"
            f" (SELECT count(*) FROM cov{i}) AS covered_total FROM w{i}"
        )
        prev_cov = f"cov{i}"
        prev_picks = f"p{i}"
    return f"""
        WITH ds AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     range(1, len(toks) - {_COV_NGRAM} + 2),
                     i -> toks[CAST(i AS INT)] || ' ' ||
                          toks[CAST(i AS INT) + 1] || ' ' ||
                          toks[CAST(i AS INT) + 2]
                   )) AS sh
            FROM (SELECT doc_id, {toks} AS toks FROM documents)
            WHERE len(toks) >= {_COV_NGRAM}
          )
        ),{",".join(steps)}
        SELECT * FROM ({" UNION ALL ".join(picks_union)})
        ORDER BY step
    """


@_staged(
    "ds_greedy_coverage",
    tags=("datapipe", "selection", "iterative"),
    oracle=_sql_greedy_coverage(),
)
def ds_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage document selection (the 1−1/e submodular
    facility-location heuristic behind coverage-driven curation): 5
    steps, each picking the document adding the most UNCOVERED word
    trigrams (ties → lowest doc id), then retiring its shingles.
    Emits (step, doc_id, marginal gain, cumulative coverage); stops
    early when no unpicked document adds coverage (fully-covered docs
    drop out of the gain frame, so zero-gain steps emit no row — the
    submodular early-stop, identical in the oracle).

    Scale shape: per step ONE anti-join of the (doc, shingle) frame
    against the covered set + a map-side-combined gain aggregate +
    TakeOrderedAndProject(1); the covered set is bounded by the k
    selected documents' shingles (not the corpus), so its anti-join
    build side stays small; lineage truncated per step (the graph.py
    iterative discipline). Fixed k keeps the whole trace
    hash-matchable (the unrolled-oracle convention). Cost model:
    exact greedy IS k corpus scans by construction (probe-measured
    exponent ~1.1 in corpus size, constant ~1 scan/step) — for large
    k at fleet scale, route to stochastic-greedy (Mirzasoleiman et
    al. 2015): per step evaluate only an md5-deterministic
    (n/k)·ln(1/ε) candidate sample for a 1−1/e−ε guarantee at a
    k-independent total scan budget."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens
    from cqdg_etl_spark.operators.graph import _truncate

    docs = load(spark, sf_dir, "documents")
    toks = tokens(normalize_ws(F.col("text")))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(
            F.size(toks) - F.lit(_COV_NGRAM - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    ds = (
        docs.filter(F.size(toks) >= _COV_NGRAM)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))
        .persist()
    )
    covered = None
    picked = None
    rows = []
    for step in range(1, _COV_K + 1):
        remaining = (
            ds if covered is None else ds.join(covered, "sh", "left_anti")
        )
        gains = remaining.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("gain")
        )
        if picked is not None:
            gains = gains.join(picked, "doc_id", "left_anti")
        w = gains.orderBy(F.col("gain").desc(), "doc_id").limit(1)
        w = _truncate(w, "local")
        new_cov = (
            ds.join(w.select("doc_id"), "doc_id", "left_semi")
            .select("sh").distinct()
        )
        covered = _truncate(
            new_cov if covered is None
            else covered.unionByName(new_cov).distinct(),
            "local",
        )
        picked = _truncate(
            w.select("doc_id") if picked is None
            else picked.unionByName(w.select("doc_id")),
            "local",
        )
        n_cov = covered.count()
        rows.append(
            w.select(
                F.lit(step).cast("int").alias("step"),
                "doc_id", "gain",
                F.lit(n_cov).cast("long").alias("covered_total"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    result = out.orderBy("step")
    ds.unpersist()
    return result


# ------------------------------------ cohort LTV curves

_LTV_MAX_WEEK = 3


@_staged(
    "ev_cohort_ltv",
    tags=("datapipe", "events", "cohort"),
    oracle=f"""
        WITH first_ev AS (
          SELECT user_id, min(ts) AS first_ts FROM events
          GROUP BY user_id
        ),
        cohort AS (
          SELECT user_id,
                 strftime(date_trunc('week', first_ts), '%Y-%m-%d')
                   AS cohort_week,
                 first_ts
          FROM first_ev
        ),
        cohort_n AS (
          SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
          FROM cohort GROUP BY cohort_week
        ),
        purch AS (
          SELECT c.cohort_week,
                 CAST(floor(date_diff('second', c.first_ts, e.ts)
                            / 604800.0) AS BIGINT) AS week_offset,
                 CAST({_SQL_Q6.format(x="e.value")}
                      AS DECIMAL(18,6)) AS v
          FROM events e JOIN cohort c USING (user_id)
          WHERE e.event_type = 'purchase'
        ),
        wk AS (
          SELECT cohort_week, week_offset,
                 CAST(sum(v) AS DECIMAL(38,6)) AS rev
          FROM purch WHERE week_offset <= {_LTV_MAX_WEEK}
          GROUP BY cohort_week, week_offset
        ),
        grid AS (
          SELECT cn.cohort_week, cn.n_users,
                 CAST(t.w AS BIGINT) AS week_offset
          FROM cohort_n cn,
               UNNEST(range(0, {_LTV_MAX_WEEK + 1})) AS t(w)
        ),
        cum AS (
          SELECT g.cohort_week, g.n_users, g.week_offset,
                 sum(coalesce(wk.rev, 0)) OVER (
                   PARTITION BY g.cohort_week ORDER BY g.week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum_rev
          FROM grid g LEFT JOIN wk
            ON g.cohort_week = wk.cohort_week
           AND g.week_offset = wk.week_offset
        )
        SELECT cohort_week, week_offset, n_users,
               CAST(cum_rev AS DOUBLE) AS cum_revenue,
               {_SQL_Q6.format(
                   x="CAST(cum_rev AS DOUBLE) / CAST(n_users AS DOUBLE)")}
                 AS ltv_per_user
        FROM cum ORDER BY cohort_week, week_offset
    """,
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by the week of their first
    event; cumulative purchase revenue per cohort through week
    offsets 0–3 (offset = whole weeks since the USER's first event),
    absolute and per cohort user — the longitudinal revenue
    complement of ev_weekly_retention. Offsets with no purchases
    still emit a row (the grid join) so curves are comparable.

    Scale shape: first-event per user is a map-side-combinable min;
    the purchase join is user-keyed; the cumulative window partitions
    by cohort over a FIXED 4-row offset grid (bounded frame). Revenue
    accumulates in exact decimal; divisions are single IEEE ops."""
    ev = load(spark, sf_dir, "events")
    first_ev = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = first_ev.select(
        "user_id", "first_ts",
        F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd")
        .alias("cohort_week"),
    )
    cohort_n = cohort.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_users")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .select(
            "cohort_week",
            F.floor(
                (F.unix_timestamp("ts") - F.unix_timestamp("first_ts"))
                / F.lit(604800.0)
            ).cast("long").alias("week_offset"),
            _q6(F.col("value")).cast("decimal(18,6)").alias("v"),
        )
        .filter(F.col("week_offset") <= _LTV_MAX_WEEK)
    )
    wk = purch.groupBy("cohort_week", "week_offset").agg(
        F.sum("v").cast("decimal(38,6)").alias("rev")
    )
    grid = cohort_n.select(
        "cohort_week", "n_users",
        F.explode(F.sequence(F.lit(0), F.lit(_LTV_MAX_WEEK)))
        .alias("w0"),
    ).select(
        "cohort_week", "n_users",
        F.col("w0").cast("long").alias("week_offset"),
    )
    cum = (
        grid.join(wk, ["cohort_week", "week_offset"], "left")
        .withColumn(
            "cum_rev",
            F.sum(
                F.coalesce(F.col("rev"), F.lit(0).cast("decimal(38,6)"))
            ).over(
                W.partitionBy("cohort_week").orderBy("week_offset")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    return cum.select(
        "cohort_week", "week_offset", "n_users",
        F.col("cum_rev").cast("double").alias("cum_revenue"),
        _q6(F.col("cum_rev").cast("double") / F.col("n_users").cast("double"))
        .alias("ltv_per_user"),
    ).orderBy("cohort_week", "week_offset")


# ------------------------------------ Welch's t-test

_TT_A, _TT_B = "purchase", "click"


@_staged(
    "pf_welch_ttest",
    tags=("datapipe", "profile", "stats"),
    oracle=f"""
        WITH s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST({_SQL_Q6.format(x="value")}
                      AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
                 CAST(sum(CAST({_SQL_Q6.format(x="value")}
                           AS DECIMAL(18,6))
                          * CAST({_SQL_Q6.format(x="value")}
                                 AS DECIMAL(18,6)))
                      AS DECIMAL(38,12)) AS sxx
          FROM events WHERE event_type IN ('{_TT_A}', '{_TT_B}')
          GROUP BY event_type
        ),
        m AS (
          SELECT event_type, n,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                 CASE WHEN n >= 2 THEN
                   (CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)
                 END AS var
          FROM s
        ),
        ab AS (
          SELECT
            max(CASE WHEN event_type = '{_TT_A}' THEN mean END) AS m1,
            max(CASE WHEN event_type = '{_TT_B}' THEN mean END) AS m2,
            max(CASE WHEN event_type = '{_TT_A}' THEN var END) AS v1,
            max(CASE WHEN event_type = '{_TT_B}' THEN var END) AS v2,
            max(CASE WHEN event_type = '{_TT_A}' THEN n END) AS n1,
            max(CASE WHEN event_type = '{_TT_B}' THEN n END) AS n2
          FROM m
        )
        SELECT '{_TT_A} vs {_TT_B}' AS comparison,
               CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               {_SQL_Q6.format(x="m1 - m2")} AS mean_diff,
               CASE WHEN v1 / n1 + v2 / n2 > 0 THEN
                 {_SQL_Q6.format(
                     x="(m1 - m2) / sqrt(v1 / n1 + v2 / n2)")}
               END AS t_stat,
               CASE WHEN v1 / n1 + v2 / n2 > 0 THEN
                 {_SQL_Q6.format(
                     x='''(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                        / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                           + (v2 / n2) * (v2 / n2) / (n2 - 1.0))''')}
               END AS df_welch
        FROM ab
    """,
)
def pf_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event types' value
    samples — the A/B decision primitive (t statistic +
    Welch–Satterthwaite degrees of freedom; p-values belong to the
    caller's CDF table, which is not SQL-portable). Sufficient
    statistics (n, Σx, Σx²) accumulate in exact decimal, so the
    textbook variance form has NO cancellation error across engines
    — every downstream op is a pinned chain of IEEE arithmetic
    (sqrt is correctly rounded by 754).

    Degenerate inputs are guarded identically in BOTH engines
    (ADVICE r8): a missing group yields one row with NULL stats (the
    scalar assembly is a conditional aggregate, which emits exactly
    one row even over an empty frame — matching the oracle's scalar
    subqueries), n=1 yields NULL variance (no divide-by-zero
    divergence: Spark nulls x/0, DuckDB returns Inf), and a zero
    standard error (both samples constant) yields NULL t/df.

    Scale shape: ONE map-side-combinable aggregate over the filtered
    scan; everything after runs on a 2-row frame. Integer n up to
    2⁶³; Σx² in DECIMAL(38,12) holds 10²⁶ raw value-squares."""
    ev = load(spark, sf_dir, "events")
    vq = _q6(F.col("value")).cast("decimal(18,6)")
    s = (
        ev.filter(F.col("event_type").isin(_TT_A, _TT_B))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(vq).cast("decimal(38,6)").alias("sx"),
            F.sum(vq * vq).cast("decimal(38,12)").alias("sxx"),
        )
    )
    m = s.select(
        "event_type", "n",
        (F.col("sx").cast("double") / F.col("n").cast("double"))
        .alias("mean"),
        F.when(
            F.col("n") >= 2,
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / F.col("n").cast("double")
            )
            / (F.col("n").cast("double") - F.lit(1.0)),
        ).alias("var"),
    )

    def _side(t: str, col: str):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    ab = m.agg(
        _side(_TT_A, "mean").alias("m1"), _side(_TT_B, "mean").alias("m2"),
        _side(_TT_A, "var").alias("v1"), _side(_TT_B, "var").alias("v2"),
        _side(_TT_A, "n").alias("n1"), _side(_TT_B, "n").alias("n2"),
    )
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    se2 = se2_1 + se2_2
    return ab.select(
        F.lit(f"{_TT_A} vs {_TT_B}").alias("comparison"),
        "n1", "n2",
        _q6(F.col("m1") - F.col("m2")).alias("mean_diff"),
        F.when(
            se2 > 0, _q6((F.col("m1") - F.col("m2")) / F.sqrt(se2))
        ).alias("t_stat"),
        F.when(
            se2 > 0,
            _q6(
                se2 * se2
                / (
                    se2_1 * se2_1 / (F.col("n1") - F.lit(1.0))
                    + se2_2 * se2_2 / (F.col("n2") - F.lit(1.0))
                )
            ),
        ).alias("df_welch"),
    )


# ------------------------------------ MRR retrieval eval

_MRR_K = 10


def _sql_mrr() -> str:
    toks = SQL_TOKS.format(c="text")
    qlist = "[" + ",".join(f"'{t}'" for t in _BM25_Q) + "]"
    bm = _sql_bm25(_BM25_Q, _MRR_K)
    return f"""
        WITH bm AS ({bm}),
        q AS (SELECT unnest({qlist}) AS tok),
        relt AS (
          SELECT doc_id AS doc, CAST(count(DISTINCT tok) AS INT) AS rel
          FROM (SELECT doc_id, unnest({toks}) AS tok FROM documents)
          JOIN q USING (tok) GROUP BY doc_id
        ),
        got AS (
          SELECT bm.rank, CAST(coalesce(relt.rel, 0) AS INT) AS rel
          FROM bm LEFT JOIN relt USING (doc)
        ),
        thresholds AS (SELECT CAST(unnest(range(1, 5)) AS INT) AS thr),
        firsts AS (
          SELECT t.thr,
                 min(CASE WHEN g.rel >= t.thr THEN g.rank END)
                   AS first_rank
          FROM thresholds t LEFT JOIN got g ON g.rel >= t.thr
          GROUP BY t.thr
        )
        SELECT thr AS rel_threshold,
               CAST(coalesce(first_rank, -1) AS INT) AS first_rel_rank,
               CASE WHEN first_rank IS NOT NULL THEN
                 {_SQL_Q6.format(
                     x="1.0 / CAST(first_rank AS DOUBLE)")}
               ELSE 0.0 END AS reciprocal_rank
        FROM firsts ORDER BY thr
    """


@_staged(
    "ret_mrr_eval",
    tags=("datapipe", "retrieval", "eval"),
    oracle=_sql_mrr(),
)
def ret_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first sufficiently-relevant document in
    the BM25 top-10, at every relevance threshold 1..4 (rel = distinct
    query terms present) — the rank-of-first-hit complement of
    ret_ndcg_eval; 0.0 (rank −1) when no retrieved doc reaches the
    threshold. The join of the 10-row ranking against the 4-row
    threshold grid is the reviewed bounded-BNLJ class."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens
    from cqdg_etl_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    bm = bm25_topk(docs, "text", "doc_id", _BM25_Q, k=_MRR_K)
    tk = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens(normalize_ws(F.col("text")))).alias("tok"),
    )
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in _BM25_Q], "tok string")
    )
    relt = (
        tk.join(q, "tok")
        .groupBy("doc")
        .agg(F.count_distinct("tok").cast("int").alias("rel"))
    )
    got = bm.select("rank", "doc").join(relt, "doc", "left").select(
        "rank", F.coalesce(F.col("rel"), F.lit(0)).cast("int").alias("rel")
    )
    thresholds = spark.range(1, 5).select(
        F.col("id").cast("int").alias("thr")
    )
    firsts = (
        thresholds.join(
            F.broadcast(got), F.col("rel") >= F.col("thr"), "left"
        )
        .groupBy("thr")
        .agg(F.min(F.when(F.col("rel") >= F.col("thr"), F.col("rank")))
             .alias("first_rank"))
    )
    return firsts.select(
        F.col("thr").alias("rel_threshold"),
        F.coalesce(F.col("first_rank"), F.lit(-1)).cast("int")
        .alias("first_rel_rank"),
        F.when(
            F.col("first_rank").isNotNull(),
            _q6(F.lit(1.0) / F.col("first_rank").cast("double")),
        ).otherwise(F.lit(0.0)).alias("reciprocal_rank"),
    ).orderBy("rel_threshold")


# ------------------------------------ degree assortativity

_SQL_COPARTS = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM op a JOIN op b USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey
        )"""


@_staged(
    "graph_degree_assortativity",
    tags=("datapipe", "graph", "profile"),
    oracle=f"""
        WITH {_SQL_COPARTS},
        adj AS (
          SELECT src AS a, dst AS b FROM pairs
          UNION ALL SELECT dst AS a, src AS b FROM pairs
        ),
        deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
                FROM adj GROUP BY a),
        ends AS (
          SELECT da.deg AS x, db.deg AS y
          FROM adj e
          JOIN deg da ON e.a = da.node
          JOIN deg db ON e.b = db.node
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS m,
                 sum(CAST(x AS DECIMAL(38,0))) AS sx,
                 sum(CAST(y AS DECIMAL(38,0))) AS sy,
                 sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
                 sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                 sum(CAST(y * y AS DECIMAL(38,0))) AS syy
          FROM ends
        )
        SELECT m AS n_directed_ends,
               {_SQL_Q6.format(
                   x='''(CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(m AS DOUBLE))
                      / sqrt((CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                / CAST(m AS DOUBLE))
                             * (CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                                  / CAST(m AS DOUBLE)))''')}
                 AS assortativity
        FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson
    correlation of (deg(u), deg(v)) over all DIRECTED edge ends
    (Newman 2002) — positive means hubs prefer hubs, negative means
    hub-and-spoke. One number that distinguishes social-style from
    infrastructure-style topologies — and predicts wedge-join skew.

    Scale shape: degrees are one map-side-combinable aggregate; the
    edge-end frame joins them by node (equi); ALL sufficient sums
    accumulate in DECIMAL(38,0) (degree products sum past 2⁶³ on
    hub-heavy graphs); the final Pearson expression is a pinned IEEE
    chain on one row."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    adj = pairs.select(F.col("src").alias("a"), F.col("dst").alias("b")) \
        .unionByName(
            pairs.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("x"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("y"))
    ends = adj.join(da, "a").join(db, "b")
    # Cast BEFORE aggregating (ADVICE r8): F.sum over LongType
    # accumulates in LongType and silently wraps past 2^63 on
    # hub-heavy graphs — the decimal cast must be on the addend, not
    # the result, for the DECIMAL(38,0) accumulation the docstring
    # promises (the ev_user_gini rank*count pattern). DuckDB sums
    # BIGINT into HUGEINT, so only the Spark side ever wrapped.
    s = ends.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    md = F.col("m").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    return s.select(
        F.col("m").alias("n_directed_ends"),
        _q6(
            (F.col("sxy").cast("double") - sx * sy / md)
            / F.sqrt(
                (F.col("sxx").cast("double") - sx * sx / md)
                * (F.col("syy").cast("double") - sy * sy / md)
            )
        ).alias("assortativity"),
    )
