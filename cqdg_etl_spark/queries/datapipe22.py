"""Round-14 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→21: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe22.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 10–13 belong to the
datapipe18/19/20/21 publications; these wait their turn by design.

To publish (round 14): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe22.py::_BNLJ_OK /
_GLOBAL_WINDOW_OK into the fleet lint (the orphan test enforces the
copies).

Batch theme: decision-grade comparisons — the queries that turn the
earlier profiles into go/no-go calls. One-way ANOVA across sources
(does doc length differ between sources more than within — the k-group
generalization of the staged Welch pair test), pseudo-relevance-
feedback query expansion (BM25 round two with terms mined from round
one's top docs — the classic retrieval-quality lever, fully
oracle-checked end to end), sequential market-basket rules over
first-occurrence event ordering (the temporal complement of
association rules), exact per-day p95 of event values via
value-histogram rank arithmetic (the latency-SLO percentile computed
without a corpus-wide sort), importance-weight ESS diagnostics per
source (does reweighting to the target language mixture leave a
source with any effective data), and the rich-club coefficient ladder
(do high-degree nodes preferentially interconnect — one number per
power-of-two degree threshold). No reference counterpart
(Ferlab-Ste-Justine/cqdg-etl has no analytics of this kind); every
shape is chosen for the 100-TB target and documented per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import SQL_TOKS
from cqdg_etl_spark.queries.datapipe4 import _BM25_Q
from cqdg_etl_spark.queries.registry import REGISTRY, Query, load

STAGED: dict[str, Query] = {}


def _staged(name: str, oracle: str | None = None, bench: bool = False,
            tags: tuple[str, ...] = ()):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def register() -> None:
    """Publish the staged queries into the driver registry (round 14)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention — the round-8 lesson).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


# ------------------------------------ one-way ANOVA across sources


@_staged(
    "pf_anova_nchars",
    tags=("datapipe", "profile", "stats"),
    oracle=f"""
        WITH g AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(n_chars AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS sx,
                 CAST(sum(CAST(n_chars AS DECIMAL(19,0))
                          * CAST(n_chars AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS sxx
          FROM documents GROUP BY source
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(sx) AS DECIMAL(38,0)) AS gsx,
                 CAST(sum(sxx) AS DECIMAL(38,0)) AS gsxx,
                 CAST(sum(CAST({_SQL_Q6.format(
                     x='''CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n AS DOUBLE)''')}
                      AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS a
          FROM g
        )
        SELECT k AS n_groups, nn AS n_rows,
               {_SQL_Q6.format(
                   x='''CAST(a AS DOUBLE)
                      - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                        / CAST(nn AS DOUBLE)''')} AS ssb,
               {_SQL_Q6.format(
                   x="CAST(gsxx AS DOUBLE) - CAST(a AS DOUBLE)")} AS ssw,
               CAST(k - 1 AS INT) AS df1,
               CAST(nn - k AS BIGINT) AS df2,
               CASE WHEN k >= 2 AND nn > k
                     AND CAST(gsxx AS DOUBLE) - CAST(a AS DOUBLE) > 0
               THEN
                 {_SQL_Q6.format(
                     x='''((CAST(a AS DOUBLE)
                            - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
                              / CAST(nn AS DOUBLE))
                           / (CAST(k AS DOUBLE) - 1.0))
                        / ((CAST(gsxx AS DOUBLE) - CAST(a AS DOUBLE))
                           / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))''')}
               END AS f_stat
        FROM s
    """,
)
def pf_anova_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of document length (n_chars) across sources: the
    between/within variance decomposition and its F statistic — the
    k-group generalization of the staged Welch pair test (dp20), and
    the go/no-go call on "are these sources the same kind of text".

    Determinism: per-group sufficient statistics (n, Σx, Σx²)
    accumulate in exact decimal with the cast on the ADDEND
    (DECIMAL(19) — the interarrival lesson: DuckDB executes
    DECIMAL(18)² products in int64); each group's Σx²/n term is one
    pinned IEEE chain quantized at 6 dp into decimal, their sum A is
    exact, and SSB = A − (Σx)²/N, SSW = Σx² − A, F are pinned chains
    on the single output row. Degenerate inputs (one group, zero
    within-variance, n = k) yield NULL F (the Welch discipline).

    Scale shape: ONE map-side-combinable group aggregate over the
    corpus, then ONE aggregate over the |sources|-row frame — no
    join, no scalar fan-out, nothing corpus-sized after the first
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    x19 = F.col("n_chars").cast("decimal(19,0)")
    g = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x19).cast("decimal(38,0)").alias("sx"),
        F.sum(x19 * x19).cast("decimal(38,0)").alias("sxx"),
    )
    a_term = _q6(
        F.col("sx").cast("double") * F.col("sx").cast("double")
        / F.col("n").cast("double")
    ).cast("decimal(38,6)")
    s = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("sx").cast("decimal(38,0)").alias("gsx"),
        F.sum("sxx").cast("decimal(38,0)").alias("gsxx"),
        F.sum(a_term).cast("decimal(38,6)").alias("a"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    ad = F.col("a").cast("double")
    ssb = ad - F.col("gsx").cast("double") * F.col("gsx").cast("double") / nd
    ssw = F.col("gsxx").cast("double") - ad
    return s.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        _q6(ssb).alias("ssb"),
        _q6(ssw).alias("ssw"),
        (F.col("k") - 1).cast("int").alias("df1"),
        (F.col("nn") - F.col("k")).cast("long").alias("df2"),
        F.when(
            (F.col("k") >= 2) & (F.col("nn") > F.col("k")) & (ssw > 0),
            _q6((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))),
        ).alias("f_stat"),
    )


# ------------------------------------ PRF query expansion

_PRF_BASE_K = 10
_PRF_TOPK = 10
_PRF_NEXP = 3
_PRF_W = 0.5


def _sql_prf() -> str:
    toks = SQL_TOKS.format(c="text")
    qlist = "[" + ",".join(f"'{t}'" for t in _BM25_Q) + "]"
    qnotin = ", ".join(f"'{t}'" for t in _BM25_Q)
    # identical scoring text for both passes, parameterized by the
    # term table (w = 1.0 for the base pass)
    score = (
        "round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6)"
        " * (tf * 2.2)"
        " / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
    )
    return f"""
        WITH toks AS (
          SELECT doc_id AS doc, unnest({toks}) AS tok FROM documents
        ),
        dl AS (SELECT doc, count(*) AS dl FROM toks GROUP BY doc),
        stats AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) / count(*)
                   AS avgdl
          FROM dl
        ),
        q AS (SELECT unnest({qlist}) AS tok),
        tf1 AS (
          SELECT doc, tok, count(*) AS tf
          FROM toks JOIN q USING (tok) GROUP BY doc, tok
        ),
        df1 AS (SELECT tok, count(*) AS df FROM tf1 GROUP BY tok),
        sc1 AS (
          SELECT doc, {score} AS term_score
          FROM tf1 JOIN df1 USING (tok) JOIN dl USING (doc), stats
        ),
        pd1 AS (
          SELECT doc,
                 round(CAST(sum(CAST(term_score AS DECIMAL(38,18)))
                            AS DOUBLE), 6) AS score
          FROM sc1 GROUP BY doc
        ),
        bm AS (SELECT doc FROM pd1
               ORDER BY score DESC, doc LIMIT {_PRF_BASE_K}),
        cand AS (
          SELECT t.tok, CAST(count(DISTINCT t.doc) AS BIGINT) AS dfl
          FROM toks t JOIN bm USING (doc)
          WHERE t.tok NOT IN ({qnotin})
          GROUP BY t.tok
        ),
        exp3 AS (SELECT tok FROM cand ORDER BY dfl DESC, tok
                 LIMIT {_PRF_NEXP}),
        terms AS (
          SELECT tok, CAST(1.0 AS DOUBLE) AS w FROM q
          UNION ALL
          SELECT tok, CAST({_PRF_W!r} AS DOUBLE) AS w FROM exp3
        ),
        tf2 AS (
          SELECT doc, tok, count(*) AS tf
          FROM toks JOIN terms USING (tok) GROUP BY doc, tok
        ),
        df2 AS (SELECT tok, count(*) AS df FROM tf2 GROUP BY tok),
        sc2 AS (
          SELECT doc, terms.w * ({score}) AS term_score
          FROM tf2 JOIN terms USING (tok) JOIN df2 USING (tok)
               JOIN dl USING (doc), stats
        ),
        pd2 AS (
          SELECT doc,
                 round(CAST(sum(CAST(term_score AS DECIMAL(38,18)))
                            AS DOUBLE), 6) AS score
          FROM sc2 GROUP BY doc
        )
        SELECT doc, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc) AS INT)
                 AS rank
        FROM pd2 ORDER BY score DESC, doc LIMIT {_PRF_TOPK}
    """


@_staged(
    "ret_prf_expansion_topk",
    bench=True,
    tags=("datapipe", "retrieval", "bm25", "prf"),
    oracle=_sql_prf(),
)
def ret_prf_expansion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-style, the
    classic two-pass retrieval lever): BM25 round one for the static
    query, mine the top-3 co-occurring terms from round one's top-10
    documents (local document frequency, lexicographic tie-break,
    original terms excluded), then BM25 round two with the expanded
    term set — original terms weight 1.0, expansion terms weight
    0.5. Returns the final top-10
    (doc, score, rank). Fully oracle-checked END TO END — the
    expansion-term selection runs inside the SQL oracle too, so a
    drift in either pass fails the value hash.

    Determinism: both passes share the fleet BM25 recipe (6-dp idf
    round, exact-decimal per-doc sums, score-then-id total order);
    expansion selection is integer counts with a lexicographic
    tie-break; the weights are exact binary literals.

    Scale shape: the token explode and its dl/stats aggregates are
    shared by both passes; each pass joins a ≤7-term
    broadcast term table against the token stream (corpus-sized
    frames never broadcast — the round-8 audit contract); round
    one's top-k is a TakeOrdered, and the expansion mine joins the
    10-row result against the tokens of just those docs."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens
    from cqdg_etl_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    base = bm25_topk(docs, "text", "doc_id", _BM25_Q, k=_PRF_BASE_K)
    toks = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(tokens(normalize_ws(F.col("text")))).alias("tok"),
    )
    cand = (
        toks.join(F.broadcast(base.select("doc")), "doc")
        .filter(~F.col("tok").isin(*_BM25_Q))
        .groupBy("tok")
        .agg(F.countDistinct("doc").alias("dfl"))
    )
    exp3 = cand.orderBy(F.desc("dfl"), "tok").limit(_PRF_NEXP)
    spark_terms = docs.sparkSession.createDataFrame(
        [(t, 1.0) for t in _BM25_Q], "tok string, w double"
    ).unionByName(exp3.select("tok", F.lit(float(_PRF_W)).alias("w")))

    dl = toks.groupBy("doc").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(27,6)")).cast("double")
            / F.count("*")
        ).alias("avgdl"),
    )
    tf = (
        toks.join(F.broadcast(spark_terms), "tok")
        .groupBy("doc", "tok", "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ),
        6,
    )
    den = F.col("tf") + 1.2 * (
        F.lit(1.0) - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc")
        .join(F.broadcast(stats))
        .select(
            "doc",
            (F.col("w") * (idf * (F.col("tf") * 2.2) / den))
            .alias("term_score"),
        )
    )
    pd2 = scored.groupBy("doc").agg(
        F.round(
            F.sum(F.col("term_score").cast("decimal(38,18)")).cast("double"),
            6,
        ).alias("score")
    )
    w_rank = W.orderBy(F.desc("score"), F.asc("doc"))
    return (
        pd2.orderBy(F.desc("score"), "doc")
        .limit(_PRF_TOPK)
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
    )


# ------------------------------------ sequential rules


@_staged(
    "mb_sequential_rules",
    tags=("datapipe", "basket", "temporal"),
    oracle=f"""
        WITH fo AS (
          SELECT user_id, event_type, min(ts) AS ft
          FROM events GROUP BY user_id, event_type
        ),
        u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM fo),
        nt AS (SELECT event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM fo GROUP BY event_type),
        sup AS (
          SELECT a.event_type AS antecedent, b.event_type AS consequent,
                 CAST(count(*) AS BIGINT) AS support_users
          FROM fo a JOIN fo b ON a.user_id = b.user_id
          WHERE a.event_type <> b.event_type AND a.ft < b.ft
          GROUP BY 1, 2
        )
        SELECT s.antecedent, s.consequent,
               na.n AS n_users_a, nb.n AS n_users_b, s.support_users,
               {_SQL_Q6.format(
                   x='''CAST(s.support_users AS DOUBLE)
                      / CAST(na.n AS DOUBLE)''')} AS confidence,
               {_SQL_Q6.format(
                   x='''CAST(s.support_users AS DOUBLE)
                        * CAST(u.n_users AS DOUBLE)
                      / (CAST(na.n AS DOUBLE)
                         * CAST(nb.n AS DOUBLE))''')} AS lift
        FROM sup s
        JOIN nt na ON na.event_type = s.antecedent
        JOIN nt nb ON nb.event_type = s.consequent
        CROSS JOIN u
        ORDER BY s.antecedent, s.consequent
    """,
)
def mb_sequential_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential association rules over FIRST-occurrence event
    ordering: for each ordered type pair (A → B), the number of users
    whose first A strictly precedes their first B, with confidence
    (support / users-with-A) and lift (vs independence) — the temporal
    complement of mb_association_rules: "users who view tend to later
    purchase" is invisible to unordered co-occurrence. Strict <
    excludes equal-timestamp firsts deterministically.

    Determinism: everything is integer counts from one (user, type)
    min-ts aggregate; confidence and lift are single pinned IEEE
    divisions quantized at 6 dp.

    Scale shape: the corpus scan collapses to the (user, type)
    first-occurrence aggregate (≤ |users|·|types| rows); the ordered-
    pair join is user-keyed equi with ≤ |types|² fan-out per user
    (a constant); marginals are type-keyed equi-joins and the user
    total is a 1-row scalar (the reviewed bounded-BNLJ class)."""
    ev = load(spark, sf_dir, "events")
    fo = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("ft"))
    u = fo.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    nt = fo.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a, b = fo.alias("a"), fo.alias("b")
    sup = (
        a.join(b, "user_id")
        .filter(
            (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.ft") < F.col("b.ft"))
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count("*").cast("long").alias("support_users"))
    )
    na = nt.select(
        F.col("event_type").alias("antecedent"), F.col("n").alias("n_users_a")
    )
    nb = nt.select(
        F.col("event_type").alias("consequent"), F.col("n").alias("n_users_b")
    )
    sd = F.col("support_users").cast("double")
    return (
        sup.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nb), "consequent")
        .join(F.broadcast(u))
        .select(
            "antecedent", "consequent", "n_users_a", "n_users_b",
            "support_users",
            _q6(sd / F.col("n_users_a").cast("double")).alias("confidence"),
            _q6(
                sd * F.col("n_users").cast("double")
                / (
                    F.col("n_users_a").cast("double")
                    * F.col("n_users_b").cast("double")
                )
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


# ------------------------------------ exact daily p95


@_staged(
    "ev_daily_value_p95",
    bench=True,
    tags=("datapipe", "events", "percentile"),
    oracle=f"""
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, value FROM events
        ),
        h AS (
          SELECT day, value, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY day, value
        ),
        n AS (SELECT day, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY day),
        cum AS (
          SELECT day, value,
                 CAST(sum(c) OVER (
                   PARTITION BY day ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum
          FROM h
        )
        SELECT cum.day, n.n AS n_events, min(cum.value) AS p95
        FROM cum JOIN n USING (day)
        WHERE cum.cum >= n.n - CAST(floor(CAST(n.n AS DOUBLE) / 20.0)
                                    AS BIGINT)
        GROUP BY cum.day, n.n
        ORDER BY cum.day
    """,
)
def ev_daily_value_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day 95th percentile of event values — the latency-SLO
    percentile — by value-histogram rank arithmetic: the p95 is the
    smallest value whose cumulative count reaches ceil(0.95·n) =
    n − ⌊n/20⌋ (integer-exact on both engines — no 0.95·n float
    boundary). The selected value is an EXISTING element (no
    interpolation), so both engines return the identical double and
    no quantization is needed.

    Scale shape: the corpus scan collapses to a (day, value) count
    histogram (map-side combinable; bounded by value cardinality per
    day, not event count); the running count is a per-day window over
    DISTINCT values — a day with a billion events and 10k distinct
    latencies windows over 10k rows, never a corpus sort. The final
    threshold pick is a per-day min aggregate."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    )
    h = d.groupBy("day", "value").agg(F.count("*").cast("long").alias("c"))
    n = h.groupBy("day").agg(F.sum("c").cast("long").alias("n"))
    cum = h.withColumn(
        "cum",
        F.sum("c").over(
            W.partitionBy("day").orderBy("value")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long"),
    )
    k = F.col("n") - F.floor(F.col("n").cast("double") / F.lit(20.0)).cast(
        "long"
    )
    return (
        cum.join(n, "day")
        .filter(F.col("cum") >= k)
        .groupBy("day", F.col("n").alias("n_events"))
        .agg(F.min("value").alias("p95"))
        .orderBy("day")
    )


# ------------------------------------ importance-weight ESS

# Target language mixture (the ds_mixture_weighted_sample dict shape).
_ESS_TGT = {"en": 0.4, "fr": 0.15, "es": 0.15, "de": 0.15, "zh": 0.15}
_ESS_CLIP = 2.0


@_staged(
    "ds_importance_ess",
    tags=("datapipe", "sampling", "diagnostics"),
    oracle=f"""
        WITH tgt AS (
          SELECT * FROM (VALUES {", ".join(
              f"('{k}', CAST({v!r} AS DOUBLE))"
              for k, v in _ESS_TGT.items())}) t(lang, share)
        ),
        lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
               FROM documents GROUP BY lang),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        lw AS (
          SELECT lc.lang,
                 CAST({_SQL_Q6.format(
                     x='''tgt.share * CAST(nn.n AS DOUBLE)
                        / CAST(lc.n_lang AS DOUBLE)''')}
                      AS DECIMAL(18,6)) AS w
          FROM lc JOIN tgt USING (lang) CROSS JOIN nn
        ),
        per AS (
          SELECT d.source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(lw.w) AS DECIMAL(38,6)) AS sw,
                 CAST(sum(CAST(lw.w * lw.w AS DECIMAL(38,12)))
                      AS DECIMAL(38,12)) AS sw2,
                 max(lw.w) AS maxw,
                 CAST(sum(CASE WHEN lw.w > {_ESS_CLIP!r} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_clip
          FROM documents d JOIN lw USING (lang)
          GROUP BY d.source
        )
        SELECT source, n_docs,
               {_SQL_Q6.format(x="CAST(sw AS DOUBLE)")} AS sum_w,
               {_SQL_Q6.format(
                   x='''CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                      / CAST(sw2 AS DOUBLE)''')} AS ess,
               {_SQL_Q6.format(
                   x='''CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                      / CAST(sw2 AS DOUBLE)
                      / CAST(n_docs AS DOUBLE)''')} AS ess_frac,
               {_SQL_Q6.format(
                   x="CAST(maxw AS DOUBLE) / CAST(sw AS DOUBLE)")}
                 AS max_w_share,
               {_SQL_Q6.format(
                   x='''CAST(n_clip AS DOUBLE)
                      / CAST(n_docs AS DOUBLE)''')} AS clip_frac
        FROM per ORDER BY source
    """,
)
def ds_importance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weight diagnostics per source for reweighting to the
    target language mixture: effective sample size
    ESS = (Σw)²/Σw² (Kish), its fraction of the raw count, the
    largest single-doc weight share, and the fraction of docs above
    the clip threshold (2.0) — the numbers that say whether a
    source still carries any effective data AFTER DSIR-style
    reweighting, before a single training token is spent. Documents
    in languages outside the target mixture are excluded (inner join
    — they would receive weight 0).

    Determinism: per-language weights are one pinned IEEE ratio of
    exact integers quantized at 6 dp into DECIMAL(18,6); per-source
    Σw and Σw² accumulate exactly in decimal (the square cast on the
    ADDEND); the four output ratios are pinned chains per source row.

    Scale shape: language counts are one tiny aggregate; the ≤|mixture|
    weight table broadcasts onto the corpus scan; per-source sums are
    ONE map-side-combinable aggregate. The 1-row corpus count joined
    into the weight build is the reviewed bounded-BNLJ class."""
    docs = load(spark, sf_dir, "documents")
    spark_tgt = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in _ESS_TGT.items()],
            "lang string, share double",
        )
    )
    lc = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_lang"))
    nn = docs.agg(F.count("*").cast("long").alias("n"))
    lw = (
        lc.join(spark_tgt, "lang")
        .join(F.broadcast(nn))
        .select(
            "lang",
            _q6(
                F.col("share") * F.col("n").cast("double")
                / F.col("n_lang").cast("double")
            ).cast("decimal(18,6)").alias("w"),
        )
    )
    per = (
        docs.join(F.broadcast(lw), "lang")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("decimal(38,6)").alias("sw"),
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,12)"))
            .cast("decimal(38,12)").alias("sw2"),
            F.max("w").alias("maxw"),
            F.sum(
                F.when(F.col("w") > F.lit(_ESS_CLIP), 1).otherwise(0)
            ).cast("long").alias("n_clip"),
        )
    )
    swd = F.col("sw").cast("double")
    ess = swd * swd / F.col("sw2").cast("double")
    return per.select(
        "source", "n_docs",
        _q6(swd).alias("sum_w"),
        _q6(ess).alias("ess"),
        _q6(ess / F.col("n_docs").cast("double")).alias("ess_frac"),
        _q6(F.col("maxw").cast("double") / swd).alias("max_w_share"),
        _q6(
            F.col("n_clip").cast("double") / F.col("n_docs").cast("double")
        ).alias("clip_frac"),
    ).orderBy("source")


# ------------------------------------ rich-club coefficient

_SQL_COPARTS = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM op a JOIN op b USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey
        )"""


@_staged(
    "graph_rich_club",
    tags=("datapipe", "graph", "profile"),
    oracle=f"""
        WITH {_SQL_COPARTS},
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS d FROM
            (SELECT src AS node FROM pairs
             UNION ALL SELECT dst FROM pairs)
          GROUP BY node
        ),
        nb AS (
          SELECT CAST(length(bin(d)) - 1 AS INT) AS b,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM deg GROUP BY 1
        ),
        eb AS (
          SELECT CAST(length(bin(least(da.d, db.d))) - 1 AS INT) AS b,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM pairs JOIN deg da ON da.node = src
                     JOIN deg db ON db.node = dst
          GROUP BY 1
        ),
        ladder AS (SELECT DISTINCT b FROM nb),
        ns AS (
          SELECT l.b,
                 CAST(sum(nb.cnt) AS BIGINT) AS n_nodes
          FROM ladder l JOIN nb ON nb.b >= l.b GROUP BY l.b
        ),
        es AS (
          SELECT l.b,
                 CAST(coalesce(sum(eb.cnt), 0) AS BIGINT) AS n_edges
          FROM ladder l LEFT JOIN eb ON eb.b >= l.b GROUP BY l.b
        )
        SELECT CAST(power(2, ns.b) AS BIGINT) AS k_threshold,
               ns.n_nodes, es.n_edges,
               CASE WHEN ns.n_nodes >= 2 THEN
                 {_SQL_Q6.format(
                     x='''2.0 * CAST(es.n_edges AS DOUBLE)
                        / (CAST(ns.n_nodes AS DOUBLE)
                           * (CAST(ns.n_nodes AS DOUBLE) - 1.0))''')}
               END AS phi
        FROM ns JOIN es USING (b) ORDER BY ns.b
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient ladder of the co-purchase graph: for each
    power-of-two degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1))
    where N_k counts nodes with degree ≥ k and E_k edges with BOTH
    ends of degree ≥ k — φ growing toward 1 at high k means hubs form
    a near-clique (the "rich club" that concentrates join traffic);
    φ falling means hub traffic disperses. Together with
    assortativity (dp20) and clustering (dp21), the third structural
    read behind skew planning.

    Determinism: thresholds are exact bit-length buckets
    (length(bin(d))−1 = ⌊log₂ d⌋ via strings — no float log at a
    power-of-two boundary); counts are exact integers; φ is one
    pinned chain per ladder row. N_k ≤ 1 yields NULL φ.

    Scale shape: degrees are one map-side-combinable aggregate; each
    edge is bucketed by its min-endpoint degree in the same pass that
    joins degrees back (two node-keyed equi-joins); both histograms
    are ≤63 rows (bit-length buckets), so the suffix-sum fan-out is a
    bounded ladder × histogram join, never a per-threshold corpus
    rescan. The ≤63-row non-equi suffix joins are the reviewed
    bounded-BNLJ class."""
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
    deg = (
        pairs.select(F.col("src").alias("node"))
        .unionAll(pairs.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    nb = deg.groupBy(
        (F.length(F.bin(F.col("d"))) - 1).cast("int").alias("b")
    ).agg(F.count("*").cast("long").alias("cnt"))
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    eb = (
        pairs.join(da, "src")
        .join(db, "dst")
        .groupBy(
            (F.length(F.bin(F.least(F.col("da"), F.col("db")))) - 1)
            .cast("int")
            .alias("b")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    ladder = nb.select("b").distinct()
    ns = (
        ladder.alias("l")
        .join(F.broadcast(nb.alias("h")), F.col("h.b") >= F.col("l.b"))
        .groupBy(F.col("l.b").alias("b"))
        .agg(F.sum("h.cnt").cast("long").alias("n_nodes"))
    )
    es = (
        ladder.alias("l")
        .join(
            F.broadcast(eb.alias("e")), F.col("e.b") >= F.col("l.b"), "left"
        )
        .groupBy(F.col("l.b").alias("b"))
        .agg(
            F.coalesce(F.sum("e.cnt"), F.lit(0)).cast("long")
            .alias("n_edges")
        )
    )
    nd = F.col("n_nodes").cast("double")
    return (
        ns.join(es, "b")
        .select(
            F.pow(F.lit(2.0), F.col("b").cast("double")).cast("long")
            .alias("k_threshold"),
            "n_nodes",
            "n_edges",
            F.when(
                F.col("n_nodes") >= 2,
                _q6(
                    F.lit(2.0) * F.col("n_edges").cast("double")
                    / (nd * (nd - F.lit(1.0)))
                ),
            ).alias("phi"),
        )
        .orderBy("k_threshold")
    )
