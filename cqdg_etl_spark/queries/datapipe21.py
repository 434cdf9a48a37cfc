"""Round-13 staged queries — NOT yet in the driver registry.

Same staging discipline as datapipe13→20: full Query objects with
DuckDB value-hash oracles, locally verified by tests/test_datapipe21.py
at sf0.001/sf0.01 + adversarial fixtures, kept out of
``cqdg_etl_spark.queries.REGISTRY`` so the published surface never
carries a name without a driver row. Rounds 10–12 belong to the
datapipe18/19/20 publications; these wait their turn by design.

To publish (round 13): call ``register()`` from queries/__init__.py,
bump EXPECTED_REGISTRY_SIZE by ``len(STAGED)``, and copy the reviewed
exception entries from tests/test_datapipe21.py::_BNLJ_OK into the
fleet lint (the orphan test enforces the copy).

Batch theme: structure beyond first-order counts — the second-order
audits a pipeline runs once the basic profiles are green. Clustering
coefficient by degree bucket (is the co-purchase graph clustered like
a social graph or tree-like — the wedge-density read behind join-skew
planning), a chi-square/Cramér's-V independence test over two order
attributes (the categorical complement of the mutual-information
profile), conditional bigram entropy rate per source (how PREDICTABLE
each source's text is — templated corpora score near zero, the
sequence-level complement of dp17's character entropy), inter-arrival
time statistics per event type (MLE exponential rate, CV, and the
Goh–Barabási burstiness index — CV≈1 is Poisson, CV≫1 is bursty),
the top principal component by unrolled decimal power iteration over
the covariance cells (the PCA direction behind whitening and
anisotropy fixes, computed without any linear-algebra library), and a
two-level shard shuffle (block-shuffled epoch order: sequential reads
within storage blocks, shuffled block order — the IO-locality epoch
permutation large-scale training loaders actually use). No reference
counterpart (Ferlab-Ste-Justine/cqdg-etl has no analytics of this
kind); every shape is chosen for the 100-TB target and documented per
query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import SQL_TOKS
from cqdg_etl_spark.queries.registry import REGISTRY, Query, load

STAGED: dict[str, Query] = {}


def _staged(name: str, oracle: str | None = None, bench: bool = False,
            tags: tuple[str, ...] = ()):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def register() -> None:
    """Publish the staged queries into the driver registry (round 13)."""
    REGISTRY.update(STAGED)


def _q6(col):
    """floor(x·1e6+0.5)/1e6 — the engine-exact 6-dp quantization used
    fleet-wide."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# Parenthesized template (README convention — the round-8 lesson).
_SQL_Q6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

_LN2 = repr(math.log(2.0))


# ------------------------------------ clustering coefficient

# Shared graph-family fixture SQL (the datapipe3/18/20 co-purchase
# convention): parts are linked when they appear in the same order.
_SQL_COPARTS = """
        op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM op a JOIN op b USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey
        )"""


@_staged(
    # NOT bench-flagged: honest (non-iterative — the triangle join
    # runs in the timed write) but ~10-15 s at sf0.1, which would
    # dominate a ~23 s suite; the scale probe carries its curvature
    # (x1→x2 exponent 0.54 measured at staging).
    "graph_clustering_coefficient",
    tags=("datapipe", "graph", "profile"),
    oracle=f"""
        WITH {_SQL_COPARTS},
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS d FROM
            (SELECT src AS node FROM pairs
             UNION ALL SELECT dst FROM pairs)
          GROUP BY node
        ),
        o AS (
          SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND src < dst)
                      THEN src ELSE dst END AS u,
                 CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND src < dst)
                      THEN dst ELSE src END AS v
          FROM pairs JOIN deg dx ON dx.node = src
                     JOIN deg dy ON dy.node = dst
        ),
        w AS (
          SELECT a.u, a.v AS p, b.v AS q
          FROM o a JOIN o b USING (u) WHERE a.v <> b.v
        ),
        t AS (SELECT w.u, w.p, w.q
              FROM w JOIN o ON o.u = w.p AND o.v = w.q),
        tc AS (
          SELECT node, CAST(count(*) AS BIGINT) AS tri
          FROM (SELECT u AS node FROM t
                UNION ALL SELECT p FROM t
                UNION ALL SELECT q FROM t)
          GROUP BY node
        ),
        cc AS (
          SELECT deg.node, deg.d,
                 CAST(coalesce(tc.tri, 0) AS BIGINT) AS tri,
                 CAST({_SQL_Q6.format(
                     x='''2.0 * CAST(coalesce(tc.tri, 0) AS DOUBLE)
                        / (CAST(deg.d AS DOUBLE)
                           * (CAST(deg.d AS DOUBLE) - 1.0))''')}
                      AS DECIMAL(18,6)) AS c
          FROM deg LEFT JOIN tc USING (node)
          WHERE deg.d >= 2
        )
        SELECT CAST(length(CAST(d AS VARCHAR)) - 1 AS INT)
                 AS degree_bucket,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(tri) AS BIGINT) AS total_triangles,
               {_SQL_Q6.format(
                   x="CAST(sum(c) AS DOUBLE) / count(*)")} AS mean_cc
        FROM cc GROUP BY 1 ORDER BY 1
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient of the co-purchase graph, profiled
    by degree magnitude: c_u = 2·T_u / (d_u·(d_u−1)) per node with
    d ≥ 2, aggregated into decimal-digit degree buckets (bucket k =
    nodes with 10^k ≤ d < 10^{k+1}) — social-style graphs hold c high
    into the hub buckets, infrastructure-style graphs decay c ~ 1/d.
    The wedge-density read that, together with assortativity (staged
    dp20), predicts which joins skew at fleet scale.

    Determinism: T_u and d_u are exact integers; each node's c is one
    pinned IEEE chain quantized at 6 dp into DECIMAL(18,6); the bucket
    mean divides the exact decimal sum by the exact count. The degree
    bucket is string-length arithmetic (length(CAST(d AS VARCHAR))−1),
    NOT floor(log2/log10) — log of an exact integer is off-by-one-ulp
    territory at bucket boundaries and the two engines need not agree.

    Scale shape: triangle counts come from operators/graph.py::
    triangle_counts — the degree-oriented FORWARD algorithm whose
    wedge fan-out is O(√m)-bounded per vertex (hot hubs receive edges
    instead of emitting d² wedges); degrees are one map-side
    combinable aggregate; the bucket rollup is a ≤10-group aggregate.
    """
    from cqdg_etl_spark.operators.graph import triangle_counts

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    # Deliberately NOT persisted: the edge set feeds four scans (the
    # degree aggregate here plus triangle_counts' internal
    # references) and Catalyst does not exchange-reuse the
    # alias-renamed subplans (measured ReusedExchange=0) — but an
    # alternating A/B at x5 measured persist-vs-recompute as a WASH
    # (83/112/65 s vs 91/83 s): the O(wedges) join dominates and the
    # rebuilt scans are a small fraction, so caching only spends
    # executor memory the wedge join wants.
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("a"),
            F.col("b.l_partkey").alias("b"),
        )
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    tri = triangle_counts(pairs).withColumnRenamed("n_triangles", "tri")
    dd = F.col("d").cast("double")
    cc = (
        deg.filter(F.col("d") >= 2)
        .join(tri, "node", "left")
        .select(
            "d",
            F.coalesce(F.col("tri"), F.lit(0).cast("long")).alias("tri"),
        )
        .withColumn(
            "c",
            _q6(
                F.lit(2.0) * F.col("tri").cast("double")
                / (dd * (dd - F.lit(1.0)))
            ).cast("decimal(18,6)"),
        )
    )
    return (
        cc.groupBy(
            (F.length(F.col("d").cast("string")) - 1)
            .cast("int")
            .alias("degree_bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("tri").cast("long").alias("total_triangles"),
            _q6(F.sum("c").cast("double") / F.count("*")).alias("mean_cc"),
        )
        .orderBy("degree_bucket")
    )


# ------------------------------------ chi-square independence

_CHI_A, _CHI_B = "o_orderpriority", "o_orderstatus"


@_staged(
    "pf_chi2_independence",
    tags=("datapipe", "profile", "stats"),
    oracle=f"""
        WITH joint AS (
          SELECT {_CHI_A} AS pa, {_CHI_B} AS pb,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1, 2
        ),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(count(DISTINCT pa) AS BIGINT) AS r,
                 CAST(count(DISTINCT pb) AS BIGINT) AS c
          FROM joint
        ),
        ma AS (SELECT pa, CAST(sum(n) AS BIGINT) AS na
               FROM joint GROUP BY pa),
        mb AS (SELECT pb, CAST(sum(n) AS BIGINT) AS nb
               FROM joint GROUP BY pb),
        terms AS (
          SELECT CAST({_SQL_Q6.format(
              x='''(CAST(j.n AS DOUBLE)
                    - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
                      / CAST(tot.nn AS DOUBLE))
                   * (CAST(j.n AS DOUBLE)
                      - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
                        / CAST(tot.nn AS DOUBLE))
                   / (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
                      / CAST(tot.nn AS DOUBLE))
                   - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
                     / CAST(tot.nn AS DOUBLE)''')}
                AS DECIMAL(18,6)) AS term
          FROM joint j
          JOIN ma USING (pa) JOIN mb USING (pb) CROSS JOIN tot
        ),
        s AS (SELECT CAST(sum(term) AS DECIMAL(38,6)) AS t FROM terms)
        SELECT tot.nn AS n_rows, tot.r AS n_a, tot.c AS n_b,
               CAST((tot.r - 1) * (tot.c - 1) AS INT) AS dof,
               CAST(s.t + tot.nn AS DOUBLE) AS chi2,
               CASE WHEN least(tot.r - 1, tot.c - 1) >= 1
                     AND CAST(s.t + tot.nn AS DOUBLE) >= 0 THEN
                 {_SQL_Q6.format(
                     x='''sqrt(CAST(s.t + tot.nn AS DOUBLE)
                             / (CAST(tot.nn AS DOUBLE)
                                * CAST(least(tot.r - 1, tot.c - 1)
                                       AS DOUBLE)))''')}
               END AS cramers_v
        FROM s CROSS JOIN tot
    """,
)
def pf_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority
    and order status, with Cramér's V as the [0,1] effect size — the
    categorical-pair complement of the mutual-information profile
    (staged dp18): MI says how many bits the columns share, V says
    whether the association is negligible or structural.

    Zero-observed cells NEVER need enumerating: a zero cell's term is
    (0−e)²/e = e, and Σ_all e_ij = N exactly, so
    χ² = N + Σ_observed ((n−e)²/e − e) — the algebra that keeps the
    computation on the observed-cell frame instead of a dims-cross
    blowup (at fleet scale a sparse r×c cross of two high-cardinality
    columns is corpus-sized; the observed frame is data-sized).

    Determinism: counts and marginals exact integers; each observed
    cell's term is a pinned IEEE chain quantized at 6 dp into decimal,
    the sum is exact, +N is exact, and V is one sqrt on the 1-row
    result. Scale shape: one groupBy for the joint frame, marginals
    re-aggregated FROM the joint (never a second corpus scan), two
    equi-joins onto the cells, and two 1-row scalar fan-outs (the
    reviewed bounded-BNLJ class)."""
    o = load(spark, sf_dir, "orders").select(
        F.col(_CHI_A).alias("pa"), F.col(_CHI_B).alias("pb")
    )
    joint = o.groupBy("pa", "pb").agg(F.count("*").cast("long").alias("n"))
    tot = joint.agg(
        F.sum("n").cast("long").alias("nn"),
        F.countDistinct("pa").cast("long").alias("r"),
        F.countDistinct("pb").cast("long").alias("c"),
    )
    ma = joint.groupBy("pa").agg(F.sum("n").cast("long").alias("na"))
    mb = joint.groupBy("pb").agg(F.sum("n").cast("long").alias("nb"))
    e = (
        F.col("na").cast("double") * F.col("nb").cast("double")
        / F.col("nn").cast("double")
    )
    cells = (
        joint.join(ma, "pa")
        .join(mb, "pb")
        .join(F.broadcast(tot))
        .select(
            _q6(
                (F.col("n").cast("double") - e)
                * (F.col("n").cast("double") - e) / e
                - e
            ).cast("decimal(18,6)").alias("term")
        )
    )
    s = cells.agg(F.sum("term").cast("decimal(38,6)").alias("t"))
    chi2 = (F.col("t") + F.col("nn")).cast("double")
    return s.join(F.broadcast(tot)).select(
        F.col("nn").alias("n_rows"),
        F.col("r").alias("n_a"),
        F.col("c").alias("n_b"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("int").alias("dof"),
        chi2.alias("chi2"),
        # Degenerate guard (ADVICE r9, the Welch/ANOVA discipline): a
        # one-level column makes least(r-1, c-1) = 0 — Spark's sqrt of
        # a /0 yields NULL while DuckDB yields Inf, an engine
        # divergence; a near-zero quantized chi2 can also dip slightly
        # negative under the sqrt. NULL on both engines instead.
        F.when(
            (F.least(F.col("r") - 1, F.col("c") - 1) >= 1)
            & (chi2 >= 0),
            _q6(
                F.sqrt(
                    chi2
                    / (
                        F.col("nn").cast("double")
                        * F.least(F.col("r") - 1, F.col("c") - 1)
                        .cast("double")
                    )
                )
            ),
        ).alias("cramers_v"),
    )


# ------------------------------------ bigram entropy rate

@_staged(
    "tx_bigram_entropy_rate",
    bench=True,
    tags=("datapipe", "text", "entropy"),
    oracle=f"""
        WITH tl AS (SELECT doc_id, source,
                           {SQL_TOKS.format(c="text")} AS toks
                    FROM documents),
        bi AS (
          SELECT source, toks[CAST(i AS INT)] AS w,
                 toks[CAST(i AS INT) + 1] AS x
          FROM tl, UNNEST(range(1, len(toks))) AS t(i)
        ),
        cnt AS (
          SELECT source, w, x, CAST(count(*) AS BIGINT) AS n
          FROM bi GROUP BY 1, 2, 3
        ),
        nw AS (
          SELECT source, w, CAST(sum(n) AS BIGINT) AS n_w
          FROM cnt GROUP BY 1, 2
        ),
        tot AS (
          SELECT source, CAST(sum(n) AS BIGINT) AS nb
          FROM cnt GROUP BY 1
        ),
        ct AS (
          SELECT c.source,
                 CAST({_SQL_Q6.format(
                     x=f'''(CAST(c.n AS DOUBLE) / CAST(tot.nb AS DOUBLE))
                         * ln(CAST(nw.n_w AS DOUBLE)
                              / CAST(c.n AS DOUBLE)) / {_LN2}''')}
                      AS DECIMAL(18,6)) AS term
          FROM cnt c JOIN nw USING (source, w) JOIN tot USING (source)
        ),
        ut AS (
          SELECT nw.source,
                 CAST({_SQL_Q6.format(
                     x=f'''(CAST(nw.n_w AS DOUBLE)
                            / CAST(tot.nb AS DOUBLE))
                         * ln(CAST(tot.nb AS DOUBLE)
                              / CAST(nw.n_w AS DOUBLE)) / {_LN2}''')}
                      AS DECIMAL(18,6)) AS term
          FROM nw JOIN tot USING (source)
        ),
        hc AS (SELECT source, CAST(sum(term) AS DECIMAL(38,6)) AS h
               FROM ct GROUP BY source),
        hu AS (SELECT source, CAST(sum(term) AS DECIMAL(38,6)) AS h
               FROM ut GROUP BY source)
        SELECT hc.source, tot.nb AS n_bigrams,
               CAST(hu.h AS DOUBLE) AS h_unigram,
               CAST(hc.h AS DOUBLE) AS h_cond,
               CAST(hu.h - hc.h AS DOUBLE) AS info_gain
        FROM hc JOIN hu USING (source) JOIN tot USING (source)
        ORDER BY hc.source
    """,
)
def tx_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram entropy rate per source:
    H(X_{t+1}|X_t) = Σ p(w,x)·log₂(n_w/n_wx) bits/token over
    within-document token bigrams, next to the unigram entropy of the
    same stream and their difference (the adjacent-token mutual
    information). The sequence-level predictability read: templated or
    boilerplate sources sit near zero entropy RATE even when their
    unigram entropy looks healthy — dp17's character entropy cannot
    see token-order structure, this is the query that does.

    Determinism: all counts exact integers from one bigram aggregate
    (marginals and totals re-aggregated from it, never a second
    scan); each summand is a pinned IEEE chain quantized at 6 dp into
    decimal, sums exact, output one cast per column. Bigrams come
    from slice+zip JVM expressions (no window, no Python): documents
    with <2 tokens contribute nothing on either engine.

    Scale shape: explode → one map-side-combinable (source, w, x)
    aggregate bounded by per-source bigram vocabulary (≪ corpus at
    any scale); everything downstream runs on vocabulary-sized
    frames with source-keyed equi-joins."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", tokens(normalize_ws(F.col("text")))
    )
    bi = (
        docs.filter(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(w, i) -> struct(w AS w, "
                    "element_at(toks, i + 2) AS x))"
                )
            ).alias("b"),
        )
        .select("source", F.col("b.w").alias("w"), F.col("b.x").alias("x"))
    )
    cnt = bi.groupBy("source", "w", "x").agg(
        F.count("*").cast("long").alias("n")
    )
    nw = cnt.groupBy("source", "w").agg(F.sum("n").cast("long").alias("n_w"))
    tot = cnt.groupBy("source").agg(F.sum("n").cast("long").alias("nb"))
    ln2 = F.lit(float(_LN2))
    ct = (
        cnt.join(nw, ["source", "w"])
        .join(tot, "source")
        .select(
            "source",
            _q6(
                (F.col("n").cast("double") / F.col("nb").cast("double"))
                * F.log(
                    F.col("n_w").cast("double") / F.col("n").cast("double")
                )
                / ln2
            ).cast("decimal(18,6)").alias("term"),
        )
    )
    ut = nw.join(tot, "source").select(
        "source",
        _q6(
            (F.col("n_w").cast("double") / F.col("nb").cast("double"))
            * F.log(F.col("nb").cast("double") / F.col("n_w").cast("double"))
            / ln2
        ).cast("decimal(18,6)").alias("term"),
    )
    hc = ct.groupBy("source").agg(
        F.sum("term").cast("decimal(38,6)").alias("hc")
    )
    hu = ut.groupBy("source").agg(
        F.sum("term").cast("decimal(38,6)").alias("hu")
    )
    return (
        hc.join(hu, "source")
        .join(tot, "source")
        .select(
            "source",
            F.col("nb").alias("n_bigrams"),
            F.col("hu").cast("double").alias("h_unigram"),
            F.col("hc").cast("double").alias("h_cond"),
            (F.col("hu") - F.col("hc")).cast("double").alias("info_gain"),
        )
        .orderBy("source")
    )


# ------------------------------------ inter-arrival statistics


@_staged(
    "ev_interarrival_stats",
    tags=("datapipe", "events", "stats"),
    oracle=f"""
        WITH g AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id
                 ) AS d
          FROM events
        ),
        s AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(d AS DECIMAL(18,0))) AS DECIMAL(38,0))
                   AS sd,
                 -- DECIMAL(19) forces HUGEINT storage: DuckDB executes
                 -- a DECIMAL(18)*DECIMAL(18) product in int64 and
                 -- overflows on multi-day gaps squared
                 CAST(sum(CAST(d AS DECIMAL(19,0))
                          * CAST(d AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS sd2
          FROM g WHERE d IS NOT NULL GROUP BY event_type
        ),
        m AS (
          SELECT event_type, n,
                 CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                   AS mean_s,
                 CASE WHEN n >= 2 THEN
                   sqrt((CAST(sd2 AS DOUBLE)
                         - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)) / 1000000.0
                 END AS std_s
          FROM s
        )
        SELECT event_type, n AS n_gaps,
               {_SQL_Q6.format(x="mean_s")} AS mean_gap_s,
               CASE WHEN mean_s > 0 THEN
                 {_SQL_Q6.format(x="3600.0 / mean_s")}
               END AS rate_per_hour,
               CASE WHEN std_s IS NOT NULL AND mean_s > 0 THEN
                 {_SQL_Q6.format(x="std_s / mean_s")}
               END AS cv,
               CASE WHEN std_s IS NOT NULL AND std_s + mean_s > 0 THEN
                 {_SQL_Q6.format(
                     x="(std_s - mean_s) / (std_s + mean_s)")}
               END AS burstiness
        FROM m ORDER BY event_type
    """,
)
def ev_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics over per-user gaps: the
    MLE exponential rate (1/mean, reported per hour), the coefficient
    of variation, and the Goh–Barabási burstiness index
    B = (σ−μ)/(σ+μ) — CV≈1/B≈0 is memoryless Poisson traffic, CV≫1/
    B→1 is bursty sessions, CV<1/B<0 is pacemaker-regular. The
    arrival-process read behind capacity planning and bot filtering,
    complementing the staged per-day Poisson burst detector (dp19)
    with a sub-day, per-process view.

    Degenerate inputs follow the Welch discipline (ADVICE r8): types
    with a single gap get NULL std/cv/burstiness (never a
    divide-by-zero engine divergence), all-zero-gap types (pure ties)
    get NULL rate/cv/burstiness via the mean>0 guards on BOTH sides.

    Determinism: gaps are exact integer microseconds (epoch_us ↔
    unix_micros); sufficient statistics (n, Σd, Σd²) accumulate in
    exact decimal with the cast on the ADDEND (Σd² reaches 10²⁶ —
    int64 wraps, the assortativity lesson); mean/std/CV/B are pinned
    IEEE chains on the per-type row, quantized at 6 dp. Scale shape:
    one per-(type,user) lag window (bounded by a user's events of one
    type), then one map-side-combinable aggregate; the output is
    |event_types| rows."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    mu = F.unix_micros(F.col("ts"))
    g = ev.select(
        "event_type",
        (mu - F.lag(mu).over(w)).alias("d"),
    ).filter(F.col("d").isNotNull())
    dd = F.col("d").cast("decimal(18,0)")
    d19 = F.col("d").cast("decimal(19,0)")
    s = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dd).cast("decimal(38,0)").alias("sd"),
        F.sum(d19 * d19).cast("decimal(38,0)").alias("sd2"),
    )
    nn = F.col("n").cast("double")
    mean_s = F.col("sd").cast("double") / nn / F.lit(1000000.0)
    std_s = F.when(
        F.col("n") >= 2,
        F.sqrt(
            (
                F.col("sd2").cast("double")
                - F.col("sd").cast("double") * F.col("sd").cast("double")
                / nn
            )
            / (nn - F.lit(1.0))
        )
        / F.lit(1000000.0),
    )
    m = s.select(
        "event_type", "n",
        mean_s.alias("mean_s"), std_s.alias("std_s"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        _q6(F.col("mean_s")).alias("mean_gap_s"),
        F.when(
            F.col("mean_s") > 0, _q6(F.lit(3600.0) / F.col("mean_s"))
        ).alias("rate_per_hour"),
        F.when(
            F.col("std_s").isNotNull() & (F.col("mean_s") > 0),
            _q6(F.col("std_s") / F.col("mean_s")),
        ).alias("cv"),
        F.when(
            F.col("std_s").isNotNull()
            & (F.col("std_s") + F.col("mean_s") > 0),
            _q6(
                (F.col("std_s") - F.col("mean_s"))
                / (F.col("std_s") + F.col("mean_s"))
            ),
        ).alias("burstiness"),
    ).orderBy("event_type")


# ------------------------------------ top principal component

_PI_ITERS = 8

# Covariance-cell SQL (the emb_covariance_cells oracle formulation —
# fine at oracle SFs; the ENGINE uses the GEMM-partial operator, see
# the query docstring).
_SQL_COV_CELLS = """
        f AS (
          SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings, range(1, 65) t(i)
        ),
        mss AS (SELECT i, avg(v) AS mu FROM f GROUP BY i),
        ncnt AS (SELECT count(*) AS n FROM embeddings),
        cells AS MATERIALIZED (
          SELECT a.i - 1 AS i, b.i - 1 AS j,
                 round(sum((a.v - ma.mu) * (b.v - mb.mu)) / any_value(ncnt.n),
                       6) + 0.0 AS cov
          FROM f a
          JOIN f b ON a.vec_id = b.vec_id AND a.i <= b.i
          JOIN mss ma ON ma.i = a.i
          JOIN mss mb ON mb.i = b.i
          CROSS JOIN ncnt
          GROUP BY 1, 2
        ),
        cmat AS MATERIALIZED (
          SELECT i, j, CAST(cov AS DECIMAL(18,6)) AS c FROM cells
          UNION ALL
          SELECT j AS i, i AS j, CAST(cov AS DECIMAL(18,6)) AS c
          FROM cells WHERE i < j
        )"""


def _sql_power_iteration(iters: int = _PI_ITERS) -> str:
    steps = []
    prev = "v0"
    for k in range(1, iters + 1):
        # MATERIALIZED kills DuckDB's CTE re-inlining: every level
        # references its predecessor twice (via z and v), so the
        # un-materialized plan re-expands the whole chain 2^iters
        # times — the covariance subtree is corpus-sized joins, not
        # the Markov oracle's 25-row frame, and the inlined form
        # never finishes.
        steps.append(f"""
        r{k} AS MATERIALIZED (
          SELECT c.i AS dim,
                 CAST(sum(CAST(c.c * v.v AS DECIMAL(38,12)))
                      AS DECIMAL(38,12)) AS s
          FROM cmat c JOIN {prev} v ON c.j = v.dim
          GROUP BY c.i
        ),
        z{k} AS (SELECT max(abs(s)) AS z FROM r{k}),
        v{k} AS (
          SELECT dim,
                 CAST({_SQL_Q6.format(
                     x="CAST(s AS DOUBLE) / CAST(z AS DOUBLE)")}
                      AS DECIMAL(18,6)) AS v
          FROM r{k}, z{k}
        )""")
        prev = f"v{k}"
    return f"""
        WITH {_SQL_COV_CELLS},
        v0 AS (
          SELECT DISTINCT i AS dim, CAST(1.0 AS DECIMAL(18,6)) AS v
          FROM cmat
        ),{",".join(steps)}
        SELECT v.dim AS dim, CAST(v.v AS DOUBLE) AS loading,
               {_SQL_Q6.format(x="CAST(z.z AS DOUBLE)")} AS lambda_est
        FROM v{iters} v, z{iters} z
        ORDER BY dim
    """


@_staged(
    # NOT bench-flagged (the graph_hits_scores lesson, same round it
    # was learned): iterative — all 8 rounds run in localCheckpoint
    # actions inside fn(), so bench's timed write would read the
    # 64-row checkpointed result, not the iteration. The scale probe
    # (fresh build+write) is the honest harness.
    "emb_top_pc_power_iteration",
    tags=("datapipe", "embedding", "iterative"),
    oracle=_sql_power_iteration(),
)
def emb_top_pc_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by 8 unrolled
    power iterations v′ = C·v over the covariance cells, renormalized
    by max-|component| each round — the dominant-direction read behind
    whitening, anisotropy fixes ("all my embeddings point the same
    way"), and matryoshka-style dimension triage. Returns one row per
    dimension (dim, loading, λ̂): loading is the unit-max-abs
    eigenvector estimate, λ̂ the last renormalization constant (the
    dominant eigenvalue once the iteration has converged). No linear-
    algebra library anywhere — the matrix-vector product is a d²-row
    equi-join + aggregate.

    Convergence contract (documented, not hidden): the direction
    error decays like (λ₂/λ₁)^K — on the anisotropic corpora this
    audit exists for (λ₁/λ₂ ≫ 1; anisotropy IS the finding) 8 rounds
    pin the direction, while on a near-degenerate spectrum the
    estimate mixes the top eigenspace and λ̂ reads low. The synthetic
    harness corpus is near-isotropic by construction (λ₁/λ₂ ≈ 1.07
    at sf0.001), so here the query exercises the full plumbing and
    the fixture with a separated spectrum proves convergence; the
    cross-engine result is bit-identical at ANY iteration count
    (that is what the oracle pins).

    Determinism (the ev_markov_stationary recipe): C is quantized at
    6 dp into DECIMAL(18,6) (inherited from the driver-green
    emb_covariance_cells contract), v likewise; products are cast to
    DECIMAL(38,12) on the ADDEND and summed exactly; each round does
    ONE IEEE division per dimension, quantized at 6 dp. Precondition:
    a corpus with nonzero variance (z > 0) — an all-constant corpus
    divides 0/0 (NULL vs NaN across engines), which no real embedding
    table produces.

    Scale shape: the cells come from operators/embstats.py::
    covariance_cells — per-partition GEMM partials, O(partitions·d²)
    reduce rows, corpus-size-independent; all 8 iterations run on the
    d²-row frame (4096 rows at d=64 — bounded however big the corpus)
    with per-round localCheckpoint lineage truncation and a 1-row
    max-abs renormalization scalar (the reviewed bounded-BNLJ
    class)."""
    from cqdg_etl_spark.operators.embstats import covariance_cells

    emb = load(spark, sf_dir, "embeddings")
    cells = covariance_cells(emb, "embedding")
    up = cells.select(
        "i", "j", F.col("cov").cast("decimal(18,6)").alias("c")
    )
    lo = cells.filter(F.col("i") < F.col("j")).select(
        F.col("j").alias("i"),
        F.col("i").alias("j"),
        F.col("cov").cast("decimal(18,6)").alias("c"),
    )
    cmat = up.unionByName(lo).persist()
    v = (
        cmat.select(F.col("i").alias("dim"))
        .distinct()
        .select("dim", F.lit(1.0).cast("decimal(18,6)").alias("v"))
        .localCheckpoint()
    )
    z = None
    for _ in range(_PI_ITERS):
        # Per-round lineage truncation (the Markov/graph iterative
        # discipline): the frames are d²-bounded, the checkpoint ~free,
        # and without it the un-truncated plan doubles per level.
        r = (
            cmat.join(v, cmat["j"] == v["dim"])
            .groupBy(cmat["i"].alias("dim"))
            .agg(
                F.sum((F.col("c") * F.col("v")).cast("decimal(38,12)"))
                .cast("decimal(38,12)")
                .alias("s")
            )
            .localCheckpoint()
        )
        z = r.agg(F.max(F.abs(F.col("s"))).alias("z"))
        v = (
            r.join(F.broadcast(z))
            .select(
                "dim",
                _q6(F.col("s").cast("double") / F.col("z").cast("double"))
                .cast("decimal(18,6)")
                .alias("v"),
            )
            .localCheckpoint()
        )
    out = v.join(F.broadcast(z)).select(
        "dim",
        F.col("v").cast("double").alias("loading"),
        _q6(F.col("z").cast("double")).alias("lambda_est"),
    ).orderBy("dim")
    cmat.unpersist()
    return out


# ------------------------------------ two-level shard shuffle

_BLK = 64  # documents per storage block


@_staged(
    # NOT bench-flagged: the two-pass global rank/cumsum helpers run
    # their per-partition-counts actions (and persist) eagerly inside
    # fn(), so bench's timed write would read mostly-cached ranks —
    # the same partial-work distortion as the iterative queries.
    "ds_two_level_shard_shuffle",
    tags=("datapipe", "sampling", "ordering"),
    oracle=f"""
        WITH r1 AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
                   AS sr
          FROM documents
        ),
        blk AS (
          SELECT doc_id,
                 CAST(floor((sr - 1) / {_BLK}) AS BIGINT) AS block_id
          FROM r1
        ),
        wr AS (
          SELECT doc_id, block_id,
                 CAST(row_number() OVER (
                   PARTITION BY block_id
                   ORDER BY CAST(('0x' || substring(md5('intra'
                     || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                     doc_id
                 ) AS BIGINT) AS w
          FROM blk
        ),
        bs AS (SELECT block_id, CAST(count(*) AS BIGINT) AS bsz
               FROM blk GROUP BY block_id),
        br AS (
          SELECT block_id, bsz,
                 CAST(row_number() OVER (
                   ORDER BY CAST(('0x' || substring(md5('block'
                     || CAST(block_id AS VARCHAR)), 1, 8)) AS BIGINT),
                     block_id
                 ) AS BIGINT) AS brk
          FROM bs
        ),
        bo AS (
          SELECT block_id,
                 CAST(sum(bsz) OVER (ORDER BY brk) - bsz AS BIGINT)
                   AS off
          FROM br
        )
        SELECT wr.doc_id, wr.block_id,
               CAST(bo.off + wr.w AS BIGINT) AS epoch_pos
        FROM wr JOIN bo USING (block_id)
    """,
)
def ds_two_level_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level epoch permutation: documents are grouped into
    storage-order blocks of {B} (sequential reads — the IO-locality
    unit), block ORDER is md5-shuffled globally, and documents are
    md5-shuffled WITHIN their block — the shard-shuffle + intra-shard-
    shuffle epoch ordering every large-scale training loader uses
    instead of a full random permutation (which reads the corpus in
    random order, one seek per example). epoch_pos is a bijection onto
    1..N; consecutive positions stay within one block of ≤{B}
    sequential documents.

    Determinism: both shuffles rank by md5(salt‖id) with the id as
    tiebreaker (the ds_deterministic_shuffle convention) — any run,
    any engine, any partitioning derives the same permutation, and a
    resumed epoch continues from a position offset.

    Scale shape: the storage rank and the shuffled-block offsets use
    the two-pass range-partitioned global rank/cumsum
    (operators/ranking.py) — never a single-task ORDER BY; the only
    plain windows are per-block (≤{B} rows by construction). The
    oracle's global row_number/sum windows are the oracle-side
    formulation only."""
    from cqdg_etl_spark.operators.ranking import global_cumsum, global_rank
    from cqdg_etl_spark.operators.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents").select("doc_id")
    r1 = global_rank(docs, [F.col("doc_id")], rank_col="sr")
    blk = r1.select(
        "doc_id",
        F.floor((F.col("sr") - 1) / F.lit(_BLK)).cast("long")
        .alias("block_id"),
    )
    wr = blk.select(
        "doc_id",
        "block_id",
        F.row_number()
        .over(
            W.partitionBy("block_id").orderBy(
                hash_bucket(F.col("doc_id"), "intra"), F.col("doc_id")
            )
        )
        .cast("long")
        .alias("w"),
    )
    bs = blk.groupBy("block_id").agg(F.count("*").cast("long").alias("bsz"))
    br = global_rank(
        bs.withColumn("_bk", hash_bucket(F.col("block_id"), "block")),
        [F.col("_bk"), F.col("block_id")],
        rank_col="brk",
    )
    bo = global_cumsum(
        br, [F.col("brk")], "bsz", "cum"
    ).select(
        "block_id", (F.col("cum") - F.col("bsz")).cast("long").alias("off")
    )
    return wr.join(bo, "block_id").select(
        "doc_id",
        "block_id",
        (F.col("off") + F.col("w")).cast("long").alias("epoch_pos"),
    )


# keep the docstring {B} placeholders honest
ds_two_level_shard_shuffle.__doc__ = (
    ds_two_level_shard_shuffle.__doc__.replace("{B}", str(_BLK))
)
STAGED["ds_two_level_shard_shuffle"].doc = ds_two_level_shard_shuffle.__doc__
