"""Round-3 batch 10: corpus-composition analytics — per-source KL
divergence from the corpus token distribution, and pairwise source
vocabulary overlap.

Oracle conventions as per the package: the KL log-ratio is the only
libm value (each term 6-dp rounded, then DECIMAL-summed so the
accumulation is order-free — the DSIR pattern); the overlap query is
all-integer until the final 6-dp Jaccard ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import SQL_NORM, SQL_TOKS
from cqdg_etl_spark.queries.registry import load, query

# ------------------------------------------- per-source KL divergence


@query(
    "tx_source_kl_divergence",
    tags=("datapipe", "text", "composition"),
    oracle=f"""
        WITH d AS (
          SELECT source, {SQL_TOKS.format(c='text')} AS tk
          FROM documents WHERE {SQL_NORM.format(c='text')} <> ''
        ),
        tok AS (SELECT source, unnest(tk) AS t FROM d),
        st AS (
          SELECT source, t, count(*) AS c_st
          FROM tok GROUP BY source, t
        ),
        ct AS (SELECT t, count(*) AS c_t FROM tok GROUP BY t),
        ns AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
        n AS (SELECT count(*) AS n FROM tok),
        terms AS (
          SELECT st.source,
                 CAST(round(
                   (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                   * ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE))
                        / (CAST(c_t AS DOUBLE) * CAST(n_s AS DOUBLE))),
                   6) AS DECIMAL(18,6)) AS term
          FROM st
          JOIN ct ON ct.t = st.t
          JOIN ns ON ns.source = st.source
          CROSS JOIN n
        )
        SELECT source,
               (SELECT CAST(n_s AS BIGINT) FROM ns
                WHERE ns.source = terms.source) AS n_toks,
               round(CAST(sum(term) AS DOUBLE), 6) AS kl
        FROM terms GROUP BY source
    """,
)
def tx_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over unigram token distributions — how far
    each source's language drifts from the corpus mixture, the
    composition diagnostic behind domain-reweighting decisions.

    Determinism at scale: every probability is an integer ratio; the
    log-ratio is the sole libm value and each per-term contribution is
    6-dp rounded THEN accumulated in DECIMAL(18,6) (order-free exact
    sum — the DSIR accumulation pattern), so the per-source KL is
    engine-exact. Shuffle shape: (source, token) counts with map-side
    combine, a token-keyed join against the corpus-marginal table, and
    per-source sums; the corpus total rides a 1-row broadcast."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    tok = (
        load(spark, sf_dir, "documents")
        .select("source", normalize_ws(F.col("text")).alias("norm"))
        .filter(F.col("norm") != "")
        .select("source", F.explode(tokens(F.col("norm"))).alias("t"))
    )
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c_st"))
    ct = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c_t"))
    ns = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n = tok.agg(F.count(F.lit(1)).alias("n"))
    term = F.round(
        (F.col("c_st").cast("double") / F.col("n_s").cast("double"))
        * F.log(
            (F.col("c_st").cast("double") * F.col("n").cast("double"))
            / (F.col("c_t").cast("double") * F.col("n_s").cast("double"))
        ),
        6,
    ).cast("decimal(18,6)")
    terms = (
        st.join(ct, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
        .select("source", "n_s", term.alias("term"))
    )
    return (
        terms.groupBy("source", "n_s")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("kl"))
        .select("source", F.col("n_s").cast("long").alias("n_toks"), "kl")
    )


# --------------------------------------------- source vocab overlap


@query(
    "tx_source_vocab_overlap",
    tags=("datapipe", "text", "composition"),
    oracle=f"""
        WITH d AS (
          SELECT source, {SQL_TOKS.format(c='text')} AS tk
          FROM documents WHERE {SQL_NORM.format(c='text')} <> ''
        ),
        v AS (SELECT DISTINCT source, unnest(tk) AS t FROM d),
        vs AS (SELECT source, count(*) AS nv FROM v GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS ni
          FROM v a JOIN v b
            ON a.t = b.t AND a.source < b.source
          GROUP BY src_a, src_b
        )
        SELECT src_a, src_b,
               CAST(va.nv AS BIGINT) AS nv_a,
               CAST(vb.nv AS BIGINT) AS nv_b,
               CAST(ni AS BIGINT) AS n_common,
               round(CAST(ni AS DOUBLE)
                     / CAST(va.nv + vb.nv - ni AS DOUBLE), 6)
                 AS jaccard
        FROM inter
        JOIN vs va ON va.source = src_a
        JOIN vs vb ON vb.source = src_b
    """,
)
def tx_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — which corpora
    speak the same language (near-duplicate feeds surface as ~1.0
    overlap). The pair join is TOKEN-keyed over the distinct
    (source, token) table — work is Σ_token df(token)², never
    |sources|² scans — and every count is an integer, so only the
    final Jaccard ratio touches doubles."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    v = (
        load(spark, sf_dir, "documents")
        .select("source", normalize_ws(F.col("text")).alias("norm"))
        .filter(F.col("norm") != "")
        .select("source", F.explode(tokens(F.col("norm"))).alias("t"))
        .distinct()
    )
    vs = v.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(b, "t")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    va = vs.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))
    vb = vs.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))
    return (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("nv_a").cast("long").alias("nv_a"),
            F.col("nv_b").cast("long").alias("nv_b"),
            F.col("ni").cast("long").alias("n_common"),
            F.round(
                F.col("ni").cast("double")
                / (F.col("nv_a") + F.col("nv_b") - F.col("ni")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------- Zipf-law fit


_ZIPF_TOP = 500


@query(
    "tx_zipf_fit",
    tags=("datapipe", "text", "composition"),
    oracle=f"""
        WITH d AS (
          SELECT {SQL_TOKS.format(c='text')} AS tk
          FROM documents WHERE {SQL_NORM.format(c='text')} <> ''
        ),
        tok AS (SELECT unnest(tk) AS t FROM d),
        wf AS (
          SELECT t, count(*) AS freq FROM tok GROUP BY t
          ORDER BY freq DESC, t LIMIT {_ZIPF_TOP}
        ),
        ranked AS (
          SELECT freq, row_number() OVER (ORDER BY freq DESC, t)
                   AS rank
          FROM wf
        ),
        xy AS (
          SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS x,
                 CAST(round(ln(CAST(freq AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS y
          FROM ranked
        ),
        s AS (
          SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy
          FROM xy
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                 AS zipf_slope,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                 AS intercept
        FROM s
    """,
)
def tx_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-500 token frequency spectrum: OLS of
    ln(freq) on ln(rank) — slope ≈ −1 for natural language, so a far-
    off exponent flags synthetic/boilerplate corpora. One row:
    (n_terms, zipf_slope, intercept).

    Determinism: the spectrum is a TakeOrderedAndProject top-k under a
    total order; each ln is 6-dp rounded into DECIMAL(18,6) and all
    OLS sufficient statistics accumulate in exact decimal (products
    stay decimal — no order-dependent double summation anywhere); the
    closed form touches doubles only in a fixed final expression. The
    window rank runs over the k-row spectrum, never the vocabulary."""
    from pyspark.sql import Window as W

    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    tok = (
        load(spark, sf_dir, "documents")
        .select(normalize_ws(F.col("text")).alias("norm"))
        .filter(F.col("norm") != "")
        .select(F.explode(tokens(F.col("norm"))).alias("t"))
    )
    wf = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("t"))
        .limit(_ZIPF_TOP)
    )
    ranked = wf.withColumn(
        "rank",
        F.row_number().over(W.partitionBy().orderBy(F.desc("freq"), F.asc("t"))),
    )
    xy = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((syd - slope * sxd) / nd, 6).alias("intercept"),
    )


# ------------------------------------------ centroid separation


@query(
    "emb_centroid_separation",
    tags=("datapipe", "vectors", "quality"),
    oracle="""
        WITH pos AS (
          SELECT label, i AS pos,
                 CAST(floor(CAST(embedding[i] AS DOUBLE)
                            * 1000000.0 + 0.5) / 1000000.0
                      AS DECIMAL(18,6)) AS v
          FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        ),
        per_dim AS (
          SELECT label, pos,
                 CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)
                            * 1000000.0 + 0.5) / 1000000.0
                      AS DECIMAL(18,6)) AS m
          FROM pos GROUP BY label, pos
        ),
        pairs AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 sum((a.m - b.m) * (a.m - b.m)) AS d2
          FROM per_dim a JOIN per_dim b
            ON a.pos = b.pos AND a.label < b.label
          GROUP BY label_a, label_b
        )
        SELECT label_a, label_b,
               round(sqrt(CAST(d2 AS DOUBLE)), 6) AS l2_dist
        FROM pairs
    """,
)
def emb_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distance between label centroids — the class-
    separability audit run before trusting labels for contrastive or
    classifier training (labels whose centroids nearly coincide are
    candidates for merging or re-annotation; pairs with `emb_label_
    noise_scores` for the per-example view).

    Determinism (hardened round 6): per-element values are 6-dp
    rounded INTO DECIMAL(18,6) BEFORE aggregation, the per-dimension
    mean is an exact decimal sum divided once as a double, and the
    6-dp quantization is floor(x*1e6 + 0.5)/1e6 — pure IEEE double
    ops, bit-identical on any engine. The previous recipe
    (round(avg(double), 6)) was doubly fragile: avg over raw doubles
    is summation-ORDER-dependent (shuffle merge order varies run to
    run), and these structured means land close enough to 6th-dp
    half boundaries that the order jitter flipped the rounded value
    (observed run-to-run on emb_intra_class_dispersion's identical
    recipe before it shipped). After the quantized means everything
    is exact decimal arithmetic until the final sqrt. The pair join
    runs over the |labels|·dims centroid table (hundreds of rows
    however large the corpus — centroid aggregation is the only
    corpus-scale pass, map-side combined)."""
    from pyspark.sql import Window as W  # noqa: F401  (symmetry w/ module)

    emb = load(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "v0"
        ),
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        # Raw elements get the same floor(x*1e6+0.5)/1e6 quantization
        # as the derived means: round()-on-double is implementation-
        # defined at 6th-dp half boundaries and would 1-ulp-split the
        # engines on a boundary-adjacent input (ADVICE r6 #4).
        (F.floor(F.col("v0") * F.lit(1000000.0) + F.lit(0.5))
         / F.lit(1000000.0)).cast("decimal(18,6)").alias("v"),
    )
    per_dim = pos.groupBy("label", "pos").agg(
        (
            F.floor(
                F.sum("v").cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    a = per_dim.select(
        F.col("label").alias("label_a"), "pos", F.col("m").alias("ma")
    )
    b = per_dim.select(
        F.col("label").alias("label_b"), "pos", F.col("m").alias("mb")
    )
    pairs = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
            ).alias("d2")
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.sqrt(F.col("d2").cast("double")), 6).alias("l2_dist"),
    )
