"""Round-3 batch 3: MERGE-INTO upsert, DSIR importance weights,
HyperLogLog cardinality, Adamic-Adar link prediction, PQ asymmetric-
distance ANN, and CCNet-style per-language perplexity buckets.

Oracle conventions as per the package: exact-decimal accumulation for
float sums, round(ln, 6) (or the sketch's 2 dp) for libm values,
md5-derived portable hashes, total-order tiebreakers on every rank,
explicit CAST(... AS DOUBLE) so DuckDB's decimal literals can't
change an arithmetic dtype.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqdg_etl_spark.operators import similarity
from cqdg_etl_spark.queries.datapipe import SQL_TOKS
from cqdg_etl_spark.queries.registry import load, query

# ------------------------------------------------- MERGE INTO upsert


@query(
    "etl_merge_upsert",
    tags=("etl", "cdc", "merge"),
    oracle="""
        WITH t AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey % 97 <> 3
        ),
        s AS (
          SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 5 = 0
        )
        SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.o_totalprice ELSE t.o_totalprice
               END AS o_totalprice,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.o_orderstatus ELSE t.o_orderstatus
               END AS o_orderstatus
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE INTO as a batch operator (operators/diff.py::
    merge_upsert): a simulated existing table (keys % 97 <> 3) absorbs
    a source batch (every 5th key, price bumped) — matched keys update,
    unmatched insert, the rest carry over. ONE full-outer shuffle join
    + coalesce projection; the plain-parquet equivalent of Delta/
    Iceberg MERGE."""
    from cqdg_etl_spark.operators.diff import merge_upsert

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    target = orders.filter(F.col("o_orderkey") % 97 != 3)
    source = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10.0
    )
    return merge_upsert(target, source, ["o_orderkey"])


# ------------------------------------------- DSIR importance weights

_DSIR_BUCKETS = 1024


@query(
    "ds_dsir_logweights",
    tags=("datapipe", "sampling", "dsir", "quality"),
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {SQL_TOKS.format(c="text")} AS t FROM documents
        ),
        big AS (
          SELECT doc_id,
                 unnest(list_slice(t, 1, len(t) - 1)) AS w1,
                 unnest(list_slice(t, 2, len(t))) AS w2
          FROM toks WHERE len(t) >= 2
        ),
        feats AS (
          SELECT doc_id,
                 CAST(('0x' || substring(md5(w1 || ' ' || w2), 1, 8))
                      AS BIGINT) % {_DSIR_BUCKETS} AS bucket
          FROM big
        ),
        rc AS (SELECT bucket, count(*) AS cr FROM feats GROUP BY bucket),
        tc AS (
          SELECT bucket, count(*) AS ct
          FROM feats JOIN documents USING (doc_id)
          WHERE source = 'src0' GROUP BY bucket
        ),
        nr AS (SELECT sum(cr) AS nr FROM rc),
        nt AS (SELECT sum(ct) AS nt FROM tc),
        ratios AS (
          SELECT r.b AS bucket,
                 round(ln(
                   (CAST(coalesce(ct, 0) + 1 AS DOUBLE)
                    / CAST(nt + {_DSIR_BUCKETS} AS DOUBLE))
                   / (CAST(coalesce(cr, 0) + 1 AS DOUBLE)
                      / CAST(nr + {_DSIR_BUCKETS} AS DOUBLE))
                 ), 6) AS log_ratio
          FROM range({_DSIR_BUCKETS}) r(b)
          LEFT JOIN rc ON rc.bucket = r.b
          LEFT JOIN tc ON tc.bucket = r.b
          CROSS JOIN nr CROSS JOIN nt
        )
        SELECT doc_id, count(*) AS n_feats,
               round(CAST(sum(CAST(log_ratio AS DECIMAL(38,6))) AS DOUBLE),
                     6) AS log_weight
        FROM feats JOIN ratios USING (bucket)
        GROUP BY doc_id
    """,
)
def ds_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-bigram feature
    distributions of a target slice (source = 'src0') vs the raw pool;
    per-document log weight = decimal sum of 6-dp per-feature log
    ratios. Positive = target-like. The broadcast-ratio-table shape
    that replaces a per-document neural classifier at crawl scale
    (operators/importance.py)."""
    from cqdg_etl_spark.operators.importance import dsir_log_weights

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    return dsir_log_weights(
        docs, target, "text", "doc_id", n_buckets=_DSIR_BUCKETS
    )


# ------------------------------------------- HyperLogLog cardinality

_HLL_M = 256  # p = 8


@query(
    "sk_hll_users",
    tags=("datapipe", "sketch", "cardinality"),
    oracle=f"""
        WITH h AS (
          SELECT CAST(('0x' || substring(md5('hll'
                   || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM events
        ),
        r AS (
          SELECT h % {_HLL_M} AS reg,
                 (h // {_HLL_M}) % 4294967296 AS hsfx
          FROM h
        ),
        rho AS (
          SELECT reg,
                 CASE WHEN hsfx = 0 THEN 33
                      ELSE 33 - length(format('{{:b}}', hsfx))
                 END AS rho
          FROM r
        ),
        regs AS (SELECT reg, max(rho) AS mx FROM rho GROUP BY reg),
        f AS (
          SELECT t.b AS reg, coalesce(mx, 0) AS mx
          FROM range({_HLL_M}) t(b) LEFT JOIN regs ON regs.reg = t.b
        ),
        agg AS (
          SELECT sum(CAST(1.0 AS DOUBLE)
                     / CAST(1::BIGINT << mx AS DOUBLE)) AS s,
                 sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END) AS n_zero
          FROM f
        )
        SELECT {_HLL_M} AS m, CAST(n_zero AS BIGINT) AS n_zero,
               round(CASE WHEN (CAST(0.7213 AS DOUBLE)
                        / (CAST(1.0 AS DOUBLE)
                           + CAST(1.079 AS DOUBLE) / {_HLL_M}.0))
                       * {_HLL_M}.0 * {_HLL_M}.0 / s <= {2.5 * _HLL_M}
                      AND n_zero > 0
                     THEN {_HLL_M}.0 * ln({_HLL_M}.0 / n_zero)
                     ELSE (CAST(0.7213 AS DOUBLE)
                           / (CAST(1.0 AS DOUBLE)
                              + CAST(1.079 AS DOUBLE) / {_HLL_M}.0))
                          * {_HLL_M}.0 * {_HLL_M}.0 / s
                END, 2) AS estimate
        FROM agg
    """,
)
def sk_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate (p=8, 256 registers): the
    registers themselves are portable-hash-derived integers (oracle
    re-derives the identical sketch), the harmonic denominator is an
    EXACT dyadic double sum, and only the small-range correction's ln
    needs the 2-dp rounding convention. Mergeable across shards by
    per-register max (operators/sketches.py::hll_registers)."""
    from cqdg_etl_spark.operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events")
    return hll_estimate(hll_registers(ev, "user_id", p=8), p=8)


# --------------------------------------- Adamic-Adar link prediction


@query(
    "graph_adamic_adar",
    tags=("graph", "link-prediction"),
    oracle="""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
          FROM op a JOIN op b USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey
        ),
        adj AS (
          SELECT x AS w, y AS n FROM pairs
          UNION ALL SELECT y, x FROM pairs
        ),
        deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
        cent AS (
          SELECT w, round(CAST(1.0 AS DOUBLE) / ln(d), 6) AS wt
          FROM deg WHERE d BETWEEN 2 AND 64
        ),
        wedges AS (
          SELECT a1.n AS u, a2.n AS v, c.wt
          FROM adj a1 JOIN adj a2 USING (w) JOIN cent c USING (w)
          WHERE a1.n < a2.n
        ),
        scores AS (
          SELECT u, v, count(*) AS n_common,
                 round(CAST(sum(CAST(wt AS DECIMAL(38,6))) AS DOUBLE),
                       6) AS aa_score
          FROM wedges GROUP BY u, v
        )
        SELECT u, v, n_common, aa_score
        FROM scores s
        WHERE NOT EXISTS (
          SELECT 1 FROM pairs p WHERE p.x = s.u AND p.y = s.v
        )
        ORDER BY aa_score DESC, u, v LIMIT 100
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted co-purchase links by Adamic-Adar score
    (operators/graph.py::adamic_adar): rare shared neighbors weigh
    1/ln(deg), hub centers above the degree cap are excluded (the
    max_df-style wedge-skew guard), existing edges anti-joined out.
    orderBy+limit = TakeOrderedAndProject — no global sort."""
    from cqdg_etl_spark.operators.graph import adamic_adar

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
            F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
        )
        .distinct()
    )
    scores = adamic_adar(pairs, max_center_degree=64)
    return scores.orderBy(F.desc("aa_score"), "u", "v").limit(100)


# ------------------------------------------ PQ asymmetric-distance ANN

_ADC_M = 4
_ADC_BITS = 4
_ADC_DIM = 64


def _sql_pq_adc_topk(
    m: int = _ADC_M,
    dim: int = _ADC_DIM,
    n_bits: int = _ADC_BITS,
    seed: int = 42,
    k: int = 5,
) -> str:
    """PQ-ADC oracle: the emb_pq_codes codebook recipe restricted to
    the corpus side (vec_id >= 10), then per-subspace query-to-centroid
    squared distances summed in fixed subspace order."""
    sub = dim // m
    ctes: list[str] = []
    for s in range(m):
        planes = similarity.rademacher_planes(sub, n_bits, seed + s)
        lo = s * sub

        def bit(plane: list[int], v: str) -> str:
            lits = "[" + ",".join(f"CAST({x}.0 AS DOUBLE)" for x in plane) + "]"
            return (
                f"(CASE WHEN list_sum(list_transform(range(1, {sub + 1}), "
                f"k -> CAST({v}[k] AS DOUBLE) * ({lits})[k])) > 0 "
                f"THEN 1 ELSE 0 END)"
            )

        cell = bit(planes[0], "sv")
        for p in planes[1:]:
            cell = f"({cell} * 2 + {bit(p, 'sv')})"
        l2 = (
            f"list_sum(list_transform(range(1, {sub + 1}), "
            f"k -> (CAST(c.sv[k] AS DOUBLE) - cent{s}.cv[k]) "
            f"* (CAST(c.sv[k] AS DOUBLE) - cent{s}.cv[k])))"
        )
        qd = (
            f"list_sum(list_transform(range(1, {sub + 1}), "
            f"k -> (CAST(q.qs[k] AS DOUBLE) - cent.cv[k]) "
            f"* (CAST(q.qs[k] AS DOUBLE) - cent.cv[k])))"
        )
        ctes.append(f"""
        v{s} AS (SELECT vec_id, list_slice(embedding, {lo + 1}, {lo + sub})
                        AS sv FROM embeddings WHERE vec_id >= 10),
        c{s} AS (SELECT vec_id, sv, {cell} AS cell FROM v{s}),
        comp{s} AS (
          SELECT cell, k AS d,
                 CAST(SUM(CAST(CAST(sv[k] AS DOUBLE) AS DECIMAL(38,12)))
                      AS DOUBLE) / COUNT(*) AS m
          FROM c{s}, range(1, {sub + 1}) t(k)
          GROUP BY cell, k
        ),
        cent{s} AS (SELECT cell, list(m ORDER BY d) AS cv
                    FROM comp{s} GROUP BY cell),
        a{s} AS (
          SELECT vec_id, cell AS code_{s} FROM (
            SELECT c.vec_id, cent{s}.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {l2}, cent{s}.cell) AS rn
            FROM v{s} c CROSS JOIN cent{s}
          ) WHERE rn = 1
        ),
        q{s} AS (SELECT vec_id AS query_id,
                        list_slice(embedding, {lo + 1}, {lo + sub}) AS qs
                 FROM embeddings WHERE vec_id < 10),
        d{s} AS (
          SELECT q.query_id, a.vec_id AS neighbor_id, {qd} AS d
          FROM q{s} q
          CROSS JOIN a{s} a
          JOIN cent{s} cent ON cent.cell = a.code_{s}
        )""")
    joins = " ".join(
        f"JOIN d{s} USING (query_id, neighbor_id)" for s in range(1, m)
    )
    total = "d0.d"
    for s in range(1, m):
        total = f"({total} + d{s}.d)"
    return f"""
        WITH {",".join(ctes)},
        tot AS (
          SELECT query_id, neighbor_id, {total} AS adc
          FROM d0 {joins}
        )
        SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc_dist
        FROM (SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
              FROM tot)
        WHERE rank <= {k}
    """


@query(
    "ann_topk_pq_adc",
    tags=("datapipe", "ann", "pq"),
    oracle=_sql_pq_adc_topk(),
)
def ann_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 by PQ asymmetric distance (Jégou 2011): the corpus
    (vec_id >= 10) is represented only by its 4 sub-codes — the scan
    behind scoring is ~64x smaller than the raw embedding column and
    per-candidate work is 4 centroid lookups, the billion-vector
    serving shape. Codebooks and codes are the deterministic
    engine-portable quantizer, so the approximate result itself is
    value-hash-checked (operators/similarity.py::pq_adc_topk)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        k=5,
        m=_ADC_M,
        n_bits=_ADC_BITS,
    )


# ------------------------------- CCNet-style perplexity buckets


@query(
    "tx_ccnet_buckets",
    tags=("datapipe", "text", "lm", "quality"),
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {SQL_TOKS.format(c="text")} AS t FROM documents
        ),
        big AS (
          SELECT doc_id,
                 unnest(list_slice(t, 1, len(t) - 1)) AS w1,
                 unnest(list_slice(t, 2, len(t))) AS w2
          FROM toks WHERE len(t) >= 2
        ),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
        pc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
        v AS (
          SELECT count(DISTINCT tok) AS vocab
          FROM (SELECT unnest(t) AS tok FROM toks)
        ),
        scored AS (
          SELECT big.doc_id,
                 CAST(c12 + 1 AS DOUBLE) / CAST(c1 + vocab AS DOUBLE) AS p
          FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v
        ),
        lm AS (
          SELECT doc_id,
                 round(CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE)
                       / count(*), 6) AS mean_condp
          FROM scored GROUP BY doc_id
        ),
        j AS (
          SELECT lm.doc_id, d.lang, lm.mean_condp
          FROM lm JOIN documents d USING (doc_id)
        ),
        r AS (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY mean_condp DESC, doc_id) AS rk,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM j
        )
        SELECT doc_id, lang, mean_condp,
               CASE ((rk - 1) * 3) // n
                 WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
               END AS ppl_bucket
        FROM r
    """,
)
def tx_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity tertiles (Wenzek et al.,
    LREC 2020): documents rank within their language by the
    corpus-trained bigram-LM score (high mean conditional probability =
    most predictable = 'head'); bucket = exact integer tertile of the
    rank. The rank is a scalable range-partitioned global_rank with
    broadcast per-language offsets — NEVER a window partitioned by
    language (a hot language would sort on one task at corpus scale);
    the oracle spells the same semantics with the window it CAN use."""
    from cqdg_etl_spark.operators.lm import bigram_lm_scores
    from cqdg_etl_spark.operators.ranking import global_rank

    docs = load(spark, sf_dir, "documents")
    lm = bigram_lm_scores(docs, "text", "doc_id")
    j = lm.join(docs.select("doc_id", "lang"), "doc_id")
    ranked = global_rank(
        j,
        [F.col("lang"), F.col("mean_condp").desc(), F.col("doc_id")],
        rank_col="_grank",
    )
    per_lang = F.broadcast(
        ranked.groupBy("lang").agg(
            F.min("_grank").alias("_base"), F.count("*").alias("_n")
        )
    )
    return (
        ranked.join(per_lang, "lang")
        .select(
            "doc_id",
            "lang",
            "mean_condp",
            F.expr(
                "CASE ((_grank - _base) * 3) div _n "
                "WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END"
            ).alias("ppl_bucket"),
        )
    )
