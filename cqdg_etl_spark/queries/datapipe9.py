"""Round-3 batch 7: IR / tokenizer-training / label-quality operators —
inverted-index construction, first-iteration BPE merge counts, and kNN
label-noise screening.

Oracle conventions as per the package: postings serialized as ordered
comma-joined strings (array dtype stringification differs across
engines), total-order tiebreakers on every top-k, round(·, 6) on
ratio outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.datapipe import SQL_NORM, SQL_TOKS, _sql_cos
from cqdg_etl_spark.queries.registry import load, query

# ---------------------------------------------- inverted index


_MIN_DF = 5
# Posting-list shard width: each output row carries at most this many
# doc ids, regardless of how hot the token is. 128 keeps multiple
# blocks live even at the driver's sf0.01 gate (500 docs) so the
# sharded shape is what the oracle verifies; production would raise
# it (the skew bound per row is the parameter itself).
_POSTINGS_BLOCK = 128


@query(
    "tx_inverted_index",
    tags=("datapipe", "text", "ir"),
    oracle=f"""
        WITH d AS (
          SELECT doc_id, {SQL_TOKS.format(c='text')} AS tk
          FROM documents WHERE {SQL_NORM.format(c='text')} <> ''
        ),
        tok AS (SELECT DISTINCT doc_id, unnest(tk) AS t FROM d),
        sh AS (
          SELECT t, CAST(doc_id // {_POSTINGS_BLOCK} AS BIGINT) AS block,
                 CAST(count(*) AS BIGINT) AS shard_df,
                 string_agg(CAST(doc_id AS VARCHAR), ','
                            ORDER BY doc_id) AS postings
          FROM tok GROUP BY t, doc_id // {_POSTINGS_BLOCK}
        )
        SELECT t AS token, block,
               CAST(sum(shard_df) OVER (PARTITION BY t) AS BIGINT) AS df,
               postings
        FROM sh
        QUALIFY CAST(sum(shard_df) OVER (PARTITION BY t) AS BIGINT)
                >= {_MIN_DF}
    """,
)
def tx_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction, sharded for skew: token → ordered
    doc-id posting SHARDS of at most _POSTINGS_BLOCK ids each
    (``block`` = doc_id div _POSTINGS_BLOCK), plus the token's total
    document frequency (df ≥ 5) on every shard row. Sharding bounds
    the max row: a stopword present in 10^9 documents produces
    n_docs/_POSTINGS_BLOCK bounded shard rows instead of one multi-GB
    row in one reducer — the canonical posting-list skew OOM. (The df
    floor prunes RARE tokens; it never bounds hot ones — only the
    shard width does.) Two exchanges at 100 TB: the (token, block)
    aggregate over the distinct token stream, then a window over the
    much smaller shard table — per-token shard counts are bounded by
    n_docs / _POSTINGS_BLOCK, so no window partition is hot. Shards
    are sorted within and across blocks, so the concatenation in block
    order is the full ordered posting list."""
    from pyspark.sql import Window

    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", normalize_ws(F.col("text")).alias("norm"))
        .filter(F.col("norm") != "")
        .select("doc_id", tokens(F.col("norm")).alias("tk"))
    )
    tok = docs.select("doc_id", F.explode("tk").alias("t")).distinct()
    shards = tok.groupBy(
        "t", F.floor(F.col("doc_id") / _POSTINGS_BLOCK).cast("long").alias("block")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("shard_df"),
        F.concat_ws(",", F.sort_array(F.collect_set("doc_id"))).alias("postings"),
    )
    return (
        shards.withColumn(
            "df", F.sum("shard_df").over(Window.partitionBy("t")).cast("long")
        )
        .filter(F.col("df") >= _MIN_DF)
        .select(F.col("t").alias("token"), "block", "df", "postings")
    )


# ------------------------------------------- BPE first-merge counts


_BPE_TOP = 20


@query(
    "tx_bpe_first_merges",
    tags=("datapipe", "text", "tokenizer"),
    oracle=f"""
        WITH d AS (
          SELECT {SQL_TOKS.format(c='text')} AS tk
          FROM documents WHERE {SQL_NORM.format(c='text')} <> ''
        ),
        w AS (SELECT unnest(tk) AS word FROM d),
        wf AS (
          SELECT word, count(*) AS freq FROM w
          WHERE length(word) >= 2 GROUP BY word
        ),
        pr AS (
          SELECT unnest(list_transform(range(1, length(word)),
                        i -> substring(word, CAST(i AS INT), 2)))
                   AS pair,
                 freq
          FROM wf
        ),
        agg AS (
          SELECT pair, CAST(sum(freq) AS BIGINT) AS n
          FROM pr GROUP BY pair
        )
        SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT {_BPE_TOP}
    """,
)
def tx_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration: the top-20 adjacent character-pair counts
    over the corpus — the merge candidates a byte-pair-encoding
    tokenizer trainer would pick first. Uses the classic trainer
    trick: pairs are enumerated over the DISTINCT word table weighted
    by word frequency, so the inner loop is vocabulary-sized, not
    corpus-sized — at 100 TB the word-frequency aggregate is the only
    full-corpus shuffle and the pair explode runs over ~10^6 distinct
    words regardless of corpus size. Top-k via TakeOrderedAndProject
    under a total order."""
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    docs = (
        load(spark, sf_dir, "documents")
        .select(normalize_ws(F.col("text")).alias("norm"))
        .filter(F.col("norm") != "")
        .select(tokens(F.col("norm")).alias("tk"))
    )
    wf = (
        docs.select(F.explode("tk").alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ------------------------------------------------ kNN label noise


@query(
    "emb_label_noise_scores",
    tags=("datapipe", "ann", "quality", "training"),
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS query_id, label, embedding AS qe
          FROM embeddings WHERE vec_id % 5 = 0
        ),
        c AS (
          SELECT vec_id AS neighbor_id, label AS n_label, embedding AS ce
          FROM embeddings
        ),
        p AS (
          SELECT query_id, label, neighbor_id, n_label,
                 {_sql_cos('qe', 'ce')} AS cos
          FROM q CROSS JOIN c WHERE query_id <> neighbor_id
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id
          ) AS rank FROM p
        )
        SELECT query_id AS vec_id, label,
               CAST(sum(CASE WHEN n_label <> label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_diff,
               round(CAST(sum(CASE WHEN n_label <> label
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS noise_score
        FROM r WHERE rank <= 5 GROUP BY query_id, label
    """,
)
def emb_label_noise_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-consistency screen (operators/similarity.py::
    label_noise_scores) on a 1-in-5 scored sample: fraction of the 5
    nearest neighbors whose label disagrees — the confident-learning
    triage for mislabeled training examples."""
    from cqdg_etl_spark.operators.similarity import label_noise_scores

    emb = load(spark, sf_dir, "embeddings")
    return label_noise_scores(
        emb, k=5, query_filter=F.col("vec_id") % 5 == 0
    )
