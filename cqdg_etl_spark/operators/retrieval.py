"""BM25 lexical retrieval scoring (Robertson & Walker, SIGIR'94).

Query-to-corpus ranking — the retrieval complement of the doc-to-doc
TF-IDF pairs in operators/sparse_sim.py. BM25 is the default lexical
ranker everywhere (Lucene/Elasticsearch, hybrid RAG retrieval); a
training-data pipeline uses it to mine query-relevant subsets and to
build hard negatives for embedding training.

    score(D, Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1)
                          / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t)      = round(ln((N − df + 0.5)/(df + 0.5) + 1), 6)

Scale shape: tokenize once into a skinny (doc, tok) frame; the tiny
query-term table BROADCASTS onto it (a semi-join — only matching
tokens survive the probe); per-(doc, term) tf and per-term df come
from map-side-combined aggregates; corpus stats (N, avgdl) are a
one-row broadcast. Per-doc score sums accumulate in exact decimal so
the ranking is partition-order independent — which is what lets the
oracle reproduce the ranking bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import normalize_ws, tokens
from cqdg_etl_spark.operators.dedup import _spread

K1 = 1.2
B = 0.75


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents for ``query_terms`` by BM25: (doc, score, rank).

    Ties (including docs that tie after the 6-dp score round) break on
    the doc id, so the cutoff is total-order deterministic.
    ``query_terms`` are matched against the NORMALIZED token stream
    (lowercased, whitespace-collapsed) — pass lowercase terms.
    """
    spark = df.sparkSession
    toks = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(normalize_ws(F.col(text_col)))).alias("tok"),
    )
    from pyspark import StorageLevel

    # Persisted (r11): dl feeds BOTH the corpus stats scalar and the
    # scoring join — unpersisted, each consumer re-ran the tokenize+
    # explode+per-doc count (3 corpus tokenizations per query; now 2 —
    # the tf branch's pass plus this one). The narrow (doc, dl) rows
    # are the classic IR doc-length artifact, far smaller than the
    # token stream itself.
    dl = toks.groupBy("doc").agg(F.count("*").alias("dl")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(27,6)")).cast("double")
            / F.count("*")
        ).alias("avgdl"),
    )
    q = F.broadcast(
        spark.createDataFrame([(t,) for t in query_terms], "tok string")
    )
    tf = toks.join(q, "tok").groupBy("doc", "tok").agg(
        F.count("*").alias("tf")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # dl is CORPUS-sized (one row per document) — no broadcast hint:
    # at fleet scale a hinted broadcast of billions of doc lengths
    # would OOM the driver. It's a plain doc-keyed equi-join; AQE
    # still broadcasts whichever side is actually small at runtime
    # (here tf, already filtered to query-matching docs). dfreq
    # (≤ |query| rows) and stats (1 row) stay hinted.
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
                6,
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc").agg(
        F.round(
            F.sum(F.col("term_score").cast("decimal(38,18)")).cast("double"),
            6,
        ).alias("score")
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-k heaps merged on the driver, never a single-partition sort
    # of the scored frame; the rank window then runs on ≤ k rows.
    top = per_doc.orderBy(F.desc("score"), F.asc("doc")).limit(k)
    w = W.orderBy(F.desc("score"), F.asc("doc"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc", "score", "rank"
    )
