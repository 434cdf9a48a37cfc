"""Corpus hygiene + batching operators for LLM training pipelines.

- ``contaminated_ids``: documents sharing any n-gram with a benchmark
  corpus (decontamination before training). A left-semi join on the
  shingle inverted index — O(shared shingles), never a cross join; the
  benchmark side is tiny (eval sets) and broadcasts.
- ``pack_sequences``: assign documents to fixed-token-budget sequences
  (context-window packing) with a deterministic streaming rule: within
  each partition group, walk docs in id order and place each doc in
  the bin its cumulative-start falls into. One window pass (cumsum) —
  no iterative bin state, reproducible on any engine. Docs longer than
  the budget still get a bin (their own start bin) rather than being
  dropped — filter beforehand if that's the policy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import word_shingles


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Ids of docs sharing >= 1 word n-gram with the benchmark corpus."""
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("g"),
    )
    bench_grams = benchmark.select(
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("g")
    ).distinct()
    return (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    token_count: Column,
    budget: int,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Add ``seq_id``: the training-sequence bin each doc starts in.

    bin = floor(cumulative_tokens_before_this_doc / budget), walking
    docs in ``id_col`` order within each partition group. Documents
    never move between bins when new data is appended with higher ids —
    packing is stable under incremental ingest.
    """
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = docs.withColumn("_tok", token_count)
    return (
        out.withColumn("_cum", F.sum("_tok").over(w))
        .withColumn(
            "seq_id", F.floor((F.col("_cum") - F.col("_tok")) / F.lit(budget))
        )
        .drop("_cum")
        .withColumnRenamed("_tok", "n_tokens")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window chunking: split each document's whitespace tokens
    into windows of ``window`` tokens advancing by ``stride`` (overlap =
    window − stride, the context-carry standard for LLM training data).

    Returns (id, chunk_idx, chunk_text, n_tokens). The final window is
    the remainder (possibly short); every document yields ≥ 1 chunk
    (an empty doc yields one empty chunk). Chunk starts are
    0, stride, 2·stride, … — only starts < n_tokens, except that start
    0 always exists.

    Scale shape: zero shuffles — tokens, window index sequence, and the
    per-window slices are one projection; output row count is
    ⌈n_tokens/stride⌉ per doc, bounded by document length. The token
    array is materialized as a COLUMN before the window transform
    touches it — inlining the tokens(...) expression re-runs the regex
    split for every slice()/size() reference (one per chunk), measured
    ~4× slower at sf0.1.
    """
    from cqdg_etl_spark.functions.text import normalize_ws, tokens

    df = df.select(
        F.col(id_col), tokens(normalize_ws(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # least(..., ceil(n/stride)) clamps starts to < n_tokens: with
    # stride > window the first term over-counts (n=11, window=2,
    # stride=8 gave a phantom start at 16 with empty text and negative
    # n_tokens); for stride <= window the first term is always the
    # smaller one, so overlap behavior is unchanged.
    n_chunks = F.greatest(
        F.least(
            F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int") + F.lit(1),
            F.ceil(n / F.lit(stride)).cast("int"),
        ),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, window)
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(window)).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        "c.chunk_text",
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
    )
