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
