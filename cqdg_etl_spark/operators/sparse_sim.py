"""Sparse TF-IDF cosine similarity pairs (inverted-index self-join).

Dense-embedding near-dup (operators/similarity.py) needs an embedding
model upstream; the lexical counterpart — cosine over sparse TF-IDF
vectors — runs on raw text and is the classic news/web near-duplicate
and related-document primitive. The all-pairs form is quadratic; the
scalable plan is the inverted-index shape of
``dedup.ngram_jaccard_pairs``: documents only meet on terms they share,
so the join is an equi-join on the term key and hot terms are the only
blowup risk (bounded by ``max_df``).

Terms are word n-grams (default trigrams), not unigrams: unigram
vocabulary is tiny relative to corpus size, so almost every unigram is
a stop word whose posting list pairs quadratically — with n-grams the
vocabulary grows and df concentrates in the informative tail (the same
reason ngram_jaccard shingles at n=3).

Determinism contract (drives the DuckDB oracle):
- term key = first 15 hex chars of md5 (60-bit int) — engine-portable,
  so an (astronomically unlikely) collision affects both engines
  identically instead of silently diverging;
- the vector space is the terms with df ∈ [min_df, max_df]: df=1 terms
  cannot contribute to any pair and would add hapax noise to norms;
  df > max_df terms are stop-terms whose posting lists blow up
  quadratically (at 100 TB set max_df as a corpus fraction);
- idf = round(ln(N/df), 6): rounding pins the one libm-dependent value
  to 6 dp (ln differs in the last ulp across engines; at 6 dp both
  round identically — the same convention tx_tfidf_term_stats uses);
- weights multiply in double (single-rounded IEEE), dot/norm² sums
  accumulate in DECIMAL(38,18) (associative — partitioning cannot
  reorder a decimal sum's value), sqrt/divide in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import word_shingles
from cqdg_etl_spark.operators.dedup import _spread


def _term_key(col):
    """Portable 60-bit term hash: conv(md5[:15], 16, 10) — DuckDB spells
    it CAST(('0x' || substring(md5(t),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.3,
    ngram: int = 3,
    min_df: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """(doc_a < doc_b, cos) for TF-IDF cosine ≥ threshold.

    Plan (each stage chosen for the 100-TB failure mode it avoids):
    - corpus count comes from the RAW frame (parquet metadata count —
      no shuffle, no tokenize);
    - tf = groupBy(doc, h) — map-side partial combine, no skew issue;
    - df comes from a second hash aggregate over tf (also map-side
      combined), NOT a count window partitioned by h: a window
      partition cannot be split, so one hot term would pin its whole
      posting list on one task; the [min_df, max_df] band filter then
      joins back on h — AQE can split a skewed join partition, and the
      hot rows are dropped at the probe, never carried further;
    - the banded ``weighted`` index is persisted (norms + the
      norm-attach join read one materialization instead of
      re-tokenizing the corpus), and the norm-carrying ``indexed``
      frame is persisted for the two self-join sides — the same
      explicit-materialization point semantic_dedup uses;
    - each doc's norm is attached to its index rows ONCE (a doc-keyed
      equi-join of the index with its own per-doc aggregate) and
      rides THROUGH the token-keyed self-join into the pair rows: the
      candidate-pair frame — the largest frame in this plan at fleet
      scale — is never re-shuffled by doc_a/doc_b to fetch norms.
      (Round-8 history: the original shape broadcast the corpus-sized
      norm table — a driver OOM at fleet scale; the hint-removed
      intermediate shape re-exchanged the pair aggregate twice and
      measured 3× slower at sf0.1.)
    """
    from pyspark import StorageLevel

    n_docs = df.count()  # metadata-fast on a parquet scan
    tf = (
        _spread(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(F.col(text_col), ngram)).alias("term"),
        )
        .groupBy("doc", _term_key(F.col("term")).alias("h"))
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("h").agg(F.count("*").alias("df"))
    band = dfreq.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    weighted = (
        tf.join(band, "h")
        .withColumn(
            "w",
            F.col("tf")
            * F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6),
        )
        .select("doc", "h", "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    norms = weighted.groupBy("doc").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,18)")).cast(
                "double"
            )
        ).alias("norm")
    )
    # Norm rides the index rows (see docstring): one doc-keyed join of
    # the index with its own aggregate, then the pair rows already
    # carry norm_a/norm_b — the pair frame is never re-shuffled, and
    # nothing corpus-sized is ever broadcast.
    indexed = weighted.join(norms, "doc").persist(StorageLevel.MEMORY_AND_DISK)
    a = indexed.alias("a").hint("shuffle_hash")
    b = indexed.alias("b").hint("shuffle_hash")
    dots = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            # functionally dependent on the doc keys — added to the
            # hash key instead of re-joined after the aggregate
            F.col("a.norm").alias("norm_a"), F.col("b.norm").alias("norm_b"),
        )
        .agg(
            F.sum((F.col("a.w") * F.col("b.w")).cast("decimal(38,18)"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.withColumn(
            "cos", F.col("dot") / (F.col("norm_a") * F.col("norm_b"))
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", F.round("cos", 6).alias("cos"))
    )
