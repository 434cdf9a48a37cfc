"""Corpus-trained n-gram language-model scoring — quality signal for
training-data curation (the CCNet/Gopher "perplexity bucket" idea,
here with the LM trained on the corpus itself so no external model
file is needed).

Formulation: add-one-smoothed bigram conditional probabilities

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

and a per-document score = MEAN conditional probability over the
document's bigrams. The classic score is mean log-prob, but log() is a
transcendental whose low bits are libm-implementation-defined — not
reproducible across engines — while this ratio-of-counts form is a
single correctly-rounded IEEE division per bigram, so any engine
derives bit-identical scores (the ranking is monotone-equivalent for
filtering "most-predictable / least-predictable" tails; callers who
want log-space can take log of the per-bigram column downstream and
accept engine variance there).

Scale shape: the bigram frame (doc, w1, w2) is the corpus token stream
— built per-row from the token array (no per-doc window/shuffle).
Counts: one shuffle for c(w1,w2) (map-side combined); c(w1 ·) is the
marginal SUM over the already-aggregated bigram counts (vocabulary-
sized input, not corpus-sized). Vocabulary size is one scalar
countDistinct, broadcast back. Scoring joins the token stream to the
count tables on their keys — shuffle hash joins; natural-language
token frequencies are Zipfian, so at fleet scale the hot-prefix join
is the salting candidate (operators/skew.py) — and re-aggregates per
doc. Per-doc mean accumulates in exact decimal so partitioning can't
reorder a double sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import normalize_ws, tokens


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) multiset — one row per adjacent token pair.

    The token array is materialized as a COLUMN in a first select
    before the pair transform touches it: inlining the
    tokens(normalize_ws(...)) expression re-runs the regex split for
    every element_at() call — ~2·len(doc) regex evaluations per row —
    which measured 17.8 s vs 0.5 s at sf0.1 for the extraction alone.
    A column reference is evaluated once per row, period.
    """
    toked = df.select(
        F.col(id_col).alias("doc"),
        tokens(normalize_ws(F.col(text_col))).alias("toks"),
    )
    return _bigrams_from_toked(toked)


def _bigrams_from_toked(toked: DataFrame) -> DataFrame:
    """Pair expansion over an already-tokenized (doc, toks) frame —
    split out (r11) so callers that need the token arrays for a
    second derivation (e.g. the vocabulary scalar) can tokenize ONCE
    and share the frame."""
    toks = F.col("toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toked.select("doc", F.explode(pairs).alias("g")).select(
        "doc", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score each document by mean smoothed bigram conditional
    probability under the corpus-trained LM → (id, n_bigrams,
    mean_condp). Documents with fewer than two tokens have no bigrams
    and are omitted (no LM evidence either way)."""
    from pyspark import StorageLevel

    # ONE corpus tokenization (r11): the token-array frame is persisted
    # and feeds BOTH the bigram stream and the vocabulary scalar — the
    # vocab branch previously re-ran normalize+split over every
    # document for one countDistinct. The bigram exchange on (w1, w2)
    # still feeds the count aggregate and the scoring join as a
    # ReusedExchange.
    toked = df.select(
        F.col(id_col).alias("doc"),
        tokens(normalize_ws(F.col(text_col))).alias("toks"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    big = _bigrams_from_toked(toked).repartition("w1", "w2")
    bigram_counts = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # marginal from the aggregated counts: vocabulary-sized input
    prefix_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        toked.select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab"))
    )
    # Attach the prefix marginal to the COUNT table, not the stream:
    # when the count tables outgrow the broadcast threshold (any real
    # corpus), joining the corpus-sized bigram stream to prefix_counts
    # on w1 re-shuffles the whole enriched stream by w1 — a third
    # full-stream exchange. bigram_counts ⋈ prefix_counts is
    # vocabulary-sized on both sides; the stream then pays exactly two
    # exchanges total — the (w1, w2) repartition it shares with the
    # count aggregate, and the final per-doc rollup. At sf0.1 both
    # joins are broadcasts so this is timing-neutral (measured: equal
    # within noise); the win is the at-scale plan shape.
    rates = bigram_counts.join(prefix_counts, ["w1"])
    scored = (
        big.join(rates, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc",
            (
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("vocab")).cast("double")
            ).alias("p"),
        )
    )
    return scored.groupBy("doc").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum(F.col("p").cast("decimal(38,18)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_condp"),
    ).select(F.col("doc").alias(id_col), "n_bigrams", "mean_condp")


def pmi_bigrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks, CL'90): PMI(w1,w2) = round(ln(N·c12 / (c1·c2)), 6) over the
    corpus bigram stream, restricted to pairs with c12 ≥ min_count
    (raw PMI overweights hapax pairs — the standard guard).

    The collocation miner for tokenizer/vocab construction and
    phrase-aware dedup. Counts are three map-side-combined aggregates
    (c12; the w1/w2 marginals computed from the ALREADY-AGGREGATED
    bigram table, vocabulary-sized input); N is the one-row total.
    ln is pinned to 6 dp (the package's libm convention); ordering
    uses the rounded PMI + both words, a total order shared with the
    oracle. orderBy+limit top-k = TakeOrderedAndProject.
    """
    big = _bigrams(df, text_col, id_col).select("w1", "w2")
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = c12.agg(F.sum("c12").alias("n_big"))
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_big") * F.col("c12")).cast("double")
                    / (F.col("c1") * F.col("c2")).cast("double")
                ),
                6,
            ),
        )
        .select("w1", "w2", "c12", "pmi")
    )
    top = scored.orderBy(
        F.desc("pmi"), F.asc("w1"), F.asc("w2")
    ).limit(k)
    return top
