"""Text analysis operators: quality scoring, language ID, token stats.

Pure built-in expressions (regexp/length/filter arithmetic) — identical
semantics are expressible in any SQL engine, which is how the oracle
checks these exactly. No Python in the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import normalize_ws, tokens
from cqdg_etl_spark.operators.spread import spread_to_parallelism as _spread

# Minimal per-language stopword marker sets for the n-gram/stopword
# language heuristic. Order below is the deterministic tiebreak order.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ein"],
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang`."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features + composite score.

    Features: char count, whitespace-token count, mean token length,
    punctuation ratio, digit ratio, English-stopword ratio. Score is the
    standard heuristic blend used as a pre-training quality filter.
    """
    text = F.col(text_col)
    toks = tokens(normalize_ws(text))
    n_chars = F.length(text)
    n_toks = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    n_stop = stopword_hits(toks, "en")
    avg_tok_len = F.round(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / F.greatest(n_toks, F.lit(1)),
        6,
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    digit_ratio = F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_toks, F.lit(1)), 6)
    score = F.round(
        (F.lit(1.0) - punct_ratio) * (F.lit(1.0) - digit_ratio) * stop_ratio, 6
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_calc"),
        n_toks.cast("long").alias("n_tokens"),
        avg_tok_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: CJK character presence → zh, else argmax of
    per-language stopword hits (ties broken by the fixed language order).
    """
    text = F.col(text_col)
    toks = tokens(normalize_ws(text))
    cjk = F.length(text) - F.length(
        F.regexp_replace(text, "[^一-鿿]", "")
    )
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_STOPWORDS}
    pred = F.when(cjk > 0, F.lit("zh"))
    langs = list(LANG_STOPWORDS)
    for lang in langs:
        others = [hits[o] for o in langs if o != lang]
        cond = hits[lang] > 0
        for o in others:
            cond = cond & (hits[lang] >= o)
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("unknown"))
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[hits[lang].cast("long").alias(f"hits_{lang}") for lang in langs],
    )


def token_counts(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Corpus token accounting per group: whitespace tokens + BPE-ish
    sub-tokens + chars. The sizing query every training-data pipeline
    runs first."""
    text = F.col(text_col)
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(normalize_ws(text)))).alias("ws_tokens"),
        F.sum(F.regexp_count(text, F.lit(BPE_TOKEN_RE))).alias("bpe_tokens"),
        F.sum(F.length(text)).alias("n_chars"),
    )


def quality_score_vectorized():
    """Arrow-batched quality calibration — the ONE sanctioned shape for
    Python in a hot path (SURVEY §2.7: reference has 2 scalar UDFs; we
    keep Python out of hot paths except Arrow-vectorized kernels).

    A scalar @pandas_udf receives ~10k-row pandas Series batches over
    Arrow (zero-copy numerics) and computes with numpy vector ops —
    per-row overhead is amortized to near-JVM cost, vs 10-100x for a
    row-at-a-time Python UDF. The plan shows ArrowEvalPython (asserted
    in tests/test_plans.py).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def calibrate(n_chars: pd.Series) -> pd.Series:
        import numpy as np

        # logistic calibration of a length-based quality prior
        z = (n_chars.to_numpy(dtype="float64") - 200.0) / 80.0
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return calibrate


def top_ngrams(
    df: DataFrame, text_col: str, n: int = 2, k: int = 100
) -> DataFrame:
    """Global top-k n-grams by document frequency → (gram, cnt).

    Deterministic ties (count desc, gram asc). The limit+orderBy pair
    compiles to TakeOrderedAndProject: each partition keeps only its
    local top-k heap and the driver merges #partitions × k rows — no
    global sort, no full shuffle of the gram counts. This is the
    shape that survives a vocabulary of billions of grams; the only
    full shuffle is the gram-count aggregate, map-side combined.
    """
    from cqdg_etl_spark.functions.text import word_shingles

    counts = (
        df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.orderBy(F.desc("cnt"), F.asc("gram")).limit(k)


# Winnowing (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
# for Document Fingerprinting", SIGMOD'03): the rolling-hash
# fingerprinting scheme behind MOSS. Constants chosen so every
# intermediate fits a 64-bit signed int EXACTLY in any engine:
# codepoint < 2^21, WINNOW_B^e mod WINNOW_M < 2^31 → per-term product
# < 2^52, k-term sum < 2^56 — no overflow, no engine-specific modmul.
WINNOW_B = 257
WINNOW_M = (1 << 31) - 1  # Mersenne prime 2^31-1


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints → (id, n_grams, n_fingerprints,
    fingerprint_str = sorted distinct window-min hashes, comma-joined).

    Per position i of the normalized text, the k-gram polynomial
    rolling hash H_i = (Σ_j code(c_{i+j})·B^(k-1-j)) mod M — the value
    an O(1)-update Rabin-Karp scan computes. The fingerprint set is
    {min of each w-window of consecutive hashes} (any shared substring
    of length ≥ w+k-1 between two documents guarantees a shared
    fingerprint — the winnowing theorem).

    Zero shuffles either way; default is the Arrow path (numpy int64
    Horner + sliding-window min — ALL integer arithmetic, so parity
    with the SQL oracle is exact by construction). The declarative HOF
    form (:func:`winnowing_fingerprints_expr`) computes the identical
    result but pays interpreted per-element lambda dispatch on the
    O(L·w) window scan — measured 15.4 s vs 0.9 s at sf0.1.
    """
    return _winnowing_pandas(df, text_col, id_col, k, window)


def _winnowing_pandas(
    df: DataFrame, text_col: str, id_col: str, k: int, window: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_grams long, n_fingerprints long, "
        "fingerprint_str string"
    )
    B, M = WINNOW_B, WINNOW_M

    def doc_fps(text):
        import re

        # ASCII \s + strip(' ') + lower — mirrors functions.text
        # normalize_ws exactly (see operators/quality.py).
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (text or "").lower()).strip(" ")
        L = len(norm)
        n_grams = max(L - k + 1, 1)
        codes = np.frombuffer(
            norm.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        if L < k:
            codes = np.concatenate([codes, np.zeros(k - L, dtype=np.int64)])
        h = np.zeros(n_grams, dtype=np.int64)
        for j in range(k):
            h = (h * B + codes[j : j + n_grams]) % M
        if len(h) <= window:
            mins = np.array([h.min()])
        else:
            mins = np.lib.stride_tricks.sliding_window_view(h, window).min(
                axis=1
            )
        fps = np.unique(mins)
        return n_grams, len(fps), ",".join(str(x) for x in fps)

    def batches(it):
        for pdf in it:
            stats = pd.DataFrame(
                [doc_fps(t) for t in pdf[text_col]],
                columns=["n_grams", "n_fingerprints", "fingerprint_str"],
            )
            stats.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield stats

    # Spread before the Python pass (r11): the O(L·w) rolling-hash
    # scan is per-row pure; a 1-partition scan serializes it (§2.5).
    return _spread(df.select(id_col, text_col)).mapInPandas(batches, schema)


def winnowing_fingerprints_expr(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Pure-expression winnowing (no Python workers) — identical output
    to :func:`winnowing_fingerprints`; see its docstring for the
    measured tradeoff."""

    def let(col: Column, fn) -> Column:
        # evaluate-once binding (see operators/quality.py): a subtree
        # referenced inside a HOF lambda is re-evaluated per element;
        # a lambda variable is a slot lookup.
        return F.element_at(F.transform(F.array(col), fn), 1)

    norm = normalize_ws(F.col(text_col))

    def gram_hashes(text: Column) -> Column:
        # Horner with a mod per step: acc < M = 2^31-1, so
        # acc·B + code < 2^40 — never overflows. Mathematically equal to
        # (Σ_j code·B^(k-1-j)) mod M, which is the form the SQL oracle
        # uses (that sum fits 2^56, so both are exact).
        n_grams = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.lit(0).cast("bigint"),
                lambda acc, j: (
                    acc * F.lit(WINNOW_B)
                    + F.ascii(F.substring(text, (i + j).cast("int"), F.lit(1)))
                )
                % F.lit(WINNOW_M),
            ),
        )

    def windows_min(hashes: Column) -> Column:
        n_wins = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1))
        return F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_wins),
                    lambda s: F.array_min(F.slice(hashes, s, window)),
                )
            )
        )

    fps = let(let(norm, gram_hashes), windows_min)
    staged = df.select(
        F.col(id_col),
        F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
        .cast("bigint")
        .alias("n_grams"),
        fps.alias("fps"),
    )
    return staged.select(
        id_col,
        "n_grams",
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.concat_ws(",", F.transform("fps", lambda h: h.cast("string"))).alias(
            "fingerprint_str"
        ),
    )
