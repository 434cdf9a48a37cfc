"""Document-quality rule operators for training-data curation.

Gopher-style repetition metrics, C4-style rule flags, and PII redaction
— the filters a pretraining pipeline applies between raw scrape and
dedup. C4 flags and PII redaction are built-in JVM expressions
(whole-stage codegen, zero shuffles); ``repetition_metrics`` defaults to
an Arrow-batched ``mapInPandas`` (also zero shuffles — the measured
fast path; see its docstring) with ``repetition_metrics_expr`` as the
pure-expression fallback for Python-less environments.

Beyond-reference capability (the reference ETL at
/root/reference/src/main/scala/ca/cqdg/etl has no document-quality
surface); part of the training-data operator suite required by the
task brief.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import normalize_ws, tokens, word_shingles
from cqdg_etl_spark.operators.spread import spread_to_parallelism as _spread

# Java + RE2 compatible patterns (must behave identically in DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


def repetition_metrics(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition statistics (Gopher-style quality rules).

    Returns (id, n_tokens, distinct_token_ratio, top_bigram_frac,
    dup_bigram_frac, dup_trigram_frac):

    - ``distinct_token_ratio`` — |set(tokens)| / |tokens|;
    - ``top_bigram_frac`` — occurrences of the most frequent bigram /
      total bigrams (Gopher's top-2-gram coverage);
    - ``dup_{bi,tri}gram_frac`` — fraction of n-gram *occurrences*
      whose n-gram appears more than once.

    Scale shape: ZERO shuffles — per-document counting runs inside an
    Arrow-batched ``mapInPandas`` at scan speed; only the final ratio
    projection is a JVM expression (so rounding semantics match the
    pure-expression variant bit for bit). O(L) per document,
    embarrassingly parallel, memory bounded by one Arrow batch.

    Why Python here: this is the measured exception to "built-ins
    first". The declarative form (``repetition_metrics_expr``) needs
    nested higher-order functions, which Catalyst evaluates WITHOUT
    codegen — per-element interpreted dispatch made it 6× slower than
    the Arrow round-trip at sf0.1 (3.2 s vs 0.5 s on cached input, and
    its cost scales with tree size, not data size). Counter-based run
    counting per document is exactly what the brief's Pandas-UDF
    escape hatch is for.
    """
    return _repetition_metrics_pandas(df, text_col, id_col)


def _repetition_metrics_pandas(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    counts_schema = (
        f"{id_col} {id_type}, n_tokens long, n_distinct long, "
        "bi_maxrun long, bi_dups long, bi_total long, "
        "tri_dups long, tri_total long"
    )

    def count_batches(batches):
        import re

        # Java \s is ASCII-only ([ \t\n\x0B\f\r]) and Spark's trim()
        # strips spaces; Python \s/strip() are Unicode-aware. Use the
        # explicit ASCII class + strip(' ') so tokenization matches
        # functions.text.normalize_ws/tokens and the DuckDB oracle's
        # SQL_NORM byte for byte — the oracle spells out the same
        # explicit class, because RE2's \s EXCLUDES \x0B while Java's
        # includes it (the one byte the two dialects disagree on).
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def doc_stats(text):
            norm = ws.sub(" ", (text or "").lower()).strip(" ")
            toks = norm.split(" ") if norm else []
            n = len(toks)

            def gram_stats(k):
                # Mirrors functions.text.word_shingles: a doc shorter
                # than k words yields ONE shingle of the whole text
                # (the empty string for an empty doc).
                if n > k:
                    counts = Counter(
                        zip(*(toks[i:] for i in range(k)))
                    ).values()
                else:
                    counts = (1,)
                total = sum(counts)
                dups = total - sum(1 for v in counts if v == 1)
                return max(counts), dups, total

            bi_max, bi_dups, bi_total = gram_stats(2)
            _, tri_dups, tri_total = gram_stats(3)
            return (
                n,
                len(set(toks)),
                bi_max,
                bi_dups,
                bi_total,
                tri_dups,
                tri_total,
            )

        cols = [
            "n_tokens",
            "n_distinct",
            "bi_maxrun",
            "bi_dups",
            "bi_total",
            "tri_dups",
            "tri_total",
        ]
        for pdf in batches:
            stats = pd.DataFrame(
                [doc_stats(t) for t in pdf[text_col]], columns=cols
            )
            # Insert the original Series (NOT .values): a nullable int id
            # arrives from Arrow as a masked/nullable dtype, and .values
            # would coerce through float64 (NaN), corrupting large ids.
            stats.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield stats

    # Spread before the Python pass (r11): the per-doc Counter work is
    # the cost; a 1-partition scan runs it serially (guide §2.5).
    counted = _spread(df.select(id_col, text_col)).mapInPandas(
        count_batches, counts_schema
    )
    # try_divide: an empty doc has n_tokens = 0, and under ANSI mode
    # (Spark 4 default) a plain division would throw DIVIDE_BY_ZERO at
    # runtime — ratios are NULL for empty docs instead.
    return counted.select(
        id_col,
        "n_tokens",
        F.round(
            F.try_divide(F.col("n_distinct").cast("double"), F.col("n_tokens")), 6
        ).alias("distinct_token_ratio"),
        F.round(
            F.try_divide(F.col("bi_maxrun").cast("double"), F.col("bi_total")), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.try_divide(F.col("bi_dups").cast("double"), F.col("bi_total")), 6
        ).alias("dup_bigram_frac"),
        F.round(
            F.try_divide(F.col("tri_dups").cast("double"), F.col("tri_total")), 6
        ).alias("dup_trigram_frac"),
    )


def repetition_metrics_expr(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Pure-expression variant of :func:`repetition_metrics` (no Python
    in the plan — for environments that forbid Python workers).

    Zero shuffles: each row hashes its grams to longs (xxhash64 —
    string equality on 64-bit fingerprints, vanishing collision odds
    within one document), sorts the long array, and reads gram counts
    off the equal-run lengths. Primitive-typed ``transform`` /
    ``filter`` / ``array_max`` only — no struct accumulators (a
    struct-fold variant allocated a row per element and ran 3× slower
    than the explode→groupBy shuffle it replaced, 7.6 s at sf0.1).
    Still loses to the Arrow path (see repetition_metrics): nested
    HOFs are interpreted per element, never codegen'd.
    """

    def let(col: Column, fn) -> Column:
        """Evaluate-once binding: expose ``col`` to ``fn`` as a lambda
        variable. A subtree referenced directly inside a higher-order
        lambda is RE-EVALUATED per array element (e.g. ``element_at(
        array_sort(x), i)`` re-sorts for every i — quadratic); a lambda
        variable is a constant-time slot lookup.
        """
        return F.element_at(F.transform(F.array(col), fn), 1)

    def seq1(n: Column) -> Column:
        # sequence(1, 0) would generate a DESCENDING range — guard the
        # empty case explicitly.
        return F.when(n <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), n)
        )

    def gram_stats(grams: Column) -> Column:
        """(maxrun, dups, total) of the gram multiset, from equal-run
        lengths of the hash-sorted gram array: maxrun = top-gram
        occurrences; total − #(runs of length 1) = occurrences of
        grams appearing more than once.
        """
        hashed = F.array_sort(F.transform(grams, lambda g: F.xxhash64(g)))

        def with_sorted(s: Column) -> Column:
            starts = F.filter(
                F.transform(
                    seq1(F.size(s)),
                    lambda i: F.when(
                        (i == 1)
                        | (F.element_at(s, i) != F.element_at(s, i - 1)),
                        i,
                    ).otherwise(F.lit(-1)),
                ),
                lambda x: x != -1,
            )
            bounds = F.concat(starts, F.array(F.size(s) + 1))
            return let(
                bounds,
                lambda b: F.transform(
                    seq1(F.size(b) - 1),
                    lambda j: F.element_at(b, j + 1) - F.element_at(b, j),
                ),
            )

        def stats(runs: Column) -> Column:
            total = F.aggregate(runs, F.lit(0), lambda a, r: a + r)
            singles = F.size(F.filter(runs, lambda r: r == 1))
            return F.struct(
                F.coalesce(F.array_max(runs), F.lit(0))
                .cast("long")
                .alias("maxrun"),
                (total - singles).cast("long").alias("dups"),
                total.cast("long").alias("total"),
            )

        return let(let(hashed, with_sorted), stats)

    # NULL text counts as the empty document (the pandas path's
    # ``text or ""``); try_divide keeps the 0-token doc NULL-ratio'd
    # instead of throwing under ANSI mode.
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(normalize_ws(text))
    # Two-step select: the stats structs are expensive HOF trees
    # referenced several times each — CollapseProject keeps them
    # single-evaluation because they are non-cheap multi-reference.
    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.try_divide(
                F.size(F.array_distinct(toks)).cast("double"), F.size(toks)
            ),
            6,
        ).alias("distinct_token_ratio"),
        gram_stats(word_shingles(text, n=2)).alias("bi"),
        gram_stats(word_shingles(text, n=3)).alias("tri"),
    )
    return staged.select(
        id_col,
        "n_tokens",
        "distinct_token_ratio",
        F.round(
            F.try_divide(F.col("bi.maxrun").cast("double"), F.col("bi.total")), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.try_divide(F.col("bi.dups").cast("double"), F.col("bi.total")), 6
        ).alias("dup_bigram_frac"),
        F.round(
            F.try_divide(F.col("tri.dups").cast("double"), F.col("tri.total")), 6
        ).alias("dup_trigram_frac"),
    )


def c4_rule_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 30,
    max_words: int = 10_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
) -> DataFrame:
    """C4-style per-document rule flags, all in one projection.

    Returns (id, n_words, mean_word_len, len_ok, word_len_ok, no_brace,
    no_lorem, keep). Zero shuffles — every rule is an array/string
    expression over the text column, so the filter runs at scan speed
    and pushes the surviving-row projection into the same stage.
    """
    toks = tokens(normalize_ws(F.col(text_col)))
    n_words = F.size(toks).cast("bigint")
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.size(toks),
        6,
    )
    lowered = F.lower(F.col(text_col))
    len_ok = (n_words >= min_words) & (n_words <= max_words)
    word_len_ok = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    no_brace = ~lowered.contains("{")
    no_lorem = ~lowered.contains("lorem ipsum")
    return (
        df.select(
            F.col(id_col),
            n_words.alias("n_words"),
            mean_len.alias("mean_word_len"),
            len_ok.alias("len_ok"),
            no_brace.alias("no_brace"),
            no_lorem.alias("no_lorem"),
        )
        .withColumn("word_len_ok", word_len_ok)
        .withColumn(
            "keep",
            F.col("len_ok")
            & F.col("word_len_ok")
            & F.col("no_brace")
            & F.col("no_lorem"),
        )
        .select(
            id_col,
            "n_words",
            "mean_word_len",
            "len_ok",
            "word_len_ok",
            "no_brace",
            "no_lorem",
            "keep",
        )
    )


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact emails / IPv4s / phone-shaped tokens, with counts.

    Returns (id, redacted, n_emails, n_ips, n_phones). Replacement
    order is fixed (email → ip → phone) so overlapping matches resolve
    deterministically. Pure ``regexp_replace`` / ``regexp_count``
    chain — single projection, no shuffle, runs at scan speed; the
    patterns are written in the Java∩RE2 common dialect so an external
    engine produces byte-identical redactions.
    """
    text = F.col(text_col)
    redacted = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    )


def canonical_per_cluster(
    docs: DataFrame,
    components: DataFrame,
    id_col: str,
    quality_col: str,
) -> DataFrame:
    """Pick one canonical document per duplicate cluster.

    ``components`` is (node, component) from connected components over
    near-dup pairs; documents absent from it are singleton clusters.
    The winner is the highest-``quality_col`` member (ties → lowest
    id). Returns (id, component, is_canonical).

    Scale shape: the component map is #duplicate-docs rows — usually
    smaller than the corpus but NOT boundedly so (web-crawl near-dup
    rates run 30-80%, so at 100 TB the map can be billions of rows):
    no broadcast hint — AQE broadcasts at runtime when the map is
    actually small and falls back to a node-keyed shuffle join when
    it isn't. The winner is a window rank partitioned by component —
    the window input is only the clustered docs plus singletons, and
    singleton partitions are size-1, so no skew beyond the largest
    duplicate cluster.
    """
    from pyspark.sql import Window

    labeled = docs.join(
        components,
        docs[id_col] == components["node"],
        "left",
    ).select(
        docs[id_col],
        F.coalesce(F.col("component"), docs[id_col]).alias("component"),
        F.col(quality_col).alias("_q"),
    )
    rank = F.row_number().over(
        Window.partitionBy("component").orderBy(
            F.col("_q").desc(), F.col(id_col).asc()
        )
    )
    return labeled.select(
        id_col,
        "component",
        (rank == 1).alias("is_canonical"),
    )
