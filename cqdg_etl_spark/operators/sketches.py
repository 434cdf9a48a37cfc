"""Mergeable frequency sketches: count-min with heavy-hitter extraction.

A count-min sketch (Cormode & Muthukrishnan, J.Algorithms'05) summarizes
a token stream in depth×width counters: token t increments counter
(d, h_d(t) mod width) for each of ``depth`` independent hash rows; the
frequency estimate is the MIN over rows, which never under-counts and
over-counts by ≤ εN with probability 1-δ (ε = e/width, δ = e^-depth).

Spark shape: the sketch IS a tiny DataFrame keyed by (d, bucket) —
built with one map-side-combined groupBy over the exploded hash rows
(shuffle volume bounded by depth×width per partition, NOT by token
count), broadcastable for estimation joins, and mergeable across
corpora by unioning sketches and summing counters — the property that
makes it a 100-TB structure (each executor folds its partition into
≤ depth×width rows before anything moves).

All hashes are md5-derived (engine-portable), so the DuckDB oracle
reproduces the sketch exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(col: Column, d: int, width: int) -> Column:
    """Row-d bucket: first 8 md5 hex chars of 'd:token' mod width
    (portable: any engine reproduces it)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), col)), 1, 8), 16, 10
    ).cast("bigint")
    return (h % width).cast("int")


def count_min_sketch(
    df: DataFrame,
    token_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt), depth×width rows max."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(token_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    )
    return rows.groupBy(
        F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    token_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate each item's frequency: min over rows of its counter.

    The sketch side is ≤ depth×width rows → broadcast; the items side
    never shuffles. Returns items + ``cms_estimate``.
    """
    out = items
    for d in range(depth):
        s = F.broadcast(
            sketch.filter(F.col("d") == d).select(
                F.col("bucket").alias(f"b{d}"), F.col("cnt").alias(f"c{d}")
            )
        )
        # LEFT join + coalesce 0: an item hashing to a bucket no token
        # ever touched has counter 0 — an inner join would silently
        # DROP unseen items instead of estimating them as ~0.
        out = out.withColumn(f"b{d}", _bucket(F.col(token_col), d, width)).join(
            s, f"b{d}", "left"
        )
    est = F.least(
        *[F.coalesce(F.col(f"c{d}"), F.lit(0)) for d in range(depth)]
    )
    return out.select(
        *items.columns, est.cast("bigint").alias("cms_estimate")
    )


def cms_heavy_hitters(
    df: DataFrame,
    token_col: str,
    top_n: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Exact top-N tokens with their CMS estimates side by side —
    (token, exact_cnt, cms_estimate). Demonstrates the one-sided error
    bound: cms_estimate ≥ exact_cnt always; ≈ equal for heavy hitters.

    At corpus scale the exact side is the expensive one (full token
    groupBy); production flows keep ONLY the sketch + a per-partition
    candidate heap. Here both are computed so the estimate's guarantee
    is checkable row by row.
    """
    sketch = count_min_sketch(df, token_col, depth, width)
    exact = (
        df.groupBy(F.col(token_col).alias("token"))
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(top_n)
    )
    return cms_estimate(sketch, exact, "token", depth, width).orderBy(
        F.desc("exact_cnt"), F.asc("token")
    )


# ---------------------------------------------------------------------
# Linear-counting cardinality sketch (Whang, Vander-Zanden & Taylor,
# TODS'90): the mergeable DISTINCT-COUNT companion to the count-min
# FREQUENCY sketch above. Each value sets one bit of an m-bit bitmap
# (bit = portable hash mod m); the estimate is -m·ln(V) where V is the
# fraction of zero bits. Unlike HyperLogLog it is exactly reproducible
# from the hash alone — which is what makes it oracle-checkable — and
# for n ≲ m it is MORE accurate than HLL.
#
# Spark shape: bitmap words, not rows — (word = bit div 64) groupBy
# with a bit_or aggregate. bit_or is associative/commutative, so each
# partition folds to ≤ m/64 words before the shuffle, the sketch
# merges across corpora by another bit_or, and the final estimate reads
# m/64 rows. Shuffle volume is bounded by the sketch size, never by
# row count — same 100-TB property as the CMS.

LC_M = 4096  # bits; stderr ≈ √m·(e^t − t − 1)/ (t·m), t = n/m


def linear_count(
    df: DataFrame, value_col: str, m: int = LC_M, salt: str = "lc"
) -> DataFrame:
    """One-row frame: (m, n_set, estimate) for distinct ``value_col``.

    estimate = round(-m·ln(1 − n_set/m), 2); saturated bitmaps
    (n_set = m) report NULL (the sketch's documented failure mode —
    size m to the expected cardinality).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    bit = F.pmod(h, F.lit(m))
    words = (
        df.select(bit.alias("bit"))
        .select(
            F.expr("CAST(bit DIV 64 AS INT)").alias("word"),
            # shiftleft's bit-count arg must be an expression, so spell
            # it in SQL (the DataFrame helper only takes an int literal)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.agg(
        F.lit(m).alias("m"),
        F.sum(F.bit_count("bits")).alias("n_set"),
    ).select(
        "m",
        "n_set",
        F.when(
            F.col("n_set") < m,
            F.round(
                -F.lit(float(m))
                * F.log(F.lit(1.0) - F.col("n_set") / F.lit(float(m))),
                2,
            ),
        ).alias("estimate"),
    )
