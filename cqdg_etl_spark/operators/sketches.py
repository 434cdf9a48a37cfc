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
    from pyspark import StorageLevel

    # Persisted (r11): cms_estimate builds one broadcast per depth row
    # from this frame — unpersisted, each of the ``depth`` filters
    # re-ran the full token-stream CMS aggregate (depth+1 corpus
    # passes for a 2-pass audit). ≤ depth×width rows.
    sketch = count_min_sketch(df, token_col, depth, width).persist(
        StorageLevel.MEMORY_AND_DISK
    )
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


# --------------------------------------------------------- HyperLogLog

HLL_P = 8  # 2^8 = 256 registers


def hll_registers(
    df: DataFrame, value_col: str, p: int = HLL_P, salt: str = "hll"
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al., AofA'07) for
    distinct ``value_col``: (reg, mx) with reg ∈ [0, 2^p) and mx the
    max leading-zero rank observed in that register.

    Hashing is the package's portable 60-bit md5 int: register = low p
    bits (mod 2^p), rank ρ = position of the first 1-bit in the NEXT
    32 bits + 1 (all-zero suffix → ρ = 33). ρ is derived from the
    BINARY-STRING length of the suffix (exact integer/string ops —
    Spark ``length(bin(x))``, DuckDB ``length(format('{:b}', x))``) so
    both engines build bit-identical registers; no float log anywhere
    in the sketch itself.

    This is THE mergeable cardinality structure at 100 TB: each
    executor partial-aggregates its partition to ≤ 2^p rows before the
    shuffle (map-side combine on max), the sketch is 2^p small rows,
    and merging sketches across corpora/days = union + max per
    register (``hll_merge``). Standard error ≈ 1.04/√(2^p) ≈ 6.5% at
    p=8 — size p to the accuracy target, the plan shape is unchanged.
    """
    m = 1 << p
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # suffix = the next 32 bits above the register bits (integer DIV —
    # a double-routed '/' would lose exactness above 2^53); ρ = 33 −
    # bit_length(suffix), suffix=0 → 33. bin() never sees a negative:
    # h is a 60-bit non-negative int.
    rows = (
        df.select(h.alias("h"))
        .select(
            F.pmod(F.col("h"), F.lit(m)).alias("reg"),
            F.expr(f"(h DIV {m}) % {1 << 32}").alias("hsfx"),
        )
    ).select(
        "reg",
        F.when(F.col("hsfx") == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.expr("bin(hsfx)")))
        .cast("int")
        .alias("rho"),
    )
    return rows.groupBy("reg").agg(F.max("rho").alias("mx"))


def hll_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge register tables: union + per-register max (associative,
    commutative — the property that makes HLL shardable)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("mx").alias("mx"))


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row cardinality estimate from a register table:
    (m, n_zero, estimate).

    E = α_m · m² / Σ_j 2^(−M_j) with the small-range linear-counting
    correction (E ≤ 2.5m and empty registers exist → m·ln(m/V)).

    Determinism: each 2^(−M) term is computed as 1 / (1::long << M) —
    exact integer shift + exact power-of-two division, and the Σ is
    exact in IEEE double for p ≤ 10 (terms are dyadic with ≤ 33
    fractional bits, ≤ 2^p of them — every partial sum fits a 53-bit
    mantissa), so the harmonic denominator is bit-identical regardless
    of engine or accumulation order. The only libm call is the
    correction's ln, pinned by the package's round-to-2dp convention
    (same as linear_count).
    """
    m = 1 << p
    spark = registers.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("reg"))
        .join(registers, "reg", "left")
        .select("reg", F.coalesce(F.col("mx"), F.lit(0)).alias("mx"))
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = full.agg(
        F.sum(
            F.lit(1.0)
            / F.expr("shiftleft(CAST(1 AS BIGINT), mx)").cast("double")
        ).alias("s"),
        F.sum(F.when(F.col("mx") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / F.col("s")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.round(corrected, 2).alias("estimate"),
    )


def hll_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = HLL_P,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL distinct estimate — (group, m, n_zero, estimate) —
    in a TWO-level aggregation cascade and nothing else.

    Unlike ``hll_estimate`` (which densifies the register table against
    ``range(m)``), the grouped form never materializes absent
    registers: every present register has rho ≥ 1 by construction
    (the 32-bit suffix bounds bit_length ≤ 32), so an ABSENT register
    contributes exactly 1.0 (= 2^-0) to the harmonic sum and exactly 1
    to n_zero. Hence per group:

        s      = Σ_present 2^(−mx) + (m − n_present)
        n_zero = m − n_present

    computed from groupBy(group, reg).max → groupBy(group) — two
    shuffles on progressively smaller frames (≤ m rows per group after
    the first), no per-group range join, no explode. At 100 TB with
    millions of groups this is the difference between a plan linear in
    |groups|·m rows and one linear in the PRESENT registers only.

    Exactness: each 2^(−mx) term is dyadic with ≤ 33 fractional bits
    and the per-group sum has ≤ m = 2^p terms plus an integer ≤ m, so
    for p ≤ 10 every partial sum fits a 53-bit mantissa — the double
    sum is EXACT and order-independent, hash-matchable across engines.
    The only libm call is the small-range correction's ln (2-dp pinned,
    same convention as ``hll_estimate``).
    """
    m = 1 << p
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rows = df.select(F.col(group_col).alias("grp"), h.alias("h")).select(
        "grp",
        F.pmod(F.col("h"), F.lit(m)).alias("reg"),
        F.expr(f"(h DIV {m}) % {1 << 32}").alias("hsfx"),
    ).select(
        "grp",
        "reg",
        F.when(F.col("hsfx") == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.expr("bin(hsfx)")))
        .cast("int")
        .alias("rho"),
    )
    regs = rows.groupBy("grp", "reg").agg(F.max("rho").alias("mx"))
    agg = regs.groupBy("grp").agg(
        F.sum(
            F.lit(1.0)
            / F.expr("shiftleft(CAST(1 AS BIGINT), mx)").cast("double")
        ).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    s = F.col("sp") + (F.lit(m) - F.col("np")).cast("double")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / s
    n_zero = (F.lit(m) - F.col("np")).cast("long")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("grp").alias(group_col),
        F.lit(m).alias("m"),
        n_zero.alias("n_zero"),
        F.round(corrected, 2).alias("estimate"),
    )
