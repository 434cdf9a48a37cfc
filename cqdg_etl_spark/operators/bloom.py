"""Bloom-filter runtime pre-filter for shuffle joins.

The classic 100 TB join problem: the dimension side is too big to
broadcast as a hash relation (GBs of keys), so the fact table pays a
full shuffle — including every row whose key has no match at all. A
Bloom filter of the dimension keys is hundreds of times smaller than
the keys themselves (10 bits/key at ~1% false positives), small enough
to broadcast, and filters the fact table BEFORE its shuffle: only
(matching + ε) rows ever hit the exchange. Spark's optimizer injects
this automatically in some shapes (runtime bloom filter, SPARK-32268);
this operator is the explicit, composable form.

Everything is public DataFrame API and stays JVM-side:

- build: per-key positions via seeded ``xxhash64`` → OR-fold into
  64-bit words (one partial-aggregated shuffle of #words rows) → a
  single-row ``array<bigint>`` bitmap, broadcast-cross-joined onto the
  fact side;
- probe: pure expression bit tests inside whole-stage codegen — no
  UDF, no driver round-trip, no collect.

False positives only ever ADD rows to the pre-filtered fact; the real
join afterwards removes them, so results are exactly the plain join's
(oracled as such in the registry).

Beyond-reference capability: the reference joins everything unfiltered
(e.g. file×donor at ProcessETLUtils.scala:456); at its data sizes that
is fine — at 100 TB it is the difference between shuffling the corpus
and shuffling the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions_sql(key: str, seed: int, num_bits: int) -> str:
    return f"pmod(xxhash64({key}, {seed}), {num_bits}L)"


def bloom_bitmap(
    dim: DataFrame, key: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """1-row DataFrame ``(__bloom: array<bigint>)`` over dim's keys.

    Built distributed: explode each key into its ``num_hashes`` bit
    positions, OR partial-aggregate per 64-bit word (the shuffle moves
    at most ``num_bits/64`` rows per map partition), then assemble the
    dense word array on a single row.
    """
    n_words = num_bits // 64
    pos = dim.select(
        F.explode(
            F.array(
                *[
                    F.expr(_positions_sql(key, s, num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("p")
    )
    # Dense assembly: union an all-words zero stream into the bit
    # aggregate so every word index exists, then sort the collected
    # (w, bits) structs once and strip the keys. The previous form
    # gap-filled with transform(sequence(0, n_words-1), w -> m[w]) —
    # but Spark map access is a LINEAR scan (ArrayBasedMapData has no
    # hash index), so the single-row build did n_words × |entries|
    # comparisons inside one interpreted HOF on one core: measured
    # 12-16 s at the default 16 Ki words, and O(n_words²) at the
    # larger bitmap sizes a real dimension table needs. The dense
    # form is one O(n log n) array_sort + an O(n) field projection.
    words = pos.select(
        (F.col("p") / F.lit(64)).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("bit"),
    ).unionByName(
        dim.sparkSession.range(n_words).select(
            F.col("id").cast("int").alias("w"),
            F.lit(0).cast("long").alias("bit"),
        )
    ).groupBy("w").agg(F.bit_or("bit").alias("bits"))
    return words.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda x: x["bits"],
        ).alias("__bloom")
    )


def bloom_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``fact ⋈ dim`` with a Bloom pre-filter on the fact side.

    Exactly equivalent to ``fact.join(dim, on, how)`` for inner/semi
    joins (false positives are eliminated by the join itself); the
    fact-side shuffle carries only rows whose key is (probably) in dim.
    """
    probe = " AND ".join(
        f"((shiftright(element_at(__bloom, "
        f"CAST({_positions_sql(on, s, num_bits)} DIV 64 AS INT) + 1), "
        f"CAST({_positions_sql(on, s, num_bits)} % 64 AS INT))) & 1) = 1"
        for s in range(num_hashes)
    )
    filtered = (
        fact.crossJoin(
            F.broadcast(bloom_bitmap(dim, on, num_bits, num_hashes))
        )
        .filter(F.expr(probe))
        .drop("__bloom")
    )
    return filtered.join(dim, on, how)
