"""Focused tests for operators/bloom.py — the dense bitmap assembly
(rewritten r11: union-zeros + one sorted collect, replacing the
O(n_words × entries) map-lookup gap-fill) and the join-equivalence
contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqdg_etl_spark.operators.bloom import bloom_bitmap, bloom_filter_join


def test_bitmap_dense_assembly_matches_sparse_words(spark):
    """The dense array must equal the sparse (word → bits) aggregate
    with zeros everywhere else — the exact contract the old map-based
    gap-fill implemented."""
    num_bits, num_hashes = 1 << 10, 3
    n_words = num_bits // 64
    dim = spark.range(0, 200).select(F.col("id").alias("k"))
    arr = bloom_bitmap(dim, "k", num_bits, num_hashes).collect()[0]["__bloom"]
    assert len(arr) == n_words
    # Reference: the same per-word bit_or computed independently.
    sparse = {
        r["w"]: r["bits"]
        for r in dim.select(
            F.explode(
                F.array(
                    *[
                        F.expr(f"pmod(xxhash64(k, {s}), {num_bits}L)")
                        for s in range(num_hashes)
                    ]
                )
            ).alias("p")
        )
        .select(
            (F.col("p") / F.lit(64)).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    }
    expected = [sparse.get(w, 0) for w in range(n_words)]
    assert arr == expected
    # sanity: something is set, and no more positions than inserted
    total_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in arr)
    assert 0 < total_bits <= 200 * num_hashes


def test_bloom_filter_join_equals_plain_join(spark):
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 1000, 13).select(F.col("id").alias("k"))
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_filter_join(fact, dim, on="k", num_bits=1 << 10).collect()
    )
    want = sorted((r["k"], r["v"]) for r in fact.join(dim, "k").collect())
    assert got == want
