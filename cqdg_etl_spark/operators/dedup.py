"""Deduplication operators for large-scale corpus pipelines.

Five strategies, all expressed as declarative DataFrame plans:

- exact:      md5 of whitespace/case-normalized text, hash-groupBy.
- ngram-jaccard: word-shingle inverted index → self-join on shingle →
               exact Jaccard on candidate pairs.
- minhash+LSH: portable 32-bit token hashes → k permutations →
               banded signatures → bucket join for candidates →
               (optionally) exact verify.
- simhash:    128-bit sign-aggregated fingerprint (4×32-bit pigeonhole
               chunks; the 64-bit/4×16 layout is kept only as the probe
               contrast series), hamming verify via xor+bit_count.
- embedding:  cosine over an embedding column (see similarity.py) with a
               threshold join.

Scale design: every strategy is shuffle-bounded by (doc, feature)
inverted-index joins, never an O(n²) cross join. The classic guards for
100 TB corpora are built in: common-shingle suppression (`max_df`),
per-bucket pair caps via distinct doc ids, and band-hash grouping that
partitions cleanly by (band_index, band_hash).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.text import (
    fingerprint,
    normalize_ws,
    token_hash,
    word_shingles,
)

# Mersenne prime 2^61-1: modulus for the universal-hash permutation
# family h_i(x) = (a_i*x + b_i) mod P. Fits comfortably in a Spark
# LongType with 32-bit inputs (a*x < 2^93 would overflow — so inputs are
# first folded to < 2^32 and a_i < 2^30, keeping a*x < 2^62).
MINHASH_P = (1 << 61) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the session's shuffle parallelism.

    Heavy per-row text expressions (shingling, token hashing) bottleneck
    on the scan's partition count; a small parquet file is 1 partition =
    1 core. Aligning the input to spark.sql.shuffle.partitions — the
    width every downstream shuffle uses anyway, tuned to the cluster at
    production scale — is the declared semantics.

    Deliberately unconditional: the previous guard read
    df.rdd.getNumPartitions(), which forces physical planning of the
    whole frame on the driver for EVERY dedup call just to sometimes
    skip a cheap round-robin exchange of skinny rows.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(target)


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
        for _ in range(num_perm)
    ]


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup → one row per distinct normalized text:
    (fingerprint, n_docs, keep_id = min id)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def shingle_index(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, max_df: int | None = None
) -> DataFrame:
    """Distinct (id, shingle) inverted index; optionally drop shingles
    appearing in more than ``max_df`` docs (stop-shingle suppression —
    at corpus scale the hot shingles create quadratic bucket blowup)."""
    # array_distinct already dedupes within a doc, so (doc, shingle) is
    # distinct by construction — no extra shuffle needed.
    idx = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("shingle"),
    )
    if max_df is not None:
        counts = idx.groupBy("shingle").agg(F.count("*").alias("df"))
        idx = (
            idx.join(counts.filter(F.col("df") <= max_df), "shingle")
            .select("doc", "shingle")
        )
    return idx


def _shingle_overlap_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    max_df: int | None,
) -> DataFrame:
    """Shared candidate machinery for the exact set-overlap dedup
    measures (Jaccard, containment): inverted-index self-join →
    (doc_a < doc_b, n_inter, size_a, size_b). The measure-specific
    arithmetic is a cheap projection the callers finish.

    Scale shape (each choice measured at sf0.1; ~25% total win over the
    naive string-key formulation, and structurally safe at 1000×):
    - join key = xxhash64(shingle): 8-byte shuffle key instead of a
      multi-word string (collision odds ~|shingles|²/2⁶⁴, immaterial);
    - the raw docs are spread to the session's shuffle parallelism
      *before* the shingle expression when the source has fewer
      partitions (a small parquet = 1 partition = 1 core doing all the
      heavy string work; at real scale the input already has enough
      partitions and this is a no-op);
    - one ``repartition("h")`` barrier: both self-join sides and the
      per-doc size aggregate hang off the same exchange, so the corpus
      is scanned and shingled exactly once (ReusedExchange at runtime);
    - doc sizes come from a count over the skinny (doc, h) index and
      join back AFTER the pair aggregate, size-aware: unhinted, so the
      planner broadcasts the #docs-row frame only while it is under
      the auto-broadcast threshold and shuffle-joins beyond (a
      corpus-scale doc count does not fit a broadcast).
      Do NOT piggyback ``size(shingles)`` through the explode/join:
      Catalyst inlines the projection and re-evaluates the whole
      shingle expression per exploded (or worse, per join-match) row —
      measured 2–30× slower depending on where it lands.
    """
    df = _spread(df)
    idx = shingle_index(df, text_col, id_col, n, None).select(
        "doc", F.xxhash64("shingle").alias("h")
    )
    idx = idx.repartition("h")
    if max_df is not None:
        # Stop-shingle suppression on the HASHED key via a count window
        # over the repartition("h") exchange. Window (not a groupBy +
        # join): the guard stays INSIDE the single shared subtree, so
        # the self-join's two sides remain identical plans and reuse ONE
        # exchange — a separate aggregate branch made each side (and the
        # size aggregate) recompute the scan+shingling (measured ~2×
        # slower at sf0.1). The window sorts each partition by h, work
        # the sort-merge self-join needs anyway. Counting h instead of
        # the string merges xxhash64 collisions into one df bucket:
        # odds ~|shingles|²/2⁶⁴, marginally more aggressive capping.
        idx = (
            idx.withColumn("df_h", F.count("*").over(W.partitionBy("h")))
            .filter(F.col("df_h") <= max_df)
            .select("doc", "h")
        )
    sizes = idx.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    # shuffle_hash hint on the self-join: at corpus scale neither side
    # fits a broadcast, so both sides shuffle on h and share one
    # exchange; locally it also stops AQE from broadcast-converting one
    # side (which forces that side's scan+shingle subtree to be
    # recomputed into the broadcast build — measured 13% slower at
    # sf0.1).
    a = idx.alias("a").hint("shuffle_hash")
    b = idx.alias("b").hint("shuffle_hash")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sizes_a = sizes.select(
        F.col("doc").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sizes_b = sizes.select(
        F.col("doc").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    # No forced broadcast on the per-doc sizes frame: it is #docs rows,
    # which fits a broadcast at test SF but NOT at corpus scale (10⁹
    # docs ≈ 16 GB). Left unhinted, the planner broadcasts it while it
    # is under spark.sql.autoBroadcastJoinThreshold and falls back to a
    # shuffle join on doc_a/doc_b beyond — the size-aware behavior the
    # 100-TB target needs, chosen at runtime by AQE from the aggregate's
    # actual output size.
    return inter.join(sizes_a, "doc_a").join(sizes_b, "doc_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join
    (see _shingle_overlap_stats for the shared candidate machinery and
    its measured scale rationale): |A∩B| = count of shared shingles,
    |A∪B| = |A|+|B|−∩. Returns (doc_a < doc_b, jaccard) ≥ threshold.
    """
    stats = _shingle_overlap_stats(df, text_col, id_col, n, max_df)
    return (
        stats.withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def shingle_hash_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """(doc, hs) where hs = the doc's DISTINCT portable shingle hashes
    as a bounded array (|hs| ≤ doc word count). The shared upstream of
    the whole MinHash family: signatures derive from hs map-side, and
    the verify step intersects the same arrays — so one scan+shingle
    pass can feed candidate generation AND verification."""
    return _spread(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.transform(
                word_shingles(F.col(text_col), shingle_n),
                lambda s: token_hash(s),
            )
        ).alias("hs"),
    )


def signatures_from_sets(
    sets: DataFrame, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """MinHash signature per document: array<bigint> of length num_perm.

    Explode + num_perm min() aggregates keyed on doc — whole-stage
    codegen end to end (an array_min/transform HOF formulation computes
    the same values but pays interpreted-lambda dispatch per element;
    measured slower). When ``sets`` is already hash-partitioned on doc
    (the verified flow's shared exchange) the groupBy needs NO new
    shuffle — the aggregate runs in place on the exchange output.
    """
    params = _perm_params(num_perm, seed)
    idx = sets.select("doc", F.explode("hs").alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = idx.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("signature")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: array<bigint> of length num_perm.

    One explode + one groupBy with num_perm min() aggregates — a single
    shuffle keyed on the doc id, partial-aggregated map-side. The md5
    token hash is computed in a post-explode codegen projection (one
    md5 per (doc, shingle) row), NOT inside an array transform — the
    interpreted-HOF md5 formulation measured ~4× slower. The verified
    flow pays the HOF form once instead because it must materialize the
    hash SETS anyway (see minhash_verified_pairs).
    """
    params = _perm_params(num_perm, seed)
    idx = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle_n))).alias(
            "shingle"
        ),
    ).select("doc", token_hash(F.col("shingle")).alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = idx.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    sets: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows of
    num_perm/bands values, bucket-join docs sharing any band.

    Returns distinct candidate pairs (doc_a < doc_b, n_shared_bands).
    Pair generation shuffles on (band_idx, band_key) — the classic
    scale-safe MinHash-LSH plan. ``sets`` lets a caller (the verified
    flow) supply an already-built shingle_hash_sets frame so its
    exchange is shared instead of the corpus being re-shingled.
    """
    rows_per_band = num_perm // bands
    if sets is None:
        sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed)
    else:
        sig = signatures_from_sets(sets, num_perm, seed)
    # Static expression tree, not transform() lambdas: bands and
    # rows_per_band are plan-time constants, and higher-order functions
    # run as interpreted per-element lambdas outside whole-stage
    # codegen (same finding as signatures_from_sets' docstring). The
    # literal array of per-band structs keeps the explode in codegen —
    # measured 2-3x faster banding at sf0.1 (r11 probe), identical
    # band keys.
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("signature")
                                .getItem(i * rows_per_band + j)
                                .cast("string")
                                for j in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "band.band_idx", "band.band_key")
    # shuffle_hash: at corpus scale neither banded side fits a
    # broadcast; locally it also keeps the two identical band exchanges
    # eligible for ReusedExchange instead of AQE broadcast-converting
    # one side into a re-computation of the whole shingle+signature
    # subtree (same reasoning as ngram_jaccard_pairs, measured there).
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The production dedup flow: MinHash-LSH candidate generation +
    exact Jaccard verify ON CANDIDATES ONLY → (doc_a, doc_b, jaccard).

    Contrast with ngram_jaccard_pairs (exact inverted-index over ALL
    shingle matches): here the expensive exact set intersection runs
    only on the O(#candidates) pairs the banding surfaces — the shape
    that wins when the corpus is large and duplicates are rare. Each
    doc's distinct shingle-hash SET (bounded by document length) rides
    the candidate join as an array; |∩| via array_intersect is
    order-insensitive, so the result is deterministic and
    oracle-reproducible (portable md5 token hashes throughout).

    The scan+shingle+md5 subtree — the operator's dominant cost — is
    computed ONCE: the skinny (doc, hs) frame is persisted
    (MEMORY_AND_DISK) and all three consumers (signature derivation for
    banding, and both verify sides) read the materialized copy.
    Exchange reuse can NOT express this sharing: each consumer pushes a
    different filter into the scan (the signature explode pushes
    size(hs)>0, the verify joins push isnotnull(doc)), so the exchange
    subtrees are never canonically equal and Catalyst re-shingles per
    consumer (measured 3 extra scans, ~3× the runtime). Materializing
    the feature frame is also what a production dedup pipeline does —
    signatures are an INDEX, built once, probed many times. Spark's
    cache manager keys by canonical plan, so repeated invocations reuse
    one entry; at 100 TB the frame is bounded by total token count and
    spills to local disk.
    """
    from pyspark import StorageLevel

    sets = shingle_hash_sets(df, text_col, id_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_perm, bands, shingle_n, seed, sets=sets
    ).select("doc_a", "doc_b")
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size("hs_a") + F.size("hs_b") - inter
    # Lossless length filter (PPJoin length bound, applied to the LSH
    # candidates): J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a pair whose
    # set sizes differ by more than the threshold ratio cannot verify —
    # skip its O(|A|+|B|) array_intersect entirely. Integer-exact and
    # conservative: K = floor(t·1e6) ≤ t·1e6, so a filtered pair has
    # J ≤ min/max < K/1e6 ≤ t and would fail the jaccard filter anyway.
    # Sizes are int32; widen before the ×1e6 product.
    import math

    k = int(math.floor(threshold * 1_000_000))
    na = F.size("hs_a").cast("long")
    nb = F.size("hs_b").cast("long")
    len_ok = F.least(na, nb) * F.lit(1_000_000) >= F.greatest(na, nb) * F.lit(k)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(len_ok)
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _hash64_halves(col: Column) -> tuple[Column, Column]:
    """Portable 64-bit token hash as two 32-bit halves (md5-derived, so
    any engine can reproduce it)."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint")
    return hi, lo


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document (token-frequency weighted).

    For each bit position the signed token contributions are summed in
    one groupBy (64 conditional-sum aggregates — map-side combined);
    the signature is reassembled as two 32-bit ints packed in a bigint.
    """
    toks = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_ws(F.col(text_col)), " ")).alias("tok"),
    )
    hi, lo = _hash64_halves(F.col("tok"))
    toks = toks.select("doc", hi.alias("hi"), lo.alias("lo"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("hi" if b < 32 else "lo"), b % 32) % 2 == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("doc").agg(*sums)
    bit_terms = [
        F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("decimal(20,0)")).otherwise(
            F.lit(0).cast("decimal(20,0)")
        )
        for b in range(63)  # bit 63 kept clear: signature stays a positive bigint
    ]
    sig = agg.select(
        "doc",
        sum(bit_terms[1:], bit_terms[0]).cast("bigint").alias("simhash"),
    )
    return sig


def simhash128(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """128-bit SimHash per document as four 32-bit chunk columns
    ``(doc, c0..c3)``, token-frequency weighted. All 128 bits come from
    ONE md5 per token (the full digest, vs simhash64's first 16 hex
    chars), so the oracle stays engine-portable.

    Why 128 bits (SCALE_PROBE_r05/r06, COVERAGE r6 queue #5): with a
    64-bit signature the 4-chunk pigeonhole block is 16 bits, so a
    RANDOM pair bucket-collides w.p. 4·2⁻¹⁶ and junk candidates are
    ≈ 4n²/65536 — a constant-divisor quadratic, invisible at probe
    scale (~38 k pairs at n = 50 k) and dominant at n ≥ 10⁸. The
    64-bit/4×16 layout is TIGHT for hamming ≤ 3 (pigeonhole needs
    d+1 blocks), so the fix is a wider signature: 4×32-bit chunks drop
    junk to 4n²/2³², pushing the quadratic knee out 65536×.

    Plan-width trick: the natural form needs 128 per-bit sign sums —
    past Spark's whole-stage-codegen field limit
    (``spark.sql.codegen.maxFields`` = 100), which would drop the hot
    aggregate to interpreted row-at-a-time mode. Two bit-counters are
    instead PACKED per aggregate column (bit 2j's ones-count in the low
    32-bit lane, bit 2j+1's in the high lane), so the aggregate is 64
    sums + count — the same plan width as simhash64, codegen stays on,
    and it is still one map-side-combined groupBy. Lanes cannot carry
    into each other: each lane gains at most 1 per token occurrence, so
    lane values stay < 2³¹ for any document under 2³¹ tokens. Sign
    decision: bit set iff ones·2 > n_tokens (ties → clear) — identical
    to the ±1 sum being > 0.
    """
    toks = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_ws(F.col(text_col)), " ")).alias("tok"),
    )
    hx = F.md5(F.col("tok"))
    words = [
        F.conv(F.substring(hx, 1 + 8 * w, 8), 16, 10).cast("bigint")
        for w in range(4)
    ]
    lane_hi = F.lit(4294967296).cast("bigint")  # 2^32
    packed = [
        (
            F.shiftright(words[j // 16], (2 * j) % 32) % 2
            + (F.shiftright(words[j // 16], (2 * j) % 32 + 1) % 2) * lane_hi
        ).alias(f"p{j}")
        for j in range(64)
    ]
    agg = toks.select("doc", *packed).groupBy("doc").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p{j}").alias(f"s{j}") for j in range(64)],
    )

    def ones(b: int) -> Column:  # ones-count of global bit b
        s = F.col(f"s{b // 2}")
        return F.shiftright(s, 32) if b % 2 else s % lane_hi

    chunk_cols = []
    for c in range(4):
        terms = [
            F.when(
                ones(c * 32 + k) * 2 > F.col("n"),
                F.lit(1 << k).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            for k in range(32)
        ]
        chunk_cols.append(sum(terms[1:], terms[0]).alias(f"c{c}"))
    return agg.select("doc", *chunk_cols)


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash-128: band the four 32-bit chunks
    (pigeonhole: ≤3 differing bits → ≥1 identical chunk), bucket-join,
    then exact 128-bit hamming as the sum of per-chunk xor+bit_count.

    Replaces the 64-bit/4×16 layout (kept as simhash_near_pairs64, the
    probe contrast series): same plan shape — chunk explode, shuffle
    hash join on (chunk_idx, chunk_val), distinct, verify — but random
    bucket collisions drop from 4n²/2¹⁶ to 4n²/2³², so the candidate
    volume tracks the true near-dup density instead of a quadratic
    junk floor (see simhash128's docstring for the scale arithmetic).
    """
    from pyspark import StorageLevel

    # Persist the signature frame: the two self-join sides would each
    # re-run the full tokenize+md5+64-sum aggregation otherwise (no
    # ReusedExchange fires across the join sides — same finding as
    # similarity.banded_cosine_dup_pairs' skinny persist). 5 narrow
    # columns per doc, CacheManager-tracked and plan-reachable per the
    # operators/__init__ cache contract.
    sig = simhash128(df, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    chunks = sig.select(
        "doc",
        "c0",
        "c1",
        "c2",
        "c3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.col(f"c{i}").alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc", "c0", "c1", "c2", "c3", "c.chunk_idx", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    # Hamming is a pure function of the pair, so the verify filter
    # commutes with the pair-dedup: evaluate the xor+bit_count AT the
    # join (the chunk columns are already on both sides) and filter
    # BEFORE the distinct. The dedup exchange then carries only the
    # surviving near-dup pairs as 3 narrow columns instead of every
    # bucket collision as 10 (pair ids + 8 signature chunks) — up to 4
    # collision rows per true pair collapse after, not before, the
    # cheap filter.
    ham = (
        F.bit_count(F.col("a.c0").bitwiseXOR(F.col("b.c0")))
        + F.bit_count(F.col("a.c1").bitwiseXOR(F.col("b.c1")))
        + F.bit_count(F.col("a.c2").bitwiseXOR(F.col("b.c2")))
        + F.bit_count(F.col("a.c3").bitwiseXOR(F.col("b.c3")))
    )
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs64(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """FIXED-WIDTH CONTRAST series (pre-round-7 layout): 63-bit SimHash
    banded into 4×16-bit chunks. Kept so the scale probe can measure
    the constant-divisor quadratic this layout carries (junk candidates
    ≈ 4n²/65536) against simhash_near_pairs' 4×32 replacement — NOT for
    production use."""
    sig = simhash64(df, text_col, id_col)
    chunks = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        (F.shiftright(F.col("simhash"), i * 16) % (1 << 16)).alias(
                            "chunk_val"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc", "simhash", "c.chunk_idx", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_tokens: int = 8,
) -> DataFrame:
    """Corpus-level repeated-span suppression — the span-removal analog
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): break each document into DISJOINT ``span_tokens``-
    token spans, keep only the globally FIRST occurrence of each
    distinct span (first = smallest (doc, span_idx) position), and
    report per-document survival → (id, n_spans, n_kept,
    n_tokens_kept).

    Unlike document-level dedup, this removes boilerplate that repeats
    INSIDE otherwise-unique documents (headers, license blocks,
    navigation chrome) — the paper found ~1% of tokens in C4 are
    exact repeated spans.

    Scale shape: spans are a zero-shuffle projection (packing.
    chunk_documents with stride = window); first-occurrence resolution
    is a min WINDOW over the one exchange on the span hash (r11 — the
    previous groupBy(h)+join-back paid an aggregate pass plus a join on
    the same exchange, and its join funneled hot-h rows to one
    partition just the same); the per-doc rollup is the only other
    exchange. Position keys pack (doc_id, span_idx) into one bigint
    (span_idx < 2^20 ⇒ docs to 2^43) so min() needs no struct
    ordering.
    """
    from cqdg_etl_spark.operators.packing import chunk_documents

    from pyspark.sql import Window as W

    spans = chunk_documents(
        df, text_col, id_col, window=span_tokens, stride=span_tokens
    )
    # First-occurrence via a min window over ONE exchange on the span
    # hash (r11, the ppjoin_pairs df-window finding): the previous
    # groupBy(h) + join-back cost the aggregate pass plus the join on
    # top of the same h exchange — measured 0.60 -> 0.47 s at sf0.1,
    # identical rows. Skew note: the join-back form funneled every hot-h
    # row to one partition for the join anyway (tiny first_key rows
    # split no better), so the window loses nothing a degenerate span
    # key had not already cost.
    keyed = spans.select(
        F.col(id_col).alias("doc"),
        "n_tokens",
        F.md5("chunk_text").alias("h"),
        (F.col(id_col).cast("long") * F.lit(1 << 20) + F.col("chunk_idx"))
        .alias("pos_key"),
    ).repartition("h")
    flagged = keyed.withColumn(
        "first_key", F.min("pos_key").over(W.partitionBy("h"))
    ).withColumn("kept", F.col("pos_key") == F.col("first_key"))
    return flagged.groupBy("doc").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("kept"), F.col("n_tokens")).otherwise(F.lit(0))
        ).alias("n_tokens_kept"),
    ).select(
        F.col("doc").alias(id_col), "n_spans", "n_kept", "n_tokens_kept"
    )


def fuzzy_self_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy record linkage: pairs of rows whose ``key_col`` strings
    are within Levenshtein distance ``max_dist`` — via SymSpell-style
    DELETION-NEIGHBORHOOD blocking (Garbe's symmetric delete): each
    string is indexed under itself plus every single-character
    deletion; two strings within edit distance 1 (one substitution,
    insertion, or deletion) always share at least one index key, so
    recall is EXACT for max_dist=1 — not a heuristic block. Candidates
    are then verified with the real ``levenshtein`` (a guard, and what
    bounds false positives from shared deletes).

    Only max_dist=1 is supported: the k-deletion neighborhood for k≥2
    grows O(len^k) keys per string; at that point the right tool is
    the q-gram count filter, and the verify step stays the same.

    Scale shape — two guards the naive version lacks:

    1. The inverted index is built over DISTINCT strings only (one
       representative per exact value). A c-sized identical-string
       cluster would otherwise put all c ids under every one of its
       len(s)+1 delete keys and the bucket join would grind through
       (len+1)·c² index pairs; on distinct strings the index cost is
       independent of duplication, and identical-string pairs come
       from a direct self-join on the string key whose output is
       exactly the answer (c² pairs ARE the result, not overhead).
    2. Candidate string pairs are distinct-ed BEFORE the levenshtein
       verify, and verified string pairs expand to id pairs via two
       joins on the string key — again output-sized.

    Like the banded near-dup family: skinny index, equi-joins only,
    never a cartesian.
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking supports max_dist=1")
    base = df.select(F.col(id_col).alias("fid"), F.col(key_col).alias("s"))
    # identical strings: every pair, distance 0 — direct group self-join
    xa, xb = base.alias("xa"), base.alias("xb")
    same = (
        xa.join(
            xb,
            (F.col("xa.s") == F.col("xb.s"))
            & (F.col("xa.fid") < F.col("xb.fid")),
        )
        .select(
            F.col("xa.fid").alias("id_a"),
            F.col("xb.fid").alias("id_b"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    # distinct-string representatives carry the index. The distinct
    # output is tiny in bytes, so AQE coalesces its shuffle to one or
    # two partitions — and the delete-key explode, the index self-join
    # probe and the levenshtein verify would all inherit that
    # parallelism (measured: 24 s at sf0.1 with the whole verify on
    # 1-2 cores). spread_to_parallelism pins the post-distinct stage
    # to the session's shuffle width (explicit-N repartition, which
    # AQE never coalesces); at real scale the knob is a no-op.
    from cqdg_etl_spark.operators.spread import spread_to_parallelism

    strings = spread_to_parallelism(base.select("s").distinct())
    idx = strings.select(
        "s",
        F.explode(
            F.expr(
                "array_append(transform(sequence(1, length(s)), "
                "i -> concat(substring(s, 1, i-1), "
                "substring(s, i+1, length(s)))), s)"
            )
        ).alias("v"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.s") < F.col("b.s")),
        )
        .select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .distinct()
    )
    # Verify with ONE levenshtein call per pair: sa < sb guarantees
    # sa != sb, so dist >= 1 always and the [1, max_dist] range
    # collapses to equality with max_dist (= 1, enforced above). The
    # range form compiled to TWO levenshtein evaluations per candidate
    # (the pushed-down filter re-expands the aliased column per
    # conjunct), doubling the verify stage.
    near_strings = cand.filter(
        F.levenshtein("sa", "sb") == max_dist
    ).select("sa", "sb", F.lit(max_dist).cast("int").alias("dist"))
    ga = base.select(F.col("fid").alias("ia"), F.col("s").alias("sa"))
    gb = base.select(F.col("fid").alias("ib"), F.col("s").alias("sb"))
    cross = (
        near_strings.join(ga, "sa")
        .join(gb, "sb")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
    return same.unionByName(cross)


def ppjoin_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    t_num: int = 4,
    t_den: int = 5,
    shingle_n: int = 3,
) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs (PPJoin family, Xiao et al.
    WWW'08): pairs with Jaccard ≥ t_num/t_den, exact — but candidates
    come from a PREFIX of each doc's features, not the full inverted
    index.

    Prefix-filter theorem: order every doc's feature set by ONE global
    order (here (df, h) ascending — rarest first, the canonical
    choice); two sets with Jaccard ≥ t MUST share a feature within
    each one's first |d| − ⌈t·|d|⌉ + 1 features. So only prefixes are
    indexed and self-joined — and because prefixes are the RARE
    features, hot-feature posting lists vanish from candidate
    generation entirely (the role max_df plays in ngram_jaccard_pairs,
    but lossless: no pair above threshold can be missed).

    The threshold is a RATIONAL (t_num/t_den): the prefix length uses
    exact integer arithmetic ⌈t·L⌉ = (t_num·L + t_den − 1) div t_den —
    a float ⌈0.8·5⌉ evaluates to 5 in IEEE (0.8·5 rounds to
    4.000000000000000222), silently shortening the prefix below the
    theorem's bound.

    Scale shape: per-doc feature ordering is a bounded-size
    collect+array_sort keyed by doc (map-side combined); the order key
    packs (df, h) into one bigint (df·2³² + h) so sorting and the
    candidate equi-join stay on 8-byte keys; verification reuses the
    persisted distinct-hash sets exactly like minhash_verified_pairs.

    All three PPJoin filters run as integer-exact residual predicates
    inside the prefix equi-join, before the distinct and the set
    verification:
    - length:     J ≥ t ⇒ t·|a| ≤ |b| and t·|b| ≤ |a| (cross-multiplied
                  by t_den so no division).
    - positional: a match at 0-based prefix positions (i, j) bounds the
                  overlap by 1 + min(|a|−i−1, |b|−j−1); a true pair
                  needs overlap ≥ α = ⌈t/(1+t)·(|a|+|b|)⌉. Lossless
                  under any-token-passes semantics: for a pair with
                  J ≥ t the FIRST shared ordered feature (which is in
                  both prefixes by the theorem) satisfies the bound, so
                  the pair survives the exists-style distinct even if
                  later shared features fail it.
    """
    from pyspark import StorageLevel

    t = t_num / t_den
    sets = shingle_hash_sets(df, text_col, id_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Document frequency via a count window over ONE exchange on h —
    # not a groupBy(h) aggregate joined back, which costs a second
    # h-keyed exchange plus the join itself (the _shingle_overlap_stats
    # window finding, r11: measured ~25% off the order+prefix stage at
    # sf0.1). (doc, h) is distinct by construction (hs is
    # array_distinct), so the partition row count IS df.
    idx = sets.select("doc", F.explode("hs").alias("h")).repartition("h")
    okey = (
        F.count("*").over(W.partitionBy("h")) * F.lit(1 << 32) + F.col("h")
    ).alias("okey")
    ordd = (
        idx.select("doc", okey)
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list("okey")).alias("ks"))
        .withColumn("sz", F.size("ks"))
        .withColumn(
            "plen",
            F.greatest(
                F.col("sz")
                # widen before the product — int32 wraps at sz ~ 2³¹/t_num
                - F.expr(
                    f"CAST((CAST(sz AS BIGINT) * {t_num} + {t_den - 1})"
                    f" DIV {t_den} AS INT)"
                )
                + 1,
                F.lit(1),
            ),
        )
    )
    pref = ordd.select(
        "doc",
        "sz",
        F.posexplode(F.expr("slice(ks, 1, plen)")).alias("pos", "okey"),
    )
    a = pref.alias("a").hint("shuffle_hash")
    b = pref.alias("b").hint("shuffle_hash")
    # α = ⌈t·(|a|+|b|)/(1+t)⌉ with t = t_num/t_den — all-integer, in
    # LONG arithmetic: sz is an int32 (F.size), and an int32 product
    # like (sz_a + sz_b)·t_num silently wraps for giant shingle sets;
    # widen BEFORE multiplying, and use DIV (not double '/' + floor).
    sza = F.col("a.sz").cast("long")
    szb = F.col("b.sz").cast("long")
    alpha = F.expr(
        f"((CAST(a.sz AS BIGINT) + b.sz) * {t_num} + {t_num + t_den - 1})"
        f" DIV {t_num + t_den}"
    )
    ubound = F.lit(1).cast("long") + F.least(
        sza - F.col("a.pos") - 1,
        szb - F.col("b.pos") - 1,
    )
    cand = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.doc") < F.col("b.doc"))
            # length filter (long products — same overflow reasoning)
            & (sza * t_num <= szb * t_den)
            & (szb * t_num <= sza * t_den)
            # positional filter
            & (ubound >= alpha),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def soft_dedup_weights(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Soft deduplication: instead of DROPPING exact duplicates, weight
    every document by 1/|duplicate cluster| so a corpus sampler sees
    each distinct text with total mass 1 — (id, fingerprint, cluster_n,
    weight). The duplicate-aware sampling-weight scheme used when
    duplicates carry signal (popularity) that hard dedup would erase.

    ONE shuffle: the md5(normalized-text) fingerprint partitions a
    count window; no join, no second scan. Composes with
    ``ds_mixture_weighted_sample``-style samplers as the per-row base
    weight.
    """
    fp = F.md5(normalize_ws(F.col(text_col)))
    w = W.partitionBy("fingerprint")
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .withColumn("cluster_n", F.count(F.lit(1)).over(w))
        .select(
            id_col,
            "fingerprint",
            "cluster_n",
            F.round(F.lit(1.0) / F.col("cluster_n").cast("double"), 6).alias(
                "weight"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT: C(A,B) = |A∩B| /
    min(|A|,|B|) ≥ threshold — the asymmetric overlap measure that
    catches a document embedded inside a larger one (quotation,
    boilerplate wrapping, page-of-pages), which Jaccard structurally
    misses: a 100-shingle doc fully contained in a 10,000-shingle doc
    has J ≈ 0.01 but C = 1.0.

    Same scale shape as ngram_jaccard_pairs — both finish the shared
    _shingle_overlap_stats candidate frame; only the measure differs.
    """
    stats = _shingle_overlap_stats(df, text_col, id_col, n, max_df)
    return (
        stats.withColumn(
            "containment",
            F.col("n_inter") / F.least(F.col("size_a"), F.col("size_b")),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "doc_a", "doc_b", F.round("containment", 6).alias("containment")
        )
    )


def prefix_truncation_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 12,
) -> DataFrame:
    """Truncation duplicates: pairs (A, B) where A's full token
    sequence is exactly the first ``len(A)`` tokens of B — the page
    cut off mid-crawl, the snippet/teaser of a full article, the
    retry that fetched more of the same document. Jaccard-style
    shingle overlap scores these pairs LOW when the length gap is
    large (a 20-token truncation of a 2000-token page shares ~1% of
    shingles), and containment_pairs needs the shingle threshold to
    clear; the prefix relation is exact and catches them at any gap.

    Blocking: documents sharing the md5 of their first ``k``
    normalized tokens are candidates (documents with fewer than ``k``
    tokens are out of contract — too short to assert truncation
    rather than coincidence). Verify: md5 of B's first len(A) tokens
    equals md5 of A's full token string — so the join carries A as
    TWO 32-char hashes, never its token array; only B's token array
    rides the shuffle, and only once.

    Scale shape: one equi-join on the prefix hash (shuffle hash
    join). A hot block is shared BOILERPLATE OPENING text (crawler
    interstitials, licence headers); pairs within it are real
    candidate output, so the quadratic there is output-inherent, not
    plan waste — the same contract as ngram_jaccard's max_df-capped
    postings, with the block key 12 tokens deep to keep ordinary
    openings apart.
    """
    from cqdg_etl_spark.functions.text import tokens

    base = (
        df.select(
            F.col(id_col).alias("doc"),
            tokens(normalize_ws(F.col(text_col))).alias("tk"),
        )
        .withColumn("n_toks", F.size("tk").cast("long"))
        .filter(F.col("n_toks") >= k)
        .withColumn("pfx", F.md5(F.concat_ws(" ", F.slice("tk", 1, k))))
    )
    a = base.select(
        F.col("doc").alias("doc_a"),
        F.col("n_toks").alias("len_a"),
        F.md5(F.concat_ws(" ", F.col("tk"))).alias("_full_a"),
        "pfx",
    )
    b = base.select(
        F.col("doc").alias("doc_b"),
        F.col("n_toks").alias("len_b"),
        F.col("tk").alias("_tk_b"),
        "pfx",
    )
    return (
        a.join(b, "pfx")
        .filter(F.col("len_a") < F.col("len_b"))
        .filter(
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("_tk_b"), F.lit(1), F.col("len_a"))
                )
            )
            == F.col("_full_a")
        )
        .select("doc_a", "doc_b", "len_a", "len_b")
    )
