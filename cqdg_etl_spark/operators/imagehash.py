"""Perceptual image hashing (dHash) over opaque media payloads —
the multimodal arm of the dedup family.

dHash (difference hash): decode to a tiny grey grid of ``ROWS`` ×
``COLS`` (8×9 here), emit one bit per horizontal neighbor pair —
bit = 1 iff px[r][c] < px[r][c+1] — giving a 64-bit signature whose
Hamming distance tracks visual similarity. Near-duplicate retrieval
is then the SimHash machinery: 4×16-bit pigeonhole chunks guarantee
any pair within Hamming ≤ 3 shares an exact chunk (d+1 blocks for
distance d), so candidates come from an equi-join, never all-pairs.

Decode reality: this container has no image codec libraries, so the
registry query uses the engine-portable FAKE decode — a deterministic
md5 chain over the payload's ascii hexdigest (the multimodal.py
``_fake_decode`` convention) yielding 72 pseudo-brightness bytes. The
Spark side computes the whole signature with JVM expressions (md5/
substring/conv/bitwise — zero Python, whole-stage codegen), and a
DuckDB oracle re-derives it bit-for-bit (CAST('0x'||hex AS BIGINT) ≡
Spark conv(hex,16,10)). ``dhash_from_grid`` takes a REAL pixel grid
(array<int>) for callers that decode with png_codec or a real
library — the signature/banding path is identical from there on.

Lives in a NEW module (not dedup.py / multimodal.py) on the hash-
stability discipline: published closures stay untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROWS = 8
COLS = 9  # 8 comparisons per row -> 64 bits
GRID_BYTES = ROWS * COLS  # 72
_CHUNKS = 4  # 4 x 16-bit pigeonhole chunks (Hamming <= 3 guarantee)
_CHAINS = (GRID_BYTES + 15) // 16  # md5 hexdigests needed (5)


def fake_grid_hex(text_norm: Column) -> Column:
    """Concatenated md5-chain hexdigests (engine-portable fake decode):
    h1 = md5(text), h_{k+1} = md5(h_k) over the ASCII hexdigest —
    ``_CHAINS`` × 32 hex chars; byte i of the grid is hex pair
    [2i, 2i+2). Chaining over hexdigests (not raw bytes) keeps the
    kernel reproducible by engines whose md5 takes strings."""
    h = F.md5(text_norm)
    parts = [h]
    for _ in range(_CHAINS - 1):
        h = F.md5(h)
        parts.append(h)
    return F.concat(*parts)


def _grid_byte(hex_col: Column, i: int) -> Column:
    """Pseudo-brightness byte i (0..GRID_BYTES-1) from the chain hex."""
    return F.conv(F.substring(hex_col, 2 * i + 1, 2), 16, 10).cast("int")


def dhash_chunks_from_hex(hex_col: Column) -> list[Column]:
    """The 4×16-bit dHash chunks as integer Columns, computed entirely
    with JVM expressions from the fake-decode chain hex. Bit layout:
    bit (r*8 + c) of the 64-bit signature compares px[r][c] with
    px[r][c+1]; chunk k holds bits [16k, 16k+16) with bit j of the
    chunk = signature bit 16k+j."""
    px = [_grid_byte(hex_col, i) for i in range(GRID_BYTES)]
    bits = []
    for r in range(ROWS):
        for c in range(COLS - 1):
            bits.append(
                F.when(px[r * COLS + c] < px[r * COLS + c + 1], 1).otherwise(0)
            )
    chunks = []
    for k in range(_CHUNKS):
        term = F.lit(0)
        for j in range(16):
            term = term + bits[16 * k + j] * F.lit(1 << j)
        chunks.append(term.cast("int"))
    return chunks


def dhash_from_grid(df: DataFrame, grid_col: str, id_col: str) -> DataFrame:
    """dHash chunks from a REAL pixel grid column (array<int>, length
    ≥ GRID_BYTES, row-major 8×9 grey values) — the path a real decoder
    (png_codec, PIL, ...) feeds. Same bit/chunk layout as the fake-hex
    path, so signatures from either decode interoperate."""
    g = F.col(grid_col)
    bits = []
    for r in range(ROWS):
        for c in range(COLS - 1):
            bits.append(
                F.when(
                    F.element_at(g, r * COLS + c + 1)
                    < F.element_at(g, r * COLS + c + 2),
                    1,
                ).otherwise(0)
            )
    cols = [F.col(id_col).alias("id")]
    for k in range(_CHUNKS):
        term = F.lit(0)
        for j in range(16):
            term = term + bits[16 * k + j] * F.lit(1 << j)
        cols.append(term.cast("int").alias(f"c{k}"))
    return df.select(*cols)


def dhash_near_pairs(
    sig: DataFrame, id_col: str = "id", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs among dHash signatures (columns c0..c3).

    Pigeonhole: two 64-bit signatures within Hamming ``max_hamming``
    (≤ 3) differ in at most 3 of the 4 chunks, so they AGREE exactly
    on ≥ 1 — candidates are the equi-join on (chunk_idx, chunk_val),
    never a cross join; junk candidates ≈ 4n²/2¹⁶ random collisions
    (the 64-bit SimHash analysis — route to wider signatures beyond
    ~10⁸ images). Verification is exact: sum of per-chunk
    bit_count(xor) ≤ max_hamming.
    """
    if max_hamming > _CHUNKS - 1:
        raise ValueError(
            f"pigeonhole with {_CHUNKS} chunks guarantees recall only "
            f"for hamming <= {_CHUNKS - 1}, got {max_hamming}"
        )
    chunk_cols = [f"c{k}" for k in range(_CHUNKS)]
    banded = sig.select(
        F.col(id_col).alias("id"),
        *chunk_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"c{k}").alias("v")
                    )
                    for k in range(_CHUNKS)
                ]
            )
        ).alias("band"),
    ).select("id", *chunk_cols, F.col("band.k").alias("k"), F.col("band.v").alias("v"))
    a = banded.alias("a")
    b = banded.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.c{k}").bitwiseXOR(F.col(f"b.c{k}")).cast("long")
        )
        for k in range(_CHUNKS)
    )
    return (
        a.join(b, ["k", "v"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
