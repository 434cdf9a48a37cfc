"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode libraries (PIL/librosa/av) are NOT in this environment, so the
decode kernels are stubbed: ``decode=fake`` produces a deterministic
md5-derived pixel/sample payload (stable across engines and runs) and
``decode=real`` raises NotImplementedError at the call site. Everything
Spark-side — schema, partition sizing, mapInPandas batch shape, metadata
propagation — is real and tested.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; `spark.sql.files.maxPartitionBytes` bounds per-task bytes, and
feature extraction is a mapInPandas pass (no shuffle) that prunes the
payload column as early as possible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, width int, height int"
)
FEATURE_SCHEMA = "doc_id bigint, byte_len int, feature array<float>"


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Derive a deterministic opaque binary column + metadata struct from
    the text column (stands in for a real image/audio payload)."""
    payload = F.unhex(F.repeat(F.md5(F.col(text_col)), 8))  # 128 bytes
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("media_bytes"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(payload).alias("byte_len"),
            (F.abs(F.hash(F.col(text_col))) % 64 + 1).alias("width"),
            (F.abs(F.hash(F.col(text_col), F.lit(1))) % 64 + 1).alias("height"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic 'decoded feature': md5-chain expanded to dim floats
    in [0, 1). Placeholder for a real decode+embed kernel."""
    out: list[float] = []
    h = payload
    while len(out) < dim:
        h = hashlib.md5(h).digest()
        out.extend(b / 255.0 for b in h)
    return out[:dim]


def extract_media_features(
    df: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    ``decode='real'`` is the integration point for an actual image/audio
    library — not available in this environment.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; use decode='fake' for the plumbing path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["media_bytes"].map(len).astype("int32"),
                    "feature": pdf["media_bytes"].map(
                        lambda b: _fake_decode(bytes(b), dim)
                    ),
                }
            )

    return df.select("doc_id", "media_bytes").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, media_bytes binary"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def resize_media(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """mapInPandas resize: the real kernel would decode → resample →
    re-encode; the fake kernel re-derives a deterministic payload keyed
    by (original bytes, target size) so downstream schema/partitioning
    is exercised for real."""
    if decode == "real":
        raise NotImplementedError(
            "real media resize requires image libraries not present "
            "in this environment; use decode='fake' for the plumbing path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "media_bytes": pdf["media_bytes"].map(
                        lambda b: hashlib.md5(
                            bytes(b) + f"{width}x{height}".encode()
                        ).digest()
                    ),
                }
            )

    return df.select("doc_id", "media_bytes").mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_nth: int = 8, max_frames: int = 4, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (doc_id, frame_idx, frame_bytes) — the UNNEST shape a real
    `av`-based kernel would produce; frame count derives from payload
    length so it is deterministic."""
    if decode == "real":
        raise NotImplementedError(
            "real frame sampling requires video libraries not present "
            "in this environment; use decode='fake' for the plumbing path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // 16)
                for fi in range(0, n_frames, every_nth)[:max_frames]:
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(
                        hashlib.md5(raw + fi.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.select("doc_id", "media_bytes").mapInPandas(batches, FRAME_SCHEMA)
