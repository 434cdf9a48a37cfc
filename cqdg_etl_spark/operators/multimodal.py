"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode libraries (PIL/librosa/av) are NOT in this environment.
As of round 4 every kernel with a stdlib-parseable format is REAL:
``decode='real'`` decodes/re-encodes baseline PNGs through
``operators/png_codec.py`` (full filter set, grey/RGB/RGBA), demuxes
Motion-JPEG streams frame-by-frame via structural T.81 marker parsing
(``split_mjpeg_frames``), and ``extract_audio_features`` parses
RIFF/WAVE PCM through ``operators/wav_codec.py`` (integer-exact
duration/peak/RMS/zero-crossing stats), and (round 5) demuxes MP4
containers through the ISO-BMFF sample tables
(``operators/mp4_codec.py`` — structural box walk + stsc/stco/stsz
offset resolution slicing the real access units out of mdat). The
``decode='fake'`` path remains the default for the oracle-checked
registry queries because a DuckDB oracle cannot inflate zlib — fake
payloads are md5-derived and portable across engines. The only
remaining stand-in is bitstream DECODE of the extracted h264/AAC
samples (genuinely requires codec libraries this environment lacks).
Everything Spark-side — schema, partition sizing, mapInPandas batch
shape, metadata propagation — is identical between fake and real
paths.

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

# Heavy per-row Python decode over a small parquet input otherwise runs
# on ONE core (single unsplittable scan partition) — spread each
# mapInPandas input across the session parallelism (r11; guide §2.5).
from cqdg_etl_spark.operators.spread import spread_to_parallelism as _spread

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
    """Deterministic 'decoded feature': md5-chain over the payload's HEX
    encoding, expanded to dim floats in [0, 1). Placeholder for a real
    decode+embed kernel. Chaining on the hex string (not the raw bytes)
    keeps the kernel reproducible by engines whose md5 only accepts
    text (the DuckDB oracle) — same determinism, portable everywhere."""
    out: list[float] = []
    h = payload.hex()
    while len(out) < dim:
        h = hashlib.md5(h.encode("ascii")).hexdigest()
        out.extend(b / 255.0 for b in bytes.fromhex(h))
    return out[:dim]


def _png_features(payload: bytes, dim: int) -> list[float]:
    """REAL image features from a decoded PNG: [w/256, h/256, mean
    sample, per-channel means..., 16-bin sample histogram fractions],
    truncated/zero-padded to ``dim``. All stats are integer-sum /
    count divisions — deterministic regardless of pixel iteration
    order or platform."""
    from cqdg_etl_spark.operators.png_codec import _CHANNELS, decode_png

    w, h, color_type, rows = decode_png(payload)
    channels = _CHANNELS[color_type]
    n = w * h
    ch_sums = [0] * channels
    hist = [0] * 16
    total = 0
    for row in rows:
        for i, s in enumerate(row):
            ch_sums[i % channels] += s
            hist[s >> 4] += 1
            total += s
    n_samples = n * channels
    out = [w / 256.0, h / 256.0, total / (n_samples * 255.0)]
    out.extend(s / (n * 255.0) for s in ch_sums)
    out.extend(c / n_samples for c in hist)
    return (out + [0.0] * dim)[:dim]


def extract_media_features(
    df: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    ``decode='real'`` runs the stdlib PNG decoder
    (operators/png_codec.py) and emits deterministic pixel statistics;
    payloads that are not baseline PNGs make the task fail loudly
    (ValueError) rather than silently degrade. ``decode='fake'`` is the
    engine-portable md5 kernel the oracle-checked registry query uses.
    """
    if decode == "real":
        kernel = lambda b: _png_features(bytes(b), dim)  # noqa: E731
    else:
        kernel = lambda b: _fake_decode(bytes(b), dim)  # noqa: E731

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["media_bytes"].map(len).astype("int32"),
                    "feature": pdf["media_bytes"].map(kernel),
                }
            )

    return _spread(df.select("doc_id", "media_bytes")).mapInPandas(
        batches, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = "doc_id bigint, width int, height int, media_bytes binary"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"
AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, duration_ms bigint, "
    "peak int, rms double, zero_crossings bigint"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over a WAV binary column
    (operators/wav_codec.py — stdlib RIFF/PCM parse): per clip the
    sample rate, channel count, exact integer duration, peak
    amplitude, RMS (sqrt of an integer sum of squares — deterministic)
    and channel-0 zero-crossing count. Non-WAV payloads fail the task
    loudly (ValueError). Zero-shuffle mapInPandas pass; payload column
    pruned immediately after the kernel."""
    import math

    from cqdg_etl_spark.operators.wav_codec import audio_stats, decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                rate, ch, _bits, samples = decode_wav(bytes(payload))
                st = audio_stats(samples, ch, rate)
                n = max(st["n_frames"], 1)
                rows.append(
                    (
                        doc_id,
                        rate,
                        ch,
                        st["duration_ms"],
                        st["peak"],
                        round(math.sqrt(st["sumsq"] / n), 6),
                        st["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "duration_ms",
                    "peak",
                    "rms",
                    "zero_crossings",
                ],
            )

    return _spread(df.select("doc_id", "media_bytes")).mapInPandas(
        batches, AUDIO_SCHEMA
    )


def resize_media(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """mapInPandas resize. ``decode='real'``: stdlib PNG decode →
    nearest-neighbor resample (integer index math, platform-exact) →
    PNG re-encode (filter 0 — deterministic output bytes). The fake
    kernel re-derives an md5 payload keyed by (original bytes, target
    size) so downstream schema/partitioning is exercised identically."""
    if decode == "real":
        from cqdg_etl_spark.operators.png_codec import (
            _CHANNELS,
            decode_png,
            encode_png,
            resize_nearest,
        )

        def kernel(b: bytes) -> bytes:
            w, h, color_type, rows = decode_png(bytes(b))
            resized = resize_nearest(
                rows, w, h, _CHANNELS[color_type], width, height
            )
            return encode_png(resized, width, height, color_type)

    else:
        kernel = lambda b: hashlib.md5(  # noqa: E731
            bytes(b) + f"{width}x{height}".encode()
        ).digest()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "media_bytes": pdf["media_bytes"].map(kernel),
                }
            )

    return _spread(df.select("doc_id", "media_bytes")).mapInPandas(
        batches, RESIZED_SCHEMA
    )


def split_mjpeg_frames(data: bytes) -> list[bytes]:
    """Split a Motion-JPEG stream (concatenated baseline JPEGs — the
    payload format MJPEG-AVI/ MJPEG-over-HTTP carry) into its frame
    byte ranges by STRUCTURAL marker parsing, stdlib-only.

    A naive search for FFD9 is wrong: 0xFFD9 can occur inside
    entropy-coded scan data. The correct walk (ITU T.81 §B): fixed
    markers carry a 2-byte length to skip; after SOS the entropy
    stream is scanned byte-wise where FF00 is a stuffed data byte and
    FFD0-FFD7 are restart markers (both stay inside the scan), and any
    other FFxx marker ends the scan — FFD9 (EOI) ends the frame.
    Raises ValueError on streams that do not start at an SOI or end
    mid-frame."""
    frames = []
    i = 0
    n = len(data)
    while i < n:
        if data[i : i + 2] != b"\xff\xd8":
            raise ValueError(f"expected SOI at byte {i}")
        start = i
        i += 2
        while True:
            if i + 2 > n:
                raise ValueError("truncated frame (no EOI)")
            if data[i] != 0xFF:
                raise ValueError(f"expected marker at byte {i}")
            marker = data[i + 1]
            if marker == 0xD9:  # EOI
                i += 2
                frames.append(data[start:i])
                break
            if marker == 0xDA:  # SOS: skip header, then entropy scan
                seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
                i += 2 + seg_len
                while True:
                    if i + 1 >= n:
                        raise ValueError("truncated entropy stream")
                    if data[i] != 0xFF:
                        i += 1
                    elif data[i + 1] == 0x00 or 0xD0 <= data[i + 1] <= 0xD7:
                        i += 2  # stuffed byte / restart marker
                    else:
                        break  # a real marker ends the scan
            elif marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
            else:
                seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
                i += 2 + seg_len
    return frames


def sample_frames(
    df: DataFrame, every_nth: int = 8, max_frames: int = 4, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (doc_id, frame_idx, frame_bytes) — the UNNEST shape a real
    container demuxer produces.

    ``decode='real'`` REALLY demuxes, sniffing the container: an MP4
    payload (ftyp signature) goes through the ISO-BMFF sample tables
    (``operators/mp4_codec.py`` — stsc/stco/stsz resolution slices the
    actual compressed access units out of mdat); anything else is
    parsed as a Motion-JPEG stream (``split_mjpeg_frames``, structural
    T.81 marker walk). Both are stdlib-only. Every ``every_nth``-th
    sample/frame's actual bytes are emitted, up to ``max_frames``.
    Only bitstream DECODE of the extracted h264/AAC samples would need
    a codec library this environment lacks; the fake kernel remains
    for oracle-checked queries (md5-derived, engine-portable)."""
    if decode == "real":
        from cqdg_etl_spark.operators.mp4_codec import (
            extract_samples,
            is_mp4,
        )

        def emit(doc_id, raw: bytes):
            frames = (
                extract_samples(raw) if is_mp4(raw)
                else split_mjpeg_frames(raw)
            )
            for fi in range(0, len(frames), every_nth)[:max_frames]:
                yield doc_id, fi, frames[fi]

    else:

        def emit(doc_id, raw: bytes):
            n_frames = max(1, len(raw) // 16)
            for fi in range(0, n_frames, every_nth)[:max_frames]:
                yield doc_id, fi, hashlib.md5(
                    raw + fi.to_bytes(4, "big")
                ).digest()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                for d, fi, fb in emit(doc_id, bytes(payload)):
                    ids.append(d)
                    idxs.append(fi)
                    frames.append(fb)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return _spread(df.select("doc_id", "media_bytes")).mapInPandas(
        batches, FRAME_SCHEMA
    )


# --- real header parsing (no decode library required) -----------------

PNG_SIGNATURE_HEX = "89504E470D0A1A0A"


def synth_png(width: "F.Column", height: "F.Column") -> "F.Column":
    """A valid PNG signature + IHDR chunk with the given dimensions
    (binary-typed column). The pixel data is absent — this is the
    header a metadata pass actually reads."""
    be4 = lambda c: F.unhex(F.lpad(F.hex(c.cast("int")), 8, "0"))  # noqa: E731
    return F.concat(
        F.unhex(F.lit(PNG_SIGNATURE_HEX)),
        F.unhex(F.lit("0000000D")),          # IHDR length = 13
        F.unhex(F.lit("49484452")),          # "IHDR"
        be4(width),
        be4(height),
        F.unhex(F.lit("0806000000")),        # bit depth 8, RGBA, ...
    )


def png_dimensions(bin_col: "F.Column") -> "F.Column":
    """Parse (width, height, bit_depth, color_type) from a PNG header
    with pure JVM expressions — hex/substring/conv, no Python, no
    decode library. Returns a struct; null if the signature is absent.

    Byte layout (1-based for substring): 1-8 signature, 9-12 IHDR
    length, 13-16 'IHDR', 17-20 width (BE), 21-24 height (BE),
    25 bit depth, 26 color type.
    """
    be_int = lambda start, n: F.conv(  # noqa: E731
        F.hex(F.substring(bin_col, start, n)), 16, 10
    ).cast("int")
    is_png = F.hex(F.substring(bin_col, 1, 8)) == PNG_SIGNATURE_HEX
    return F.when(
        is_png,
        F.struct(
            be_int(17, 4).alias("width"),
            be_int(21, 4).alias("height"),
            be_int(25, 1).alias("bit_depth"),
            be_int(26, 1).alias("color_type"),
        ),
    )


JPEG_DIMS_SCHEMA = "doc_id bigint, width int, height int"


def jpeg_dimensions(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """JPEG dimensions by scanning SOF0/SOF2 markers — stdlib-only byte
    walking (REAL parsing, not a stub), Arrow-batched via mapInPandas
    because marker scanning is genuinely iterative per row."""

    def _parse(b: bytes) -> tuple[int | None, int | None]:
        if len(b) < 4 or b[0:2] != b"\xff\xd8":
            return None, None
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None, None
            marker = b[i + 1]
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC2):  # SOF0 / SOF2
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return w, h
            i += 2 + seg_len
        return None, None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf[bin_col].map(_parse)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": parsed.map(lambda t: t[0]).astype("Int32"),
                    "height": parsed.map(lambda t: t[1]).astype("Int32"),
                }
            )

    return _spread(df.select(id_col, bin_col)).mapInPandas(
        batches, JPEG_DIMS_SCHEMA
    )


def synth_jpeg_header(width: int, height: int) -> bytes:
    """Python-side synth of a minimal JPEG prefix (SOI + APP0 + SOF0)
    for roundtrip tests."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def synth_jpeg_frame(width: int, height: int, entropy: bytes) -> bytes:
    """A structurally complete JPEG frame (… + SOS + byte-stuffed
    entropy data + EOI) for MJPEG demux tests. Every 0xFF in
    ``entropy`` is stuffed to FF00 per T.81, so adversarial payloads
    (including literal FFD9 sequences) cannot end the scan early."""
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x00\x00"
    stuffed = entropy.replace(b"\xff", b"\xff\x00")
    return synth_jpeg_header(width, height) + sos + stuffed + b"\xff\xd9"
