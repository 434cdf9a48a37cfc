"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only) — closes
the multimodal decode stub with a REAL implementation for the image
sizes this pipeline synthesizes (thumbnails / test fixtures).

Scope: 8-bit greyscale (color type 0), RGB (2) and RGBA (6), no
interlacing, all five scanline filters (None/Sub/Up/Average/Paeth) on
both encode and decode — i.e. the full baseline still-image subset of
the PNG spec (RFC 2083 §6). Decode walks the chunk stream, inflates
the concatenated IDATs and un-filters row by row; rows are sequential
by spec (each filter may reference the prior row), so the kernel is a
per-row Python loop — appropriate for the tiny payloads a metadata /
feature pass handles per Arrow batch, and wrapped by mapInPandas so
corpus-scale parallelism comes from partitioning, not from the kernel.

This is an original implementation from the public PNG specification;
no decode library is present in this environment (the reason the
previous rounds stubbed it — see operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(
    ftype: int, row: bytes, prev: bytes, bpp: int
) -> bytes:
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return bytes(out)


def _unfilter_row(
    ftype: int, row: bytearray, prev: bytes, bpp: int
) -> bytearray:
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0  # already-reconstructed
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pass
        elif ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return row


def encode_png(
    rows: list[bytes],
    width: int,
    height: int,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Encode 8-bit pixel rows (each ``width * channels`` bytes) into a
    complete, spec-valid PNG. ``filter_type`` applies to every scanline
    (encoders may pick per-row; a constant keeps output deterministic)."""
    channels = _CHANNELS[color_type]
    bpp = channels
    if len(rows) != height or any(len(r) != width * channels for r in rows):
        raise ValueError("rows shape does not match width/height/color_type")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * channels)
    for r in rows:
        raw.append(filter_type)
        raw += _filter_row(filter_type, r, prev, bpp)
        prev = r
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode a baseline PNG → (width, height, color_type, pixel rows).
    Each row is ``width * channels`` bytes of reconstructed 8-bit
    samples. Raises ValueError on non-PNG input, unsupported formats
    (bit depth ≠ 8, palette, interlaced) or corrupt chunk structure."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"corrupt or missing IDAT: {ex}") from ex
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")
    rows: list[bytes] = []
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = _unfilter_row(
            ftype, bytearray(raw[off + 1 : off + 1 + stride]), prev, channels
        )
        prev = bytes(row)
        rows.append(prev)
    return width, height, color_type, rows


def resize_nearest(
    rows: list[bytes],
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> list[bytes]:
    """Nearest-neighbor resample of 8-bit pixel rows — the standard
    integer mapping src = floor(dst * src_dim / dst_dim), deterministic
    on every engine/platform (no float rounding in the index math)."""
    out = []
    for y in range(new_height):
        sy = y * height // new_height
        src = rows[sy]
        row = bytearray(new_width * channels)
        for x in range(new_width):
            sx = x * width // new_width
            row[x * channels : (x + 1) * channels] = src[
                sx * channels : (sx + 1) * channels
            ]
        out.append(bytes(row))
    return out
