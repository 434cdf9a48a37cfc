"""Pure-Python WAV (RIFF/WAVE PCM) codec — stdlib ``struct`` only.

Completes the multimodal real-kernel set (PNG images, MJPEG video,
now PCM audio): parse the RIFF chunk stream, read the fmt chunk
(PCM, 8-bit unsigned / 16-bit signed little-endian), and expose the
data chunk as interleaved integer samples. Original implementation
from the public RIFF/WAVE format description; no audio library exists
in this environment.

All derived statistics downstream use integer accumulation (sums of
samples / squares / sign changes), so features are deterministic
regardless of platform or iteration order.
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int],
    sample_rate: int,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Interleaved integer samples → a complete RIFF/WAVE PCM file.
    16-bit samples are signed (-32768..32767), 8-bit unsigned (0..255),
    per the format's historical convention."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes(samples)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if len(samples) % n_channels:
        raise ValueError("sample count not divisible by channel count")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """RIFF/WAVE PCM bytes → (sample_rate, n_channels, bits,
    interleaved samples). Raises ValueError on non-WAV input,
    non-PCM encodings, or unsupported bit depths."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    if bits == 16:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw[: len(raw) & ~1]))
    elif bits == 8:
        samples = list(raw)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return sample_rate, n_channels, bits, samples


def resample_nearest(
    samples: list[int], n_channels: int, rate_in: int, rate_out: int
) -> list[int]:
    """Nearest-sample (zero-order-hold) resampling of interleaved PCM —
    frame index src = floor(dst * rate_in / rate_out), pure integer
    math, deterministic everywhere. The audio analog of the image
    codec's nearest-neighbor resize; real DSP resampling (windowed
    sinc) belongs to a library this environment lacks, but the frame
    bookkeeping — the part a pipeline must get right — is exact."""
    n_frames = len(samples) // n_channels
    out_frames = n_frames * rate_out // rate_in
    out: list[int] = []
    for i in range(out_frames):
        src = i * rate_in // rate_out
        out.extend(samples[src * n_channels : (src + 1) * n_channels])
    return out


def audio_stats(samples: list[int], n_channels: int, sample_rate: int) -> dict:
    """Deterministic integer-accumulated statistics for feature
    extraction: frame count, duration in exact milliseconds, peak
    absolute amplitude, sum of squares (RMS numerator) and
    zero-crossing count of channel 0."""
    n_frames = len(samples) // n_channels
    ch0 = samples[::n_channels]
    sumsq = 0
    peak = 0
    crossings = 0
    prev_sign = 0
    for s in ch0:
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        sumsq += s * s
        sign = (s > 0) - (s < 0)
        if sign and prev_sign and sign != prev_sign:
            crossings += 1
        if sign:
            prev_sign = sign
    return {
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "peak": peak,
        "sumsq": sumsq,
        "zero_crossings": crossings,
    }
