"""Tests for the stdlib-only WAV codec (operators/wav_codec.py) and
the real audio feature path — completes the multimodal real-kernel set
(PNG images, MJPEG video, PCM audio)."""

from __future__ import annotations

import pytest

from cqdg_etl_spark.operators.wav_codec import (
    audio_stats,
    decode_wav,
    encode_wav,
    resample_nearest,
)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("n_channels", [1, 2])
def test_wav_roundtrip(bits, n_channels):
    if bits == 16:
        samples = [(-1) ** i * (i * 321 % 30000) for i in range(64)]
    else:
        samples = [(i * 37) % 256 for i in range(64)]
    wav = encode_wav(samples, 8000, n_channels, bits)
    assert decode_wav(wav) == (8000, n_channels, bits, samples)


def test_wav_rejects_bad_input():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\n not audio")
    wav = encode_wav([0, 1, 2, 3], 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-2])
    # flip the PCM format tag -> unsupported encoding
    bad = bytearray(wav)
    bad[20] = 3  # IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(bad))


def test_resample_nearest_frame_math():
    # stereo: frames must stay interleaved pairs
    samples = [10, -10, 20, -20, 30, -30, 40, -40]  # 4 frames
    out = resample_nearest(samples, 2, rate_in=4, rate_out=2)
    assert out == [10, -10, 30, -30]  # every other frame
    up = resample_nearest(samples, 2, rate_in=4, rate_out=8)
    assert up[:4] == [10, -10, 10, -10]  # zero-order hold


def test_audio_stats_hand_computed():
    # square wave: +100, -100 alternating, 8 frames @ 1000 Hz
    samples = [100, -100] * 4
    st = audio_stats(samples, 1, 1000)
    assert st["n_frames"] == 8
    assert st["duration_ms"] == 8
    assert st["peak"] == 100
    assert st["sumsq"] == 8 * 100 * 100
    assert st["zero_crossings"] == 7  # every adjacent pair flips


def test_extract_audio_features_spark(spark):
    from cqdg_etl_spark.operators.multimodal import extract_audio_features

    wav = encode_wav([100, -100] * 500, 8000, 1, 16)  # 1000 frames
    df = spark.createDataFrame(
        [(5, wav)], "doc_id long, media_bytes binary"
    )
    out = extract_audio_features(df).collect()[0]
    assert (out["sample_rate"], out["n_channels"]) == (8000, 1)
    assert out["duration_ms"] == 1000 * 1000 // 8000
    assert out["peak"] == 100 and out["rms"] == 100.0
    assert out["zero_crossings"] == 999
