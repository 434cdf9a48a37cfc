"""operators/mp4_codec.py: ISO-BMFF structural codec — round trips,
table resolution, malformed-input behavior, and the Spark demux path."""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cqdg_etl_spark.operators.mp4_codec import (
    extract_samples,
    is_mp4,
    mp4_track_infos,
    synth_mp4,
    walk_boxes,
)


def _mk_samples(n, seed=0):
    return [
        hashlib.md5(f"{seed}-{i}".encode()).digest() * (1 + (i + seed) % 4)
        for i in range(n)
    ]


def test_roundtrip_basic():
    samples = _mk_samples(7)
    data = synth_mp4(samples, timescale=600, sample_delta=20,
                     samples_per_chunk=2)
    assert is_mp4(data)
    t = mp4_track_infos(data)[0]
    assert (t.handler, t.codec) == ("vide", "avc1")
    assert (t.timescale, t.duration) == (600, 140)
    assert t.n_samples == 7
    assert t.sample_deltas == [20] * 7
    assert (t.avc_profile, t.avc_level, t.n_sps, t.n_pps) == (66, 30, 1, 1)
    assert extract_samples(data) == samples


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 30),
    per_chunk=st.integers(1, 7),
    seed=st.integers(0, 5),
)
def test_roundtrip_property(n, per_chunk, seed):
    """Every chunking of every sample multiset demuxes byte-exactly."""
    samples = _mk_samples(n, seed)
    data = synth_mp4(samples, samples_per_chunk=per_chunk)
    assert extract_samples(data) == samples


def test_largesize_and_size_zero_boxes():
    """64-bit largesize (size==1) and to-end-of-enclosure (size==0)
    boxes both walk correctly."""
    payload = b"abcdef"
    large = (struct.pack(">I", 1) + b"skip"
             + struct.pack(">Q", 16 + len(payload)) + payload)
    tail = struct.pack(">I", 0) + b"rest" + b"xyz"
    boxes = list(walk_boxes(large + tail))
    assert [(f, e - b) for f, b, e, _ in boxes] == [
        (b"skip", len(payload)), (b"rest", 3),
    ]


def test_truncated_and_overflow_boxes_raise():
    with pytest.raises(ValueError):
        list(walk_boxes(b"\x00\x00\x00\x20shrt"))  # size 32, 8 bytes
    with pytest.raises(ValueError):
        list(walk_boxes(b"\x00\x00\x00\x04four"))  # size < header
    with pytest.raises(ValueError):
        list(walk_boxes(b"\x00\x00\x00"))  # truncated header


def test_sample_overflowing_file_raises():
    samples = [b"x" * 10]
    data = bytearray(synth_mp4(samples))
    # corrupt the single stsz ENTRY (fourcc + fullbox 4 + fixed 4 +
    # count 4) to claim a sample running past EOF
    i = data.find(b"stsz")
    struct.pack_into(">I", data, i + 16, 1 << 24)
    with pytest.raises(ValueError):
        extract_samples(bytes(data))


def test_corrupt_sample_count_raises_valueerror():
    """A corrupt stsz COUNT must surface as ValueError (loud demuxer
    contract), not a raw struct.error from reading past the buffer."""
    data = bytearray(synth_mp4([b"x" * 10]))
    i = data.find(b"stsz")
    struct.pack_into(">I", data, i + 12, 1 << 24)
    with pytest.raises(ValueError):
        extract_samples(bytes(data))


def test_is_mp4_sniff():
    assert not is_mp4(b"")
    assert not is_mp4(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # jpeg
    assert is_mp4(synth_mp4([b"s"]))


def test_spark_sample_frames_mp4_path(spark):
    """sample_frames(decode='real') sniffs MP4 payloads and emits the
    exact access-unit bytes from mdat at the sampling stride."""
    from cqdg_etl_spark.operators.multimodal import sample_frames

    rows = []
    for doc_id in range(4):
        samples = _mk_samples(10, seed=doc_id)
        rows.append((doc_id, bytearray(synth_mp4(samples))))
    df = spark.createDataFrame(rows, "doc_id long, media_bytes binary")
    out = sample_frames(df, every_nth=3, max_frames=3, decode="real")
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
           for r in out.collect()}
    assert len(got) == 4 * 3
    for doc_id in range(4):
        samples = _mk_samples(10, seed=doc_id)
        for fi in (0, 3, 6):
            assert got[(doc_id, fi)] == samples[fi]


def test_spark_sample_frames_mixed_containers(spark):
    """A column mixing MP4 and MJPEG payloads routes each row through
    the right demuxer in one pass."""
    from cqdg_etl_spark.operators.multimodal import (
        sample_frames,
        synth_jpeg_frame,
    )

    mp4_samples = _mk_samples(4, seed=9)
    jpegs = [synth_jpeg_frame(8, 8, f"e{i}".encode()) for i in range(4)]
    rows = [
        (1, bytearray(synth_mp4(mp4_samples))),
        (2, bytearray(b"".join(jpegs))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_bytes binary")
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
           for r in sample_frames(df, every_nth=2, max_frames=2,
                                  decode="real").collect()}
    assert got[(1, 0)] == mp4_samples[0] and got[(1, 2)] == mp4_samples[2]
    assert got[(2, 0)] == jpegs[0] and got[(2, 2)] == jpegs[2]
