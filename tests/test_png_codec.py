"""Tests for the stdlib-only PNG codec (operators/png_codec.py) and
the real-decode multimodal paths it unlocks — closes VERDICT r3 #8
(the last documented decode stub)."""

from __future__ import annotations

import pytest

from cqdg_etl_spark.operators.png_codec import (
    _CHANNELS,
    decode_png,
    encode_png,
    resize_nearest,
)


def _gradient(width: int, height: int, channels: int) -> list[bytes]:
    return [
        bytes(
            (x * 7 + y * 13 + c * 31) % 256
            for x in range(width)
            for c in range(channels)
        )
        for y in range(height)
    ]


@pytest.mark.parametrize("color_type", [0, 2, 6])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_and_color_types(color_type, filter_type):
    w, h = 9, 7  # odd sizes catch stride bugs
    rows = _gradient(w, h, _CHANNELS[color_type])
    png = encode_png(rows, w, h, color_type, filter_type)
    dw, dh, dct, drows = decode_png(png)
    assert (dw, dh, dct) == (w, h, color_type)
    assert drows == rows  # bit-exact pixel recovery


def test_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png at all")
    rows = _gradient(4, 4, 1)
    png = encode_png(rows, 4, 4, 0)
    with pytest.raises(ValueError):
        decode_png(png[:30])  # truncated mid-chunk
    # corrupt the IHDR interlace byte -> unsupported
    bad = bytearray(png)
    bad[8 + 4 + 4 + 12] = 1  # interlace flag inside IHDR body
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(bad))


def test_resize_nearest_hand_computed():
    # 2x2 checkerboard upscaled 2x: each source pixel becomes a 2x2 block
    rows = [bytes([0, 255]), bytes([255, 0])]
    out = resize_nearest(rows, 2, 2, 1, 4, 4)
    assert out[0] == bytes([0, 0, 255, 255])
    assert out[1] == bytes([0, 0, 255, 255])
    assert out[2] == bytes([255, 255, 0, 0])
    assert out[3] == bytes([255, 255, 0, 0])


def test_extract_media_features_real_decode(spark):
    from cqdg_etl_spark.operators.multimodal import extract_media_features

    rows = [bytes([10] * 4), bytes([30] * 4)]  # 4x2 grey, mean 20
    png = encode_png(rows, 4, 2, 0, filter_type=2)
    df = spark.createDataFrame(
        [(1, png)], "doc_id long, media_bytes binary"
    )
    out = extract_media_features(df, dim=8, decode="real").collect()[0]
    assert out["byte_len"] == len(png)
    f = out["feature"]
    assert abs(f[0] - 4 / 256) < 1e-7 and abs(f[1] - 2 / 256) < 1e-7
    assert abs(f[2] - 20 / 255) < 1e-6  # overall mean sample


def test_resize_media_real_roundtrips_as_png(spark):
    from cqdg_etl_spark.operators.multimodal import resize_media

    rows = _gradient(8, 8, 3)
    png = encode_png(rows, 8, 8, 2, filter_type=4)
    df = spark.createDataFrame(
        [(7, png)], "doc_id long, media_bytes binary"
    )
    out = resize_media(df, 4, 4, decode="real").collect()[0]
    dw, dh, dct, drows = decode_png(bytes(out["media_bytes"]))
    assert (dw, dh, dct) == (4, 4, 2)
    assert drows == resize_nearest(rows, 8, 8, 3, 4, 4)


def test_split_mjpeg_frames_structural_not_naive():
    """Frame splitting must survive a literal FFD9 inside entropy data
    (byte-stuffed per T.81) and restart markers — the cases a naive
    FFD9 search gets wrong."""
    from cqdg_etl_spark.operators.multimodal import (
        split_mjpeg_frames,
        synth_jpeg_frame,
    )

    adversarial = b"abc\xff\xd9def"  # raw FF bytes get stuffed
    f1 = synth_jpeg_frame(8, 6, adversarial)
    f2 = synth_jpeg_frame(4, 4, b"\xd0" * 5 + b"\xff" + b"tail")
    f3 = synth_jpeg_frame(2, 2, b"")
    frames = split_mjpeg_frames(f1 + f2 + f3)
    assert frames == [f1, f2, f3]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="SOI"):
        split_mjpeg_frames(b"junk" + f1)
    with _pytest.raises(ValueError, match="truncated"):
        split_mjpeg_frames(f1[:-1])


def test_sample_frames_real_demuxes_actual_bytes(spark):
    from cqdg_etl_spark.operators.multimodal import (
        sample_frames,
        synth_jpeg_frame,
    )

    frames = [synth_jpeg_frame(4, 4, bytes([i] * 8)) for i in range(10)]
    df = spark.createDataFrame(
        [(3, b"".join(frames))], "doc_id long, media_bytes binary"
    )
    out = sample_frames(df, every_nth=4, max_frames=3, decode="real").collect()
    assert [(r["doc_id"], r["frame_idx"]) for r in out] == [
        (3, 0), (3, 4), (3, 8)
    ]
    # real demux: the emitted bytes ARE the original frames
    assert [bytes(r["frame_bytes"]) for r in out] == [
        frames[0], frames[4], frames[8]
    ]


def test_png_roundtrip_property():
    """Property test: random pixel content round-trips bit-exactly
    through every (filter, color type) combination."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.data(),
        width=st.integers(1, 12),
        height=st.integers(1, 12),
        color_type=st.sampled_from([0, 2, 6]),
        filter_type=st.integers(0, 4),
    )
    def check(data, width, height, color_type, filter_type):
        ch = _CHANNELS[color_type]
        rows = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=width * ch,
                        max_size=width * ch,
                    )
                )
            )
            for _ in range(height)
        ]
        png = encode_png(rows, width, height, color_type, filter_type)
        assert decode_png(png) == (width, height, color_type, rows)

    check()
