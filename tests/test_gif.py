"""GIF codec: LZW round trips (incl. width growth, dictionary reset, the
KwKwK case), encode->decode pixel exactness, animation compositing
(disposal 0/1/2, transparency, sub-rectangle frames), interlacing,
header-only metadata, and the Spark-side gif_frames / decode_image /
transcode integration."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    decode_gif_frames_np,
    encode_gif,
    parse_gif_header,
)


def _pal_img(h, w, ncol, seed=0):
    """Image drawn from a small palette (GIF needs <=256 colors)."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.int64).astype(np.uint8)
    idx = rng.integers(0, ncol, size=(h, w))
    return pal[idx]


# ---------------------------------------------------------------- LZW


def test_lzw_roundtrip_small():
    for mcs in (2, 4, 8):
        data = np.array([0, 1, 0, 1, 2, 2, 2, 0, 1, 0, 1, 0, 1], dtype=np.int32)
        got = _lzw_decompress(_lzw_compress(data, mcs), mcs)
        assert np.array_equal(got, data)


def test_lzw_roundtrip_random_streams():
    rng = np.random.default_rng(7)
    for mcs, n in [(2, 1000), (4, 5000), (8, 20000)]:
        data = rng.integers(0, 1 << mcs, size=n).astype(np.int32)
        got = _lzw_decompress(_lzw_compress(data, mcs), mcs)
        assert np.array_equal(got, data), (mcs, n)


def test_lzw_dictionary_reset_exercised():
    """A long low-entropy stream pushes next_code past 4096, forcing the
    encoder's mid-stream clear; the decoder must resynchronize."""
    rng = np.random.default_rng(3)
    data = np.repeat(rng.integers(0, 4, size=6000), 3).astype(np.int32)
    assert len(data) == 18000
    got = _lzw_decompress(_lzw_compress(data, 2), 2)
    assert np.array_equal(got, data)


def test_lzw_kwkwk_case():
    # 'aaaa...' style runs hit the code==next_code branch immediately
    data = np.zeros(64, dtype=np.int32)
    got = _lzw_decompress(_lzw_compress(data, 2), 2)
    assert np.array_equal(got, data)


# ---------------------------------------------------------------- codec


def test_gif_single_frame_roundtrip_exact():
    for h, w, ncol in [(8, 8, 4), (5, 7, 16), (1, 1, 2), (16, 9, 250)]:
        img = _pal_img(h, w, ncol, seed=h * w)
        out = decode_gif(encode_gif(img))
        assert np.array_equal(out, img), (h, w, ncol)


def test_gif_interlaced_roundtrip_exact():
    img = _pal_img(13, 6, 8, seed=5)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out, img)


def test_gif_animation_frames_and_delays():
    frames = [_pal_img(6, 6, 5, seed=s) for s in (1, 2, 3)]
    b = encode_gif(frames, delays_cs=[10, 20, 30])
    got = decode_gif_frames_np(b)
    assert len(got) == 3
    for (arr, delay), exp, d in zip(got, frames, (10, 20, 30)):
        assert np.array_equal(arr, exp)
        assert delay == d


def test_gif_too_many_colors_raises():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert len({tuple(p) for p in img.reshape(-1, 3).tolist()}) > 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif_header_only_metadata():
    frames = [_pal_img(12, 34, 7, seed=s) for s in range(4)]
    w, h, nf = parse_gif_header(encode_gif(frames, delays_cs=[5] * 4))
    assert (w, h, nf) == (34, 12, 4)
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif_header(b"\x89PNG\r\n\x1a\nxxxx")


def test_gif_subrect_compositing_and_disposal():
    """Hand-built two-frame GIF: frame 2 is a 2x2 patch at (1,1) with
    disposal 2 on frame 1 -- after frame 1 is shown, the canvas under the
    NEXT frame starts from background in frame 1's region. Built by hand
    because encode_gif only writes full frames."""
    import struct

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x11, 0, 0)  # GCT, 4 colors, bg idx 0
    out += pal.tobytes()
    # frame 1: full 4x4 of color 1, disposal 2
    out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x08, 7, 0, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
    comp = _lzw_compress(np.ones(16, dtype=np.int32), 2)
    out += bytes([2, len(comp)]) + comp + b"\x00"
    # frame 2: 2x2 patch of color 2 at (1,1), no GCE
    out += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    comp = _lzw_compress(np.full(4, 2, dtype=np.int32), 2)
    out += bytes([2, len(comp)]) + comp + b"\x00"
    out.append(0x3B)
    frames = decode_gif_frames_np(bytes(out))
    assert len(frames) == 2
    f1, d1 = frames[0]
    assert d1 == 7
    assert np.array_equal(f1, np.broadcast_to(pal[1], (4, 4, 3)))
    f2, _ = frames[1]
    exp = np.broadcast_to(pal[0], (4, 4, 3)).copy()  # disposal 2: background
    exp[1:3, 1:3] = pal[2]
    assert np.array_equal(f2, exp)


def test_gif_transparency_keeps_underlying_pixels():
    import struct

    pal = np.array([[9, 9, 9], [1, 2, 3], [250, 250, 0], [0, 0, 0]], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x11, 0, 0)
    out += pal.tobytes()
    # frame 1: all color 1 (disposal 0: leave in place)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    comp = _lzw_compress(np.ones(4, dtype=np.int32), 2)
    out += bytes([2, len(comp)]) + comp + b"\x00"
    # frame 2: [[2, transparent],[transparent, 2]] with transparent idx 3
    out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0, 3, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    comp = _lzw_compress(np.array([2, 3, 3, 2], dtype=np.int32), 2)
    out += bytes([2, len(comp)]) + comp + b"\x00"
    out.append(0x3B)
    frames = decode_gif_frames_np(bytes(out))
    f2, _ = frames[1]
    exp = np.array(
        [[[250, 250, 0], [1, 2, 3]], [[1, 2, 3], [250, 250, 0]]], dtype=np.uint8
    )
    assert np.array_equal(f2, exp)


def test_gif_disposal_3_raises():
    import struct

    pal = np.zeros((4, 3), dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x11, 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x0C, 0, 0, 0)  # disposal 3
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    comp = _lzw_compress(np.zeros(4, dtype=np.int32), 2)
    out += bytes([2, len(comp)]) + comp + b"\x00"
    out.append(0x3B)
    with pytest.raises(NotImplementedError, match="disposal"):
        decode_gif_frames_np(bytes(out))


# ---------------------------------------------------------------- Spark


def test_gif_through_decode_image_operator(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import decode_image

    imgs = {i: _pal_img(6, 8, 10, seed=i) for i in range(5)}
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(imgs), "content": [encode_gif(v) for v in imgs.values()],
    }))
    rows = {r["doc_id"]: r for r in decode_image(df, "doc_id").collect()}
    for i, img in imgs.items():
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
        got = np.asarray(r["pixels"], dtype=np.float32).reshape(6, 8, 3)
        assert np.array_equal(got.astype(np.uint8), img)


def test_gif_meta_through_decode_media_meta(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import decode_media_meta

    frames = [_pal_img(4, 9, 6, seed=s) for s in range(3)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_gif(frames, delays_cs=[1, 2, 3])],
    }))
    r = decode_media_meta(df, "doc_id").collect()[0]
    assert (r["media_type"], r["width"], r["height"], r["n_frames"]) == ("image", 9, 4, 3)


def test_gif_frames_operator_and_sampling(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import gif_frames

    frames = [_pal_img(5, 5, 4, seed=s) for s in (11, 12, 13, 14)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_gif(frames, delays_cs=[2, 4, 6, 8])],
    }))
    rows = {r["frame_idx"]: r for r in gif_frames(df, "doc_id").collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    for fi, exp in enumerate(frames):
        got = np.asarray(rows[fi]["pixels"], dtype=np.float32).reshape(5, 5, 3)
        assert np.array_equal(got.astype(np.uint8), exp)
        assert rows[fi]["delay_cs"] == 2 * (fi + 1)
    sampled = gif_frames(df, "doc_id", every_nth=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]


def test_gif_feeds_transcode_thumbnailing(spark):
    """GIF in, JPEG thumbnail out: the round-9 transcode stage accepts the
    new format via the shared decode dispatch."""
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import decode_image, transcode_images

    img = _pal_img(16, 16, 3, seed=2)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_gif(img)],
    }))
    out = transcode_images(df, "doc_id", 8, 8, quality=90).collect()[0]
    assert out["ok"] and (out["width"], out["height"]) == (8, 8)
    assert bytes(out["content"])[:2] == b"\xff\xd8"  # JPEG thumbnail
    dec = decode_image(
        spark.createDataFrame(pd.DataFrame({"doc_id": [1], "content": [bytes(out["content"])]})),
        "doc_id",
    ).collect()[0]
    assert (dec["width"], dec["height"]) == (8, 8)


# -- property tests (hypothesis) ----------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.lists(st.integers(min_value=0, max_value=255), min_size=0, max_size=3000),
)
def test_lzw_roundtrip_property(mcs, data):
    """Any symbol stream within the alphabet round-trips — including empty
    streams, single symbols, and streams long enough to grow code width."""
    idx = np.asarray([d % (1 << mcs) for d in data], dtype=np.int32)
    got = _lzw_decompress(_lzw_compress(idx, mcs), mcs)
    assert np.array_equal(got, idx)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    ncol=st.integers(min_value=2, max_value=16),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_gif_roundtrip_property(h, w, ncol, interlace, seed):
    img = _pal_img(h, w, ncol, seed=seed)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


def test_gif_delays_length_must_match_frames():
    from duckdb_vss_spark.operators.gif import encode_gif

    frames = [np.full((2, 2, 3), c, dtype=np.uint8) for c in (0, 80)]
    with pytest.raises(ValueError, match="delays_cs has 1 entries for 2 frames"):
        encode_gif(frames, delays_cs=[5])
    with pytest.raises(ValueError, match="delays_cs has 3 entries for 2 frames"):
        encode_gif(frames, delays_cs=[5, 5, 5])
