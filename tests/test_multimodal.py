"""Multimodal binary-column plumbing: synthesize -> decode round trip,
codec-free features, frame sampling, resize, and the stubbed codec gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(100)


@pytest.fixture(scope="module")
def media(spark, docs):
    return M.synthesize_media(docs, "doc_id", "text", kind="image").cache()


def test_synthesize_decode_roundtrip(media, docs):
    meta = M.decode_media_meta(media, "doc_id")
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == docs.count()
    for d, r in rows.items():
        assert r["media_type"] == "image"
        assert r["width"] == 16 + d % 64
        assert r["height"] == 16 + (7 * d) % 64
        assert r["n_frames"] == 1
    # n_bytes = header + utf8 payload length
    exp = {r["doc_id"]: r["n"] for r in docs.select("doc_id", (F.octet_length("text") + M.HEADER_LEN).alias("n")).collect()}
    got = {d: r["n_bytes"] for d, r in rows.items()}
    assert got == exp


def test_byte_histogram_features(media):
    feats = M.byte_histogram_features(media, "doc_id")
    rows = feats.collect()
    assert all(len(r["features"]) == 256 for r in rows)
    s = sum(rows[0]["features"])
    assert abs(s - 1.0) < 1e-3  # L1-normalized


def test_features_compose_with_vector_ops(media, spark):
    """Histogram features feed the standard vector operators."""
    from duckdb_vss_spark import knn_join_flat

    feats = M.byte_histogram_features(media, "doc_id").cache()
    probes = feats.limit(3)
    out = knn_join_flat(probes, feats, "features", "features", 2, "cosine", left_id="doc_id", right_id="doc_id")
    got = out.collect()
    assert len(got) == 6
    # self is always the best cosine match (rnk 1, sim ~1)
    best = {r["qid"]: (r["rid"], r["score"]) for r in got if r["rnk"] == 1}
    for q, (r, s) in best.items():
        assert q == r and s == pytest.approx(1.0, abs=1e-6)


def test_frame_sample_counts(docs):
    video = M.synthesize_media(docs, "doc_id", "text", kind="video")
    sampled = M.frame_sample(video, "doc_id", every_nth=2)
    got = {r[0]: r[1] for r in sampled.groupBy("doc_id").agg(F.count("*")).collect()}
    for d, n in got.items():
        nf = 1 + d % 8
        assert n == (nf + 1) // 2  # ceil(nf / 2)


def test_resize_rewrites_header_and_shrinks(media):
    resized = M.resize_media(media, "doc_id", 8, 8)
    meta = M.decode_media_meta(resized, "doc_id")
    rows = meta.collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    orig_sizes = {r["doc_id"]: r["n_bytes"] for r in M.decode_media_meta(media, "doc_id").collect()}
    for r in rows:
        assert r["n_bytes"] <= orig_sizes[r["doc_id"]]


def test_decode_image_rejects_pixelless_container(media):
    # the synthetic VSSM container has no pixel payload: decode_image (now
    # a real decoder for BMP/PPM — tests/test_codecs.py) must refuse it
    # rather than invent pixels
    with pytest.raises(Exception, match="VSSM synthetic"):
        M.decode_image(media, "doc_id").collect()


# ------------------------------------------------------------- JPEG headers


def _jpeg_bytes(w, h, orientation=None, progressive=False, little_endian=True):
    """Hand-assembled minimal JPEG: SOI + optional APP1/EXIF + SOF + SOS+EOI.
    Header-only parsers need no entropy data, so none is included."""
    import struct

    out = b"\xff\xd8"  # SOI
    # APP0/JFIF (typical real-file prefix)
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    if orientation is not None:
        e = "<" if little_endian else ">"
        bo = b"II" if little_endian else b"MM"
        tiff = bo + struct.pack(e + "HI", 42, 8)
        tiff += struct.pack(e + "H", 1)  # one IFD entry
        tiff += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "HH", orientation, 0)
        tiff += struct.pack(e + "I", 0)  # next-IFD pointer
        exif = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(exif)) + exif
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    comp = b"\x01\x11\x00"
    payload = b"\x08" + struct.pack(">HH", h, w) + b"\x01" + comp
    out += sof + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"  # SOS
    out += b"\xff\xd9"  # EOI
    return out


def test_parse_jpeg_header_sof0_sof2_and_exif():
    assert M.parse_jpeg_header(_jpeg_bytes(640, 480)) == (640, 480, 1)
    assert M.parse_jpeg_header(_jpeg_bytes(31, 17, progressive=True)) == (31, 17, 1)
    assert M.parse_jpeg_header(_jpeg_bytes(100, 50, orientation=6)) == (100, 50, 6)
    # big-endian (MM) EXIF too
    assert M.parse_jpeg_header(_jpeg_bytes(100, 50, orientation=8, little_endian=False)) == (100, 50, 8)


def test_parse_jpeg_header_rejects_garbage():
    with pytest.raises(ValueError, match="SOI"):
        M.parse_jpeg_header(b"BM000000")
    with pytest.raises(ValueError, match="SOF|truncated"):
        M.parse_jpeg_header(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(ValueError, match="truncated"):
        M.parse_jpeg_header(_jpeg_bytes(10, 10)[:12])


def test_decode_media_meta_handles_jpeg_rows(spark):
    """Mixed corpus: VSSM synthetic containers and real-format JPEG blobs in
    the same column decode side by side; EXIF orientations 5-8 swap the
    reported display dimensions."""
    rows = [
        (0, bytearray(_jpeg_bytes(640, 480))),
        (1, bytearray(_jpeg_bytes(100, 50, orientation=6))),  # rotated: swaps
        (2, bytearray(M.pack_header("audio", 0, 0, 1, 8000) + b"pcm")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in M.decode_media_meta(df, "doc_id").collect()}
    assert (got[0]["media_type"], got[0]["width"], got[0]["height"]) == ("image", 640, 480)
    assert (got[1]["width"], got[1]["height"]) == (50, 100)
    assert (got[2]["media_type"], got[2]["sample_rate"]) == ("audio", 8000)
    assert got[0]["n_frames"] == 1 and got[0]["sample_rate"] == 0


def test_codec_ops_fan_out_single_partition_sources(spark):
    """A single-file/single-partition source must NOT serialize the Python
    codec chain onto one task: every mapInPandas codec op fans the input
    to cluster width first (VERDICT r9 #1 — the audio twin of this bug
    measured 2.5x). Pin: output partition count == defaultParallelism."""
    import numpy as np
    import pandas as pd

    par = spark.sparkContext.defaultParallelism
    rng = np.random.default_rng(7)
    imgs = [
        M.encode_bmp(rng.integers(0, 256, size=(8, 8, 3)).astype("uint8"))
        for _ in range(64)
    ]
    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(64)), "content": imgs})
    ).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    for op in (
        lambda d: M.decode_image(d, "doc_id"),
        lambda d: M.transcode_images(d, "doc_id", 4, 4),
        lambda d: M.resize_image(d, "doc_id", 4, 4),
        lambda d: M.byte_histogram_features(d, "doc_id", skip_header=False),
        lambda d: M.decode_media_meta(d, "doc_id"),
    ):
        out = op(one)
        assert out.rdd.getNumPartitions() == par, op
    # decode_audio too (WAV source)
    wav = M.encode_wav(
        (1000 * np.sin(0.01 * np.arange(512))).astype("int16"), 8000
    )
    aone = spark.createDataFrame(
        pd.DataFrame({"clip_id": list(range(64)), "content": [wav] * 64})
    ).coalesce(1)
    assert M.decode_audio(aone, "clip_id").rdd.getNumPartitions() == par
    # and the transcode output is still correct through the fan-out
    t = M.transcode_images(one, "doc_id", 4, 4).collect()
    assert len(t) == 64 and all(r["ok"] for r in t)
