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
