"""MJPEG-AVI container: RIFF structure round trips, header-only parse,
lossless-fixture pixel exactness through the real JPEG codec, frame
sampling, and the Spark-side dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_vss_spark.operators.video import (
    avi_frames,
    decode_avi_frames_np,
    encode_avi_mjpeg,
    parse_avi_header,
)


def _lossless_frame(seed: int) -> np.ndarray:
    """16x16 grayscale-as-RGB of constant EVEN 8x8 blocks: bit-exact
    through baseline JPEG at q50 (DC step 16 divides 8*(c-128), no AC) —
    the same trick the jpegpx driver gate uses, so container tests can
    assert pixel EQUALITY, not tolerance."""
    im = np.zeros((16, 16), dtype=np.uint8)
    for b, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        im[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 16 + 2 * ((seed * 7 + b * 5) % 112)
    return np.stack([im, im, im], axis=-1)


def test_avi_roundtrip_lossless_frames_exact():
    frames = [_lossless_frame(s) for s in range(4)]
    b = encode_avi_mjpeg(frames, fps=10, quality=50)
    got = decode_avi_frames_np(b)
    assert len(got) == 4
    for g, e in zip(got, frames):
        assert np.array_equal(g, e)


def test_avi_header_only_parse():
    frames = [_lossless_frame(s) for s in range(7)]
    w, h, nf, fps = parse_avi_header(encode_avi_mjpeg(frames, fps=30))
    assert (w, h, nf, fps) == (16, 16, 7, 30)
    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi_header(b"RIFF\x00\x00\x00\x00WAVE")


def test_avi_lossy_frames_close():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.int64).astype(np.uint8)
              for _ in range(3)]
    got = decode_avi_frames_np(encode_avi_mjpeg(frames, quality=90))
    assert len(got) == 3
    for g, e in zip(got, frames):
        assert g.shape == e.shape
        assert np.abs(g.astype(float) - e.astype(float)).mean() < 12.0


def test_avi_frames_operator_and_sampling(spark):
    import pandas as pd

    frames = [_lossless_frame(s) for s in range(5)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_avi_mjpeg(frames, quality=50)],
    }))
    rows = {r["frame_idx"]: r for r in avi_frames(df, "doc_id").collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for fi, exp in enumerate(frames):
        got = np.asarray(rows[fi]["pixels"], dtype=np.float32).reshape(16, 16, 3)
        assert np.array_equal(got.astype(np.uint8), exp)
    sampled = avi_frames(df, "doc_id", every_nth=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2, 4]


def test_avi_through_media_meta_and_decode_image(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import decode_image, decode_media_meta

    frames = [_lossless_frame(s) for s in range(3)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_avi_mjpeg(frames, fps=25, quality=50)],
    }))
    m = decode_media_meta(df, "doc_id").collect()[0]
    assert (m["media_type"], m["width"], m["height"], m["n_frames"]) == ("video", 16, 16, 3)
    d = decode_image(df, "doc_id").collect()[0]  # first frame
    got = np.asarray(d["pixels"], dtype=np.float32).reshape(16, 16, 3)
    assert np.array_equal(got.astype(np.uint8), frames[0])


def test_video_frames_mixed_container_dispatch(spark):
    """video_frames dispatches per blob by magic: GIF and AVI columns mix
    freely; undecodable clips quarantine as one frame_idx=-1 row."""
    import pandas as pd

    from duckdb_vss_spark.operators.gif import encode_gif
    from duckdb_vss_spark.operators.multimodal import video_frames

    pal = (np.arange(8)[:, None] * np.array([37, 59, 83])[None, :] % 256).astype(np.uint8)
    gif_fr = [pal[(np.add.outer(np.arange(6), np.arange(8)) + f) % 8] for f in range(3)]
    im = np.zeros((16, 16), dtype=np.uint8)
    for bk, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        im[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = 16 + 2 * (bk * 5)
    avi = encode_avi_mjpeg([np.stack([im, im, im], axis=-1)] * 2, quality=50)
    df = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3],
        "content": [encode_gif(gif_fr, delays_cs=[4, 4, 4]), avi, b"junk"],
    }))
    rows = {}
    for r in video_frames(df, "vid").collect():
        rows.setdefault(r["vid"], []).append(r)
    assert sorted(r["frame_idx"] for r in rows[1]) == [0, 1, 2]   # GIF
    assert rows[1][0]["width"] == 8 and rows[1][0]["height"] == 6
    assert sorted(r["frame_idx"] for r in rows[2]) == [0, 1]      # AVI
    assert rows[2][0]["width"] == 16
    assert [r["frame_idx"] for r in rows[3]] == [-1]              # quarantined
    assert rows[3][0]["pixels"] is None
    # every_nth downsamples the frame grid
    n = video_frames(df.filter("vid = 1"), "vid", every_nth=2).filter(
        "frame_idx >= 0").count()
    assert n == 2  # frames 0 and 2
    with pytest.raises(ValueError, match="on_error"):
        video_frames(df, "vid", on_error="drop")
    # every_nth=0 must raise driver-side, not quarantine every clip as a
    # fake decode failure inside the per-clip try (ADVICE r10)
    with pytest.raises(ValueError, match="every_nth"):
        video_frames(df, "vid", every_nth=0)


def test_fingerprint_videos_fused_equals_composition(spark):
    """fingerprint_videos (one fused decode+hash pass, round 11) must
    equal frame_phash(video_frames(df)) hash-for-hash on the same frame
    grid, carry the same per-clip aggregates video_curate used to derive
    from the exploded pixel table, and quarantine undecodables."""
    import pandas as pd

    from duckdb_vss_spark.operators.gif import encode_gif
    from duckdb_vss_spark.operators.image import fingerprint_videos, frame_phash
    from duckdb_vss_spark.operators.multimodal import video_frames

    pal = (np.arange(8)[:, None] * np.array([37, 59, 83])[None, :] % 256).astype(np.uint8)
    gif_fr = [pal[(np.add.outer(np.arange(12), np.arange(16)) + f) % 8] for f in range(5)]
    im = (np.add.outer(np.arange(16), np.arange(16)) * 3 % 200).astype(np.uint8)
    avi = encode_avi_mjpeg([np.stack([im, im, im], axis=-1)] * 3, quality=60)
    df = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3], "url": ["a", "b", "c"],
        "content": [encode_gif(gif_fr, delays_cs=[4] * 5), avi, b"junk"],
    }))
    for nth in (1, 2):
        fused = {r["vid"]: r for r in
                 fingerprint_videos(df, "vid", every_nth=nth).collect()}
        ref = {}
        for r in frame_phash(
            video_frames(df, "vid", every_nth=nth).filter("frame_idx >= 0"), "vid"
        ).collect():
            ref.setdefault(r["vid"], {})[r["t"]] = r["key"]
        for vid in (1, 2):
            got = dict(zip(fused[vid]["frame_ts"], fused[vid]["frame_phashes"]))
            assert got == ref[vid], (nth, vid)
            assert fused[vid]["n_frames"] == len(ref[vid])
            assert fused[vid]["decode_ok"] and fused[vid]["decode_err"] is None
            assert fused[vid]["url"] in ("a", "b")        # passthrough rides
            assert bytes(fused[vid]["content"])           # original bytes ride
        assert fused[1]["width"] == 16 and fused[1]["height"] == 12
        assert not fused[3]["decode_ok"] and fused[3]["n_frames"] == 0
        assert fused[3]["frame_ts"] == [] and "NotImplementedError" in fused[3]["decode_err"]
    with pytest.raises(ValueError, match="every_nth"):
        fingerprint_videos(df, "vid", every_nth=0)
    with pytest.raises(ValueError, match="collide"):
        fingerprint_videos(df.withColumnRenamed("url", "n_frames"), "vid")


def test_video_curate_every_nth_owned_by_store(spark, tmp_path):
    """ADVICE r10: hashes are only comparable between identically sampled
    frame grids, so video_curate defaults every_nth from the store
    manifest and rejects a conflicting explicit value."""
    import pandas as pd

    from duckdb_vss_spark.index.video_store import VideoFingerprintStore
    from duckdb_vss_spark.pipelines import video_curate

    frames = [(np.add.outer(np.arange(16), np.arange(16)) * (k + 2) % 255).astype(np.uint8)
              for k in range(6)]
    clips = [np.stack([f, f, f], axis=-1) for f in frames]
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [1], "content": [encode_avi_mjpeg(clips, quality=80)]}))
    st = VideoFingerprintStore.create(spark, str(tmp_path / "vs"), every_nth=2)
    with pytest.raises(ValueError, match="every_nth=3 conflicts"):
        video_curate(df, store=st, every_nth=3)
    # inherits the manifest grid: 6 frames at stride 2 -> 3 sampled
    out = video_curate(df, store=st, min_frames=1, min_matches=2,
                       min_width=16, min_height=16, snapshot="b0").collect()[0]
    assert out["n_frames"] == 3 and out["video_keep"]
    # matching the SAME grid stride explicitly is fine
    assert video_curate(df, store=st, every_nth=2, min_frames=1, min_width=16,
                        min_height=16, min_matches=2).collect()[0]["dup_of_store"]


def test_video_neardup_capped_vote_survives_hot_first_band(spark):
    """Round-11 verdict twin of the hamming_pairs first_agree repro: a
    frame pair whose FIRST agreeing band is hot must still vote through
    a later agreeing non-hot band. Clips 1 and 2 share chunks 0, 1, 3
    (1 bit apart in chunk 2); three filler clips heat band 0's bucket.
    The old path kept only the b == first_agree row (band 0, dropped by
    the cap) — the vote vanished and the near-dup pair fell below
    min_matches."""
    import pandas as pd

    from duckdb_vss_spark.operators.image import video_neardup_pairs

    def key_of(c0, c1, c2, c3):
        return (c3 << 48) | (c2 << 32) | (c1 << 16) | c0

    rows = [
        (1, 0, key_of(5, 7, 1, 9)),
        (2, 0, key_of(5, 7, 3, 9)),     # chunk2: 1 vs 3 -> hamming 1
        (3, 0, key_of(5, 100, 400, 700)),
        (4, 0, key_of(5, 200, 500, 600)),
        (5, 0, key_of(5, 300, 900, 800)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows],
                      "t": [r[1] for r in rows],
                      "key": [r[2] for r in rows]}))
    with pytest.warns(RuntimeWarning, match="hot .* dropped"):
        pairs = {(r["id_a"], r["id_b"]): r for r in video_neardup_pairs(
            df, "clip_id", max_hamming=1, bands=4, min_matches=1, max_bucket=2,
        ).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["offset"] == 0 and pairs[(1, 2)]["n_matches"] == 1


def test_video_neardup_dup_expansion_offset_sign(spark):
    """Round-12 ADVICE fix: the duplicate-group cross expansion must
    flip the lag's sign when least/greatest swaps the member ids. Clip
    10 is an exact fingerprint copy of clip 1; clip 5 is the same
    content shifted +10 — so (1, 5) lags -10 but (5, 10) lags +10."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators.image import video_neardup_pairs

    rng = np.random.default_rng(21)
    keys = [int(v) for v in rng.integers(0, 2**62, size=5)]
    rows = []
    for cid, t0 in ((1, 10), (10, 10), (5, 20)):
        rows += [(cid, t0 + j, k) for j, k in enumerate(keys)]
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows],
                      "t": [r[1] for r in rows],
                      "key": [r[2] for r in rows]}))
    got = {(r["id_a"], r["id_b"]): (r["offset"], r["n_matches"])
           for r in video_neardup_pairs(df, "clip_id", min_matches=5).collect()}
    assert got == {(1, 5): (-10, 5), (5, 10): (10, 5), (1, 10): (0, 5)}
