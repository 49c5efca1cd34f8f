"""Audio operators: exact-integer features vs hand computation, spectral
features vs an independent numpy reference, the Haitsma-Kalker-shaped
block fingerprint's invariances, Shazam landmark matching, resample
properties, and the offset-consistent near-dup join (incl. the hot-key
cap)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators import multimodal as M
from duckdb_vss_spark.operators.audio import (
    audio_features,
    audio_neardup_pairs,
    block_fingerprint,
    fingerprint_keys,
    landmark_fingerprint,
    resample_audio,
)


def _clip(i: int, n: int = 4096) -> np.ndarray:
    """Deterministic pseudo-audio: a few id-keyed sinusoids plus id-keyed
    integer noise, quantized to int16 like real PCM."""
    rng = np.random.default_rng(1000 + i)
    t = np.arange(n, dtype=np.float64)
    x = (
        0.4 * np.sin(2 * np.pi * (0.01 + 0.002 * (i % 7)) * t)
        + 0.2 * np.sin(2 * np.pi * (0.05 + 0.003 * (i % 5)) * t)
        + 0.05 * rng.standard_normal(n)
    )
    return np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def clips(spark):
    """20 distinct clips as decoded sample frames (via the real WAV codec
    round trip, so decode_audio is in the loop)."""
    import pandas as pd

    rows = [(i, M.encode_wav(_clip(i), 8000)) for i in range(20)]
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]})
    )
    return M.decode_audio(df, "clip_id").cache()


def test_audio_features_integer_exact_hand_computed(spark):
    import pandas as pd

    pcm = np.array([100, -50, 0, 25, -25, -1, 3, 3], dtype=np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [1], "content": [M.encode_wav(pcm, 8000)]})
    )
    r = audio_features(M.decode_audio(df, "clip_id"), "clip_id").collect()[0]
    # sign changes (negative <-> non-negative): 100|-50, -50|0, 25|-25, -1|3
    assert r["zcr"] == 4
    assert r["ssq"] == int(np.sum(pcm.astype(np.int64) ** 2))
    assert r["n_samples"] == 8
    assert abs(r["peak"] - 100 / 32768.0) < 1e-9


def test_audio_features_spectral_vs_numpy_reference(clips):
    rows = {r["clip_id"]: r for r in audio_features(clips, "clip_id").collect()}
    for i in (0, 3, 11):
        x = _clip(i).astype(np.float64) / 32768.0
        mag = np.abs(np.fft.rfft(x))
        tot = mag.sum()
        scale = 8000.0 / len(x)
        cent = float(np.dot(np.arange(len(mag)), mag) / tot) * scale
        roll = float(np.searchsorted(np.cumsum(mag), 0.85 * tot)) * scale
        flat = float(np.exp(np.mean(np.log(mag[mag > 0]))) / np.mean(mag))
        r = rows[i]
        assert abs(r["spectral_centroid"] - cent) < 1e-6 * max(1.0, cent)
        assert abs(r["spectral_rolloff85"] - roll) < 1e-9
        assert abs(r["spectral_flatness"] - flat) < 1e-9
        assert abs(r["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-9


def test_block_fingerprint_hand_computed(spark):
    import pandas as pd

    # frame=4, blocks=2, blk=2: E(f,0)=q0^2+q1^2, E(f,1)=q2^2+q3^2
    pcm = np.array([1, 0, 0, 2, 3, 0, 0, 1, 0, 1, 2, 0], dtype=np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [7], "content": [M.encode_wav(pcm, 8000)]})
    )
    out = block_fingerprint(
        M.decode_audio(df, "clip_id"), "clip_id", frame=4, blocks=2
    ).collect()[0]
    # E = [[1,4],[9,1],[1,4]]; d = E[:,0]-E[:,1] = [-3, 8, -3]
    # dd = [11, -11] -> bits [1, 0]
    assert out["n_frames"] == 3
    assert list(out["words"]) == [1, 0]


def test_block_fingerprint_amplitude_scale_invariant(spark, clips):
    fp = {r["clip_id"]: list(r["words"]) for r in
          block_fingerprint(clips, "clip_id").collect()}
    halved = clips.select(
        "clip_id", F.transform("samples", lambda s: s * F.lit(0.5)).alias("samples")
    )
    fp_h = {r["clip_id"]: list(r["words"]) for r in
            block_fingerprint(halved, "clip_id").collect()}
    assert fp == fp_h
    # and distinct clips get distinct fingerprints
    assert len({tuple(w) for w in fp.values()}) == len(fp)


def test_fingerprint_keys_shape(clips):
    fp = block_fingerprint(clips, "clip_id", frame=256, blocks=8)
    keys = fingerprint_keys(fp, "clip_id", key_frames=4)
    n_frames = {r["clip_id"]: r["n_frames"] for r in fp.collect()}
    cnt = {r["clip_id"]: r["n"] for r in
           keys.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for i, nf in n_frames.items():
        # words has nf-1 entries -> (nf-1) - 4 + 1 keys
        assert cnt[i] == (nf - 1) - 4 + 1
    # key reconstruction for one clip, by hand
    words = {r["clip_id"]: list(r["words"]) for r in fp.collect()}[0]
    got = {r["t"]: r["key"] for r in keys.filter(F.col("clip_id") == 0).collect()}
    for t in (0, 5):
        exp = sum(words[t + j] << (j * 7) for j in range(4))
        assert got[t] == exp


def test_audio_neardup_finds_planted_shifted_copy(spark):
    """Clip 100 = clip 0 delayed by exactly 3 frames (768 samples) and
    scaled by 0.7: the vote must land on offset -3 (copy's keys are 3
    frames later). Unrelated clips must not pair."""
    import pandas as pd

    base = _clip(0)
    shifted = np.concatenate([np.zeros(768, dtype=np.int16), base])[: len(base)]
    shifted = np.round(shifted * 0.7).astype(np.int16)
    rows = [(i, M.encode_wav(_clip(i), 8000)) for i in range(10)]
    rows.append((100, M.encode_wav(shifted, 8000)))
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]})
    )
    dec = M.decode_audio(df, "clip_id")
    keys = fingerprint_keys(block_fingerprint(dec, "clip_id"), "clip_id")
    pairs = {(r["id_a"], r["id_b"]): r for r in
             audio_neardup_pairs(keys, "clip_id", min_matches=5).collect()}
    assert (0, 100) in pairs
    assert pairs[(0, 100)]["offset"] == -3
    assert all(p == (0, 100) for p in pairs)


def test_audio_neardup_hot_key_cap(spark):
    """DISTINCT silent clips (different lengths, so their fingerprint
    tables differ) share the all-zero key everywhere; the frequency cap
    must drop those keys — warning with the fraction (round 11: no silent
    caps) — so silence does not match silence quadratically. IDENTICAL
    clips, by contrast, are exact duplicates and MUST pair regardless of
    the cap (the digest collapse; round 10 silently lost them)."""
    import pandas as pd

    rows = [(i, M.encode_wav(np.zeros(4096 + 256 * i, dtype=np.int16), 8000))
            for i in range(8)]
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]})
    )
    keys = fingerprint_keys(
        block_fingerprint(M.decode_audio(df, "clip_id"), "clip_id"), "clip_id"
    )
    with pytest.warns(RuntimeWarning, match="hot keys"):
        out = audio_neardup_pairs(keys, "clip_id", min_matches=5, max_key_freq=20)
        assert out.count() == 0
    # 8 byte-identical silent clips: identical fingerprint tables collapse
    # to one digest -> all C(8,2) exact-dup pairs survive the cap
    rows2 = [(i, M.encode_wav(np.zeros(4096, dtype=np.int16), 8000)) for i in range(8)]
    df2 = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows2], "content": [r[1] for r in rows2]})
    )
    keys2 = fingerprint_keys(
        block_fingerprint(M.decode_audio(df2, "clip_id"), "clip_id"), "clip_id"
    )
    got = {(r["id_a"], r["id_b"]): r for r in audio_neardup_pairs(
        keys2, "clip_id", min_matches=5, max_key_freq=20).collect()}
    assert len(got) == 8 * 7 // 2
    assert got[(0, 1)]["offset"] == 0
    # star expansion for cluster consumers: linear
    n_star = audio_neardup_pairs(keys2, "clip_id", min_matches=5,
                                 max_key_freq=20,
                                 exact_dup_pairs="star").count()
    assert n_star == 7


def test_landmark_fingerprint_matches_exact_copy(spark):
    import pandas as pd

    rows = [(i, M.encode_wav(_clip(i, n=8192), 8000)) for i in range(6)]
    rows.append((50, M.encode_wav(_clip(2, n=8192), 8000)))  # exact dup of 2
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]})
    )
    keys = landmark_fingerprint(M.decode_audio(df, "clip_id"), "clip_id")
    pairs = {(r["id_a"], r["id_b"]): r for r in
             audio_neardup_pairs(keys, "clip_id", min_matches=10).collect()}
    assert (2, 50) in pairs
    assert pairs[(2, 50)]["offset"] == 0
    # the planted exact copy dominates: clips sharing one sinusoid
    # component may pair weakly (they ARE similar audio), but the true
    # duplicate collects the most offset-consistent votes by far
    best = max(pairs, key=lambda p: pairs[p]["n_matches"])
    assert best == (2, 50)
    others = [r["n_matches"] for p, r in pairs.items() if p != (2, 50)]
    assert all(n < pairs[(2, 50)]["n_matches"] / 2 for n in others)


def test_landmark_keys_vs_numpy_reference(spark):
    """One clip's landmark table equals an independent straight-line
    reimplementation of the STFT peak-pair construction."""
    import pandas as pd

    n_fft, hop, ppf, fan, max_dt = 512, 256, 3, 3, 16
    x = _clip(4, n=4096).astype(np.float64) / 32768.0
    win = np.hanning(n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    pk = []
    for f in range(n_frames):
        mag = np.abs(np.fft.rfft(x[f * hop : f * hop + n_fft] * win))
        inner = np.nonzero((mag[1:-1] > mag[:-2]) & (mag[1:-1] > mag[2:]))[0] + 1
        top = inner[np.argsort(mag[inner], kind="stable")[::-1][:ppf]]
        pk.append(np.sort(top))
    exp = set()
    for f1 in range(n_frames):
        for b1 in pk[f1]:
            paired = 0
            for f2 in range(f1 + 1, min(n_frames, f1 + 1 + max_dt)):
                for b2 in pk[f2]:
                    exp.add((f1, (int(b1) << 24) | (int(b2) << 8) | (f2 - f1)))
                    paired += 1
                    if paired >= fan:
                        break
                if paired >= fan:
                    break
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [4], "content": [M.encode_wav(_clip(4, n=4096), 8000)]})
    )
    got = {(r["t"], r["key"]) for r in
           landmark_fingerprint(M.decode_audio(df, "clip_id"), "clip_id").collect()}
    assert got == exp


def test_resample_identity_and_length(clips):
    same = resample_audio(clips, "clip_id", 8000, 8000)
    r = same.filter(F.col("clip_id") == 1).collect()[0]
    orig = _clip(1).astype(np.float64) / 32768.0
    assert r["n_samples"] == len(orig)
    assert np.allclose(np.asarray(r["samples"], dtype=np.float64), orig, atol=1e-6)


def test_resample_linear_ramp_exact(spark):
    """Upsampling a linear ramp by 2x reproduces the ramp at half steps —
    linear interpolation is exact on affine signals."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [1],
        "samples": [np.arange(10, dtype=np.float32) / 16.0],
        "sample_rate": [4000],
    }))
    r = resample_audio(df, "clip_id", 4000, 8000).collect()[0]
    assert r["n_samples"] == 20
    assert r["sample_rate"] == 8000
    got = np.asarray(r["samples"], dtype=np.float64)
    exp = np.minimum(np.arange(20) * 0.5, 9.0) / 16.0  # clamped at the tail
    assert np.allclose(got, exp, atol=1e-7)


def test_resample_downsample_picks_every_other(spark):
    import pandas as pd

    x = np.arange(16, dtype=np.float32) / 32.0
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [1], "samples": [x]})
    )
    r = resample_audio(df, "clip_id", 8000, 4000).collect()[0]
    assert r["n_samples"] == 8
    assert np.allclose(np.asarray(r["samples"]), x[::2], atol=1e-7)


def test_block_fingerprint_validates_params(clips):
    with pytest.raises(ValueError):
        block_fingerprint(clips, "clip_id", frame=10, blocks=3)
    with pytest.raises(ValueError):
        block_fingerprint(clips, "clip_id", frame=8, blocks=1)
    with pytest.raises(ValueError):
        resample_audio(clips, "clip_id", 0, 8000)


def test_audio_embedding_vs_numpy_reference(clips):
    """Log-mel embedding equals an independent straight-line numpy
    reimplementation (filterbank, windowing, pooling, normalization)."""
    from duckdb_vss_spark.operators.audio import audio_embedding

    rows = {r["clip_id"]: np.asarray(r["embedding"], dtype=np.float32)
            for r in audio_embedding(clips, "clip_id", rate=8000).collect()}
    n_fft, hop, n_mels, rate = 512, 256, 32, 8000.0
    for i in (0, 7):
        x = _clip(i).astype(np.float64) / 32768.0
        # reference mel filterbank
        def h2m(f): return 2595.0 * np.log10(1.0 + f / 700.0)
        def m2h(m): return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        pts = m2h(np.linspace(h2m(0.0), h2m(rate / 2), n_mels + 2))
        bins = np.fft.rfftfreq(n_fft, d=1.0 / rate)
        fb = np.zeros((n_mels, len(bins)))
        for m in range(n_mels):
            lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
            fb[m] = np.maximum(0.0, np.minimum((bins - lo) / (c - lo), (hi - bins) / (hi - c)))
        win = np.hanning(n_fft)
        nf = 1 + (len(x) - n_fft) // hop
        frames = np.stack([x[f * hop: f * hop + n_fft] * win for f in range(nf)])
        spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        v = np.log(spec @ fb.T + 1e-10).mean(axis=0)
        ref = (v / np.linalg.norm(v)).astype(np.float32)
        assert np.allclose(rows[i], ref, atol=1e-6)
        assert abs(float(np.linalg.norm(rows[i])) - 1.0) < 1e-5


def test_audio_embedding_feeds_vector_stack(spark, clips):
    """Embeddings drive the standard vector ops: a clip's nearest
    neighbor by cosine is its duplicate (planted as clip 0's samples)."""
    import pandas as pd

    from duckdb_vss_spark import topk
    from duckdb_vss_spark.operators.audio import audio_embedding

    dup = spark.createDataFrame(pd.DataFrame({
        "clip_id": [99], "content": [M.encode_wav(_clip(0), 8000)],
    }))
    allc = clips.select("clip_id", "samples").unionByName(
        M.decode_audio(dup, "clip_id").select("clip_id", "samples")
    )
    emb = audio_embedding(allc, "clip_id", rate=8000)
    q = [float(v) for v in emb.filter(F.col("clip_id") == 99).collect()[0]["embedding"]]
    top = topk(emb.filter(F.col("clip_id") != 99), "embedding", q, 1, "cosine",
               tiebreak="clip_id").collect()
    assert top[0]["clip_id"] == 0


# -- property tests (hypothesis) ----------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    r1=st.sampled_from([4000, 8000, 16000, 22050, 44100]),
    r2=st.sampled_from([4000, 8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_resample_length_and_range_property(n, r1, r2, seed, spark):
    """Output length is always ceil(n*r2/r1); samples stay within the
    input's range (linear interpolation cannot overshoot)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    x = (rng.uniform(-1, 1, size=n)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({"clip_id": [1], "samples": [x]}))
    r = resample_audio(df, "clip_id", r1, r2).collect()[0]
    assert r["n_samples"] == -(-n * r2 // r1)
    got = np.asarray(r["samples"], dtype=np.float64)
    assert got.min() >= x.min() - 1e-6 and got.max() <= x.max() + 1e-6


def test_split_on_silence_hand_built(spark):
    """Clip = [tone 4f][silence 6f][tone 3f][1f gap][tone 2f][silence 5f]:
    the 1-frame gap does NOT split (min_silence_frames=4), trailing
    silence is trimmed, boundaries land on the frame grid."""
    import pandas as pd

    from duckdb_vss_spark.operators.audio import split_on_silence

    F_ = 256
    tone = (0.3 * np.sin(2 * np.pi * 0.05 * np.arange(F_))).astype(np.float64)
    sil = np.zeros(F_)
    parts = [tone] * 4 + [sil] * 6 + [tone] * 3 + [sil] + [tone] * 2 + [sil] * 5
    x = np.concatenate(parts).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({"clip_id": [1], "samples": [x]}))
    rows = sorted(
        (r["seg_idx"], r["start_sample"], r["end_sample"]) for r in
        split_on_silence(df, "clip_id", frame=F_).collect()
    )
    # seg 0: frames 0-3; seg 1: frames 10-15 (the 1-frame gap bridged)
    assert rows == [(0, 0, 4 * F_), (1, 10 * F_, 16 * F_)]


def test_split_on_silence_edge_cases(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.audio import split_on_silence

    F_ = 128
    tone = (0.5 * np.sin(2 * np.pi * 0.1 * np.arange(F_ * 6))).astype(np.float32)
    silent = np.zeros(F_ * 8, dtype=np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [1, 2], "samples": [tone, silent]}))
    out = split_on_silence(df, "clip_id", frame=F_).collect()
    segs = {r["clip_id"]: r for r in out}
    assert 2 not in segs                       # all-silence: no rows
    assert segs[1]["seg_idx"] == 0             # no silence: whole clip
    assert segs[1]["start_sample"] == 0 and segs[1]["end_sample"] == F_ * 6
    got = np.asarray(segs[1]["samples"], dtype=np.float32)
    assert np.array_equal(got, tone)
    # segments feed the other audio ops unchanged
    from duckdb_vss_spark.operators.audio import audio_features

    seg_rows = split_on_silence(df, "clip_id", frame=F_)
    feats = audio_features(seg_rows, "clip_id", rate_col=None).collect()
    assert len(feats) == 1 and feats[0]["n_samples"] == F_ * 6


def test_split_on_silence_counts_voiced_frames(spark):
    """min_segment_frames counts VOICED frames, not the segment span: a
    click + bridged 2-frame gap + click span (4 total frames, 2 voiced)
    must NOT pass min_segment_frames=3 (ADVICE r9, low)."""
    import pandas as pd

    from duckdb_vss_spark.operators.audio import split_on_silence

    F_ = 128
    tone = (0.4 * np.sin(2 * np.pi * 0.1 * np.arange(F_))).astype(np.float64)
    sil = np.zeros(F_)
    # [tone][sil sil][tone] -> one bridged segment spanning 4 frames but
    # only 2 voiced, then enough trailing silence to close it
    x = np.concatenate([tone, sil, sil, tone] + [sil] * 5).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({"clip_id": [1], "samples": [x]}))
    assert split_on_silence(
        df, "clip_id", frame=F_, min_silence_frames=4, min_segment_frames=3
    ).count() == 0
    # 2 voiced frames meets min_segment_frames=2
    out = split_on_silence(
        df, "clip_id", frame=F_, min_silence_frames=4, min_segment_frames=2
    ).collect()
    assert [(r["start_sample"], r["end_sample"]) for r in out] == [(0, 4 * F_)]


def test_voiced_stats_matches_silence_gate(spark):
    """voiced_frac counts exactly the frames split_on_silence treats as
    voiced (same RMS gate on the same frame grid); all-silence -> 0,
    all-tone -> 1, the hand-built mix counts its tone frames; sub-frame
    clips report zero frames."""
    import pandas as pd

    from duckdb_vss_spark.operators.audio import voiced_stats

    F_ = 128
    tone = (0.4 * np.sin(2 * np.pi * 0.1 * np.arange(F_))).astype(np.float64)
    sil = np.zeros(F_)
    mix = np.concatenate([tone] * 3 + [sil] * 4 + [tone]).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [1, 2, 3, 4],
        "samples": [mix,
                    np.zeros(F_ * 5, dtype=np.float32),
                    np.tile(tone, 6).astype(np.float32),
                    np.zeros(40, dtype=np.float32)],   # shorter than a frame
    }))
    out = {r["clip_id"]: r for r in
           voiced_stats(df, "clip_id", frame=F_).collect()}
    assert out[1]["n_frames"] == 8 and out[1]["n_voiced"] == 4
    assert abs(out[1]["voiced_frac"] - 0.5) < 1e-12
    assert out[2]["n_voiced"] == 0 and out[2]["voiced_frac"] == 0.0
    assert out[3]["n_voiced"] == 6 and out[3]["voiced_frac"] == 1.0
    assert out[4]["n_frames"] == 0 and out[4]["voiced_frac"] == 0.0


def test_audio_neardup_dup_expansion_offset_sign(spark):
    """Round-12 ADVICE fix: the duplicate-group cross expansion must
    flip the lag's sign when least/greatest swaps the member ids
    (offset contract: t_a - t_b with id_a < id_b). Clip 10 is an exact
    fingerprint copy of clip 1; clip 5 is the same keys shifted +10 —
    so (1, 5) lags -10 but (5, 10) must lag +10, not the rep pair's
    un-negated -10."""
    import pandas as pd

    rows = []
    for cid, t0 in ((1, 10), (10, 10), (5, 20)):
        rows += [(cid, t0 + j, 100 + j) for j in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [r[0] for r in rows],
                      "t": [r[1] for r in rows],
                      "key": [r[2] for r in rows]}))
    got = {(r["id_a"], r["id_b"]): (r["offset"], r["n_matches"])
           for r in audio_neardup_pairs(df, "clip_id", min_matches=5).collect()}
    assert got == {(1, 5): (-10, 5), (5, 10): (10, 5), (1, 10): (0, 5)}
