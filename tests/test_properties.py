"""Property-based tests (hypothesis) for the numeric kernels and metric
contracts — beyond the reference's test strategy (it has no property tests,
SURVEY §5), these pin the invariants the operators rely on:

- kernel scores agree with direct per-pair numpy formulas;
- local_topk selects exactly the k best per probe under either polarity;
- the JVM column expressions agree with the kernels (one batched check);
- metric polarity ordering: min_by/topk pick the same winner either path.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from duckdb_vss_spark.functions.kernels import local_topk, pairwise_scores

DIMS = st.integers(min_value=1, max_value=16)
FLOATS = st.floats(min_value=-16.0, max_value=16.0, allow_nan=False, allow_infinity=False, width=32)


def _mats(draw, d):
    n_i = draw(st.integers(1, 8))
    n_p = draw(st.integers(1, 4))
    items = np.array(draw(st.lists(st.lists(FLOATS, min_size=d, max_size=d), min_size=n_i, max_size=n_i)))
    probes = np.array(draw(st.lists(st.lists(FLOATS, min_size=d, max_size=d), min_size=n_p, max_size=n_p)))
    return items, probes


@st.composite
def matrices(draw):
    d = draw(DIMS)
    return _mats(draw, d)


@settings(max_examples=200, deadline=None)
@given(matrices())
def test_l2_kernel_matches_naive(mp):
    items, probes = mp
    got = pairwise_scores(items, probes, "l2sq")
    for i in range(items.shape[0]):
        for j in range(probes.shape[0]):
            exp = math.sqrt(((items[i] - probes[j]) ** 2).sum())
            # The kernel's GEMM expansion |a|^2+|b|^2-2ab cancels
            # catastrophically when a ~= b: the squared-distance residual is
            # O(eps * (|a|^2+|b|^2)) and sqrt turns that into an absolute
            # error of O(sqrt(eps) * norm) near zero distance.
            tol = math.sqrt(64 * 2.3e-16 * ((items[i] ** 2).sum() + (probes[j] ** 2).sum()))
            assert got[i, j] == pytest.approx(exp, rel=1e-9, abs=max(1e-9, tol))


@settings(max_examples=200, deadline=None)
@given(matrices())
def test_ip_kernel_matches_naive(mp):
    items, probes = mp
    got = pairwise_scores(items, probes, "ip")
    for i in range(items.shape[0]):
        for j in range(probes.shape[0]):
            assert got[i, j] == pytest.approx(float(items[i] @ probes[j]), rel=1e-9, abs=1e-9)


@settings(max_examples=200, deadline=None)
@given(matrices())
def test_cosine_kernel_matches_naive(mp):
    items, probes = mp
    ni = np.linalg.norm(items, axis=1)
    npr = np.linalg.norm(probes, axis=1)
    if (ni == 0).any() or (npr == 0).any():
        return  # zero vectors: division domain, contract covered elsewhere
    got = pairwise_scores(items, probes, "cosine")
    for i in range(items.shape[0]):
        for j in range(probes.shape[0]):
            exp = float(items[i] @ probes[j]) / (ni[i] * npr[j])
            assert got[i, j] == pytest.approx(exp, rel=1e-9, abs=1e-9)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1, 20),  # n items
    st.integers(1, 4),   # n probes
    st.integers(1, 25),  # k
    st.booleans(),
)
def test_local_topk_selects_the_k_best(n, p, k, desc):
    rng = np.random.default_rng(n * 1000 + p * 10 + k)
    scores = rng.normal(size=(n, p))
    idx = local_topk(scores, k, desc)
    kk = min(k, n)
    assert idx.shape == (kk, p)
    for j in range(p):
        col = scores[:, j]
        chosen = sorted(col[idx[:, j]], reverse=desc)
        best = sorted(col, reverse=desc)[:kk]
        assert chosen == pytest.approx(best)


def test_jvm_exprs_agree_with_kernels(spark):
    """One batched cross-check: the JVM higher-order expressions and the
    numpy kernels compute the same scores on random data (the two paths a
    query can take must agree, or index candidates would be mis-ranked)."""
    from duckdb_vss_spark.functions.distance import distance_expr

    rng = np.random.default_rng(7)
    items = rng.normal(size=(64, 16)).astype(np.float32)
    probe = rng.normal(size=16).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(items)], "id long, v array<float>"
    )
    for metric in ("l2sq", "cosine", "ip"):
        got = {
            r["id"]: r["s"]
            for r in df.select("id", distance_expr("v", [float(x) for x in probe], metric).alias("s")).collect()
        }
        exp = pairwise_scores(items.astype(np.float64), probe[None, :], metric)[:, 0]
        for i in range(64):
            assert got[i] == pytest.approx(float(exp[i]), rel=1e-6, abs=1e-6), metric


# ---- round-5 operators: pure-Python/numpy properties ----------------------

WORDS = st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8),
    min_size=1,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(WORDS, st.integers(0, 30))
def test_bpe_roundtrips_any_word(words, n_merges):
    from duckdb_vss_spark.functions.bpe import BPETokenizer, _train_merges

    wf = [(w, (i % 5) + 1) for i, w in enumerate(words)]
    tok = BPETokenizer(_train_merges(wf, n_merges))
    cache: dict = {}
    for w in words + ["unseen-word", "x"]:
        if "</w>" in w:
            continue  # the EOW marker is reserved; real pre-tokenizers can't emit it
        syms = tok._encode_word(w, cache)
        assert "".join(syms).replace("</w>", " ").rstrip() == w


@settings(max_examples=80, deadline=None)
@given(WORDS)
def test_bpe_training_order_invariant(words):
    from duckdb_vss_spark.functions.bpe import _train_merges

    wf = [(w, (i % 3) + 1) for i, w in enumerate(dict.fromkeys(words))]
    a = _train_merges(wf, 12)
    b = _train_merges(list(reversed(wf)), 12)
    assert a == b


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    from duckdb_vss_spark.operators.multimodal import _decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(_decode_bmp(encode_bmp(img)), img)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 200), st.integers(1, 2), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_property(n, ch, seed):
    import struct

    from duckdb_vss_spark.operators.multimodal import encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    blob = encode_wav(s, 8000)
    # parse back with the decoder's own chunk walk via decode_audio's core:
    # RIFF sizes must be self-consistent
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    total = struct.unpack_from("<I", blob, 4)[0]
    assert total + 8 == len(blob)
    data = blob[-s.nbytes:]
    assert np.array_equal(np.frombuffer(data, dtype="<i2").reshape(n, ch), s)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 10), st.integers(1, 10), st.integers(1, 10), st.integers(1, 10))
def test_resize_kernel_shape_and_range(h, w, nh, nw):
    from duckdb_vss_spark.operators.multimodal import _resize_kernel

    img = (np.arange(h * w * 3).reshape(h, w, 3) * 7 % 256).astype(np.uint8)
    for method in ("nearest", "bilinear"):
        out = _resize_kernel(img, nw, nh, method)
        assert out.shape == (nh, nw, 3)
        assert out.min() >= img.min() - 1e-9 and out.max() <= img.max() + 1e-9


# ------------------------------------------------------------- JPEG headers


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=300, deadline=None)
def test_parse_jpeg_header_never_crashes_on_hostile_bytes(b):
    """Any byte string either parses to sane ints or raises ValueError —
    no other exception, no out-of-bounds read, no hang."""
    from duckdb_vss_spark.operators.multimodal import parse_jpeg_header

    try:
        w, h, o = parse_jpeg_header(b)
    except ValueError:
        return
    assert 0 <= w <= 0xFFFF and 0 <= h <= 0xFFFF and 1 <= o <= 8


@given(
    w=st.integers(1, 0xFFFF),
    h=st.integers(1, 0xFFFF),
    orient=st.integers(1, 8),
    junk=st.binary(max_size=64),
)
@settings(max_examples=100, deadline=None)
def test_parse_jpeg_header_roundtrips_synthetic(w, h, orient, junk):
    """Assembled marker streams parse back exactly, including with junk
    appended after EOI (framing never reads past the scan start)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from duckdb_vss_spark.operators.multimodal import parse_jpeg_header

    b = entry._synth_jpeg(w, h, orient)
    assert parse_jpeg_header(b) == (w, h, orient)
    assert parse_jpeg_header(b + junk) == (w, h, orient)


def test_maxsim_expr_partition_invariant(spark):
    """The expr path's per-doc score is a partitioning-independent double:
    MAX is order-insensitive and the query-sum order is literal."""
    import random

    from duckdb_vss_spark.operators.ranking import maxsim_topk

    rnd = random.Random(13)
    rows = [(i % 7, [rnd.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    qs = [[rnd.uniform(-1, 1) for _ in range(6)] for _ in range(3)]
    outs = []
    for parts in (1, 4, 17):
        df = spark.createDataFrame(rows, "doc long, embedding array<float>").repartition(parts)
        outs.append(sorted(
            (r["doc"], r["maxsim"])
            for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method="expr").collect()
        ))
    assert outs[0] == outs[1] == outs[2]  # bit-identical


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=5000),
    st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
)
def test_percent_rank_cut_matches_bruteforce(n, e):
    """rank_split's driver-side IEEE cut (binary search over the exact
    double comparison Spark's percent_rank evaluates) must equal the
    brute-force answer for any n and edge — including edges outside
    [0, 1], n in {0, 1}, and edges landing exactly on a rank's
    (r-1)/(n-1) value."""
    from duckdb_vss_spark.operators.sampling import _percent_rank_cut

    got = _percent_rank_cut(n, e)
    if n == 0:
        assert got == 0
        return
    if n == 1:
        assert got == (1 if 0.0 <= e else 0)
        return
    brute = 0
    for r in range(1, n + 1):
        if (r - 1) / (n - 1) <= e:
            brute = r
        else:
            break
    assert got == brute


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=2, max_value=5000), st.integers(min_value=1, max_value=4999))
def test_percent_rank_cut_exact_boundary(n, r):
    """Feeding a rank's own percent_rank value as the edge must include
    exactly that rank (<= comparison, bit-for-bit)."""
    from duckdb_vss_spark.operators.sampling import _percent_rank_cut

    r = min(r, n)
    e = (r - 1) / (n - 1)
    assert _percent_rank_cut(n, e) >= r
