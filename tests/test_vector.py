"""Vector-column analytics: normalization, group centroids, nearest-centroid
assignment. Numeric truth from numpy on the collected fixture; plan shape
pinned: assignment is a pure projection (no shuffle, no Python)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.vector import group_centroids, nearest_centroid, normalize_vectors


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return ids, mat, labels


def test_normalize_unit_norm(spark, emb):
    out = normalize_vectors(emb, "embedding", out_col="unit")
    norms = out.select(
        F.sqrt(F.aggregate("unit", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))).alias("n")
    ).collect()
    assert all(abs(r["n"] - 1.0) < 1e-5 for r in norms)


def test_normalize_zero_vector_passthrough(spark):
    df = spark.createDataFrame([([0.0, 0.0],), ([3.0, 4.0],)], "v array<float>")
    got = sorted(r["v"] for r in normalize_vectors(df, "v").collect())
    assert got[0] == [0.0, 0.0]
    assert got[1] == pytest.approx([0.6, 0.8], abs=1e-6)


def test_group_centroids_match_numpy(emb, emb_np):
    ids, mat, labels = emb_np
    got = {}
    for r in group_centroids(emb, "embedding", "label").collect():
        got.setdefault(r["group"], {})[r["pos"]] = r["c"]
    for lab in np.unique(labels):
        want = mat[labels == lab].mean(axis=0)
        have = np.array([got[int(lab)][p] for p in range(mat.shape[1])])
        assert np.allclose(have, want, atol=1e-9)


def test_nearest_centroid_matches_numpy(emb, emb_np):
    ids, mat, labels = emb_np
    cents = [(int(lab), mat[labels == lab].mean(axis=0)) for lab in np.unique(labels)]
    out = {
        r["vec_id"]: (r["centroid_id"], r["centroid_dist"])
        for r in nearest_centroid(emb, "embedding", cents, metric="l2sq").collect()
    }
    cmat = np.array([c for _, c in cents])
    cid = np.array([i for i, _ in cents])
    d = np.sqrt(((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2))
    best = d.argmin(axis=1)
    for row, vid in enumerate(ids):
        got_id, got_d = out[int(vid)]
        assert got_id == cid[best[row]]
        assert got_d == pytest.approx(d[row, best[row]], rel=1e-9)


def test_nearest_centroid_tie_breaks_to_smaller_id(spark):
    df = spark.createDataFrame([([1.0, 0.0],)], "v array<float>")
    # two equidistant centroids -> deterministic: smaller id wins
    cents = [(7, [0.0, 1.0]), (3, [0.0, -1.0])]
    r = nearest_centroid(df, "v", cents).collect()[0]
    assert r["centroid_id"] == 3


def test_nearest_centroid_cosine_polarity(spark):
    df = spark.createDataFrame([([1.0, 0.1],)], "v array<float>")
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    r = nearest_centroid(df, "v", cents, metric="cosine", score_col="sim").collect()[0]
    assert r["centroid_id"] == 0
    assert r["sim"] == pytest.approx(1.0 / np.sqrt(1.01), rel=1e-6)


def test_nearest_centroid_is_pure_projection(emb):
    cents = [(i, [float(i)] * 64) for i in range(8)]
    plan = (
        nearest_centroid(emb, "embedding", cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_kmeans_fit_reduces_inertia(spark, emb, emb_np):
    from duckdb_vss_spark.operators.vector import kmeans_fit, kmeans_step

    ids, mat, labels = emb_np
    cents0 = [(i, [float(x) for x in mat[i]]) for i in range(8)]

    def inertia(cents):
        cmat = np.array([c for _, c in cents])
        d = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    one = kmeans_step(emb, "embedding", cents0)
    two = kmeans_step(emb, "embedding", one)
    # Lloyd monotonicity: inertia never increases
    assert inertia(one) <= inertia(cents0) + 1e-9
    assert inertia(two) <= inertia(one) + 1e-9
    fit = kmeans_fit(emb, "embedding", 8, iters=3, id_col="vec_id")
    assert len(fit) == 8 and all(len(v) == mat.shape[1] for _, v in fit)
    assert inertia(fit) <= inertia(two) + 1e-9


def test_kmeans_large_k_uses_gemm_path_and_matches(emb, emb_np):
    """k above the expression ceiling routes through the broadcast-GEMM
    kernel; one step must equal the numpy Lloyd update exactly."""
    from duckdb_vss_spark.operators.vector import kmeans_step

    ids, mat, labels = emb_np
    k = 100  # > _KMEANS_EXPR_MAX_K
    cents0 = [(i, [float(x) for x in mat[i]]) for i in range(k)]
    got = dict(kmeans_step(emb, "embedding", cents0))
    cmat = np.array([v for _, v in cents0])
    d2 = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    for i in range(k):
        members = mat[a == i]
        want = members.mean(axis=0) if len(members) else cmat[i]
        assert np.allclose(got[i], want, atol=1e-9), i


def test_kmeans_step_keeps_empty_cluster_centroid(spark):
    from duckdb_vss_spark.operators.vector import kmeans_step

    df = spark.createDataFrame([([0.0, 0.0],), ([1.0, 1.0],)], "v array<float>")
    far = [99.0, 99.0]
    out = dict(kmeans_step(df, "v", [(0, [0.5, 0.5]), (1, far)]))
    assert out[1] == far  # no members -> centroid unchanged


def test_covariance_matches_numpy(emb, emb_np):
    from duckdb_vss_spark.operators.vector import covariance_matrix

    ids, mat, labels = emb_np
    mean, cov, n = covariance_matrix(emb, "embedding")
    assert n == mat.shape[0]
    assert np.allclose(mean, mat.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(mat, rowvar=False, bias=True), atol=1e-9)


def test_pca_fit_project(emb, emb_np):
    from duckdb_vss_spark.operators.vector import pca_fit, pca_project

    ids, mat, labels = emb_np
    k = 8
    model = pca_fit(emb, "embedding", k)
    comps = model["components"]
    # orthonormal, descending explained variance
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-8)
    assert all(model["explained"][i] >= model["explained"][i + 1] - 1e-12 for i in range(k - 1))
    got = {
        r["vec_id"]: np.array(r["pca"]) for r in pca_project(emb, "embedding", model).collect()
    }
    want = (mat - mat.mean(axis=0)) @ comps.T
    for row, vid in enumerate(ids):
        assert np.allclose(got[int(vid)], want[row], atol=1e-6)
    # per-component projected variance equals the eigenvalue
    proj = np.array([got[int(v)] for v in ids])
    assert np.allclose(proj.var(axis=0), model["explained"], rtol=1e-6)


def test_pca_project_is_pure_projection(emb):
    from duckdb_vss_spark.operators.vector import pca_fit, pca_project

    model = pca_fit(emb, "embedding", 4)
    plan = pca_project(emb, "embedding", model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_group_centroids_single_exchange(emb):
    plan = group_centroids(emb, "embedding", "label")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_avg" in plan or "partial" in plan.lower()  # map-side combine


@pytest.mark.slow  # opt-in: heavy steady-state/property tier (see pytest.ini)
def test_kmeans_fit_init_deterministic_across_partitioning(spark):
    """Without id_col the init must not depend on partition order: content-
    hash ordering gives identical centroids on any layout (VERDICT r3 #4)."""
    from duckdb_vss_spark.operators.vector import kmeans_fit

    rng = np.random.default_rng(5)
    rows = [([float(x) for x in rng.normal(size=8)],) for _ in range(200)]
    df = spark.createDataFrame(rows, "v array<float>")
    a = kmeans_fit(df.repartition(7), "v", 4, iters=2)
    b = kmeans_fit(df.coalesce(1), "v", 4, iters=2)
    for (ida, va), (idb, vb) in zip(a, b):
        assert ida == idb
        assert np.allclose(va, vb, atol=1e-12)


def test_kmeans_large_k_l2_alias_uses_gemm_and_matches(emb, emb_np):
    """metric='l2' (canonical l2sq) above the expression ceiling must route
    through the GEMM kernel and still equal the numpy Lloyd update."""
    from duckdb_vss_spark.operators.vector import kmeans_step

    ids, mat, labels = emb_np
    k = 80  # > _KMEANS_EXPR_MAX_K
    cents0 = [(i, [float(x) for x in mat[i]]) for i in range(k)]
    got = dict(kmeans_step(emb, "embedding", cents0, metric="l2"))
    cmat = np.array([v for _, v in cents0])
    d2 = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    for i in range(k):
        members = mat[a == i]
        want = members.mean(axis=0) if len(members) else cmat[i]
        assert np.allclose(got[i], want, atol=1e-9), i


def test_normalize_norm_hoisted_out_of_element_lambda(emb):
    """The O(d) norm must be bound once per row (outer single-element array
    transform), not inlined per element by CollapseProject — the plan's
    output expression starts transform(array(sqrt(aggregate(...)."""
    out = normalize_vectors(emb, "embedding", out_col="unit")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    squeezed = "".join(plan.split()).lower()
    assert "transform(array(sqrt(aggregate(" in squeezed
