"""Connected components / dedup clustering: known graphs, a randomized
differential vs a Python union-find, and the singleton/canonical contract."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r["node"]: r["comp"] for r in connected_components(df).collect()}


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_needs_propagation(spark):
    # a long path exercises multi-round label propagation
    edges = [(i, i + 1) for i in range(9, 0, -1)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 10


def test_cc_matches_union_find_randomized(spark):
    rng = np.random.default_rng(11)
    n, m = 60, 45
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2)) if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical root = min node in component
    want = {}
    for a, b in edges:
        for v in (a, b):
            root = find(v)
            want[v] = min(want.get(v, v), root)
    # normalize: min-label closure means every node maps to min of component
    comp_min: dict = {}
    for v in want:
        comp_min.setdefault(find(v), []).append(v)
    expect = {}
    for root, members in comp_min.items():
        m_ = min(members)
        for v in members:
            expect[v] = m_

    got = _cc(spark, edges)
    assert got == expect


def test_dedup_clusters_contract(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = dedup_clusters(docs, "doc_id", pairs).collect()
    by_id = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    assert by_id == {
        0: (0, True), 3: (0, False), 5: (0, False),
        1: (1, True), 2: (2, True), 4: (4, True),
    }
    # exactly one canonical per cluster
    n_clusters = len({c for c, _ in by_id.values()})
    assert sum(1 for _, canon in by_id.values() if canon) == n_clusters


def test_cc_pointer_jumping_converges_long_chain(spark):
    # a 40-node path has diameter 39; pointer jumping needs ~log2 rounds,
    # so the default max_iter=25 converges where plain propagation would not
    edges = [(i, i + 1) for i in range(39)]
    with np.errstate():  # no warning expected
        got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 40


def test_cc_warns_when_max_iter_exhausted(spark):
    import warnings

    df = spark.createDataFrame([(i, i + 1) for i in range(16)], "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(df, max_iter=1)
        assert any("max_iter" in str(x.message) for x in w)
