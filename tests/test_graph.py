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


# ---------------------------------------------------------------- pagerank


def _pr_bucket(src) -> int:
    import hashlib

    from duckdb_vss_spark.operators.graph import PAGERANK_FOLD_BUCKETS

    h = int(hashlib.md5(f"prb:{src}".encode()).hexdigest()[:15], 16)
    return h % PAGERANK_FOLD_BUCKETS


def _py_pagerank(edges, iters=3, d=0.85):
    from collections import Counter, defaultdict

    deg = Counter(s for s, _ in edges)
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    r = {n: 1.0 for n in nodes}
    for _ in range(iters):
        inc = defaultdict(list)
        for s, t in edges:
            inc[t].append((s, r[s] / deg[s]))
        nr = {}
        for n in nodes:
            # two-level fold, matching the engine's de-skewed shape: inner
            # fold in source order within each salt bucket, outer fold in
            # bucket order
            buckets = defaultdict(list)
            for s, c in inc.get(n, []):
                buckets[_pr_bucket(s)].append((s, c))
            acc = 0.0
            for b in sorted(buckets):
                bs = 0.0
                for _, c in sorted(buckets[b]):
                    bs += c
                acc += bs
            nr[n] = (1.0 - d) + d * acc
        r = nr
    return r


def test_pagerank_matches_python_reference(spark):
    from duckdb_vss_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3)]  # incl. parallel edge
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == want[n], (n, got[n], want[n])  # bit-exact fold
    # node 4 is never a destination: rank stays at the reset floor
    assert got[4] == (1.0 - 0.85)


def test_pagerank_dangling_and_sink(spark):
    from duckdb_vss_spark.operators.graph import pagerank

    # 1 -> 2, 2 has no out-edges (sink): GraphX static semantics, no
    # redistribution — sink accumulates, source decays to the floor
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=2).collect()}
    assert got[1] == (1.0 - 0.85)  # nothing points at 1
    want = _py_pagerank([(1, 2)], iters=2)
    assert got == want


def test_pagerank_partition_invariant(spark):
    from duckdb_vss_spark.operators.graph import pagerank

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    a = sorted((r["id"], r["rank"]) for r in pagerank(df1, iters=4).collect())
    b = sorted((r["id"], r["rank"]) for r in pagerank(df2, iters=4).collect())
    assert a == b  # bit-identical at any partitioning (ordered folds)


def test_pagerank_validation(spark):
    from duckdb_vss_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)


def test_pagerank_hub_node_de_skewed(spark):
    """A web hub with very high in-degree must not materialize its full
    in-edge contribution list on one reducer: the fold is two-level
    (salt buckets by hash64(src) -> per-bucket ordered fold -> ordered
    fold of bucket sums). Functional check: 1M distinct sources each with
    out-degree 1 pointing at one hub — every contribution is exactly 1.0,
    so the rank is exact regardless of association: 0.15 + 0.85 * 1e6."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.operators.graph import pagerank

    n = 1_000_000
    edges = spark.range(1, n + 1).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    got = {r["id"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    assert got[0] == (1.0 - 0.85) + 0.85 * float(n)
    assert got[1] == (1.0 - 0.85)


def test_pagerank_plan_has_bucketed_fold(spark):
    """Plan-shape pin (test_plans.py discipline): the contribution
    aggregation must group by (dst, salt bucket) before any collect_list —
    no aggregate may collect the full per-destination in-edge set."""
    from duckdb_vss_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    old = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    try:
        plan = (
            pagerank(df, iters=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", old)
    assert "collect_list" in plan
    # every collect_list over per-source contributions carries the salt
    # bucket in its grouping keys; the outer fold collects only bucket sums
    saw_inner = saw_outer = False
    for line in plan.splitlines():
        if "collect_list(struct(__src" in line:
            saw_inner = True
            assert "__b#" in line.split("functions=")[0], line  # bucket in keys
        if "collect_list(struct(__b," in line:
            saw_outer = True
    assert saw_inner and saw_outer, plan
