"""knn_join / knn_match vs duckdb oracle and the reference macro contracts
(reference: test/sql/hnsw/hnsw_join_macro.test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import knn_join, knn_join_flat, knn_match

ORACLE_FLAT = """
WITH j AS (
  SELECT q.vec_id AS qid, i.vec_id AS rid,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_distance(q.embedding::DOUBLE[], i.embedding::DOUBLE[]) {dirn}, i.vec_id
         ) AS rnk,
         list_distance(q.embedding::DOUBLE[], i.embedding::DOUBLE[])::FLOAT AS score
  FROM embeddings q, embeddings i WHERE q.vec_id < 10
)
SELECT qid, rid, rnk, score FROM j WHERE rnk <= 3 ORDER BY qid, rnk
"""


@pytest.mark.parametrize("method", ["kernel", "crossjoin"])
def test_knn_join_flat_matches_duckdb(spark, ddb, emb, method):
    probes = emb.filter(F.col("vec_id") < 10)
    ours = sorted(
        (r["qid"], r["rid"], r["rnk"], float(F_cast(r["score"])))
        for r in knn_join_flat(
            probes, emb, "embedding", "embedding", 3, "l2sq",
            left_id="vec_id", right_id="vec_id", method=method,
        ).collect()
    )
    oracle = sorted(
        (qid, rid, rnk, score)
        for qid, rid, rnk, score in ddb.execute(ORACLE_FLAT.format(dirn="ASC")).fetchall()
    )
    assert [(a, b, c) for a, b, c, _ in ours] == [(a, b, c) for a, b, c, _ in oracle]
    for (_, _, _, s1), (_, _, _, s2) in zip(ours, oracle):
        assert abs(s1 - s2) < 1e-5


def F_cast(x):
    import numpy as np

    return np.float32(x)


def test_knn_join_structs_shape(spark, emb):
    """vss_join output shape: (score FLOAT, left_tbl STRUCT, right_tbl STRUCT)
    (reference: src/hnsw/hnsw_index_macros.cpp:9-16)."""
    probes = emb.filter(F.col("vec_id") < 3)
    out = knn_join(probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id")
    assert [f.name for f in out.schema.fields] == ["score", "left_tbl", "right_tbl"]
    rows = out.collect()
    assert len(rows) == 9  # 3 probes x k=3
    # self-join: best match of each probe is itself at distance 0
    best = {r["left_tbl"]["vec_id"]: r for r in rows if r["score"] == 0.0}
    assert set(best) == {0, 1, 2}


def test_knn_match_shape(spark, emb):
    """vss_match: one row per probe, matches = LIST<STRUCT{score,row}> best-first
    with len(matches) = k (reference: test/sql/hnsw/hnsw_join_macro.test:30-33)."""
    probes = emb.filter(F.col("vec_id") < 5)
    out = knn_match(probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id")
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["matches"]) == 3
        assert r["matches"][0]["row"]["vec_id"] == r["vec_id"]  # self is nearest
        scores = [m["score"] for m in r["matches"]]
        assert scores == sorted(scores)


def test_knn_join_cosine_polarity(spark, emb):
    probes = emb.filter(F.col("vec_id") < 3)
    out = knn_join_flat(
        probes, emb, "embedding", "embedding", 2, "cosine", left_id="vec_id", right_id="vec_id"
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rnk"], r["score"]))
    for q, lst in by_q.items():
        lst.sort()
        assert lst[0][1] >= lst[1][1]  # similarity descending
        assert abs(lst[0][1] - 1.0) < 1e-9  # self-similarity
