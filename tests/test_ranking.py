"""BM25 ranking: numeric truth vs a pure-Python reference implementation,
plan shape (stats agg + map-only scoring, top-N cut), and edge cases."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.ranking import bm25_rank


def _py_bm25(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75) -> dict[int, float]:
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        out[i] = s
    return out


def test_bm25_matches_python_reference(spark):
    docs = {
        0: "spark joins hash tables fast",
        1: "hash hash hash collisions",
        2: "vector search with graphs",
        3: "the quick brown fox",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_rank(df, "text", "doc_id", ["hash", "vector"]).collect()}
    want = _py_bm25(docs, ["hash", "vector"])
    for i in docs:
        assert got[i] == pytest.approx(want[i], rel=1e-12), i
    # doc 1 is the hash-heaviest, doc 2 the only vector doc; 3 scores 0
    assert got[1] > got[0] > 0
    assert got[2] > 0
    assert got[3] == 0.0


def test_bm25_limit_and_order(spark):
    df = spark.createDataFrame(
        [(i, "data " * (i + 1)) for i in range(10)], "doc_id long, text string"
    )
    rows = bm25_rank(df, "text", "doc_id", ["data"], limit=3).collect()
    assert len(rows) == 3
    assert [r["score"] for r in rows] == sorted((r["score"] for r in rows), reverse=True)


def test_bm25_duplicate_terms_deduped(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "b b b")], "doc_id long, text string")
    once = {r["doc_id"]: r["score"] for r in bm25_rank(df, "text", "doc_id", ["b"]).collect()}
    twice = {r["doc_id"]: r["score"] for r in bm25_rank(df, "text", "doc_id", ["b", "b"]).collect()}
    assert once == twice


def test_bm25_empty_cases(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_rank(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        bm25_rank(df.filter(F.col("doc_id") < 0), "text", "doc_id", ["x"])


def test_bm25_scoring_is_mostly_map_side(spark):
    """The scoring query's only exchange is the top-N cut: scoring itself is
    a projection (TakeOrderedAndProject plans with no shuffle)."""
    df = spark.createDataFrame([(i, "a b") for i in range(20)], "doc_id long, text string")
    plan = (
        bm25_rank(df, "text", "doc_id", ["a"], limit=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------------- tf-idf


def test_tfidf_hand_computed(spark):
    import math

    from duckdb_vss_spark import tfidf_top_terms

    rows = [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date date")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {(r["doc_id"], r["term"]): r for r in tfidf_top_terms(df, "text", "doc_id", top_k=2).collect()}
    # apple: tf=2 df=1 -> 2*ln(3); banana df=2 -> ln(1.5)
    assert out[(1, "apple")]["rank"] == 1
    assert out[(1, "apple")]["tfidf"] == pytest.approx(2 * math.log(3.0), rel=1e-12)
    assert out[(1, "banana")]["rank"] == 2
    assert out[(1, "banana")]["tfidf"] == pytest.approx(math.log(1.5), rel=1e-12)
    # doc 3: date tf=2 df=1 beats cherry df=2
    assert out[(3, "date")]["rank"] == 1 and out[(3, "cherry")]["rank"] == 2


def test_tfidf_tie_breaks_by_term(spark):
    from duckdb_vss_spark import tfidf_top_terms

    df = spark.createDataFrame([(1, "zebra apple"), (2, "other words")], "doc_id: long, text: string")
    out = [r["term"] for r in tfidf_top_terms(df, "text", "doc_id", top_k=2).filter("doc_id = 1").orderBy("rank").collect()]
    assert out == ["apple", "zebra"]  # equal scores -> lexicographic


def test_tfidf_matches_duckdb(spark, ddb):
    import struct

    from duckdb_vss_spark import tfidf_top_terms
    from duckdb_vss_spark.oracle import sql_tfidf_top_terms

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r["doc_id"], r["term"], r["rank"], r["tf"], r["df"], f32(r["tfidf"]))
        for r in tfidf_top_terms(df, "text", "doc_id", top_k=3).collect()
    )
    want = sorted(
        (r[0], r[1], r[2], r[3], r[4], f32(r[5]))
        for r in ddb.execute(sql_tfidf_top_terms("documents", "text", "doc_id", 3)).fetchall()
    )
    assert got == want


def test_tfidf_tf_frame_computed_once(spark):
    """The tf frame feeds both the document-frequency aggregation and the
    join back; without a materialization point the whole tokenize/explode/
    count subtree executes twice (Spark performs no common-subplan dedup).
    Pin the localCheckpoint: both consumers scan the checkpointed RDD and
    the explode subtree is gone from the final plan."""
    from duckdb_vss_spark import tfidf_top_terms

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        tfidf_top_terms(df, "text", "doc_id", top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert "Generate" not in plan, plan
