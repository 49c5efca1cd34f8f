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


# ---------------------------------------------------------------- rrf_fuse


def test_rrf_fuse_matches_python_reference(spark):
    """RRF of two hand-built shortlists vs a direct python computation:
    ranks are per-list (score desc, id asc), rrf = sum 1/(k+rank)."""
    from duckdb_vss_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 7.0)], "id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "id long, score double"
    )
    out = {r["id"]: (r["rrf_score"], r["n_lists"])
           for r in rrf_fuse({"a": a, "b": b}, "id", k=60).collect()}
    ra = {1: 1, 2: 2, 3: 3, 4: 4}  # tie 7.0 broken by id: 3 before 4
    rb = {3: 1, 5: 2, 1: 3}
    for i in {1, 2, 3, 4, 5}:
        want = sum(1.0 / (60 + r[i]) for r in (ra, rb) if i in r)
        n = sum(1 for r in (ra, rb) if i in r)
        assert out[i][1] == n
        assert abs(out[i][0] - want) < 1e-15
    # ordering: best-first by fused score
    ordered = [r["id"] for r in rrf_fuse({"a": a, "b": b}, "id", k=60, limit=3).collect()]
    ranked = sorted(out, key=lambda i: (-out[i][0], i))[:3]
    assert ordered == ranked


def test_rrf_fuse_single_list_and_empty(spark):
    from duckdb_vss_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 2.0), (2, 1.0)], "id long, score double")
    out = rrf_fuse({"only": a}, "id").collect()
    assert [r["id"] for r in out] == [1, 2]
    assert all(r["n_lists"] == 1 for r in out)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({}, "id")


# ---------------------------------------------------------------- mmr_rerank


def _py_mmr(vecs: dict[int, list[float]], q: list[float], k: int, lam: float, pool: int):
    import math as m

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = m.sqrt(sum(x * x for x in a)); nb = m.sqrt(sum(y * y for y in b))
        return d / (na * nb) if na > 0 and nb > 0 else 0.0

    rel = {i: cos(v, q) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    sel = []
    remaining = sorted(cand)
    while remaining and len(sel) < k:
        best, bs = None, None
        for d in remaining:
            red = max((cos(vecs[d], vecs[s]) for s, _ in sel), default=None)
            s = rel[d] if red is None else lam * rel[d] - (1 - lam) * red
            if bs is None or s > bs:
                best, bs = d, s
        sel.append((best, bs)); remaining.remove(best)
    return sel, rel


def test_mmr_rerank_matches_python_reference(spark):
    """Greedy MMR over a small crafted set: the first pick is the most
    relevant; the second pick skips the near-duplicate of the first even
    though it is the second-most relevant."""
    from duckdb_vss_spark.operators.ranking import mmr_rerank

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.999, 0.01, 0.0],   # near-dup of 1, second-most relevant
        3: [0.6, 0.6, 0.0],
        4: [0.0, 1.0, 0.0],
        5: [0.5, 0.0, 0.8],
    }
    q = [1.0, 0.05, 0.1]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = mmr_rerank(df, "embedding", "vec_id", q, k=3, lam=0.5, pool=5)
    got = [(r["mmr_rank"], r["vec_id"]) for r in out.collect()]
    # float32 storage: recompute the reference over the f32-rounded vectors
    import struct as st
    f32 = lambda xs: [st.unpack("f", st.pack("f", x))[0] for x in xs]
    want, rel = _py_mmr({i: f32(v) for i, v in vecs.items()}, q, 3, 0.5, 5)
    assert got == [(j + 1, d) for j, (d, _) in enumerate(want)]
    # diversification actually bites: picks 1 and 2 are near-dups, so after
    # one of them wins on pure relevance the other must NOT be second
    assert got[0][1] in (1, 2) and got[1][1] not in (1, 2)
    scores = {r["vec_id"]: r["mmr_score"] for r in out.collect()}
    for j, (d, s) in enumerate(want):
        assert abs(scores[d] - s) < 1e-9


def test_mmr_rerank_edges(spark):
    from duckdb_vss_spark.operators.ranking import mmr_rerank

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    # null vectors skipped; k > pool size returns everything non-null
    out = mmr_rerank(df, "embedding", "vec_id", [1.0, 0.2], k=10, pool=10).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2]
    with pytest.raises(ValueError, match="k > 0"):
        mmr_rerank(df, "embedding", "vec_id", [1.0, 0.0], k=0)
    with pytest.raises(ValueError, match="0 <= lam <= 1"):
        mmr_rerank(df, "embedding", "vec_id", [1.0, 0.0], k=1, lam=1.5)


# ---------------------------------------------------------------- hybrid_topk


def test_hybrid_topk_engine(spark, tmp_path):
    """One-call hybrid retrieval: identical fused results with and without
    an ANN index at full probe (the index only changes the vector
    shortlist's plan, not its rows), and the MMR finisher returns a
    selection frame over the fused pool."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark import VSSEngine
    from duckdb_vss_spark.functions.text import hashed_embedding

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tbl = docs.select(
        "doc_id", "text", hashed_embedding("text", dim=64).alias("emb")
    )
    eng = VSSEngine(spark, index_root=str(tmp_path / "idx"))
    eng.register_table("hdocs", tbl)
    q = [((i * 5) % 13) / 13.0 for i in range(64)]
    terms = ["hash", "join"]
    base = eng.hybrid_topk("hdocs", "emb", "doc_id", q, terms, k=10, pool=30)
    rows = base.collect()
    assert len(rows) == 10
    assert rows == sorted(rows, key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert {r["n_lists"] for r in rows} <= {1, 2}

    # full-probe index path returns the same fused rows
    eng.create_index("hyb_idx", "hdocs", "emb", "doc_id", options={"metric": "cosine"})
    eng.set_ef_search(10**6)
    with_idx = eng.hybrid_topk("hdocs", "emb", "doc_id", q, terms, k=10, pool=30).collect()
    assert [(r["doc_id"], r["rrf_score"]) for r in rows] == [
        (r["doc_id"], r["rrf_score"]) for r in with_idx
    ]

    # MMR finisher: k rows in selection order over the fused pool
    div = eng.hybrid_topk(
        "hdocs", "emb", "doc_id", q, terms, k=5, pool=30, mmr_lambda=0.5
    ).collect()
    assert [r["mmr_rank"] for r in div] == [1, 2, 3, 4, 5]
    fused_ids = {r["doc_id"] for r in eng.hybrid_topk("hdocs", "emb", "doc_id", q, terms, k=5, pool=30).collect()}
    assert {r["doc_id"] for r in div} <= fused_ids


def test_mmr_rerank_string_ids_and_zero_vectors(spark):
    """Review follow-ups: the output schema derives the id type from the
    input (string ids — the web-corpus case — must work), and zero-norm
    vectors (NaN cosine) must not hijack the pool cut or the greedy
    argmax."""
    from duckdb_vss_spark.operators.ranking import mmr_rerank

    df = spark.createDataFrame(
        [
            ("https://a/1", [1.0, 0.0]),
            ("https://a/2", [0.8, 0.6]),
            ("https://a/3", [0.0, 0.0]),  # zero vector -> NaN relevance
        ],
        "url string, embedding array<float>",
    )
    out = mmr_rerank(df, "embedding", "url", [1.0, 0.1], k=3, lam=0.5)
    rows = out.collect()
    assert [r["url"] for r in rows][:1] == ["https://a/1"]
    assert {r["url"] for r in rows} == {"https://a/1", "https://a/2"}  # zero vec excluded
    assert dict(out.dtypes)["url"] == "string"


# ---------------------------------------------------------------------------
# maxsim (ColBERT late interaction)
# ---------------------------------------------------------------------------


def _py_maxsim(docs: dict[int, list[list[float]]], qs: list[list[float]]) -> dict[int, float]:
    """Pure-Python reference: sum_i max_j <q_i, d_j>, dots left-to-right."""
    out = {}
    for d, toks in docs.items():
        s = 0.0
        for q in qs:
            best = None
            for t in toks:
                dot = 0.0
                for a, b in zip(t, q):
                    dot += float(a) * float(b)
                if best is None or dot > best:
                    best = dot
            s += best
        out[d] = s
    return out


def _maxsim_fixture(spark):
    docs = {
        0: [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        1: [[0.5, 0.5, 0.0], [0.25, 0.0, 0.75], [0.0, 0.0, 1.0]],
        2: [[-1.0, -1.0, -1.0]],
        3: [[0.125, 0.375, 0.5], [0.875, 0.0625, 0.0]],
    }
    rows = [(d, t) for d, toks in docs.items() for t in toks]
    df = spark.createDataFrame(rows, "doc long, embedding array<float>")
    qs = [[1.0, 0.5, 0.0], [0.0, 0.25, 0.75]]
    return docs, df, qs


def test_maxsim_expr_known_answer(spark):
    from duckdb_vss_spark.operators.ranking import maxsim_topk

    docs, df, qs = _maxsim_fixture(spark)
    want = _py_maxsim(docs, qs)
    got = {r["doc"]: r["maxsim"] for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method="expr").collect()}
    assert set(got) == set(docs)
    for d in docs:
        assert got[d] == want[d], d  # expr path is bit-exact vs sequential sum
    # ordering: score desc, doc asc
    rows = maxsim_topk(df, "embedding", "doc", qs, k=2, method="expr").collect()
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc"], r["maxsim"]) for r in rows] == ranked


def test_maxsim_kernel_matches_expr(spark):
    from duckdb_vss_spark.operators.ranking import maxsim_topk

    docs, df, qs = _maxsim_fixture(spark)
    df = df.repartition(4)
    e = {r["doc"]: r["maxsim"] for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method="expr").collect()}
    kk = {r["doc"]: r["maxsim"] for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method="kernel").collect()}
    assert set(e) == set(kk)
    for d in e:
        assert kk[d] == pytest.approx(e[d], rel=1e-12, abs=1e-15), d


def test_maxsim_kernel_nan_propagates(spark):
    """A NaN similarity (e.g. from a NaN component) must win the max on the
    kernel path exactly as Spark's NaN-is-greatest F.max does on the expr
    path, regardless of which batch/partition the NaN row lands in."""
    import math

    from duckdb_vss_spark.operators.ranking import maxsim_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [float("nan"), 1.0]), (1, [0.5, 0.5])],
        "doc long, embedding array<float>",
    ).repartition(3)
    qs = [[1.0, 1.0]]
    for method in ("expr", "kernel"):
        got = {r["doc"]: r["maxsim"] for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method=method).collect()}
        assert math.isnan(got[0]), method
        assert got[1] == pytest.approx(1.0), method


def test_maxsim_expr_plan_is_codegen(spark):
    """The expr map side must be pure codegen projections — no Python eval
    — and the only exchange is the per-doc partial max."""
    from duckdb_vss_spark.operators.ranking import maxsim_topk

    df = spark.createDataFrame([(0, [1.0, 0.0])], "doc long, embedding array<float>")
    plan = maxsim_topk(df, "embedding", "doc", [[1.0, 0.5]], k=5, method="expr")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max" in plan or "max" in plan


def test_maxsim_matches_duckdb(spark, ddb):
    """Entry-gate twin in miniature: expr path vs duckdb list_inner_product
    over DOUBLE[], equal under the driver's 9-significant-digit
    canonicalization (duckdb's SIMD accumulation differs in the last ulp)."""
    import random

    rnd = random.Random(7)
    rows = [(i // 3, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc long, embedding array<float>")
    qs = [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(2)]
    from duckdb_vss_spark.operators.ranking import maxsim_topk

    got = {r["doc"]: r["maxsim"] for r in maxsim_topk(df, "embedding", "doc", qs, k=10, method="expr").collect()}
    ddb.execute("CREATE OR REPLACE TABLE msim(doc BIGINT, embedding FLOAT[])")
    ddb.executemany("INSERT INTO msim VALUES (?, ?)", rows)
    q_sql = ["[" + ",".join(repr(x) for x in q) + "]::DOUBLE[]" for q in qs]
    want = dict(
        ddb.execute(
            f"""
        SELECT doc, (m0 + m1) AS maxsim FROM (
          SELECT doc,
                 max(list_inner_product(embedding::DOUBLE[], {q_sql[0]})) AS m0,
                 max(list_inner_product(embedding::DOUBLE[], {q_sql[1]})) AS m1
          FROM msim GROUP BY doc
        ) ORDER BY maxsim DESC, doc LIMIT 10
        """
        ).fetchall()
    )
    canon = lambda d: {k: float(f"{v:.9g}") for k, v in d.items()}  # noqa: E731
    assert canon(got) == canon(want)
