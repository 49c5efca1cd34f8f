"""Edge-case battery: NULL vectors, degenerate k, dimension mismatches,
empty inputs — the failure modes a reference user hits first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import VSSEngine, knn_join_flat, min_by_k, topk
from duckdb_vss_spark.functions.distance import array_distance

Q3 = [1.0, 2.0, 3.0]


@pytest.fixture(scope="module")
def small(spark):
    rows = [(0, [1.0, 2.0, 3.0]), (1, [2.0, 2.0, 2.0]), (2, None), (3, [9.0, 9.0, 9.0])]
    return spark.createDataFrame(rows, "id bigint, vec array<float>")


def test_topk_skips_null_vectors(small):
    out = topk(small, "vec", Q3, 10, "l2sq", tiebreak="id").collect()
    assert [r["id"] for r in out] == [0, 1, 3]  # null row excluded, not an error


def test_topk_k_zero_and_k_over_count(small):
    assert topk(small, "vec", Q3, 0, "l2sq").count() == 0
    assert topk(small, "vec", Q3, 100, "l2sq").count() == 3  # k > n: all non-null rows


def test_topk_bad_metric(small):
    with pytest.raises(ValueError, match="Unknown metric"):
        topk(small, "vec", Q3, 2, "manhattan")


def test_min_by_k_k_over_count(small):
    vals = min_by_k(small, "id", array_distance("vec", Q3), 100, tiebreak="id").collect()[0]["values"]
    assert list(vals) == [0, 1, 3]


def test_knn_join_null_probe_and_k_over_count(small):
    out = knn_join_flat(small, small, "vec", "vec", 10, "l2sq", left_id="id", right_id="id").collect()
    qids = {r["qid"] for r in out}
    assert qids == {0, 1, 3}  # null probe row skipped
    assert all(len([r for r in out if r["qid"] == q]) == 3 for q in qids)  # k>n -> n matches


def test_knn_join_empty_probe_side(spark, small):
    empty = small.filter(F.lit(False))
    out = knn_join_flat(empty, small, "vec", "vec", 3, "l2sq", left_id="id", right_id="id")
    assert out.count() == 0


def test_knn_join_missing_ids_raises(small):
    with pytest.raises(ValueError, match="left_id/right_id"):
        knn_join_flat(small, small, "vec", "vec", 3, "l2sq")


def test_index_query_dimension_mismatch(spark, small, tmp_path):
    eng = VSSEngine(spark, index_root=str(tmp_path))
    eng.register_table("edge_t", small)
    idx = eng.create_index("edge_idx", "edge_t", "vec", "id")
    with pytest.raises(ValueError, match="query dimension"):
        idx.search(spark, [1.0, 2.0], 2).collect()


def test_index_build_empty_and_ragged(spark, tmp_path):
    from duckdb_vss_spark.index.ivf import build_ivf

    empty = spark.createDataFrame([], "id bigint, vec array<float>")
    with pytest.raises(ValueError, match="empty vector column"):
        build_ivf(empty, "vec", "id", str(tmp_path / "e"))
    ragged = spark.createDataFrame([(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "id bigint, vec array<float>")
    with pytest.raises(ValueError, match="fixed-size"):
        build_ivf(ragged, "vec", "id", str(tmp_path / "r"))


def test_index_build_skips_null_vectors(spark, small, tmp_path):
    from duckdb_vss_spark.index.ivf import build_ivf

    idx = build_ivf(small, "vec", "id", str(tmp_path / "n"))
    assert idx.manifest["count"] == 3
    hits = idx.search(small.sparkSession, Q3, 10, ef_search=10**6).collect()
    assert sorted(h["id"] for h in hits) == [0, 1, 3]


# -- round-4 operator edges -------------------------------------------------


def test_semdedup_null_vectors_dropped(spark):
    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1])],
        "vec_id bigint, v array<float>",
    )
    out = semdedup(df, "v", "vec_id", centroids=[(0, [1.0, 0.0])], eps=0.99)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3]


def test_semdedup_requires_centroids_or_k(spark):
    import pytest as _pt

    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame([(1, [1.0])], "vec_id bigint, v array<float>")
    with _pt.raises(ValueError):
        semdedup(df, "v", "vec_id")


def test_dsir_empty_target_is_uniformly_smoothed(spark):
    """An empty target corpus degenerates to the pure smoothing model:
    weights still compute (no NaN/crash) and selection stays total."""
    from duckdb_vss_spark import dsir_resample

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha gamma")],
        "doc_id long, text string",
    )
    out = dsir_resample(docs, "text", "doc_id", docs.filter("doc_id < 0"), k=2).collect()
    assert len(out) == 3
    assert sum(1 for r in out if r["keep"]) == 2
    assert all(r["log_w"] == r["log_w"] for r in out)  # no NaN


def test_classifier_requires_id_for_external_weights(spark):
    import pytest as _pt

    from duckdb_vss_spark import classifier_score

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    w = spark.createDataFrame([(0, 0.1)], "bucket long, w double")
    with _pt.raises(ValueError):
        classifier_score(df, "text", weights_df=w)


def test_dsir_invalid_buckets(spark):
    import pytest as _pt

    from duckdb_vss_spark import dsir_weights

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError):
        dsir_weights(df, "text", "doc_id", df, buckets=0)


def test_semdedup_zero_vector_matches_join_path(spark):
    """cos with a zero vector is NaN, which both engines order above every
    double — kernel and relational paths must agree on the removals."""
    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id bigint, v array<float>",
    )
    cents = [(0, [1.0, 0.0])]
    a = sorted(map(tuple, semdedup(df, "v", "vec_id", centroids=cents, eps=0.99).collect()))
    b = sorted(
        map(tuple, semdedup(df, "v", "vec_id", centroids=cents, eps=0.99, method="join").collect())
    )
    assert a == b


def test_semdedup_cosine_metric_farthest_wins(spark):
    """With a similarity assignment metric the marginality key must still
    mean farther-is-kept: of two near-dup docs, the one LESS similar to
    the centroid survives."""
    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6])], "vec_id bigint, v array<float>"
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(
            df, "v", "vec_id", centroids=[(0, [1.0, 0.0])], eps=0.75, metric="cosine"
        ).collect()
    }
    # cos(1,2)=0.8 >= eps; doc 2 is farther from the centroid -> doc 2 kept
    assert out == {1: False, 2: True}


def test_semdedup_double_vectors_match_join_path(spark):
    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.96, 0.28]), (3, [0.0, 1.0])],
        "vec_id bigint, v array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    a = sorted(map(tuple, semdedup(df, "v", "vec_id", centroids=cents, eps=0.9).collect()))
    b = sorted(
        map(tuple, semdedup(df, "v", "vec_id", centroids=cents, eps=0.9, method="join").collect())
    )
    assert a == b


def test_semdedup_bad_method_rejected(spark):
    import pytest as _pt

    from duckdb_vss_spark import semdedup

    df = spark.createDataFrame([(1, [1.0])], "vec_id bigint, v array<float>")
    with _pt.raises(ValueError):
        semdedup(df, "v", "vec_id", centroids=[(0, [1.0])], method="relational")


def test_dsir_null_text_dropped_not_crashed(spark):
    from duckdb_vss_spark import dsir_weights

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "gamma delta")], "doc_id long, text string"
    )
    out = dsir_weights(df, "text", "doc_id", df.filter("doc_id = 1"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_classifier_weights_path_preserves_columns(spark):
    from duckdb_vss_spark import classifier_score

    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "fr")], "doc_id long, text string, lang string"
    )
    w = spark.createDataFrame([(7, 0.5)], "bucket long, w double")
    out = classifier_score(df, "text", id_col="doc_id", weights_df=w)
    assert set(out.columns) == {"doc_id", "text", "lang", "clf_score"}
    assert out.count() == 2


def test_column_memo_reuses_and_matches_fresh_build(spark):
    """The session Column memo returns the SAME unresolved fragment for a
    repeated (builder, column-name, constants) key, a DIFFERENT build for
    Column-object arguments, and a memoized expression computes exactly
    what a fresh build computes."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.functions import text as T

    c1 = T.word_ngrams("text", 3)
    c2 = T.word_ngrams("text", 3)
    assert c1 is c2  # memo hit: same key -> same Column handle
    assert T.word_ngrams("text", 2) is not c1  # constants are part of the key
    # Column-object arguments must NOT be memoized (they bind a frame)
    assert T.word_ngrams(F.col("text"), 3) is not c1

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e"), (3, None)], "doc_id long, text string"
    )
    memod = df.select("doc_id", c1.alias("g")).collect()
    fresh = df.select("doc_id", T.word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert sorted(map(tuple, memod)) == sorted(map(tuple, fresh))
    # one memoized Column used twice in ONE plan stays analyzable
    twice = df.select(c1.alias("g1"), F.size(c1).alias("n")).collect()
    assert len(twice) == 3


def test_column_memo_epoch_is_session_scoped():
    """The memo key embeds the live JVM context identity, so entries from
    another (or a restarted) session can never be returned."""
    from duckdb_vss_spark.functions.text import _COL_MEMO, _session_epoch, memo_column

    ep = _session_epoch()
    built = []
    col = memo_column(("__memo_test__",), lambda: built.append(1) or "sentinel")
    if ep is None:
        # no active context in this worker: memo must fall through to build
        assert built == [1]
    else:
        assert ((ep, ("__memo_test__",)) in _COL_MEMO) and built == [1]
        # a different epoch (simulating a restarted session) misses
        assert (("other-epoch", ("__memo_test__",)) not in _COL_MEMO)
