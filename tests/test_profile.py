"""corpus_stats (operators/profile.py): exact per-stratum profile vs the
duckdb oracle, approx-vocab mode, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import corpus_stats
from duckdb_vss_spark.oracle import sql_token_count, sql_tokens

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_corpus_stats_matches_oracle(docs, ddb):
    got = sorted(
        tuple(r)
        for r in corpus_stats(docs, "text", "lang").collect()
    )
    nt = sql_token_count("text")
    want = sorted(
        tuple(r)
        for r in ddb.execute(
            f"""
            WITH s AS (
                SELECT lang AS stratum, count(*) AS n_docs,
                       sum({nt})::BIGINT AS total_tokens,
                       (sum({nt})::DOUBLE / count(*))::FLOAT AS mean_tokens,
                       quantile_cont({nt}, 0.5)::FLOAT AS p50_tokens,
                       quantile_cont({nt}, 0.9)::FLOAT AS p90_tokens,
                       quantile_cont({nt}, 0.99)::FLOAT AS p99_tokens
                FROM documents GROUP BY lang
            ), v AS (
                SELECT stratum, count(DISTINCT tok) AS vocab FROM (
                    SELECT lang AS stratum, unnest({sql_tokens('text')}) AS tok
                    FROM documents) GROUP BY stratum
            )
            SELECT s.*, v.vocab FROM s JOIN v USING (stratum)
            """
        ).fetchall()
    )
    assert got == want


def test_corpus_stats_approx_vocab(docs):
    exact = {r["stratum"]: r["vocab"] for r in corpus_stats(docs, "text", "lang").collect()}
    approx = {r["stratum"]: r["vocab"] for r in corpus_stats(docs, "text", "lang", approx_vocab=True).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.15, (k, v, approx[k])


def test_corpus_stats_stays_jvm(docs):
    plan = corpus_stats(docs, "text", "lang")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
