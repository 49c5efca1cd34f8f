"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare row-count, schema
shape, and order-insensitive values against ``oracle_sql()`` via duckdb."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple, dict)):
        # The driver's canonicalizer cannot hash container values (round-1
        # q05/q08/q28 failures): mirror that restriction so regressions are
        # caught locally instead of in CORRECTNESS_r{N}.json.
        raise AssertionError(f"array/struct-typed output value not hashable by the driver: {v!r}")
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb01():
    con = duckdb.connect()
    for t in ("embeddings", "documents", "events", "lineitem", "orders", "customer",
              "part", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb01, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    df = q(spark, SF_DIR)
    ours_cols = df.columns
    ours = [[row[c] for c in ours_cols] for row in df.collect()]
    if name not in sqls:
        assert len(ours) >= 0  # weaker rows-only check, mirrors the driver
        return
    res = ddb01.execute(sqls[name])
    oracle_cols = [d[0] for d in res.description]
    oracle = res.fetchall()
    assert sorted(ours_cols) == sorted(oracle_cols), (ours_cols, oracle_cols)
    assert len(ours) == len(oracle), f"row count {len(ours)} != {len(oracle)}"
    assert _rowset(ours_cols, ours) == _rowset(oracle_cols, oracle)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
