from __future__ import annotations

import math

import duckdb
import pytest

from duckdb_vss_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vss-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in ("embeddings", "documents", "events", "lineitem", "orders", "customer",
              "part", "supplier", "nation", "region"):
        for sf, prefix in ((SF_DIR, ""), (SF01_DIR, "sf01_")):
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
    yield con
    con.close()


@pytest.fixture(scope="session")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="session")
def grid(spark):
    """The reference's canonical 9x9x9 grid fixture
    (reference: test/sql/hnsw/hnsw_basic.test:13-16)."""
    rows = [([float(a), float(b), float(c)],) for a in range(1, 10) for b in range(1, 10) for c in range(1, 10)]
    return spark.createDataFrame(rows, "vec: array<float>")


def assert_close(a, b, tol=1e-5):
    assert math.isclose(a, b, rel_tol=tol, abs_tol=tol), (a, b)
