"""Table sources: parquet readers for the driver's test fixtures and a
general registry.

The reference consumes plain table scans (every rewrite requires a
``seq_scan`` child, reference: src/hnsw/hnsw_optimize_scan.cpp:78); our
equivalent source is a parquet scan — Catalyst gives predicate pushdown,
column pruning and partition pruning for free on top of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True) -> dict:
    """Load every fixture table; optionally register temp views so the SQL
    surface (``spark.sql``) sees the same names the duckdb oracle uses."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            out[name] = df
            if register:
                df.createOrReplaceTempView(name)
    return out
