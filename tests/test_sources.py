"""Source/sink surface: format round trips, partitioned writes with
partition pruning, bucketed tables that eliminate the join shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.sources import load_tables, read_any, write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_load_tables_registers_views(spark):
    out = load_tables(spark, SF)
    assert set(out) >= {"region", "nation", "lineitem", "embeddings", "documents"}
    assert spark.sql("SELECT count(*) FROM region").collect()[0][0] == out["region"].count()


def test_csv_json_roundtrip(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/nation.parquet")
    write_partitioned(src, str(tmp_path / "n_csv"), fmt="csv")
    write_partitioned(src, str(tmp_path / "n_json"), fmt="json")
    csv = read_any(spark, str(tmp_path / "n_csv"), "csv",
                   schema="n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string")
    js = read_any(spark, str(tmp_path / "n_json"), "json")
    exp = {r["n_nationkey"]: r["n_name"] for r in src.collect()}
    assert {r["n_nationkey"]: r["n_name"] for r in csv.collect()} == exp
    assert {r["n_nationkey"]: r["n_name"] for r in js.collect()} == exp


def test_partitioned_write_prunes(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(src, path, partition_by=["o_year"])
    back = read_any(spark, path)
    one_year = back.filter(F.col("o_year") == 1995)
    plan = _physical(one_year)
    # partition filter must land in the scan, not a post-filter
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters:")[1].splitlines()[0]
    exp = src.filter(F.col("o_year") == 1995).count()
    assert one_year.count() == exp


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.select("o_orderkey", "o_custkey"), "orders_b", ["o_orderkey"], 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the shuffle question
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _physical(j)
        # compatible bucketing: no Exchange on either side of the sort-merge join
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
