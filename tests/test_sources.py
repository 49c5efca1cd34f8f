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


# ---------------------------------------------------------------- z-order


def test_zorder_key_bit_interleave(spark):
    """Morton key vs a direct python interleave, incl. validation."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.sources import zorder_key

    df = spark.range(0, 512).select(
        (F.col("id") % 23).alias("a"), (F.col("id") / 23).cast("long").alias("b"), "id"
    )
    got = {r["id"]: r["z"] for r in df.withColumn("z", zorder_key(["a", "b"], bits=9)).collect()}

    def pyz(a, b, bits=9):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[i] == pyz(i % 23, i // 23) for i in range(512))
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=8)
    with pytest.raises(ValueError, match="63 key bits"):
        zorder_key(["a", "b"], bits=32)


def test_write_zordered_concentrates_box_queries(spark, tmp_path):
    """The data-skipping claim, measured: a 2-d box filter over a uniform
    grid touches a small fraction of the z-ordered files but essentially
    all of the randomly-laid-out ones (file-level min/max on BOTH columns
    are tight only under the interleaved sort)."""
    import random

    from pyspark.sql import functions as F

    from duckdb_vss_spark.sources import write_zordered

    rng = random.Random(3)
    rows = [(rng.randrange(256), rng.randrange(256), k) for k in range(50_000)]
    data = spark.createDataFrame(rows, "x long, y long, k long")
    rand_dir, z_dir = str(tmp_path / "rand"), str(tmp_path / "zord")
    data.repartition(32).write.parquet(rand_dir)
    write_zordered(data, ["x", "y"], z_dir, n_files=32, bits=8)

    def probe(path):
        d = spark.read.parquet(path).filter(
            "x >= 32 and x < 64 and y >= 96 and y < 128"
        )
        return d.select(F.input_file_name()).distinct().count(), d.count()

    fr, nr = probe(rand_dir)
    fz, nz = probe(z_dir)
    assert nr == nz  # layout never changes results
    assert fz <= fr / 4  # matches concentrate in few files
    # roundtrip is lossless
    back = spark.read.parquet(z_dir)
    assert back.count() == 50_000
    assert back.agg(F.sum("k")).first()[0] == sum(k for _, _, k in rows)
