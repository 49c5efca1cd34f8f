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


def events_ts_unit(path: str) -> str:
    """Physical unit of the ``ts`` column in an events parquet file.

    Fixture generations have stored either TIMESTAMP(NANOS) — which Spark's
    reader only accepts via ``nanosAsLong`` — or plain TIMESTAMP(MICROS).
    Peeking at the footer (driver-side, one small read) lets both loaders
    pick the right read path instead of hard-coding one generation's layout.
    """
    try:
        import pyarrow.parquet as pq

        t = str(pq.read_schema(path).field("ts").type)
    except Exception:
        return "us"
    return "ns" if t.startswith("timestamp[ns") or t == "int64" else "us"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F

        path = os.path.join(sf_dir, "events.parquet")
        if events_ts_unit(path) == "ns":
            # TIMESTAMP(NANOS) fixture: read nanos as long and floor to
            # micros (duckdb applies the same ns->us truncation)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            ev = spark.read.parquet(path)
            return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # TIMESTAMP(MICROS) fixture: arrives as TIMESTAMP_NTZ; cast to the
        # session timestamp type (wall clock preserved) so downstream
        # window/watermark code sees one consistent type either way
        ev = spark.read.parquet(path)
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True) -> dict:
    """Load every fixture table; optionally register temp views so the SQL
    surface (``spark.sql``) sees the same names the duckdb oracle uses."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            out[name] = df
            if register:
                df.createOrReplaceTempView(name)
    return out


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching reader: parquet / csv / json / orc / text.

    Schema discipline: pass an explicit ``schema`` whenever the format can't
    carry one (csv/json) — inference costs an extra full scan and is
    nondeterministic under schema drift; at 100 TB both are bugs. Parquet/ORC
    scans get predicate pushdown + column pruning from Catalyst for free
    (asserted in tests/test_plans.py).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned sink: directory-partitioned columnar output.

    ``partition_by`` keys become directory levels that downstream scans prune
    (the mechanism the IVF index artifact uses for its inverted lists).
    ``max_records_per_file`` caps file sizes so a skewed partition key cannot
    produce one giant file (small-file/giant-file balance is the #1 sink
    issue at scale)."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into ``num_buckets``
    hash buckets on ``bucket_by`` so later equi-joins / aggregations on those
    keys skip their shuffle entirely (Catalyst recognizes compatible
    bucketing). This is the co-located-join strategy for repeatedly-joined
    100 TB fact tables."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column in ``cols`` (non-negative integers — pre-bucket continuous
    values first, e.g. ``ntile`` or fixed-width binning). Bit ``i`` of
    column ``j`` lands at position ``i * len(cols) + j``, so nearby
    points in ALL dimensions get nearby keys.

    Pure JVM integer expressions (shift/and/or — whole-stage codegen, no
    UDF), exact at any scale: the positions are disjoint so the OR-sum is
    a plain sum, and ``len(cols) * bits`` must fit a signed 64-bit key
    (validated).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key requires at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits = {n*bits} > 63 key bits")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            key = key + F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
    return key


def write_zordered(
    df: DataFrame,
    cols,
    path: str,
    n_files: int = 64,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` laid out along the Z-order curve of ``cols`` — the
    multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER
    shape): range-partition by the Morton key, sort within each file, drop
    the key. Parquet's per-file and per-rowgroup min/max stats on the
    ORIGINAL columns then become tight for every interleaved dimension, so
    a reader's multi-column box filter prunes files/rowgroups it could
    not prune under a single-column sort (where only the leading column's
    stats are selective).

    At 100 TB this is the difference between a box query scanning the
    whole table and scanning ~(selectivity)^(1/n_dims) of it; the write
    itself is one range exchange (sampled bounds) + per-task sort — the
    same cost as any global sort-write.
    """
    z = zorder_key(cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


from .warc import parse_warc_bytes, read_warc  # noqa: E402,F401
