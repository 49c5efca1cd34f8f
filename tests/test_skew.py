"""Salted aggregation/join must return exactly the unsalted results, and
char_ngrams must match its one-shot definition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.skew import salted_agg, salted_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key."""
    base = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    return base.cache()


def test_salted_agg_equals_plain(skewed):
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"], {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")}
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1])
        assert got[k][2:] == exp[k][2:]


def test_salted_join_equals_plain(skewed, spark):
    dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    got = salted_join(skewed, dim, "k", salt=8).groupBy("k").agg(F.count("*").alias("n"), F.sum("w").alias("sw"))
    exp = skewed.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"), F.sum("w").alias("sw"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_join_left(skewed, spark):
    dim = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    got = salted_join(skewed, dim, "k", salt=4, how="left").count()
    exp = skewed.join(dim, "k", "left").count()
    assert got == exp


def test_char_ngrams_matches_python(spark):
    from duckdb_vss_spark.functions.text import char_ngrams

    texts = ["Hello, World!", "a", "", "aa bb cc dd", "The quick brown fox."]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: list(r["g"]) for r in df.select("i", char_ngrams("t", 3).alias("g")).collect()}

    def norm(s):
        import re

        s = re.sub(r"[^a-z0-9]+", " ", s.lower())
        return re.sub(r" +", " ", s).strip()

    for i, t in enumerate(texts):
        c = norm(t)
        if len(c) == 0:
            # split('', '') yields one empty-string char in Spark
            continue
        exp = sorted({c[j : j + 3] for j in range(max(1, len(c) - 2))})
        assert got[i] == exp, (i, t, c)
