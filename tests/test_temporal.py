"""Temporal operators: sessionization, as-of join, banded range join.

Correctness is checked two ways: hand-built micro-fixtures with known
answers (tie/boundary semantics), and equivalence against the naive
inequality-join / window formulation on the sf0.001 events fixture. Plan
shape is pinned: the as-of join must contain NO join operator at all (one
window shuffle), and the range join must never degrade to a cartesian.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.operators.temporal import asof_join, range_join_banded, sessionize_batch
from duckdb_vss_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").cache()


# -- sessionize -------------------------------------------------------------


def test_sessionize_known_sessions(spark):
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),   # within 30m -> same session
        (1, _ts(50), 4.0),   # 40m gap -> new session
        (2, _ts(5), 8.0),    # other user: own session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sv"])
        for r in sessionize_batch(df, "user_id", "ts", "30 minutes", agg={"sv": F.sum("value")}).collect()
    }
    assert got == {
        (1, _ts(0)): (2, 3.0),
        (1, _ts(50)): (1, 4.0),
        (2, _ts(5)): (1, 8.0),
    }


def test_sessionize_partitions_events_exactly(spark, events):
    out = sessionize_batch(events, "user_id", "ts", "30 minutes")
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # sessions of one user never overlap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        out.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
        .count()
    )
    assert overlaps == 0


# -- asof join --------------------------------------------------------------


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(10), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(10), 200), (1, _ts(20), 300), (3, _ts(1), 900)],
        "k long, ts timestamp, rv int",
    )
    got = {
        r["tag"]: (r["rv"], r["ts_r"])
        for r in asof_join(left, right, "k", right_cols=["rv", "ts"]).collect()
    }
    # inclusive: the equal-ts right row (ts=10) matches left ts=10
    assert got["a"] == (200, _ts(10))
    assert got["b"] == (300, _ts(20))
    assert got["c"] == (None, None)  # no right rows for k=2 -> left outer


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, _ts(10), "a")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(10), 200)], "k long, ts timestamp, rv int"
    )
    got = asof_join(left, right, "k", right_cols=["rv"], strict=True).collect()
    assert got[0]["rv"] == 100


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _ts(10), "a"), (1, _ts(25), "b")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 200)], "k long, ts timestamp, rv int"
    )
    got = {
        r["tag"]: r["rv"]
        for r in asof_join(left, right, "k", right_cols=["rv"], direction="forward").collect()
    }
    assert got == {"a": 100, "b": None}


def test_asof_equals_naive_on_events(spark, events):
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    got = asof_join(purchases, clicks, "user_id", right_cols=["click_id", "ts"]).select(
        "event_id", "click_id"
    )
    # naive: window max over the inequality join (small data only)
    j = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id")) & (F.col("p.ts") >= F.col("c.ts")),
        "left",
    )
    naive = (
        j.groupBy("p.event_id")
        .agg(F.max(F.struct(F.col("c.ts").alias("t"), F.col("c.click_id").alias("cid"))).alias("m"))
        .select("event_id", F.col("m.cid").alias("click_id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame([(1, _ts(30), "a"), (1, _ts(31), "b")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 100), (1, _ts(29), 200)], "k long, ts timestamp, rv int")
    got = {
        r["tag"]: r["rv"]
        for r in asof_join(left, right, "k", right_cols=["rv", "ts"], tolerance_sec=150.0).collect()
    }
    # the ts=29 match is 60s/120s away: inside tolerance for both left rows
    assert got["a"] == 200 and got["b"] == 200
    got2 = {
        r["tag"]: r["rv"]
        for r in asof_join(left, right.filter(F.col("rv") == 100), "k",
                           right_cols=["rv", "ts"], tolerance_sec=150.0).collect()
    }
    assert got2 == {"a": None, "b": None}  # 30min-old match voided


def test_sessionize_single_exchange(events):
    plan = (
        sessionize_batch(events, "user_id", "ts", "30 minutes")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_asof_plan_has_no_join(events):
    purchases = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    plan = (
        asof_join(purchases, clicks, "user_id", right_cols=["click_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # union + window, never a join operator
    assert plan.count("Exchange") == 1  # exactly the window shuffle


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Randomized differential vs pandas merge_asof (the de-facto as-of
    reference implementation): backward/forward x with/without tolerance,
    unique (key, ts) pairs (pandas resolves exact ties by row position,
    which no value-based distributed operator can reproduce)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(3):
        n_l, n_r = 40, 60
        base = dt.datetime(2024, 1, 1)
        lts = rng.choice(np.arange(100_000), size=n_l, replace=False)
        rts = rng.choice(np.arange(100_000), size=n_r, replace=False)
        lpdf = pd.DataFrame({
            "k": rng.integers(0, 4, n_l),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in lts],
            "lid": np.arange(n_l),
        }).sort_values("ts").reset_index(drop=True)
        rpdf = pd.DataFrame({
            "k": rng.integers(0, 4, n_r),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in rts],
            "rv": np.arange(n_r) * 10,
        }).sort_values("ts").reset_index(drop=True)
        ldf = spark.createDataFrame(lpdf)
        rdf = spark.createDataFrame(rpdf)
        for direction, tol in (("backward", None), ("forward", None), ("backward", 5000.0)):
            got = {
                r["lid"]: r["rv"]
                for r in asof_join(
                    ldf, rdf, "k", right_cols=["rv"], direction=direction,
                    tolerance_sec=tol,
                ).collect()
            }
            want_pdf = pd.merge_asof(
                lpdf, rpdf, on="ts", by="k", direction=direction,
                tolerance=(pd.Timedelta(seconds=tol) if tol else None),
            )
            want = {
                int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
                for r in want_pdf.itertuples()
            }
            assert got == want, (trial, direction, tol)


# -- range join -------------------------------------------------------------


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, _ts(10), 7)], "k long, ts timestamp, lv int")
    right = spark.createDataFrame(
        [
            (1, _ts(10), 1),          # dt = 0 -> excluded (strictly before)
            (1, _ts(9, 59), 2),       # 1s before -> included
            (1, _ts(5), 3),           # exactly width (5m) before -> included
            (1, _ts(4, 59), 4),       # beyond width -> excluded
            (2, _ts(9), 5),           # other key -> excluded
        ],
        "k long, ts timestamp, rv int",
    )
    got = sorted(
        r["r_rv"] for r in range_join_banded(left, right, "k", width_sec=300.0).collect()
    )
    assert got == [2, 3]


def test_range_join_equals_naive_on_events(spark, events):
    errors = events.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    got = range_join_banded(
        errors, clicks, "user_id", left_ts="ts", right_ts="cts", width_sec=4 * 3600.0
    ).select("r_click_id", "l_event_id")
    naive = errors.join(
        clicks,
        (errors["user_id"] == clicks["user_id"])
        & (clicks["cts"] >= errors["ts"] - F.expr("INTERVAL 4 HOURS"))
        & (clicks["cts"] < errors["ts"]),
    ).select("click_id", "event_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_asof_empty_right_is_all_null(spark):
    left = spark.createDataFrame([(1, _ts(10), "a")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([], "k long, ts timestamp, rv int")
    got = asof_join(left, right, "k", right_cols=["rv"]).collect()
    assert len(got) == 1 and got[0]["rv"] is None


def test_asof_bad_direction_raises(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, "k", direction="sideways")


def test_range_join_empty_sides(spark):
    some = spark.createDataFrame([(1, _ts(10), 7)], "k long, ts timestamp, v int")
    empty = spark.createDataFrame([], "k long, ts timestamp, v int")
    assert range_join_banded(some, empty, "k").count() == 0
    assert range_join_banded(empty, some, "k").count() == 0


def test_sessionize_null_key_groups_together(spark):
    rows = [(None, _ts(0)), (None, _ts(5)), (1, _ts(0))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["user_id"]: r["n_events"] for r in sessionize_batch(df, "user_id", "ts", "30 minutes").collect()}
    assert got == {None: 2, 1: 1}


def test_range_join_plan_is_not_cartesian(events):
    errors = events.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    plan = (
        range_join_banded(errors, clicks, "user_id", left_ts="ts", right_ts="cts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_full_matrix_with_ties_vs_pandas(spark):
    """Full direction x strict x tolerance cross-product vs pandas
    merge_asof (strict == allow_exact_matches=False), with duplicate
    timestamps on BOTH sides. The operator's tie rule is value-based (the
    largest payload among equally-near right rows wins, both directions);
    pandas' is positional (backward: last row, forward: first row within
    the tie group), so the pandas right frame is ordered per direction so
    that its positional pick encodes the same value rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    base = dt.datetime(2024, 1, 1)
    n_l, n_r = 50, 70
    # small timestamp universe => plenty of exact ties across and within sides
    lts = rng.integers(0, 40, n_l)
    rts = rng.integers(0, 40, n_r)
    lpdf = pd.DataFrame({
        "k": rng.integers(0, 3, n_l),
        "ts": [base + dt.timedelta(seconds=int(s)) for s in lts],
        "lid": np.arange(n_l),
    }).sort_values("ts", kind="stable").reset_index(drop=True)
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 3, n_r),
        "ts": [base + dt.timedelta(seconds=int(s)) for s in rts],
        "rv": (np.arange(n_r) * 10).astype(np.int64),
    })
    # backward: pandas takes the LAST tie-group row -> ascending rv = max-rv
    # wins; forward: pandas takes the FIRST -> descending rv = max-rv wins
    rpdf_by_dir = {
        "backward": rpdf.sort_values(["ts", "rv"], kind="stable").reset_index(drop=True),
        "forward": rpdf.sort_values(["ts", "rv"], ascending=[True, False], kind="stable").reset_index(drop=True),
    }
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    for direction in ("backward", "forward"):
        for strict in (False, True):
            for tol in (None, 8.0):
                got = {
                    r["lid"]: r["rv"]
                    for r in asof_join(
                        ldf, rdf, "k", right_cols=["rv"], direction=direction,
                        strict=strict, tolerance_sec=tol,
                    ).collect()
                }
                want_pdf = pd.merge_asof(
                    lpdf, rpdf_by_dir[direction], on="ts", by="k", direction=direction,
                    allow_exact_matches=not strict,
                    tolerance=(pd.Timedelta(seconds=tol) if tol else None),
                )
                want = {
                    int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
                    for r in want_pdf.itertuples()
                }
                assert got == want, (direction, strict, tol)
