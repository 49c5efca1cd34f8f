"""Temporal operators for event/time-series processing: batch
sessionization, as-of joins, and banded range joins.

Beyond the reference's surface (it is a vector-search extension; SURVEY §2.4
lists time-series joins as "not present"), but core to an analytics engine
fed by event streams: attributing conversions to the latest prior touch
(as-of), splitting clickstreams into visits (sessionize), and joining
events to nearby events (range join) are the three canonical temporal
shapes, and all three are notorious O(n^2) traps when written naively.

Scale notes (the 100 TB posture):

- ``sessionize_batch`` uses Spark's native ``session_window`` aggregate —
  one Exchange keyed by (user, window-merge), state merged per key; the
  same operator as the streaming :func:`~duckdb_vss_spark.streaming.ops.
  sessionize`, so batch and stream share semantics by construction.
- ``asof_join`` is the union-tag/last-carry form: tag both sides, union
  (no join!), one window keyed by the equality keys, carry the most recent
  right-side payload forward with ``last(..., ignorenulls=True)``. Exactly
  ONE shuffle on the equality keys, no range explosion, no broadcast of
  either side — the only as-of formulation that survives two 100 TB inputs.
  (A backward merge-join would need a custom physical operator; the window
  form gets the same O(n log n per key) from Spark's sort-based window.)
- ``range_join_banded`` buckets both sides by ``floor(ts / width)`` and
  joins only adjacent buckets, turning an inequality join (cross product +
  filter — duckdb's plan, and Spark's default for non-equi conditions) into
  an equi-join with a 2x candidate blow-up bound. Candidates are complete:
  any pair within ``width`` lands in the same or adjacent bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize_batch", "asof_join", "range_join_banded"]


def sessionize_batch(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    agg: dict | None = None,
) -> DataFrame:
    """Batch sessionization: events of one key within ``gap`` of each other
    merge into one session (Spark's native ``session_window``, the same
    operator the streaming twin uses — identical merge semantics).

    Output: (key, session_start, session_end, n_events, <agg columns>).
    ``agg`` maps output name -> Column for extra per-session aggregates.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for name, col in (agg or {}).items():
        aggs.append(col.alias(name))
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            *[name for name in (agg or {})],
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    strict: bool = False,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the most recent right row at or
    before its timestamp (``direction='backward'``; ``'forward'`` takes the
    earliest at-or-after). Left rows with no match keep NULLs (left-outer
    semantics, like duckdb's ``ASOF LEFT JOIN`` and pandas ``merge_asof``).

    ``strict=True`` requires right.ts strictly before (after) left.ts.
    ``tolerance_sec`` voids matches farther than that many seconds away
    (pandas ``merge_asof(tolerance=...)`` parity) — the attribution-window
    use case ("credit the click only if within 7 days").

    Implementation: union-tag + windowed last-carry — one shuffle on ``on``,
    no inequality join, both inputs may be arbitrarily large. Right-side
    ties on (ts) resolve to the row that sorts last (largest payload order),
    deterministically.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    rcols = right_cols if right_cols is not None else [c for c in right.columns if c not in keys]
    if right_ts not in rcols:
        rcols = [*rcols, right_ts]

    payload = F.struct(*[F.col(c).alias(c) for c in rcols])
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(payload).schema[0].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )
    u = l_tag.unionByName(r_tag)

    # At equal ts the left row matches the right row iff the join is
    # inclusive: sort the right row (side 0) ahead of the left row so the
    # left row's running window sees it; strict mode sorts it after.
    right_first = not strict
    side_order = F.col("__side").asc() if right_first else F.col("__side").desc()
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # the payload struct is the final sort key so right-side ties on
    # (key, ts) resolve deterministically (largest payload wins) instead of
    # depending on partition row order
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, side_order, F.col("__payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    if tolerance_sec is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col(f"__m.{right_ts}").cast("timestamp"))
        ) / F.lit(1e6)
        carried = carried.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("__m"))
        )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__m.{c}").alias(c + suffix if c in left.columns or c in keys else c)
            for c in rcols
        ],
    )
    return out


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    width_sec: float = 300.0,
    before: bool = True,
) -> DataFrame:
    """Range join: pairs (l, r) sharing ``on`` with ``r.ts`` inside a
    ``width_sec`` window of ``l.ts`` — ``[l.ts - width, l.ts)`` when
    ``before`` (strictly-before rows, the window-start boundary included)
    else ``[l.ts, l.ts + width)``.

    Both sides are bucketed by ``floor(epoch / width)`` and joined only on
    (keys, bucket) for the two buckets any in-range partner can occupy —
    an equi-join Spark executes as a hash shuffle join, never a cartesian
    (plan asserted in tests). The exact range predicate filters residual
    candidates after the cheap join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = float(width_sec)
    l_b = left.withColumn("__b", F.floor(F.unix_micros(F.col(left_ts).cast("timestamp")) / F.lit(w * 1e6)))
    # an in-range right row lies in the left row's bucket or the one
    # preceding (before=True) / following it
    shift = -1 if before else 1
    l_expanded = l_b.withColumn("__bb", F.explode(F.array(F.col("__b"), F.col("__b") + shift))).drop("__b")
    r_b = right.withColumn(
        "__bb", F.floor(F.unix_micros(F.col(right_ts).cast("timestamp")) / F.lit(w * 1e6))
    )
    lsel = l_expanded.select(*[F.col(k).alias(f"__lk_{k}") for k in keys], "__bb",
                             *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in keys])
    rsel = r_b.select(*[F.col(k).alias(f"__rk_{k}") for k in keys], "__bb",
                      *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in keys])
    cond = [lsel[f"__lk_{k}"] == rsel[f"__rk_{k}"] for k in keys] + [lsel["__bb"] == rsel["__bb"]]
    j = lsel.join(rsel, cond)
    lts = F.col(f"l_{left_ts}").cast("timestamp")
    rts = F.col(f"r_{right_ts}").cast("timestamp")
    dt = (F.unix_micros(lts) - F.unix_micros(rts)) / F.lit(1e6)
    rng = (dt > F.lit(0.0)) & (dt <= F.lit(w)) if before else (dt <= F.lit(0.0)) & (dt > F.lit(-w))
    out = j.filter(rng).select(
        *[F.col(f"__lk_{k}").alias(k) for k in keys],
        *[F.col(f"l_{c}") for c in left.columns if c not in keys],
        *[F.col(f"r_{c}") for c in right.columns if c not in keys],
    )
    # bucket-pair expansion can duplicate a matching pair only if a pair's
    # two bucket keys coincide — impossible here (the two left buckets
    # differ), so no distinct() is needed.
    return out
