"""Skew-mitigation operators for hot keys at cluster scale.

Spark's AQE skew-join handling (enabled in :mod:`..session`) splits
oversized *partitions* at runtime, but two shapes still need explicit
salting at 100 TB:

- ``salted_agg``: a groupBy where one key holds a large share of all rows.
  Map-side partial aggregation already compresses per-task duplicates, but
  the final merge for a hot key still lands on ONE reducer; pre-splitting
  the key into ``salt`` subkeys bounds every reducer's share to ~1/salt.
- ``salted_join``: an equi-join whose build side must broadcast-replicate
  per salt so a hot probe key spreads over ``salt`` reducers instead of one.

Both return exactly the unsalted results (verified against the plain plans
in tests) — salting changes the exchange topology, never the algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

# (merge_fn, finish_fn) per supported aggregate: stage 1 computes agg(col)
# per (keys, salt); stage 2 merges the per-salt partials.
_MERGEABLE = {
    "sum": (F.sum, None),
    "count": (F.sum, None),  # counts merge by summing
    "min": (F.min, None),
    "max": (F.max, None),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` maps output column ->
    (fn, input_col) with fn in {sum, count, min, max} (the algebraically
    mergeable set; avg = sum/count composed by the caller).

    Phase 1 aggregates on (keys, random salt in [0, salt)): the hot key's
    rows split across ``salt`` reducers. Phase 2 merges the ≤ salt partial
    rows per key — trivially small regardless of skew.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{fn} is not algebraically mergeable; supported: {sorted(_MERGEABLE)}")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGEABLE[fn][0](name).alias(name) for name, (fn, col) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``left`` (the big, skewed side) gets a
    random salt per row; ``right`` (the smaller side) is replicated once per
    salt value; the join key becomes (on, salt), spreading each hot key over
    ``salt`` reducers. Result equals ``left.join(right, on, how)``.

    ``how`` supports inner/left joins (right rows replicate, so right-outer
    semantics would need dedup — use the plain join there)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    l = left.withColumn("__salt", (F.rand(seed=43) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")
