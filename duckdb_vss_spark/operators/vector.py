"""Vector-column analytics beyond point search: normalization, per-group
centroids, and nearest-centroid assignment (the k-means E-step).

The reference engine stops at "find the k nearest rows to a query"
(SURVEY §2.2); a training-data pipeline also needs the aggregate forms —
cluster the corpus's embedding space, profile it per label/source, assign
every row to a centroid for sharding or curriculum bucketing. All three
operators here stay JVM-side (higher-order functions, no Python in the hot
path — asserted in tests/test_plans.py).

Scale notes (100 TB posture):

- ``group_centroids`` explodes to (n * dim) rows but aggregates with
  map-side partial combine, so the shuffle carries at most
  ``groups * dim`` rows per input partition — the explode never hits the
  wire un-combined. One Exchange.
- ``nearest_centroid`` is a pure projection: the centroid table (small by
  definition) is baked into a single codegen'd expression — array_min over
  per-centroid (distance, id) structs — so assignment needs NO join and NO
  shuffle, and composes with any downstream groupBy.
- ``normalize_vectors`` is a stateless projection (unit L2 norm), the
  standard preprocessing step before cosine-metric indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import METRIC_IS_DESCENDING, canonical_metric, distance_expr

__all__ = ["normalize_vectors", "group_centroids", "nearest_centroid"]


def normalize_vectors(df: DataFrame, vec_col: str, out_col: str | None = None) -> DataFrame:
    """Scale every vector to unit L2 norm (zero vectors pass through
    unchanged). After normalization, l2sq ordering == cosine-distance
    ordering, so one index artifact serves both metrics."""
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))
    unit = F.transform(v, lambda x: (x.cast("double") / norm).cast("float"))
    out = F.when(norm > 0.0, unit).otherwise(v)
    return df.withColumn(out_col or vec_col, out)


def group_centroids(df: DataFrame, vec_col: str, group_col: str) -> DataFrame:
    """Per-group mean vector, long form: (group, pos, c) with ``c`` the
    average of component ``pos`` over the group — the shape both SQL
    engines and plotting tools consume directly. ``wide=`` callers can
    pivot back with ``collect_list`` ordered by pos.

    posexplode + partial-combine aggregate: one Exchange carrying at most
    groups x dim combined rows per partition.
    """
    return (
        df.select(F.col(group_col).alias("group"), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("group", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )


def nearest_centroid(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple],
    metric: str = "l2sq",
    out_col: str = "centroid_id",
    score_col: str | None = "centroid_dist",
) -> DataFrame:
    """Assign every row to its nearest centroid — the k-means E-step as a
    single codegen'd projection (no join, no shuffle).

    ``centroids`` is a small driver-side list of ``(id, vector)`` pairs
    (e.g. the collected output of :func:`group_centroids`, or k-means
    centroids). Distances for all centroids are evaluated as one
    array-of-structs expression; ``array_min`` picks the (distance, id)
    lexicographic minimum, so ties break deterministically toward the
    smaller centroid id.
    """
    if not centroids:
        raise ValueError("centroids must be a non-empty list of (id, vector) pairs")
    desc = METRIC_IS_DESCENDING[canonical_metric(metric)]
    structs = []
    for cid, cvec in centroids:
        d = distance_expr(F.col(vec_col), [float(x) for x in cvec], metric)
        # similarity metrics order descending: negate so array_min still
        # picks the best match
        structs.append(F.struct((-d if desc else d).alias("d"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*structs))
    out = df.withColumn(out_col, best["cid"])
    if score_col:
        d = best["d"]
        out = out.withColumn(score_col, -d if desc else d)
    return out
