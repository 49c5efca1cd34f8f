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

__all__ = ["normalize_vectors", "group_centroids", "nearest_centroid", "kmeans_step", "kmeans_fit"]


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


def kmeans_step(df: DataFrame, vec_col: str, centroids: list[tuple], metric: str = "l2sq") -> list[tuple]:
    """One Lloyd iteration, distributed: assign (codegen projection, no
    shuffle) then re-average (one combine-side Exchange), returning the new
    driver-side ``[(id, vector), ...]`` list. Empty clusters keep their old
    centroid (the standard Lloyd convention). Exactly one Spark job per
    iteration; only ``k * dim`` numbers ever reach the driver — this is the
    textbook scalable k-means loop.
    """
    assigned = nearest_centroid(df, vec_col, centroids, metric=metric, score_col=None)
    byid: dict = {}
    for r in group_centroids(assigned, vec_col, "centroid_id").collect():
        byid.setdefault(r["group"], {})[r["pos"]] = r["c"]
    out = []
    for cid, old in centroids:
        comps = byid.get(cid)
        out.append((cid, [comps[p] for p in sorted(comps)] if comps else list(old)))
    return out


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    iters: int = 10,
    id_col: str | None = None,
    metric: str = "l2sq",
) -> list[tuple]:
    """Distributed Lloyd k-means over a vector column. Deterministic init:
    the first ``k`` rows ordered by ``id_col`` (or the frame's natural first
    ``k`` rows) — no RNG, so runs are reproducible across cluster sizes.
    ``iters`` bounds the job count; each iteration is one job (see
    :func:`kmeans_step`)."""
    if k < 1:
        raise ValueError("k must be at least 1")
    base = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    if id_col is not None:
        base = df.filter(F.col(vec_col).isNotNull()).orderBy(id_col).select(vec_col)
    init_rows = base.limit(k).collect()
    if not init_rows:
        raise ValueError("Cannot fit k-means on an empty vector column")
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init_rows)]
    for _ in range(iters):
        cents = kmeans_step(df, vec_col, cents, metric=metric)
    return cents
