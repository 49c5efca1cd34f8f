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

__all__ = [
    "normalize_vectors",
    "group_centroids",
    "nearest_centroid",
    "kmeans_step",
    "kmeans_fit",
    "covariance_matrix",
    "pca_fit",
    "pca_project",
]


def normalize_vectors(df: DataFrame, vec_col: str, out_col: str | None = None) -> DataFrame:
    """Scale every vector to unit L2 norm (zero vectors pass through
    unchanged). After normalization, l2sq ordering == cosine-distance
    ordering, so one index artifact serves both metrics.

    The O(d) norm is bound ONCE per row as a lambda variable (transform
    over a single-element array) — referencing it directly inside the
    per-element lambda would let CollapseProject inline and re-evaluate
    it per element, turning the projection O(d^2).
    """
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))
    out = F.transform(
        F.array(norm),
        lambda n: F.when(n > 0.0, F.transform(v, lambda x: (x.cast("double") / n).cast("float"))).otherwise(v),
    )[0]
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


_KMEANS_EXPR_MAX_K = 64  # above this, the per-centroid literal expression
# tree gets unwieldy (k * dim literal nodes); switch to the broadcast-GEMM
# kernel, which carries centroids as one broadcast numpy array instead


def kmeans_step(df: DataFrame, vec_col: str, centroids: list[tuple], metric: str = "l2sq") -> list[tuple]:
    """One Lloyd iteration, distributed: assign then re-average, returning
    the new driver-side ``[(id, vector), ...]`` list. Empty clusters keep
    their old centroid (the standard Lloyd convention). Exactly one Spark
    job per iteration; only ``k * dim`` numbers ever reach the driver —
    this is the textbook scalable k-means loop.

    Small ``k`` uses the codegen projection + combine-side aggregate;
    large ``k`` with the l2/l2sq metric routes through the broadcast-GEMM
    kernel in :func:`~duckdb_vss_spark.index.ivf.kmeans_distributed`,
    whose expression size is independent of ``k``. Non-l2 metrics
    (cosine/ip) always take the expression path — the GEMM kernel is
    l2-only.
    """
    if len(centroids) > _KMEANS_EXPR_MAX_K and canonical_metric(metric) == "l2sq":
        import numpy as np

        from ..index.ivf import kmeans_distributed

        ids = [cid for cid, _ in centroids]
        init = np.asarray([v for _, v in centroids], dtype=np.float64)
        src = df.select(F.col(vec_col).alias("vec")).filter(F.col(vec_col).isNotNull())
        new = kmeans_distributed(src, init, iters=1)
        return [(cid, [float(x) for x in new[i]]) for i, cid in enumerate(ids)]
    assigned = nearest_centroid(df, vec_col, centroids, metric=metric, score_col=None)
    byid: dict = {}
    for r in group_centroids(assigned, vec_col, "centroid_id").collect():
        byid.setdefault(r["group"], {})[r["pos"]] = r["c"]
    out = []
    for cid, old in centroids:
        comps = byid.get(cid)
        out.append((cid, [comps[p] for p in sorted(comps)] if comps else list(old)))
    return out


def covariance_matrix(df: DataFrame, vec_col: str) -> "tuple":
    """Population covariance of a vector column, distributed: each partition
    emits ONE (n, colsum, flattened X^T X) partial via a single GEMM per
    Arrow batch; one global fold (JVM ``zip_with`` array addition over the
    partition rows) reduces them, and the driver finishes
    ``cov = E[xxT] - mean meanT``. Only ``d^2 + d + 1`` numbers per
    partition ever move — the scalable form of what a naive approach would
    posexplode into n x d^2 rows.

    Returns ``(mean (d,), cov (d, d), n)`` as numpy arrays.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    src = df.select(F.col(vec_col).alias("vec")).filter(F.col(vec_col).isNotNull())

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xtx = None
        csum = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            if xtx is None:
                d = mat.shape[1]
                xtx = np.zeros((d, d))
                csum = np.zeros(d)
            xtx += mat.T @ mat
            csum += mat.sum(axis=0)
            n += mat.shape[0]
        if n:
            yield pd.DataFrame({"n": [n], "csum": [csum], "xtx": [xtx.ravel()]})

    reduced = (
        src.mapInPandas(partials, schema="n long, csum array<double>, xtx array<double>")
        .agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("csum"),
                F.expr("cast(array() as array<double>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, b: a + b)
                ),
            ).alias("csum"),
            F.aggregate(
                F.collect_list("xtx"),
                F.expr("cast(array() as array<double>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, b: a + b)
                ),
            ).alias("xtx"),
        )
        .collect()[0]
    )
    n = reduced["n"]
    if not n:
        raise ValueError("covariance_matrix over an empty vector column")
    mean = np.asarray(reduced["csum"]) / n
    d = mean.shape[0]
    exx = np.asarray(reduced["xtx"]).reshape(d, d) / n
    cov = exx - np.outer(mean, mean)
    return mean, cov, int(n)


def pca_fit(df: DataFrame, vec_col: str, k: int) -> dict:
    """Principal components of a vector column: distributed covariance (see
    :func:`covariance_matrix`) + driver-side eigendecomposition of the tiny
    d x d matrix. Returns ``{"mean", "components" (k, d), "explained" (k,)}``
    with components orthonormal, ordered by descending eigenvalue, and
    sign-canonicalized (largest-|coord| entry positive) so runs are
    deterministic."""
    import numpy as np

    mean, cov, _ = covariance_matrix(df, vec_col)
    if not (1 <= k <= mean.shape[0]):
        raise ValueError(f"k must be in [1, {mean.shape[0]}]")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):  # canonical sign
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps, "explained": vals[order]}


def pca_project(df: DataFrame, vec_col: str, model: dict, out_col: str = "pca") -> DataFrame:
    """Project vectors onto fitted components — a pure JVM projection (one
    centered dot product per component, no Python, no shuffle): the model
    is small by construction (k x d), so it bakes into the expression."""
    comps = model["components"]
    mean = model["mean"]
    x = F.col(vec_col)
    outs = []
    for ci in range(comps.shape[0]):
        w = [float(v) for v in comps[ci]]
        wm = float(comps[ci] @ mean)
        # sum_i x_i * w_i - w.mean  (centering folded into a constant)
        dot = F.aggregate(
            F.zip_with(x, F.array(*[F.lit(v) for v in w]), lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        outs.append(dot - F.lit(wm))
    return df.withColumn(out_col, F.array(*outs))


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    iters: int = 10,
    id_col: str | None = None,
    metric: str = "l2sq",
) -> list[tuple]:
    """Distributed Lloyd k-means over a vector column. Deterministic init:
    the first ``k`` rows ordered by ``id_col`` when given, else by a
    64-bit content hash of the vector (ties broken by the vector itself)
    — no RNG and no dependence on partition order, so runs are
    reproducible across cluster sizes and repartitionings. ``iters``
    bounds the job count; each iteration is one job (see
    :func:`kmeans_step`)."""
    if k < 1:
        raise ValueError("k must be at least 1")
    if id_col is not None:
        base = df.filter(F.col(vec_col).isNotNull()).orderBy(id_col).select(vec_col)
    else:
        # first-k under Spark's natural order is NOT stable across
        # partitionings; a content-hash order is
        base = (
            df.filter(F.col(vec_col).isNotNull())
            .orderBy(F.xxhash64(F.col(vec_col)), F.col(vec_col))
            .select(vec_col)
        )
    init_rows = base.limit(k).collect()
    if not init_rows:
        raise ValueError("Cannot fit k-means on an empty vector column")
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init_rows)]
    for _ in range(iters):
        cents = kmeans_step(df, vec_col, cents, metric=metric)
    return cents
