"""Vector index artifact: partitioned IVF-flat over parquet.

Role parity with the reference's HNSW index (create / search / insert /
delete / compact / info — reference: src/hnsw/hnsw_index.cpp), re-designed
for Spark's execution model (SURVEY §7.1):

- The reference builds ONE shared concurrent in-RAM graph with lock-striped
  resize (reference: src/hnsw/hnsw_index_physical_create.cpp:235-246). We
  instead cluster vectors into ``nlist`` inverted lists (seeded k-means) and
  write them as a parquet dataset partitioned by list id — embarrassingly
  parallel build, no shared mutable state, no locks, and the artifact is
  object-store-friendly. At 100 TB the build is a single shuffle-by-list
  write; search prunes partitions by list id (Catalyst partition pruning).
- Approximate search contract matches the reference: the index *selects*
  candidate rows (here: scanning only ``nprobe`` of ``nlist`` lists); any
  reported score is recomputed by the normal projection expression
  (reference keeps the projection and drops only the TopN,
  src/hnsw/hnsw_optimize_scan.cpp:164), so scores are always exact — only
  membership of far-away neighbors is approximate.
- ``ef_search`` tunes recall at query time like the reference's setting
  (reference: src/hnsw/hnsw_index.cpp:318-329); we map it to the number of
  probed lists: ``nprobe = clamp(ceil(nlist * ef_search / 128), 1, nlist)`` (so the usearch default ef_search=64 probes half the lists; ef_search>=128 degenerates to an exact full scan — recall is tunable, not guaranteed, like the reference).
- Maintenance is immutable-artifact style (SURVEY §2.3 M1-M3): INSERT
  appends to an unindexed *tail* searched brute-force and unioned in;
  DELETE records ids in a bitmap consulted before the top-k cut (deleted
  rows are invisible immediately, like the reference's tombstones,
  reference: src/hnsw/hnsw_index.cpp:496-512); COMPACT is a full rebuild
  folding tail in and dropping deleted ids.

Artifact layout::

    <root>/<name>/
      manifest.json        # metric, dim, nlist, counts, params, versions
      centroids.npy        # (nlist, dim) float64
      data/list_id=*/...   # parquet (id, vec) inverted lists
      tail/*.parquet       # unindexed appended rows (optional)
      deleted/*.parquet    # deleted id bitmap (optional)
"""

from __future__ import annotations

import json
import math
import os
import shutil
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distance import METRIC_IS_DESCENDING, canonical_metric, distance_expr

__all__ = ["IVFIndex", "build_ivf", "kmeans"]

DEFAULT_EF_SEARCH = 64  # usearch default (reference: usearch/index.hpp:1282-1298)
KMEANS_SAMPLE = 65536
KMEANS_ITERS = 12


def kmeans(x: np.ndarray, nlist: int, iters: int = KMEANS_ITERS, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means (k-means++ init) on a driver-side sample.
    x: (n, d) float64. Returns (nlist, d) centroids."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    nlist = min(nlist, n)
    # k-means++ seeding
    centroids = np.empty((nlist, x.shape[1]), dtype=np.float64)
    centroids[0] = x[rng.integers(n)]
    d2 = ((x - centroids[0]) ** 2).sum(axis=1)
    for i in range(1, nlist):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centroids[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - centroids[i]) ** 2).sum(axis=1))
    for _ in range(iters):
        # assign (blocked GEMM)
        assign = _nearest_centroid(x, centroids)
        for i in range(nlist):
            mask = assign == i
            if mask.any():
                centroids[i] = x[mask].mean(axis=0)
    return centroids


def _nearest_centroid(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    d2 = (x * x).sum(1)[:, None] + (centroids * centroids).sum(1)[None, :] - 2.0 * (x @ centroids.T)
    return d2.argmin(axis=1)


def build_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    metric: str = "l2sq",
    nlist: int | None = None,
    options: dict | None = None,
    seed: int = 42,
) -> "IVFIndex":
    """Build the index artifact from a DataFrame. NULL vectors are excluded,
    mirroring the reference's IS NOT NULL build filter
    (reference: src/hnsw/hnsw_index_plan.cpp:118-133)."""
    metric = canonical_metric(metric)
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).filter(F.col(vec_col).isNotNull())
    n = src.count()
    if n == 0:
        raise ValueError("Cannot build an index over an empty vector column")
    dims = src.select(F.size("vec").alias("d")).distinct().collect()
    if len(dims) != 1:
        raise ValueError(f"HNSW index keys must be fixed-size arrays; found lengths {sorted(r['d'] for r in dims)}")
    dim = dims[0]["d"]
    if nlist is None:
        nlist = max(1, min(4096, int(math.sqrt(n))))
    sample = src.select("vec")
    frac = min(1.0, KMEANS_SAMPLE / n)
    if frac < 1.0:
        sample = sample.sample(fraction=frac, seed=seed)
    smat = np.vstack(sample.toPandas()["vec"].to_numpy()).astype(np.float64)
    centroids = kmeans(smat, nlist, seed=seed)
    nlist = centroids.shape[0]

    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            pdf = pdf.assign(list_id=_nearest_centroid(mat, cents).astype(np.int32))
            yield pdf

    id_t = dict(df.dtypes)[id_col]
    assigned = src.mapInPandas(assign, schema=f"id {id_t}, vec array<float>, list_id int")
    os.makedirs(path, exist_ok=True)
    # one file per inverted list; lists are the unit of search-time pruning
    (
        assigned.repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(path, "data"))
    )
    np.save(os.path.join(path, "centroids.npy"), centroids)
    manifest = {
        "format": "ivf-flat-parquet/v1",
        "metric": metric,
        "dim": int(dim),
        "nlist": int(nlist),
        "count": int(n),
        "id_type": id_t,
        "seed": seed,
        "options": options or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return IVFIndex(path)


class IVFIndex:
    """Handle to an on-disk IVF artifact; all search methods return lazy
    DataFrames so they compose with further relational ops."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.centroids = np.load(os.path.join(path, "centroids.npy"))

    # -- properties -------------------------------------------------------
    @property
    def metric(self) -> str:
        return self.manifest["metric"]

    @property
    def dim(self) -> int:
        return self.manifest["dim"]

    @property
    def nlist(self) -> int:
        return self.manifest["nlist"]

    def _tail_path(self) -> str:
        return os.path.join(self.path, "tail")

    def _deleted_path(self) -> str:
        return os.path.join(self.path, "deleted")

    def counts(self, spark: SparkSession) -> dict:
        base = self.manifest["count"]
        tail = deleted = 0
        if os.path.exists(self._tail_path()):
            tail = spark.read.parquet(self._tail_path()).count()
        if os.path.exists(self._deleted_path()):
            deleted = spark.read.parquet(self._deleted_path()).select("id").distinct().count()
        return {"base": base, "tail": tail, "deleted": deleted, "live": base + tail - deleted}

    # -- search -----------------------------------------------------------
    def nprobe_for(self, ef_search: int | None) -> int:
        ef = DEFAULT_EF_SEARCH if ef_search is None else ef_search
        return max(1, min(self.nlist, math.ceil(self.nlist * ef / 128.0)))

    def probe_lists(self, query: list[float], nprobe: int) -> list[int]:
        q = np.asarray(query, dtype=np.float64)[None, :]
        if self.metric == "cosine":
            # normalized centroids ordering == cosine ordering
            c = self.centroids / np.maximum(np.linalg.norm(self.centroids, axis=1, keepdims=True), 1e-30)
            qn = q / max(np.linalg.norm(q), 1e-30)
            order = np.argsort(-(c @ qn.T).ravel())
        elif self.metric == "ip":
            order = np.argsort(-(self.centroids @ q.T).ravel())
        else:
            d2 = ((self.centroids - q) ** 2).sum(axis=1)
            order = np.argsort(d2)
        return [int(i) for i in order[:nprobe]]

    def probe_lists_batch(self, qmat: np.ndarray, nprobe: int) -> list[np.ndarray]:
        """Vectorized probe_lists for a (nq, d) query matrix: per query the
        ids of the ``nprobe`` nearest inverted lists."""
        c = self.centroids
        if self.metric == "cosine":
            cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
            qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
            s = -(qn @ cn.T)
        elif self.metric == "ip":
            s = -(qmat @ c.T)
        else:
            s = ((qmat * qmat).sum(1)[:, None] + (c * c).sum(1)[None, :] - 2.0 * (qmat @ c.T))
        nprobe = min(nprobe, self.nlist)
        if nprobe >= self.nlist:
            idx = np.argsort(s, axis=1)
        else:
            idx = np.argpartition(s, nprobe - 1, axis=1)
        return [row[:nprobe] for row in idx]

    def candidates(self, spark: SparkSession, query: list[float], ef_search: int | None = None) -> DataFrame:
        """Rows (id, vec) from the probed inverted lists + the whole tail,
        minus deleted ids. This is the index's analog of the reference's
        eager search + rowid paging (reference: src/hnsw/hnsw_index.cpp:315-356)."""
        if len(query) != self.dim:
            raise ValueError(f"query dimension {len(query)} != index dimension {self.dim}")
        lists = self.probe_lists(query, self.nprobe_for(ef_search))
        data = spark.read.parquet(os.path.join(self.path, "data"))
        cand = data.filter(F.col("list_id").isin(lists)).select("id", "vec")
        if os.path.exists(self._tail_path()):
            cand = cand.unionByName(spark.read.parquet(self._tail_path()).select("id", "vec"))
        if os.path.exists(self._deleted_path()):
            deleted = spark.read.parquet(self._deleted_path()).select("id").distinct()
            # deletions are immediately invisible (reference: src/hnsw/hnsw_index.cpp:496-512);
            # filtering happens BEFORE the top-k cut so k rows still come back
            cand = cand.join(F.broadcast(deleted), "id", "left_anti")
        return cand

    def search(self, spark: SparkSession, query: list[float], k: int, ef_search: int | None = None) -> DataFrame:
        """Top-k (id, score) for one query vector; score polarity follows the
        metric. Exact within the probed lists."""
        cand = self.candidates(spark, query, ef_search)
        desc = METRIC_IS_DESCENDING[self.metric]
        scored = cand.select("id", distance_expr("vec", query, self.metric).alias("score"))
        order = [F.col("score").desc() if desc else F.col("score").asc(), F.col("id").asc()]
        return scored.orderBy(*order).limit(k)

    # -- maintenance ------------------------------------------------------
    def insert(self, df: DataFrame, vec_col: str, id_col: str) -> None:
        """Append rows to the unindexed tail (searched brute-force until the
        next compact — matches the reference's 'create index after load'
        guidance, reference README.md:66-68)."""
        (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
            .filter(F.col(vec_col).isNotNull())
            .write.mode("append")
            .parquet(self._tail_path())
        )

    def delete(self, spark: SparkSession, ids: list) -> None:
        """Record deleted ids; they disappear from search results immediately."""
        id_t = self.manifest.get("id_type", "bigint")
        spark.createDataFrame([(i,) for i in ids], f"id {id_t}").write.mode("append").parquet(self._deleted_path())

    def compact(self, spark: SparkSession) -> "IVFIndex":
        """Full rebuild folding in the tail and dropping deleted ids —
        semantics of PRAGMA hnsw_compact_index
        (reference: src/hnsw/hnsw_index.cpp:481-494)."""
        data = spark.read.parquet(os.path.join(self.path, "data")).select("id", "vec")
        if os.path.exists(self._tail_path()):
            data = data.unionByName(spark.read.parquet(self._tail_path()).select("id", "vec"))
        if os.path.exists(self._deleted_path()):
            deleted = spark.read.parquet(self._deleted_path()).select("id").distinct()
            data = data.join(F.broadcast(deleted), "id", "left_anti")
        tmp = self.path + ".compacting"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        data = data.cache()
        try:
            build_ivf(
                data, "vec", "id", tmp,
                metric=self.metric,
                options=self.manifest.get("options"),
                seed=self.manifest.get("seed", 42),
            )
            old = self.path
            shutil.rmtree(old)
            os.rename(tmp, old)
        finally:
            data.unpersist()
        return IVFIndex(self.path)

    def drop(self) -> None:
        """DROP INDEX: free the artifact (reference: src/hnsw/hnsw_index.cpp:410-419)."""
        shutil.rmtree(self.path, ignore_errors=True)
