"""k-NN join operators: ``knn_join`` (vss_join parity), ``knn_match``
(vss_match parity), and the flat candidate engine both build on.

Reference surface:
- ``vss_join(left, right, lcol, rcol, k, metric)`` -> rows of
  ``(score, left_tbl STRUCT, right_tbl STRUCT)``
  (reference macro: src/hnsw/hnsw_index_macros.cpp:9-46).
- ``vss_match(right, lcol, rcol, k, metric)`` (lateral) -> per left row a
  ``matches`` LIST of ``{'score', 'row'}``
  (reference macro: src/hnsw/hnsw_index_macros.cpp:48-74).
- The HNSW_INDEX_JOIN physical operator emits a 1-indexed match-rank
  (reference: src/hnsw/hnsw_optimize_join.cpp:146).

Execution strategy (Spark-first, designed for the 100 TB side being the
*items* side):

``broadcast-kernel`` (default when the probe side fits in a driver/executor
broadcast, like the reference's probe-batched join which holds one batch of
probes at a time, reference: src/hnsw/hnsw_optimize_join.cpp:135):
  1. collect probe (id, vector) pairs once, broadcast as a numpy matrix;
  2. ``mapInPandas`` over the items side: each partition folds its Arrow
     batches into a running per-probe top-k with one GEMM per batch —
     items never shuffle, partitions never exchange data;
  3. the surviving ``num_partitions * Q * k`` candidate rows (tiny relative
     to the input) are exactly re-ranked with a window on probe id;
  4. full rows are joined back by id only if struct output is requested.
  Unlike the reference's operator, which is declared non-parallel
  (reference: src/hnsw/hnsw_optimize_join.cpp:65-67), every stage here
  parallelizes across item partitions.

``crossjoin``: pure DataFrame fallback (cross join + window top-k) when the
probe side is itself huge; correct at any size but O(|L|*|R|) compute —
the same asymptotics the reference macro has.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import METRIC_IS_DESCENDING, canonical_metric, distance_expr
from ..functions.kernels import as_matrix, local_topk, pairwise_scores
from ..broadcasts import tracked_broadcast

__all__ = ["knn_join_flat", "knn_join", "knn_match"]

# Above this probe-row count we refuse to broadcast and fall back to the
# cross-join plan (a 1M x 64-dim f64 probe matrix is ~512 MB of broadcast).
DEFAULT_BROADCAST_PROBE_LIMIT = 1_000_000
_PROBE_CHUNK = 1024  # bounds the (batch x probe-chunk) GEMM output size
# Indexed joins with at least this many probes take the distributed
# cell-cogroup path even though the probe side would still broadcast: the
# broadcast masked kernel's compute is O(N x nq) (full GEMM, then mask)
# while the cell path is O(N x nq x nprobe/nlist) — measured at 10M rows x
# 2k probes x ef=8: 14.5 s distributed vs 147 s for the coverage-rerouted
# flat join. Below it, the broadcast kernel's single-pass zero-shuffle shape
# wins on fixed costs (100 probes: ~0.8 s).
DISTRIBUTED_MIN_PROBES = 1024
# Tombstone sets at or below this many ids ride into the scan kernels as an
# in-memory exclusion list (the reference's in-RAM free-list shape,
# usearch/index_dense.hpp:1228-1248 — fine there because it never leaves one
# process). Above it, the driver collect is the scale hazard: exclusion
# routes through a distributed anti-join on the item side BEFORE the
# kernels instead, so live rows still keep all k slots.
DELETED_IDS_KERNEL_CAP = 1_000_000


def _deleted_exclusion(index, spark):
    """Resolve the index's tombstone set into ``(excl_ids, deleted_df,
    small)``: ``excl_ids`` is the driver-side id list when the set fits
    ``DELETED_IDS_KERNEL_CAP`` (else None — callers must anti-join
    ``deleted_df`` onto the item side pre-kernel); ``deleted_df`` is None
    when there are no tombstones; ``small`` says a broadcast-hinted
    anti-join is safe."""
    deleted = index.deleted_df(spark)
    if deleted is None:
        return None, None, True
    head = deleted.limit(DELETED_IDS_KERNEL_CAP + 1).collect()
    if len(head) > DELETED_IDS_KERNEL_CAP:
        return None, deleted, False
    return [r["id"] for r in head], deleted, True


def _anti_join_deleted(df: DataFrame, deleted_df, small: bool, id_col: str = "id") -> DataFrame:
    """Remove tombstoned ids from an item-side frame; broadcast the
    tombstones only when the set is known small."""
    if deleted_df is None:
        return df
    d = deleted_df.withColumnRenamed("id", id_col) if id_col != "id" else deleted_df
    return df.join(F.broadcast(d) if small else d, id_col, "left_anti")


def _candidates_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    k: int,
    metric: str,
    probe_mask: "np.ndarray | None" = None,
    right_list_col: str | None = None,
    excluded_ids=None,
    probes_pdf: "pd.DataFrame | None" = None,
) -> DataFrame:
    """Per-partition top-k candidate generation (see module docstring).

    ``probe_mask`` (nlist, nq) bool + ``right_list_col``: IVF index-join mode —
    item rows only compete for probes whose probe-set contains the item's
    inverted list (the per-probe approximate search of the reference's
    HNSW_INDEX_JOIN, reference: src/hnsw/hnsw_optimize_join.cpp:111-168).

    ``excluded_ids``: ids filtered out INSIDE the kernel, before the
    per-partition top-k cut — deleted rows must not crowd live neighbors out
    of the k slots (the reference's tombstones are likewise invisible before
    the cut, reference: src/hnsw/hnsw_index.cpp:496-512).
    """
    import numpy as np  # noqa: F811

    spark = left.sparkSession
    if probes_pdf is None:
        probes_pdf = (
            left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("v"))
            .filter(F.col(left_on).isNotNull())
            .toPandas()
        )
    qids = probes_pdf["qid"].to_numpy()
    qmat = as_matrix(probes_pdf["v"]) if len(probes_pdf) else None
    excl = np.asarray(list(excluded_ids)) if excluded_ids is not None and len(excluded_ids) else None
    bc = tracked_broadcast(spark.sparkContext, (qids, qmat, probe_mask, excl))
    desc = METRIC_IS_DESCENDING[metric]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        qids_l, qmat_l, mask_l, excl_l = bc.value
        if qmat_l is None:
            return
        nq = len(qids_l)
        # Running per-probe top-k fold across this partition's Arrow batches.
        # best_scores/best_rids are (k, nq); best_vecs (k, nq, d) f32 keeps the
        # candidate vectors so the exact score can be recomputed JVM-side
        # without a second scan of the items table.
        best_scores = best_rids = best_vecs = None
        for pdf in batches:
            if excl_l is not None and len(pdf):
                pdf = pdf[~pdf["rid"].isin(excl_l)]
            if len(pdf) == 0:
                continue
            rids = pdf["rid"].to_numpy()
            vecs32 = np.vstack(pdf["v"].to_numpy()).astype(np.float32, copy=False)
            imat = np.ascontiguousarray(vecs32, dtype=np.float64)
            if best_scores is None:
                d = imat.shape[1]
                best_scores = np.full((k, nq), -np.inf if desc else np.inf)
                # object dtype + None sentinel: rid columns may be strings,
                # where an int64 fill would crash the vstack with a cast error
                rid_numeric = np.issubdtype(rids.dtype, np.number)
                best_rids = (
                    np.full((k, nq), -1, dtype=np.int64) if rid_numeric else np.full((k, nq), None, dtype=object)
                )
                best_vecs = np.zeros((k, nq, d), dtype=np.float32)
            lists = pdf["__lst"].to_numpy() if mask_l is not None else None
            for q0 in range(0, nq, _PROBE_CHUNK):
                q1 = min(q0 + _PROBE_CHUNK, nq)
                scores = pairwise_scores(imat, qmat_l[q0:q1], metric)  # (n_items, chunk)
                if mask_l is not None:
                    allowed = mask_l[lists][:, q0:q1]  # (n_items, chunk)
                    scores = np.where(allowed, scores, -np.inf if desc else np.inf)
                idx = local_topk(scores, k, desc)  # (k', chunk)
                cols = np.arange(q1 - q0)[None, :]
                merged_s = np.vstack([best_scores[:, q0:q1], scores[idx, cols]])
                merged_r = np.vstack([best_rids[:, q0:q1], rids[idx]])
                merged_v = np.concatenate([best_vecs[:, q0:q1, :], vecs32[idx]], axis=0)
                keep = local_topk(merged_s, k, desc)
                best_scores[: keep.shape[0], q0:q1] = merged_s[keep, cols]
                best_rids[: keep.shape[0], q0:q1] = merged_r[keep, cols]
                best_vecs[: keep.shape[0], q0:q1, :] = merged_v[keep, cols, :]
        if best_scores is None:
            return
        # drop fill slots and masked-out entries (both carry +-inf scores)
        valid = np.isfinite(best_scores.ravel(order="F"))
        out_q = np.repeat(qids_l, k)[valid]
        out_r = best_rids.ravel(order="F")[valid]
        out_v = best_vecs.transpose(1, 0, 2).reshape(k * nq, -1)[valid]
        yield pd.DataFrame({"qid": out_q, "rid": out_r, "v": list(out_v)})

    item_cols = [F.col(right_id).alias("rid"), F.col(right_on).alias("v")]
    if right_list_col is not None:
        item_cols.append(F.col(right_list_col).alias("__lst"))
    items = right.select(*item_cols).filter(F.col(right_on).isNotNull())
    qid_t = dict(left.dtypes)[left_id]
    rid_t = dict(right.dtypes)[right_id]
    cand = items.mapInPandas(gen, schema=f"qid {qid_t}, rid {rid_t}, v array<float>")
    # Exact-score recompute: the GEMM kernel selects candidates ~1e-8-accurately;
    # the authoritative score is the JVM double-precision expression, which
    # matches DuckDB's DOUBLE[] computation bit-for-bit after an f32 round-trip.
    probes_small = left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("__qv"))
    return (
        cand.join(F.broadcast(probes_small), "qid")
        .select("qid", "rid", distance_expr("__qv", "v", metric).alias("score"))
    )


def _quantized_candidates(
    left: DataFrame,
    data: DataFrame,
    left_id: str,
    k_sel: int,
    metric: str,
    index,
    probe_mask,
    excluded_ids,
    probes_pdf,
    data_cols: list,
    bc_extra,
    make_batch_scorer,
) -> DataFrame:
    """Shared probe-mask fold for codes-only candidate generation over a
    quantized artifact (PQ and SQ8 wrap this with their scorers): scans
    only ``data_cols`` (never the f32 vectors), keeps an O(k_sel x nq)
    running per-probe top-k across the partition's Arrow batches, and
    returns (qid, rid) pairs for the caller's exact re-rank.

    ``make_batch_scorer(extra, qmat, metric)`` runs once per partition
    (e.g. PQ builds its per-query LUTs there) and returns a per-batch
    function ``prep(pdf) -> score(q0, q1) -> (n, chunk) ndarray``.
    """
    import numpy as np

    spark = left.sparkSession
    qids = probes_pdf["qid"].to_numpy()
    qmat = as_matrix(probes_pdf["v"]) if len(probes_pdf) else None
    excl = np.asarray(list(excluded_ids)) if excluded_ids is not None and len(excluded_ids) else None
    bc = tracked_broadcast(spark.sparkContext, (qids, qmat, probe_mask, excl, bc_extra))
    desc = METRIC_IS_DESCENDING[metric]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        qids_l, qmat_l, mask_l, excl_l, extra_l = bc.value
        if qmat_l is None:
            return
        nq = len(qids_l)
        prep = make_batch_scorer(extra_l, qmat_l, metric)
        best_scores = best_rids = None
        for pdf in batches:
            if excl_l is not None and len(pdf):
                pdf = pdf[~pdf["rid"].isin(excl_l)]
            if len(pdf) == 0:
                continue
            rids = pdf["rid"].to_numpy()
            score = prep(pdf)
            if best_scores is None:
                best_scores = np.full((k_sel, nq), -np.inf if desc else np.inf)
                rid_numeric = np.issubdtype(rids.dtype, np.number)
                best_rids = (
                    np.full((k_sel, nq), -1, dtype=np.int64)
                    if rid_numeric
                    else np.full((k_sel, nq), None, dtype=object)
                )
            lists = pdf["__lst"].to_numpy() if mask_l is not None else None
            for q0 in range(0, nq, _PROBE_CHUNK):
                q1 = min(q0 + _PROBE_CHUNK, nq)
                scores = score(q0, q1)
                if mask_l is not None:
                    allowed = mask_l[lists][:, q0:q1]
                    scores = np.where(allowed, scores, -np.inf if desc else np.inf)
                idx = local_topk(scores, k_sel, desc)
                cols = np.arange(q1 - q0)[None, :]
                merged_s = np.vstack([best_scores[:, q0:q1], scores[idx, cols]])
                merged_r = np.vstack([best_rids[:, q0:q1], rids[idx]])
                keep = local_topk(merged_s, k_sel, desc)
                best_scores[: keep.shape[0], q0:q1] = merged_s[keep, cols]
                best_rids[: keep.shape[0], q0:q1] = merged_r[keep, cols]
        if best_scores is None:
            return
        valid = np.isfinite(best_scores.ravel(order="F"))
        out_q = np.repeat(qids_l, k_sel)[valid]
        out_r = best_rids.ravel(order="F")[valid]
        yield pd.DataFrame({"qid": out_q, "rid": out_r})

    items = data.select(
        F.col("id").alias("rid"), *data_cols, F.col("list_id").alias("__lst")
    )
    qid_t = dict(left.dtypes)[left_id]
    rid_t = index.manifest.get("id_type", "bigint")
    return items.mapInPandas(gen, schema=f"qid {qid_t}, rid {rid_t}")


def _pq_batch_scorer(books_l, qmat_l, metric):
    """ADC scorer for the shared fold: per-partition per-query lookup
    tables built from the broadcast codebooks + probe matrix (nq*m*256
    doubles would be a heavy driver broadcast; recomputing per partition
    is ~33 MFLOPs), then per-batch code-indexed sums. ``cosine`` divides
    the quantized numerator by the stored true vector norm."""
    import numpy as np

    nq = len(qmat_l)
    m, ks, dsub = books_l.shape
    qsub = qmat_l.reshape(nq, m, dsub)
    lut = np.empty((nq, m, ks))
    for j in range(m):
        if metric == "l2sq":
            diff = qsub[:, j, None, :] - books_l[j][None, :, :]  # (nq, ks, dsub)
            lut[:, j, :] = (diff * diff).sum(axis=2)
        else:  # ip numerator serves both 'ip' and 'cosine'
            lut[:, j, :] = qsub[:, j, :] @ books_l[j].T
    qnorms = np.linalg.norm(qmat_l, axis=1) if metric == "cosine" else None

    def prep(pdf):
        codes = np.frombuffer(b"".join(pdf["codes"].tolist()), dtype=np.uint8).reshape(-1, m)
        n = codes.shape[0]
        vn = pdf["vnorm"].to_numpy(np.float64) if metric == "cosine" else None

        def score(q0, q1):
            s = np.zeros((n, q1 - q0))
            for j in range(m):
                s += lut[q0:q1, j, :][:, codes[:, j]].T  # (n, chunk)
            if metric == "cosine":
                s = s / np.maximum(vn[:, None] * qnorms[q0:q1][None, :], 1e-30)
            return s

        return score

    return prep


def _sq_batch_scorer(scale_l, qmat_l, metric):
    """SQ8 scorer for the shared fold: per-batch int8 dequantization + one
    GEMM — the scan reads ``dim`` bytes per row (4x less than the flat
    kernel's f32 vectors)."""
    from ..index import pq as pqmod

    def prep(pdf):
        mat = pqmod.sq_decode(pdf["sq"].tolist(), scale_l)
        return lambda q0, q1: pairwise_scores(mat, qmat_l[q0:q1], metric)

    return prep


def _candidates_broadcast_pq(
    left, data, left_on, left_id, k_sel, metric, index, probe_mask, excluded_ids, probes_pdf
) -> DataFrame:
    """ADC candidate generation over a PQ artifact (:mod:`..index.pq`):
    the shared fold over ``(rid, codes, vnorm, list_id)`` — no vectors
    enter the kernel, fold memory is O(k_sel * nq) scalars, the scan
    reads ``pq_m`` bytes per row. Returns (qid, rid) pairs."""
    return _quantized_candidates(
        left, data, left_id, k_sel, metric, index, probe_mask, excluded_ids,
        probes_pdf, data_cols=["codes", "vnorm"], bc_extra=index.pq_books,
        make_batch_scorer=_pq_batch_scorer,
    )


def _candidates_broadcast_sq(
    left, data, left_on, left_id, k_sel, metric, index, probe_mask, excluded_ids, probes_pdf
) -> DataFrame:
    """SQ8 candidate generation (``quantization: 'i8'`` artifacts): the
    shared fold over ``(rid, sq, list_id)`` with dequantized-GEMM scoring.
    Returns (qid, rid) pairs; the caller recomputes exact scores."""
    return _quantized_candidates(
        left, data, left_id, k_sel, metric, index, probe_mask, excluded_ids,
        probes_pdf, data_cols=["sq"], bc_extra=index.sq_scale,
        make_batch_scorer=_sq_batch_scorer,
    )


def _b1_batch_scorer(thr_l, qmat_l, metric):
    """Binary (b1) scorer for the shared fold: queries encode to packed
    sign codes once per partition, then per-batch Hamming via table-driven
    popcount — the scan reads ceil(dim/64)*8 bytes per row (32x less than
    f32 at dim=64). Emits the NEGATED distance for descending metrics so
    the fold's polarity ordering shortlists correctly; scores are a
    monotone proxy only — the caller's exact re-rank restores true
    values."""
    import numpy as np

    from ..index import pq as pqmod

    desc = METRIC_IS_DESCENDING[metric]
    qcodes = pqmod.b1_encode(np.asarray(qmat_l, dtype=np.float64), thr_l)

    def prep(pdf):
        n_words = qcodes.shape[1]
        codes = np.frombuffer(b"".join(pdf["b1"].tolist()), dtype=np.uint64).reshape(-1, n_words)

        def score(q0, q1):
            x = np.ascontiguousarray(
                np.bitwise_xor(codes[:, None, :], qcodes[None, q0:q1, :])
            )
            h = (
                pqmod._POP8[x.view(np.uint8)]
                .reshape(len(codes), q1 - q0, -1)
                .sum(axis=2)
                .astype(np.float64)
            )
            return -h if desc else h

        return score

    return prep


def _candidates_broadcast_b1(
    left, data, left_on, left_id, k_sel, metric, index, probe_mask, excluded_ids, probes_pdf
) -> DataFrame:
    """Binary candidate generation (``quantization: 'b1'`` artifacts):
    the shared fold over ``(rid, b1, list_id)`` with Hamming-proxy
    scoring. Returns (qid, rid) pairs; the caller recomputes exact
    scores."""
    return _quantized_candidates(
        left, data, left_id, k_sel, metric, index, probe_mask, excluded_ids,
        probes_pdf, data_cols=["b1"], bc_extra=index.b1_thresholds,
        make_batch_scorer=_b1_batch_scorer,
    )


def _candidates_crossjoin(
    left: DataFrame, right: DataFrame, left_on: str, right_on: str, left_id: str, right_id: str, metric: str
) -> DataFrame:
    l = left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("__lv")).filter(F.col(left_on).isNotNull())
    r = right.select(F.col(right_id).alias("rid"), F.col(right_on).alias("__rv")).filter(F.col(right_on).isNotNull())
    return l.crossJoin(r).select("qid", "rid", distance_expr("__lv", "__rv", metric).alias("score"))


def knn_join_flat(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    k: int,
    metric: str = "l2sq",
    left_id: str = None,
    right_id: str = None,
    method: str = "auto",
    broadcast_probe_limit: int = DEFAULT_BROADCAST_PROBE_LIMIT,
) -> DataFrame:
    """Flat k-NN join: ``(qid, rid, rnk, score)`` — for each left row the k
    best right rows by ``metric``, ``rnk`` 1-indexed like the reference's
    match-rank column (reference: src/hnsw/hnsw_optimize_join.cpp:146).

    Ties broken by ``rid`` so results are deterministic.
    """
    m = canonical_metric(metric)
    if left_id is None or right_id is None:
        raise ValueError("knn_join requires explicit left_id/right_id columns")
    probes_pdf = None
    if method == "auto":
        # guard folded into the probe collection itself: limit(n+1) rows come
        # back in ONE job and double as the broadcast probe matrix — no
        # separate count() pre-pass
        probes_pdf = _collect_probes(left, left_on, left_id, broadcast_probe_limit)
    use_kernel = method == "kernel" or (method == "auto" and probes_pdf is not None)
    if use_kernel:
        cand = _candidates_broadcast(
            left, right, left_on, right_on, left_id, right_id, k, m, probes_pdf=probes_pdf
        )
    else:
        cand = _candidates_crossjoin(left, right, left_on, right_on, left_id, right_id, m)
    desc = METRIC_IS_DESCENDING[m]
    order = [F.col("score").desc() if desc else F.col("score").asc(), F.col("rid").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rid", "rnk", "score")
    )


def _collect_probes(left: DataFrame, left_on: str, left_id: str, limit: int):
    """Collect the probe (id, vector) pairs, at most ``limit`` of them.
    Returns None when the probe side exceeds the limit (caller falls back to
    a distributed plan) — the limit+1 cap bounds driver memory, so the guard
    and the collection are one job instead of a count() pre-pass."""
    pdf = (
        left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("v"))
        .filter(F.col(left_on).isNotNull())
        .limit(limit + 1)
        .toPandas()
    )
    return None if len(pdf) > limit else pdf


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    k: int,
    metric: str = "l2sq",
    left_id: str = None,
    right_id: str = None,
    method: str = "auto",
) -> DataFrame:
    """vss_join parity: ``(score, left_tbl STRUCT, right_tbl STRUCT)`` rows,
    k matches per left row (reference: src/hnsw/hnsw_index_macros.cpp:9-46).
    ``score`` polarity follows the metric (distance for l2sq, similarity for
    cosine, inner product for ip)."""
    flat = knn_join_flat(left, right, left_on, right_on, k, metric, left_id, right_id, method)
    lstruct = left.select(F.col(left_id).alias("__qid"), F.struct(*left.columns).alias("left_tbl"))
    rstruct = right.select(F.col(right_id).alias("__rid"), F.struct(*right.columns).alias("right_tbl"))
    return (
        flat.join(rstruct, flat["rid"] == rstruct["__rid"])
        .join(lstruct, flat["qid"] == lstruct["__qid"])
        .select(F.col("score").cast("float").alias("score"), "left_tbl", "right_tbl")
    )


def knn_join_flat_indexed(
    left: DataFrame,
    index,
    left_on: str,
    k: int,
    left_id: str,
    ef_search: int | None = None,
    broadcast_probe_limit: int = DEFAULT_BROADCAST_PROBE_LIMIT,
) -> DataFrame:
    """HNSW_INDEX_JOIN analog: per-probe approximate top-k against an
    :class:`~duckdb_vss_spark.index.ivf.IVFIndex` (reference operator:
    src/hnsw/hnsw_optimize_join.cpp:30-179). Unlike the reference's
    non-parallel operator, probes and index partitions both parallelize.

    Only the ``nprobe`` nearest inverted lists per probe are searched; the
    tail is searched brute-force; deleted ids are filtered inside the kernel
    BEFORE the per-partition top-k cut. Scores are exact.

    A probe side above ``broadcast_probe_limit`` rows cannot be broadcast —
    fall back to the exact cross-join plan over the live index rows instead
    of collecting an unbounded probe table to the driver.
    """
    import numpy as np

    spark = left.sparkSession
    metric = index.metric
    probes_pdf = _collect_probes(left, left_on, left_id, broadcast_probe_limit)
    if probes_pdf is not None and len(probes_pdf) > 0 and getattr(index, "is_graph", False):
        # graph backend: probes ride a broadcast into every shard's beam-
        # search kernel (index/hnsw.py); deletions filtered before the
        # global per-probe rank window, tail competes brute-force — the
        # same contract as the IVF kernel path below
        raw = index.search_join(
            spark, probes_pdf, k, ef_search, qid_type=dict(left.dtypes)[left_id]
        ).withColumnRenamed("id", "rid")
        # exact-score recompute in the JVM (kernel scores are ~1e-8 GEMM)
        probes_small = left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("__qv"))
        cand = raw.join(F.broadcast(probes_small), "qid").select(
            "qid", "rid", distance_expr("__qv", "vec", metric).alias("score")
        )
        excl, del_df, del_small = _deleted_exclusion(index, spark)
        cand = _anti_join_deleted(cand, del_df, del_small, id_col="rid")
        tail = index.tail_df(spark)
        if tail is not None:
            if del_df is not None and excl is None:
                tail = _anti_join_deleted(tail, del_df, del_small)
            cand = cand.unionByName(
                _candidates_broadcast(
                    left, tail, left_on, "vec", left_id, "id", k, metric,
                    excluded_ids=excl, probes_pdf=probes_pdf,
                )
            )
        desc = METRIC_IS_DESCENDING[metric]
        order = [F.col("score").desc() if desc else F.col("score").asc(), F.col("rid").asc()]
        w = Window.partitionBy("qid").orderBy(*order)
        return (
            cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("qid", "rid", "rnk", "score")
        )
    if (
        probes_pdf is not None
        and len(probes_pdf) >= DISTRIBUTED_MIN_PROBES
        and not getattr(index, "is_graph", False)
    ):
        # probe side large enough that the cell-cogroup path's
        # O(N x nq x nprobe/nlist) compute beats the broadcast kernel's
        # O(N x nq) (see DISTRIBUTED_MIN_PROBES)
        return knn_join_flat_indexed_distributed(left, index, left_on, k, left_id, ef_search)
    if probes_pdf is None:
        # probe side too big to broadcast. IVF backends take the fully
        # distributed cell-cogroup join (same probe sets, no driver
        # collect); the graph backend has no cell-local
        # exact kernel, so it keeps the exact cross-join fallback over live
        # rows (and its module docs route performance users to IVF anyway).
        if not getattr(index, "is_graph", False):
            return knn_join_flat_indexed_distributed(left, index, left_on, k, left_id, ef_search)
        full = index.data_df(spark).select("id", "vec")
        tail = index.tail_df(spark)
        if tail is not None:
            full = full.unionByName(tail)
        deleted = index.deleted_df(spark)
        if deleted is not None:
            # no forced broadcast hint: the tombstone set is unbounded in
            # principle; AQE broadcasts it while it actually fits
            full = full.join(deleted, "id", "left_anti")
        return knn_join_flat(left, full, left_on, "vec", k, metric, left_id, "id", method="crossjoin")
    if len(probes_pdf) == 0:
        return spark.createDataFrame([], f"qid {dict(left.dtypes)[left_id]}, rid {index.manifest.get('id_type', 'bigint')}, rnk int, score double")
    qmat = as_matrix(probes_pdf["v"])
    nprobe = index.nprobe_for(ef_search)
    # (nq, nlist) centroid scores -> per-probe probe sets -> (nlist, nq) mask
    probe_sets = index.probe_lists_batch(qmat, nprobe)
    mask = np.zeros((index.nlist, len(probes_pdf)), dtype=bool)
    for qi, lists in enumerate(probe_sets):
        mask[lists, qi] = True
    needed = sorted({int(l) for lists in probe_sets for l in lists})
    quantized = (
        getattr(index, "pq_books", None) is not None
        or getattr(index, "sq_scale", None) is not None
        or getattr(index, "b1_thresholds", None) is not None
    )
    if len(needed) >= 0.5 * index.nlist and not quantized:
        # the probes' combined lists cover most of the index: the masked
        # kernel would scan nearly everything AND pay per-row mask checks.
        # The exact flat GEMM join over the live rows is then both faster
        # and a strict recall superset — route there (measured at 10M rows:
        # masked path 2x slower than brute once coverage passes ~1/2)
        full = index.data_df(spark).select("id", "vec")
        tail = index.tail_df(spark)
        if tail is not None:
            full = full.unionByName(tail)
        deleted = index.deleted_df(spark)
        if deleted is not None:
            # no forced broadcast hint (unbounded set; AQE decides)
            full = full.join(deleted, "id", "left_anti")
        return knn_join_flat(left, full, left_on, "vec", k, metric, left_id, "id")
    # deleted ids ride into the kernel (so live rows keep all k slots) only
    # while the tombstone set fits DELETED_IDS_KERNEL_CAP — the reference's
    # in-RAM free list (usearch/index_dense.hpp:1228-1248) has no such
    # bound because it never leaves one process; ours must. Above the cap,
    # exclusion anti-joins the item side BEFORE the kernel instead.
    excl, del_df, del_small = _deleted_exclusion(index, spark)
    data = index.data_df(spark, needed)
    if del_df is not None and excl is None:
        data = _anti_join_deleted(data, del_df, del_small)
    # shortlist broadcast bound: <= |probed lists| * nq * k_sel (qid, rid)
    # pairs; beyond ~8M pairs the flat vector kernel is the safer plan
    rerank_mult = int(
        index.manifest.get(
            "pq_rerank",
            index.manifest.get("sq_rerank", index.manifest.get("b1_rerank", 4)),
        )
    )
    pq_pairs_est = len(needed) * len(probes_pdf) * max(k, k * rerank_mult)
    if quantized and pq_pairs_est <= 8_000_000:
        # codes-only kernel (ADC for PQ, dequantized GEMM for SQ8); exact
        # scores recomputed on a vec fetch driven by a broadcast of the
        # (qid, rid) shortlist — the expensive codes scan runs once (inside
        # the broadcast job), and the vec scan streams against it with no
        # shuffle of the data side.
        k_sel = max(k, k * rerank_mult)
        if getattr(index, "pq_books", None) is not None:
            cand_ids = _candidates_broadcast_pq(
                left, data, left_on, left_id, k_sel, metric, index, mask, excl, probes_pdf
            )
        elif getattr(index, "sq_scale", None) is not None:
            cand_ids = _candidates_broadcast_sq(
                left, data, left_on, left_id, k_sel, metric, index, mask, excl, probes_pdf
            )
        else:
            cand_ids = _candidates_broadcast_b1(
                left, data, left_on, left_id, k_sel, metric, index, mask, excl, probes_pdf
            )
        rvec = data.select(F.col("id").alias("rid"), F.col("vec").alias("__rv")).join(
            F.broadcast(cand_ids), "rid"
        )
        probes_small = left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("__qv"))
        cand = rvec.join(F.broadcast(probes_small), "qid").select(
            "qid", "rid", distance_expr("__qv", "__rv", metric).alias("score")
        )
    else:
        cand = _candidates_broadcast(
            left, data, left_on, "vec", left_id, "id", k, metric,
            probe_mask=mask, right_list_col="list_id", excluded_ids=excl, probes_pdf=probes_pdf,
        )
    # tail rows compete for every probe (brute force); the already-collected
    # probe table is reused, so the tail union costs no extra driver job
    tail = index.tail_df(spark)
    if tail is not None:
        if del_df is not None and excl is None:
            tail = _anti_join_deleted(tail, del_df, del_small)
        cand = cand.unionByName(
            _candidates_broadcast(
                left, tail, left_on, "vec", left_id, "id", k, metric,
                excluded_ids=excl, probes_pdf=probes_pdf,
            )
        )
    desc = METRIC_IS_DESCENDING[metric]
    order = [F.col("score").desc() if desc else F.col("score").asc(), F.col("rid").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rid", "rnk", "score")
    )


def knn_join_flat_indexed_distributed(
    left: DataFrame,
    index,
    left_on: str,
    k: int,
    left_id: str,
    ef_search: int | None = None,
) -> DataFrame:
    """HNSW_INDEX_JOIN for probe sides too large to broadcast — the fully
    distributed shape (no driver collect anywhere):

    1. map-side cell assignment: probes carry their vector into
       ``nearest_cells`` against the broadcast centroid matrix and explode
       to one ``(qid, qv, list_id)`` row per probed cell — the same probe
       sets as the broadcast path (shared rule in ``kernels.nearest_cells``);
    2. one Exchange of each side keyed by ``list_id``, then a
       ``cogroup().applyInPandas`` per cell: one GEMM per (cell probes x
       cell rows) emitting ``k`` candidate ``(qid, rid, kernel_score)``
       rows per probe per cell — vectors never leave the cell task;
    3. the bounded tail (``tail_max_rows``) broadcasts INTO a probe-side
       pass (the probe side is the big one here, so the usual
       probes-broadcast kernel is inverted) and its candidates union in;
    4. per-probe global rank on the kernel score cut to ``k + band``, then
       the survivors join back to their vectors for the authoritative JVM
       exact score and the final ``k``-cut — identical to the broadcast
       path's output (same eps-band discipline as ``topk(method="kernel")``)
       except under >k-way EXACT score ties at the boundary, where every
       kernel path (this one, the broadcast fold, the single-probe search)
       returns an arbitrary valid subset of the tied group — the reference
       has the same property and its tests sidestep ties with seeded data
       (reference: test/sql/hnsw/hnsw_lateral_join_group.test:8).

    Replaces the previous behavior for this regime — an exact cross join,
    which is O(|probes| x |index|) and a scale cliff at 1M+ probes. Pair
    volume here is ``nq x nprobe x k`` candidate rows plus one
    ``nq x nprobe`` probe fan-out Exchange: linear in the probe count at
    fixed probe budget, executor-parallel end to end.
    """
    import numpy as np

    from ..broadcasts import tracked_broadcast
    from ..functions.kernels import nearest_cells

    spark = left.sparkSession
    metric = index.metric
    desc = METRIC_IS_DESCENDING[metric]
    nprobe = min(index.nprobe_for(ef_search), index.nlist)
    qid_t = dict(left.dtypes)[left_id]
    rid_t = index.manifest.get("id_type", "bigint")
    probes = left.select(F.col(left_id).alias("qid"), F.col(left_on).alias("qv")).filter(
        F.col(left_on).isNotNull()
    )
    bc_assign = tracked_broadcast(spark.sparkContext, (index.centroids, metric, nprobe))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cents_l, metric_l, np_l = bc_assign.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.ascontiguousarray(np.vstack(pdf["qv"].to_numpy()), dtype=np.float64)
            cells = nearest_cells(qm, cents_l, metric_l, np_l)
            n, w = cells.shape
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["qid"].to_numpy(), w),
                    "qv": np.repeat(pdf["qv"].to_numpy(), w),
                    "list_id": cells.astype(np.int64).ravel(),
                }
            )

    probe_cells = probes.mapInPandas(assign, schema=f"qid {qid_t}, qv array<float>, list_id long")

    # tombstones ride into the cell kernel only below DELETED_IDS_KERNEL_CAP;
    # above it the item side is anti-joined before the cogroup instead
    excl, del_df, del_small = _deleted_exclusion(index, spark)
    # SQ8 artifacts ship their int8 codes through the cell Exchange instead
    # of f32 vectors — 4x less data-side shuffle, which is exactly the cost
    # this large-probe path exists to manage; membership then follows the
    # quantized-shortlist contract (k * sq_rerank candidates per cell, exact
    # re-rank downstream), same as the broadcast SQ kernel.
    sq_scale = getattr(index, "sq_scale", None)
    k_cell = k if sq_scale is None else max(k, k * int(index.manifest.get("sq_rerank", 4)))
    bc_excl = tracked_broadcast(
        spark.sparkContext, (np.asarray(excl) if excl else None, sq_scale)
    )

    def cell_topk(probes_pdf: pd.DataFrame, items_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from ..index import pq as pqmod

        excl_l, scale_l = bc_excl.value
        if excl_l is not None and len(items_pdf):
            items_pdf = items_pdf[~items_pdf["id"].isin(excl_l)]
        if len(probes_pdf) == 0 or len(items_pdf) == 0:
            return pd.DataFrame({"qid": [], "rid": [], "ks": []}).astype(
                {"ks": "float64"}
            )
        if scale_l is not None:
            imat = pqmod.sq_decode(items_pdf["sq"].tolist(), scale_l)
        else:
            imat = np.ascontiguousarray(np.vstack(items_pdf["vec"].to_numpy()), dtype=np.float64)
        rids = items_pdf["id"].to_numpy()
        out_q, out_r, out_s = [], [], []
        for q0 in range(0, len(probes_pdf), _PROBE_CHUNK):
            chunk = probes_pdf.iloc[q0 : q0 + _PROBE_CHUNK]
            qmat = np.ascontiguousarray(np.vstack(chunk["qv"].to_numpy()), dtype=np.float64)
            scores = pairwise_scores(imat, qmat, metric)  # (n_items, chunk)
            idx = local_topk(scores, k_cell, desc)  # (k', chunk)
            cols = np.arange(scores.shape[1])[None, :]
            kk = idx.shape[0]
            out_q.append(np.repeat(chunk["qid"].to_numpy(), kk))
            out_r.append(rids[idx].ravel(order="F"))
            out_s.append(scores[idx, cols].ravel(order="F"))
        return pd.DataFrame(
            {"qid": np.concatenate(out_q), "rid": np.concatenate(out_r), "ks": np.concatenate(out_s)}
        )

    data_col = "sq" if sq_scale is not None else "vec"
    data = index.data_df(spark).select("id", data_col, F.col("list_id").cast("long").alias("list_id"))
    if del_df is not None and excl is None:
        data = _anti_join_deleted(data, del_df, del_small)
    cand = (
        probe_cells.groupBy("list_id")
        .cogroup(data.groupBy("list_id"))
        .applyInPandas(cell_topk, schema=f"qid {qid_t}, rid {rid_t}, ks double")
    )

    tail = index.tail_df(spark)
    if tail is not None:
        if del_df is not None and excl is None:
            tail = _anti_join_deleted(tail, del_df, del_small)
        tail_pdf = tail.toPandas()  # bounded by the compact cadence / tail_max_rows
        if excl:
            tail_pdf = tail_pdf[~tail_pdf["id"].isin(excl)]
        if len(tail_pdf):
            bc_tail = tracked_broadcast(
                spark.sparkContext,
                (
                    tail_pdf["id"].to_numpy(),
                    np.ascontiguousarray(np.vstack(tail_pdf["vec"].to_numpy()), dtype=np.float64),
                ),
            )

            def tail_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                import numpy as np

                t_rids, t_mat = bc_tail.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    qmat = np.ascontiguousarray(np.vstack(pdf["qv"].to_numpy()), dtype=np.float64)
                    scores = pairwise_scores(t_mat, qmat, metric)
                    idx = local_topk(scores, k, desc)
                    cols = np.arange(scores.shape[1])[None, :]
                    kk = idx.shape[0]
                    yield pd.DataFrame(
                        {
                            "qid": np.repeat(pdf["qid"].to_numpy(), kk),
                            "rid": t_rids[idx].ravel(order="F"),
                            "ks": scores[idx, cols].ravel(order="F"),
                        }
                    )

            cand = cand.unionByName(
                probes.mapInPandas(tail_topk, schema=f"qid {qid_t}, rid {rid_t}, ks double")
            )

    # per-probe kernel-score cut with an eps band (GEMM is ~1e-13 relative
    # of the sequential fold; band 8 >> any plausible near-tie pileup; for
    # SQ8 the cut keeps the full k_cell shortlist — quantization error is
    # absorbed by the rerank budget, not the band), then the authoritative
    # JVM score on the survivors
    order_ks = [F.col("ks").desc() if desc else F.col("ks").asc(), F.col("rid").asc()]
    w_ks = Window.partitionBy("qid").orderBy(*order_ks)
    short = cand.withColumn("__r", F.row_number().over(w_ks)).filter(F.col("__r") <= k_cell + 8).drop("__r")

    vec_src = index.data_df(spark).select(F.col("id").alias("rid"), F.col("vec").alias("__rv"))
    if tail is not None:
        vec_src = vec_src.unionByName(
            tail.select(F.col("id").alias("rid"), F.col("vec").alias("__rv"))
        )
    rescored = (
        short.join(vec_src, "rid")
        .join(probes.withColumnRenamed("qv", "__qv"), "qid")
        .select("qid", "rid", distance_expr("__qv", "__rv", metric).alias("score"))
    )
    order = [F.col("score").desc() if desc else F.col("score").asc(), F.col("rid").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rid", "rnk", "score")
    )


def knn_match(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    k: int,
    metric: str = "l2sq",
    left_id: str = None,
    right_id: str = None,
    method: str = "auto",
) -> DataFrame:
    """vss_match parity: left rows + ``matches`` = LIST<STRUCT{score, row}>
    of the k best right rows (reference: src/hnsw/hnsw_index_macros.cpp:48-74).
    List is best-first, like min_by/max_by output order."""
    m = canonical_metric(metric)
    flat = knn_join_flat(left, right, left_on, right_on, k, m, left_id, right_id, method)
    return match_from_flat(flat, left, right, left_id, right_id)


def match_from_flat(flat: DataFrame, left: DataFrame, right: DataFrame, left_id: str, right_id: str) -> DataFrame:
    """Assemble the vss_match output shape from any flat (qid, rid, rnk,
    score) k-NN result — shared by the exact and indexed paths."""
    rstruct = right.select(F.col(right_id).alias("__rid"), F.struct(*right.columns).alias("row"))
    matched = flat.join(rstruct, flat["rid"] == rstruct["__rid"]).select(
        "qid", "rnk", F.struct(F.col("score").cast("float").alias("score"), F.col("row").alias("row")).alias("m")
    )
    per_q = matched.groupBy("qid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("rnk").alias("k"), F.col("m").alias("m")))),
            lambda e: e["m"],
        ).alias("matches")
    )
    return left.join(per_q, left[left_id] == per_q["qid"], "left").drop("qid")
