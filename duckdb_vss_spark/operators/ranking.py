"""Lexical relevance ranking: Okapi BM25 over a document table.

A training-data pipeline needs lexical retrieval next to the vector paths —
for targeted corpus slicing ("pull the docs about X"), hybrid
lexical+vector rerank, and seed-set expansion. The reference engine has no
lexical surface (north-star extension, like :mod:`.quality`); the duckdb
oracle twin lives in ``__spark_entry__`` (entry q50).

Spark-first shape (100 TB posture):

- The query side is a SMALL bag of terms — so nothing explodes. Per-doc
  term frequencies are per-row array expressions (``size(filter(tokens,
  x = t))`` for each query term), a pure map-side projection.
- Corpus statistics (N, avgdl, per-term document frequencies) reduce in
  ONE tiny aggregate job (k_q + 2 numbers total), then fold into the
  scoring expression as literals — the classic broadcast-scalars pattern.
- Scoring is again a map-only projection; the only exchange in the whole
  operator is the final top-N cut (``TakeOrderedAndProject``).

BM25 variant: the Lucene/ATIRE "+1" idf — ``ln(1 + (N - df + 0.5) /
(df + 0.5))`` — which keeps idf positive for terms in over half the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["bm25_rank", "tfidf_top_terms", "rrf_fuse", "mmr_rerank", "maxsim_topk"]


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Rank documents by Okapi BM25 against ``query_terms``.

    Returns ``(id_col, score_col)`` ordered best-first (ties broken by id);
    ``limit`` caps the output (plans as a partial top-N per partition).
    Documents matching no term score 0.0 and still appear (rank-stable
    under corpus growth), so callers slicing a corpus should pass
    ``limit`` or filter ``score > 0``.
    """
    if not query_terms:
        raise ValueError("bm25_rank requires at least one query term")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    toks = tokens(text_col)

    def _match(term: str):
        # NOTE: a (x, t=t) default-arg lambda would read as the two-arg
        # (element, index) HOF form to PySpark's arity inspection
        return lambda x: x == F.lit(term)

    base = df.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[F.size(F.filter(toks, _match(t))).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    # ONE tiny reduce: N, avgdl, and each term's document frequency
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__dl").alias("avgdl"),
        *[F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"df_{i}") for i in range(len(terms))],
    ).collect()[0]
    n, avgdl = stats["n"], float(stats["avgdl"] or 0.0)
    if n == 0:
        raise ValueError("bm25_rank over an empty document table")
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = math.log(1.0 + (n - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5))
        tf = F.col(f"__tf_{i}").cast("double")
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.lit(avgdl))
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
    out = base.select(F.col(id_col), score.alias(score_col)).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return out.limit(limit) if limit else out


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` terms of each document
    by tf·idf, with ``idf = ln(N / df)`` (N = corpus docs, df = docs
    containing the term) and tf the raw in-document count.

    Output: ``(id_col, term, rank, tf, df, tfidf)`` — ``rank`` 1-based by
    descending tf·idf, ties broken by term ascending so results are
    deterministic and hash-comparable. ``min_df`` drops hapax noise when
    raised above 1.

    Scale shape: explode → one (id, term) count aggregation (map-side
    combinable, skew-safe: raw token rows shuffle on the well-spread
    (id, term) pair, never on term alone) → the tf frame is materialized
    ONCE via ``localCheckpoint`` and feeds both the term-level
    document-frequency aggregation and the join back (Spark has no
    common-subplan dedup, so without it the whole tokenize/explode/count
    pipeline runs twice — measured as a duplicated subtree in the executed
    plan; a checkpoint is used instead of ``persist`` so the blocks are
    reclaimed by the ContextCleaner when the result is dropped, rather
    than pinned in the cache manager for the session) → join term stats back
    (vocabulary ≪ corpus; AQE broadcasts when it fits) → per-document
    window top-k (one hash shuffle on id). N is a single-number driver
    aggregate. No step is quadratic; nothing wider than (id, term, counts)
    enters an Exchange.
    """
    from pyspark.sql import Window

    from .dedup import _fan_out

    n_docs = df.count()
    tf = (
        _fan_out(df)
        .select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") >= min_df)
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.col("tf").cast("double") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
    )
    w = Window.partitionBy("__id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col("__id").alias(id_col), "term", "rank", "tf", "df", "tfidf")
    )


def rrf_fuse(
    lists: dict[str, DataFrame],
    id_col: str,
    score_col: str = "score",
    k: int = 60,
    limit: int | None = None,
    out_col: str = "rrf_score",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    ranked shortlists — the standard hybrid-retrieval combiner for a
    lexical list (:func:`bm25_rank`) and a vector list (``topk`` /
    ``HNSW_INDEX_SCAN``), robust to incomparable score scales because only
    RANKS enter the fusion: ``rrf(d) = sum_lists 1 / (k + rank_list(d))``.

    ``lists`` maps a tag to a ``(id_col, score_col)`` shortlist where
    HIGHER score = better (pass similarities or negated distances).
    Returns ``(id_col, out_col, n_lists)`` best-first, ties by id.

    Scale shape: the inputs are SHORTLISTS — each already cut to its own
    top-N by an upstream partial top-k — so the per-list global
    ``row_number`` window (one single-partition task per list) is over
    hundreds of rows, not the corpus; that is the contract, and it is what
    makes rank-based fusion computable at all (a corpus-wide dense rank
    would be a global sort). The fused aggregation folds each doc's
    per-list contributions in TAG order (``sort_array`` over a
    struct-packed list) so the double sum is bit-stable across engines
    and partitionings, per the cross-engine float discipline.
    """
    if not lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    from pyspark.sql import Window

    tagged = None
    for tag in sorted(lists):
        df = lists[tag]
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        part = df.select(
            F.lit(tag).alias("__tag"),
            F.col(id_col),
            F.row_number().over(w).alias("__rank"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    contrib = tagged.withColumn(
        "__c", F.lit(1.0) / (F.lit(float(k)) + F.col("__rank").cast("double"))
    )
    fused = (
        contrib.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("__tag", "__c"))).alias("__cs"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .select(
            F.col(id_col),
            F.aggregate(
                "__cs", F.lit(0.0), lambda acc, s: acc + s["__c"]
            ).alias(out_col),
            "n_lists",
        )
        .orderBy(F.col(out_col).desc(), F.col(id_col).asc())
    )
    return fused.limit(limit) if limit else fused


def mmr_rerank(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    lam: float = 0.5,
    pool: int = 64,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    1998): pick ``k`` results that balance relevance to ``query_vec``
    against redundancy with what is already picked —
    ``argmax_d lam * sim(q, d) - (1 - lam) * max_{s in S} sim(d, s)`` —
    the classic diversification pass over an ANN/brute top-``pool``
    shortlist. Cosine similarity throughout (MMR needs a bounded,
    scale-free sim; l2 distances are neither).

    Returns ``(id_col, mmr_rank, relevance, mmr_score)`` in selection
    order; ``mmr_score`` of the first pick is its pure relevance (the
    redundancy term is empty-max = 0 only AFTER the first pick by the
    paper's convention — we seed with the most relevant doc).

    Scale shape: the DISTRIBUTED work is the pool cut (partial top-k per
    partition — the same plan as ``topk``) and the pool x pool similarity
    join (``pool**2`` rows, pool <= ~1k by contract, all JVM
    expressions); the greedy selection itself is inherently sequential
    (each pick conditions the next) and runs on the driver over the
    bounded ``pool``-sized candidate set — the standard shape for this
    operator (rerankers run on shortlists, never corpora). Both the
    relevance and the pairwise sims come from the SAME JVM
    ``array_cosine_similarity`` expression the exact top-k paths use, so
    selections are bit-reproducible across engines and partitionings.
    """
    if k <= 0:
        raise ValueError("mmr_rerank requires k > 0")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("mmr_rerank requires 0 <= lam <= 1")
    from ..functions.distance import array_cosine_similarity

    spark = df.sparkSession
    id_t = dict(df.dtypes)[id_col]
    # zero-norm vectors must be dropped BEFORE the cosine is evaluated:
    # under ANSI mode the 0/0 throws DIVIDE_BY_ZERO, and under legacy mode
    # the NaN would sort ABOVE every double, hijacking the pool cut and
    # (NaN poisons every later > comparison) the greedy argmax
    sqnorm = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cand = (
        df.filter(F.col(vec_col).isNotNull() & (sqnorm > 0.0))
        .select(
            F.col(id_col),
            F.col(vec_col),
            array_cosine_similarity(F.col(vec_col), query_vec).alias("__rel"),
        )
        .orderBy(F.col("__rel").desc(), F.col(id_col).asc())
        .limit(pool)
    )
    cand = cand.localCheckpoint(eager=False)  # pool feeds two subplans
    a = cand.select(F.col(id_col).alias("__ia"), F.col(vec_col).alias("__va"))
    b = cand.select(F.col(id_col).alias("__ib"), F.col(vec_col).alias("__vb"))
    pair_rows = (
        a.join(b, F.col("__ia") < F.col("__ib"))
        .select(
            "__ia", "__ib",
            array_cosine_similarity(F.col("__va"), F.col("__vb")).alias("__sim"),
        )
        .collect()
    )
    sims = {(r["__ia"], r["__ib"]): r["__sim"] for r in pair_rows}

    def _sim(x, y):
        return sims[(x, y)] if x < y else sims[(y, x)]

    rel = {r[id_col]: r["__rel"] for r in cand.select(id_col, "__rel").collect()}
    remaining = sorted(rel)
    selected: list[tuple] = []  # (id, mmr_score)
    while remaining and len(selected) < k:
        best_id, best_score = None, None
        for d in remaining:  # iterate in id order -> deterministic ties
            red = max((_sim(d, s) for s, _ in selected), default=None)
            score = rel[d] if red is None else lam * rel[d] - (1.0 - lam) * red
            if best_score is None or score > best_score:
                best_id, best_score = d, score
        selected.append((best_id, best_score))
        remaining.remove(best_id)
    out = [
        (i + 1, d, float(rel[d]), float(s)) for i, (d, s) in enumerate(selected)
    ]
    return spark.createDataFrame(
        out, f"mmr_rank int, {id_col} {id_t}, relevance double, mmr_score double"
    )


def maxsim_topk(
    df: DataFrame,
    vec_col: str,
    doc_col: str,
    query_vecs: list[list[float]],
    k: int = 10,
    method: str = "auto",
    score_col: str = "maxsim",
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia, SIGIR
    2020): each document is a BAG of token vectors (multiple rows sharing
    ``doc_col``), the query is a small bag of token vectors, and

        ``maxsim(q, d) = sum_i max_j  <q_i, d_j>``

    — for every query token, its best-matching document token, summed.
    The reference engine is single-vector-per-row only (its
    ``hnsw_index_scan`` has no multi-vector notion, reference:
    src/hnsw/hnsw_index_scan.cpp); late interaction is the retrieval
    surface modern RAG / rerank stacks actually run, so it is part of the
    north-star pipeline set.

    Spark-first shape (100 TB posture): for each query token ``q_i`` the
    per-row similarity is a constant-unrolled codegen projection
    (:func:`..functions.distance.array_inner_product` — no Python, no
    HOF interpretation), so the whole map side is one WholeStageCodegen
    span emitting ``len(query_vecs)`` doubles per token row. The ONLY
    exchange is a partial-max aggregation keyed on ``doc_col`` carrying
    ``(doc, |Q| doubles)`` — map-side combine folds each partition's token
    rows before the shuffle, so shuffle bytes scale with the number of
    DOCUMENTS, never token rows. The final score is a fixed left-to-right
    sum of the per-query maxes (bit-stable across partitionings: MAX is
    order-insensitive, the sum order is literal), then a
    ``TakeOrderedAndProject`` top-k cut.

    ``method="kernel"`` batches the map side through one Arrow
    ``mapInPandas`` GEMM (``Q @ X^T`` per batch, partial max per doc
    within the batch) — same shuffle shape, preferable when ``|Q|`` is
    large enough (>~64 tokens) that per-column unrolled projections stop
    codegen-compiling; ``"expr"`` forces the codegen path; ``"auto"``
    picks ``expr`` for small query bags.

    Numeric contract: ``method="expr"`` is a deterministic left-to-right
    double sum — partitioning-independent, and within 1 ulp of duckdb's
    ``list_inner_product`` (whose SIMD accumulation order differs), which
    the driver gate's 9-significant-digit canonicalization absorbs. The
    kernel path's BLAS GEMM accumulation order is also implementation-
    defined to the last ulp; pin hash-gated queries to ``"expr"``.

    Perf adjudication (round 8, BASELINE.md): fusing the four unrolled
    projections (two-step element-extract select, with and without a
    CollapseProject barrier) and a zero-copy ``mapInArrow`` GEMM variant
    were all measured WORSE than or equal to this plan at 1M/10M token
    rows — codegen subexpression elimination already shares the
    ``embedding[j]`` loads across the projections (marginal cost per
    extra projection ~0.05 s/1M rows). The residual ~2.2× vs duckdb at
    10M rows is the row-at-a-time hash agg over ~docs groups vs a native
    vectorized perfect-hash groupby: an engine constant that
    parallelizes linearly with executors, not a plan-shape defect. NaN
    similarities propagate identically on both paths (the kernel partial
    max is NaN-propagating and NULL-restored at the merge, matching
    Spark's NaN-is-greatest ``F.max``), so results stay
    partitioning-independent.
    """
    if not query_vecs:
        raise ValueError("maxsim_topk requires at least one query vector")
    nq = len(query_vecs)
    if method == "auto":
        method = "expr" if nq <= 64 else "kernel"
    if method == "expr":
        from ..functions.distance import array_inner_product

        sims = df.select(
            F.col(doc_col),
            *[
                array_inner_product(vec_col, list(q)).alias(f"__ms{i}")
                for i, q in enumerate(query_vecs)
            ],
        )
        agg = sims.groupBy(doc_col).agg(
            *[F.max(f"__ms{i}").alias(f"__m{i}") for i in range(nq)]
        )
    elif method == "kernel":
        import numpy as np
        import pandas as pd

        qm = [[float(x) for x in q] for q in query_vecs]
        doc_t = df.schema[doc_col].dataType.simpleString()
        out_schema = f"{doc_col} {doc_t}, " + ", ".join(
            f"__m{i} double" for i in range(nq)
        )

        def _partial(batches):
            Q = np.asarray(qm, dtype=np.float64)  # (nq, d)
            for b in batches:
                if len(b) == 0:
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
                )  # (n, d)
                S = Q @ X.T  # (nq, n)
                # NaN-propagating grouped max (np.maximum.reduceat, unlike
                # pandas' skipna max, keeps NaN): Spark's merging F.max
                # treats NaN as greatest, so a NaN similarity must survive
                # the partial or results become partitioning-dependent.
                if b[doc_col].isna().any():
                    g = pd.DataFrame({doc_col: b[doc_col].values})
                    for i in range(Q.shape[0]):
                        g[f"__m{i}"] = S[i]
                    yield g.groupby(doc_col, as_index=False, dropna=False).agg(
                        lambda s: s.max(skipna=False)
                    )
                    continue
                codes, uniq = pd.factorize(b[doc_col], sort=False)
                order = np.argsort(codes, kind="stable")
                starts = np.searchsorted(codes[order], np.arange(len(uniq)))
                g = pd.DataFrame({doc_col: uniq})
                for i in range(Q.shape[0]):
                    g[f"__m{i}"] = np.maximum.reduceat(S[i][order], starts)
                yield g

        # pandas->Arrow uses NaN as the null sentinel, so a NaN partial max
        # arrives as NULL; coalesce it back to NaN so the merging F.max
        # keeps NaN-is-greatest semantics identical to the expr path.
        agg = (
            df.select(doc_col, vec_col)
            .mapInPandas(_partial, schema=out_schema)
            .groupBy(doc_col)
            .agg(
                *[
                    F.max(F.coalesce(F.col(f"__m{i}"), F.lit(float("nan")))).alias(f"__m{i}")
                    for i in range(nq)
                ]
            )
        )
    else:
        raise ValueError(f"unknown maxsim method {method!r}")
    score = F.col("__m0")
    for i in range(1, nq):
        score = score + F.col(f"__m{i}")
    return (
        agg.select(F.col(doc_col), score.alias(score_col))
        .orderBy(F.col(score_col).desc(), F.col(doc_col).asc())
        .limit(k)
    )
