"""Corpus profiling: the per-stratum statistics a training-data pipeline
reads before deciding mixture weights and filters.

One operator, two aggregation branches joined on the stratum:

- scalar stats: document count, total/mean token count, exact interpolated
  token-count quantiles (p50/p90/p99) — Spark's ``percentile`` and duckdb's
  ``quantile_cont`` both implement R-7 linear interpolation, so the oracle
  twin is bit-stable;
- vocabulary: exact distinct-token count via explode + distinct agg.

Every output is exact and summation-order-independent (integer sums,
integer-ratio means, order-free quantiles), so the whole profile hash-matches
the duckdb oracle. At 100 TB the vocabulary branch is the expensive one
(distinct over the exploded token stream — shuffle size ~ corpus token
count); pass ``approx_vocab=True`` to swap it for HyperLogLog
``approx_count_distinct`` (no oracle twin then — duckdb's sketch differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = ["corpus_stats", "heavy_hitters"]


def heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 50,
    counters: int = 4096,
    check: bool = True,
) -> DataFrame:
    """EXACT top-``k`` most frequent tokens without shuffling the full
    vocabulary — the 100 TB replacement for ``explode → groupBy →
    orderBy`` whose exchange carries every distinct term.

    Two passes, both map-dominated:

    1. **Candidate generation (map-only)**: a per-partition Misra-Gries
       summary with ``counters`` slots over the JVM-tokenized stream
       (Misra & Gries 1982). MG's guarantee: any term whose count in a
       partition exceeds ``n_p/(counters+1)`` survives that partition's
       summary, so any term with GLOBAL count > N/(counters+1) appears in
       at least one summary (pigeonhole over partitions). The union of
       summaries — at most ``counters × n_partitions`` small rows — is the
       candidate set.
    2. **Exact recount**: explode tokens again, broadcast-semi-join
       against the candidate terms (the filter runs map-side before any
       exchange), then an ordinary partial-aggregated count. The shuffle
       carries at most ``counters`` rows per partition instead of the
       partition's whole vocabulary — output-proportional, like
       ``grouped_topk``.

    Result: ``(term, count)``, count desc / term asc, exactly ``k`` rows
    (fewer if the vocabulary is smaller). With ``check=True`` the
    exactness condition is verified from the data (kth count must exceed
    ``N/(counters+1)``; otherwise a heavier-tailed ``counters`` is needed)
    and a warning is emitted if it fails — the top-k returned is then
    still drawn from true counts of the candidates, only completeness of
    the candidate set is at risk.

    The Arrow kernel merges per-batch ``np.unique`` counts into the MG
    dict, so Python work is O(distinct-per-batch), not O(tokens).
    """
    import numpy as np
    import pandas as pd

    toks = df.select(T.tokens(text_col).alias("__toks"))

    def mg(batches):
        counts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            flat: list = []
            for arr in pdf["__toks"]:
                if arr is not None and len(arr):
                    flat.append(np.asarray(arr, dtype=object))
            if not flat:
                continue
            terms, cnts = np.unique(np.concatenate(flat), return_counts=True)
            for t, c in zip(terms.tolist(), cnts.tolist()):
                counts[t] = counts.get(t, 0) + c
            if len(counts) > counters:
                # MG decrement: subtract the (size-counters)-th smallest
                # count from everyone, drop the non-positive — one
                # np.partition, not a per-token loop
                vals = np.fromiter(counts.values(), dtype=np.int64)
                m = np.partition(vals, len(counts) - counters - 1)[
                    len(counts) - counters - 1
                ]
                counts = {t: c - m for t, c in counts.items() if c > m}
        yield pd.DataFrame(
            {"term": list(counts.keys()), "lb": list(counts.values())}
        ) if counts else pd.DataFrame({"term": pd.Series([], dtype=str), "lb": pd.Series([], dtype="int64")})

    cand = (
        toks.mapInPandas(mg, schema="term string, lb long")
        .select("term")
        .distinct()
    )
    exploded = toks.select(F.explode("__toks").alias("term"))
    counted = (
        exploded.join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .count()
    )
    top = counted.orderBy(F.col("count").desc(), F.col("term").asc()).limit(k)
    if check:
        rows = top.collect()
        if len(rows) == k:
            n_total = df.select(F.sum(F.size(T.tokens(text_col)))).first()[0]
            kth = rows[-1]["count"]
            if kth <= n_total / (counters + 1):
                import warnings

                warnings.warn(
                    f"heavy_hitters: exactness bound not met (kth count {kth} <= "
                    f"N/(counters+1) = {n_total / (counters + 1):.0f}); raise "
                    f"`counters` to guarantee the candidate set is complete",
                    stacklevel=2,
                )
        return df.sparkSession.createDataFrame(rows, top.schema)
    return top


def corpus_stats(
    df: DataFrame,
    text_col: str,
    strata_col: str,
    approx_vocab: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-``strata_col`` profile of ``text_col``:

    ``(stratum, n_docs, total_tokens, mean_tokens, p50_tokens, p90_tokens,
    p99_tokens, vocab)``

    ``mean_tokens`` is computed as an exact integer ratio (not ``avg``) so
    it is independent of partial-aggregation order.
    """
    toks = df.select(F.col(strata_col).alias("stratum"), T.token_count(text_col).alias("nt"),
                     T.tokens(text_col).alias("toks"))
    scalar = toks.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.expr("percentile(nt, array(0.5, 0.9, 0.99))").alias("__q"),
    ).select(
        "stratum", "n_docs", "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).cast("float").alias("mean_tokens"),
        F.col("__q")[0].cast("float").alias("p50_tokens"),
        F.col("__q")[1].cast("float").alias("p90_tokens"),
        F.col("__q")[2].cast("float").alias("p99_tokens"),
    )
    exploded = toks.select("stratum", F.explode("toks").alias("tok"))
    vocab_agg = (
        F.approx_count_distinct("tok", rsd) if approx_vocab else F.countDistinct("tok")
    ).alias("vocab")
    vocab = exploded.groupBy("stratum").agg(vocab_agg)
    return scalar.join(vocab, "stratum")
