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

__all__ = ["corpus_stats"]


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
