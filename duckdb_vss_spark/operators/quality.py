"""Corpus-quality operators for LLM training-data pipelines.

Two operators the reference engine has no analog for, but which any
large-scale pretraining pipeline runs next to dedup (SURVEY §2's
training-data surface):

- :func:`repetition_stats` — Gopher-style per-document repetition signals
  (Rae et al. 2021, "Scaling Language Models", table A1): fraction of
  duplicate lines / line characters, character coverage of the most frequent
  word n-gram, character coverage of duplicated word n-grams. Documents with
  high repetition fractions are boilerplate/spam candidates.
- :func:`decontaminate` — benchmark decontamination by shared word n-grams
  (the GPT-3 appendix-C / PaLM approach): a training document is
  contaminated if it shares any word n-gram with a held-out benchmark set.

Scale notes (the part that matters at 100 TB):

- ``repetition_stats`` computes ALL signals in ONE pass: every per-document
  multiset (tokens, lines, each n-gram size) is tagged and exploded into a
  single ``(id, kind, item)`` stream, counted with one hash aggregate, and
  folded with a second — exactly 2 Exchanges total, keys are document-local
  so there is no global skew, and map-side partial aggregation collapses the
  stream before the shuffle. No Python in the plan.
- ``decontaminate`` broadcasts the (small, deduped) benchmark gram set and
  probes it with a broadcast hash join — the training side is never
  shuffled except for the final per-document count. Benchmarks are ~10⁴-10⁶
  grams; if yours exceeds the broadcast ceiling, pre-hash grams to int64
  (functions.text.hash64) and fall back to a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = ["repetition_stats", "decontaminate"]


def _frac(num: Column, den: Column) -> Column:
    """num/den as FLOAT with the 0-denominator → 0.0 convention; numerators
    and denominators are exact int64 sums, so the single double division is
    bit-stable against the duckdb oracle."""
    return (
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))
    ).cast("float")


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    line_sep: str = "\n",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (3,),
) -> DataFrame:
    """Per-document repetition profile:

    ``(id, n_chars, total_tokens, dup_token_frac, total_lines,
    dup_line_frac, dup_line_char_frac, top{n}gram_char_frac…,
    dup{n}gram_char_frac…)``

    Definitions (deterministic, order-free — each is a ratio of exact
    integer sums):

    - ``dup_token_frac``: (token occurrences − distinct tokens) / occurrences;
    - ``dup_line_frac``: fraction of line occurrences whose line appears >1
      time; ``dup_line_char_frac``: same, weighted by line length, over total
      line characters;
    - ``top{n}gram_char_frac``: max over word n-grams of
      (count × gram length) / document length — the character coverage of
      the single heaviest n-gram (Gopher's "most frequent n-gram" made
      tie-free by maximizing coverage directly);
    - ``dup{n}gram_char_frac``: Σ over n-grams occurring >1 time of
      (count × gram length) / document length.

    ``line_sep`` is a Java regex. A document shorter than ``n`` tokens
    contributes its single partial gram (same degradation as the shingle
    builders in :mod:`..functions.text`).
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    arrays: list[tuple[str, Column]] = [
        ("t", T.tokens(text_col)),
        ("l", F.split(F.col(text_col), line_sep)),
    ]
    arrays += [(f"g{n}", T.word_ngrams_all(text_col, n)) for n in ns]
    def _tag(kind: str):
        # NB: a 2-arg lambda would be called as (element, index) by
        # F.transform — bind the tag via closure, not a default arg.
        return lambda x: F.struct(F.lit(kind).alias("kind"), x.alias("item"))

    tagged = F.concat(*[F.transform(arr, _tag(kind)) for kind, arr in arrays])
    items = df.select(
        F.col(id_col).alias("__id"),
        F.length(F.col(text_col)).alias("__n_chars"),
        F.explode(tagged).alias("s"),
    ).select("__id", "__n_chars", F.col("s.kind").alias("kind"), F.col("s.item").alias("item"))

    # Exchange 1: count each distinct (doc, kind, item); map-side combine
    # collapses repeats before the shuffle.
    cnts = items.groupBy("__id", "__n_chars", "kind", "item").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("ln", F.length("item").cast("long"))

    def _k(kind: str) -> Column:
        return F.col("kind") == kind

    cov = F.col("cnt") * F.col("ln")
    aggs = [
        F.sum(F.when(_k("t"), F.col("cnt"))).alias("total_tokens"),
        F.count(F.when(_k("t"), 1)).alias("__distinct_tokens"),
        F.sum(F.when(_k("l"), F.col("cnt"))).alias("total_lines"),
        F.sum(F.when(_k("l") & (F.col("cnt") > 1), F.col("cnt"))).alias("__dup_line_occ"),
        F.sum(F.when(_k("l"), cov)).alias("__line_chars"),
        F.sum(F.when(_k("l") & (F.col("cnt") > 1), cov)).alias("__dup_line_chars"),
    ]
    aggs += [F.max(F.when(_k(f"g{n}"), cov)).alias(f"__top{n}_cov") for n in top_ns]
    aggs += [
        F.sum(F.when(_k(f"g{n}") & (F.col("cnt") > 1), cov)).alias(f"__dup{n}_cov")
        for n in dup_ns
    ]
    # Exchange 2: fold to one row per document.
    per = cnts.groupBy("__id", "__n_chars").agg(*aggs)

    z = F.lit(0).cast("long")
    out_cols = [
        F.col("__id").alias(id_col),
        F.col("__n_chars").cast("long").alias("n_chars"),
        F.col("total_tokens"),
        _frac(F.col("total_tokens") - F.col("__distinct_tokens"), F.col("total_tokens")).alias(
            "dup_token_frac"
        ),
        F.col("total_lines"),
        _frac(F.coalesce("__dup_line_occ", z), F.col("total_lines")).alias("dup_line_frac"),
        _frac(F.coalesce("__dup_line_chars", z), F.col("__line_chars")).alias(
            "dup_line_char_frac"
        ),
    ]
    out_cols += [
        _frac(F.coalesce(f"__top{n}_cov", z), F.col("__n_chars")).alias(f"top{n}gram_char_frac")
        for n in top_ns
    ]
    out_cols += [
        _frac(F.coalesce(f"__dup{n}_cov", z), F.col("__n_chars")).alias(f"dup{n}gram_char_frac")
        for n in dup_ns
    ]
    return per.select(*out_cols)


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_df: DataFrame,
    bench_text_col: str,
    n: int = 3,
    mark_only: bool = True,
) -> DataFrame:
    """Flag (or drop) training documents sharing any word ``n``-gram with a
    benchmark corpus.

    ``mark_only=True`` returns ``df`` plus ``(n_hit_grams, contaminated)``
    where ``n_hit_grams`` counts DISTINCT benchmark grams found in the
    document; ``mark_only=False`` returns only clean rows, original schema.

    The benchmark side is deduped then broadcast — the training corpus is
    probed with a broadcast hash join, never shuffled against the benchmark.
    """
    bench_grams = (
        bench_df.select(F.explode(T.word_ngrams(bench_text_col, n)).alias("gram")).distinct()
    )
    doc_grams = df.select(
        F.col(id_col).alias("__id"), F.explode(T.word_ngrams(text_col, n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    out = (
        df.join(hits, F.col(id_col) == F.col("__id"), "left")
        .drop("__id")
        .withColumn("n_hit_grams", F.coalesce("n_hit_grams", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hit_grams") > 0)
    )
    if mark_only:
        return out
    return out.filter(~F.col("contaminated")).drop("n_hit_grams", "contaminated")
