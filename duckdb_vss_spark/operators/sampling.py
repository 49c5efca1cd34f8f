"""Deterministic data-mixing operators for training-data pipelines:
hash-based splits, stratified sampling, and sequence packing.

Beyond the reference's surface (it is a vector-search extension), but core
to what an analytics engine feeding an LLM training pipeline must do: decide
— reproducibly, on any cluster size, with no RNG state — which documents go
to train/val/test, how much of each stratum (language, source, quality
bucket) enters the mix, and how documents concatenate into fixed token-budget
sequences.

Everything is keyed off :func:`~duckdb_vss_spark.functions.text.hash64`
(md5-derived 60-bit int shared bit-for-bit with the duckdb oracle), so every
operator here is exactly reproducible across engines and across runs — no
``rand()``, no partition-order sensitivity.

Scale notes (100 TB posture):

- ``hash_split`` is a pure projection — no shuffle at all.
- ``stratified_sample`` makes the exact per-stratum cut
  (ceil(fraction * n), unlike ``df.sampleBy`` which is only
  expected-fraction) WITHOUT a per-stratum window: hash-range buckets
  keep whole prefixes, and only each stratum's boundary bucket (1/4096th
  of it) is ranked — a dominant stratum never serializes onto one
  reducer.
- ``pack_sequences`` packs per shard (e.g. language) but never windows a
  whole shard: hash-range buckets carry driver-computed token offsets and
  the running sum runs per (shard, bucket) — a dominant shard
  parallelizes across its 4096 buckets instead of serializing onto one
  reducer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..broadcasts import tracked_broadcast
from ..functions import text as T

__all__ = [
    "shuffle_shard",
    "write_shuffled_shards",
    "hash_split",
    "stratified_sample",
    "rank_split",
    "temperature_rates",
    "temperature_sample",
    "pack_sequences",
    "chunk_documents",
    "dsir_weights",
    "dsir_resample",
    "SPLIT_MOD",
    "DSIR_BUCKETS",
]

SPLIT_MOD = 1_000_000  # bucket space for split thresholds (ppm resolution)


def _hash_of(id_col: str, seed: str) -> Column:
    # cast through string so int and string ids hash identically in both engines
    return T.hash64(F.col(id_col).cast("string"), seed=seed)


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shard",
    shard_col: str = "shard",
    pos_col: str | None = None,
) -> DataFrame:
    """Deterministic global shuffle + sharding — the last stage of a
    training-data pipeline, where the curated corpus must be emitted as N
    shard files in a pseudo-random document order that every rerun (at any
    cluster size, from any input partitioning) reproduces bit-identically.

    ``shard = hash64(seed||id) % n_shards`` and the intra-shard order key
    is the same hash (ties broken by id), so both assignment and order are
    pure functions of (seed, id) — no RNG, no ``orderBy(rand())``, no
    global sort. Adding ``pos_col`` materializes the explicit intra-shard
    position via one ``row_number`` window per shard (a per-shard sort —
    fine for audit/oracle use; the writer path below gets the same order
    from ``sortWithinPartitions`` without any window).

    The shuffle quality is that of the hash: documents that were adjacent
    in the source (same crawl segment, same domain run) land in
    independent shards at independent positions, which is exactly the
    decorrelation training wants.
    """
    h = _hash_of(id_col, f"{seed}:")
    out = df.withColumn(shard_col, F.pmod(h, F.lit(n_shards)).cast("int"))
    if pos_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(shard_col).orderBy(h.asc(), F.col(id_col).asc())
        out = out.withColumn(pos_col, F.row_number().over(w))
    return out


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: str = "shard",
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` shard files in the deterministic
    shuffled order of :func:`shuffle_shard`: one ``repartition`` on the
    shard id (the only exchange) + ``sortWithinPartitions`` on the hash
    key — each shard sorts independently in its own task, so no global
    sort and no window state. Shard files come out as
    ``shard=NNN/part-*`` so a trainer can map shard -> worker by
    directory.

    The in-partition sort is ``(shard, shuffle_key, id)`` — prefixing with
    the partition column matters: the parquet writer REQUIRES its input
    sorted by the partition columns and re-sorts (destroying any other
    order) unless the child's ordering already starts with them. The
    ``shuffle_key`` column (the hash) is kept in the output so a trainer
    can audit/verify the order without recomputing it."""
    h = _hash_of(id_col, f"{seed}:")
    out = (
        df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn("shuffle_key", h)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), F.col("shuffle_key"), F.col(id_col))
    )
    out.write.partitionBy("shard").format(format).mode("overwrite").save(path)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: tuple = (0.8, 0.1, 0.1),
    labels: tuple = ("train", "val", "test"),
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing its id — deterministic,
    shuffle-free, stable under re-runs, appends, and repartitioning (a row's
    split never depends on which other rows are present).

    ``bucket = hash64(seed || id) % 1e6`` compared against cumulative-weight
    thresholds; weights are normalized so (8, 1, 1) == (0.8, 0.1, 0.1).
    """
    if len(weights) != len(labels):
        raise ValueError(f"weights ({len(weights)}) and labels ({len(labels)}) must align")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = _hash_of(id_col, seed) % SPLIT_MOD
    cum = 0.0
    expr = None
    for w, lab in zip(weights[:-1], labels[:-1]):
        cum += w / total
        t = int(round(SPLIT_MOD * cum))
        expr = (F.when if expr is None else expr.when)(bucket < t, lab)
    expr = expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1])
    return df.withColumn(out_col, expr)


# bound on driver-side (stratum, bucket) tuples for the bucketed exact cut
STRATA_CUT_TARGET = 1_000_000


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction,
    id_col: str,
    seed: str = "strata",
    internal_persist: bool = True,
    n_strata: int | None = None,
) -> DataFrame:
    """Exact-count stratified sample: within each stratum keep the first
    ``ceil(fraction * n_stratum)`` rows in hash-of-id order.

    ``fraction`` is a float (same rate everywhere) or a dict
    ``{stratum_value: rate}`` (strata absent from the dict are dropped) —
    the mixture-weights use case. Unlike ``DataFrame.sampleBy`` (Bernoulli,
    expected fraction only), the cut here is exact and deterministic.

    Scale shape (round 8): the naive form of this cut is a per-stratum
    ``row_number`` window — at 100 TB a dominant stratum (one language at
    60% of the corpus) serializes onto a single reducer. Instead the cut
    runs bucketed: rows bucket by the HIGH BITS of the ordering hash (so
    bucket ranges are order-consistent with the global (hash, id) order),
    a bounded driver aggregate of per-(stratum, bucket) counts locates
    each stratum's boundary bucket, whole buckets below the cut keep with
    no window at all, and the ``row_number`` runs only inside boundary
    buckets — 1/4096th of a stratum at default width. Output is
    row-identical to the naive window cut (pinned by test); the driver
    collect is bounded by ``STRATA_CUT_TARGET`` tuples (bucket width
    adapts to the stratum count, degenerating to the plain window cut
    when strata are so many that each stratum is small).

    Determinism contract: the cut is decided by a driver-side collect and
    applied by a separate distributed pass, so ``df`` must be
    deterministic (no ``rand()``-derived columns, no source that changes
    between actions) or already cached — otherwise the collected counts
    and the final pass can disagree and the cut is silently wrong. When
    ``df`` is not already cached it is persisted internally
    (:func:`~duckdb_vss_spark.broadcasts.tracked_persist`, bounded LRU)
    so the decision collects and the final pass read one materialization;
    note this makes the call eager. Strata totals are derived from the
    same single collect that locates the boundary buckets, so the two can
    never disagree with each other.
    """
    if isinstance(fraction, dict):
        for val, r in fraction.items():
            if not (0.0 <= r <= 1.0):
                raise ValueError(f"fraction for {val!r} must be in [0, 1]")
        # a NULL stratum never matches the dict (the old when-chain's
        # null-comparison semantics, preserved)
        _rate = lambda s: 0.0 if s is None else float(fraction.get(s, 0.0))
    else:
        if not (0.0 <= fraction <= 1.0):
            raise ValueError("fraction must be in [0, 1]")
        _rate = lambda s: float(fraction)
    from ..broadcasts import tracked_persist

    if internal_persist and not df.is_cached:
        df = tracked_persist(df)
    h = _hash_of(id_col, seed)
    # stratum count sizes the bucket width only — correctness-relevant
    # counts all come from the single per-(stratum, bucket) collect
    # below, so a caller that already knows the stratum count (e.g.
    # curate_corpus, whose temperature_rates collect is one row per
    # stratum) passes ``n_strata`` and skips this extra driver action;
    # a stale hint can only mis-size the bucket width, never the cut
    if n_strata is None or n_strata <= 0:
        n_strata = df.select(strata_col).distinct().count()
    if n_strata == 0:
        return df.filter(F.lit(False))
    k_bits = min(12, max(0, (STRATA_CUT_TARGET // n_strata).bit_length() - 1))
    bcol = (F.shiftright(h, 60 - k_bits) if k_bits > 0 else F.lit(0)).cast("int")
    per: dict = {}
    for r in (
        df.groupBy(strata_col, bcol.alias("__db"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        per.setdefault(r[0], {})[int(r["__db"])] = int(r["c"])
    # per-stratum totals derived from the SAME collect that locates the
    # boundary buckets, so cut sizes and bucket prefixes cannot disagree
    totals = {s: sum(bmap.values()) for s, bmap in per.items()}
    # driver-side boundary location per stratum: full buckets below the
    # cut keep outright; the bucket the cut lands in gets its in-bucket
    # rank budget. ceil(rate * n) reproduces the window form's
    # F.ceil(double) exactly (same IEEE product, n < 2^53).
    ACT_ALL, ACT_BOUNDARY = 2, 1
    rows = []
    for s, bmap in per.items():
        n_s = totals[s]
        rate = _rate(s)
        keep_n = math.ceil(rate * n_s) if rate > 0.0 else 0
        if keep_n <= 0:
            continue
        cum = 0
        for b in sorted(bmap):
            c = bmap[b]
            if cum + c <= keep_n:
                rows.append((s, b, ACT_ALL, 0))
                cum += c
                if cum == keep_n:
                    break
            else:
                rows.append((s, b, ACT_BOUNDARY, keep_n - cum))
                break
    spark = df.sparkSession
    s_type = dict(df.dtypes)[strata_col]
    dec = spark.createDataFrame(rows, f"__ds {s_type}, __db int, __act int, __k int")
    j = df.withColumn("__b", bcol).join(
        F.broadcast(dec),
        F.col(strata_col).eqNullSafe(F.col("__ds")) & (F.col("__b") == F.col("__db")),
    )
    w = Window.partitionBy(strata_col, "__b").orderBy(h.asc(), F.col(id_col).asc())
    return (
        j.withColumn("__rnk", F.row_number().over(w))
        .filter((F.col("__act") == ACT_ALL) | (F.col("__rnk") <= F.col("__k")))
        .drop("__ds", "__db", "__act", "__k", "__b", "__rnk")
    )


def _percent_rank_cut(n: int, e: float) -> int:
    """Largest rank r in [1, n] with ``percent_rank(r) <= e``, replicating
    Spark's IEEE double ``(r-1)/(n-1)`` (0.0 when n == 1) bit-for-bit —
    Python floats are the same IEEE doubles, so the driver-side comparison
    is exactly the one the window form would evaluate per row."""
    if n <= 1:
        return 1 if (n == 1 and 0.0 <= e) else 0
    lo_r, hi_r = 0, n  # invariant: f(lo_r) true-or-zero, f(hi_r+1) false
    while lo_r < hi_r:
        mid = (lo_r + hi_r + 1) // 2
        if (mid - 1) / (n - 1) <= e:
            lo_r = mid
        else:
            hi_r = mid - 1
    return lo_r


def rank_split(
    df: DataFrame,
    strata_col: str,
    order_col: str,
    id_col: str,
    edges: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
    out_col: str = "rank_bucket",
    internal_persist: bool = True,
) -> DataFrame:
    """Per-stratum quantile labels with exact ``percent_rank`` semantics,
    de-skewed: row gets ``labels[i]`` where ``i`` is the first edge with
    ``percent_rank() OVER (PARTITION BY strata ORDER BY order, id) <=
    edges[i]`` (last label otherwise) — the CCNet head/middle/tail tercile
    split — WITHOUT sorting any whole stratum on one reducer.

    Scale shape: the naive form is one window per stratum; a dominant
    stratum (one language at 60% of a 100 TB corpus) serializes its sort
    onto a single reducer. Here rows bucket by VALUE RANGE of
    ``order_col`` (per-stratum min/max from one aggregate; equal values
    always share a bucket, so bucket order is consistent with the rank
    order and no tie spans buckets), a bounded driver collect of
    per-(stratum, bucket) counts turns each stratum's IEEE-exact
    percent_rank cut ranks into per-bucket IN-BUCKET rank thresholds, and
    the only window runs partitioned by (stratum, bucket) — 1/4096th of a
    stratum at default width. Output is row-identical to the window form
    (pinned by test), including tie handling (``F.rank`` + bucket prefix
    reproduces the global rank exactly when (order, id) pairs repeat) and
    Spark's null-first / NaN-last ordering. Degenerate case: a stratum
    whose ``order_col`` is one constant value collapses to a single
    bucket — the naive sort, which Spark spill-sorts rather than fails.

    Used by :func:`~duckdb_vss_spark.pipelines.ccnet_curate` for the
    per-language perplexity terciles (Wenzek et al. 2020 §4.4).

    Determinism contract (same as :func:`stratified_sample`): the cut
    ranks are decided driver-side and applied by a separate distributed
    pass, so ``df`` must be deterministic or already cached; uncached
    input is persisted internally (bounded LRU) so every pass reads one
    materialization. Stratum sizes are derived from the same
    per-(stratum, bucket) collect that computes the in-bucket thresholds,
    so cut ranks and bucket prefixes cannot disagree with each other.
    """
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    if any(edges[i] >= edges[i + 1] for i in range(len(edges) - 1)):
        raise ValueError("edges must be strictly ascending")
    o_type = dict(df.dtypes)[order_col]
    if o_type not in ("tinyint", "smallint", "int", "bigint", "float", "double") and not o_type.startswith("decimal"):
        raise ValueError(
            f"rank_split orders by value-range buckets; order_col must be "
            f"numeric, got {o_type}"
        )
    from ..broadcasts import tracked_persist

    if internal_persist and not df.is_cached:
        df = tracked_persist(df)
    ocol = F.col(order_col).cast("double")
    # min/max EXCLUDE NaN (Spark's max would return NaN, killing the value
    # buckets for every row); NaN rows route straight to the top bucket,
    # where the rank comparator's NaN-last order keeps them after finite
    # values of that bucket. Stratum sizes are NOT taken from this
    # collect — they come from the per-bucket counts below, the same
    # collect that feeds the threshold prefixes.
    fin = F.when(~F.isnan(ocol), ocol)
    stats = {
        r[0]: (r["mn"], r["mx"])
        for r in df.groupBy(strata_col)
        .agg(F.min(fin).alias("mn"), F.max(fin).alias("mx"))
        .collect()
    }
    if not stats:
        return df.withColumn(out_col, F.lit(labels[-1])).filter(F.lit(False))
    nb = 1 << min(12, max(0, (STRATA_CUT_TARGET // len(stats)).bit_length() - 1))
    # per-stratum bucket expression via a broadcast stats join: NaN sorts
    # last (top bucket), nulls sort first (bucket 0), constant strata
    # collapse to bucket 0; double cast is monotone for any numeric input
    spark = df.sparkSession
    s_type = dict(df.dtypes)[strata_col]
    stats_df = spark.createDataFrame(
        [(s, float(mn) if mn is not None else None, float(mx) if mx is not None else None)
         for s, (mn, mx) in stats.items()],
        f"__rs {s_type}, __mn double, __mx double",
    )
    width = F.col("__mx") - F.col("__mn")
    raw = F.floor((ocol - F.col("__mn")) / width * nb).cast("long")
    # a stratum with non-finite width (constant, all-null, or ±inf values)
    # collapses to one bucket — the naive-sort fallback, order-trivially
    # consistent; under finite width no row can be ±inf (it would have
    # widened min/max), so raw is always defined there
    finite_w = (
        F.col("__mn").isNotNull() & (width > 0) & (width < float("inf"))
    )
    bexpr = (
        F.when(ocol.isNull(), F.lit(0))
        .when(F.isnan(ocol), F.lit(nb - 1))
        .when(~finite_w, F.lit(0))
        .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1)))
        .cast("int")
    )
    withb = df.join(
        F.broadcast(stats_df), F.col(strata_col).eqNullSafe(F.col("__rs"))
    ).withColumn("__b", bexpr)
    per: dict = {}
    for r in withb.groupBy(strata_col, "__b").agg(F.count(F.lit(1)).alias("c")).collect():
        per.setdefault(r[0], {})[int(r["__b"])] = int(r["c"])

    rows = []
    for s, bmap in per.items():
        n_s = sum(bmap.values())
        cuts = [_percent_rank_cut(n_s, e) for e in edges]
        prefix = 0
        for b in sorted(bmap):
            # in-bucket threshold: global rank = prefix + in-bucket rank
            rows.append((s, b, *[c - prefix for c in cuts]))
            prefix += bmap[b]
    tcols = ", ".join(f"__t{i} long" for i in range(len(edges)))
    dec = spark.createDataFrame(rows, f"__ds {s_type}, __db int, {tcols}")
    j = withb.join(
        F.broadcast(dec),
        F.col(strata_col).eqNullSafe(F.col("__ds")) & (F.col("__b") == F.col("__db")),
    )
    w = Window.partitionBy(strata_col, "__b").orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    rnk = F.rank().over(w)
    lab = F.when(rnk <= F.col("__t0"), labels[0])
    for i in range(1, len(edges)):
        lab = lab.when(rnk <= F.col(f"__t{i}"), labels[i])
    lab = lab.otherwise(labels[-1])
    drop = ["__rs", "__mn", "__mx", "__ds", "__db", "__b"] + [
        f"__t{i}" for i in range(len(edges))
    ]
    return j.withColumn(out_col, lab).drop(*drop)


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    weight_col: str | None = None,
    target_total: float | None = None,
) -> dict:
    """Per-stratum sampling rates under temperature mixing (Arivazhagan et
    al. 2019; the mT5/XLM-R language-balancing policy): stratum ``s`` gets
    mixture probability ``p_s ∝ n_s^alpha`` and rate
    ``min(1, T * p_s / Z / n_s)`` where ``T`` is the target corpus size
    (default: the current total, so ``alpha=1`` keeps everything and
    ``alpha=0`` equalizes strata).

    ``n_s`` counts rows, or sums ``weight_col`` (e.g. token counts) when
    given. The returned dict feeds :func:`stratified_sample` directly.

    Determinism contract (the driver hashes sampled outputs): ``Z`` folds
    the ``n^alpha`` terms in stratum-value ASCENDING order — an unordered
    sum would flap low-order bits between engines and could flip a
    ``ceil`` boundary. ``alpha=0.5`` uses ``sqrt`` (IEEE correctly
    rounded, bit-identical across engines); other alphas use ``pow``,
    identical on a shared libm but not guaranteed by IEEE.

    One map-side-combinable aggregation; the collect is one row per
    stratum (strata are vocabulary-scale next to the corpus).
    """
    agg = (F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)).cast("double")
    rows = df.groupBy(strata_col).agg(agg.alias("n")).collect()
    n = {r[0]: float(r["n"]) for r in rows}
    keys = sorted(n)
    p = {s: (math.sqrt(n[s]) if alpha == 0.5 else math.pow(n[s], alpha)) for s in keys}
    z = 0.0
    for s in keys:
        z += p[s]
    if target_total is None:
        t = 0.0
        for s in keys:
            t += n[s]
    else:
        t = float(target_total)
    return {s: min(1.0, t * p[s] / z / n[s]) for s in keys}


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    weight_col: str | None = None,
    target_total: float | None = None,
    seed: str = "strata",
) -> DataFrame:
    """Temperature-based mixture sampling: :func:`temperature_rates`
    composed with the exact-count :func:`stratified_sample` cut — the
    deterministic form of the upsample/downsample stage every multilingual
    or multi-source pretraining mix runs."""
    rates = temperature_rates(df, strata_col, alpha, weight_col, target_total)
    return stratified_sample(df, strata_col, rates, id_col, seed=seed)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str,
    shard_col: str | None = None,
    seed: str = "pack",
    out_col: str = "pack_id",
    internal_persist: bool = True,
    n_shards: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: order documents deterministically
    (hash of id) within each shard, accumulate token counts, and assign
    ``pack_id = floor(tokens_before_this_doc / budget)`` — the standard
    streaming packing an LLM data loader performs, precomputed engine-side.

    A document longer than ``budget`` still gets a pack (it will span
    chunks downstream); packs other than a shard's last hold at least
    ``budget`` tokens once their boundary document arrives, and token
    overflow per pack is bounded by one document.

    Scale shape (round 8, same treatment as :func:`stratified_sample`):
    the naive form is one running-sum window per shard, which serializes
    a dominant shard onto a single reducer. Here rows bucket by the HIGH
    BITS of the ordering hash (order-consistent with the global
    (hash, id) order within a shard), a bounded driver aggregate of
    per-(shard, bucket) token sums yields each bucket's starting offset,
    and the window runs per (shard, bucket) — 1/4096th of a shard at
    default width — with the bucket offset added before the pack-id
    division. Output is row-identical to the per-shard window (pinned by
    test); ``shard_col=None`` packs the whole frame as one logical shard
    and STILL parallelizes across the hash buckets.

    Determinism contract (same as :func:`stratified_sample`): the bucket
    offsets are decided by a driver-side collect and applied by a
    separate distributed pass, so ``df`` must be deterministic or already
    cached; uncached input is persisted internally (bounded LRU). The
    shard-count probe only sizes the bucket width — every
    correctness-relevant sum comes from the single offsets collect.
    """
    if budget < 1:
        raise ValueError("budget must be at least 1")
    from ..broadcasts import tracked_persist

    if internal_persist and not df.is_cached:
        df = tracked_persist(df)
    shard = F.col(shard_col) if shard_col else F.lit(0)
    h = _hash_of(id_col, seed)
    spark = df.sparkSession
    # shard count sizes the bucket width only (see stratified_sample's
    # n_strata note); callers that know it skip one driver action. With
    # a hint and an actually-empty frame the offsets collect is empty,
    # so the broadcast join below returns the same zero rows.
    if n_shards is None or n_shards <= 0:
        n_shards = df.select(shard.alias("__s")).distinct().count()
    if n_shards == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    k_bits = min(12, max(0, (STRATA_CUT_TARGET // n_shards).bit_length() - 1))
    bcol = (F.shiftright(h, 60 - k_bits) if k_bits > 0 else F.lit(0)).cast("int")
    per: dict = {}
    for r in (
        df.groupBy(shard.alias("__s"), bcol.alias("__pb"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
    ):
        per.setdefault(r["__s"], {})[int(r["__pb"])] = int(r["t"] or 0)
    # driver-side prefix offsets: tokens in all earlier buckets of the shard
    rows = []
    for s, bmap in per.items():
        cum = 0
        for b in sorted(bmap):
            rows.append((s, b, cum))
            cum += bmap[b]
    if shard_col:
        s_type = dict(df.dtypes)[shard_col]
    else:
        s_type = "int"
    off = spark.createDataFrame(rows, f"__ps {s_type}, __pb int, __off long")
    j = df.withColumn("__b", bcol).join(
        F.broadcast(off),
        shard.eqNullSafe(F.col("__ps")) & (F.col("__b") == F.col("__pb")),
    )
    w = (
        Window.partitionBy(shard, F.col("__b"))
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (
        F.col("__off") + F.sum(F.col(token_col).cast("long")).over(w) - F.col(token_col)
    )
    return (
        j.withColumn(out_col, F.floor(before / F.lit(int(budget))).cast("long"))
        .drop("__ps", "__pb", "__off", "__b")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Fixed-token-window chunking with overlap — the context-window
    ingest step an LLM pipeline applies to documents longer than the
    training (or embedding) sequence length.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the chunk count is
    ``max(1, ceil((n_tokens - overlap) / stride))``, so every token is
    covered, consecutive chunks share ``overlap`` tokens, and a document
    shorter than one window still yields its single (short) chunk.

    Output: ``(id_col, chunk_id, n_tokens, chunk_text)`` with ``chunk_id``
    0-based.

    Scale shape: map-only — tokenize, build the per-document chunk structs
    with ``sequence``/``transform``/``slice`` (all codegen-friendly JVM
    expressions), explode. Zero shuffles; each document is independent, so
    the operator scales with input splits like any projection.
    """
    if chunk_tokens < 2 or not (0 <= overlap < chunk_tokens):
        raise ValueError("need chunk_tokens >= 2 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = T.tokens(text_col)
    n = F.size(toks)
    # integer ceil((n - overlap) / stride), floored at 1
    n_chunks = F.greatest(
        F.lit(1),
        ((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.ctoks").cast("long").alias("n_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


DSIR_BUCKETS = 10_000  # paper default hashed-feature dimension (Xie et al. §3)
DSIR_DENSE_MAX = 4_000_000  # dense ratio array (8B/bucket, 32 MB here) is
# collected + broadcast below this; larger feature spaces take the
# relational broadcast-join path instead


def _hashed_features(text_col: str, buckets: int) -> Column:
    """Hashed unigram+bigram bag features (DSIR's representation): tokens
    then word bigrams, each hashed into ``buckets`` with the engine-shared
    md5-derived :func:`~duckdb_vss_spark.functions.text.hash64` (always
    positive, so ``%`` agrees across engines). Concatenation order
    (unigrams first) is part of the determinism contract — per-doc sums
    fold in this position order."""
    toks = T.tokens(text_col)
    bis = T.word_ngrams_all(text_col, 2)
    return F.transform(F.concat(toks, bis), lambda g: T.hash64(g) % buckets)


def _bucket_counts(src: DataFrame, text_col: str, buckets: int) -> DataFrame:
    return (
        src.select(F.explode(_hashed_features(text_col, buckets)).alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_df: DataFrame,
    target_text_col: str | None = None,
    buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    each raw document by how target-like it is under two bag-of-hashed-ngram
    unigram models. ``log_w(x) = sum_f c_f(x) * (ln p_target[f] -
    ln p_raw[f])`` with add-``smoothing`` bucket models fit on
    ``target_df`` and on ``df`` itself. Output: ``(id_col, n_feats,
    log_w)`` — one row per doc with at least one token (mirrors
    :func:`~.quality.ngram_lm_score`'s convention).

    Determinism: features hash through the engine-shared ``hash64``; the
    per-doc sum folds IN FEATURE-POSITION ORDER — ``np.cumsum`` in the
    dense kernel is the same sequential left fold of IEEE doubles as the
    relational path's ``aggregate`` HOF and duckdb's ``list_sum``, so all
    three agree bitwise (a plain ``sum()`` would add doubles in shuffle
    arrival order).

    Scale shape: two bucket-count aggregations (map-side combinable,
    output bounded by ``buckets`` rows). For feature spaces up to
    ``DSIR_DENSE_MAX`` buckets (the paper's 10k default is 400×
    below it) the log-ratio table collapses to one dense broadcast array
    and scoring is a single ``mapInPandas`` pass — the corpus NEVER
    shuffles, not even as (id, bucket) tuples. Gigantic feature spaces
    fall back to the relational plan: broadcast-join of the ratio table
    against the exploded feature stream + one per-doc aggregation (only
    (id, pos, bucket) tuples shuffle, never text)."""
    from .dedup import _fan_out, _shared

    if buckets < 1:
        raise ValueError("buckets must be positive")
    s, B = float(smoothing), buckets
    tcol = target_text_col or text_col
    tgt = _shared(_bucket_counts(target_df, tcol, buckets))
    raw = _shared(_bucket_counts(df, text_col, buckets))
    # ONE driver action for both scalar totals (crossJoin of two 1-row
    # aggregates — the video_neardup_pairs discipline); both sides are
    # persisted above, so the ratio join below reuses the materialization
    _tot = (
        tgt.agg(F.sum("__c").alias("__nt"))
        .crossJoin(raw.agg(F.sum("__c").alias("__nr")))
        .collect()[0]
    )
    nt = int(_tot["__nt"] or 0)
    nr = int(_tot["__nr"] or 0)
    dt, dr = float(nt + s * B), float(nr + s * B)
    ratio = (
        tgt.withColumnRenamed("__c", "__ct")
        .join(raw.withColumnRenamed("__c", "__cr"), "__b", "full")
        .select(
            "__b",
            (
                F.log((F.coalesce("__ct", F.lit(0)).cast("double") + s) / F.lit(dt))
                - F.log((F.coalesce("__cr", F.lit(0)).cast("double") + s) / F.lit(dr))
            ).alias("__lr"),
        )
    )
    fallback = math.log(s / dt) - math.log(s / dr)
    if buckets <= DSIR_DENSE_MAX:
        import numpy as np

        rp = ratio.toPandas()  # bounded by `buckets` rows, Arrow transfer
        dense = np.full(buckets, fallback, dtype=np.float64)
        dense[rp["__b"].to_numpy()] = rp["__lr"].to_numpy()
        spark = df.sparkSession
        bc = tracked_broadcast(spark.sparkContext, dense)
        id_t = dict(df.dtypes)[id_col]
        src = _fan_out(df.filter(F.col(text_col).isNotNull())).select(
            F.col(id_col).alias("__id"), _hashed_features(text_col, buckets).alias("__f")
        )

        def score(batches):
            # Vectorized across the batch (the round-4 kernel ran two numpy
            # calls per doc — the hottest remaining Python after simhash).
            # One gather over the concatenated feature stream, then per-doc
            # sums via zero-padded rows + cumsum(axis=1): row-wise cumsum IS
            # the sequential left fold (each prefix = previous + next), and
            # trailing +0.0 terms leave an IEEE double unchanged, so the
            # result stays bitwise-equal to the per-doc np.cumsum — which is
            # the contract with the JVM aggregate HOF and duckdb list_sum
            # (np.add.reduceat would NOT be: its segment reduce is pairwise,
            # measured bit-different on ~95% of 1k-term segments). -0.0 is
            # unreachable (log-ratio terms are never -0.0), so padding can't
            # flip a zero's sign. Docs are binned into pow-4 width classes
            # to bound the padded matrix at <= 4x the real token count.
            import numpy as np
            import pandas as pd

            table = bc.value
            for pdf in batches:
                f_arr = pdf["__f"].to_numpy()
                lens = np.fromiter(
                    (0 if f is None else len(f) for f in f_arr), dtype=np.int64, count=len(f_arr)
                )
                keep = lens > 0  # NULL-text / tokenless docs produce no rows
                if not keep.any():
                    continue
                ids = pdf["__id"].to_numpy()[keep]
                lens_k = lens[keep]
                flat = np.concatenate(list(f_arr[keep])).astype(np.int64, copy=False)
                vals = table[flat]
                starts = np.concatenate([[0], np.cumsum(lens_k)[:-1]])
                sums = np.empty(len(ids), dtype=np.float64)
                width = 8
                binned = np.zeros(len(ids), dtype=bool)
                while not binned.all():
                    sel = (~binned) & (lens_k <= width)
                    if width >= lens_k.max():
                        sel = ~binned
                    if sel.any():
                        n, w = int(sel.sum()), int(min(width, lens_k.max()))
                        idx = starts[sel, None] + np.arange(w)[None, :]
                        mask = np.arange(w)[None, :] < lens_k[sel, None]
                        rows = np.where(mask, vals[np.minimum(idx, len(vals) - 1)], 0.0)
                        sums[sel] = np.cumsum(rows, axis=1)[:, -1]
                        binned |= sel
                    width *= 4
                yield pd.DataFrame({"id": ids, "n_feats": lens_k, "log_w": sums})

        return src.mapInPandas(
            score, schema=f"id {id_t}, n_feats long, log_w double"
        ).withColumnRenamed("id", id_col)
    g = _fan_out(df.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("__id"),
        F.posexplode(_hashed_features(text_col, buckets)).alias("__pos", "__b"),
    )
    sc = g.join(F.broadcast(ratio), "__b", "left").select(
        "__id", "__pos", F.coalesce("__lr", F.lit(fallback)).alias("__lr")
    )
    per_doc = sc.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("__lr")))).alias("__arr"),
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_feats",
        F.aggregate(F.col("__arr"), F.lit(0.0), lambda a, e: a + e["__lr"]).alias("log_w"),
    )


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_df: DataFrame,
    k: int,
    target_text_col: str | None = None,
    buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR Gumbel-top-k resampling (the paper's §3 selection step, made
    deterministic): select the ``k`` docs maximizing ``log_w + g`` where
    the Gumbel noise ``g = -ln(-ln(u))`` draws ``u`` from the doc id's own
    hash (``(hash64('dsir'||id) % 2^20 + 0.5) / 2^20``) instead of an RNG
    — reproducible on any cluster size, no seed state. Output:
    ``(id_col, n_feats, log_w, key, keep)`` for every scored doc.

    Scale shape: the selection is ``ORDER BY key LIMIT k`` —
    ``TakeOrderedAndProject``, a per-partition partial top-k — and the
    keep flag comes from broadcasting those k ids back. No global sort,
    no single-partition window."""
    from .dedup import _shared

    M = 1 << 20
    w = dsir_weights(df, text_col, id_col, target_df, target_text_col, buckets, smoothing)
    u = ((_hash_of(id_col, "dsir") % M).cast("double") + 0.5) / float(M)
    # persisted: the frame is narrow (id + three numbers) and both the
    # top-k cut and the keep-flag join consume it — without this the whole
    # scoring pass runs twice
    keyed = _shared(w.withColumn("key", F.col("log_w") - F.log(-F.log(u))))
    sel = (
        keyed.orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.lit(True).alias("__keep"))
    )
    return keyed.join(F.broadcast(sel), id_col, "left").select(
        id_col, "n_feats", "log_w", "key", F.coalesce("__keep", F.lit(False)).alias("keep")
    )
