"""Deterministic data-mixing operators (operators/sampling.py): hash splits,
exact stratified sampling, sequence packing — each cross-checked against the
duckdb oracle twin and against pure-pandas recomputation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import hash_split, pack_sequences, stratified_sample
from duckdb_vss_spark.functions import text as T
from duckdb_vss_spark.oracle import sql_id_hash, sql_token_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# -- hash_split ------------------------------------------------------------

def test_hash_split_matches_oracle(docs, ddb):
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    h = sql_id_hash("doc_id", "split")
    want = dict(
        ddb.execute(
            f"""SELECT doc_id, CASE WHEN {h} % 1000000 < 800000 THEN 'train'
                                    WHEN {h} % 1000000 < 900000 THEN 'val'
                                    ELSE 'test' END FROM documents"""
        ).fetchall()
    )
    assert got == want


def test_hash_split_proportions_and_stability(docs):
    n = docs.count()
    counts = {r["split"]: r["n"] for r in hash_split(docs, "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / n - 0.8) < 0.06
    # subset invariance: a row's split never depends on which rows are present
    sub = hash_split(docs.filter(F.col("doc_id") % 7 == 0), "doc_id")
    full = hash_split(docs, "doc_id").filter(F.col("doc_id") % 7 == 0)
    assert {(r["doc_id"], r["split"]) for r in sub.select("doc_id", "split").collect()} == {
        (r["doc_id"], r["split"]) for r in full.select("doc_id", "split").collect()
    }


def test_hash_split_validation(docs):
    with pytest.raises(ValueError, match="must align"):
        hash_split(docs, "doc_id", weights=(1, 1), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="positive"):
        hash_split(docs, "doc_id", weights=(0, 0), labels=("a", "b"))
    # integer weights normalize
    labs = {r["split"] for r in hash_split(docs, "doc_id", weights=(8, 1, 1)).select("split").distinct().collect()}
    assert labs == {"train", "val", "test"}


# -- stratified_sample -----------------------------------------------------

def test_stratified_sample_exact_counts(docs):
    frac = 0.1
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "lang", frac, "doc_id").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {lang: math.ceil(frac * n) for lang, n in base.items()}


def test_stratified_sample_dict_fractions(docs):
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    keep, drop = langs[0], langs[1:]
    out = stratified_sample(docs, "lang", {keep: 0.5}, "doc_id")
    got_langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got_langs == {keep}  # strata absent from the dict are dropped
    n_keep = docs.filter(F.col("lang") == keep).count()
    assert out.count() == math.ceil(0.5 * n_keep)


def test_stratified_sample_matches_oracle(docs, ddb):
    got = sorted(r["doc_id"] for r in stratified_sample(docs, "lang", 0.2, "doc_id").select("doc_id").collect())
    h = sql_id_hash("doc_id", "strata")
    want = sorted(
        r[0]
        for r in ddb.execute(
            f"""SELECT doc_id FROM (
                    SELECT doc_id,
                           row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rnk,
                           count(*) OVER (PARTITION BY lang) AS cnt
                    FROM documents)
                WHERE rnk <= ceil(0.2 * cnt)"""
        ).fetchall()
    )
    assert got == want


def test_stratified_sample_validation(docs):
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", 1.5, "doc_id")
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": -0.1}, "doc_id")


# -- pack_sequences --------------------------------------------------------

def test_pack_sequences_matches_pandas(docs):
    budget = 512
    out = (
        pack_sequences(
            docs.withColumn("nt", T.token_count("text")), "nt", budget, "doc_id", shard_col="lang"
        )
        .select("lang", "doc_id", "nt", "pack_id")
        .toPandas()
    )
    for lang, grp in out.groupby("lang"):
        g = grp.sort_values(["doc_id"]).copy()
        # recompute in pandas over the same deterministic order
        order = sorted(
            g.itertuples(),
            key=lambda t: (_py_hash64("pack" + str(t.doc_id)), t.doc_id),
        )
        cum = 0
        for t in order:
            expect = cum // budget
            assert t.pack_id == expect, (lang, t.doc_id, t.pack_id, expect)
            cum += t.nt
        # invariant: cumulative tokens before any non-first pack >= pack_id * budget
        assert g["pack_id"].min() == 0


def test_pack_sequences_matches_oracle(docs, ddb):
    budget = 512
    got = sorted(
        (r["lang"], r["pack_id"], r["n_docs"], r["sum_tokens"])
        for r in pack_sequences(
            docs.withColumn("nt", T.token_count("text")), "nt", budget, "doc_id", shard_col="lang"
        )
        .groupBy("lang", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("sum_tokens"))
        .collect()
    )
    h = sql_id_hash("doc_id", "pack")
    nt = sql_token_count("text")
    want = sorted(
        tuple(r)
        for r in ddb.execute(
            f"""SELECT lang, pack_id, count(*) AS n_docs, sum(nt)::BIGINT AS sum_tokens
                FROM (
                    SELECT lang, nt,
                           (sum(nt) OVER (PARTITION BY lang ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) - nt) // {budget} AS pack_id
                    FROM (SELECT lang, doc_id, {h} AS h, {nt} AS nt FROM documents))
                GROUP BY lang, pack_id"""
        ).fetchall()
    )
    assert got == want


def test_pack_sequences_validation(docs):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, "n_chars", 0, "doc_id")


def _py_hash64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# -- plan shape: the scale contract ---------------------------------------

def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sampling_plan_shapes(docs):
    """hash_split is a pure projection (zero shuffles); stratified_sample and
    pack_sequences each cost exactly one Exchange (their window key); nothing
    here drops to Python — all md5/conv/window expressions stay JVM-side."""
    split_plan = _physical(hash_split(docs, "doc_id"))
    assert "Exchange" not in split_plan
    strat_plan = _physical(stratified_sample(docs, "lang", 0.2, "doc_id"))
    # one SHUFFLE exchange (the (stratum, bucket) window key); the round-8
    # bucketed cut adds only a BroadcastExchange of the bounded decisions
    assert strat_plan.count("Exchange hashpartitioning") == 1
    pack_plan = _physical(
        pack_sequences(docs.withColumn("nt", T.token_count("text")), "nt", 512, "doc_id", shard_col="lang")
    )
    # one SHUFFLE exchange (the (shard, bucket) window key) + the bounded
    # offsets BroadcastExchange (round-8 de-skewed packing)
    assert pack_plan.count("Exchange hashpartitioning") == 1
    for plan in (split_plan, strat_plan, pack_plan):
        assert "Python" not in plan and "BatchEval" not in plan


# -- chunk_documents -------------------------------------------------------

def test_chunk_documents_hand_computed(spark):
    from duckdb_vss_spark import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], "doc_id: long, text: string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=1).collect()
    }
    # stride 3; doc 1 has 7 tokens -> ceil((7-1)/3) = 2 chunks: [0:4), [3:7)
    assert got == {
        (1, 0): (4, "a b c d"),
        (1, 1): (4, "d e f g"),
        (2, 0): (2, "x y"),  # shorter than one window -> single short chunk
    }


def test_chunk_documents_exact_multiple_boundary(spark):
    from duckdb_vss_spark import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id: long, text: string")
    rows = chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=2).collect()
    # stride 2, n=6: ceil((6-2)/2) = 2 chunks, [0:4) and [2:6) — no empty tail
    assert sorted(r["chunk_text"] for r in rows) == ["a b c d", "c d e f"]


def test_chunk_documents_matches_duckdb(docs, ddb):
    from duckdb_vss_spark import chunk_documents
    from duckdb_vss_spark.oracle import sql_chunk_documents

    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=16).collect()
    )
    want = sorted(
        tuple(r)
        for r in ddb.execute(sql_chunk_documents("documents", "text", "doc_id", 64, 16)).fetchall()
    )
    assert got == want


def test_chunk_documents_map_only(docs):
    from duckdb_vss_spark import chunk_documents

    plan = (
        chunk_documents(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 0 and "Python" not in plan


def test_chunk_documents_validation(spark):
    from duckdb_vss_spark import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=1)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=8, overlap=8)


def test_chunk_documents_empty_docs_match_duckdb(spark, ddb):
    """Empty/whitespace docs: the shared tokenizer yields [''] for both
    engines, so each such doc gets exactly one 1-token empty chunk —
    pinned against BOTH engines because the parquet fixtures contain no
    empty docs (the sf0.001 differential can't catch drift here)."""
    import pandas as pd

    from duckdb_vss_spark import chunk_documents
    from duckdb_vss_spark.oracle import sql_chunk_documents

    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "a")], "doc_id: long, text: string")
    got = sorted(tuple(r) for r in chunk_documents(df, "text", "doc_id", 4, 1).collect())
    assert got == [(1, 0, 1, ""), (2, 0, 1, ""), (3, 0, 1, "a")]

    ddb.register("chunk_edge_docs", pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "   ", "a"]}))
    want = sorted(
        tuple(r)
        for r in ddb.execute(sql_chunk_documents("chunk_edge_docs", "text", "doc_id", 4, 1)).fetchall()
    )
    ddb.unregister("chunk_edge_docs")
    assert got == want


# -- temperature mixture sampling -------------------------------------------


def test_temperature_rates_policy(spark):
    """alpha=1 keeps everything; alpha=0 equalizes per-stratum targets;
    alpha=0.5 upweights low-resource strata relative to their share."""
    from duckdb_vss_spark import temperature_rates

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    r1 = temperature_rates(df, "src", alpha=1.0)
    assert r1 == {"big": 1.0, "small": 1.0}
    r0 = temperature_rates(df, "src", alpha=0.0)
    # T=100 over 2 strata -> 50 each: big capped at 50/90, small at 1.0
    assert r0["small"] == 1.0 and abs(r0["big"] - 50.0 / 90.0) < 1e-12
    rh = temperature_rates(df, "src", alpha=0.5)
    assert rh["small"] == 1.0 and rh["small"] > rh["big"] > r0["big"]


def test_temperature_rates_weighted_and_target(spark):
    from duckdb_vss_spark import temperature_rates

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "b", 80)], "id long, src string, toks long"
    )
    # weight by tokens, halve the corpus: T=50, p_a ∝ sqrt(20), p_b ∝ sqrt(80)
    r = temperature_rates(df, "src", alpha=0.5, weight_col="toks", target_total=50)
    import math

    z = math.sqrt(20.0) + math.sqrt(80.0)
    assert abs(r["a"] - min(1.0, 50 * math.sqrt(20.0) / z / 20.0)) < 1e-15
    assert abs(r["b"] - min(1.0, 50 * math.sqrt(80.0) / z / 80.0)) < 1e-15


def test_temperature_sample_matches_duckdb(spark, ddb):
    from duckdb_vss_spark import temperature_sample
    from duckdb_vss_spark.oracle import sql_temperature_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for alpha in (0.5, 0.0):
        got = {
            (r["doc_id"], r["lang"])
            for r in temperature_sample(df, "lang", "doc_id", alpha=alpha).select("doc_id", "lang").collect()
        }
        want = set(
            map(tuple, ddb.execute(sql_temperature_sample("documents", "lang", "doc_id", alpha=alpha)).fetchall())
        )
        assert got == want, f"alpha={alpha}"


# -- DSIR importance resampling -------------------------------------------


def test_dsir_matches_oracle(docs, ddb):
    from duckdb_vss_spark import dsir_resample
    from duckdb_vss_spark.oracle import sql_dsir

    tgt = docs.filter("doc_id % 7 = 0")
    out = dsir_resample(docs, "text", "doc_id", tgt, k=50)
    ours = {
        r["doc_id"]: (r["n_feats"], round(r["log_w"], 6), round(r["key"], 6), r["keep"])
        for r in out.collect()
    }
    theirs = {
        r[0]: (r[1], round(r[2], 6), round(r[3], 6), r[4])
        for r in ddb.execute(
            sql_dsir("documents", "text", "doc_id", "doc_id % 7 = 0", 50)
        ).fetchall()
    }
    assert ours == theirs
    assert sum(1 for v in ours.values() if v[3]) == 50


def test_dsir_target_docs_score_higher(docs, spark):
    """Docs in (or like) the target slice must receive higher weights on
    average than the rest — the operator's entire point."""
    from duckdb_vss_spark import dsir_weights

    tgt = docs.filter("doc_id % 7 = 0")
    w = dsir_weights(docs, "text", "doc_id", tgt)
    rows = w.withColumn("is_tgt", (F.col("doc_id") % 7 == 0).cast("int")).groupBy(
        "is_tgt"
    ).agg(F.avg(F.col("log_w") / F.col("n_feats")).alias("m")).collect()
    m = {r["is_tgt"]: r["m"] for r in rows}
    assert m[1] > m[0]


def test_dsir_partitioning_invariant(docs, spark):
    from duckdb_vss_spark import dsir_resample

    tgt = docs.filter("doc_id % 7 = 0")
    a = sorted(
        (r["doc_id"], r["keep"])
        for r in dsir_resample(docs.repartition(13), "text", "doc_id", tgt, k=20).collect()
    )
    b = sorted(
        (r["doc_id"], r["keep"])
        for r in dsir_resample(docs.coalesce(1), "text", "doc_id", tgt, k=20).collect()
    )
    assert a == b


def test_dsir_k_exceeds_corpus(docs, spark):
    from duckdb_vss_spark import dsir_resample

    tgt = docs.filter("doc_id % 7 = 0")
    out = dsir_resample(docs.limit(10), "text", "doc_id", tgt, k=999)
    rows = out.collect()
    assert len(rows) == 10 and all(r["keep"] for r in rows)


def test_dsir_dense_kernel_equals_relational(docs, spark, monkeypatch):
    """Forcing the relational fold (as if buckets exceeded DSIR_DENSE_MAX)
    must give bitwise-identical weights to the dense broadcast kernel."""
    from duckdb_vss_spark import dsir_weights
    from duckdb_vss_spark.operators import sampling as S

    tgt = docs.filter("doc_id % 7 = 0")
    dense = sorted(map(tuple, dsir_weights(docs, "text", "doc_id", tgt).collect()))
    monkeypatch.setattr(S, "DSIR_DENSE_MAX", 0)
    rel = sorted(map(tuple, dsir_weights(docs, "text", "doc_id", tgt).collect()))
    assert dense == rel


def test_shuffle_shard_deterministic_and_balanced(spark):
    from duckdb_vss_spark.operators.sampling import shuffle_shard

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = shuffle_shard(docs.select("doc_id"), "doc_id", 8, pos_col="pos")
    b = shuffle_shard(
        docs.select("doc_id").repartition(3), "doc_id", 8, pos_col="pos"
    )
    # assignment + order independent of input partitioning
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    sizes = [r["count"] for r in a.groupBy("shard").count().collect()]
    n = docs.count()
    assert len(sizes) == 8 and max(sizes) < 2 * n / 8  # hash balance, not skew
    # positions are 1..size within each shard
    import collections

    per = collections.defaultdict(list)
    for r in a.collect():
        per[r["shard"]].append(r["pos"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())


def test_write_shuffled_shards_order(spark, tmp_path):
    from duckdb_vss_spark.operators.sampling import shuffle_shard, write_shuffled_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, "doc_id", n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # on-disk row order within a shard == the declared deterministic order
    ref = shuffle_shard(docs, "doc_id", 4, pos_col="pos")
    want2 = [
        r["doc_id"]
        for r in ref.filter("shard = 2").orderBy("pos").collect()
    ]
    import pyarrow.parquet as pq
    import glob

    files = sorted(glob.glob(f"{out}/shard=2/*.parquet"))
    got2 = [x for f in files for x in pq.read_table(f).column("doc_id").to_pylist()]
    assert got2 == want2


def test_heavy_hitters_exact(spark, ddb):
    from duckdb_vss_spark.operators.profile import heavy_hitters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(6)
    want = [
        (a, b)
        for a, b in ddb.execute(
            "SELECT t, count(*) AS c FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t "
            "FROM documents) GROUP BY t ORDER BY c DESC, t LIMIT 15"
        ).fetchall()
    ]
    for method in ("exact", "mg"):
        got = [
            (r["term"], r["count"])
            for r in heavy_hitters(docs, "text", k=15, method=method).collect()
        ]
        assert got == want, method


def test_heavy_hitters_warns_when_bound_unmet(spark):
    import warnings

    from duckdb_vss_spark.operators.profile import heavy_hitters

    # x,y in every doc (count 100) + a unique filler per doc: with
    # counters=2, N=300 and kth count 100 == N/(counters+1) -> the strict
    # bound fails and the warning must fire, while x,y still survive MG
    docs = spark.createDataFrame(
        [(i, f"x y u{i}") for i in range(100)], "doc_id: long, text: string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = heavy_hitters(docs, "text", k=2, counters=2, method="mg").collect()
    assert any("exactness bound not met" in str(x.message) for x in w)
    assert sorted((r["term"], r["count"]) for r in out) == [("x", 100), ("y", 100)]


def test_heavy_hitters_ngrams(spark, ddb):
    from duckdb_vss_spark.operators.profile import heavy_hitters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [(r["term"], r["count"]) for r in heavy_hitters(docs, "text", k=10, n=2).collect()]
    want = ddb.execute("""
        SELECT g, count(*) AS c FROM (
          SELECT unnest(list_transform(range(1, greatest(1, len(t) - 1) + 1),
                        i -> array_to_string(t[i:i+1], ' '))) AS g
          FROM (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents))
        GROUP BY g ORDER BY c DESC, g LIMIT 10
    """).fetchall()
    assert got == [(a, b) for a, b in want]


def test_heavy_hitters_warns_on_short_result(spark):
    """Fewer than k returned rows is the clearest symptom of an incomplete
    Misra-Gries candidate set — the check must warn there too, not only
    when exactly k rows come back (ADVICE r5)."""
    import warnings

    from duckdb_vss_spark.operators.profile import heavy_hitters

    # 20 uniform singleton terms, counters=2, one partition: MG decrements
    # leave <=2 candidates, so the recount returns far fewer than k=10
    docs = spark.createDataFrame(
        [(i, f"t{i:02d}") for i in range(20)], "doc_id: long, text: string"
    ).repartition(1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = heavy_hitters(docs, "text", k=10, counters=2, method="mg").collect()
    assert len(out) < 10
    assert any("candidate terms survived" in str(x.message) for x in w)


def test_heavy_hitters_short_but_exact_no_warning(spark):
    """A corpus with fewer than k distinct terms and counters >= distinct
    CANNOT have dropped a candidate (no MG decrement ever fires) — the
    short result is exact and must NOT warn (review follow-up: the
    short-result warning is gated on distinct > counters)."""
    import warnings

    from duckdb_vss_spark.operators.profile import heavy_hitters

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)], "doc_id: long, text: string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = heavy_hitters(docs, "text", k=10, counters=100, method="mg").collect()
    assert sorted(r["term"] for r in out) == ["alpha", "beta", "gamma"]
    assert all(r["count"] == 50 for r in out)
    assert not [x for x in w if "exactness" in str(x.message)]


def test_stratified_sample_bucketed_equals_window_cut(spark):
    """The round-8 bucketed exact cut (boundary-bucket window only) must be
    row-identical to the naive per-stratum window form it replaced, on a
    skewed fixture with a dominant stratum, dict rates, an absent-from-dict
    stratum, and NULL strata."""
    from duckdb_vss_spark.operators.sampling import _hash_of, stratified_sample

    rows = []
    for i in range(3000):
        lang = "en" if i % 10 < 7 else ("de" if i % 10 < 9 else None)
        rows.append((i, lang))
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def naive(fraction):
        if isinstance(fraction, dict):
            frac = None
            for val, r in fraction.items():
                frac = (F.when if frac is None else frac.when)(F.col("lang") == val, F.lit(float(r)))
            frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
        else:
            frac = F.lit(float(fraction))
        from pyspark.sql import Window

        h = _hash_of("doc_id", "strata")
        w = Window.partitionBy("lang")
        rnk = F.row_number().over(w.orderBy(h.asc(), F.col("doc_id").asc()))
        n = F.count(F.lit(1)).over(w)
        return (
            df.withColumn("__rnk", rnk)
            .withColumn("__keep", F.ceil(frac * n))
            .filter(F.col("__rnk") <= F.col("__keep"))
            .drop("__rnk", "__keep")
        )

    for fraction in (0.31, 1.0, 0.0, {"en": 0.5, "de": 0.9}, {"en": 0.001}):
        got = sorted(r["doc_id"] for r in stratified_sample(df, "lang", fraction, "doc_id").collect())
        want = sorted(r["doc_id"] for r in naive(fraction).collect())
        assert got == want, (fraction, len(got), len(want))
    # uniform fraction keeps NULL-stratum rows at the same rate (own stratum)
    kept = stratified_sample(df, "lang", 0.5, "doc_id").filter("lang IS NULL").count()
    assert kept == 150  # ceil(0.5 * 300)


def test_stratified_sample_no_full_stratum_window(spark):
    """Plan shape: the cut's row_number window partitions by
    (stratum, bucket), never by the stratum alone — the 100-TB skew
    guarantee. (Bucket width degenerates only when strata outnumber
    STRATA_CUT_TARGET.)"""
    from duckdb_vss_spark.operators.sampling import stratified_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(df, "lang", 0.5, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    wins = [l for l in plan.splitlines() if "Window" in l and "row_number" in l]
    assert wins, plan
    # the partition spec must include the bucket column alongside the stratum
    assert all("__b" in l for l in wins), wins


def test_pack_sequences_bucketed_equals_shard_window(spark):
    """The round-8 bucketed prefix-sum packing must be row-identical to
    the naive per-shard running-sum window it replaced — skewed shards,
    no-shard mode, NULL shard values, and NULL token counts."""
    from pyspark.sql import Window

    from duckdb_vss_spark.operators.sampling import _hash_of, pack_sequences

    rows = []
    for i in range(2500):
        shard = "en" if i % 10 < 8 else ("de" if i % 10 < 9 else None)
        nt = None if i % 97 == 0 else (i * 13) % 300 + 1
        rows.append((i, shard, nt))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok int")

    def naive(shard_col):
        shard = F.col(shard_col) if shard_col else F.lit(0)
        h = _hash_of("doc_id", "pack")
        w = (
            Window.partitionBy(shard)
            .orderBy(h.asc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        before = F.sum(F.col("n_tok")).over(w) - F.col("n_tok")
        return df.withColumn("pack_id", F.floor(before / F.lit(512)).cast("long"))

    for shard_col in ("lang", None):
        got = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, "n_tok", 512, "doc_id", shard_col=shard_col).collect()}
        want = {r["doc_id"]: r["pack_id"] for r in naive(shard_col).collect()}
        assert got == want, shard_col


def test_rank_split_equals_percent_rank_window(spark):
    """rank_split (round 8: value-range-bucketed exact percent_rank split,
    the de-skewed CCNet tercile) must be row-identical to the naive
    per-stratum percent_rank window on a hostile fixture: dominant
    stratum, heavy order-value ties, a singleton stratum, a
    constant-value stratum, NULL strata, NULL and NaN order values."""
    from pyspark.sql import Window

    from duckdb_vss_spark.operators.sampling import rank_split

    rows = []
    for i in range(4000):
        if i % 20 == 19:
            lang = None
        elif i % 20 >= 17:
            lang = "de"
        else:
            lang = "en"
        # ~5 rows per distinct value -> rank ties inside every stratum
        ppl = float((i * 7919) % 800)
        if i % 131 == 0:
            ppl = None
        elif i % 137 == 0:
            ppl = float("nan")
        rows.append((i, lang, ppl))
    rows.append((4000, "solo", 42.0))  # n == 1 stratum
    for i in range(4001, 4031):
        rows.append((i, "const", 7.0))  # constant-value stratum
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")

    for edges, labels in (
        ((1.0 / 3.0, 2.0 / 3.0), ("head", "middle", "tail")),
        ((0.1,), ("top", "rest")),
        ((0.0, 0.5, 0.999), ("a", "b", "c", "d")),
    ):
        pr = F.percent_rank().over(
            Window.partitionBy("lang").orderBy(F.col("ppl").asc(), F.col("doc_id").asc())
        )
        lab = F.when(pr <= edges[0], labels[0])
        for j in range(1, len(edges)):
            lab = lab.when(pr <= edges[j], labels[j])
        naive = df.withColumn("rank_bucket", lab.otherwise(labels[-1]))
        got = {r["doc_id"]: r["rank_bucket"] for r in rank_split(df, "lang", "ppl", "doc_id", edges, labels).collect()}
        want = {r["doc_id"]: r["rank_bucket"] for r in naive.collect()}
        assert got == want, (edges, sum(1 for k in got if got[k] != want[k]))


def test_rank_split_no_full_stratum_window(spark):
    """Plan shape: the split's rank window partitions by
    (stratum, bucket), never the stratum alone — a dominant language
    ranks across its value buckets instead of one reducer."""
    from duckdb_vss_spark.operators.sampling import rank_split

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        (F.col("id") % 97).cast("double").alias("ppl"),
    )
    out = rank_split(df, "lang", "ppl", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    wins = [l for l in plan.splitlines() if "Window" in l and "rank(" in l]
    assert wins, plan
    assert all("__b" in l for l in wins), wins


def test_rank_split_validation(spark):
    from duckdb_vss_spark.operators.sampling import rank_split

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"),
        F.col("id").cast("double").alias("ppl"), F.lit("x").alias("txt"),
    )
    with pytest.raises(ValueError, match="labels"):
        rank_split(df, "lang", "ppl", "doc_id", edges=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        rank_split(df, "lang", "ppl", "doc_id", edges=(0.7, 0.3), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="numeric"):
        rank_split(df, "lang", "txt", "doc_id")
    # empty input returns an empty frame with the out column present
    empty = rank_split(df.filter(F.lit(False)), "lang", "ppl", "doc_id")
    assert empty.count() == 0 and "rank_bucket" in empty.columns


def test_internal_persist_and_release(spark):
    """The exact-cut operators persist uncached input internally (bounded
    LRU ring) so their driver collects and final pass read one
    materialization; release_caches() drops them on demand; and
    internal_persist=False opts out for inputs the caller already pinned
    (the curate_corpus path)."""
    from duckdb_vss_spark import release_caches
    from duckdb_vss_spark.broadcasts import live_persist_count
    from duckdb_vss_spark.operators.sampling import pack_sequences, stratified_sample

    release_caches(spark)
    sc = spark.sparkContext
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 50 + 1).alias("n_tok"),
    )
    out = stratified_sample(df, "lang", 0.5, "doc_id")
    assert out.count() > 0
    assert live_persist_count(sc) == 1
    # same object is now cached -> second operator reuses, no new ring entry
    packed = pack_sequences(df, "n_tok", 128, "doc_id", shard_col="lang")
    assert packed.count() == 500
    assert live_persist_count(sc) == 1
    # a distinct uncached frame gets its own entry
    df2 = df.select("doc_id", "lang", (F.col("n_tok") + 1).alias("n_tok"))
    pack_sequences(df2, "n_tok", 128, "doc_id", shard_col="lang").count()
    assert live_persist_count(sc) == 2
    # opt-out path adds nothing to the ring
    df3 = df.select("doc_id", "lang")
    stratified_sample(df3, "lang", 0.5, "doc_id", internal_persist=False).count()
    assert live_persist_count(sc) == 2
    assert release_caches(spark) == 2
    assert live_persist_count(sc) == 0


def test_nondeterministic_input_exact_cut(spark):
    """The round-9 determinism hardening end-to-end: with a rand()-derived
    stratum column (nondeterministic across evaluations), the internal
    persist pins one materialization, so the exact per-stratum cut still
    holds — collected counts, boundary ranks, and the final pass all read
    the same rows."""
    import math

    from duckdb_vss_spark import release_caches
    from duckdb_vss_spark.operators.sampling import stratified_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.rand(seed=7) < 0.8, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, "lang", 0.25, "doc_id")
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    # the input is persisted by the operator, so recounting it now reads the
    # SAME materialization the cut was decided on: the exact-count contract
    # ceil(0.25 * n_stratum) must hold stratum-for-stratum
    base = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert got and all(got[s] == math.ceil(0.25 * base[s]) for s in got), (got, base)
    release_caches(spark)
