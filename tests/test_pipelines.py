"""End-to-end curation recipes (pipelines.py): each composes tested
operators into one lazy plan — these tests pin the wiring (flags present,
row preservation, survivor invariants), not the operators themselves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ccnet_curate(docs):
    from duckdb_vss_spark.pipelines import ccnet_curate

    out = ccnet_curate(docs)
    assert out.count() == docs.count()  # never drops rows
    buckets = {r["ppl_bucket"] for r in out.select("ppl_bucket").distinct().collect()}
    assert buckets <= {"head", "middle", "tail"} and "head" in buckets
    # terciles are per-language: within each lang, head <= middle <= tail ppl
    stats = (
        out.groupBy("lang", "ppl_bucket").agg(F.max("ppl").alias("mx"), F.min("ppl").alias("mn"))
        .collect()
    )
    by = {}
    for r in stats:
        by.setdefault(r["lang"], {})[r["ppl_bucket"]] = (r["mn"], r["mx"])
    for lang, b in by.items():
        if "head" in b and "tail" in b:
            assert b["head"][1] <= b["tail"][0] or abs(b["head"][1] - b["tail"][0]) < 1e-9


def test_c4_clean(docs, spark):
    from duckdb_vss_spark.pipelines import c4_clean

    out = c4_clean(docs)
    # fixture docs have no terminal punctuation: the C4 line filter drops
    # every line, rows survive with c4_keep=false — flags, never row drops
    assert out.count() == docs.count()
    assert out.filter("c4_keep").count() == 0
    # crafted corpus exercises the keep path: punctuated English lines
    # pass, the repeated doc pair gets a high dup_window_frac
    span = "this exact long sentence is repeated verbatim across documents " * 4
    crafted = spark.createDataFrame(
        [
            (1, "the quick brown fox jumped over the lazy dog today.\nthe weather was that nice."),
            (2, span + "end."),
            (3, span + "fin."),
            (4, "lorem {curly} line\nok but no punctuation line"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_clean(crafted, span_tokens=10).collect()}
    assert got[1]["c4_keep"] and got[1]["lang_ok"]
    assert got[2]["dup_window_frac"] > 0.5 and not got[2]["c4_keep"]
    assert got[4]["n_kept_lines"] == 0 and not got[4]["c4_keep"]


def test_refinedweb_curate(docs):
    from duckdb_vss_spark.pipelines import refinedweb_curate

    out = refinedweb_curate(docs, jaccard=0.5)
    assert out.count() == docs.count()
    # exactly one canonical survivor per cluster
    per = out.groupBy("cluster_id").agg(F.sum(F.col("fuzzy_keep").cast("int")).alias("n"))
    assert per.filter("n <> 1").count() == 0


def test_semantic_curate(docs, emb):
    from duckdb_vss_spark.pipelines import semantic_curate

    tgt = docs.filter("doc_id % 7 = 0")
    out = semantic_curate(docs, emb, tgt, k_clusters=4, sem_eps=0.4, select_k=50)
    assert out.count() == docs.count()
    assert out.filter("dsir_keep").count() == 50
    cols = set(out.columns)
    assert {"sem_keep", "sem_cluster", "dsir_keep", "log_w", "clf_score"} <= cols
