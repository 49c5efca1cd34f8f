"""BPE tokenizer: training determinism, application, round-trip exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vss_spark.functions.bpe import (
    BPETokenizer,
    _train_merges,
    detokenize_expr,
    train_bpe,
)


def test_classic_sennrich_example():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = _train_merges(wf, 4)
    # highest-frequency pair first: ('e','s') has freq 9
    assert m == [("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")]
    tok = BPETokenizer(m)
    assert tok._encode_word("newest", {}) == ["n", "ew", "est</w>"]
    assert tok._encode_word("low", {}) == ["lo", "w</w>"]


def test_train_deterministic_across_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = train_bpe(docs, "text", num_merges=100)
    b = train_bpe(docs.repartition(7), "text", num_merges=100)
    assert a.merges == b.merges
    # the fixture vocabulary is tiny; merges exhaust before the budget
    assert 50 <= len(a.merges) <= 100


def test_roundtrip_exact_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = train_bpe(docs, "text", num_merges=150)
    t = tok.tokenize(docs, "text")
    out = t.select(
        "doc_id",
        (detokenize_expr("bpe_tokens") == F.regexp_replace(F.trim("text"), r"\s+", " ")).alias("ok"),
        F.size("bpe_tokens").alias("n_bpe"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
        F.length("text").alias("n_chars"),
    ).collect()
    assert all(r["ok"] for r in out)
    # every word is >= 1 token; tokens never exceed chars
    assert all(r["n_words"] <= r["n_bpe"] <= r["n_chars"] + r["n_words"] for r in out)
    # merges actually compress vs character splitting
    assert sum(r["n_bpe"] for r in out) < 0.5 * sum(r["n_chars"] for r in out)


def test_unseen_words_fall_back_to_subwords(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = train_bpe(docs, "text", num_merges=80)
    df = spark.createDataFrame(
        [(1, "zzqxj unheardword"), (2, None)], "id: long, text: string"
    )
    rows = {r["id"]: r for r in tok.tokenize(df, "text").collect()}
    assert rows[1]["bpe_tokens"] is not None and len(rows[1]["bpe_tokens"]) >= 2
    assert rows[2]["bpe_tokens"] is None
    back = tok.tokenize(df.filter("text IS NOT NULL"), "text").select(
        detokenize_expr("bpe_tokens").alias("d")
    ).first()["d"]
    assert back == "zzqxj unheardword"


def test_json_persistence_and_count(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = train_bpe(docs, "text", num_merges=60)
    tok2 = BPETokenizer.from_json(tok.to_json())
    assert tok2.merges == tok.merges and tok2.lowercase == tok.lowercase
    n1 = tok.add_token_count(docs.limit(20), "text").agg(F.sum("n_bpe")).first()[0]
    n2 = tok2.add_token_count(docs.limit(20), "text").agg(F.sum("n_bpe")).first()[0]
    assert n1 == n2 > 0
