"""Quality operators: Gopher-style repetition stats and benchmark
decontamination — hand-computed oracles on crafted docs, plus plan-shape
assertions (2 Exchanges / broadcast probe, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import decontaminate, repetition_stats


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: "a b a b c" — dup tokens a,b; top 2-gram "a b" (x2, len 3)
        (1, "a b a b c"),
        # doc 2: two identical lines + one unique
        (2, "x y\nx y\nz"),
        # doc 3: single token
        (3, "solo"),
        # doc 4: empty text
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_repetition_stats_hand_computed(docs):
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, "text", "doc_id").collect()}

    d1 = out[1]  # tokens a,b,a,b,c; n_chars 9
    assert d1["total_tokens"] == 5
    assert d1["dup_token_frac"] == pytest.approx((5 - 3) / 5)
    assert d1["total_lines"] == 1 and d1["dup_line_frac"] == 0.0
    # 2-grams: "a b","b a","a b","b c" -> top "a b": 2 occ * 3 chars / 9
    assert d1["top2gram_char_frac"] == pytest.approx(2 * 3 / 9)
    # 3-grams: "a b a","b a b","a b c" all unique -> dup 0, top 1*5/9
    assert d1["top3gram_char_frac"] == pytest.approx(5 / 9)
    assert d1["dup3gram_char_frac"] == 0.0

    d2 = out[2]  # lines: "x y","x y","z" (n_chars 9: 3+1+3+1+1)
    assert d2["total_lines"] == 3
    assert d2["dup_line_frac"] == pytest.approx(2 / 3)
    # dup line chars 2*3 over total line chars 3+3+1
    assert d2["dup_line_char_frac"] == pytest.approx(6 / 7)
    # tokens: x,y,x,y,z (newline is whitespace)
    assert d2["dup_token_frac"] == pytest.approx(2 / 5)

    d3 = out[3]  # shorter than n: single partial gram, nothing duplicated
    assert d3["total_tokens"] == 1
    assert d3["dup_token_frac"] == 0.0
    assert d3["top2gram_char_frac"] == pytest.approx(1.0)  # "solo" covers itself

    d4 = out[4]  # empty text: split yields [""] -> zero-length items, 0 fracs
    assert d4["n_chars"] == 0
    assert d4["dup_token_frac"] == 0.0
    assert d4["top2gram_char_frac"] == 0.0
    assert d4["dup3gram_char_frac"] == 0.0


def test_repetition_stats_plan_is_map_only(spark, docs):
    """Every signal is document-local, so the operator is map-only: the
    item arrays feed one Arrow-batched kernel, and no Exchange appears
    beyond the narrow-input fan-out (none when the input is already at
    cluster width)."""
    par = spark.sparkContext.defaultParallelism
    plan = _physical(repetition_stats(docs.repartition(par), "text", "doc_id"))
    assert plan.count("Exchange") == 1, plan  # only the test's repartition
    assert "HashAggregate" not in plan


def test_decontaminate_marks_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares "quick brown fox"
            (2, "entirely different words here"),
            (3, "quick brown fox again and again"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox ran")], "doc_id: long, text: string"
    )
    out = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in decontaminate(train, "text", "doc_id", bench, "text", 3).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)

    clean = decontaminate(train, "text", "doc_id", bench, "text", 3, mark_only=False)
    assert [r["doc_id"] for r in clean.select("doc_id").collect()] == [2]
    assert clean.columns == train.columns  # original schema restored


def test_decontaminate_plan_broadcasts_bench(spark):
    train = spark.range(10).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("w"), F.col("id").cast("string")).alias("text")
    )
    bench = spark.createDataFrame([(0, "w1 w2 w3")], "doc_id: long, text: string")
    plan = _physical(decontaminate(train, "text", "doc_id", bench, "text", 2))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_decontaminate_join_path_matches_broadcast(spark):
    """broadcast=False (the too-big-to-broadcast benchmark regime) must
    produce identical flags via the shuffle hash join, with no forced
    broadcast hint in the plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter("doc_id % 11 = 0")
    key = lambda rows: sorted((r["doc_id"], r["n_hit_grams"], r["contaminated"]) for r in rows)
    a = key(decontaminate(docs, "text", "doc_id", bench, "text", 3).collect())
    b = key(decontaminate(docs, "text", "doc_id", bench, "text", 3, broadcast=False).collect())
    assert a == b
    # the hint must be absent from the logical plan (AQE may still CHOOSE
    # broadcast at runtime; forcing is what the flag removes)
    logical = (
        decontaminate(docs, "text", "doc_id", bench, "text", 3, broadcast=False)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" not in logical


def test_repetition_stats_matches_duckdb(spark, ddb):
    """Cross-engine spot check at sf0.001 (the full q48 oracle runs in the
    driver harness; this is the fast local twin on three columns)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: (r["total_tokens"], r["dup_token_frac"], r["top2gram_char_frac"])
        for r in repetition_stats(docs, "text", "doc_id").collect()
    }
    toks = "string_split_regex(trim(text), '\\s+')"
    g2 = (
        f"list_transform(range(1, greatest(1, len({toks}) - 1) + 1), "
        f"i -> array_to_string({toks}[i:i+1], ' '))"
    )
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in ddb.execute(
            f"""
            WITH t AS (SELECT doc_id, length(text) AS nc, unnest({toks}) AS item FROM documents),
            tc AS (SELECT doc_id, count(*)::BIGINT AS total, count(DISTINCT item)::BIGINT AS dis
                   FROM t GROUP BY doc_id),
            g AS (SELECT doc_id, nc, item, count(*)::BIGINT AS cnt FROM
                   (SELECT doc_id, length(text) AS nc, unnest({g2}) AS item FROM documents)
                  GROUP BY doc_id, nc, item),
            gt AS (SELECT doc_id, (max(cnt*length(item))::DOUBLE / nc)::FLOAT AS topf
                   FROM g GROUP BY doc_id, nc)
            SELECT tc.doc_id, total,
                   ((total - dis)::DOUBLE / total)::FLOAT AS dupf, topf
            FROM tc JOIN gt USING (doc_id)
            """
        ).fetchall()
    }
    assert got == exp


# ---------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "contact me at john.doe+spam@example.co.uk or 555-123-4567"),
        (2, "ssn 123-45-6789 card 4111111111111111 ip 192.168.0.1"),
        (3, "no pii here, just 12 numbers 345"),
        (4, "email@x.io 10.0.0.255 999-99-9999 987.654.3210"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_pii_stats_counts(pii_docs):
    from duckdb_vss_spark import pii_stats

    out = {r["doc_id"]: r for r in pii_stats(pii_docs, "text").collect()}
    assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1) and out[1]["has_pii"]
    assert (out[2]["n_ssn"], out[2]["n_card"], out[2]["n_ipv4"]) == (1, 1, 1)
    assert not out[3]["has_pii"] and not out[5]["has_pii"]
    # dotted phone + dotted quad disambiguation
    assert (out[4]["n_ipv4"], out[4]["n_phone"], out[4]["n_ssn"]) == (1, 1, 1)


def test_pii_stats_matches_duckdb(pii_docs, ddb):
    from duckdb_vss_spark import pii_stats
    from duckdb_vss_spark.oracle import sql_pii_counts

    got = sorted(
        tuple(r)
        for r in pii_stats(pii_docs, "text")
        .select("doc_id", "n_email", "n_ssn", "n_phone", "n_card", "n_ipv4")
        .collect()
    )
    rows = [tuple(r) for r in pii_docs.select("doc_id", "text").collect()]
    ddb.execute("CREATE OR REPLACE TABLE __pii(doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO __pii VALUES (?, ?)", rows)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in sql_pii_counts("text"))
    want = sorted(tuple(r) for r in ddb.execute(f"SELECT doc_id, {cols} FROM __pii").fetchall())
    assert got == want


def test_redact_pii_matches_duckdb(pii_docs, ddb):
    from duckdb_vss_spark import redact_pii
    from duckdb_vss_spark.oracle import sql_redact_pii

    got = sorted(tuple(r) for r in redact_pii(pii_docs, "text", out_col="red").select("doc_id", "red").collect())
    rows = [tuple(r) for r in pii_docs.select("doc_id", "text").collect()]
    ddb.execute("CREATE OR REPLACE TABLE __pii2(doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO __pii2 VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in ddb.execute(f"SELECT doc_id, {sql_redact_pii('text')} FROM __pii2").fetchall())
    assert got == want
    red = dict(got)
    assert red[1] == "contact me at [EMAIL] or [PHONE]"
    assert red[2] == "ssn [SSN] card [CARD] ip [IP]"


def test_pii_is_map_only(pii_docs):
    from duckdb_vss_spark import pii_stats

    plan = _physical(pii_stats(pii_docs, "text"))
    assert "Exchange" not in plan


# ---------------------------------------------------------------- LM score


def test_ngram_lm_score_hand_computed(spark):
    """3 docs over a 2-token vocab: P(a)=(3+1)/(4+2), P(b)=(1+1)/(4+2)."""
    import math

    from duckdb_vss_spark import ngram_lm_score

    df = spark.createDataFrame([(1, "a a b"), (2, "a"), (3, "")], "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in ngram_lm_score(df, "text", "doc_id").collect()}
    # tokens(): empty text yields [''] -> '' is a vocab type with count 1
    # corpus grams: a,a,b,a,'' -> N=5, V=3; P(a)=4/8, P(b)=2/8, P('')=2/8
    lpa, lpb = math.log(4 / 8), math.log(2 / 8)
    assert out[1]["n_grams"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["avg_logprob"] == pytest.approx((2 * lpa + lpb) / 3, rel=1e-12)
    assert out[2]["avg_logprob"] == pytest.approx(lpa, rel=1e-12)
    assert out[1]["ppl"] == pytest.approx(math.exp(-(2 * lpa + lpb) / 3), rel=1e-12)


def test_ngram_lm_score_matches_duckdb_sf001(spark, ddb):
    from duckdb_vss_spark import ngram_lm_score
    from duckdb_vss_spark.oracle import sql_ngram_lm_score

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    got = {
        r["doc_id"]: (r["n_grams"], r["n_oov"], f32(r["avg_logprob"]))
        for r in ngram_lm_score(df, "text", "doc_id").collect()
    }
    want = {
        r[0]: (r[1], r[2], f32(r[3]))
        for r in ddb.execute(sql_ngram_lm_score("documents", "text", "doc_id")).fetchall()
    }
    # integer fields are exact; ln()/exp() differ by 1 ulp between the JVM
    # and libm on some arguments, so doubles are compared (and exposed in
    # the driver entry) after a float32 round-trip.
    assert got == want


def test_ngram_lm_score_external_counts_oov(spark):
    from duckdb_vss_spark import ngram_lm_score

    df = spark.createDataFrame([(1, "a b zzz")], "doc_id: long, text: string")
    counts = spark.createDataFrame([("a", 3), ("b", 1)], "gram: string, c: long")
    out = ngram_lm_score(df, "text", "doc_id", counts_df=counts).collect()[0]
    assert out["n_oov"] == 1  # zzz unseen
    assert out["n_grams"] == 3


# -- stupid backoff ----------------------------------------------------------


def test_stupid_backoff_hand_computed_self_trained(spark):
    """n=2 over two docs; self-trained so the top order always hits:
    corpus 'a b a' + 'b b' -> c1={a:2,b:3}, N=5, c2={'a b':1,'b a':1,'b b':1}."""
    import math

    from duckdb_vss_spark import stupid_backoff_score

    df = spark.createDataFrame([(1, "a b a"), (2, "b b")], "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           stupid_backoff_score(df, "text", "doc_id", n=2).collect()}
    exp1 = (math.log(2 / 5) + math.log(1 / 2) + math.log(1 / 3)) / 3
    exp2 = (math.log(3 / 5) + math.log(1 / 3)) / 2
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["avg_logscore"] == pytest.approx(exp1, rel=1e-12)
    assert out[2]["avg_logscore"] == pytest.approx(exp2, rel=1e-12)
    assert out[2]["ppl"] == pytest.approx(math.exp(-exp2), rel=1e-12)


def test_stupid_backoff_external_counts_backoff_and_oov(spark):
    """External table {a:4, b:2, 'a b':2}: 'b a c' scores the unigram top
    order at pos 0, BACKS OFF (alpha penalty) at pos 1 ('b a' unseen), and
    floors at pos 2 ('c' is OOV)."""
    import math

    from duckdb_vss_spark import stupid_backoff_score

    df = spark.createDataFrame([(1, "b a c")], "doc_id: long, text: string")
    counts = spark.createDataFrame(
        [("a", 4), ("b", 2), ("a b", 2)], "gram: string, c: long"
    )
    out = stupid_backoff_score(df, "text", "doc_id", n=2, counts_df=counts).collect()[0]
    n_ext, v_ext, a = 6, 2, 0.4
    exp = (
        math.log(2 / n_ext)                                   # 'b' unigram, k0=1
        + (math.log(4 / n_ext) + math.log(a))                 # 'b a' miss -> backoff
        + (math.log(1 / (n_ext + v_ext)) + math.log(a))       # 'c' OOV floor
    ) / 3
    assert out["n_oov"] == 1
    assert out["avg_logscore"] == pytest.approx(exp, rel=1e-12)


def test_stupid_backoff_uses_longest_available_context(spark):
    """n=3 self-trained: position 2+ must score with the trigram, position
    1 with the bigram, position 0 with the unigram — all exact ratios."""
    import math

    from duckdb_vss_spark import stupid_backoff_score

    df = spark.createDataFrame([(1, "x y z x y z")], "doc_id: long, text: string")
    out = stupid_backoff_score(df, "text", "doc_id", n=3).collect()[0]
    # c1: x2 y2 z2, N=6; c2: 'x y':2,'y z':2,'z x':1; c3: 'x y z':2,'y z x':1,'z x y':1
    exp = (
        math.log(2 / 6)        # x | k0=1
        + math.log(2 / 2)      # 'x y' / 'x'
        + math.log(2 / 2)      # 'x y z' / 'x y'
        + math.log(1 / 2)      # 'y z x' / 'y z'
        + math.log(1 / 1)      # 'z x y' / 'z x'
        + math.log(2 / 2)      # 'x y z' / 'x y'
    ) / 6
    assert out["n_tokens"] == 6 and out["n_oov"] == 0
    assert out["avg_logscore"] == pytest.approx(exp, rel=1e-12)


def test_stupid_backoff_matches_duckdb_sf001(spark, ddb):
    from duckdb_vss_spark import stupid_backoff_score
    from duckdb_vss_spark.oracle import sql_stupid_backoff_score

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], f32(r["avg_logscore"]))
        for r in stupid_backoff_score(df, "text", "doc_id", n=3).collect()
    }
    want = {
        r[0]: (r[1], r[2], f32(r[3]))
        for r in ddb.execute(
            sql_stupid_backoff_score("documents", "text", "doc_id", n=3)
        ).fetchall()
    }
    assert got == want


# -- C4-style line cleaning -------------------------------------------------


def test_clean_lines_semantics(spark):
    from duckdb_vss_spark import clean_lines

    rows = [
        (0, "Hello world today.\nshort\nHas javascript inside it ok.\nA fine long sentence!\n  \nx { y } code."),
        (1, 'Ends with quote "\nlorem ipsum dolor sit.\nTiny.'),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["clean"])
        for r in clean_lines(df, "text", out_col="clean").collect()
    }
    # doc 0: "short" (<3 words), javascript line, blank line, brace line dropped
    assert out[0] == (6, 2, "Hello world today.\nA fine long sentence!")
    # doc 1: terminal-quote line kept, lorem ipsum + <3-word lines dropped
    assert out[1] == (3, 1, 'Ends with quote "')
    # empty doc: one empty line, nothing kept, empty output
    assert out[2] == (1, 0, "")


def test_clean_lines_options(spark):
    from duckdb_vss_spark import clean_lines

    df = spark.createDataFrame([(0, "no punct here at all\nx { y } ok fine")], "doc_id long, text string")
    out = clean_lines(
        df, "text", require_terminal_punct=False, drop_brace_lines=False, blocklist=()
    ).collect()[0]
    assert out["n_kept_lines"] == 2 and out["text"] == "no punct here at all\nx { y } ok fine"


def test_clean_lines_matches_duckdb(spark):
    import duckdb

    from duckdb_vss_spark import clean_lines
    from duckdb_vss_spark.oracle import sql_clean_lines

    rows = [
        (0, "Hello world today.\nshort\nHas javascript inside it ok.\nA fine long sentence!\n  \nx { y } code."),
        (1, 'Ends with quote "\nlorem ipsum dolor sit.\nTiny.'),
        (2, ""),
        (3, "Solid closing line indeed?\nCOOKIE Policy mention here.\nAnother good line stays!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s)" % (i, "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'")
            for i, t in rows
        )
        + ") v(doc_id, text)"
    )
    kl = sql_clean_lines("text")
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, len({kl})::BIGINT, coalesce(array_to_string({kl}, chr(10)), '') FROM d"
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["n_kept_lines"], r["clean"])
        for r in clean_lines(df, "text", out_col="clean").collect()
    }
    assert got == want


def test_clean_lines_plan_map_only(spark):
    from duckdb_vss_spark import clean_lines

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _physical(clean_lines(df, "text").select("doc_id", "n_kept_lines"))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan and "ArrowEval" not in plan


# -- classifier_score ------------------------------------------------------


def test_classifier_score_matches_oracle(spark, ddb):
    from duckdb_vss_spark import classifier_score
    from duckdb_vss_spark.oracle import sql_classifier_score

    pdocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ours = {
        r["doc_id"]: round(r["clf_score"], 9)
        for r in classifier_score(pdocs, "text").select("doc_id", "clf_score").collect()
    }
    theirs = {
        r[0]: round(r[1], 9)
        for r in ddb.execute(
            f"SELECT doc_id, {sql_classifier_score('text')} FROM documents"
        ).fetchall()
    }
    assert ours == theirs
    assert all(0.0 < v < 1.0 for v in ours.values())


def test_classifier_score_external_weights(spark):
    """Zero-weight model must yield sigmoid(bias) for every doc, including
    one whose features all miss the table."""
    import math

    from duckdb_vss_spark import classifier_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], "doc_id long, text string"
    )
    w = spark.createDataFrame([(12345, 0.0)], "bucket long, w double")
    rows = classifier_score(df, "text", id_col="doc_id", weights_df=w, bias=0.5).collect()
    assert len(rows) == 2
    assert all(abs(r["clf_score"] - 1 / (1 + math.exp(-0.5))) < 1e-12 for r in rows)


def test_classifier_score_is_map_only(docs):
    from duckdb_vss_spark import classifier_score

    plan = (
        classifier_score(docs, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_classifier_score_adversarial_inputs_match_oracle(spark, ddb):
    """Unicode, emoji, mixed whitespace, escapes, numerics and long docs:
    the hashed-feature pipeline (UTF-8 md5 -> bucket -> weight fold) must
    agree across engines on inputs far outside the fixture distribution."""
    from duckdb_vss_spark import classifier_score
    from duckdb_vss_spark.oracle import sql_classifier_score

    rows = [
        (1, "héllo wörld ünïcode"),
        (2, "日本語 テスト text mixed 中文"),
        (3, "emoji 😀 🎉 test"),
        (4, "tabs\tand\nnewlines mixed   spaces"),
        (5, "a'b \"c\" d\\e $pecial %chars &stuff"),
        (6, "x " * 2000),
        (7, "single"),
        (8, "MiXeD CaSe TOKENS lower UPPER"),
        (9, "123 456.789 1e10 0xff"),
        (10, "trailing spaces   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ours = {
        r["doc_id"]: round(r["clf_score"], 9)
        for r in classifier_score(df, "text").select("doc_id", "clf_score").collect()
    }
    ddb.execute("CREATE OR REPLACE TABLE adv_t(doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO adv_t VALUES (?, ?)", rows)
    theirs = {
        r[0]: round(r[1], 9)
        for r in ddb.execute(
            f"SELECT doc_id, {sql_classifier_score('text')} FROM adv_t"
        ).fetchall()
    }
    assert ours == theirs


def test_semantic_decontaminate(spark, ddb):
    """Embedding-space decontamination: bitwise vs the duckdb max-similarity
    twin on both polarities; empty bench and NULL vectors covered."""
    from duckdb_vss_spark.operators.quality import semantic_decontaminate

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter("vec_id % 7 = 0")
    train = emb.filter("vec_id % 7 <> 0")
    got = sorted(
        (r["vec_id"], r["best_score"], r["contaminated"])
        for r in semantic_decontaminate(train, "embedding", "vec_id", bench, threshold=0.35).collect()
    )
    exp = sorted(
        ddb.execute(
            "SELECT t.vec_id, max(list_cosine_similarity(t.embedding::DOUBLE[], b.embedding::DOUBLE[])) AS s, "
            "max(list_cosine_similarity(t.embedding::DOUBLE[], b.embedding::DOUBLE[])) >= 0.35 "
            "FROM (SELECT * FROM embeddings WHERE vec_id % 7 <> 0) t, "
            "(SELECT * FROM embeddings WHERE vec_id % 7 = 0) b GROUP BY t.vec_id"
        ).fetchall()
    )
    assert got == exp

    # l2sq polarity: min distance, <= threshold
    got2 = semantic_decontaminate(train.limit(50), "embedding", "vec_id", bench, threshold=1.0, metric="l2sq").collect()
    assert all((r["best_score"] <= 1.0) == r["contaminated"] for r in got2)

    # empty bench -> empty result; NULL vectors produce no row
    empty = bench.filter("vec_id < 0")
    assert semantic_decontaminate(train, "embedding", "vec_id", empty).count() == 0
    withnull = spark.createDataFrame([(1, [1.0, 0.0]), (2, None)], "vec_id long, embedding array<float>")
    b2 = spark.createDataFrame([(9, [1.0, 0.0])], "vec_id long, embedding array<float>")
    rows = semantic_decontaminate(withnull, "embedding", "vec_id", b2, threshold=0.5).collect()
    assert [r["vec_id"] for r in rows] == [1] and rows[0]["contaminated"]


# -- Gopher quality rules ------------------------------------------------------


def test_gopher_quality_flags_crafted(spark):
    """Each rule tripped by a purpose-built doc; a long clean doc passes."""
    from duckdb_vss_spark import gopher_quality_flags

    clean = ("the quick brown fox likes to be seen jumping over lazy dogs "
             "and that is a fact we have established with care ") * 3
    docs = spark.createDataFrame(
        [
            (1, clean),                                             # passes all
            (2, "short doc with the and of"),                       # r1: < 50 words
            (3, "a " * 60 + "the of"),                              # r2: mean wlen < 3
            (4, ("the of " * 30) + "# " * 20),                      # r3: symbols
            (5, "\n".join("- bullet the of line item number " + str(i) for i in range(10)) * 2),  # r4
            (6, "\n".join("the line of text trails off..." for _ in range(10)) * 2),  # r5
            (7, ("12345 " * 60) + "the of"),                        # r6: alpha frac
            (8, ("zebra quagga lion tiger puma jaguar " * 12)),     # r7: no stop words
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs, "text", "doc_id").collect()}
    assert out[1]["gopher_keep"], out[1]
    assert not out[2]["gq_r1_ok"]
    assert not out[3]["gq_r2_ok"]
    assert not out[4]["gq_r3_ok"]
    assert not out[5]["gq_r4_ok"] and out[5]["gq_bullet_frac"] == 1.0
    assert not out[6]["gq_r5_ok"] and out[6]["gq_ellipsis_frac"] == 1.0
    assert not out[7]["gq_r6_ok"]
    assert not out[8]["gq_r7_ok"] and out[8]["gq_stop_hits"] == 0
    for i in range(2, 9):
        assert not out[i]["gopher_keep"], i


def test_gopher_quality_matches_duckdb_sf001(spark, ddb):
    import struct

    from duckdb_vss_spark import gopher_quality_flags
    from duckdb_vss_spark.oracle import sql_gopher_quality

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["gq_n_words", "gq_mean_wlen", "gq_symbol_ratio", "gq_bullet_frac",
            "gq_ellipsis_frac", "gq_alpha_frac", "gq_stop_hits", "gopher_keep"]
    got = {
        r["doc_id"]: tuple(f32(v) if isinstance(v, float) else v for v in (r[c] for c in cols))
        for r in gopher_quality_flags(df, "text", "doc_id").select("doc_id", *cols).collect()
    }
    want = {
        row[0]: tuple(f32(v) if isinstance(v, float) else v for v in row[1:])
        for row in ddb.execute(sql_gopher_quality("documents", "text", "doc_id")).fetchall()
    }
    assert got == want


def test_gopher_quality_plan_is_map_only(spark):
    """Every Gopher signal is document-local: the operator must stay one
    map-only codegen projection — no Exchange, no aggregate, no Python."""
    from duckdb_vss_spark import gopher_quality_flags

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    par = spark.sparkContext.defaultParallelism
    plan = _physical(gopher_quality_flags(docs.repartition(par), "text", "doc_id"))
    assert plan.count("Exchange") == 1, plan  # only the test's repartition
    assert "HashAggregate" not in plan and "EvalPython" not in plan
