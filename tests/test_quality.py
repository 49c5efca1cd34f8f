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
