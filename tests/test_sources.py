"""Source/sink surface: format round trips, partitioned writes with
partition pruning, bucketed tables that eliminate the join shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark.sources import load_tables, read_any, write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_load_tables_registers_views(spark):
    out = load_tables(spark, SF)
    assert set(out) >= {"region", "nation", "lineitem", "embeddings", "documents"}
    assert spark.sql("SELECT count(*) FROM region").collect()[0][0] == out["region"].count()


def test_csv_json_roundtrip(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/nation.parquet")
    write_partitioned(src, str(tmp_path / "n_csv"), fmt="csv")
    write_partitioned(src, str(tmp_path / "n_json"), fmt="json")
    csv = read_any(spark, str(tmp_path / "n_csv"), "csv",
                   schema="n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string")
    js = read_any(spark, str(tmp_path / "n_json"), "json")
    exp = {r["n_nationkey"]: r["n_name"] for r in src.collect()}
    assert {r["n_nationkey"]: r["n_name"] for r in csv.collect()} == exp
    assert {r["n_nationkey"]: r["n_name"] for r in js.collect()} == exp


def test_partitioned_write_prunes(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(src, path, partition_by=["o_year"])
    back = read_any(spark, path)
    one_year = back.filter(F.col("o_year") == 1995)
    plan = _physical(one_year)
    # partition filter must land in the scan, not a post-filter
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters:")[1].splitlines()[0]
    exp = src.filter(F.col("o_year") == 1995).count()
    assert one_year.count() == exp


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.select("o_orderkey", "o_custkey"), "orders_b", ["o_orderkey"], 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the shuffle question
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _physical(j)
        # compatible bucketing: no Exchange on either side of the sort-merge join
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


# ---------------------------------------------------------------- z-order


def test_zorder_key_bit_interleave(spark):
    """Morton key vs a direct python interleave, incl. validation."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.sources import zorder_key

    df = spark.range(0, 512).select(
        (F.col("id") % 23).alias("a"), (F.col("id") / 23).cast("long").alias("b"), "id"
    )
    got = {r["id"]: r["z"] for r in df.withColumn("z", zorder_key(["a", "b"], bits=9)).collect()}

    def pyz(a, b, bits=9):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[i] == pyz(i % 23, i // 23) for i in range(512))
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=8)
    with pytest.raises(ValueError, match="63 key bits"):
        zorder_key(["a", "b"], bits=32)


def test_write_zordered_concentrates_box_queries(spark, tmp_path):
    """The data-skipping claim, measured: a 2-d box filter over a uniform
    grid touches a small fraction of the z-ordered files but essentially
    all of the randomly-laid-out ones (file-level min/max on BOTH columns
    are tight only under the interleaved sort)."""
    import random

    from pyspark.sql import functions as F

    from duckdb_vss_spark.sources import write_zordered

    rng = random.Random(3)
    rows = [(rng.randrange(256), rng.randrange(256), k) for k in range(50_000)]
    data = spark.createDataFrame(rows, "x long, y long, k long")
    rand_dir, z_dir = str(tmp_path / "rand"), str(tmp_path / "zord")
    data.repartition(32).write.parquet(rand_dir)
    write_zordered(data, ["x", "y"], z_dir, n_files=32, bits=8)

    def probe(path):
        d = spark.read.parquet(path).filter(
            "x >= 32 and x < 64 and y >= 96 and y < 128"
        )
        return d.select(F.input_file_name()).distinct().count(), d.count()

    fr, nr = probe(rand_dir)
    fz, nz = probe(z_dir)
    assert nr == nz  # layout never changes results
    assert fz <= fr / 4  # matches concentrate in few files
    # roundtrip is lossless
    back = spark.read.parquet(z_dir)
    assert back.count() == 50_000
    assert back.agg(F.sum("k")).first()[0] == sum(k for _, _, k in rows)


# ---------------------------------------------------------------- WARC


def _mk_warc(records):
    """Synthesize WARC bytes: records = [(type, url, block_bytes)]."""
    out = bytearray()
    for i, (wtype, url, block) in enumerate(records):
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n"
            f"WARC-Date: 2026-08-14T00:00:0{i % 10}Z\r\n"
            + (f"WARC-Target-URI: {url}\r\n" if url else "")
            + f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        out += hdr + block + b"\r\n\r\n"
    return bytes(out)


def _http(body: bytes, status=200, ctype="text/html; charset=utf-8"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_parse_warc_bytes_plain_and_gzip():
    import gzip

    from duckdb_vss_spark.sources.warc import parse_warc_bytes

    html = b"<html><title>T</title><body>hello</body></html>"
    raw = _mk_warc(
        [
            ("warcinfo", "", b"software: test\r\n"),
            ("request", "http://a.com/x", b"GET /x HTTP/1.1\r\n\r\n"),
            ("response", "http://a.com/x", _http(html)),
        ]
    )
    for blob in (raw, gzip.compress(raw)):
        recs = parse_warc_bytes(blob)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
        resp = recs[2]
        assert resp["url"] == "http://a.com/x"
        assert resp["http_status"] == 200
        assert resp["http_content_type"].startswith("text/html")
        assert bytes(resp["body"]) == html


def test_read_warc_to_documents_end_to_end(spark, tmp_path):
    """The crawl front of the pipeline: WARC segment -> response records ->
    HTML text extraction -> a documents frame ready for URL curation."""
    from duckdb_vss_spark.operators.web import extract_html_text
    from duckdb_vss_spark.sources import read_warc

    pages = {
        "https://a.example.com/1": "<html><head><title>Page One</title>"
        "<style>.x{color:red}</style></head><body><h1>Head&amp;line</h1>"
        "<p>first para</p><script>var x=1;</script><p>second   para</p></body></html>",
        "https://b.example.com/2": "<html><body><ul><li>alpha</li><li>beta</li></ul></body></html>",
    }
    recs = [("response", u, _http(h.encode())) for u, h in pages.items()]
    recs.insert(0, ("warcinfo", "", b"software: test\r\n"))
    (tmp_path / "seg").mkdir()
    (tmp_path / "seg" / "part-0.warc").write_bytes(_mk_warc(recs))
    out = read_warc(spark, str(tmp_path / "seg"))
    rows = out.collect()
    assert len(rows) == 2  # warcinfo filtered by default
    docs = extract_html_text(
        out.selectExpr("url", "body"), "body", "url"
    ).collect()
    byurl = {r["url"]: r for r in docs}
    one = byurl["https://a.example.com/1"]
    assert one["title"] == "Page One"
    assert ".x{color:red}" not in one["text"] and "var x=1" not in one["text"]
    assert "Head&line" in one["text"]
    assert "first para" in one["text"] and "second para" in one["text"]
    two = byurl["https://b.example.com/2"]
    assert "alpha" in two["text"] and "beta" in two["text"]
    assert two["n_text_chars"] == len(two["text"])


def test_extract_html_text_string_input_and_malformed(spark):
    from duckdb_vss_spark.operators.web import extract_html_text

    df = spark.createDataFrame(
        [
            (1, "<p>fine</p>"),
            (2, "<div><b>unclosed"),
            (3, None),
            (4, "<!-- comment --><p>c &lt;tag&gt; d</p>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in extract_html_text(df, "html", "doc_id").collect()}
    assert out[1]["text"] == "fine"
    assert "unclosed" in out[2]["text"]
    assert out[3]["text"] == ""
    assert out[4]["text"] == "c <tag> d"  # entities decoded, comment dropped


def test_extract_html_text_charset_sniffing(spark):
    """encoding='auto': BOM wins, then <meta charset>, else UTF-8 —
    the browser sniffing order for crawled bytes with lying headers."""
    from duckdb_vss_spark.operators.web import extract_html_text

    latin = "<html><meta charset=\"iso-8859-1\"><body><p>caf\xe9 cr\xe8me</p></body></html>"
    utf8 = "<html><body><p>naïve — dash</p></body></html>"
    bom = "<html><body><p>bom doc</p></body></html>"
    df = spark.createDataFrame(
        [
            (1, bytearray(latin.encode("iso-8859-1"))),
            (2, bytearray(utf8.encode("utf-8"))),
            (3, bytearray(bom.encode("utf-8-sig"))),  # leading BOM bytes
            (4, bytearray("<meta charset='bogus-enc'><p>fallback</p>".encode())),
        ],
        "doc_id long, html binary",
    )
    out = {r["doc_id"]: r["text"] for r in extract_html_text(df, "html", "doc_id", encoding="auto").collect()}
    assert out[1] == "caf\xe9 cr\xe8me"      # meta-declared latin-1 honored
    assert out[2] == "naïve — dash"  # default utf-8
    assert out[3] == "bom doc"                # BOM stripped, not in text
    assert out[4] == "fallback"               # unknown charset -> utf-8


def test_extract_html_null_body_and_utf16_bom(spark):
    """Review follow-ups: a NULL binary cell must not kill the task, and a
    UTF-16 BOM decodes through the BOM-consuming codec (no stray U+FEFF
    in the text); a lying '<meta charset=utf-16>' on ASCII-superset bytes
    is treated as UTF-8 per the WHATWG sniffing rules."""
    from duckdb_vss_spark.operators.web import extract_html_text, extract_main_content

    df = spark.createDataFrame(
        [
            (1, None),
            (2, bytearray("<p>utf16 doc body</p>".encode("utf-16"))),  # BOM included
            (3, bytearray(b"<meta charset=utf-16><p>actually ascii</p>")),
        ],
        "doc_id long, html binary",
    )
    out = {r["doc_id"]: r["text"] for r in
           extract_html_text(df, "html", "doc_id", encoding="auto").collect()}
    assert out[1] == ""
    assert out[2] == "utf16 doc body" and "﻿" not in out[2]
    assert out[3] == "actually ascii"
    # the main-content extractor shares the same decode path
    mc = extract_main_content(df, "html", "doc_id", encoding="auto").collect()
    assert len(mc) == 3
