"""End-to-end curation recipes (pipelines.py): each composes tested
operators into one lazy plan — these tests pin the wiring (flags present,
row preservation, survivor invariants), not the operators themselves."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
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


def test_ccnet_curate_backoff_lm(docs):
    """lm_order=3 swaps in the stupid-backoff trigram LM; the recipe's
    contracts (row preservation, per-language tercile order) must hold
    for either scorer."""
    from duckdb_vss_spark.pipelines import ccnet_curate

    out = ccnet_curate(docs.limit(200), lm_order=3)
    assert out.count() == 200
    stats = (
        out.groupBy("lang", "ppl_bucket")
        .agg(F.max("ppl").alias("mx"), F.min("ppl").alias("mn"))
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


def test_crawl_ingest(spark, tmp_path):
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import crawl_ingest

    st = MinHashStore.create(spark, str(tmp_path / "store"))
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    st.append_snapshot(hist, "text", "doc_id", "cc-00")

    batch = spark.createDataFrame(
        [
            # near-dup of history -> dup_of_store
            (10, "https://a.example.com/x", "the quick brown fox jumps over the lazy dog near the river bank"),
            # fresh
            (11, "https://a.example.com/y", "completely fresh text about spark plans and shuffles in executors"),
            # same page recrawled with tracking params -> url_dup (vs 11's url? no, vs itself)
            (12, "https://a.example.com/y?utm_source=feed", "recrawl of the same page body text here"),
            # blocklisted domain
            (13, "https://spam.bad.com/z", "irrelevant spam body"),
            # over the domain cap (cap=3 on a.example.com: ids 10,11,12 + 14)
            (14, "https://a.example.com/w", "another page on the capped domain with new words entirely"),
        ],
        "doc_id long, url string, text string",
    )
    out = crawl_ingest(
        batch, st, domain_blocklist=["bad.com"], domain_cap=3,
        store_threshold=0.8, append_snapshot="cc-01",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert out.count() == 5  # flag, don't drop
    assert rows[10]["dup_of_store"] and not rows[10]["ingest_keep"]
    assert rows[13]["domain_blocked"] and rows[13]["domain"] == "bad.com"
    # 11 and 12 share a normalized URL -> exactly one flagged as dup
    assert rows[11]["norm_url"] == rows[12]["norm_url"]
    assert rows[11]["url_dup"] != rows[12]["url_dup"]
    # the cap races only rows no other flag drops: on example.com the
    # eligible set is {keeper of 11/12, 14} (10 is a history dup, one of
    # 11/12 a url dup) — 2 docs <= cap=3, so nothing is domain_capped
    adom = [r for r in rows.values() if r["domain"] == "example.com"]
    assert sum(r["domain_capped"] for r in adom) == 0
    # snapshot cc-01 committed with only the kept rows
    info = st.info()
    assert [s["name"] for s in info["snapshots"]] == ["cc-00", "cc-01"]
    n_kept = out.filter("ingest_keep").count()
    assert info["snapshots"][-1]["n_docs"] == n_kept
    # the NEXT batch now near-dups against what this batch kept
    nxt = spark.createDataFrame(
        [(20, "completely fresh text about spark plans and shuffles in executors")],
        "doc_id long, text string",
    )
    assert st.match_against(nxt, "text", "doc_id", 0.8).count() >= 1


def test_crawl_ingest_cap_ignores_flagged_rows(spark, tmp_path):
    """Rows dropped by other flags (url_dup / dup_of_store) must not
    consume per-domain cap slots: a domain with many recrawls still keeps
    up to domain_cap ELIGIBLE docs (ADVICE r5)."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import crawl_ingest

    st = MinHashStore.create(spark, str(tmp_path / "store"))
    hist_body = "the quick brown fox jumps over the lazy dog near the river bank"
    st.append_snapshot(
        spark.createDataFrame([(1, hist_body)], "doc_id long, text string"),
        "text", "doc_id", "h0",
    )
    batch = spark.createDataFrame(
        [
            # history dup -> dup_of_store, must not take a slot
            (10, "https://a.example.com/h", hist_body),
            # recrawl pair -> one url_dup, the dup must not take a slot
            (11, "https://a.example.com/p", "fresh body about spark shuffle plans and exchanges"),
            (12, "https://a.example.com/p?utm_source=x", "recrawled page body text goes here"),
            # two more fresh docs
            (13, "https://a.example.com/q", "another entirely new document about tokenizers and merges"),
            (14, "https://a.example.com/r", "yet another new page with different words and content"),
        ],
        "doc_id long, url string, text string",
    )
    # eligible docs on example.com = {keeper of 11/12, 13, 14} = 3 = cap
    out = crawl_ingest(batch, st, domain_cap=3, store_threshold=0.8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert not any(r["domain_capped"] for r in rows.values())
    kept = {i for i, r in rows.items() if r["ingest_keep"]}
    assert len(kept) == 3 and {13, 14} <= kept and kept <= {11, 12, 13, 14}


def test_warc_ingest_end_to_end(spark, tmp_path):
    """WARC segment -> extracted docs -> crawl_ingest flags, one call."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import warc_ingest
    from tests.test_sources import _http, _mk_warc

    body1 = "<html><title>A</title><body><p>the quick brown fox jumps over the lazy dog near the river bank</p></body></html>"
    body2 = "<html><body><p>entirely different words about spark executors and shuffles</p></body></html>"
    recs = [
        ("warcinfo", "", b"software: t\r\n"),
        ("response", "https://a.example.com/p1", _http(body1.encode())),
        ("response", "https://a.example.com/p2", _http(body2.encode())),
        ("response", "https://a.example.com/miss", _http(b"nope", status=404)),
        ("response", "https://a.example.com/img", _http(b"\x89PNG", ctype="image/png")),
    ]
    seg = tmp_path / "seg"; seg.mkdir()
    (seg / "part-0.warc").write_bytes(_mk_warc(recs))
    st = MinHashStore.create(spark, str(tmp_path / "store"))
    out = warc_ingest(spark, str(seg), st, append_snapshot="w0")
    rows = out.collect()
    # 404 and non-HTML records are gated out before extraction
    assert len(rows) == 2
    assert {r["url"] for r in rows} == {"https://a.example.com/p1", "https://a.example.com/p2"}
    assert all(r["ingest_keep"] for r in rows)
    byurl = {r["url"]: r for r in rows}
    assert byurl["https://a.example.com/p1"]["title"] == "A"
    assert "quick brown fox" in byurl["https://a.example.com/p1"]["text"]
    # re-processing the same segment dedups against the committed history
    out2 = warc_ingest(spark, str(seg), st)
    assert out2.filter("dup_of_store").count() == 2
    # deterministic ids: same records -> same doc_ids across runs
    assert {r["doc_id"] for r in out2.collect()} == {r["doc_id"] for r in rows}


def test_crawl_ingest_robots_gate(spark, tmp_path):
    """The compliance stage: robots-disallowed URLs flag and drop from
    ingest_keep, and (like every other flag) consume no cap slots."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.operators.web import robots_disallow_rules
    from duckdb_vss_spark.pipelines import crawl_ingest

    st = MinHashStore.create(spark, str(tmp_path / "store"))
    rules = robots_disallow_rules(
        spark.createDataFrame(
            [("example.com", "User-agent: *\nDisallow: /private")],
            "domain string, body string",
        ),
        "domain", "body",
    )
    batch = spark.createDataFrame(
        [
            (1, "https://a.example.com/private/x", "some secret page body text here"),
            (2, "https://a.example.com/public", "a perfectly public page body text"),
        ],
        "doc_id long, url string, text string",
    )
    out = {r["doc_id"]: r for r in
           crawl_ingest(batch, st, robots_rules=rules, domain_cap=1).collect()}
    assert out[1]["robots_disallowed"] and not out[1]["ingest_keep"]
    assert not out[2]["robots_disallowed"] and out[2]["ingest_keep"]
    # without rules the flag exists and is all-False
    out2 = crawl_ingest(batch, st, domain_cap=10).collect()
    assert all(r["robots_disallowed"] is False for r in out2)


def test_curate_corpus_full_chain(spark, docs, tmp_path):
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import curate_corpus

    store = MinHashStore.create(spark, str(tmp_path / "cc_store"), 3, 16, 4)
    history = docs.filter("doc_id % 4 = 0")
    batch = docs.filter("doc_id % 4 <> 0")
    store.append_snapshot(history, "text", "doc_id", "history")
    bench = docs.filter("doc_id % 97 = 0")
    out = curate_corpus(
        batch, store=store, bench=bench,
        quality_threshold=0.5, strata_col="lang", alpha=0.5, pack_budget=512,
    ).cache()
    # flag-don't-drop: every batch row survives with every stage column
    assert out.count() == batch.count()
    assert {
        "clf_score", "n_tok", "quality_ok", "dup_of_store", "n_hit_grams",
        "contaminated", "mix_keep", "curate_keep", "pack_id",
    } <= set(out.columns)
    rows = out.collect()
    # verdict composition: keep == all gates passed
    for r in rows:
        expect = (
            r["quality_ok"] and not r["dup_of_store"]
            and not r["contaminated"] and r["mix_keep"]
        )
        assert r["curate_keep"] == expect
        # packing covers exactly the kept rows
        assert (r["pack_id"] is not None) == r["curate_keep"]
    # mixing race ran only over survivors: a row dropped by an earlier
    # flag is never blamed by the mixing stage
    for r in rows:
        if not r["quality_ok"] or r["dup_of_store"] or r["contaminated"]:
            assert r["mix_keep"]
    out.unpersist()


def test_curate_corpus_stage_collects_hit_cached_narrow(spark, docs, tmp_path):
    """Round 8: the recipe's mixing/packing joins must read the PERSISTED
    narrow flag frame (InMemoryTableScan), not re-derive the quality/
    dedup/decontaminate chain — each driver-collect stage used to
    re-evaluate the heavy operators (~6 passes at 1M docs, measured
    140.5 -> 117.2 s after the fix). The final consumer plan keeps the
    heavy chain map-side exactly once; the kept/packed join inputs come
    from cache."""
    from duckdb_vss_spark.pipelines import curate_corpus

    out = curate_corpus(docs, quality_threshold=0.0, strata_col="lang", pack_budget=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan[:2000]


def test_curate_corpus_pack_budget_shape(spark, docs, tmp_path):
    """Packs are contiguous per stratum and respect the token budget up to
    one-document overflow (pack_sequences' contract, re-checked through
    the recipe's kept-rows-only handoff)."""
    from duckdb_vss_spark.pipelines import curate_corpus

    out = curate_corpus(
        docs, quality_threshold=0.0, strata_col="lang", pack_budget=256
    )
    kept = out.filter("curate_keep").select("lang", "pack_id", "n_tok")
    agg = kept.groupBy("lang", "pack_id").agg(
        F.sum("n_tok").alias("tok"), F.max("n_tok").alias("mx")
    ).collect()
    by_lang = {}
    for r in agg:
        by_lang.setdefault(r["lang"], []).append(r)
        # budget overflow bounded by one document
        assert r["tok"] < 256 + r["mx"] + 1
    for lang, packs in by_lang.items():
        ids = sorted(r["pack_id"] for r in packs)
        assert ids == list(range(len(ids)))  # contiguous from 0


def test_curate_corpus_ingest_keep_gates_mixing(spark, tmp_path):
    """A crawl-front-rejected row (ingest_keep=False) must not consume a
    mixture slot NOR be blamed by the mixing flag, and must end
    curate_keep=False."""
    from duckdb_vss_spark.pipelines import curate_corpus

    rows = [(i, f"unique document body number {i} with shared tail words", "en",
             i % 3 != 0) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, ingest_keep boolean")
    out = curate_corpus(df, quality_threshold=0.0, strata_col="lang", alpha=0.0).collect()
    for r in out:
        if not r["ingest_keep"]:
            assert not r["curate_keep"]
            assert r["mix_keep"]  # not dropped BY MIXING
    # with alpha=0 and one stratum the rate is 1.0: every eligible row kept
    assert all(r["curate_keep"] for r in out if r["ingest_keep"])


def test_curate_corpus_snapshot_commit(spark, docs, tmp_path):
    """snapshot= commits ONLY kept rows; the next batch dedups against
    them (the steady-state incremental loop)."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import curate_corpus

    store = MinHashStore.create(spark, str(tmp_path / "cc_snap"), 3, 16, 4)
    first = docs.filter("doc_id % 2 = 0")
    out1 = curate_corpus(
        first, store=store, quality_threshold=0.3, snapshot="batch1"
    )
    kept1 = out1.filter("curate_keep").count()
    assert store.manifest["snapshots"][0]["n_docs"] == kept1
    # replaying the SAME kept docs as a new batch: all flagged as dups
    replay = out1.filter("curate_keep").select("doc_id", "text", "lang")
    out2 = curate_corpus(replay, store=store, quality_threshold=0.0)
    assert out2.filter("dup_of_store").count() == kept1


def test_warc_to_curate_full_pipeline(spark, tmp_path):
    """The complete crawl->curate path in two calls: warc_ingest produces
    flagged docs; curate_corpus consumes them (ingest_keep gates the
    downstream races) — the full recipe a pretraining-data user runs."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.pipelines import curate_corpus, warc_ingest
    from tests.test_sources import _http, _mk_warc

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    recs = [("warcinfo", "", b"software: t\r\n")]
    for i in range(12):
        text = " ".join(words[(i * 3 + j) % 8] + str(i * 7 + j) for j in range(30))
        body = f"<html><title>d{i}</title><body><p>{text}</p></body></html>"
        recs.append(("response", f"https://s{i % 3}.example.com/p{i}", _http(body.encode())))
    seg = tmp_path / "seg"; seg.mkdir()
    (seg / "part-0.warc").write_bytes(_mk_warc(recs))
    st = MinHashStore.create(spark, str(tmp_path / "store"))
    docs = warc_ingest(spark, str(seg), st, append_snapshot="w0")
    # curate the ingested docs against a bench slice; lang strata constant
    docs = docs.withColumn("lang", F.lit("en"))
    bench = docs.limit(2).select("doc_id", "text")
    out = curate_corpus(
        docs, bench=bench, bench_text_col="text",
        quality_threshold=0.0, strata_col="lang", alpha=0.0, pack_budget=64,
    ).collect()
    assert len(out) == 12
    for r in out:
        # ingest_keep folds into the final verdict
        if not r["ingest_keep"]:
            assert not r["curate_keep"]
        # the two bench docs contaminate themselves
    contaminated = [r for r in out if r["contaminated"]]
    assert len(contaminated) >= 2
    kept = [r for r in out if r["curate_keep"]]
    assert kept and all(r["pack_id"] is not None for r in kept)


def test_crawl_ingest_url_dup_equals_window_form(spark, tmp_path):
    """Round 8: the keep-first url_dup flag (agg + null-safe join) must be
    row-identical to the norm_url window form it replaced, on a fixture
    with a HOT recrawled URL (the redirect-target case) and unparseable
    URLs that normalize to the same null-ish key."""
    from pyspark.sql import Window

    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.operators.sampling import _hash_of
    from duckdb_vss_spark.pipelines import crawl_ingest

    rows = []
    for i in range(400):
        if i % 2 == 0:
            url = "https://hot.example.com/login?utm_source=x"  # hot recrawl
        elif i % 7 == 0:
            url = ""  # degenerate
        else:
            url = f"https://site{i % 23}.example.org/p/{i}"
        rows.append((i, url, f"body text {i} with words"))
    batch = spark.createDataFrame(rows, "doc_id long, url string, text string")
    st = MinHashStore.create(spark, str(tmp_path / "ud_store"))
    out = crawl_ingest(batch, st, domain_cap=10**6, store_threshold=0.99).select(
        "doc_id", "norm_url", "url_dup"
    )
    got = {r["doc_id"]: r["url_dup"] for r in out.collect()}
    w = Window.partitionBy("norm_url").orderBy(
        _hash_of("doc_id", "url:"), F.col("doc_id")
    )
    want = {
        r["doc_id"]: r["rn"] > 1
        for r in out.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
    # exactly one keeper per distinct norm_url
    keepers = out.filter(~F.col("url_dup")).groupBy("norm_url").count().collect()
    assert all(r["count"] == 1 for r in keepers)


# ---- curate_corpus cohort algebra (round-9 property test) -------------------

_COHORT_GRAM = "zzq zzr zzs"


@pytest.fixture(scope="module")
def cohort_fixture(spark, tmp_path_factory):
    """Probed text pools hitting every (quality_ok, contaminated,
    dup_of_store) cell, plus a MinHashStore with the dup pool committed as
    history. Text control: quality comes from probing the hashed
    classifier on candidate sentences (deterministic), contamination from
    appending the benchmark 3-gram, store-dup from reusing a committed
    history text verbatim."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore
    from duckdb_vss_spark.operators.quality import classifier_score

    cands = []
    for i in range(150):
        base = " ".join(f"w{i}x{j} filler{(i * 7 + j) % 31}" for j in range(10))
        cands.append((i, 0, base))
        cands.append((i, 1, base + " " + _COHORT_GRAM))
    df = spark.createDataFrame(cands, "i int, c int, text string")
    pools: dict = {}
    for r in classifier_score(df, "text").collect():
        q = 1 if r["clf_score"] >= 0.5 else 0
        hist_pool = 1 if r["i"] < 75 else 0
        pools.setdefault((q, r["c"], hist_pool), []).append(r["text"])
    missing = [k for q in (0, 1) for c in (0, 1) for h in (0, 1) if not pools.get((q, c, h), None) for k in [(q, c, h)]]
    assert not missing, f"probe found no text for cells {missing}"
    root = str(tmp_path_factory.mktemp("cohort_store"))
    store = MinHashStore.create(spark, root + "/store")
    hist_rows = [
        (9000 + qi * 2 + ci, pools[(qi, ci, 1)][0]) for qi in (0, 1) for ci in (0, 1)
    ]
    store.append_snapshot(
        spark.createDataFrame(hist_rows, "doc_id long, text string"),
        "text", "doc_id", "history",
    )
    bench = spark.createDataFrame([(1, _COHORT_GRAM)], "doc_id long, text string")
    return pools, store, bench


def _expected_mix_counts(parts, alpha=0.5):
    """Independent reimplementation of temperature_rates + the exact cut:
    stratum s keeps ceil(min(1, T*p_s/Z/n_s) * n_s) participants."""
    import math

    ns = {}
    for s in parts:
        ns[s] = ns.get(s, 0) + 1
    total = sum(ns.values())
    z = sum(n ** alpha for n in ns.values())
    out = {}
    for s, n in ns.items():
        rate = min(1.0, total * (n ** alpha) / z / n)
        out[s] = math.ceil(rate * n)
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    plan=st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans(), st.booleans()),
        min_size=1,
        max_size=20,
    ),
    pack=st.sampled_from([None, 64]),
)
@example(
    plan=[(bool(q), bool(c), bool(d), bool(k))
          for q in (0, 1) for c in (0, 1) for d in (0, 1) for k in (0, 1)],
    pack=64,
)
def test_curate_cohort_algebra(spark, cohort_fixture, plan, pack):
    """The flag-don't-drop cohort contract over RANDOM gate combinations
    (round-9 verdict task 6), asserted from observed flags:

    - surv = quality_ok & ~dup_of_store & ~contaminated & ingest_keep
    - non-participants (not surv) always get mix_keep = True
    - curate_keep = surv AND mix_keep
    - pack_id NON-NULL <=> curate_keep (when packing; else always NULL)
    - per-stratum kept-participant counts equal an independent
      reimplementation of the temperature mixture's exact cut

    The explicit example pins all 2^4 gate combinations at once."""
    from duckdb_vss_spark.pipelines import curate_corpus

    pools, store, bench = cohort_fixture
    rows = []
    for i, (q, c, d, k) in enumerate(plan):
        text = pools[(int(q), int(c), 1 if d else 0)][0]
        rows.append((i, "en" if i % 3 else "de", text, bool(k)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string, ingest_keep boolean")
    out = curate_corpus(
        docs, store=store, bench=bench, quality_threshold=0.5,
        store_threshold=0.5, strata_col="lang", alpha=0.5, pack_budget=pack,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == set(range(len(plan)))  # flag-don't-drop: every row survives
    parts = []
    for i, (q, c, d, k) in enumerate(plan):
        r = got[i]
        # construction sanity: the probed pools must reproduce the planned gates
        assert r["quality_ok"] == q, (i, "quality", r["clf_score"])
        assert r["contaminated"] == c, (i, "contam")
        assert r["dup_of_store"] == d, (i, "dup")
        surv = q and not d and not c and k
        if surv:
            parts.append(r["lang"])
        else:
            assert r["mix_keep"] is True, (i, "non-participant blamed by mix")
        assert r["curate_keep"] == (surv and r["mix_keep"]), (i, "keep algebra")
        if pack is None:
            assert r["pack_id"] is None
        else:
            assert (r["pack_id"] is not None) == r["curate_keep"], (i, "pack cohort")
    expected = _expected_mix_counts(parts)
    kept_per = {}
    for i in range(len(plan)):
        r = got[i]
        if r["curate_keep"]:
            kept_per[r["lang"]] = kept_per.get(r["lang"], 0) + 1
    assert kept_per == {s: n for s, n in expected.items() if n}, (kept_per, expected)


def test_audio_curate_flags_and_dedup(spark):
    """Flag-don't-drop over an audio corpus: silence, clipping, and
    too-short clips fail quality_keep; a planted scaled duplicate pair
    keeps exactly one canonical; clean clips pass audio_keep."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators import multimodal as M
    from duckdb_vss_spark.pipelines import audio_curate

    def clip(i, n=4096):
        rng = np.random.default_rng(40 + i)  # per-id seed: clip(i) is a pure function
        t = np.arange(n)
        x = 0.4 * np.sin(2 * np.pi * (0.01 + 0.002 * i) * t) + 0.05 * rng.standard_normal(n)
        return np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)

    rows = [(i, M.encode_wav(clip(i), 8000)) for i in range(5)]
    # exact duplicate of clip 0 (scale-robustness of the fingerprint is
    # pinned in test_audio; the recipe test pins the cluster wiring)
    rows.append((100, M.encode_wav(clip(0), 8000)))
    rows.append((200, M.encode_wav(np.zeros(4096, np.int16), 8000)))   # silence
    clipped = np.where(np.arange(4096) % 2 == 0, 32767, -32768).astype(np.int16)
    rows.append((300, M.encode_wav(clipped, 8000)))          # full-scale clipping
    rows.append((400, M.encode_wav(clip(9, n=800), 8000)))   # 0.1 s: too short
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]}))
    out = {r["clip_id"]: r for r in audio_curate(df).collect()}
    assert len(out) == 9                                     # never drops rows
    assert not out[200]["quality_keep"]                      # silence: rms gate
    assert not out[300]["quality_keep"]                      # clipping gate
    assert not out[400]["quality_keep"]                      # duration gate
    pair = {out[0]["dedup_keep"], out[100]["dedup_keep"]}
    assert pair == {True, False}                             # one survivor
    assert out[0]["cluster_id"] == out[100]["cluster_id"]
    for i in (1, 2, 3, 4):
        assert out[i]["quality_keep"] and out[i]["dedup_keep"] and out[i]["audio_keep"]


def test_audio_curate_mixed_rate_normalization(spark):
    """target_rate= resamples a mixed-rate corpus first: a 2x-upsampled
    16 kHz copy downsamples back to the exact 8 kHz original (linear
    interp at even positions is exact), so the pair fingerprints as a
    duplicate only AFTER normalization."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators import multimodal as M
    from duckdb_vss_spark.pipelines import audio_curate

    rng = np.random.default_rng(8)
    t = np.arange(4096)
    x = np.clip(np.round((0.4 * np.sin(2 * np.pi * 0.013 * t)
                          + 0.05 * rng.standard_normal(4096)) * 32768),
                -32768, 32767).astype(np.int16)
    up = np.interp(np.arange(8192) / 2.0, np.arange(4096), x.astype(np.float64))
    up16 = np.round(up).astype(np.int16)
    other = np.clip(np.round(0.3 * np.sin(2 * np.pi * 0.029 * t) * 32768),
                    -32768, 32767).astype(np.int16)
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [1, 2, 3],
        "content": [M.encode_wav(x, 8000), M.encode_wav(up16, 16000),
                    M.encode_wav(other, 8000)],
    }))
    out = {r["clip_id"]: r for r in audio_curate(df, target_rate=8000).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]      # matched after resample
    assert {out[1]["dedup_keep"], out[2]["dedup_keep"]} == {True, False}
    assert out[3]["dedup_keep"] and out[3]["cluster_id"] != out[1]["cluster_id"]


def _photo_bmp(seed, h=64, w=64):
    import numpy as np

    from duckdb_vss_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    low = rng.uniform(30, 225, size=(8, 8, 3))
    img = np.clip(
        np.round(M._resize_kernel(low, w, h, "bilinear")), 0, 255
    ).astype(np.uint8)
    return M.encode_bmp(img), img


def test_image_curate_flags_dedup_and_store_loop(spark, tmp_path):
    """Flag-don't-drop over an image corpus: a corrupt blob fails the
    decode gate, a tracking pixel fails the dims gate, a JPEG re-encode
    of a kept image clusters with it (one canonical); batch 2 then
    near-dups against batch 1's committed pHashes without re-decoding
    history, and the kept thumbnails are valid JPEGs."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.index.image_store import ImageHashStore
    from duckdb_vss_spark.operators import multimodal as M
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from duckdb_vss_spark.pipelines import image_curate

    bmp0, img0 = _photo_bmp(1)
    bmp1, _ = _photo_bmp(2)
    bmp2, _ = _photo_bmp(3)
    rows = [
        (0, bmp0),
        (1, bmp1),
        (2, bmp2),
        (100, encode_jpeg(img0, quality=75)),      # re-encode of image 0
        (200, b"not an image at all"),             # decode failure
        (300, _photo_bmp(4, h=8, w=8)[0]),         # tracking pixel: dims gate
    ]
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": [r[0] for r in rows], "content": [r[1] for r in rows]}))
    st = ImageHashStore.create(spark, str(tmp_path / "istore"))
    out = {r["image_id"]: r for r in
           image_curate(df, store=st, snapshot="b0").collect()}
    assert len(out) == 6                                     # never drops rows
    assert not out[200]["ok"] and "Error" in out[200]["decode_err"]
    assert not out[200]["quality_keep"] and not out[200]["image_keep"]
    assert out[300]["ok"] and not out[300]["quality_keep"]   # 8x8 < 32x32
    assert {out[0]["dedup_keep"], out[100]["dedup_keep"]} == {True, False}
    assert out[0]["cluster_id"] == out[100]["cluster_id"]
    for i in (1, 2):
        assert out[i]["quality_keep"] and out[i]["image_keep"]
    assert not out[0]["dup_of_store"]                        # empty store at match
    # kept thumbnails decode as real JPEGs at the requested size
    th = decode_jpeg(bytes(out[1]["thumb"]))
    assert th.shape == (64, 64, 3)
    # the snapshot committed only kept images' hashes
    committed = st.info()["snapshots"][-1]
    kept_ids = {i for i, r in out.items() if r["image_keep"]}
    assert committed["n_images"] == len(kept_ids)
    # batch 2: a PNG of image 1 (cross-format) + a fresh image
    png1 = M.encode_png(decode_jpeg(encode_jpeg(
        np.asarray(
            M._decode_image_bytes(bmp1), dtype=np.uint8
        ), quality=90)))
    b2 = spark.createDataFrame(pd.DataFrame({
        "image_id": [500, 501],
        "content": [png1, _photo_bmp(9)[0]],
    }))
    out2 = {r["image_id"]: r for r in
            image_curate(b2, store=st, snapshot="b1").collect()}
    assert out2[500]["dup_of_store"] and not out2[500]["image_keep"]
    assert not out2[501]["dup_of_store"] and out2[501]["image_keep"]
    assert st.info()["snapshots"][-1]["n_images"] == 1       # only the fresh one


def test_image_curate_quality_signal_gates(spark):
    """min_contrast/min_entropy gate flat synthetic fills out via the
    fused-pass stats (no second decode); signal columns ride the output."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators import multimodal as M
    from duckdb_vss_spark.pipelines import image_curate

    flat = M.encode_bmp(np.full((48, 48, 3), 200, dtype=np.uint8))
    photo = _photo_bmp(41, 48, 48)[0]
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": [1, 2], "content": [photo, flat]}))
    out = {r["image_id"]: r for r in
           image_curate(df, min_contrast=2.0, min_entropy=1.0).collect()}
    assert out[1]["quality_keep"] and out[1]["image_keep"]
    assert not out[2]["quality_keep"] and not out[2]["image_keep"]
    assert out[2]["entropy"] == 0.0 and out[2]["contrast"] < 1e-5
    assert out[1]["entropy"] > 3.0
    # without the gates the stats columns are absent and flat passes
    out2 = {r["image_id"]: r for r in image_curate(df).collect()}
    assert "entropy" not in out2[1].asDict()
    assert out2[2]["quality_keep"]


def _vid_frames(seed, n=8):
    import numpy as np

    from duckdb_vss_spark.operators import multimodal as M

    out = []
    for k in range(n):
        rng = np.random.default_rng(seed * 100 + k)
        low = rng.uniform(30, 225, size=(8, 8, 3))
        out.append(np.clip(
            np.round(M._resize_kernel(low, 48, 48, "bilinear")), 0, 255
        ).astype(np.uint8))
    return out


def test_video_curate_flags_dedup_and_store_loop(spark, tmp_path):
    """The video recipe completes the modality set: mixed GIF+AVI decode,
    min-frames/dims gates, corrupt-blob quarantine, offset-vote dedup
    (delayed harsher re-encode clusters with its original), and the
    incremental store loop — each clip container-decoded exactly once."""
    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.index.video_store import VideoFingerprintStore
    from duckdb_vss_spark.operators.gif import encode_gif
    from duckdb_vss_spark.operators.video import encode_avi_mjpeg
    from duckdb_vss_spark.pipelines import video_curate

    rows = [(i, encode_avi_mjpeg(_vid_frames(i), quality=85)) for i in range(3)]
    shifted = _vid_frames(9)[:2] + _vid_frames(0)[:6]
    rows.append((100, encode_avi_mjpeg(shifted, quality=60)))  # near-dup of 0
    pal = (np.arange(8)[:, None] * np.array([37, 59, 83])[None, :] % 256).astype(np.uint8)
    gif_frames_ = [pal[(np.add.outer(np.arange(36), np.arange(40)) + f) % 8]
                   for f in range(4)]
    rows.append((200, encode_gif(gif_frames_, delays_cs=[4] * 4)))  # mixed container
    rows.append((300, b"not a video"))                              # decode failure
    rows.append((400, encode_avi_mjpeg(_vid_frames(5)[:1], quality=85)))  # 1 frame
    df = spark.createDataFrame(pd.DataFrame({
        "clip_id": [r[0] for r in rows], "content": [r[1] for r in rows]}))
    st = VideoFingerprintStore.create(spark, str(tmp_path / "vstore"))
    out = {r["clip_id"]: r for r in
           video_curate(df, min_matches=5, store=st, snapshot="b0").collect()}
    assert len(out) == 7                                   # flag-don't-drop
    assert not out[300]["decode_ok"] and not out[300]["video_keep"]
    assert out[400]["decode_ok"] and not out[400]["quality_keep"]  # min_frames
    assert out[200]["decode_ok"] and out[200]["n_frames"] == 4     # GIF decoded
    assert out[200]["quality_keep"] and out[200]["video_keep"]
    assert {out[0]["dedup_keep"], out[100]["dedup_keep"]} == {True, False}
    assert out[0]["cluster_id"] == out[100]["cluster_id"]
    for i in (1, 2):
        assert out[i]["video_keep"]
    kept = {i for i, r in out.items() if r["video_keep"]}
    assert st.info()["snapshots"][-1]["n_clips"] == len(kept)
    # batch 2: a fresh re-encode of kept clip 1 + a brand-new clip
    b2 = spark.createDataFrame(pd.DataFrame({
        "clip_id": [500, 501],
        "content": [encode_avi_mjpeg(_vid_frames(1), quality=60),
                    encode_avi_mjpeg(_vid_frames(7), quality=85)],
    }))
    out2 = {r["clip_id"]: r for r in
            video_curate(b2, min_matches=5, store=st, snapshot="b1").collect()}
    assert out2[500]["dup_of_store"] and not out2[500]["video_keep"]
    assert not out2[501]["dup_of_store"] and out2[501]["video_keep"]
    assert st.info()["snapshots"][-1]["n_clips"] == 1


def test_image_text_pairs_prefetch_recipe(spark):
    """LAION front half: one flagged candidate pair per <img>; caption
    token gates, declared-dims gate (undeclared passes), normalized-URL
    keep-first dedup across pages, flag-don't-drop."""
    from duckdb_vss_spark.pipelines import image_text_pairs

    h1 = (
        "<body>"
        "<img src='http://cdn.io/a.jpg?utm_source=x' alt='a red fox jumping' width='300' height='200'>"
        "<img src='http://cdn.io/icon.png' alt='menu icon that is small' width='16' height='16'>"
        "<img src='http://cdn.io/b.jpg' alt='ok'>"                      # 1 token
        "<img src='http://cdn.io/c.jpg'>"                               # no alt
        "<img src='http://cdn.io/d.jpg' alt='tall building at night'>"  # no dims: passes
        "</body>"
    )
    # page 2 links the SAME asset a.jpg (different tracking param) + a fresh one
    h2 = (
        "<body>"
        "<img src='http://cdn.io/a.jpg?utm_campaign=y' alt='same red fox'>"
        "<img src='http://cdn.io/e.jpg' alt='mountain lake panorama'>"
        "</body>"
    )
    df = spark.createDataFrame(
        [(1, h1), (2, h2)], "doc_id long, html string"
    )
    rows = {(r["doc_id"], r["img_idx"]): r
            for r in image_text_pairs(df, min_width=32, min_height=32).collect()}
    assert len(rows) == 7                                  # every <img> flagged
    a1 = rows[(1, 0)]
    assert a1["img_url_norm"] == "http://cdn.io/a.jpg"     # tracking param gone
    assert a1["caption_ok"] and a1["size_ok"] and a1["pair_keep"]
    assert not rows[(1, 1)]["size_ok"]                     # declared 16x16
    assert not rows[(1, 2)]["caption_ok"]                  # 1 token < 2
    assert not rows[(1, 3)]["caption_ok"]                  # no alt
    d = rows[(1, 4)]
    assert d["size_ok"] and d["pair_keep"]                 # undeclared dims pass
    # cross-page URL dedup: page 2's a.jpg normalizes to the same key
    a2 = rows[(2, 0)]
    assert a2["img_url_norm"] == "http://cdn.io/a.jpg"
    assert a1["url_canonical"] and not a2["url_canonical"]
    assert not a2["pair_keep"]
    assert rows[(2, 1)]["pair_keep"]


def test_image_text_curate_postfetch_full_chain(spark):
    """LAION back half (round 11): candidate pairs ⋈ fetched bytes →
    image_curate → pair-level verdict. Fetch failures flag, pHash dedup
    catches the same image under a different URL (which URL dedup
    cannot), real post-fetch dims override the declared-dims gate, and
    pair_keep becomes the full-chain verdict."""
    import numpy as np

    from duckdb_vss_spark.operators.jpeg import encode_jpeg
    from duckdb_vss_spark.operators.multimodal import _resize_kernel, encode_bmp
    from duckdb_vss_spark.pipelines import image_text_curate, image_text_pairs

    def photo(seed, w=48, h=40):
        rng = np.random.default_rng(seed)
        low = rng.uniform(30, 225, size=(8, 8, 3))
        return np.clip(np.round(_resize_kernel(low, w, h, "bilinear")), 0, 255).astype(np.uint8)

    h1 = (
        "<body>"
        "<img src='http://cdn.io/a.jpg?utm_source=x' alt='a red fox jumping'>"
        "<img src='http://cdn.io/b.jpg' alt='broken download here'>"
        "<img src='http://cdn.io/c.jpg' alt='never fetched image'>"
        "<img src='http://cdn.io/d.jpg' alt='same fox other url'>"
        "<img src='http://cdn.io/e.jpg' alt='tiny tracking pixel'>"
        "</body>"
    )
    pairs = image_text_pairs(
        spark.createDataFrame([(1, h1)], "doc_id long, html string"))
    img_a = photo(1)
    fetched = spark.createDataFrame(
        [("http://cdn.io/a.jpg", bytearray(encode_bmp(img_a))),
         ("http://cdn.io/b.jpg", bytearray(b"not an image")),   # fetched, undecodable
         # same pixels as a.jpg under a different URL: pHash dedup target
         ("http://cdn.io/d.jpg", bytearray(encode_jpeg(img_a, quality=85))),
         ("http://cdn.io/e.jpg", bytearray(encode_bmp(photo(7, 8, 8)))),  # tiny
         ("http://cdn.io/x.jpg", None)],                        # failed fetch
        "url string, content binary",
    )
    out = {r["img_url_norm"]: r for r in
           image_text_curate(pairs, fetched, min_width=16, min_height=16).collect()}
    assert len(out) == 5                                    # flag-don't-drop
    a = out["http://cdn.io/a.jpg"]
    assert a["fetched_ok"] and a["img_decode_ok"] and a["img_quality_keep"]
    assert (a["img_width"], a["img_height"]) == (48, 40)    # REAL dims
    assert a["img_dedup_keep"] and a["pair_keep"]           # the one survivor
    b = out["http://cdn.io/b.jpg"]
    assert b["fetched_ok"] and not b["img_decode_ok"] and not b["pair_keep"]
    c = out["http://cdn.io/c.jpg"]
    assert not c["fetched_ok"] and c["img_decode_ok"] is None and not c["pair_keep"]
    d = out["http://cdn.io/d.jpg"]
    assert d["img_decode_ok"] and d["img_quality_keep"]
    assert not d["img_dedup_keep"] and not d["pair_keep"]   # lost to a.jpg
    assert d["img_cluster_id"] == "http://cdn.io/a.jpg"     # same pHash cluster
    e = out["http://cdn.io/e.jpg"]
    assert e["img_decode_ok"] and not e["img_quality_keep"] and not e["pair_keep"]
    # the pre-fetch verdict stays reconstructable from its own flags
    assert all(r["caption_ok"] and r["size_ok"] and r["url_canonical"]
               for r in out.values())


@pytest.mark.slow  # opt-in: heavy steady-state/property tier (see pytest.ini)
def test_image_text_curate_store_loop(spark, tmp_path):
    """The LAION loop's cross-batch half: batch 2's re-fetch of a batch-1
    image under a BRAND-NEW URL (URL dedup blind) is caught by the
    ImageHashStore history and its pair drops as dup_of_store."""
    import numpy as np

    from duckdb_vss_spark.index.image_store import ImageHashStore
    from duckdb_vss_spark.operators.jpeg import encode_jpeg
    from duckdb_vss_spark.operators.multimodal import _resize_kernel, encode_bmp
    from duckdb_vss_spark.pipelines import image_text_curate, image_text_pairs

    def photo(seed):
        rng = np.random.default_rng(seed)
        low = rng.uniform(30, 225, size=(8, 8, 3))
        return np.clip(np.round(_resize_kernel(low, 48, 40, "bilinear")),
                       0, 255).astype(np.uint8)

    st = ImageHashStore.create(spark, str(tmp_path / "itstore"))
    p1 = image_text_pairs(spark.createDataFrame(
        [(1, "<img src='http://a.io/x.bmp' alt='first batch image'>")],
        "doc_id long, html string"))
    f1 = spark.createDataFrame(
        [("http://a.io/x.bmp", bytearray(encode_bmp(photo(3))))],
        "url string, content binary")
    out1 = image_text_curate(p1, f1, min_width=16, min_height=16,
                             store=st, snapshot="b0").collect()[0]
    assert out1["pair_keep"] and not out1["dup_of_store"]
    assert st.manifest["n_images"] == 1
    # batch 2: same pixels re-encoded under a fresh URL + a new image
    p2 = image_text_pairs(spark.createDataFrame(
        [(2, "<img src='http://b.io/y.jpg' alt='same pixels new url'>"
             "<img src='http://b.io/z.bmp' alt='genuinely new image'>")],
        "doc_id long, html string"))
    f2 = spark.createDataFrame(
        [("http://b.io/y.jpg", bytearray(encode_jpeg(photo(3), quality=85))),
         ("http://b.io/z.bmp", bytearray(encode_bmp(photo(9))))],
        "url string, content binary")
    out2 = {r["img_url_norm"]: r for r in image_text_curate(
        p2, f2, min_width=16, min_height=16, store=st, snapshot="b1").collect()}
    y = out2["http://b.io/y.jpg"]
    assert y["dup_of_store"] and not y["pair_keep"]          # history caught it
    z = out2["http://b.io/z.bmp"]
    assert not z["dup_of_store"] and z["pair_keep"]
    assert st.manifest["n_images"] == 2                       # only z committed
