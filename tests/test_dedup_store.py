"""MinHashStore: incremental cross-snapshot dedup artifact."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark import oracle as O
from duckdb_vss_spark.index.dedup_store import MinHashStore


@pytest.fixture()
def store_root():
    with tempfile.TemporaryDirectory(prefix="mhstore_") as d:
        yield d + "/store"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "spark shuffles data between executors when wide dependencies appear in plans"),
    (3, "completely unrelated text about cooking pasta with garlic and olive oil"),
]
NEW = [
    # exact copy of doc 1 -> est_jaccard 1.0
    (101, "the quick brown fox jumps over the lazy dog near the river bank today"),
    # light edit of doc 2 -> high but < 1.0
    (102, "spark shuffles data between executors when wide dependencies appear in query plans"),
    # fresh text -> no match
    (103, "a brand new document mentioning neither foxes nor executors at all whatsoever"),
]


def test_lifecycle_and_matching(spark, store_root):
    st = MinHashStore.create(spark, store_root, num_perm=16, bands=4)
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", snapshot="cc-2026-01")
    assert st.info()["n_docs"] == 3

    m = MinHashStore.open(spark, store_root).match_against(
        _mk(spark, NEW), "text", "doc_id", threshold=0.5
    )
    hits = {(r["id"], r["store_id"]): r["est_jaccard"] for r in m.collect()}
    assert hits[(101, 1)] == 1.0
    assert all(r[0] != 103 for r in hits)
    snaps = {r["snapshot"] for r in m.collect()}
    assert snaps == {"cc-2026-01"}


def test_append_accumulates_and_name_collision(spark, store_root):
    st = MinHashStore.create(spark, store_root)
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    st.append_snapshot(_mk(spark, [(10, BASE[2][1])]), "text", "doc_id", "s2")
    assert st.info()["n_docs"] == 4
    with pytest.raises(ValueError, match="already in store"):
        st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    # doc 3's copy now matches across snapshots
    m = st.match_against(_mk(spark, [(200, BASE[2][1])]), "text", "doc_id")
    got = {(r["id"], r["store_id"], r["snapshot"]) for r in m.collect()}
    assert (200, 3, "s1") in got and (200, 10, "s2") in got


def test_empty_store_and_flagging(spark, store_root):
    st = MinHashStore.create(spark, store_root)
    assert st.match_against(_mk(spark, NEW), "text", "doc_id").count() == 0
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    flagged = st.flag_batch(_mk(spark, NEW), "text", "doc_id")
    f = {r["doc_id"]: r["dup_of_store"] for r in flagged.collect()}
    assert f[101] is True and f[103] is False
    assert flagged.count() == 3  # flag, don't drop


def test_create_guard_and_overwrite(spark, store_root):
    MinHashStore.create(spark, store_root)
    with pytest.raises(ValueError, match="already exists"):
        MinHashStore.create(spark, store_root)
    MinHashStore.create(spark, store_root, overwrite=True)
    with pytest.raises(ValueError):
        MinHashStore.create(spark, store_root, num_perm=16, bands=5, overwrite=True)


def test_matches_duckdb_estimator(spark, ddb, store_root):
    """Cross-engine: store old = even docs of the sf0.001 fixture, match odd
    docs; duckdb recomputes signatures for both halves and the same
    agreement estimator."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    st = MinHashStore.create(spark, store_root, num_perm=16, bands=4)
    st.append_snapshot(docs.filter("doc_id % 2 = 0"), "text", "doc_id", "old")
    got = sorted(
        (r["id"], r["store_id"], round(r["est_jaccard"], 9))
        for r in st.match_against(
            docs.filter("doc_id % 2 = 1"), "text", "doc_id", threshold=0.5
        ).collect()
    )
    h1, h2 = O.sql_shingle_hash_halves("text", 3)
    sql = f"""
        WITH sig AS MATERIALIZED (
          SELECT doc_id, doc_id % 2 = 0 AS old,
                 {O.sql_minhash_from_halves('h1s', 'h2s', 16)} AS sig
          FROM (SELECT doc_id, {h1} AS h1s, {h2} AS h2s FROM documents)
        ),
        banded AS (
          SELECT doc_id, old, b,
                 {O.sql_hash64("array_to_string(list_transform(sig[b*4+1:b*4+4], x -> x::VARCHAR), ',')")} AS bucket
          FROM sig, range(0, 4) r(b)
        ),
        cand AS (
          SELECT DISTINCT n.doc_id AS id, o.doc_id AS store_id
          FROM banded n JOIN banded o USING (b, bucket)
          WHERE NOT n.old AND o.old
        )
        SELECT * FROM (
          SELECT id, store_id,
                 list_sum(list_transform(range(1, 17),
                          i -> CASE WHEN sn.sig[i] = so.sig[i] THEN 1 ELSE 0 END)) / 16.0 AS est
          FROM cand JOIN sig sn ON sn.doc_id = id JOIN sig so ON so.doc_id = store_id
        ) WHERE est >= 0.5
    """
    want = sorted((r[0], r[1], round(r[2], 9)) for r in ddb.execute(sql).fetchall())
    assert got == want


def test_drop_snapshot_and_vacuum(spark, store_root):
    st = MinHashStore.create(spark, store_root)
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    st.append_snapshot(_mk(spark, [(10, BASE[0][1])]), "text", "doc_id", "s2")
    assert st.info()["n_docs"] == 4
    st.drop_snapshot("s1")
    assert st.info()["n_docs"] == 1
    # matches now come only from the surviving snapshot
    m = st.match_against(_mk(spark, [(100, BASE[0][1])]), "text", "doc_id")
    assert {(r["store_id"], r["snapshot"]) for r in m.collect()} == {(10, "s2")}
    # a reopened handle sees the drop (manifest is the commit point)
    assert MinHashStore.open(spark, store_root).info()["n_docs"] == 1
    with pytest.raises(ValueError, match="not in store"):
        st.drop_snapshot("s1")
    deleted = st.vacuum()
    assert deleted == ["snap-000000"]
    # store still fully functional after vacuum
    assert st.match_against(_mk(spark, [(100, BASE[0][1])]), "text", "doc_id").count() == 1


def test_empty_snapshot_commits(spark, store_root):
    """A batch where every row was filtered (all dups of history) still
    commits an empty snapshot — the crash found by the 500k crawl-ingest
    measurement (partitioned write of 0 rows leaves no readable files)."""
    st = MinHashStore.create(spark, store_root)
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    st.append_snapshot(_mk(spark, []), "text", "doc_id", "s2")
    info = st.info()
    assert [s["name"] for s in info["snapshots"]] == ["s1", "s2"]
    assert info["snapshots"][-1]["n_docs"] == 0 and info["n_docs"] == 3
    # store still fully functional: reads skip the fileless snapshot dir
    m = st.match_against(_mk(spark, [(9, BASE[0][1])]), "text", "doc_id")
    assert m.count() == 1
    assert MinHashStore.open(spark, store_root).info()["n_docs"] == 3


def test_append_snapshot_reraises_read_errors(spark, store_root, monkeypatch):
    """A transient read failure AFTER a write that provably produced data
    files must propagate, not silently commit n_docs=0 (which would make
    _store_df skip the snapshot's fingerprints forever — ADVICE r5)."""
    import pyspark.sql.readwriter as rw

    st = MinHashStore.create(spark, store_root)
    orig = rw.DataFrameReader.parquet

    def boom(self, *paths, **kw):
        if any("snap-" in str(p) for p in paths):
            raise RuntimeError("transient fs failure")
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", boom)
    with pytest.raises(RuntimeError, match="transient fs failure"):
        st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    monkeypatch.undo()
    # nothing committed: the ledger has no entry, a retry succeeds cleanly
    assert st.info()["snapshots"] == []
    st.append_snapshot(_mk(spark, BASE), "text", "doc_id", "s1")
    assert st.info()["snapshots"][-1]["n_docs"] == 3
