"""Catalyst physical-plan shape assertions — the Spark analog of the
reference's EXPLAIN tests (SURVEY §5 technique 1): prove that the plans we
*intend* (partial top-k, parquet pushdown, column pruning, broadcast joins,
whole-stage codegen) are the plans Catalyst actually produces. These are
the properties that make the operators scale; a regression here is a
performance bug even when results stay correct."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_vss_spark import array_distance, topk

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_topk_plans_take_ordered(emb):
    """ORDER BY dist LIMIT k must plan as TakeOrderedAndProject (per-partition
    partial top-k, no global sort, no shuffle of the full table)."""
    q = [0.1] * 64
    plan = _physical(topk(emb, "embedding", q, 10, "l2sq", tiebreak="vec_id"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # a global sort would be wrong


def test_filter_and_projection_pushdown(spark):
    """Filter + column selection must reach the parquet scan: PushedFilters
    non-empty and ReadSchema limited to the referenced columns."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _physical(df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # pruned


def test_small_dim_join_broadcasts(spark):
    """Dim-table join must plan as BroadcastHashJoin, not a shuffle join."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").filter(F.col("c_mktsegment") == "BUILDING")
    j = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    plan = _physical(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_distance_expr_stays_in_codegen(emb):
    """The JVM distance expression must not fall back to a Python UDF
    (BatchEvalPython / ArrowEvalPython in the plan would mean row-at-a-time
    or batch Python in the hot path of every exact-path query)."""
    df = emb.select(array_distance("embedding", [0.0] * 64).alias("d"))
    plan = _physical(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_knn_join_flat_has_no_items_shuffle(emb):
    """The broadcast-kernel k-NN join shuffles only the tiny candidate set
    (window on qid), never the items table: exactly one shuffle Exchange
    below the window, fed by MapInPandas output."""
    from duckdb_vss_spark import knn_join_flat

    probes = emb.filter(F.col("vec_id") < 5)
    df = knn_join_flat(probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id")
    plan = _physical(df)
    assert "MapInPandas" in plan
    # exactly one hash-partition exchange in the whole plan (the qid window
    # over the tiny candidate set); the items scan feeds MapInPandas directly
    assert plan.count("Exchange hashpartitioning") == 1


def test_exact_dedup_single_shuffle(spark):
    """exact_dedup = one hash exchange (the fingerprint window), no more."""
    from duckdb_vss_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(exact_dedup(docs, "text", "doc_id"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_candidate_scan_prunes_partitions(spark, tmp_path):
    """The index candidate scan must read ONLY the probed inverted lists:
    list_id is a directory-partition key, so the isin filter becomes a
    PartitionFilter (the mechanism that makes ef_search a real work knob —
    at 100 TB probing 3 of 1024 lists reads ~0.3% of the artifact)."""
    from duckdb_vss_spark import VSSEngine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = VSSEngine(spark, index_root=str(tmp_path))
    eng.register_table("emb_prune", emb)
    eng.create_index("prune_idx", "emb_prune", "embedding", "vec_id")
    idx = eng.catalog.get("prune_idx")
    cand = idx.candidates(spark, [0.1] * 64, ef_search=16)
    # pruning now happens at path-selection time for small probe sets (the
    # scan is built from the probed list_id= dirs only) and via Catalyst
    # PartitionFilters for large ones — assert the property itself: the
    # scan's input files live ONLY under probed list dirs, and not all dirs
    import re

    got = {int(re.search(r"list_id=(\d+)", f).group(1)) for f in cand.inputFiles()}
    probed = set(idx.probe_lists([0.1] * 64, idx.nprobe_for(16)))
    assert got and got <= probed
    assert len(got) < len(idx._existing_list_ids())
    # the large-probe path must still prune via Catalyst partition filters
    big = idx.data_df(spark, idx.probe_lists([0.1] * 64, idx.nlist - 1))
    pf = _physical(big).split("PartitionFilters:")[1].splitlines()[0]
    assert "list_id" in pf


def test_aggregate_is_partial_then_final(spark):
    """groupBy aggregates must map-side combine (partial_ functions before
    the exchange) — the difference between shuffling rows and shuffling
    groups at 100 TB."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _physical(agg)
    assert "partial_sum" in plan


def test_tpch_q6_scan_is_minimal(spark):
    """The q30 entry query (TPC-H Q6 shape) must compile to a single narrow
    stage whose scan carries every predicate in PushedFilters and reads only
    the 4 referenced columns — at 100 TB this is the difference between
    scanning ~35% of one column group and scanning the table."""
    import __spark_entry__ as entrymod

    plan = _physical(entrymod.queries()["q26_tpch_q6"](spark, SF))
    assert "PushedFilters: [" in plan
    for pred in ("l_shipdate", "l_discount", "l_quantity"):
        assert pred in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_returnflag" not in read_schema and "l_orderkey" not in read_schema
    # global agg over a filtered scan: one partial, one final, one exchange
    assert plan.count("Exchange") == 1


def test_embedding_neardup_has_no_cartesian(emb):
    """The default embedding near-dup path must be the bucketed epsilon-join:
    candidates flow through the (cell, cell) pair table via hash joins — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    from duckdb_vss_spark.operators.dedup import embedding_neardup_pairs

    plan = _physical(embedding_neardup_pairs(emb, "embedding", "vec_id", 0.4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_has_no_distinct_exchange(spark):
    """Pair dedup happens inside the band join (first-agreeing-band filter),
    so the plan must contain no aggregate-for-distinct after the join: the
    only exchanges are the signature groupBy and the band-bucket join sides."""
    from duckdb_vss_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(simhash_pairs(docs, "text", "doc_id", 3, 4))
    post_join = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan.split("Join")[0]
    # a distinct() would plan HashAggregate(keys=[id_a, id_b, hamming...])
    assert "keys=[id_a" not in plan


def test_winnow_is_map_only(spark):
    """Winnowing is map-only: gram hashes materialize once at the Arrow
    boundary and the sliding minima + per-doc dedupe run in the numpy
    kernel — no Window operator, and no Exchange beyond the narrow-input
    fan-out (none at all when the input is already at cluster width)."""
    from duckdb_vss_spark.operators.dedup import winnow_fingerprint_rows

    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(par)
    plan = _physical(winnow_fingerprint_rows(docs, "text", "doc_id"))
    assert plan.count("Exchange") == 1  # only the test's own repartition
    assert "Window" not in plan


def test_indexed_join_large_probe_side_never_cartesian(spark, tmp_path_factory):
    """Probe sides past the broadcast limit take the distributed cell-cogroup
    plan: cogrouped Arrow stages, no CartesianProduct / BroadcastNestedLoop
    anywhere (the pre-round-5 fallback was an O(|probes| x |index|) cross
    join — the plan shape this test permanently forbids)."""
    from duckdb_vss_spark import VSSEngine
    from duckdb_vss_spark.operators.knn import knn_join_flat_indexed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    eng = VSSEngine(spark, index_root=str(tmp_path_factory.mktemp("djplan")))
    eng.register_table("e", emb)
    eng.create_index("djp_idx", "e", "embedding", "vec_id", replace=True)
    idx = eng.catalog.get("djp_idx")
    plan = _physical(
        knn_join_flat_indexed(
            emb, idx, "embedding", 5, "vec_id", ef_search=8, broadcast_probe_limit=10
        )
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan


def test_url_ops_are_map_only(spark):
    """normalize_url + registered_domain must compile to pure projections:
    zero Exchanges, inside whole-stage codegen, no Python eval."""
    from duckdb_vss_spark.operators.web import normalize_url, parse_url_parts, registered_domain

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.concat(F.lit("https://a."), F.col("source"), F.lit(".com/x")).alias("url")
    )
    df = registered_domain(
        parse_url_parts(normalize_url(docs, "url", out_col="n"), "n", prefix="p_"), "p_host"
    )
    plan = _physical(df)
    assert "Exchange" not in plan
    assert "*(" in plan  # codegen regions present (the giant normalize
    # expression itself may fall back to interpreted Project — still
    # map-only JVM, which is the property that matters)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_heavy_hitters_exact_partial_agg_and_take_ordered(spark):
    """Default heavy_hitters: map-side partial aggregation (two HashAggregate
    levels) and TakeOrderedAndProject — never a global sort of the vocab."""
    from duckdb_vss_spark.operators.profile import heavy_hitters

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _physical(heavy_hitters(docs, "text", k=10))
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_shuffle_shard_writer_single_exchange(spark):
    """The shard-writer plan: exactly one Exchange (the repartition on the
    shard id); ordering comes from sortWithinPartitions, not a global sort."""
    from duckdb_vss_spark.operators.sampling import _hash_of

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    h = _hash_of("doc_id", "shard:")
    df = (
        docs.withColumn("shard", F.pmod(h, F.lit(8)).cast("int"))
        .withColumn("shuffle_key", h)
        .repartition(8, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", "doc_id")
    )
    plan = _physical(df)
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan


def test_minhash_store_match_text_never_shuffles(spark, tmp_path):
    """The store match moves band rows (band, bucket, id, sig) — the batch's
    TEXT column must not appear in any Exchange."""
    from duckdb_vss_spark.index.dedup_store import MinHashStore

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    st = MinHashStore.create(spark, str(tmp_path / "s"))
    st.append_snapshot(docs.filter("doc_id % 2 = 0"), "text", "doc_id", "h")
    m = st.match_against(docs.filter("doc_id % 2 = 1"), "text", "doc_id")
    plan = _physical(m)
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "text" not in first_line, first_line


def test_sq_scan_prunes_vec_column(spark, tmp_path):
    """The SQ8 approximate scan must read ONLY (id, sq) from parquet — the
    f32 vec column stays out of the hot scan (the compression is a
    column-pruning story, same assertion as the PQ path)."""
    from duckdb_vss_spark import VSSEngine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = VSSEngine(spark, index_root=str(tmp_path / "sqp"))
    eng.register_table("e", emb)
    eng.create_index("sqp", "e", "embedding", "vec_id", options={"quantization": "i8"}, replace=True)
    idx = eng.catalog.get("sqp")
    plan = _physical(idx.search(spark, [0.1] * 64, 5))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    approx_scans = [ln for ln in scan_lines if "sq:binary" in ln]
    assert approx_scans, scan_lines
    assert all("vec" not in ln.split("ReadSchema:")[1] for ln in approx_scans)


def test_b1_scan_prunes_vec_column(spark, tmp_path):
    """The binary (b1) approximate scan must read ONLY (id, b1) from
    parquet — ceil(dim/64)*8 bytes/row in the hot scan, the 32x
    column-pruning story (same assertion as the PQ/SQ paths)."""
    from duckdb_vss_spark import VSSEngine

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng = VSSEngine(spark, index_root=str(tmp_path / "b1p"))
    eng.register_table("e", emb)
    eng.create_index("b1p", "e", "embedding", "vec_id", options={"quantization": "b1"}, replace=True)
    idx = eng.catalog.get("b1p")
    plan = _physical(idx.search(spark, [0.1] * 64, 5))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    approx_scans = [ln for ln in scan_lines if "b1:binary" in ln]
    assert approx_scans, scan_lines
    assert all("vec" not in ln.split("ReadSchema:")[1] for ln in approx_scans)


@pytest.mark.slow  # opt-in: heavy steady-state/property tier (see pytest.ini)
def test_embedding_neardup_prunes_on_clustered_data(spark):
    """r7 verdict task 6: on data WITH cluster structure (the near-dup use
    case) the epsilon-join's triangle-inequality bound must strictly prune
    the cell-pair grid — only same-cluster cell pairs are admissible — and
    the pruned join must still be exact vs the all-pairs method. (The
    companion uniform-fixture test pins the 100%-admissible warning path.)"""
    import warnings

    from duckdb_vss_spark.operators.dedup import embedding_neardup_pairs

    # 4 orthogonal unit clusters in 64-dim with small deterministic noise:
    # centers pairwise |ci - cj| = sqrt(2), noise radius ~0.1 << the
    # threshold radius r = sqrt(2*(1-0.9)) ~ 0.45
    rows = []
    for i in range(400):
        c = i % 4
        v = [0.0] * 64
        v[c] = 1.0
        for j in range(4):
            v[4 + (i * 7 + j * 13) % 60] += (((i * 31 + j * 17) % 21) - 10) / 100.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the ineffective-pruning warning must NOT fire
        got = embedding_neardup_pairs(
            df, "embedding", "vec_id", threshold=0.9, prune_stats=stats
        ).collect()
    assert stats["nlist"] > 1
    # strict pruning: well under half the cell-pair grid is admissible
    assert stats["admissible_frac"] < 0.5, stats
    # and exactness survives the pruning
    want = embedding_neardup_pairs(df, "embedding", "vec_id", threshold=0.9, method="exact").collect()
    key = lambda rows: sorted((r["id_a"], r["id_b"]) for r in rows)
    assert key(got) == key(want) and len(want) > 0


def test_curate_corpus_plan_shape(spark):
    """The composed recipe's single plan must keep each stage's scale
    contract: no cartesian anywhere, and the decontamination probe joins
    the benchmark gram set broadcast (the training side never shuffles
    against the benchmark)."""
    from duckdb_vss_spark.pipelines import curate_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = curate_corpus(
        docs, bench=bench, quality_threshold=0.5, strata_col="lang", pack_budget=512
    )
    plan = _physical(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the bench gram probe


def test_image_curate_bytes_never_join_shuffled(spark):
    """Round-11 VERDICT #3 pin: image_curate's fused passthrough kernel
    attaches phash/thumb/dims to the original bytes MAP-SIDE — the recipe
    must not join the byte-carrying input against the kernel output on id
    (that sort-merge exchange shipped the corpus bytes across the cluster
    in round 10). The only Exchange allowed to carry a byte column is the
    single cluster-id attach join (narrow comp frame — AQE converts it to
    a broadcast at runtime when comp is small)."""
    import re

    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import encode_bmp
    from duckdb_vss_spark.pipelines import image_curate

    rng = np.random.default_rng(0)
    rows = [(i, encode_bmp(rng.integers(0, 255, size=(24, 24, 3)).astype(np.uint8)))
            for i in range(8)]
    df = spark.createDataFrame(pd.DataFrame(
        {"image_id": [r[0] for r in rows], "content": [r[1] for r in rows]}))
    out = image_curate(df)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    byte_exchanges = [
        nd for nd in re.split(r"\n\(\d+\) ", plan)
        if nd.split("\n")[0].startswith("Exchange")
        and "hashpartitioning" in nd          # join shuffles; the _fan_out
        and ("content#" in nd or "thumb#" in nd)  # width repartition is RoundRobin
    ]
    # round 11 pinned EXACTLY one byte-carrying hash Exchange (the
    # cluster-id attach); round 12's lazy-checkpoint label frame lets
    # the planner BROADCAST the labels instead, so the ideal is now ZERO
    # — the contract stays "at most the one attach exchange"
    assert len(byte_exchanges) <= 1, plan
    # and the byte frame is produced by ONE fused kernel pass, not joined
    # back to a second scan of the input (node-entry count: AQE repeats
    # the join in the tree and Initial Plan text sections)
    joins = [nd for nd in re.split(r"\n\(\d+\) ", plan)
             if nd.split("\n")[0].startswith("SortMergeJoin")]
    assert len(joins) <= 1, plan


def test_video_curate_bytes_and_pixels_never_shuffled(spark):
    """Round-11 pin, video edition: the fused fingerprint kernel decodes
    and hashes inside the batch — no exploded pixel table may appear in
    the plan at all, and the only Exchange carrying the clip byte column
    is the single cluster-id attach join (the round-10 shape persisted
    W*H*4 floats per frame and sort-merge-joined the bytes against the
    per-clip meta aggregate)."""
    import re

    import numpy as np
    import pandas as pd

    from duckdb_vss_spark.operators.video import encode_avi_mjpeg
    from duckdb_vss_spark.pipelines import video_curate

    rng = np.random.default_rng(5)
    def clip(seed):
        return encode_avi_mjpeg(
            [rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
             for _ in range(3)], quality=70)
    df = spark.createDataFrame(pd.DataFrame(
        {"clip_id": list(range(6)), "content": [clip(s) for s in range(6)]}))
    out = video_curate(df, min_width=16, min_height=16, min_matches=2)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "pixels" not in plan, plan
    byte_exchanges = [
        nd for nd in re.split(r"\n\(\d+\) ", plan)
        if nd.split("\n")[0].startswith("Exchange")
        and "hashpartitioning" in nd
        and "content#" in nd
    ]
    # same contract as the image pin above: at most the one attach
    # exchange (zero when the label frame broadcasts — round 12)
    assert len(byte_exchanges) <= 1, plan


def test_connected_components_adj_single_exchange(spark):
    """Round-13 pin: the CC edge-list preparation (union of both edge
    directions -> dedup -> layout by the join key) must pay exactly ONE
    Exchange. hashpartitioning(b) satisfies the dedup aggregate's
    ClusteredDistribution([a, b]) — equal (a, b) rows share b — so the
    dropDuplicates after the b-repartition must not plan a second
    exchange (the pre-r13 shape paid distinct() on (a, b) AND then the
    repartition: two full passes of the edge list over the wire)."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (1, 2)], "id_a long, id_b long"
    )
    und = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    adj = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    plan = adj._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # and the result is the correct undirected deduped edge set
    got = sorted((r["a"], r["b"]) for r in adj.collect())
    assert got == [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4)]
