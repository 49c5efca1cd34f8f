"""Graph operators for dedup-cluster resolution: connected components over
a pair list, and the end-to-end near-duplicate clustering that turns
pairwise matches into keep/drop decisions.

The dedup operators (:mod:`.dedup`) emit *pairs*; a pipeline needs
*clusters* — if A~B and B~C, all three are one duplicate group even though
(A, C) was never emitted, and exactly one representative should survive.
That closure is a connected-components problem.

Spark-first design:

- **Min-label propagation** over DataFrames: each node's label becomes the
  min of its own and its neighbors' labels, iterated to fixpoint. Every
  iteration is one join + one partial-aggregated groupBy — the textbook
  scalable formulation (GraphX/GraphFrames use the same shape). Iteration
  count is bounded by the component *diameter*, and near-dup components are
  dense (banded candidates within a bucket form cliques), so diameters are
  small; ``max_iter`` guards pathological chains.
- **``localCheckpoint`` between iterations** truncates the lineage — an
  iterative DataFrame loop otherwise re-plans an exponentially growing tree
  (the classic Spark iterative-algorithm trap).
- The final component id is the component's minimum node id — deterministic
  on any cluster size, so the canonical-doc choice is reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters", "pagerank"]

# Salt-bucket count for pagerank's deterministic two-level contribution
# fold: per-reducer array size is bounded by in_deg / PAGERANK_FOLD_BUCKETS,
# so a 10^8-in-link hub folds ~10^5-entry arrays instead of one 10^8 one.
# The duckdb oracle twin must bucket with the same constant.
PAGERANK_FOLD_BUCKETS = 1024


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected graph given as an edge list.
    Returns (node, comp) with ``comp`` = min node id in the component; only
    nodes appearing in an edge are returned (callers left-join and coalesce
    to cover singletons).

    Min-label propagation with pointer jumping: each round takes the min
    over neighbor labels (one hash-join + min-aggregate, both shuffling
    on node id with map-side combine), then replaces every label with its
    label's label — the path-halving step that turns O(diameter) rounds
    into O(log diameter). Converged when no label shrinks; if ``max_iter``
    is exhausted before convergence a warning is emitted, since unmerged
    labels would silently split one true component into several.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    adj = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # adj is referenced by EVERY iteration's join; without materialization
    # the whole upstream pair plan (often an expensive banded dedup join)
    # re-executes once per round — measured 35 s -> 13 s on the 100k-image
    # curate (round 10) — and localCheckpoint also truncates the lineage
    # (plan size otherwise multiplies ~4x per round: the exponential
    # iterative-planning trap). Round 12: the checkpoints turn LAZY
    # (eager=True paid one driver action per frame purely to
    # materialize; now the first convergence count materializes
    # everything in the same job), and adj is hash-partitioned by the
    # join key first, so every round's adj-side Exchange is replaced by
    # the checkpoint's preserved partitioning.
    # ONE exchange instead of two (round 13): the edge dedup used to run
    # distinct() (Exchange on (a, b)) and THEN repartition(b) (a second
    # full Exchange of the deduped list). hashpartitioning(b) satisfies
    # the dedup aggregate's ClusteredDistribution([a, b]) — equal (a, b)
    # rows share b, so they co-locate — which means dropDuplicates AFTER
    # the b-repartition dedups in place and the planner inserts no second
    # exchange: the edge list crosses the wire once, already laid out for
    # every iteration's join.
    adj = (
        adj.repartition(F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=False)
    )
    # fused init: label = min(self, neighbors) — the same single shuffle
    # the old distinct() init paid, but one propagation step ahead, so
    # the dense near-dup graphs this loop sees (star/clique components
    # from the banded candidate joins) converge one full round earlier.
    # Every label is still a node id of the same component, which the
    # pointer jump below requires.
    comp = (
        adj.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__mb"))
        .select("node", F.least(F.col("node"), F.col("__mb")).alias("comp"))
    )
    converged = False
    for _ in range(max_iter):
        nbr = (
            adj.join(comp, adj["b"] == comp["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = comp.join(nbr, "node", "left").select(
            "node",
            F.col("comp").alias("old"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))).alias("comp"),
        )
        # pointer jump: comp <- label(comp). Every label is itself a node
        # id, so the self-join always resolves; labels only shrink.
        lbl = stepped.select(F.col("node").alias("lnode"), F.col("comp").alias("lcomp"))
        jumped = (
            stepped.join(lbl, stepped["comp"] == lbl["lnode"], "left")
            .select(
                "node",
                "old",
                F.coalesce(F.col("lcomp"), F.col("comp")).alias("comp"),
            )
        )
        # ONE driver action per round: the (lazy) checkpoint truncates
        # the lineage and the full count materializes it AND decides
        # convergence — the previous shape paid two actions per round
        # (eager checkpoint + a limit-1 count).
        jumped = jumped.localCheckpoint(eager=False)
        changed = jumped.filter(F.col("comp") < F.col("old")).count()
        comp = jumped.select("node", "comp")
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: max_iter={max_iter} exhausted before "
            "convergence; labels may split one true component into several. "
            "Raise max_iter (rounds needed ~ log2(diameter) with pointer "
            "jumping).",
            RuntimeWarning,
            stacklevel=2,
        )
    return comp


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve pairwise near-duplicate matches into clusters: every row of
    ``df`` gains ``cluster_id`` (min id of its duplicate group; its own id
    if unmatched) and ``is_canonical`` (the survivor flag — exactly one per
    cluster). ``pairs`` is any dedup operator's output (MinHash/SimHash/
    n-gram/embedding pairs all share the (id_a, id_b) shape)."""
    comp = connected_components(pairs, src, dst, max_iter)
    out = (
        df.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("comp")
        .withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))
    )
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list — the classic link-authority
    signal a web-curation pipeline ranks crawl domains/hosts by (the
    Common-Crawl-style complement to :mod:`.web`'s per-domain caps: budget
    goes to authoritative domains first).

    GraphX ``staticPageRank`` semantics (the unnormalized fixed-iteration
    variant): ranks start at 1.0 and iterate
    ``r(v) = (1 - damping) + damping * sum_{u->v} r(u) / out_deg(u)``;
    dangling nodes contribute nothing (no global redistribution term), and
    parallel edges each carry a contribution, exactly like counting them
    in the degree. Returns ``(id, rank DOUBLE)`` over every node appearing
    as a source or destination.

    Scale shape: per iteration, ONE join of the rank table onto the edge
    list (both keyed by source — AQE broadcasts the rank side while it
    fits, e.g. a domain graph against a page-level edge list) and ONE
    aggregation shuffle keyed by destination; ``localCheckpoint`` after
    each iteration truncates the replanning lineage (the iterative-loop
    trap, same as :func:`connected_components`). Per-destination
    contributions fold deterministically so the double sums — and
    therefore every downstream iteration — are bit-stable across engines
    and partitionings, per the cross-engine float discipline.

    Hub-node skew: a web hub can carry 10^7–10^8 in-links; materializing
    its full in-edge contribution list on one reducer (a naive
    ``collect_list`` keyed by destination) OOMs exactly on the operator's
    declared use case. The fold is therefore TWO-LEVEL and still
    bit-stable: contributions salt into ``PAGERANK_FOLD_BUCKETS`` buckets
    by a deterministic hash of the source (shared md5-based ``hash64``, so
    the duckdb twin buckets identically), each bucket folds its
    contributions in source order, then the per-destination result folds
    the bucket sums in bucket order. Both folds run in defined order, so
    the association tree — and the resulting double — is a pure function
    of the edge multiset; per-reducer array size is bounded by
    ``in_deg / PAGERANK_FOLD_BUCKETS``.
    """
    if iters < 1:
        raise ValueError("pagerank requires iters >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("pagerank requires 0 < damping < 1")
    reset = 1.0 - damping
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = (
        e.select(F.col("__src").alias("id"))
        .unionByName(e.select(F.col("__dst").alias("id")))
        .distinct()
    )
    # lazy checkpoints (round 12): both frames are shared RDDs across
    # every iteration's plan, so they materialize once inside the first
    # consuming job — eager=True only added two driver-blocking actions
    nodes = nodes.localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    ed = e.join(deg, "__src")  # (src, dst, out_deg) — static across iterations
    ed = ed.localCheckpoint(eager=False)
    from ..functions.text import hash64

    bkt = F.pmod(hash64(F.col("__src").cast("string"), seed="prb:"), PAGERANK_FOLD_BUCKETS)
    for it in range(iters):
        contrib = ed.join(
            ranks.select(F.col("id").alias("__src"), "rank"), "__src"
        ).select(
            "__dst",
            "__src",
            bkt.alias("__b"),
            (F.col("rank") / F.col("__deg").cast("double")).alias("__c"),
        )
        bucketed = (
            contrib.groupBy("__dst", "__b")
            .agg(F.sort_array(F.collect_list(F.struct("__src", "__c"))).alias("__cs"))
            .select(
                "__dst",
                "__b",
                F.aggregate("__cs", F.lit(0.0), lambda acc, s: acc + s["__c"]).alias("__bs"),
            )
        )
        summed = (
            bucketed.groupBy("__dst")
            .agg(F.sort_array(F.collect_list(F.struct("__b", "__bs"))).alias("__bss"))
            .select(
                F.col("__dst").alias("id"),
                F.aggregate("__bss", F.lit(0.0), lambda acc, s: acc + s["__bs"]).alias("__s"),
            )
        )
        ranks = nodes.join(summed, "id", "left").select(
            "id",
            (F.lit(reset) + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))).alias("rank"),
        )
        if it < iters - 1:
            # truncate lineage between iterations only; the final result
            # keeps its plan (inspectable, and no extra materialization)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
