"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship k-NN join on sf0.001;
``queries()`` / ``oracle_sql()`` pair every implemented operator from
SURVEY.md §2 with an ANSI-SQL duckdb oracle at sf0.01.

Numeric convention shared by both sides: distances are computed in DOUBLE
(duckdb ``list_*(x::DOUBLE[])``; Spark double-precision expressions) and the
emitted score is cast to FLOAT, so the f32 round-trip absorbs last-ulp
accumulation differences and the value hashes agree exactly.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_vss_spark import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    knn_join_flat,
    min_by_k,
    topk,
)
from duckdb_vss_spark.operators.knn import knn_match

# Deterministic 64-dim query vector with exactly-representable components, so
# the literal means the same thing in Spark and in duckdb SQL.
Q64 = [((i * 7) % 16) / 16.0 for i in range(64)]
Q64_SQL = "[" + ",".join(str(x) for x in Q64) + "]::DOUBLE[]"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_vss_spark.deploy import ensure_shipped

    ensure_shipped(spark)  # driver-created sessions: make pkg importable on executors
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: k-NN join (10 probes x all embeddings, k=3) at sf0.001."""
    emb = _emb(spark, "/root/testdata/sf0.001")
    probes = emb.filter(F.col("vec_id") < 10)
    return knn_join_flat(
        probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id"
    ).select("qid", "rid", F.col("rnk").cast("long").alias("rnk"), F.col("score").cast("float").alias("score"))


# ---------------------------------------------------------------------------
# queries: one entry per implemented operator (SURVEY §2)
# ---------------------------------------------------------------------------


def _q_topk_l2(spark, sf_dir):
    """Q1 exact path: ORDER BY array_distance LIMIT k (SURVEY §2.2 Q1)."""
    return topk(_emb(spark, sf_dir), "embedding", Q64, 10, "l2sq", tiebreak="vec_id").select(
        "vec_id", F.col("score").cast("float").alias("score")
    )


def _q_topk_cosine(spark, sf_dir):
    """Q1 with cosine metric: max-similarity top-k (SURVEY §1.3)."""
    return topk(_emb(spark, sf_dir), "embedding", Q64, 10, "cosine", tiebreak="vec_id").select(
        "vec_id", F.col("score").cast("float").alias("score")
    )


def _q_topk_ip(spark, sf_dir):
    """Q1 with inner-product metric (SURVEY §1.3)."""
    return topk(_emb(spark, sf_dir), "embedding", Q64, 10, "ip", tiebreak="vec_id").select(
        "vec_id", F.col("score").cast("float").alias("score")
    )


def _q_cosine_distance_canonical(spark, sf_dir):
    """Q6 canonicalization surface: 1 - cosine_similarity == cosine_distance
    (reference: src/hnsw/hnsw_optimize_expr.cpp:17-70)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select(
            "vec_id",
            (F.lit(1.0) - array_cosine_similarity("embedding", Q64)).cast("float").alias("cos_dist"),
        )
        .orderBy("cos_dist", "vec_id")
        .limit(10)
    )


def _q_minby_topk(spark, sf_dir):
    """Q2: min_by(col, dist, k) top-k aggregate (SURVEY §2.2 Q2)."""
    emb = _emb(spark, sf_dir)
    return min_by_k(emb, "vec_id", array_distance("embedding", Q64), 5, tiebreak="vec_id").select(
        F.col("values").alias("knn_ids")
    )


def _q_knn_join(spark, sf_dir):
    """Q3/Q4: k-NN join, flat (qid, rid, rnk, score) output (SURVEY §2.2 Q3-Q4)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 20)
    return knn_join_flat(
        probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id"
    ).select("qid", "rid", F.col("rnk").cast("long").alias("rnk"), F.col("score").cast("float").alias("score"))


def _q_knn_join_ip(spark, sf_dir):
    """Q4 with ip metric (max-polarity, reference: src/hnsw/hnsw_index_macros.cpp:23-28)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 10)
    return knn_join_flat(
        probes, emb, "embedding", "embedding", 3, "ip", left_id="vec_id", right_id="vec_id"
    ).select("qid", "rid", F.col("rnk").cast("long").alias("rnk"), F.col("score").cast("float").alias("score"))


def _q_knn_match_ids(spark, sf_dir):
    """Q5 vss_match shape: per probe the ordered list of matched ids."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 10)
    flat = knn_join_flat(probes, emb, "embedding", "embedding", 3, "l2sq", left_id="vec_id", right_id="vec_id")
    return flat.groupBy("qid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("rnk").alias("k"), F.col("rid").alias("r")))),
            lambda e: e["r"],
        ).alias("match_ids")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_topk_l2": _q_topk_l2,
        "q02_topk_cosine": _q_topk_cosine,
        "q03_topk_ip": _q_topk_ip,
        "q04_cosine_canonical": _q_cosine_distance_canonical,
        "q05_minby_topk": _q_minby_topk,
        "q06_knn_join": _q_knn_join,
        "q07_knn_join_ip": _q_knn_join_ip,
        "q08_knn_match": _q_knn_match_ids,
    }


def oracle_sql() -> dict[str, str]:
    dist = f"list_distance(embedding::DOUBLE[], {Q64_SQL})"
    cos = f"list_cosine_similarity(embedding::DOUBLE[], {Q64_SQL})"
    ip = f"list_inner_product(embedding::DOUBLE[], {Q64_SQL})"
    knn_flat = """
        WITH j AS (
          SELECT q.vec_id AS qid, i.vec_id AS rid,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {score_expr} {dirn}, i.vec_id
                 ) AS rnk,
                 {score_expr}::FLOAT AS score
          FROM embeddings q, embeddings i
          WHERE q.vec_id < {nprobe}
        )
        SELECT qid, rid, rnk, score FROM j WHERE rnk <= 3
    """
    return {
        "q01_topk_l2": f"SELECT vec_id, {dist}::FLOAT AS score FROM embeddings ORDER BY score, vec_id LIMIT 10",
        "q02_topk_cosine": f"SELECT vec_id, {cos}::FLOAT AS score FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        "q03_topk_ip": f"SELECT vec_id, {ip}::FLOAT AS score FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
        "q04_cosine_canonical": (
            f"SELECT vec_id, (1.0 - {cos})::FLOAT AS cos_dist FROM embeddings ORDER BY cos_dist, vec_id LIMIT 10"
        ),
        "q05_minby_topk": f"SELECT (list(vec_id ORDER BY {dist}, vec_id))[1:5] AS knn_ids FROM embeddings",
        "q06_knn_join": knn_flat.format(
            dirn="ASC",
            nprobe=20,
            score_expr="list_distance(q.embedding::DOUBLE[], i.embedding::DOUBLE[])",
        ),
        "q07_knn_join_ip": knn_flat.format(
            dirn="DESC",
            nprobe=10,
            score_expr="list_inner_product(q.embedding::DOUBLE[], i.embedding::DOUBLE[])",
        ),
        "q08_knn_match": """
            WITH j AS (
              SELECT q.vec_id AS qid, i.vec_id AS rid,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_distance(q.embedding::DOUBLE[], i.embedding::DOUBLE[]) ASC, i.vec_id
                     ) AS rnk
              FROM embeddings q, embeddings i
              WHERE q.vec_id < 10
            )
            SELECT qid, (list(rid ORDER BY rnk))[1:3] AS match_ids FROM j WHERE rnk <= 3 GROUP BY qid
        """,
    }
