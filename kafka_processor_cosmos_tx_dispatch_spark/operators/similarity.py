"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force top-k: query-set × corpus join with in-row fixed-point
  cosine, then window top-k. The query side is small → broadcast; the
  corpus streams through one narrow stage. This is the exact baseline and
  scales to any corpus size with a bounded query set.
- LSH-bucketed ANN: sign-random-projection buckets (deterministic integer
  LCG hyperplanes) turn the cross product into an equi-join on bucket id —
  the scale path when the query set is itself huge. Recall < 1 by design.

All dot products use functions/vectors.py fixed-point accumulation, so
results are bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V


def _with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__norm", V.norm_sq_fixed(F.col(vec_col)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries must be small (it's broadcast). Output: query_id, neighbor_id,
    cos_sim, rank — deterministic tiebreak on neighbor_id.
    """
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    c = _with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    scored = joined.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_planes: int = 4,
    k: int = 5,
) -> DataFrame:
    """ANN: only score candidates in the query's LSH bucket.

    With b planes, the corpus splits into 2^b buckets; the join is an
    equi-join on bucket id — per-query work drops 2^b× at the cost of
    recall. At 100 TB you'd also multi-probe neighboring buckets; the
    bucket-join skeleton is identical.
    """
    q = _with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    q = q.withColumn("bucket", V.lsh_bucket(F.col("q_vec"), dims, n_planes))
    c = _with_norm(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    c = c.withColumn("bucket", V.lsh_bucket(F.col("c_vec"), dims, n_planes))
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    scored = joined.select("query_id", "bucket", "neighbor_id", sim.alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs above a cosine threshold. All-pairs is quadratic — kept
    for exactness at modest corpus sizes; the scale path buckets first
    (see lsh_bucketed_topk) or blocks on a coarse quantization."""
    a = _with_norm(
        corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va")), "va"
    ).withColumnRenamed("__norm", "na")
    b = _with_norm(
        corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb")), "vb"
    ).withColumnRenamed("__norm", "nb")
    joined = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = V.cosine_fixed(
        V.dot_fixed(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
    )
    return (
        joined.select("vec_a", "vec_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
