"""Graph operators over edge DataFrames.

The reference has no graph surface (its only dataflow is stateless
routing, TopologyProducer.kt:84-202); these are LLM-pipeline / analytics
extensions in the Pregel shape: each round is one edges⋈ranks equi-join
plus a dst-keyed aggregation — the formulation that partitions by node
key and survives any edge count.

Shared by queries.graph_pagerank (oracle-checked against unrolled CTEs)
and tools/scale_probe.py (throughput at 50× bench scale) so the measured
plan and the verified plan cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # 10^12 fixed-point rank units


def pagerank(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Fixed-point PageRank (damping 0.85) over `edges(src, dst)`.

    All arithmetic is int64 floor division — contribution
    (85·r) DIV (100·outdeg), teleport (15·SCALE) DIV (100·N) — so ranks
    are exact integers: no float accumulation order to diverge between
    engines or runs. Dangling-node mass is not redistributed (documented
    simplification). For deep `rounds` the loop needs checkpoint
    truncation exactly like operators/dedup.py:connected_components
    (a handful of rounds doesn't). Returns (node, r).
    """
    # edges/nodes/outd are referenced in EVERY round — without lineage
    # truncation Spark recomputes the caller's upstream plan (a join +
    # distinct for the purchase graph) once per reference. Same
    # localCheckpoint pattern as operators/dedup.connected_components.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{RANK_SCALE} DIV n").alias("r")
    )
    teleport = f"{15 * RANK_SCALE // 100} DIV n"
    for _ in range(rounds):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outd, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * r) DIV (100 * d)").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.expr(teleport) + F.coalesce(F.col("inflow"), F.lit(0))
                ).alias("r"),
            )
        )
    return ranks
