"""Shared shell for iterative (multi-round) DataFrame algorithms.

Two concerns every Pregel-shaped loop here has (connected components,
PageRank):

1. Lineage truncation — each round must materialize, or round N's plan
   nests N copies of the update step.
2. Plan-statistics reset — Spark 4's Dataset.checkpoint/localCheckpoint
   preserves the child plan's ESTIMATED Statistics on the resulting
   LogicalRDD (originStats). A round plan that joins the previous
   round's checkpoint k times makes the sizeInBytes estimate a PRODUCT
   of its inputs' estimates, so the preserved BigInt gains ~k× more
   digits every round; by round ~12 the optimizer spends minutes inside
   BigInteger multiplication in the size-only stats visitor (observed:
   0.3 s rounds degrading 4-6× per round to 180 s+, driver pinned in
   BigInteger.multiplyToomCook3). Rebuilding the DataFrame from the
   already-materialized InternalRow RDD resets stats to the session
   default and keeps every round O(1).

Checkpoint durability: `reliable=True` uses `df.checkpoint()` (requires
`spark.sparkContext.setCheckpointDir(...)`; survives executor loss — the
right mode for 1000-executor runs). `reliable=False` uses
`localCheckpoint` (executor-memory-resident: cheapest, but an executor
loss fails the job — fine for short local runs). `resolve_reliable`
auto-selects by whether a checkpoint dir is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def strip_plan_stats(df: DataFrame) -> DataFrame:
    """Rebuild a MATERIALIZED DataFrame as a fresh LogicalRDD without
    the inherited originStats (see module docstring).

    What the strip costs (r5 ADVICE investigation, pinned by
    tests/test_iterative.py): NOT partitioning — under AQE (our default)
    Dataset.checkpoint captures outputPartitioning from a non-final
    AdaptiveSparkPlan, which reports UnknownPartitioning(0), so a
    checkpointed side re-shuffles in a keyed join with or without the
    strip; the per-round edge exchange in the iterative operators is
    inherent to AQE-era checkpoints, not introduced here. What strip=True
    DOES lose is the checkpoint's honest statistics (the rebuilt
    LogicalRDD estimates at the session default). Right for PER-ROUND
    state — whose preserved stats compound super-linearly (module
    docstring) — wrong for STATIC relations checkpointed once, which is
    why materialize(strip=False) exists."""
    jdf = df._jdf
    jspark = df.sparkSession._jsparkSession
    fresh = jspark.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh, df.sparkSession)


def resolve_reliable(spark: SparkSession, reliable: bool | None) -> bool:
    if reliable is None:
        return spark.sparkContext.getCheckpointDir() is not None
    return reliable


def materialize(df: DataFrame, reliable: bool, strip: bool = True) -> DataFrame:
    """Eager checkpoint (reliable or local) + stats reset — the one
    driver action per loop round. strip=False keeps the checkpoint's
    preserved partitioning AND its plan statistics: correct only for
    relations materialized ONCE outside the loop (stats preserved from a
    loop-round plan compound round-over-round, see strip_plan_stats)."""
    ck = df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)
    return strip_plan_stats(ck) if strip else ck
