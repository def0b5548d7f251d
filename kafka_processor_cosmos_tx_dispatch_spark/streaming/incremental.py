"""Incremental materialized-view maintenance over a stream.

Each micro-batch's partial aggregate is MERGEd (full-outer join +
coalesce — the same algebra as queries.q_merge_upsert) into a parquet
state table. Partial sums are kept DECIMAL end-to-end: decimal addition
is associative-exact, so any micro-batch split of the input reproduces
the one-shot batch aggregate bit-for-bit. This is the broker-free analog
of a Kafka Streams KTable materialization (reference
TopologyProducer.kt routes statelessly; this is the stateful pattern the
reference lacks), and the row algebra under every lakehouse MERGE sink.

Scale: state and delta shuffle on the group key once per batch; state
versions rotate under the scratch dir (a real deployment points this at
a table format and gains file-level pruning; the driver never holds
rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_DEC = "decimal(22,2)"  # re-cast after every merge: keeps the type
# fixed-point instead of growing 22,2 → 23,2 → … toward the 38 cap


def incremental_decimal_merge(
    stream: DataFrame,
    state_dir: str,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Run `stream` to completion (availableNow), maintaining per-`key`
    (count, decimal-sum of `value_col`) state across micro-batches.
    Returns the final state: (key, n_events, total_value: double)."""
    latest: dict = {"path": None, "v": 0}

    def merge_batch(bdf: DataFrame, _bid: int) -> None:
        agg = bdf.groupBy(key).agg(
            F.count(F.lit(1)).alias("an"),
            F.sum(F.col(value_col).cast("decimal(12,2)"))
            .cast(STATE_DEC)
            .alias("atv"),
        )
        if latest["path"] is not None:
            prev = bdf.sparkSession.read.parquet(latest["path"])
            merged = prev.join(agg, key, "full_outer").select(
                key,
                (
                    F.coalesce(F.col("pn"), F.lit(0))
                    + F.coalesce(F.col("an"), F.lit(0))
                ).alias("pn"),
                (
                    F.coalesce(F.col("ptv"), F.lit(0).cast(STATE_DEC))
                    + F.coalesce(F.col("atv"), F.lit(0).cast(STATE_DEC))
                )
                .cast(STATE_DEC)
                .alias("ptv"),
            )
        else:
            merged = agg.select(
                key, F.col("an").alias("pn"), F.col("atv").alias("ptv")
            )
        v = latest["v"] + 1
        path = os.path.join(state_dir, f"v{v}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, v=v)
        if prev_path is not None:
            # v{n} is fully committed — prune v{n-1} so state is bounded
            # at one version, not O(batches) copies. Local-fs removal
            # here; a cluster deployment points state at a table format
            # whose commit protocol handles retention instead.
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        # a partial state table is NOT the aggregate — fail loudly rather
        # than silently returning an undercount
        q.stop()
        raise TimeoutError(
            "incremental_decimal_merge: stream did not finish within 300s; "
            "state is partial"
        )
    spark = stream.sparkSession
    if latest["path"] is None:
        return spark.createDataFrame(
            [], f"{key} long, n_events long, total_value double"
        )
    return spark.read.parquet(latest["path"]).select(
        key,
        F.col("pn").alias("n_events"),
        F.col("ptv").cast("double").alias("total_value"),
    )
