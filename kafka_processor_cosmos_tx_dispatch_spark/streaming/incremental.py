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


def _scan_state(state_dir: str) -> tuple[int | None, str | None]:
    """Newest COMMITTED state version on disk: (batch_id, path). A
    version counts only with its _SUCCESS marker — a crash mid-write
    leaves no marker and the partial dir is ignored (and later
    overwritten by the replay of the same batch id)."""
    import glob
    import re

    best: tuple[int | None, str | None] = (None, None)
    for p in glob.glob(os.path.join(state_dir, "v*")):
        m = re.fullmatch(r"v(\d+)", os.path.basename(p))
        if m and os.path.exists(os.path.join(p, "_SUCCESS")):
            bid = int(m.group(1))
            if best[0] is None or bid > best[0]:
                best = (bid, p)
    return best


def make_decimal_merge_batch(
    state_dir: str, key: str, value_col: str, latest: dict
):
    """The foreachBatch body, exposed for direct testing (replay
    simulation needs to call it with a repeated batch id).

    EXACTLY-ONCE: state versions are named by BATCH ID (`v{bid}`) and
    `latest` tracks the newest applied one — foreachBatch is
    at-least-once (a failure between the state write and the
    checkpoint commit redelivers the same batch id on restart), so a
    merge body that blindly re-applies double-counts. Replays
    (bid <= applied) are skipped: the ledger makes the at-least-once
    delivery exactly-once in the state. On a fresh call the ledger
    recovers from disk (_scan_state), so restart-replays are caught
    across processes, not just within one run."""

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: already folded into state
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
        path = os.path.join(state_dir, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            # v{bid} is fully committed — prune the prior version so
            # state is bounded at one copy, not O(batches). Local-fs
            # removal here; a cluster deployment points state at a
            # table format whose commit protocol handles retention.
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_decimal_merge(
    stream: DataFrame,
    state_dir: str,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Run `stream` to completion (availableNow), maintaining per-`key`
    (count, decimal-sum of `value_col`) state across micro-batches.
    Returns the final state: (key, n_events, total_value: double).
    Replay-idempotent via the batch-id state ledger
    (make_decimal_merge_batch)."""
    bid, path = _scan_state(state_dir)
    latest: dict = {"path": path, "bid": bid}
    merge_batch = make_decimal_merge_batch(state_dir, key, value_col, latest)

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


def make_scd2_rebuild(
    log_dir: str, hist_dir: str, buckets: int, wrote: dict
):
    """The foreachBatch body of incremental_scd2, exposed for direct
    testing (replay simulation calls it twice with the same batch)."""
    from pyspark.sql import Window as W

    def rebuild(bdf: DataFrame, _bid: int) -> None:
        spark = bdf.sparkSession
        b = bdf.select("user_id", "event_type", "ts", "event_id").withColumn(
            "pb", (F.col("user_id") % buckets).cast("int")
        )
        b.write.mode("append").partitionBy("pb").parquet(log_dir)
        touched = [r["pb"] for r in b.select("pb").distinct().collect()]
        if not touched:
            return
        log = spark.read.parquet(log_dir).filter(F.col("pb").isin(touched))
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        chg = (
            log.withColumn("prev_type", F.lag("event_type").over(w))
            .filter(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type"))
            )
            .select("user_id", "event_type", "ts", "event_id", "pb")
        )
        hist = chg.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
            F.row_number().over(w).alias("version"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            "pb",
        )
        (
            hist.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pb")
            .parquet(hist_dir)
        )
        wrote["any"] = True

    return rebuild


def incremental_scd2(
    stream: DataFrame,
    state_dir: str,
    buckets: int = 16,
) -> DataFrame:
    """Streaming SCD Type-2 maintenance by BUCKET-SCOPED RECOMPUTE: each
    micro-batch appends its raw change events to a bucket-partitioned
    log (bucket = user_id % `buckets`), then rebuilds the SCD2 history
    for ONLY the touched buckets from their complete logs, replacing
    exactly those partitions via dynamic partition overwrite
    (`partitionOverwriteMode=dynamic` — untouched buckets' files are
    never rewritten).

    Why recompute instead of merge: SCD2's collapse-consecutive-runs
    rule is NOT associative — a late row landing between two existing
    changes can resurrect a previously-collapsed duplicate — so
    interval-merging per batch is order-sensitive. Recomputing a bucket
    from its full log is order-INVARIANT: any micro-batch split of the
    input yields identical final history (pinned by
    tests/test_streaming.py), because a bucket's last rebuild sees its
    complete log. Per-batch cost is O(touched buckets' history), not
    O(corpus): the same bound every key-scoped lakehouse backfill has.
    The only driver-side materialization is the ≤`buckets` touched
    bucket ids. Returns the final history (q_scd2_history's columns).

    Replay (foreachBatch at-least-once): a redelivered batch appends
    duplicate rows to the log, and the rebuild ABSORBS them — an exact
    duplicate (same user, ts, event_id, type) sorts adjacent to its
    original under (ts, event_id) and the change filter
    (prev_type != type) drops it, so the recomputed history is
    identical. No batch-id ledger needed here, unlike the decimal
    merge, whose + is not idempotent."""
    log_dir = os.path.join(state_dir, "log")
    hist_dir = os.path.join(state_dir, "hist")
    wrote = {"any": False}
    rebuild = make_scd2_rebuild(log_dir, hist_dir, buckets, wrote)

    q = (
        stream.writeStream.foreachBatch(rebuild)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_scd2: stream did not finish within 300s; "
            "history is partial"
        )
    spark = stream.sparkSession
    if not wrote["any"]:
        return spark.createDataFrame(
            [],
            "user_id long, event_type string, valid_from_us long, "
            "valid_to_us long, version int, is_current boolean",
        )
    return spark.read.parquet(hist_dir).drop("pb")


def make_drift_merge_batch(state_dir: str, bucket_width: float, latest: dict):
    """foreachBatch body of incremental_drift_counts: batch-id-ledgered
    count merge (see make_decimal_merge_batch for the exactly-once
    contract this implements)."""

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: already folded into state
        agg = bdf.groupBy(
            F.floor(F.col("value") / bucket_width).alias("bucket")
        ).agg(
            F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("a_ref"),
            F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("a_cur"),
        )
        if latest["path"] is not None:
            prev = bdf.sparkSession.read.parquet(latest["path"])
            merged = prev.join(agg, "bucket", "full_outer").select(
                "bucket",
                (
                    F.coalesce(F.col("p_ref"), F.lit(0))
                    + F.coalesce(F.col("a_ref"), F.lit(0))
                ).alias("p_ref"),
                (
                    F.coalesce(F.col("p_cur"), F.lit(0))
                    + F.coalesce(F.col("a_cur"), F.lit(0))
                ).alias("p_cur"),
            )
        else:
            merged = agg.select(
                "bucket",
                F.col("a_ref").alias("p_ref"),
                F.col("a_cur").alias("p_cur"),
            )
        path = os.path.join(state_dir, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def make_lsh_dedup_batch(work_dir: str):
    """foreachBatch body of incremental_lsh_dedup: per batch, band-key
    the new documents, pair them against (a) themselves and (b) every
    EARLIER batch's banded keys, and write both the keys and the pairs
    under batch-id-named dirs.

    IDEMPOTENCE WITHOUT A LEDGER: unlike the count merges, every write
    here is `overwrite` into a dir named by batch id and every emitted
    pair is canonicalized (doc_a = least, doc_b = greatest) — so a
    replayed batch rewrites byte-identical keys, and any extra pairs it
    sees (state dirs from later batches now on disk) are duplicates
    that the readout's DISTINCT absorbs. Associativity comes from the
    self-pairs: a pair is either within one batch (caught by the
    self-join) or across two (caught by the keys-state join), so ANY
    micro-batch split of the corpus yields the same global pair set —
    the split-invariance argument the test pins."""
    keys_root = os.path.join(work_dir, "keys")
    pairs_root = os.path.join(work_dir, "pairs")

    def dedup_batch(bdf: DataFrame, bid: int) -> None:
        from ..operators.dedup import _banded_keys

        spark = bdf.sparkSession
        bk = _banded_keys(bdf, "doc_id", "text", 12, 3, 3).localCheckpoint()
        import glob

        prior = [
            p
            for p in glob.glob(os.path.join(keys_root, "b*"))
            if os.path.exists(os.path.join(p, "_SUCCESS"))
            and os.path.basename(p) != f"b{bid}"
        ]
        a, b = bk.alias("a"), bk.alias("b")
        self_pairs = a.join(b, "band_key").filter(
            F.col("a.doc_id") < F.col("b.doc_id")
        )
        pairs = self_pairs.select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        if prior:
            state = spark.read.parquet(*prior)
            cross = bk.join(
                state.withColumnRenamed("doc_id", "old_id"), "band_key"
            ).select(
                F.least("doc_id", "old_id").alias("doc_a"),
                F.greatest("doc_id", "old_id").alias("doc_b"),
            )
            pairs = pairs.unionAll(cross)
        pairs.distinct().write.mode("overwrite").parquet(
            os.path.join(pairs_root, f"b{bid}")
        )
        bk.write.mode("overwrite").parquet(os.path.join(keys_root, f"b{bid}"))

    return dedup_batch


def incremental_lsh_dedup(stream: DataFrame, work_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate maintenance over a DOCUMENT
    stream: each micro-batch is deduplicated against itself and against
    the accumulated corpus band-key state, so the union of per-batch
    outputs equals the one-shot batch pair set under ANY micro-batch
    split — the production crawl-ingest loop (dedup the new batch, keep
    the corpus's banded table for the next one) as Structured Streaming.

    Per-batch cost is O(new · collisions) regardless of corpus size
    (the corpus×corpus term never runs — operators/dedup.py:
    minhash_lsh_pairs_between is the batch twin). No bucket cap here:
    the cap would make results depend on where batch boundaries fall;
    production re-adds it on the state side and accepts the bounded
    approximation (documented trade)."""
    q = (
        stream.writeStream.foreachBatch(make_lsh_dedup_batch(work_dir))
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_lsh_dedup: stream did not finish within 300s"
        )
    spark = stream.sparkSession
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(work_dir, "pairs", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return spark.read.parquet(*outs).distinct()


def make_daily_count_merge_batch(state_dir: str, latest: dict):
    """foreachBatch body of incremental_cusum_daily: batch-id-ledgered
    merge of per-day event counts (the exactly-once contract of
    make_decimal_merge_batch; counts are associative, not idempotent,
    so replays must be skipped, never re-added)."""

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: already folded into state
        agg = bdf.groupBy(F.col("ts").cast("date").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("a_n")
        )
        if latest["path"] is not None:
            prev = bdf.sparkSession.read.parquet(latest["path"])
            merged = prev.join(agg, "day", "full_outer").select(
                "day",
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("a_n"), F.lit(0))
                ).alias("n"),
            )
        else:
            merged = agg.select("day", F.col("a_n").alias("n"))
        path = os.path.join(state_dir, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_cusum_daily(stream: DataFrame, state_dir: str) -> DataFrame:
    """Streaming change-point monitoring: per-day event counts are
    maintained across micro-batches (associative integer merge — any
    split reproduces the one-shot daily histogram exactly), then the
    one-sided CUSUM statistic reads out over the BOUNDED daily series
    with the same R − prefix-min closed form as the batch gate
    (queries.q_changepoint_cusum, same oracle). This is the shape of a
    live ingest monitor: the state that scales with data (raw events)
    is folded down per batch; the unpartitioned window only ever sees
    one row per day.

    Replay-idempotent via the batch-id state ledger, recovered from
    disk on restart (see make_decimal_merge_batch)."""
    bid, path = _scan_state(state_dir)
    latest: dict = {"path": path, "bid": bid}
    merge_batch = make_daily_count_merge_batch(state_dir, latest)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_cusum_daily: stream did not finish within 300s"
        )
    spark = stream.sparkSession
    if latest["path"] is None:
        return spark.createDataFrame(
            [], "day date, n_events long, cusum long"
        )
    from pyspark.sql import Window as W

    daily = spark.read.parquet(latest["path"])
    t = daily.agg(
        F.expr("CAST(SUM(n) DIV COUNT(*) AS BIGINT)").alias("target")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = daily.crossJoin(F.broadcast(t)).withColumn(
        "run", F.sum(F.col("n") - F.col("target")).over(w)
    )
    return r.select(
        "day",
        F.col("n").alias("n_events"),
        (F.col("run") - F.least(F.min("run").over(w), F.lit(0)))
        .cast("long")
        .alias("cusum"),
    )


def incremental_drift_counts(
    stream: DataFrame,
    state_dir: str,
    bucket_width: float = 25.0,
) -> DataFrame:
    """Streaming distribution-drift monitoring: maintain per-bucket
    (n_ref, n_cur) counts across micro-batches (ref/cur = event_id
    parity, standing in for reference-vs-candidate windows). COUNTS ARE
    MERGEABLE — integer addition is associative — so unlike SCD2 this
    state merges per batch with no recompute, and any micro-batch split
    reproduces the one-shot batch histogram exactly. Returns the final
    buckets with the same fixed-point chi-square contribution the batch
    gate (queries.q_drift_chi2) computes; the monitoring loop a curation
    pipeline runs WHILE a crawl lands, not after.

    Replay-idempotent the same way the decimal merge is: count addition
    is associative but NOT idempotent, so state versions are named by
    batch id and the ledger (make_drift_merge_batch, recovered from
    disk on restart) skips redelivered batches."""
    bid, path = _scan_state(state_dir)
    latest: dict = {"path": path, "bid": bid}
    merge_batch = make_drift_merge_batch(state_dir, bucket_width, latest)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_drift_counts: stream did not finish within 300s"
        )
    spark = stream.sparkSession
    if latest["path"] is None:
        return spark.createDataFrame(
            [], "bucket long, n_ref long, n_cur long, chi2_milli long"
        )
    st = spark.read.parquet(latest["path"])
    return st.select(
        "bucket",
        F.col("p_ref").alias("n_ref"),
        F.col("p_cur").alias("n_cur"),
        F.expr(
            "CAST((p_ref - p_cur) * (p_ref - p_cur) * 1000"
            " DIV (p_ref + p_cur) AS BIGINT)"
        ).alias("chi2_milli"),
    )


def make_mixture_schedule_batch(
    state_dir: str, weights: dict, scale: int, latest: dict
):
    """foreachBatch body of incremental_mixture_schedule: stride
    scheduling with CARRIED per-lang counters. Per batch: rank the
    batch's docs per lang by doc_id (the stream's deterministic arrival
    order), offset each rank by the lang's carried count, and emit the
    final schedule key k = (carry + rank) · stride(lang). A document's
    key is assigned ONCE, at arrival, and never revised — which is what
    makes the schedule streamable: the global mixture order is just
    "sort by k", and any ordered micro-batch split of the corpus yields
    byte-identical keys (split-invariance pinned in
    tests/test_streaming.py).

    Exactly-once: the counter state is batch-id-ledgered (v{bid} dirs +
    the `latest` ledger, recovering from disk via _scan_state — counts
    are associative, not idempotent, so replays are SKIPPED like
    make_daily_count_merge_batch); the keyed output is idempotent by
    construction (overwrite into a b{bid}-named dir)."""
    from pyspark.sql import Window as W

    out_root = os.path.join(state_dir, "keyed")
    counts_dir = os.path.join(state_dir, "counts")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(counts_dir)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: keys already written, counts folded
        spark = bdf.sparkSession
        wl = W.partitionBy("lang").orderBy("doc_id")
        ranked = bdf.select(
            "doc_id", "lang", F.row_number().over(wl).alias("r")
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is not None:
            ranked = (
                ranked.join(F.broadcast(carry), "lang", "left")
                .withColumn(
                    "r", F.col("r") + F.coalesce(F.col("seen"), F.lit(0))
                )
                .drop("seen")
            )
        weight = F.coalesce(
            F.create_map(
                *[
                    x
                    for k, v in weights.items()
                    for x in (F.lit(k), F.lit(v))
                ]
            )[F.col("lang")],
            F.lit(1),
        )
        keyed = ranked.select(
            "doc_id",
            "lang",
            (F.col("r") * (F.lit(scale) / weight).cast("long"))
            .cast("long")
            .alias("k"),
        )
        keyed.write.mode("overwrite").parquet(
            os.path.join(out_root, f"b{bid}")
        )
        # full-outer merge with the carried counters: a lang ABSENT from
        # this batch must keep its counter (a left-replace here silently
        # reset absent langs' ranks — caught by the split-invariance
        # test's single-lang middle batch)
        counts = ranked.groupBy("lang").agg(
            F.max("r").cast("long").alias("seen_new")
        )
        if carry is not None:
            counts = carry.join(counts, "lang", "full_outer").select(
                "lang",
                F.coalesce("seen_new", "seen").cast("long").alias("seen"),
            )
        else:
            counts = counts.select(
                "lang", F.col("seen_new").cast("long").alias("seen")
            )
        path = os.path.join(counts_dir, f"v{bid}")
        counts.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_mixture_schedule(
    stream: DataFrame, state_dir: str, weights: dict, scale: int
) -> DataFrame:
    """Deterministic data-mixing schedule maintained over a DOCUMENT
    stream — the streaming twin of queries.sample_mixture_schedule's
    stride scheduling: every arriving document gets its final schedule
    key immediately (per-lang arrival rank × stride), with per-lang
    counters carried across micro-batches, so a training-data loader
    can consume "next by key" while ingest is still running. Per-batch
    cost is the batch's own rank window + a broadcast of the ≤|langs|
    counter table — independent of corpus size; the counter state is
    bounded by the language domain.

    Returns the accumulated keyed table (doc_id, lang, k) after the
    bounded stream drains."""
    q = (
        stream.writeStream.foreachBatch(
            make_mixture_schedule_batch(
                state_dir, weights, scale, {"bid": None, "path": None}
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_mixture_schedule: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(state_dir, "keyed", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame([], "doc_id long, lang string, k long")
    return spark.read.parquet(*outs)


def make_domain_cap_batch(state_dir: str, budget: int, latest: dict):
    """foreachBatch body of incremental_domain_cap: per-source token
    budget enforcement with CARRIED per-source token counters — the
    streaming twin of queries.sample_domain_cap's prefix-quota.

    Per batch: token-count each document (whitespace tokens, the same
    functions/text.py tokenizer as the batch twin), running-sum per
    source in doc_id order (the stream's deterministic arrival order),
    offset by the source's carried total, and ADMIT the document iff
    its cumulative total stays within the budget. The admit decision is
    made ONCE, at arrival, and never revised — prefix semantics: a
    source that crosses its budget stops admitting, exactly like the
    batch window. Tokens of dropped documents still count toward the
    cumulative (that is what makes the decision final and the schedule
    split-invariant: the counter depends only on arrivals, not on
    admissions).

    Exactly-once: counters are batch-id-ledgered (v{bid} dirs + replay
    skip — token totals are associative, not idempotent); admitted rows
    are idempotent by construction (overwrite into b{bid} dirs).

    Scale: per-batch cost is one window over the batch itself plus a
    broadcast of the ≤|sources| counter table — independent of corpus
    size; state is bounded by the source domain, not the data."""
    from pyspark.sql import Window as W

    from ..functions import text as TX

    out_root = os.path.join(state_dir, "admitted")
    counts_dir = os.path.join(state_dir, "counts")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(counts_dir)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: admissions already written
        spark = bdf.sparkSession
        wc = (
            W.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        toks = bdf.select(
            "doc_id",
            "source",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
        ).withColumn("cum_batch", F.sum("n_toks").over(wc))
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is not None:
            toks = (
                toks.join(F.broadcast(carry), "source", "left")
                .withColumn(
                    "cum_toks",
                    F.col("cum_batch") + F.coalesce("seen_toks", F.lit(0)),
                )
                .drop("seen_toks")
            )
        else:
            toks = toks.withColumn("cum_toks", F.col("cum_batch"))
        admitted = toks.filter(F.col("cum_toks") <= budget).select(
            "doc_id", "source", "n_toks", "cum_toks"
        )
        admitted.write.mode("overwrite").parquet(
            os.path.join(out_root, f"b{bid}")
        )
        # full-outer counter merge: a source ABSENT from this batch must
        # keep its counter (same bug class the mixture schedule's
        # split-invariance test caught — a left-replace resets it)
        counts = toks.groupBy("source").agg(
            F.sum("n_toks").cast("long").alias("new_toks")
        )
        if carry is not None:
            counts = carry.join(counts, "source", "full_outer").select(
                "source",
                (
                    F.coalesce("seen_toks", F.lit(0))
                    + F.coalesce("new_toks", F.lit(0))
                )
                .cast("long")
                .alias("seen_toks"),
            )
        else:
            counts = counts.select(
                "source", F.col("new_toks").cast("long").alias("seen_toks")
            )
        path = os.path.join(counts_dir, f"v{bid}")
        counts.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_domain_cap(
    stream: DataFrame, state_dir: str, budget: int
) -> DataFrame:
    """Per-source token-budget quota maintained over a DOCUMENT stream —
    admit each arriving document iff its source's cumulative token count
    (carried across micro-batches) stays within `budget`. The streaming
    twin of queries.sample_domain_cap: any ordered micro-batch split of
    the corpus admits exactly the documents the batch window keeps
    (split-invariance pinned in tests/test_streaming.py).

    Returns the accumulated admitted table
    (doc_id, source, n_toks, cum_toks) after the bounded stream drains."""
    q = (
        stream.writeStream.foreachBatch(
            make_domain_cap_batch(
                state_dir, budget, {"bid": None, "path": None}
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_domain_cap: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(state_dir, "admitted", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame(
            [], "doc_id long, source string, n_toks long, cum_toks long"
        )
    return spark.read.parquet(*outs)


_GAP_OVER_TH_US = 3_600_000_000  # 1 h, matching q_arrival_gaps


def make_arrival_monitor_batch(state_dir: str, latest: dict):
    """foreachBatch body of incremental_arrival_monitor: per-key
    inter-arrival gap statistics (the q_arrival_gaps heartbeat audit)
    maintained over an event stream with carried per-user state
    (last_ts, event count, min/max/sum gap, gap count, >1 h count).

    Per batch: in-batch gaps come from one (ts, event_id)-ordered lag
    window; the BRIDGE gap (carried last_ts → batch's first arrival per
    user) stitches batches together so any ORDERED micro-batch split
    reproduces the batch window's gap sequence exactly — gaps exist
    between consecutive arrivals regardless of where the batch boundary
    falls. The merge is a full-outer join (a user absent from the batch
    keeps state — the domain-cap lesson); min/max fold with
    least/greatest (null-skipping), sum/count add.

    Exactly-once: state versions are batch-id-ledgered (v{bid} dirs +
    replay skip — gap folds are associative, not idempotent).

    Scale: per-batch cost is one user-keyed window over the batch plus
    a state join bounded by |users|; state is one row per user ever
    seen, independent of stream length."""
    from pyspark.sql import Window as W

    state_root = os.path.join(state_dir, "gaps")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(state_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch
        spark = bdf.sparkSession
        wu = W.partitionBy("user_id").orderBy("ts_us", "event_id")
        g = bdf.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        ).withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(wu))
        over = F.sum(
            F.when(F.col("gap_us") > _GAP_OVER_TH_US, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        part = g.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("b_events"),
            F.min("ts_us").alias("b_first_us"),
            F.max("ts_us").alias("b_last_us"),
            F.min("gap_us").alias("b_min"),
            F.max("gap_us").alias("b_max"),
            F.sum("gap_us").alias("b_sum"),
            F.count("gap_us").alias("b_gaps"),
            over.alias("b_over"),
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is None:
            merged = part.select(
                "user_id",
                F.col("b_last_us").alias("last_us"),
                F.col("b_events").cast("long").alias("n_events"),
                F.col("b_min").alias("min_gap_us"),
                F.col("b_max").alias("max_gap_us"),
                F.coalesce("b_sum", F.lit(0)).cast("long").alias("sum_gap_us"),
                F.col("b_gaps").cast("long").alias("n_gaps"),
                F.col("b_over").cast("long").alias("n_gaps_over_1h"),
                F.lit(0).cast("long").alias("n_neg_bridges"),
            )
        else:
            j = carry.join(part, "user_id", "full_outer")
            # bridge gap: carried last arrival → this batch's first
            bridge = F.when(
                F.col("last_us").isNotNull() & F.col("b_first_us").isNotNull(),
                F.col("b_first_us") - F.col("last_us"),
            )
            merged = j.select(
                "user_id",
                F.coalesce("b_last_us", "last_us").alias("last_us"),
                (
                    F.coalesce("n_events", F.lit(0))
                    + F.coalesce("b_events", F.lit(0))
                )
                .cast("long")
                .alias("n_events"),
                F.least("min_gap_us", "b_min", bridge).alias("min_gap_us"),
                F.greatest("max_gap_us", "b_max", bridge).alias("max_gap_us"),
                (
                    F.coalesce("sum_gap_us", F.lit(0))
                    + F.coalesce("b_sum", F.lit(0))
                    + F.coalesce(bridge, F.lit(0))
                )
                .cast("long")
                .alias("sum_gap_us"),
                (
                    F.coalesce("n_gaps", F.lit(0))
                    + F.coalesce("b_gaps", F.lit(0))
                    + F.when(bridge.isNotNull(), F.lit(1)).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_gaps"),
                (
                    F.coalesce("n_gaps_over_1h", F.lit(0))
                    + F.coalesce("b_over", F.lit(0))
                    + F.when(bridge > _GAP_OVER_TH_US, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias("n_gaps_over_1h"),
                # ADVICE r11: the bridge assumes an ORDERED micro-batch
                # split; a late event (batch first < carried last) would
                # silently poison min/sum. Count violations in the fold
                # (zero extra passes) — the drain endpoint fails loud.
                (
                    F.coalesce("n_neg_bridges", F.lit(0))
                    + F.when(bridge < 0, F.lit(1)).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_neg_bridges"),
            )
        path = os.path.join(state_root, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_arrival_monitor(stream: DataFrame, state_dir: str) -> DataFrame:
    """Heartbeat/liveness audit maintained over an event stream — the
    streaming twin of queries.q_arrival_gaps. Returns the final per-user
    gap statistics (same columns/semantics as the batch window query)
    after the bounded stream drains."""
    q = (
        stream.writeStream.foreachBatch(
            make_arrival_monitor_batch(state_dir, {"bid": None, "path": None})
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_arrival_monitor: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    bid, path = _scan_state(os.path.join(state_dir, "gaps"))
    if path is None:
        return spark.createDataFrame(
            [],
            "user_id long, n_events long, min_gap_us long, max_gap_us long,"
            " avg_gap_us long, n_gaps_over_1h long",
        )
    st = spark.read.parquet(path)
    # fail loud on out-of-order input (ADVICE r11): the batch twin
    # q_arrival_gaps sorts within its window and is order-insensitive;
    # this twin's bridge stitching is not — a silent divergence here
    # would corrupt min/sum with negative gaps.
    neg = st.agg(F.sum("n_neg_bridges")).first()[0] or 0
    if neg:
        raise ValueError(
            f"incremental_arrival_monitor: {neg} negative bridge gap(s) — "
            "the source delivered events out of order across micro-batches "
            "(an arrival predates a user's carried last_ts); gap statistics "
            "would be corrupted. Feed an ordered stream or use the batch "
            "q_arrival_gaps audit."
        )
    return st.filter(F.col("n_gaps") > 0).select(
        "user_id",
        "n_events",
        "min_gap_us",
        "max_gap_us",
        F.expr("sum_gap_us DIV n_gaps").alias("avg_gap_us"),
        "n_gaps_over_1h",
    )


def make_heavy_hitter_batch(state_dir: str, k: int, latest: dict):
    """foreachBatch body of incremental_heavy_hitters: carried k-counter
    Misra–Gries sketch over a keyed stream + per-batch count deltas.

    Per batch: (1) the batch's exact per-key partial counts are written
    as an archive delta (the pre-aggregated, mergeable form — each delta
    is bounded by the batch's own distinct keys, never the global
    domain); (2) the carried sketch absorbs the delta with the weighted
    Agarwal et al. merge — full-outer count sum, then if over k keys
    subtract the (k+1)-th largest from everything and drop ≤0. The
    sequential fold keeps the classical MG guarantee: cumulative
    subtracted mass ≤ n_total/(k+1), so any key with global frequency
    above n/(k+1) SURVIVES in the carried sketch at every point in the
    stream — an anytime approximate heavy-hitter answer with a
    deterministic superset guarantee.

    Exactly-once: sketch versions are batch-id-ledgered (replays
    skipped — count folds are associative, not idempotent); deltas are
    idempotent b{bid} overwrites. The sketch never exceeds k rows; no
    driver-side state at all."""
    archive = os.path.join(state_dir, "deltas")
    counts_dir = os.path.join(state_dir, "sketch")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(counts_dir)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return
        spark = bdf.sparkSession
        delta = bdf.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(archive, f"b{bid}")
        )
        delta = spark.read.parquet(os.path.join(archive, f"b{bid}"))
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is not None:
            merged = carry.join(delta, "user_id", "full_outer").select(
                "user_id",
                (
                    F.coalesce(carry["cnt"], F.lit(0))
                    + F.coalesce(delta["cnt"], F.lit(0))
                )
                .cast("long")
                .alias("cnt"),
            )
        else:
            merged = delta
        # weighted MG prune: subtract the (k+1)-th largest count from
        # everything iff the sketch is over capacity (deterministic
        # tiebreak so the cut value is stable across replans)
        cut_stats = (
            merged.orderBy(F.desc("cnt"), F.asc("user_id"))
            .limit(k + 1)
            .agg(
                F.count(F.lit(1)).alias("m"),
                F.min("cnt").alias("mn"),
            )
        )
        pruned = (
            merged.crossJoin(F.broadcast(cut_stats))
            .select(
                "user_id",
                (
                    F.col("cnt")
                    - F.when(F.col("m") > k, F.col("mn")).otherwise(F.lit(0))
                ).alias("cnt"),
            )
            .filter(F.col("cnt") > 0)
        )
        path = os.path.join(counts_dir, f"v{bid}")
        pruned.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_heavy_hitters(
    stream: DataFrame, state_dir: str, k: int = 2048
) -> DataFrame:
    """EXACT heavy hitters (>1.2× mean key frequency) over a bounded
    stream — the streaming twin of queries.q_heavy_hitters_mg: a carried
    Misra–Gries sketch (bounded k state, anytime superset guarantee)
    prunes, then ONE exact recount of the final candidate set against
    the archived per-batch count deltas verifies. The deltas are
    pre-aggregated partials, so the recount is a candidate-semi-joined
    sum over mergeable summaries, never a rescan of raw events; the
    global stats (n, distinct keys) come from the same deltas, exactly.

    Scale: per-batch cost is one keyed partial agg + a ≤k-row sketch
    merge; the final recount shuffles only candidate keys. The answer
    equals the batch query's (and its oracle's) whenever the key domain
    satisfies the same u ≤ 1.2·(k+1) envelope documented there."""
    q = (
        stream.writeStream.foreachBatch(
            make_heavy_hitter_batch(state_dir, k, {"bid": None, "path": None})
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_heavy_hitters: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    import glob

    _, sketch_path = _scan_state(os.path.join(state_dir, "sketch"))
    outs = [
        p
        for p in glob.glob(os.path.join(state_dir, "deltas", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if sketch_path is None or not outs:
        return spark.createDataFrame(
            [], "user_id long, n_events long, rel_freq double"
        )
    cand = spark.read.parquet(sketch_path).select("user_id")
    deltas = spark.read.parquet(*outs)
    stats = deltas.agg(
        F.sum("cnt").alias("n"), F.count_distinct("user_id").alias("u")
    )
    counts = (
        deltas.join(F.broadcast(cand), "user_id", "leftsemi")
        .groupBy("user_id")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") * F.col("u") * F.lit(5) > F.lit(6) * F.col("n"))
        .select(
            "user_id",
            F.col("cnt").alias("n_events"),
            (
                (F.col("cnt") * F.col("u")).cast("double")
                / F.col("n").cast("double")
            ).alias("rel_freq"),
        )
    )


def make_ohlc_merge_batch(state_dir: str, latest: dict):
    """foreachBatch body of incremental_ohlc: per-bucket OHLC partials
    merged across micro-batches. OHLC is the canonical NON-commutative
    aggregate — open/close depend on event order — but it is mergeable
    once the partial carries its extremal ORDER KEYS: each batch
    aggregates min/max of struct(ts, event_id, value) per (bucket,
    type) (struct comparison = lexicographic, so the min struct IS the
    first event and its value the open), and the cross-batch merge is
    just least/greatest of the carried structs plus sum/max/min for
    n/high/low. Any ordered or UNORDERED batch split yields the same
    state — the merge never assumes arrival order.

    Exactly-once: state versions are batch-id-ledgered like every
    incremental operator here (sums are associative, not idempotent)."""
    counts_dir = os.path.join(state_dir, "state")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(counts_dir)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return
        spark = bdf.sparkSession
        part = (
            bdf.select(
                F.unix_timestamp(
                    F.date_trunc("hour", F.col("ts"))
                ).alias("bucket_epoch"),
                "event_type",
                F.struct("ts", "event_id", "value").alias("k"),
                "value",
            )
            .groupBy("bucket_epoch", "event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.min("k").alias("first_k"),
                F.max("k").alias("last_k"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
            )
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is not None:
            c = carry.select(
                "bucket_epoch",
                "event_type",
                F.col("n").alias("cn"),
                F.col("first_k").alias("cf"),
                F.col("last_k").alias("cl"),
                F.col("high").alias("ch"),
                F.col("low").alias("clo"),
            )
            merged = c.join(
                part, ["bucket_epoch", "event_type"], "full_outer"
            ).select(
                "bucket_epoch",
                "event_type",
                (
                    F.coalesce("cn", F.lit(0)) + F.coalesce("n", F.lit(0))
                ).cast("long").alias("n"),
                F.least(
                    F.coalesce("cf", "first_k"), F.coalesce("first_k", "cf")
                ).alias("first_k"),
                F.greatest(
                    F.coalesce("cl", "last_k"), F.coalesce("last_k", "cl")
                ).alias("last_k"),
                F.greatest(
                    F.coalesce("ch", "high"), F.coalesce("high", "ch")
                ).alias("high"),
                F.least(
                    F.coalesce("clo", "low"), F.coalesce("low", "clo")
                ).alias("low"),
            )
        else:
            merged = part
        path = os.path.join(counts_dir, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_ohlc(stream: DataFrame, state_dir: str) -> DataFrame:
    """OHLC candles maintained over the event stream — the streaming
    twin of queries.q_timeseries_ohlc, via order-key-carrying mergeable
    partials (see make_ohlc_merge_batch). Returns the final candle
    table after the bounded stream drains; per-batch cost is one keyed
    partial agg + a state-sized merge, state is bounded by the number
    of live (bucket, type) series."""
    q = (
        stream.writeStream.foreachBatch(
            make_ohlc_merge_batch(state_dir, {"bid": None, "path": None})
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("incremental_ohlc: stream did not finish in 300s")
    spark = stream.sparkSession
    _, path = _scan_state(os.path.join(state_dir, "state"))
    if path is None:
        return spark.createDataFrame(
            [],
            "bucket_epoch long, event_type string, n long,"
            " open double, high double, low double, close double",
        )
    st = spark.read.parquet(path)
    return st.select(
        "bucket_epoch",
        "event_type",
        "n",
        F.col("first_k.value").alias("open"),
        "high",
        "low",
        F.col("last_k.value").alias("close"),
    )


def make_pipeline_curate_batch(
    work_dir: str, cap_budget: int, pack_budget: int, latest: dict
):
    """foreachBatch body of incremental_pipeline_curate — the FOUR-stage
    streaming curation pipeline (the continuous-crawl-ingestion shape of
    queries.pipeline_curate, r11 verdict #5):

      exact dedup → quality gate → per-source domain cap → seq packing

    with every stateful stage's state carried across micro-batches:

    1. EXACT DEDUP — fingerprint (md5 of whitespace-normalized text,
       the batch drop_exact_duplicates contract) first-arrival-wins:
       in-batch min-doc_id per fingerprint, then an anti-join against
       the accumulated fingerprint dirs (fps/b*, idempotent overwrite
       per batch like the LSH keys state). Under an ordered split,
       first arrival = global min doc_id = the batch survivor.
    2. QUALITY GATE — row-local score >= 3 of 4 (functions/text.py),
       stateless.
    3. DOMAIN CAP — carried per-source token counters, admit iff the
       source's cumulative stays within cap_budget; tokens of docs
       dropped BY THE CAP still count (prefix semantics — the decision
       is final at arrival), while docs dropped upstream by dedup or
       quality never reach the counter, matching the composed batch
       window over the deduped+kept set.
    4. PACKING — the global prefix-sum binning of pipeline_curate with
       a carried (cum_total, open-bin id, open-bin row count) scalar:
       in-batch ordered prefix + carried offset reproduces the one-shot
       bin/bin_pos for ANY ordered split (a bin straddling a batch
       boundary continues at the carried row count).

    Exactly-once: counters + pack scalars are one ledgered state table
    (state/v{bid} + replay skip — folds are associative, not
    idempotent); fingerprints and packed outputs are per-batch-dir
    overwrites (idempotent by construction).

    Scale: stages 1-3 cost one batch-sized window + two bounded joins
    (fingerprint state is |distinct docs| — the same state any exact
    dedup carries; counters are |sources|; pack state is 1 row). The
    pack stage's in-batch window is unpartitioned — bounded by the
    micro-batch trigger size, NOT the corpus (the batch twin uses the
    range-bucketed pack_sequences for the same prefix sum at full
    scale)."""
    from pyspark.sql import Window as W

    from ..functions import text as TX

    fps_root = os.path.join(work_dir, "fps")
    state_root = os.path.join(work_dir, "state")
    out_root = os.path.join(work_dir, "packed")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(state_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch: outputs + fps already on disk
        import glob

        spark = bdf.sparkSession

        # -- stage 1: exact dedup (carried fingerprint set) ---------------
        with_fp = bdf.withColumn(
            "__fp", TX.content_fingerprint(F.col("text"))
        ).localCheckpoint()
        wfp = W.partitionBy("__fp").orderBy("doc_id")
        firsts = (
            with_fp.withColumn("__r", F.row_number().over(wfp))
            .filter(F.col("__r") == 1)
            .drop("__r")
        )
        prior = [
            p
            for p in glob.glob(os.path.join(fps_root, "b*"))
            if os.path.exists(os.path.join(p, "_SUCCESS"))
            and os.path.basename(p) != f"b{bid}"
        ]
        fresh = (
            firsts.join(spark.read.parquet(*prior), "__fp", "left_anti")
            if prior
            else firsts
        )
        with_fp.select("__fp").distinct().write.mode("overwrite").parquet(
            os.path.join(fps_root, f"b{bid}")
        )

        # -- stage 2: quality gate (row-local) ----------------------------
        toks = TX.tokens(F.col("text"))
        staged = (
            fresh.select(
                "doc_id",
                "source",
                F.size(toks).cast("long").alias("n_toks"),
                TX.quality_score(F.col("text"), toks).alias("__q"),
            )
            .filter(F.col("__q") >= 3)
            .drop("__q")
            .localCheckpoint()
        )

        # -- stage 3: domain cap (carried per-source counters) ------------
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        caps_carry = (
            carry.filter(F.col("kind") == "cap").select(
                F.col("key").alias("source"),
                F.col("toks").alias("seen_toks"),
            )
            if carry is not None
            else None
        )
        wc = (
            W.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cum = staged.withColumn("cum_batch", F.sum("n_toks").over(wc))
        if caps_carry is not None:
            cum = cum.join(F.broadcast(caps_carry), "source", "left").withColumn(
                "cum_toks",
                F.col("cum_batch") + F.coalesce("seen_toks", F.lit(0)),
            )
        else:
            cum = cum.withColumn("cum_toks", F.col("cum_batch"))
        admitted = cum.filter(F.col("cum_toks") <= cap_budget)

        # -- stage 4: packing (carried prefix/open-bin scalars) -----------
        pk = (
            carry.filter(F.col("kind") == "pack").select(
                F.col("cum").alias("cum0"),
                F.col("bin").alias("bin0"),
                F.col("bin_n").alias("binn0"),
            )
            if carry is not None
            else spark.range(1).select(
                F.lit(0).cast("long").alias("cum0"),
                F.lit(-1).cast("long").alias("bin0"),
                F.lit(0).cast("long").alias("binn0"),
            )
        )
        wp = W.orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        packed = (
            admitted.select("doc_id", F.col("n_toks").alias("n_tokens"))
            .crossJoin(F.broadcast(pk))
            .withColumn(
                "cum", F.sum("n_tokens").over(wp) + F.col("cum0")
            )
            .withColumn(
                "bin", F.expr(f"(cum - n_tokens) DIV {pack_budget}")
            )
            .withColumn(
                "bin_pos",
                F.row_number().over(W.partitionBy("bin").orderBy("doc_id"))
                + F.when(
                    F.col("bin") == F.col("bin0"), F.col("binn0")
                ).otherwise(F.lit(0)),
            )
            .localCheckpoint()
        )
        packed.select(
            "doc_id",
            "n_tokens",
            F.col("bin").cast("int").alias("bin"),
            F.col("bin_pos").cast("int").alias("bin_pos"),
        ).write.mode("overwrite").parquet(os.path.join(out_root, f"b{bid}"))

        # -- state fold (one ledgered table: cap counters ∪ pack row) -----
        batch_counts = staged.groupBy("source").agg(
            F.sum("n_toks").cast("long").alias("new_toks")
        )
        if caps_carry is not None:
            # full-outer: a source absent from the batch keeps its counter
            merged = caps_carry.join(batch_counts, "source", "full_outer").select(
                "source",
                (
                    F.coalesce("seen_toks", F.lit(0))
                    + F.coalesce("new_toks", F.lit(0))
                )
                .cast("long")
                .alias("seen_toks"),
            )
        else:
            merged = batch_counts.select(
                "source", F.col("new_toks").cast("long").alias("seen_toks")
            )
        nul = F.lit(None).cast("long")
        caps_state = merged.select(
            F.lit("cap").alias("kind"),
            F.col("source").alias("key"),
            F.col("seen_toks").alias("toks"),
            nul.alias("cum"),
            nul.alias("bin"),
            nul.alias("bin_n"),
        )
        # the last packed row closes the batch: its bin is the open bin,
        # its bin_pos the open bin's row count (bin monotone in doc_id)
        pagg = packed.agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("add"),
            F.max_by("bin", "doc_id").alias("lb"),
            F.max_by("bin_pos", "doc_id").alias("lbn"),
        )
        pack_state = pagg.crossJoin(F.broadcast(pk)).select(
            F.lit("pack").alias("kind"),
            F.lit("").alias("key"),
            nul.alias("toks"),
            (F.col("cum0") + F.col("add")).cast("long").alias("cum"),
            F.coalesce(F.col("lb"), F.col("bin0")).cast("long").alias("bin"),
            F.coalesce(F.col("lbn"), F.col("binn0"))
            .cast("long")
            .alias("bin_n"),
        )
        path = os.path.join(state_root, f"v{bid}")
        caps_state.unionByName(pack_state).write.mode("overwrite").parquet(
            path
        )
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_pipeline_curate(
    stream: DataFrame,
    work_dir: str,
    cap_budget: int = 600,
    pack_budget: int = 512,
) -> DataFrame:
    """The streaming curation pipeline ending — exact dedup → quality
    gate → per-source domain cap → sequence packing maintained over a
    DOCUMENT stream (see make_pipeline_curate_batch). Returns the
    accumulated packed shard table (doc_id, n_tokens, bin, bin_pos)
    after the bounded stream drains; under any ordered micro-batch
    split it is row-identical to the composed batch pipeline."""
    q = (
        stream.writeStream.foreachBatch(
            make_pipeline_curate_batch(
                work_dir, cap_budget, pack_budget, {"bid": None, "path": None}
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_pipeline_curate: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(work_dir, "packed", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, bin int, bin_pos int"
        )
    return spark.read.parquet(*outs)


def make_weighted_reservoir_batch(state_dir: str, k: int, latest: dict):
    """foreachBatch body of incremental_weighted_reservoir: carried
    bottom-k sample state over a weighted document stream.

    Per batch: score the batch's rows with the SAME deterministic md5
    ticket race as operators/sampling.py:weighted_reservoir (priorities
    are pure functions of (id, weight) — no rand(), no seed state, so a
    row's priority is identical whenever and wherever it arrives), take
    the batch's own bottom-k, union the carried k rows, keep the global
    bottom-k. Correctness is structural: bottom-k by a row-intrinsic
    priority is a SEMILATTICE merge (idempotent, commutative,
    associative), so the final state equals the one-shot batch sample
    under ANY split of the stream — including duplicated replays, which
    makes this the one carried state here that is exactly-once even
    WITHOUT the ledger; the batch-id skip is kept for uniform replay
    cost, not correctness.

    Scale: per-batch cost is one narrow scan of the batch (≤ w_max md5s
    per row in-row) + a batch-local TakeOrderedAndProject + a (2k)-row
    merge; state is exactly k rows regardless of stream length."""
    state_root = os.path.join(state_dir, "state")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(state_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return
        from ..operators.sampling import weighted_reservoir

        spark = bdf.sparkSession
        cand = weighted_reservoir(bdf, "weight", k=k).select(
            "doc_id", "lang", "weight", "priority"
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        merged = cand.unionByName(carry) if carry is not None else cand
        path = os.path.join(state_root, f"v{bid}")
        # dropDuplicates makes the union a SET union — without it a
        # replayed row would appear twice and bottom-k would keep both
        # copies (the semilattice property holds on sets, not bags)
        merged.dropDuplicates(["doc_id"]).orderBy(
            "priority", "doc_id"
        ).limit(k).write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_weighted_reservoir(
    stream: DataFrame, state_dir: str, k: int = 100
) -> DataFrame:
    """Deterministic weighted reservoir sampling maintained over a
    stream (see make_weighted_reservoir_batch): the carried k-row
    bottom-k state IS the sample at every point in the stream — the
    anytime PPS sample a continuous ingest pipeline keeps of everything
    it has ever seen, in k rows of state. After the bounded stream
    drains, the state is row-identical to the one-shot batch sample
    (split-invariance pinned in tests/test_streaming.py)."""
    q = (
        stream.writeStream.foreachBatch(
            make_weighted_reservoir_batch(
                state_dir, k, {"bid": None, "path": None}
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_weighted_reservoir: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    _, path = _scan_state(os.path.join(state_dir, "state"))
    if path is None:
        return spark.createDataFrame(
            [], "doc_id long, lang string, weight int, priority string"
        )
    return spark.read.parquet(path)


def make_cc_batch(state_dir: str, latest: dict):
    """foreachBatch body of incremental_connected_components: carried
    (node, comp) labels maintained by CONTRACTION — the incremental
    connected-components algorithm every streaming entity-resolution /
    identity-graph system runs:

    1. look up each batch edge endpoint's current component (left join
       against the carried labels; unseen node → itself);
    2. CONTRACT: rewrite batch edges onto component ids and drop
       self-loops — merges triggered by this batch now live in a graph
       whose size is bounded by the BATCH, not the corpus;
    3. run the batch-scoped pointer-jumping CC
       (operators/dedup.py:connected_components) on the contracted
       graph → comp → new-comp mapping;
    4. remap: carried labels (and the batch's new nodes) whose comp is
       in the mapping move to the merged component; everything else is
       untouched.

    Invariant (pinned by split-invariance tests): after batch i the
    labels equal the one-shot CC of every edge in batches ≤ i, with
    component id = min node id (carried comps are the mins of their
    sets; the contracted CC takes the min over merged comp ids = the
    min over the union). Replays are IDEMPOTENT by construction —
    re-contracting already-merged edges yields only self-loops, a
    no-op — so the ledger skip is uniformity, not correctness.

    Scale: per-batch cost is one node-keyed join of the batch's
    endpoints against the label state plus a CC over a batch-bounded
    contracted graph; state is one row per node ever seen (inherent to
    CC — it IS the answer). At 100 TB bucket the label table by node so
    the per-batch lookup join co-locates instead of reshuffling state.
    """
    state_root = os.path.join(state_dir, "labels")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(state_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return
        from ..operators.dedup import connected_components

        spark = bdf.sparkSession
        edges = (
            bdf.select("node_a", "node_b")
            .filter(F.col("node_a") != F.col("node_b"))
            .distinct()
            .localCheckpoint()
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        ends = (
            edges.select(F.col("node_a").alias("node"))
            .union(edges.select(F.col("node_b").alias("node")))
            .distinct()
        )
        if carry is not None:
            lk = ends.join(carry, "node", "left").select(
                "node", F.coalesce("comp", F.col("node")).alias("comp")
            )
        else:
            lk = ends.select("node", F.col("node").alias("comp"))
        lk = lk.localCheckpoint()
        ce = (
            edges.join(
                lk.select(
                    F.col("node").alias("node_a"),
                    F.col("comp").alias("ca"),
                ),
                "node_a",
            )
            .join(
                lk.select(
                    F.col("node").alias("node_b"),
                    F.col("comp").alias("cb"),
                ),
                "node_b",
            )
            .select(F.col("ca").alias("doc_a"), F.col("cb").alias("doc_b"))
            .filter(F.col("doc_a") != F.col("doc_b"))
            .distinct()
        )
        all_lbl = (
            carry.unionByName(lk).distinct() if carry is not None else lk
        )
        if ce.isEmpty():
            merged = all_lbl
        else:
            mapping = connected_components(ce).select(
                F.col("doc_id").alias("comp"),
                F.col("component").alias("newcomp"),
            )
            merged = (
                all_lbl.join(F.broadcast(mapping), "comp", "left")
                .select(
                    "node",
                    F.coalesce("newcomp", F.col("comp")).alias("comp"),
                )
            )
        path = os.path.join(state_root, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_connected_components(
    edge_stream: DataFrame, state_dir: str
) -> DataFrame:
    """Connected components maintained over an EDGE STREAM (see
    make_cc_batch): the carried (node, comp) labels are the anytime
    component assignment of everything seen so far; after the bounded
    stream drains they are row-identical to the one-shot batch CC of
    the full edge set under any ordered or unordered micro-batch split
    (contraction is order-insensitive)."""
    q = (
        edge_stream.writeStream.foreachBatch(
            make_cc_batch(state_dir, {"bid": None, "path": None})
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_connected_components: stream did not finish in 300s"
        )
    spark = edge_stream.sparkSession
    _, path = _scan_state(os.path.join(state_dir, "labels"))
    if path is None:
        return spark.createDataFrame([], "node long, comp long")
    return spark.read.parquet(path)


def make_dsir_batch(work_dir: str, buckets: int, latest: dict, target=None):
    """foreachBatch body of incremental_dsir_weights: the DSIR
    hashed-bigram MODEL (per-bucket raw/target counts) maintained over a
    document stream, batch-id-ledgered exactly-once. `target` is the
    target-domain predicate Column (or column-name string), defaulting
    to lang=='en' like the registered query — pass your own to score
    against any other target subset (ADVICE r12: the default used to be
    hard-coded, silently scoring non-English reuses against English).

    Per batch: (1) the batch's per-document feature rows
    (doc_id, bkt, c) are written as an archive delta — features are a
    pure row-local function of the document, so deltas are disjoint and
    split-independent; (2) the carried ≤`buckets`-row count table
    absorbs the batch's bucket counts with a full-outer sum merge (a
    bucket absent from the batch keeps its counts — the domain-cap
    lesson). Counts are associative-commutative integers, so ANY
    ordered or unordered split drains to the same model. Replays are
    skipped via the `latest` ledger, recovering from disk (_scan_state)
    across restarts."""
    from ..operators.sampling import dsir_bigram_buckets

    model_root = os.path.join(work_dir, "model")
    feats_root = os.path.join(work_dir, "feats")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(model_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch
        spark = bdf.sparkSession
        tgt = F.col(target) if isinstance(target, str) else target
        bg = dsir_bigram_buckets(
            bdf,
            target=tgt if tgt is not None else F.col("lang") == "en",
            buckets=buckets,
        )
        feats = bg.groupBy("doc_id", "bkt").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        feats.write.mode("overwrite").parquet(
            os.path.join(feats_root, f"b{bid}")
        )
        part = bg.groupBy("bkt").agg(
            F.count(F.lit(1)).cast("long").alias("b_cr"),
            F.count(F.when(F.col("__t"), 1)).cast("long").alias("b_ct"),
        )
        carry = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if carry is None:
            merged = part.select(
                "bkt",
                F.col("b_cr").alias("cr"),
                F.col("b_ct").alias("ct"),
            )
        else:
            j = carry.join(part, "bkt", "full_outer")
            merged = j.select(
                "bkt",
                (
                    F.coalesce("cr", F.lit(0)) + F.coalesce("b_cr", F.lit(0))
                ).alias("cr"),
                (
                    F.coalesce("ct", F.lit(0)) + F.coalesce("b_ct", F.lit(0))
                ).alias("ct"),
            )
        path = os.path.join(model_root, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_dsir_weights(
    stream: DataFrame,
    work_dir: str,
    buckets: int = 4096,
    scale: int = 1 << 20,
    target=None,
) -> DataFrame:
    """Streaming twin of operators/sampling.py:dsir_weights — the DSIR
    importance-reweighting model maintained CONTINUOUSLY over a document
    stream (the production shape: the count table tracks the crawl as it
    arrives; see make_dsir_batch), with scoring at drain time: the final
    ≤`buckets`-row model broadcast-joins the accumulated per-document
    feature archives. Because bucket counts are associative integers and
    features are row-local, the drained (doc_id, n_feats, dsir_fp)
    relation is row-identical to the batch operator under ANY micro-batch
    split — the batch SQL is the oracle."""
    q = (
        stream.writeStream.foreachBatch(
            make_dsir_batch(
                work_dir, buckets, {"bid": None, "path": None}, target=target
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_dsir_weights: stream did not finish in 300s"
        )
    return dsir_drained(stream.sparkSession, work_dir, scale=scale)


def dsir_drained(spark, work_dir: str, scale: int = 1 << 20) -> DataFrame:
    """Drain endpoint of the streaming DSIR twin: score the accumulated
    per-document feature archives with the FINAL carried model (one
    broadcast join + one doc-keyed agg). Shared by
    incremental_dsir_weights and the split-invariance tests."""
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(work_dir, "feats", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    bid, path = _scan_state(os.path.join(work_dir, "model"))
    if not outs or path is None:
        return spark.createDataFrame(
            [], "doc_id long, n_feats long, dsir_fp long"
        )
    model = spark.read.parquet(path)
    feats = spark.read.parquet(*outs)
    return (
        feats.join(F.broadcast(model), "bkt")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(
                F.expr(f"c * ((ct + 1) * {scale} DIV (cr + 1))")
            ).alias("dsir_fp"),
        )
    )


def make_paragraph_dedup_batch(work_dir: str, size: int, latest: dict):
    """foreachBatch body of incremental_paragraph_dedup: corpus-level
    paragraph-exact dedup with document reassembly maintained over a
    document stream — the carried state is the SEEN passage-fingerprint
    set, batch-id-ledgered exactly-once.

    Per batch: (1) chunk the batch's documents with the SAME derivation
    as the batch operator (operators/dedup.py:paragraph_chunks); (2)
    within-batch keep-first (min composite key per fingerprint — the
    batch operator's exact rule, applied to what arrived together); (3)
    anti-join the carried seen set (a passage that arrived in ANY
    earlier batch is dropped here — prefix semantics, class (2) of the
    streaming-expressibility taxonomy: under a doc_id-ORDERED split the
    drained shard is row-identical to the batch operator, which keeps
    the minimal (doc_id, chunk_idx) occurrence); (4) reassemble and
    append the batch's finished document rows (documents are row-local
    to their batch, so rows never revise); (5) fold the batch's kept
    fingerprints into the seen set.

    Scale: per batch one fingerprint hash-agg + one anti-join against
    the seen set (both keyed on the 16-byte digest) + one doc-keyed
    reassembly agg; state grows with DISTINCT passages, the same bound
    as the batch operator's shuffle."""
    from ..operators.dedup import paragraph_chunks

    seen_root = os.path.join(work_dir, "seen")
    out_root = os.path.join(work_dir, "out")

    def merge_batch(bdf: DataFrame, bid: int) -> None:
        if latest["bid"] is None:
            latest["bid"], latest["path"] = _scan_state(seen_root)
        if latest["bid"] is not None and bid <= latest["bid"]:
            return  # replayed batch
        spark = bdf.sparkSession
        chunked = paragraph_chunks(bdf, size=size)
        keepers = chunked.groupBy("fp").agg(F.min("ck").alias("keep_ck"))
        flagged = chunked.join(keepers, "fp").withColumn(
            "kept_in_batch", (F.col("ck") == F.col("keep_ck")).cast("int")
        )
        seen = (
            spark.read.parquet(latest["path"])
            if latest["path"] is not None
            else None
        )
        if seen is not None:
            flagged = flagged.join(
                seen.withColumnRenamed("fp", "seen_fp"),
                flagged["fp"] == F.col("seen_fp"),
                "left",
            ).withColumn(
                "kept",
                F.when(
                    F.col("seen_fp").isNotNull(), F.lit(0)
                ).otherwise(F.col("kept_in_batch")),
            )
        else:
            flagged = flagged.withColumn("kept", F.col("kept_in_batch"))
        out = flagged.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept") == 1,
                                F.struct("chunk_idx", "p"),
                            )
                        )
                    ),
                    lambda s: s["p"],
                ),
            ).alias("text_dedup"),
        )
        out.write.mode("overwrite").parquet(os.path.join(out_root, f"b{bid}"))
        new_seen = flagged.select("fp").distinct()
        merged = (
            new_seen
            if seen is None
            else seen.unionByName(new_seen).distinct()
        )
        path = os.path.join(seen_root, f"v{bid}")
        merged.write.mode("overwrite").parquet(path)
        prev_path = latest["path"]
        latest.update(path=path, bid=bid)
        if prev_path is not None and prev_path != path:
            import shutil

            shutil.rmtree(prev_path, ignore_errors=True)

    return merge_batch


def incremental_paragraph_dedup(
    stream: DataFrame, work_dir: str, size: int = 32
) -> DataFrame:
    """Streaming twin of operators/dedup.py:paragraph_dedup — paragraph-
    exact dedup with reassembly over a continuously-arriving document
    stream (see make_paragraph_dedup_batch). Returns the accumulated
    reassembled documents after the bounded stream drains; under a
    doc_id-ordered micro-batch split the result is row-identical to the
    batch operator (prefix keep-first semantics)."""
    q = (
        stream.writeStream.foreachBatch(
            make_paragraph_dedup_batch(
                work_dir, size, {"bid": None, "path": None}
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_paragraph_dedup: stream did not finish in 300s"
        )
    spark = stream.sparkSession
    import glob

    outs = [
        p
        for p in glob.glob(os.path.join(work_dir, "out", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame(
            [], "doc_id long, n_chunks long, n_kept long, text_dedup string"
        )
    return spark.read.parquet(*outs)


def make_quality_archive_batch(work_dir: str, buckets: int, label=None):
    """foreachBatch body of incremental_quality_train: archive each
    micro-batch's (doc_id, y, fb) feature rows as a parquet delta.

    Taxonomy class (1) BY PATH: features and labels are pure row-local
    functions of the document, every batch writes mode=overwrite to its
    own b{bid} directory, and training happens only at drain — so
    replays and restarts are idempotent WITHOUT a ledger (a re-delivered
    batch rewrites byte-identical content), and ANY split — ordered,
    unordered, singleton — drains to the one-shot answer. This is the
    simplest exactly-once shape in the module: no carried fold at all;
    contrast make_dsir_batch, whose count table needs the batch-id
    ledger."""
    from ..operators.quality import default_quality_label, quality_features

    feats_root = os.path.join(work_dir, "feats")

    def archive_batch(bdf: DataFrame, bid: int) -> None:
        # the default bootstrap label is the SHARED helper (ADVICE r13:
        # an inline re-spelling here could silently drift from the batch
        # trainer's _qt_label_col and break the row-identical contract)
        lab = label if label is not None else default_quality_label()
        quality_features(bdf, lab, buckets=buckets).write.mode(
            "overwrite"
        ).parquet(os.path.join(feats_root, f"b{bid}"))

    return archive_batch


def quality_train_drained(spark, work_dir: str, buckets: int, lr_dens):
    """Drain endpoint of the streaming quality-train twin: run the full
    fixed-point trainer (operators/quality.py:quality_train_model) over
    the accumulated feature archives and return the (bucket, w) weight
    rows — the batch operator verbatim on the drained corpus."""
    import glob

    from pyspark.sql import functions as F

    from ..operators.quality import quality_train_model

    outs = [
        p
        for p in glob.glob(os.path.join(work_dir, "feats", "b*"))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not outs:
        return spark.createDataFrame([], "bucket int, w long")
    feats = spark.read.parquet(*outs)
    model = quality_train_model(feats, buckets=buckets, lr_dens=lr_dens)
    return model.select(
        F.posexplode("warr").alias("bucket", "w")
    ).select(F.col("bucket").cast("int").alias("bucket"), "w")


def incremental_quality_train(
    stream: DataFrame,
    work_dir: str,
    buckets: int = 512,
    lr_dens=(1, 2, 4),
    label=None,
) -> DataFrame:
    """Streaming twin of the in-engine quality-classifier trainer
    (queries.text_quality_train): the crawl's feature/label rows are
    archived as they arrive (row-local, idempotent by path — see
    make_quality_archive_batch) and the trainer runs ONCE at drain over
    the accumulated corpus — the production cadence (you train when the
    crawl window closes, not per micro-batch; full-batch gradient steps
    are a global 3-pass computation, deliberately NOT folded per batch).
    The drained weights are row-identical to the batch operator under
    ANY micro-batch split; the batch SQL is the oracle."""
    q = (
        stream.writeStream.foreachBatch(
            make_quality_archive_batch(work_dir, buckets, label=label)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_quality_train: stream did not finish in 300s"
        )
    return quality_train_drained(
        stream.sparkSession, work_dir, buckets, lr_dens
    )
