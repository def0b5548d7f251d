"""Training-data assembly operators: sequence packing, stratified
sampling, deterministic splits.

All three are deterministic (hash- or id-ordered, never rand()) so runs
are reproducible fleet-wide and the DuckDB oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    n_tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 512,
    range_size: int = 1024,
) -> DataFrame:
    """Assign documents (in id order) to fixed-budget context bins:
    bin = exclusive-prefix-sum(n_tokens) DIV budget — the doc-level
    packing step of an LLM pretraining pipeline.

    The prefix sum is the textbook DISTRIBUTED SCAN, not a
    single-partition window: docs are range-bucketed by id
    (`range_size` ids per bucket), per-bucket sums (a tiny agg —
    #buckets rows) are turned into per-bucket starting offsets with one
    cheap single-partition window over #buckets rows, and the in-bucket
    cumulative sum runs under a per-bucket window. No stage ever holds
    more than one bucket's rows in a single window partition, so the
    operator scales to any document count; a global
    Window.orderBy(id) — the naive formulation — would funnel 100 TB
    through ONE task.
    """
    part = (F.col(id_col) / F.lit(range_size)).cast("long").alias("__bucket")
    d = docs.select(F.col(id_col), F.col(n_tokens_col).alias("__n"), part)

    bucket_sums = d.groupBy("__bucket").agg(F.sum("__n").alias("__bsum"))
    # one window over #buckets rows (thousands at 100 TB — trivially small)
    w_off = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__offset"),
    )

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        d.join(F.broadcast(offsets), "__bucket")
        .withColumn("__cum", F.col("__offset") + F.sum("__n").over(w_in))
        .select(
            id_col,
            F.col("__n").alias("n_tokens"),
            F.expr(f"(__cum - __n) DIV {budget}").cast("int").alias("bin"),
        )
    )
    w_bin = Window.partitionBy("bin").orderBy(id_col)
    return packed.withColumn(
        "bin_pos", F.row_number().over(w_bin).cast("int")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str = "doc_id", k: int = 20
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank by md5(id) within
    each stratum (uniform pseudo-random order, reproducible everywhere —
    no rand(), no seed plumbing). One shuffle on the stratum; top-k is
    rank + filter, never a global sort."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(strata_col, id_col)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 10,
    train_buckets: int = 8,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash — stable across
    runs and machines (the property rand()-based splits lack: adding a
    document never reshuffles the others). Narrow (no shuffle at all):
    split = bucket(md5(id)) thresholds."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    split = (
        F.when(bucket < train_buckets, "train")
        .when(bucket < buckets - 1, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def weighted_reservoir(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Deterministic weighted reservoir sample (bottom-k by ticket
    priority): each row enters the race with `weight` integer tickets,
    ticket j's priority is md5(id ':' j), the row's priority is its best
    ticket, and the sample is the k best rows overall. This is exact
    integer-weight A-ES/PPS sampling — P(row sampled) is proportional to
    its ticket count in the small-k limit — with NO rand()/seed state:
    any engine that agrees on md5 draws the identical sample, and adding
    a row never changes another row's priority (the stability property
    that makes the sample incrementally maintainable: bottom-k is a
    semilattice, so a stream can carry just the current k rows as
    state).

    Scale: the priority is row-local (≤ w_max md5 evaluations inside one
    codegen'd HOF — no explode, the ticket array never materializes in a
    shuffle), and the global bottom-k is orderBy+limit, which Spark
    executes as TakeOrderedAndProject: per-partition top-k then a
    k-row driver merge — no global sort, no shuffle of the corpus.
    Weights must be small integers (tickets are materialized per row
    in-register, so w_max ~ tens, the regime integer PPS covers);
    rows with weight < 1 hold no ticket and never sample.
    """
    pri = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.col(weight_col).cast("int")),
            lambda j: F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), j.cast("string")
                )
            ),
        )
    )
    return (
        df.filter(F.col(weight_col) >= 1)
        .withColumn("priority", pri)
        .orderBy("priority", id_col)
        .limit(k)
    )


def dsir_bigram_buckets(
    docs: DataFrame,
    target: Column,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, __t, bkt) — one row per word-bigram OCCURRENCE, with the
    bigram hashed into `buckets` buckets and the target-membership flag.
    The shared feature derivation of dsir_weights and its streaming twin
    (streaming/incremental.py:incremental_dsir_weights): both sides MUST
    hash identically or the carried model state diverges from the batch
    oracle. Row-local (one index-aware HOF + one md5 per bigram)."""
    arr = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("__t"),
        F.split(text_col, " ").alias("a"),
    )
    return arr.select(
        "doc_id",
        "__t",
        F.explode(
            F.expr(
                "CASE WHEN size(a) >= 2 THEN"
                " filter(transform(sequence(1, size(a) - 1),"
                " i -> struct(element_at(a, i) AS w1,"
                " element_at(a, i + 1) AS w2)),"
                " p -> p.w1 <> '' AND p.w2 <> '')"
                " ELSE array() END"
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "__t",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.col("p.w1"), F.col("p.w2"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % buckets
        ).alias("bkt"),
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 4096,
    scale: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much its hashed-bigram feature distribution looks like the
    TARGET subset (rows where `target` is true) relative to the RAW
    corpus (all rows). The pipeline use: compute weights once over the
    crawl, then importance-resample (e.g. weighted_reservoir over the
    weights) to tilt a 100 TB raw corpus toward a small quality domain.

    Feature space: word bigrams hashed into `buckets` buckets (the
    paper's hashed n-gram model). Per-bucket weight is the smoothed
    likelihood ratio in INTEGER fixed-point —

        lr_fp[b] = (cnt_target[b] + 1) * scale DIV (cnt_raw[b] + 1)

    and a document scores the sum of lr_fp over its bigram occurrences.
    This is the LINEAR-domain variant of the paper's log-ratio sum:
    per-bucket it is the same monotone smoothed ratio, and keeping it
    integer makes the score exactly reproducible across engines (the
    log-domain float sum pins neither summation order nor libm). The
    global normalizer (raw_total + B)/(target_total + B) multiplies
    every bucket equally and is omitted — it cannot change any ranking
    an importance resampler consumes. Since target ⊆ raw,
    lr_fp ≤ scale, so a 60-bigram document scores < 2²⁶ — no overflow
    at any corpus size.

    Output: (doc_id, n_feats, dsir_fp) for every document with ≥1
    bigram (single-token docs carry no feature and drop, like the
    bigram-LM family).

    Plan/scale: bigram+bucket derivation is one index-aware HOF (narrow,
    no posexplode alignment shuffle); the count table is ONE map-side-
    combinable agg whose result is ≤ `buckets` rows REGARDLESS of corpus
    size — it re-enters as a broadcast, so per-doc scoring is a
    broadcast equi-join + one doc-keyed agg. The corpus text itself is
    never shuffled. cnt_target and cnt_raw come from the same pass
    (conditional agg), not two scans."""
    bg = dsir_bigram_buckets(
        docs, target, buckets=buckets, id_col=id_col, text_col=text_col
    )
    bt = bg.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("__t"), 1)).alias("ct"),
    )
    return (
        bg.join(F.broadcast(bt), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.expr(f"(ct + 1) * {scale} DIV (cr + 1)")).alias(
                "dsir_fp"
            ),
        )
    )
