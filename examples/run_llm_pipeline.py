"""End-to-end training-data pipeline over the documents table:

    exact dedup → near-dup candidates (MinHash+LSH) → embedding-cosine
    verify → connected components → keep one doc per cluster → quality
    filter (Gopher checks + repetition gate) → unigram-rarity gate →
    PII redaction → sequence packing → train/val/test split →
    per-language temperature sampling weights

Every stage is the operator the oracle-checked queries use; this script
just composes them. Run:

    python examples/run_llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.functions import text as TX
from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
    connected_components_twolevel,
    drop_exact_duplicates,
    minhash_lsh_pairs,
)
from kafka_processor_cosmos_tx_dispatch_spark.operators.sampling import (
    hash_split,
    pack_sequences,
)
from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark
from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup (fingerprint survivor)
    docs = drop_exact_duplicates(docs)
    n1 = docs.count()

    # 2-4. near-dup candidates, verified by embedding cosine where an
    # embedding exists (cheap text blocking, expensive signal over
    # O(candidates)), then clusters → keep the min-id doc per component
    from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

    pairs = minhash_lsh_pairs(docs)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.quantized(F.col("embedding")).alias("v")
    )
    emb = emb.select("vec_id", "v", V.dot_int(F.col("v"), F.col("v")).alias("nsq"))
    j = pairs.join(
        emb.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"),
                   F.col("nsq").alias("na")), "doc_a", "left"
    ).join(
        emb.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"),
                   F.col("nsq").alias("nb")), "doc_b", "left"
    )
    sim = V.dot_int(F.col("va"), F.col("vb")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # a candidate missing an embedding passes through UNVERIFIED (left
    # joins + null-sim coalesce) — dropping it would silently keep both
    # duplicates whenever embedding coverage is partial
    verified = j.filter(F.coalesce(sim >= 0.4, F.lit(True))).select(
        "doc_a", "doc_b"
    )
    comp = connected_components_twolevel(verified)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    n2 = docs.count()

    # 4b. SEMANTIC dedup (SemDeDup, round 6): k-means the embeddings,
    # drop lower-information near-twins within each cluster — catches
    # paraphrase-level duplication the lexical families can't see
    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        semantic_dedup_drops,
    )

    sem_drops = semantic_dedup_drops(
        load_table(spark, sf_dir, "embeddings"), k=8, rounds=2, threshold=0.4
    ).select(F.col("vec_id").alias("doc_id"))
    docs = docs.join(sem_drops, "doc_id", "left_anti")
    n2b = docs.count()

    # 5. quality filter: ≥3 of the 4 Gopher-style checks AND low
    # within-doc repetition, then the hashed-linear model gate (the
    # fastText-shape classifier, round 6)
    score = TX.quality_score(F.col("text"), TX.tokens(F.col("text")))
    docs = docs.filter(score >= 3)
    n3 = docs.count()

    # 5b. corpus-statistics gate (CCNet shape, cf. queries.text_token_rarity):
    # drop the most boilerplate-heavy docs by mean inverse token frequency
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("total"))
    rarity = freq.crossJoin(F.broadcast(tot)).select(
        "tok",
        (F.col("total").cast("double") / F.col("cnt").cast("double")).alias("r"),
    )
    doc_rarity = (
        toks.join(rarity, "tok")
        .groupBy("doc_id")
        .agg((F.sum("r") / F.count(F.lit(1))).alias("mean_rarity"))
    )
    # relative gate: drop the bottom decile (most boilerplate-heavy);
    # an absolute threshold would be corpus-vocabulary-dependent
    thr = doc_rarity.agg(
        F.expr("percentile(mean_rarity, 0.1)").alias("thr")
    )
    keep = (
        doc_rarity.crossJoin(F.broadcast(thr))
        .filter(F.col("mean_rarity") >= F.col("thr"))
        .select("doc_id")
    )
    docs = docs.join(keep, "doc_id", "semi")
    n4 = docs.count()

    # 6. PII-style scrub before packing (regex masking, JVM-side)
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.col("text"), r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+", "<EMAIL>"
        ),
    )

    # 7. pack into 512-token bins
    docs = docs.withColumn("n_tokens", F.size(TX.tokens(F.col("text"))).cast("long"))
    packed = pack_sequences(docs, "n_tokens", budget=512, range_size=64)

    # 8. deterministic split
    final = hash_split(packed)
    summary = (
        final.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("bin").alias("bins"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("split")
    )
    print(
        f"docs: {n0} → exact-dedup {n1} → near-dup {n2} → semantic {n2b}"
        f" → quality {n3} → rarity {n4}"
    )
    summary.show(truncate=False)

    # 8b. contrastive hard negatives for the retrieval head (round 6):
    # per anchor, the closest DIFFERENT-label vectors
    from kafka_processor_cosmos_tx_dispatch_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb_full = load_table(spark, sf_dir, "embeddings")
    negs = hard_negative_topk(
        emb_full.filter(F.col("vec_id") < 10), emb_full, k=3
    )
    print(f"hard negatives mined: {negs.count()} (3 per anchor)")

    # 9. temperature-rebalanced sampling weights per language (α = 0.5,
    # cf. queries.sample_temperature_weights): what the data loader
    # would sample each surviving language at
    g = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = g.select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("w"))
    shares = w.crossJoin(F.broadcast(w.agg(F.sum("w").alias("tw")))).select(
        "lang", "n", (F.col("w") / F.col("tw")).alias("sample_share")
    )
    shares.orderBy("lang").show()
    spark.stop()


if __name__ == "__main__":
    main()
