"""Deduplication operators for large-scale training-data pipelines.

Five families, each a composition of built-in DataFrame ops (no Python in
any hot path):

- exact:        md5(normalized text) → groupBy fingerprint
- MinHash+LSH:  shingle → k min-hashes → band keys → bucket self-join
- SimHash:      token bit-vote → 32-bit signature → banded hamming join
- n-gram Jaccard: shared-shingle inverted-index join → intersection/union
- embedding cosine: see similarity.py (same fixed-point dot machinery)

Scale notes (the whole point): every pair-finding step is an EQUI-join on
a derived key (shingle / band key / simhash band), never an all-pairs
cross product — candidate generation is O(collisions), not O(n²), which is
what makes these run at 100 TB. Hot keys (a shingle shared by millions of
docs) are the classic skew hazard: `max_bucket` caps bucket width, and AQE
skew-join splitting handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (modulo whitespace/case) documents.

    One hash-aggregation on the fingerprint: map-side partial agg makes the
    shuffle proportional to #distinct fingerprints. Output: fingerprint,
    n_docs, keeper (min id — the canonical survivor), dup_ids.
    """
    fp = TX.content_fingerprint(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id document per fingerprint (deterministic survivor).

    Window-free formulation: an aggregation + semi-join keeps both sides
    partitioned by the same key (no extra shuffle vs row_number)."""
    fp = TX.content_fingerprint(F.col(text_col)).alias("__fp")
    with_fp = docs.withColumn("__fp", TX.content_fingerprint(F.col(text_col)))
    keepers = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return with_fp.join(keepers, ["__fp", id_col], "left_semi").drop("__fp")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """doc_id, h0..h{k-1}: per-document MinHash signature.

    Plan: explode distinct shingles once (narrow), then ONE groupBy(doc)
    computing all k mins as independent aggregates — a single shuffle on
    doc_id regardless of k.
    """
    toks = TX.tokens(F.col(text_col))
    shingled = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(TX.word_shingles(toks, shingle_n))).alias("shingle"),
    )
    aggs = [
        F.min(TX.minhash_value(F.col("shingle"), seed)).alias(f"h{seed}")
        for seed in range(k)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 3,
    shingle_n: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) via banded LSH.

    k/bands rows per band; docs sharing ANY full band collide. Collision
    probability ≈ 1-(1-j^r)^b for Jaccard j. Pair generation is a self-join
    on the band key — shuffle on band keys, output only colliding pairs.
    `max_bucket` drops degenerate buckets (a band key shared by thousands
    of docs — e.g. boilerplate) which would otherwise explode
    quadratically; real pipelines log these instead of joining them.
    """
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(docs, id_col, text_col, k, shingle_n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * r + i}") for i in range(r)])).alias(
            "band_key"
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band_key")
    ).distinct()
    a = banded.alias("a")
    b = banded.alias("b")
    # cap pathological buckets before the join
    sizes = banded.groupBy("band_key").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(F.col("n") <= max_bucket).select("band_key")
    banded = banded.join(F.broadcast(ok), "band_key")
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams for candidate pairs that
    share ≥1 shingle (inverted-index join, never all-pairs).

    jaccard = |∩| / (|A| + |B| - |∩|) — integer counts, one IEEE division.
    """
    toks = TX.tokens(F.col(text_col))
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(TX.word_shingles(toks, shingle_n))).alias("shingle"),
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id, simhash (32-bit): per-bit majority vote over token hashes
    (weighted by occurrence). Token hash = first 8 hex chars of md5 —
    reproducible in the oracle via ('0x'||hex)::BIGINT.

    Plan: explode tokens (narrow) → one groupBy(doc) with 32 ±1 sums →
    recombine bits. One shuffle on doc_id.
    """
    toks = TX.tokens(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    )
    h32 = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    exploded = exploded.withColumn("h32", h32)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h32"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = exploded.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return per_doc.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, banded for scale:
    split the 32-bit signature into 4 bytes; by pigeonhole any pair with
    hamming ≤ 3 agrees on ≥1 full byte, so the equi-join on (band, byte)
    finds all of them without an all-pairs scan."""
    sig = simhash(docs, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255)).alias("key"),
            )
            for i in range(4)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.explode(bands).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
