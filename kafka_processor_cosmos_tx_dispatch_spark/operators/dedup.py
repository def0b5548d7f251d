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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exprs as EX
from ..functions import text as TX
from ..sources.tables import widen

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

    Entirely ROW-LOCAL: distinct shingles → one (h1,h2) hash pair per
    shingle (one md5 each) → per-seed array_min of h1 + seed*h2. No
    explode, no groupBy, no shuffle — signatures are embarrassingly
    parallel over documents, so the only shuffle in any MinHash pipeline
    is whatever consumes the signatures (e.g. the LSH band join).
    Documents with no shingles (< n tokens) are dropped, matching the
    explode-based formulation.
    """
    sig = _signature_array(F.col(text_col), k, shingle_n)
    return (
        widen(docs).select(F.col(id_col).alias("doc_id"), sig.alias("__sig"))
        .filter(F.col("__sig").isNotNull())
        .select(
            "doc_id",
            *[F.col("__sig").getItem(s).alias(f"h{s}") for s in range(k)],
        )
    )


def _hash_pair(s: F.Column) -> F.Column:
    h1, h2 = TX.minhash_base_hashes(s)
    return F.struct(h1.alias("h1"), h2.alias("h2"))


def _min_fn(seed: int):
    # closure (not a default arg) keeps the lambda unary — PySpark treats
    # two-parameter lambdas as (element, index)
    def fn(p: F.Column) -> F.Column:
        return p["h1"] + F.lit(seed) * p["h2"]

    return fn


def _signature_array(text: F.Column, k: int, shingle_n: int) -> F.Column:
    """array<long> of the k MinHash family minima, NULL when the doc has
    no shingles. One md5 per distinct shingle, evaluated exactly once
    (let-bound, so neither multiple references nor a downstream explode
    re-runs the shingle pipeline)."""
    toks = TX.tokens(text)
    sh = F.array_distinct(TX.word_shingles(toks, shingle_n))
    pairs = F.transform(sh, _hash_pair)

    def mins(p: F.Column) -> F.Column:
        return F.when(
            F.size(p) > 0,
            F.array(*[F.array_min(F.transform(p, _min_fn(s))) for s in range(k)]),
        )

    return EX.bind(pairs, mins)


def _banded_keys(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(doc_id, band_key) rows: shingle → k min-hashes → `bands` md5 band
    keys. Band keys are derived INSIDE a second let over the signature
    array, so the whole shingle→signature pipeline runs once per doc
    inside the explode's generator; distinct() then materializes
    (doc_id, band_key) and everything downstream touches only those two
    columns. explode_outer + null filter, not plain explode: the
    non-outer Generate makes Catalyst infer a size()>0 pre-filter that
    would run the entire md5 signature pipeline a second time per doc."""
    assert k % bands == 0
    r = k // bands
    sig = _signature_array(F.col(text_col), k, shingle_n)

    def band_keys(s: F.Column) -> F.Column:
        # null sig (no shingles) → null array → explode emits nothing
        return F.when(
            s.isNotNull(),
            F.array(
                *[
                    F.md5(F.concat_ws("|", *[s.getItem(b * r + i) for i in range(r)]))
                    for b in range(bands)
                ]
            ),
        )

    return (
        widen(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(EX.bind(sig, band_keys)).alias("band_key"),
        )
        .filter(F.col("band_key").isNotNull())
        .distinct()
    )


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
    banded = _banded_keys(docs, id_col, text_col, k, bands, shingle_n)
    # Bucket cap as a count window over the band_key partitioning (not a
    # separate sizes-agg + join-back): the window's exchange is the SAME
    # hashpartitioning(band_key) the self-join needs, so AQE's exchange
    # reuse materializes the signature pipeline exactly once and every
    # other consumer reads the shuffled bytes. The previous agg+join-back
    # shape evaluated the md5 pipeline three times (sizes, build, probe).
    w = Window.partitionBy("band_key")
    capped = (
        banded.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    pairs = (
        capped.alias("a")
        .join(capped.alias("b").hint("shuffle_hash"), "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def minhash_lsh_pairs_between(
    new: DataFrame,
    old: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 3,
    shingle_n: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Incremental dedup: near-dup candidates ONLY across snapshots —
    each new doc vs the existing corpus, never corpus × corpus. The
    dominant quadratic term of a full self-join (old×old, the corpus
    against itself) is skipped entirely, so the cost of deduplicating a
    new crawl is O(new · collision rate), independent of corpus size.
    The bucket cap applies to the CORPUS side (boilerplate band keys are
    the blowup risk there); the join is a plain band-key equi-join, so
    at 100 TB the corpus's banded table can be written once and reused
    per crawl. Returns (new_id, old_id) distinct."""
    bn = _banded_keys(new, id_col, text_col, k, bands, shingle_n)
    bo = _banded_keys(old, id_col, text_col, k, bands, shingle_n)
    w = Window.partitionBy("band_key")
    bo_capped = (
        bo.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    return (
        bn.alias("n")
        .join(bo_capped.alias("o").hint("shuffle_hash"), "band_key")
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("o.doc_id").alias("old_id"),
        )
        .distinct()
    )


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

    Plan shape: per-doc set sizes are computed IN-ROW (array size before
    exploding — no counts aggregation, no two back-joins), and the
    inverted-index join keys are 60-bit integer shingle hashes rather
    than shingle strings (~4× smaller shuffle, long-vs-long compares).
    The only shuffle is the equi-join itself + the pair-count agg.
    """
    toks = TX.tokens(F.col(text_col))
    sh = F.array_distinct(TX.word_shingles(toks, shingle_n))

    def entries(l: F.Column) -> F.Column:
        # n_shingles rides inside the exploded struct: it's computed from
        # the let-bound array, so neither it nor the hash pipeline is
        # re-evaluated per exploded row (CollapseProject can't inline
        # through the lambda binding).
        return F.transform(
            l,
            lambda s: F.struct(
                TX.minhash_base_hashes(s)[0].alias("shash"),
                F.size(l).alias("n"),
            ),
        )

    # explode_outer: avoids the inferred size()>0 filter re-running the
    # shingle-hash pipeline; the null row an empty/null shingle set
    # produces is dropped right after (and would never survive the
    # equi-join anyway).
    ex = (
        widen(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(EX.bind(sh, entries)).alias("e"),
        )
        .filter(F.col("e").isNotNull())
        .select(
            "doc_id",
            F.col("e.n").alias("n_shingles"),
            F.col("e.shash").alias("shash"),
        )
    )
    # No join-strategy hint: locally Spark broadcasts one side (the
    # shingle pipeline is cheap enough that recomputing it beats an extra
    # shuffle); at scale both sides get natural exchanges and AQE's
    # exchange reuse computes the pipeline once.
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "shash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
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
    exploded = (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), F.explode_outer(toks).alias("tok"))
        .filter(F.col("tok").isNotNull())
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
    banded = sig.select("doc_id", "simhash", F.explode_outer(bands).alias("bk")).select(
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


# ---------------------------------------------------------------------------
# Connected components (duplicate-cluster assignment)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node in the pair graph, component =
    the minimum doc_id reachable — the canonical post-dedup step that
    turns pairwise matches into duplicate CLUSTERS (keep min-id, drop the
    rest).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds. Near-dup graphs are forests of tiny
    cliques, so the diameter is small; each round is one equi-join + one
    agg (both shuffle on node id, AQE-coalesced), and localCheckpoint
    truncates the lineage so the plan stays O(1) per round instead of
    nesting. Convergence is detected by the strictly-decreasing label
    sum — one cheap scalar action per round, no full-table compare. At
    social-graph scale (long chains) swap the propagation body for the
    large-star/small-star rounds of Kiveris et al.; the loop shell,
    checkpointing, and convergence test stay the same.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["src"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# ---------------------------------------------------------------------------
# Pair verification (edit distance)
# ---------------------------------------------------------------------------


def verify_pairs_editdist(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The VERIFY stage of a dedup pipeline: exact edit distance over the
    candidate pairs only (candidates come from LSH/inverted-index
    generation, so the quadratic levenshtein cost is paid on O(matches),
    never O(n²)). Adds lev (edit distance over whitespace-normalized
    text) and sim = 1 - lev/max(len) in [0,1].

    Scale: two broadcast-or-shuffle equi-joins to attach the texts, then
    a narrow per-row compare. At 100 TB the joins shuffle on doc id —
    the same partitioning both sides of the pair stream already carry.
    """
    norm = TX.normalized(F.col(text_col))
    texts = docs.select(F.col(id_col), norm.alias("__t"))
    j = (
        pairs.join(
            texts.select(F.col(id_col).alias("doc_a"), F.col("__t").alias("__ta")),
            "doc_a",
        )
        .join(
            texts.select(F.col(id_col).alias("doc_b"), F.col("__t").alias("__tb")),
            "doc_b",
        )
    )
    lev = F.levenshtein("__ta", "__tb").cast("int")
    maxlen = F.greatest(F.length("__ta"), F.length("__tb"))
    sim = F.when(maxlen == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - lev.cast("double") / maxlen.cast("double")
    )
    return j.select(
        "doc_a", "doc_b", lev.alias("lev"), sim.alias("sim")
    )
