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
            F.col("a.n_shingles").cast("long").alias("n_a"),
            F.col("b.n_shingles").cast("long").alias("n_b"),
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


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Shingle CONTAINMENT near-dup pairs: |∩| / min(|A|, |B|) — the
    asymmetric-duplication detector. Jaccard misses subset duplication
    (a document embedded verbatim inside a much longer one scores
    |A|/|B| ≈ small), while containment of the smaller side scores it
    ≈ 1 — exactly the quote/boilerplate/snapshot-inclusion case a
    training-corpus dedup pass must catch (Broder's containment measure).

    Same inverted-index candidate join as ngram_jaccard_pairs (docs
    must share ≥1 shingle hash; never all-pairs) and the same
    integer-counts + one-IEEE-division determinism contract."""
    pairs = ngram_jaccard_pairs(
        docs, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, threshold=0.0,
    ).drop("jaccard")
    cont = F.col("n_inter").cast("double") / F.least(
        F.col("n_a"), F.col("n_b")
    ).cast("double")
    return (
        pairs.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "containment")
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
    reliable: bool | None = None,
) -> DataFrame:
    """(doc_id, component) for every node in the pair graph, component =
    the minimum doc_id reachable — the canonical post-dedup step that
    turns pairwise matches into duplicate CLUSTERS (keep min-id, drop the
    rest).

    Accelerated min-label propagation: each round every node takes

        c(u) ← min( c(u),  min over neighbors v of c(v),  c(c(u)) )

    — the neighbor term spreads the minimum one hop, the pointer-jump
    term c(c(u)) doubles the effective propagation distance (labels are
    always ids of reachable nodes, so the jump stays inside the
    component), giving O(log diameter) rounds instead of O(diameter):
    plain neighbor-min never converged within 25 rounds on the sf0.1
    near-dup graph (long chains, not just cliques), this does in ~6.
    Fixpoint ⇒ c(u) ≤ c(v) for every edge in both directions ⇒ labels
    are constant per component = the component's minimum id.

    Per-round cost is ONE driver action: all three update legs read only
    the previous round's MATERIALIZED labels, and the checkpoint that
    truncates lineage carries an observe() metric counting changed
    labels, so convergence detection rides the same job instead of a
    second full-table scan. The edge relation is checkpointed ONCE
    outside the loop with strip=False, keeping its honest plan stats
    (safe for statics — no round-over-round compounding; see
    operators/iterative.py). Each round's edges⋈labels join does
    re-exchange the edge side: under AQE a checkpoint reports
    UnknownPartitioning regardless (pinned in tests/test_iterative.py),
    so per-round partitioning reuse is not available on this engine —
    the exchange is linear in |E| per round, the same order as the join
    itself.

    Checkpoint durability: `reliable=None` (default) auto-selects
    `df.checkpoint()` when the context has a checkpoint dir configured
    (`spark.sparkContext.setCheckpointDir(...)` — survives executor
    loss, the right mode for 1000-executor runs) and falls back to
    `localCheckpoint` otherwise (executor-memory-resident: cheapest, but
    lineage is gone, so an executor loss fails the job — acceptable for
    short local runs, not for long cluster jobs). Pass True/False to
    force.
    """
    from pyspark.sql import Observation

    from .iterative import materialize, resolve_reliable

    reliable = resolve_reliable(pairs.sparkSession, reliable)

    def _materialize(df: DataFrame) -> DataFrame:
        return materialize(df, reliable)

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # strip=False: checkpointed once, outside the loop — keeps honest
    # stats; the repartition levels skew in the stored partitions (AQE
    # checkpoints don't preserve partitioning for join reuse, see
    # iterative.py)
    edges = materialize(
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition("dst"),
        reliable,
        strip=False,
    )
    labels = _materialize(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        jump = labels.select(
            F.col("doc_id").alias("__jsrc"), F.col("component").alias("__jc")
        ).join(
            labels.select(
                F.col("component").alias("__jsrc"),
                F.col("doc_id").alias("__jdst"),
            ),
            "__jsrc",
        ).select(
            F.col("__jdst").alias("__jump_id"),
            F.col("__jc").alias("jump_component"),
        )
        obs = Observation()
        labels = _materialize(
            labels.join(nbr_min, labels["doc_id"] == nbr_min["src"], "left")
            .join(jump, labels["doc_id"] == jump["__jump_id"], "left")
            .select(
                "doc_id",
                F.col("component").alias("__prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                    F.coalesce(F.col("jump_component"), F.col("component")),
                ).alias("component"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("__prev")).cast("long")
                ).alias("changed"),
            )
            .drop("__prev")
        )
        if not obs.get["changed"]:
            break
    return labels


def connected_components_twolevel(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    edges_per_partition: int = 2_000_000,
    reliable: bool | None = None,
) -> DataFrame:
    """Two-level connected components: partition-local union-find, then
    the iterative loop only on the (much smaller) cross-partition linker
    graph. Same contract as connected_components: (doc_id, component)
    with component = min doc_id in the connected component.

    Why two levels: the label-propagation loop pays a fixed per-round
    driver cost, and round count grows with graph diameter — the worst
    shape for long chains. Union-find is linear-time but needs the whole
    edge set in one memory. The standard large-scale resolution is to do
    both at their right granularity:

    1. LOCAL: edges are coalesced so each partition holds at most
       ~edges_per_partition rows (memory-bounded: a partition's DSU dict
       holds at most 2× that many nodes), and one Arrow-batched
       mapInPandas pass runs path-compressed union-find per partition,
       emitting (node, root) with root = min node id of the local
       component.
    2. LINK: a node whose edges landed in several partitions has several
       local roots; grouping the mapping by node links them — the linker
       graph has one edge per (node, extra-root), i.e. it shrinks with
       partition count, not data size.
    3. GLOBAL: connected_components() on the linker graph (tiny:
       its nodes are local roots only) resolves cross-partition merges
       in O(log linker-diameter) cheap rounds.
    4. APPLY: mapping ⋈ resolution, groupBy node, min — one shuffle.

    At 100 TB: step 1 scans the pair stream once (no shuffle beyond the
    coalesce), step 2 shuffles the mapping (≤ 2 rows per edge, usually
    ~1 per node), step 3 runs on data ~1000× smaller than the input.
    Locally (one partition) the linker graph is empty and the loop never
    runs. Ids must be integral (DSU schema is long).
    """
    import pandas as pd

    from .iterative import materialize, resolve_reliable

    reliable = resolve_reliable(pairs.sparkSession, reliable)

    def _materialize(df: DataFrame) -> DataFrame:
        return materialize(df, reliable)

    edges = _materialize(
        pairs.select(
            F.col(a_col).cast("long").alias("src"),
            F.col(b_col).cast("long").alias("dst"),
        )
    )
    n_edges = edges.count()  # cheap: counts the materialized RDD
    if n_edges == 0:
        return edges.select(
            F.col("src").alias("doc_id"), F.col("src").alias("component")
        )
    n_parts = max(1, -(-n_edges // edges_per_partition))
    cur_parts = edges.rdd.getNumPartitions()
    if cur_parts > n_parts:
        edges = edges.coalesce(n_parts)
    elif cur_parts < n_parts:
        # coalesce never SPLITS partitions — if the incoming stream has
        # fewer, larger partitions than the memory bound allows, a full
        # repartition (round-robin) is required to keep every local DSU
        # under ~2*edges_per_partition nodes (and it also levels skewed
        # input partitions). One extra shuffle of the edge list, paid
        # only when the bound would otherwise be violated.
        edges = edges.repartition(n_parts)

    def union_find(batches):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["src"], pdf["dst"]):
                a, b = int(a), int(b)
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by VALUE: min id wins, so roots are the
                    # local component minimum without a second pass
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "root": [find(x) for x in nodes]}
        )

    mapping = _materialize(edges.mapInPandas(union_find, "node long, root long"))

    linker = (
        mapping.groupBy("node")
        .agg(F.min("root").alias("rmin"), F.collect_set("root").alias("roots"))
        .select(F.explode("roots").alias("doc_a"), F.col("rmin").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    resolution = connected_components(linker, reliable=reliable)
    return (
        mapping.join(
            resolution, mapping["root"] == resolution["doc_id"], "left"
        )
        .groupBy(mapping["node"].alias("doc_id"))
        .agg(
            F.min(F.coalesce(resolution["component"], mapping["root"])).alias(
                "component"
            )
        )
    )


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


# ---------------------------------------------------------------------------
# Exact-substring overlap (Lee et al. 2022 ExactSubstr, distributed)
# ---------------------------------------------------------------------------


def exact_substring_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
    max_shingle_df: int = 64,
) -> DataFrame:
    """Verbatim ≥min_tokens-token cross-document overlap pairs — the
    ExactSubstr primitive of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed for Spark.

    Exactness: two documents contain the same verbatim run of ≥n tokens
    IFF they share at least one n-token shingle, so the shingle
    equi-join IS the decision procedure — unlike MinHash/SimHash there
    is no probability in it. The paper builds a suffix array (a
    single-machine construction); the inverted-index join is its
    shuffle-native equivalent, and the LONGEST shared run falls out
    relationally: matched shingle positions (pa, pb) lying on one
    diagonal (pa − pb) with consecutive pa form a gaps-and-islands
    run, and an L-token verbatim overlap is a run of L−n+1 shingles —
    the "longest common extension" computed as a window + groupBy
    instead of pointer-chasing.

    Output: (doc_a, doc_b, n_anchors, overlap_tokens) per unordered pair
    with doc_a < doc_b — n_anchors = matched shingle-position pairs,
    overlap_tokens = longest verbatim run in tokens (= max island + n−1).

    Scale: one df-count pass keeps only shingles with
    2 ≤ df ≤ max_shingle_df before the self-join — singleton shingles
    (the overwhelming majority of a real corpus) can never produce a
    pair, and hot boilerplate (licence headers, templates) above the cap
    would fan out quadratically at 100 TB; the cap is part of the
    operator's definition and must be mirrored by any oracle. The join
    keys on the shingle TEXT itself: exact, no hash-collision false
    positives, and Spark hashes the join key internally anyway. Window
    partitions on (pair, diagonal) — bounded by the pair's overlap, no
    global sort.
    """
    runs = _substring_runs(docs, id_col, text_col, min_tokens, max_shingle_df)
    return runs.groupBy("doc_a", "doc_b").agg(
        F.sum("run_len").cast("long").alias("n_anchors"),
        (F.max("run_len") + F.lit(min_tokens - 1))
        .cast("long")
        .alias("overlap_tokens"),
    )


def _substring_runs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int,
    max_shingle_df: int,
) -> DataFrame:
    """Shared anchor stage of the ExactSubstr family: one row per
    maximal matched run — (doc_a, doc_b, diag, isl, run_len, start_a,
    start_b), where a run of run_len consecutive shingles is a verbatim
    overlap of run_len + n − 1 tokens starting at (0-based) shingle
    positions start_a / start_b."""
    toks = TX.tokens(F.col(text_col))
    sh_arr = TX.word_shingles(toks, min_tokens)
    sh = (
        widen(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode_outer(sh_arr).alias("pos", "shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )
    # df-cap (2 ≤ distinct docs ≤ max) as two stacked windows over ONE
    # hashpartitioning(shingle) exchange, not a countDistinct agg +
    # join-back: the agg shape evaluated the tokenize/shingle/explode
    # pipeline three times (df sizes, build, probe of the self-join) —
    # the minhash_lsh_pairs bucket-cap lesson, adapted to a DISTINCT-doc
    # frequency: rows sorted by (doc_id, pos) within each shingle flag
    # the first row of each doc, and the full-partition sum of those
    # flags IS countDistinct(doc_id). The self-join then reuses the same
    # shuffled bytes for both sides.
    w_ord = Window.partitionBy("shingle").orderBy("doc_id", "pos")
    w_all = Window.partitionBy("shingle")
    first_in_doc = F.when(
        F.lag("doc_id").over(w_ord).isNull()
        | (F.lag("doc_id").over(w_ord) != F.col("doc_id")),
        F.lit(1),
    ).otherwise(F.lit(0))
    anchored = (
        sh.withColumn("_fid", first_in_doc)
        .withColumn("_df", F.sum("_fid").over(w_all))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_shingle_df))
        .drop("_fid", "_df")
    )
    m = (
        anchored.alias("a")
        .join(anchored.alias("b").hint("shuffle_hash"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    return (
        m.withColumn("diag", F.col("pa") - F.col("pb"))
        .withColumn("isl", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
        )
    )


def exact_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
    max_shingle_df: int = 64,
) -> DataFrame:
    """Per-document VERBATIM-overlap coverage — the REMOVE half of Lee
    et al.'s ExactSubstr (the paper deletes the duplicated spans, not
    whole documents; exact_substring_pairs is only the detector). For
    every document: merge all cross-document overlap spans it
    participates in (either side of any pair) into disjoint intervals,
    and report span count, covered tokens, and integer-exact coverage.

    Span merge is a second gaps-and-islands, at interval granularity:
    spans sorted by (start, end); a span whose start exceeds the
    running max end of everything before it opens a new island (one
    window flag + running sum — no self-join, no UDF). Output columns
    (doc_id, n_spans, covered_tokens, n_tokens, coverage_milli) are
    all-integer: coverage_milli = covered·1000 DIV n_tokens, so both
    engines agree bit-for-bit.

    Scale: inherits the anchor stage's df-prune bounds; the interval
    merge windows partition per doc over O(that doc's spans) rows."""
    from .iterative import materialize, resolve_reliable

    # runs feeds BOTH sides of the doc_a/doc_b span union below:
    # unmaterialized, the whole anchor stage (shingle explode + df-cap
    # windows + self-join + islands window) evaluates once per side.
    # The relation is O(matched runs) — pair-bounded, never corpus-wide.
    runs = materialize(
        _substring_runs(docs, id_col, text_col, min_tokens, max_shingle_df),
        resolve_reliable(docs.sparkSession, None),
        strip=False,
    )
    span_len = F.col("run_len") + F.lit(min_tokens - 1)
    spans = (
        runs.select(
            F.col("doc_a").alias("doc_id"),
            F.col("start_a").alias("s"),
            (F.col("start_a") + span_len - 1).alias("e"),
        )
        .unionAll(
            runs.select(
                F.col("doc_b").alias("doc_id"),
                F.col("start_b").alias("s"),
                (F.col("start_b") + span_len - 1).alias("e"),
            )
        )
        .distinct()
    )
    wo = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_isl",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum("new_isl").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = flagged.groupBy("doc_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("me") - F.col("ms") + 1).cast("long").alias(
            "covered_tokens"
        ),
    )
    lens = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(TX.tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return per_doc.join(lens, "doc_id").select(
        "doc_id",
        "n_spans",
        "covered_tokens",
        "n_tokens",
        F.expr("covered_tokens * 1000 DIV n_tokens").alias(
            "coverage_milli"
        ),
    )


def cdc_chunks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-defined chunking (queries.text_cdc_chunks is the
    registered stats view over this): stateless rolling-8-gram md5
    boundaries in a 1/32 target band, LAG-based >=8-char min-size
    suppression, then per-doc spans fingerprinted. Returns
    (doc_id, fp, clen) — one row per chunk.

    Boundary placement is a pure function of the 8-gram, so two
    documents sharing a run of text cut it at the SAME offsets and
    produce bit-identical chunk fingerprints — the property both the
    chunk-dedup stats and the containment pair miner build on. Scale:
    the position explode is bounded by doc length; corpus-wide shuffles
    move (doc_id, cut) longs and 16-byte fingerprints, never text (the
    one text re-join is doc-keyed).

    Plan shape (r16): the end-of-doc sentinel cut joins the boundary
    stream BEFORE the min-size window (flagged `is_len`, exempt from
    suppression and ordered after a tying raw cut), so the suppression
    lag and the span lag are two stacked windows over ONE
    hashpartitioning(doc_id) exchange — the former
    kept → UNION sentinel → DISTINCT → second window chain paid two
    more exchanges for the same rows. Equivalence: sentinels sort last
    in their doc (cut = LENGTH ≥ every boundary cut, is_len breaks the
    tie), so no raw cut's suppression lag ever sees a sentinel, and a
    kept raw cut that EQUALS the doc length yields the duplicate pair
    (cut=len, prev=p), (cut=len, prev=len) of which the second dies on
    the cut > prev filter — exactly the row the old DISTINCT removed."""
    from pyspark.sql import Window as W

    pos = docs.filter(F.length(text_col) >= 8).select(
        "doc_id",
        text_col,
        F.explode(
            F.sequence(F.lit(1), F.length(text_col) - F.lit(7))
        ).alias("i"),
    )
    bnd = pos.filter(
        F.substring(F.md5(F.expr(f"substring({text_col}, i, 8)")), 1, 2)
        < "08"
    ).select(
        "doc_id",
        (F.col("i") + 7).cast("long").alias("cut"),
        F.lit(False).alias("is_len"),
    )
    cuts = bnd.unionByName(
        docs.filter(F.length(text_col) > 0).select(
            "doc_id",
            F.length(text_col).cast("long").alias("cut"),
            F.lit(True).alias("is_len"),
        )
    )
    wdoc = W.partitionBy("doc_id").orderBy("cut", "is_len")
    kept = cuts.withColumn("pc", F.lag("cut", 1, -7).over(wdoc)).filter(
        F.col("is_len") | (F.col("cut") - F.col("pc") >= 8)
    )
    spans = kept.withColumn("prev", F.lag("cut", 1, 0).over(wdoc))
    return (
        spans.join(docs.select("doc_id", text_col), "doc_id")
        .filter(F.col("cut") > F.col("prev"))
        .select(
            "doc_id",
            F.md5(
                F.expr(
                    f"substring({text_col}, CAST(prev + 1 AS INT),"
                    " CAST(cut - prev AS INT))"
                )
            ).alias("fp"),
            (F.col("cut") - F.col("prev")).alias("clen"),
        )
    )


def cdc_containment_pairs(
    docs: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_df: int = 10,
) -> DataFrame:
    """Near-duplicate pairs by CDC chunk containment — the
    rsync/RefinedWeb-style alternative to MinHash: two documents are
    candidates iff they share a literal >=8-char chunk (an equi-join on
    chunk fingerprints, never all-pairs), and a pair is emitted when

        |chunks(a) ∩ chunks(b)|  >=  (num/den) · min(|a|, |b|)

    — containment, not Jaccard, so a small doc swallowed by a large one
    still surfaces (the contamination/quote-detection semantics MinHash
    Jaccard dilutes). The comparison is cross-multiplied integer
    arithmetic; the one division happens only in the reported score.

    Scale: chunk fingerprints with document frequency > max_df are
    dropped from candidate generation (boilerplate chunks otherwise
    create quadratic buckets — same role as the LSH max_bucket cap and
    the substring index's df cap); every remaining bucket contributes
    at most max_df² pairs, so the pair stream is linear in corpus size
    with a constant factor, and blobs never shuffle — only 16-byte
    fingerprints and counts."""
    from .iterative import materialize, resolve_reliable

    # (doc_id, fp) is referenced four times downstream (sizes, df cap,
    # both self-join sides); without materialization the CDC chunking
    # HOF chain re-evaluates per reference (measured: 18 parquet scans,
    # 0 reused exchanges in the final adaptive plan at sf0.1)
    chunks = materialize(
        cdc_chunks(docs).select("doc_id", "fp").distinct(),
        resolve_reliable(docs.sparkSession, None),
        strip=False,
    )
    sizes = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    df_ok = (
        chunks.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    slim = chunks.join(df_ok, "fp")
    a = slim.select(F.col("doc_id").alias("doc_a"), "fp")
    b = slim.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_chunks"))
    )
    na = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("n_a")
    )
    nb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("n_b")
    )
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.col("shared_chunks") * threshold_den
            >= F.least("n_a", "n_b") * threshold_num
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_chunks",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("shared_chunks").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# paragraph-granularity exact dedup (the RefinedWeb/Dolma pipeline stage)
# ---------------------------------------------------------------------------


def paragraph_chunks(
    docs: DataFrame,
    size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, p, fp, ck) — the non-overlapping `size`-token
    passages of every document with their md5 fingerprint and the
    composite keeper key doc_id·1024 + chunk_idx. Shared derivation of
    paragraph_dedup and its streaming twin
    (streaming/incremental.py:incremental_paragraph_dedup): both sides
    MUST chunk and fingerprint identically or the carried seen-set
    diverges from the batch oracle. Narrow (one Generate, no shuffle).

    Empty-document semantics (ADVICE r12, deliberate): a zero-token /
    whitespace-only document still emits ONE chunk — the empty passage
    (p='', fp=md5('')) — so all empty docs dedup against each other and
    exactly one keeps text_dedup=''. This mirrors the paired oracle SQL
    and keeps the "one output row per input doc" contract; filtering
    them to n_chunks=0 would drop empty docs from the reassembly.

    The composite keeper key assumes doc_id >= 0 (a negative id would
    invert the (doc_id, chunk_idx) keep-first order under the ·1024
    packing); enforced below alongside the 1024-chunk bound."""
    t = TX.tokens(F.col(text_col))

    def mk(tc: F.Column) -> F.Column:
        n_chunks = (
            (F.greatest(F.size(tc) - size, F.lit(0)) + (size - 1))
            .cast("long")
            / size
        ).cast("long") + 1
        return F.struct(
            tc.alias("t"), F.sequence(F.lit(0), n_chunks - 1).alias("idx")
        )

    return (
        docs.select(F.col(id_col).alias("doc_id"), EX.bind(t, mk).alias("s"))
        .select("doc_id", F.col("s.t").alias("t"), F.explode("s.idx").alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(
                " ", F.slice(F.col("t"), F.col("chunk_idx") * size + 1, size)
            ).alias("p"),
        )
        .withColumn("fp", F.md5(F.col("p")))
        .withColumn(
            "ck",
            F.col("doc_id") * 1024
            + F.col("chunk_idx")
            # assert_true yields NULL on pass and raises on violation, so
            # coalesce keeps the composite exact while enforcing both the
            # chunk bound and the non-negative doc_id the packing assumes
            + F.coalesce(
                F.assert_true(
                    (F.col("chunk_idx") < 1024) & (F.col("doc_id") >= 0),
                    F.lit(
                        "paragraph_dedup: document exceeds 1024 chunks"
                        " or doc_id is negative"
                    ),
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level EXACT paragraph dedup with document reassembly: split
    every document into non-overlapping `size`-token passages (the same
    paragraph proxy as passage-LSH — this corpus has no newlines),
    fingerprint each passage, keep exactly ONE copy of every distinct
    passage corpus-wide (the first occurrence in (doc_id, chunk_idx)
    order), and rebuild each document from its surviving passages.

    This is the stage crawl pipelines run between whole-document exact
    dedup and near-dup: boilerplate paragraphs (headers, footers,
    license blocks) repeat across MILLIONS of otherwise-distinct pages,
    so document-granularity fingerprints never fire, while removing the
    repeated paragraph everywhere but its first occurrence recovers the
    bulk of the duplication.

    Output: (doc_id, n_chunks, n_kept, text_dedup) for EVERY input
    document — a doc whose every passage already appeared elsewhere
    comes back with n_kept = 0 and text_dedup = ''.

    Plan/scale: chunking is a narrow Generate (no shuffle); the
    keep-first rule is one hash-agg on the passage fingerprint
    (min composite key, window-free — map-side partial agg makes the
    shuffle proportional to #distinct passages) followed by an
    equi-join back on the SAME fingerprint key (shares the hash
    partitioning); reassembly is one doc-keyed agg. Nothing is
    quadratic; the fingerprint shuffle carries 16-byte digests, never
    passage text. The composite keeper key is doc_id·1024 + chunk_idx,
    exact while chunk_idx < 1024 (enforced below — at size=32 that is
    docs up to 32k tokens; raise `size` for longer documents).
    """
    chunked = paragraph_chunks(docs, size=size, id_col=id_col, text_col=text_col)
    keepers = chunked.groupBy("fp").agg(F.min("ck").alias("keep_ck"))
    flagged = chunked.join(keepers, "fp").withColumn(
        "kept", (F.col("ck") == F.col("keep_ck")).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
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
