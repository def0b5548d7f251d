"""'sample'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    W,
    _CAP_BUDGET,
    _DOMAIN_CAP_SQL,
    _D_FLAT,
    _D_NORM,
    _D_TOKS,
    _EPOCHS,
    _FILL_BUDGET,
    _EMB_DIMS,
    _IVF_CELLS,
    _LSH_MAX_BUCKET,
    _MINHASH_BANDS,
    _MINHASH_K,
    _MIX_SCALE,
    _MIX_WEIGHTS,
    _SW,
    _kcenter_step,
    _km_assign_sql,
    _km_update_sql,
    _minhash_sig_sql,
    load_table,
    register,
)


@register(
    "sample_balanced_pairs",
    f"""
    WITH {_minhash_sig_sql()},
    pos AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    neg0 AS (
      SELECT least(doc_id, (doc_id + 250) % 500) AS doc_a,
             greatest(doc_id, (doc_id + 250) % 500) AS doc_b
      FROM documents WHERE doc_id <> (doc_id + 250) % 500),
    neg AS (
      SELECT DISTINCT n.doc_a, n.doc_b FROM neg0 n
      LEFT JOIN pos p ON n.doc_a = p.doc_a AND n.doc_b = p.doc_b
      WHERE p.doc_a IS NULL)
    SELECT doc_a, doc_b, 1 AS label FROM pos
    UNION ALL
    SELECT doc_a, doc_b, 0 AS label FROM neg
    """,
)
def sample_balanced_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair assembly: positives = LSH near-dup
    candidates (label 1), negatives = a deterministic derangement-style
    pairing (doc_id ↔ doc_id+N/2 mod N, normalized to doc_a < doc_b)
    with any accidental positive removed by anti-join (label 0) — the
    build step for embedding/reranker training sets. Deterministic
    throughout: no random sampling, the negative pairing is pure
    arithmetic, and the anti-join guarantees label consistency. Scale:
    positives are O(collisions); negatives are one narrow projection +
    one anti-join on the pair key."""
    from ..operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pos = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    partner = (F.col("doc_id") + 250) % 500
    neg = (
        docs.select(
            F.least(F.col("doc_id"), partner).alias("doc_a"),
            F.greatest(F.col("doc_id"), partner).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
        .join(pos, ["doc_a", "doc_b"], "left_anti")
    )
    return pos.select(
        "doc_a", "doc_b", F.lit(1).alias("label")
    ).unionByName(neg.select("doc_a", "doc_b", F.lit(0).alias("label")))


@register(
    "sample_split_by_cluster",
    f"""
    WITH RECURSIVE {_minhash_sig_sql()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component
             FROM reach GROUP BY src),
    comp_all AS (
      SELECT doc_id, component FROM comp
      UNION ALL
      SELECT d.doc_id, d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM comp))
    SELECT doc_id, component,
           CASE WHEN ('0x' || substring(md5(CAST(component AS VARCHAR)),
                      1, 8))::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substring(md5(CAST(component AS VARCHAR)),
                      1, 8))::BIGINT % 10 < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM comp_all
    """,
)
def sample_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the split key is the near-dup
    CLUSTER, not the document — so a document and its near-duplicates
    can never straddle train and test (the contamination a plain
    per-doc hash split silently permits whenever the corpus has
    near-dups, which is always). 80/10/10 by md5 of the cluster id —
    the same deterministic hash-split contract as sample_hash_split,
    one level up. Singleton docs are their own cluster via the
    anti-join union, so every document gets exactly one split label.

    Scale: the split adds ONE hash projection to the CC output — the
    cost is the dedup clustering the pipeline already ran."""
    from ..operators.dedup import (
        connected_components_twolevel,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    comp = connected_components_twolevel(pairs)
    singles = docs.join(comp, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("component")
    )
    comp_all = comp.select("doc_id", "component").unionByName(singles)
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % 10
    )
    return comp_all.select(
        "doc_id",
        "component",
        F.when(bucket < 8, "train")
        .when(bucket < 9, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "sample_cluster_balanced",
    f"""
    WITH cent0 AS (
      SELECT i // 64 AS c, list(
               ((1103515245 * (7919 + i) + 12345) % 2147483648) % 2001 - 1000
               ORDER BY i) AS cv
      FROM unnest(generate_series(0, {_IVF_CELLS} * 64 - 1)) AS t(i)
      GROUP BY 1),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    {_km_assign_sql("cent0", "a0")},
    {_km_update_sql("a0", "cent0", "cent1")},
    {_km_assign_sql("cent1", "a1")},
    {_km_update_sql("a1", "cent1", "cent2")},
    {_km_assign_sql("cent2", "afinal")}
    SELECT CAST(cluster AS INTEGER) AS cluster, vec_id,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT cluster, vec_id,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                         vec_id) AS rn
      FROM afinal) WHERE rn <= 25
    """,
)
def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling — the curation step k-means exists for:
    exactly 25 vectors per semantic cluster, md5(id)-ranked so the draw
    is uniform pseudo-random yet engine-reproducible (same contract as
    sample_stratified, stratum = learned cluster instead of a label
    column). Counters the head-heavy topic skew a uniform sample keeps:
    every semantic region contributes equally to the curated set."""
    from ..operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assign(emb, k=_IVF_CELLS, rounds=2, dims=_EMB_DIMS)
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        clusters.select("cluster", "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
    )


@register(
    "sample_kcenter_coreset",
    f"""
    WITH {_D_FLAT},
    st0 AS (SELECT vec_id, CAST(-2.0 AS DOUBLE) AS pen FROM embeddings),
    {_kcenter_step(1)},
    {_kcenter_step(2)},
    {_kcenter_step(3)},
    {_kcenter_step(4)},
    {_kcenter_step(5)},
    {_kcenter_step(6)}
    SELECT position, vec_id, cover_cos FROM (
      SELECT 1 AS position, vid AS vec_id, NULLIF(ppen, -2.0) AS cover_cos
        FROM p1
      UNION ALL SELECT 2, vid, NULLIF(ppen, -2.0) FROM p2
      UNION ALL SELECT 3, vid, NULLIF(ppen, -2.0) FROM p3
      UNION ALL SELECT 4, vid, NULLIF(ppen, -2.0) FROM p4
      UNION ALL SELECT 5, vid, NULLIF(ppen, -2.0) FROM p5
      UNION ALL SELECT 6, vid, NULLIF(ppen, -2.0) FROM p6)
    """,
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset of the embedding table
    (operators/similarity.py:kcenter_coreset, k=6): diversity-first
    subset selection — each pick is the vector least similar to
    everything already chosen. The state relation carries an
    incrementally-maxed penalty, so the plan is k narrow passes with
    1-row broadcasts, never a pairwise matrix; the oracle unrolls the
    same incremental identity as CTEs."""
    from ..operators.similarity import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=6)


@register(
    "sample_fill_budget",
    f"""
    WITH toks AS (SELECT doc_id, text, {_D_TOKS} AS t FROM documents),
    q AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        (CASE WHEN len(t) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END
         + CASE WHEN CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) >= 0.6
                THEN 1 ELSE 0 END
         + CASE WHEN CAST(LENGTH(text) - (len(t) - 1) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE) BETWEEN 2.0 AND 12.0
                THEN 1 ELSE 0 END
         + CASE WHEN CAST(len(list_filter(t,
                       x -> list_contains({_SW['en']}, x))) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE) > 0.0
                THEN 1 ELSE 0 END) AS quality
      FROM toks),
    c AS (
      SELECT doc_id, n_tokens, quality,
             SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM q)
    SELECT doc_id, CAST(quality AS INTEGER) AS quality, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {_FILL_BUDGET}
    """,
)
def sample_fill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global best-first budget fill — "spend my N-token budget on the
    best documents": order by the Gopher quality score (doc_id
    tiebreak), running token sum, keep while within budget. The final
    assembly step when the budget, not the corpus, is the binding
    constraint (ablation sets, curriculum heads, eval-slice builds);
    the per-SOURCE quota twin is sample_domain_cap.

    Scale: the global quality order is ONE unpartitioned window — at
    100 TB swap in range-partitioned sort (the engine's sort shuffle
    does exactly this) or bucket the quality score first; the prefix
    sum itself is the pack_sequences scan pattern."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    q = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        TX.quality_score(F.col("text"), toks).alias("quality"),
    )
    wq = W.orderBy(F.desc("quality"), F.asc("doc_id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(wq))
        .filter(F.col("cum_tokens") <= _FILL_BUDGET)
        .select(
            "doc_id",
            F.col("quality").cast("int").alias("quality"),
            "n_tokens",
            "cum_tokens",
        )
    )


@register(
    "sample_epoch_repeats",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
      FROM documents),
    cp AS (
      SELECT doc_id, lang,
             CASE lang
               {" ".join(f"WHEN '{k}' THEN {p} // {q} + CASE WHEN (r - 1) % {q} < {p} % {q} THEN 1 ELSE 0 END"
                         for k, (p, q) in _EPOCHS.items())}
               ELSE 1 END AS copies
      FROM ranked)
    SELECT doc_id, lang, CAST(i AS INTEGER) AS copy_idx
    FROM cp, unnest(generate_series(1, copies)) AS t(i)
    """,
)
def sample_epoch_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch repetition schedule: each language's documents
    appear ⌈e⌉ or ⌊e⌋ times so the average equals the recipe's epoch
    factor EXACTLY (en 2.5, de 1.5, fr 1.0, zh 2.0, es 0.5 — a factor
    below 1 is a deterministic subsample). This is the "N epochs of
    source X" knob of production pretraining mixes, with none of the
    sampling variance: ranks come from the stable md5 shuffle, and a
    rank-r document of a p/q-epoch language gets p DIV q extra copies
    plus one more iff (r−1) mod q < p mod q — integer arithmetic both
    engines share, mean exactly p/q over any q consecutive ranks.

    Scale: one lang-keyed rank window + an in-row explode of ≤⌈e⌉
    copy indices — output size is the token budget the recipe chose,
    there is no shuffle after the rank."""
    docs = load_table(spark, sf_dir, "documents")
    wl = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    copies_expr = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {p} DIV {q}"
        f" + (CASE WHEN (r - 1) % {q} < {p} % {q} THEN 1 ELSE 0 END)"
        for k, (p, q) in _EPOCHS.items()
    ) + " ELSE 1 END"
    cp = docs.select(
        "doc_id", "lang", F.row_number().over(wl).alias("r")
    ).withColumn("copies", F.expr(copies_expr))
    # sequence(1, 0) is DESCENDING in Spark (the _bigram_lm lesson):
    # guard the zero-copy (subsampled-out) documents to an empty array
    # so explode drops them, matching generate_series(1, 0) = empty
    idx = F.when(
        F.col("copies") >= 1,
        F.sequence(F.lit(1), F.col("copies").cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return cp.select(
        "doc_id",
        "lang",
        F.explode(idx).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("int"))


@register(
    "sample_softdedup_weights",
    f"""
    WITH fp AS (
      SELECT doc_id, md5({_D_NORM}) AS fingerprint FROM documents),
    g AS (
      SELECT fingerprint, COUNT(*) AS n_copies FROM fp GROUP BY 1)
    SELECT fp.doc_id, g.n_copies,
           CAST(1000000 // g.n_copies AS BIGINT) AS weight_fp,
           CAST(1000000 // g.n_copies AS DOUBLE) / 1000000.0 AS weight
    FROM fp JOIN g USING (fingerprint)
    """,
)
def sample_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of DROPPING duplicates, every document gets a
    training weight 1/|its exact-dup cluster| so each distinct content
    contributes unit mass — the reweighting alternative to hard dedup
    (soft-dedup ablations show it preserves diversity the drop loses,
    and it is the only option when the loader cannot delete rows). The
    weight rides as exact integer fixed-point (10^6 DIV n_copies) with
    the double view derived by ONE division, bit-identical across
    engines.

    Scale: one fingerprint hash-agg (map-side combinable) + one
    fingerprint-keyed join back — both sides partition on the same key,
    no second shuffle. Composes with sample_temperature_weights (weight
    product) and text_pack_sequences (weighted budgets) unchanged."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.select(
        "doc_id",
        TX.content_fingerprint(F.col("text")).alias("fingerprint"),
    )
    g = with_fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    wfp = F.expr("1000000 DIV n_copies")
    return with_fp.join(g, "fingerprint").select(
        "doc_id",
        "n_copies",
        wfp.cast("long").alias("weight_fp"),
        (wfp.cast("double") / F.lit(1000000.0)).alias("weight"),
    )


@register(
    "sample_stratified",
    """
    SELECT lang, doc_id, CAST(rn AS INTEGER) AS rn FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents) WHERE rn <= 20
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic sample: md5(id) ordering is
    uniform pseudo-random yet reproducible on any engine — no rand(), no
    seed state. One shuffle on the stratum key; rank+filter top-k."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", k=20)


@register(
    "sample_hash_split",
    """
    SELECT split, lang, COUNT(*) AS n FROM (
      SELECT lang,
             CASE WHEN b < 8 THEN 'train'
                  WHEN b < 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT lang,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT % 10 AS b
            FROM documents))
    GROUP BY split, lang
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by id-hash bucket
    — adding a document never reshuffles the others (the stability
    property rand() splits lack). The split column itself is narrow (no
    shuffle); this query aggregates per-split counts to verify the
    assignment."""
    from ..operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sample_temperature_weights",
    """
    WITH g AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    w AS (SELECT lang, n_docs,
                 CAST(FLOOR(1048576.0 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                   AS w_fixed
          FROM g),
    tot AS (SELECT CAST(SUM(w_fixed) AS BIGINT) AS tot_w,
                   CAST(SUM(n_docs) AS BIGINT) AS tot_n FROM w)
    SELECT w.lang, CAST(w.n_docs AS BIGINT) AS n_docs,
           CAST(w.n_docs AS DOUBLE) / CAST(t.tot_n AS DOUBLE) AS nat_share,
           CAST(w.w_fixed AS DOUBLE) / CAST(t.tot_w AS DOUBLE) AS temp_share
    FROM w CROSS JOIN tot t
    """,
)
def sample_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based sampling weights per language group (the
    multilingual-pretraining rebalance: p_g^alpha / sum p_g^alpha with
    alpha = 0.5, which upsamples low-resource groups). alpha = 0.5 is
    exactly sqrt, the ONE power that is correctly-rounded IEEE on every
    engine — fixed-point floor(2^20 * sqrt(n)) makes the weights exact
    integers, so the normalizing sum is order-independent and the final
    shares are single correctly-rounded divides. Scale: one corpus scan
    into a group-count agg; everything after operates on the
    groups-sized table (bounded, broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    # groups-sized and consumed twice (normalizer + final select) —
    # checkpoint so the corpus is scanned once, not per consumer
    g = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )
    w = g.select(
        "lang",
        "n_docs",
        F.floor(F.lit(1048576.0) * F.sqrt(F.col("n_docs").cast("double")))
        .cast("long")
        .alias("w_fixed"),
    )
    tot = w.agg(
        F.sum("w_fixed").alias("tot_w"), F.sum("n_docs").alias("tot_n")
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("tot_n").cast("double")).alias(
            "nat_share"
        ),
        (F.col("w_fixed").cast("double") / F.col("tot_w").cast("double")).alias(
            "temp_share"
        ),
    )


@register(
    "sample_hard_negatives",
    """
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    n AS (SELECT vec_id, label, qv,
                 CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
          FROM q),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(b.label AS INTEGER) AS neighbor_label,
             list_dot_product(a.qv, b.qv)
               / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) AS cos_sim
      FROM n a JOIN n b ON a.label <> b.label
      WHERE a.vec_id < 10)
    SELECT query_id, neighbor_id, neighbor_label, cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py:hard_negative_topk):
    per query, the 3 most-similar DIFFERENT-label vectors — the
    contrastive-training negatives that actually carry gradient, next to
    `sample_balanced_pairs`' positives. Bounded query set broadcasts;
    label inequality rides the join; exact quantized-integer cosine so
    the ranking hash-compares."""
    from ..operators.similarity import hard_negative_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


@register(
    "sample_perplexity_buckets",
    """
    WITH docs_arr AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    bg AS (
      SELECT doc_id, a[i] AS w1, a[i] || ' ' || a[i + 1] AS b
      FROM docs_arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    uc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    bc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
    lm AS (
      SELECT bg.doc_id, COUNT(*) AS nb,
             CAST(SUM(bc.c * 1000000 // uc.c) AS BIGINT) AS fp
      FROM bg JOIN bc USING (b) JOIN uc ON uc.w = bg.w1
      GROUP BY bg.doc_id),
    scored AS (
      SELECT d.doc_id, d.lang, lm.fp // lm.nb AS avg_fp
      FROM documents d JOIN lm ON lm.doc_id = d.doc_id),
    tiled AS (
      SELECT doc_id, lang, avg_fp,
             NTILE(3) OVER (PARTITION BY lang
               ORDER BY avg_fp DESC, doc_id) AS tile
      FROM scored)
    SELECT doc_id, lang, CAST(avg_fp AS BIGINT) AS avg_fp,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(CASE WHEN tile <= 2 THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM tiled
    """,
)
def sample_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): per language, rank documents by language-model fluency and
    split into NTILE(3) buckets — the head+middle survive (`kept`), the
    tail is the noise CCNet drops. The LM is the self-trained bigram
    model of text_bigram_lm_score (that query's plan IS the scoring
    subtree here — integer fixed-point mass, no log-float accumulation),
    with per-doc mean mass avg_fp = fp DIV n_bigrams, exact int64.

    Scale: scoring is the vocab-bounded broadcast-agg of the LM query;
    the bucketing adds ONE lang-partitioned window (same shuffle key as
    the mixture/stratified family). NTILE over (score, doc_id) is fully
    deterministic — no rand() stream to diverge between engines."""
    lm = text_bigram_lm_score(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = docs.join(lm, "doc_id").select(
        "doc_id",
        "lang",
        F.expr("lm_fp DIV n_bigrams").alias("avg_fp"),
    )
    wt = W.partitionBy("lang").orderBy(F.desc("avg_fp"), F.asc("doc_id"))
    tiled = scored.withColumn("tile", F.ntile(3).over(wt))
    return tiled.select(
        "doc_id",
        "lang",
        F.col("avg_fp").cast("long").alias("avg_fp"),
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        F.when(F.col("tile") <= 2, 1).otherwise(0).cast("int").alias("kept"),
    )


@register(
    "sample_mixture_schedule",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
      FROM documents),
    keyed AS (
      SELECT doc_id, lang,
             r * ({_MIX_SCALE} // CASE lang
                 {" ".join(f"WHEN '{k}' THEN {v}"
                           for k, v in _MIX_WEIGHTS.items())}
                 ELSE 1 END) AS k
      FROM ranked)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, lang, doc_id) AS BIGINT)
             AS position,
           lang, doc_id
    FROM keyed
    QUALIFY position <= 100
    """,
)
def sample_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing schedule: the exact interleave order a
    training run should consume documents in, given per-language
    mixture weights — the low-discrepancy (stride-scheduling) analog of
    multinomial source sampling, with none of the randomness. Each
    language's docs are ranked by a stable md5 shuffle, doc r of a
    weight-w language gets integer key r·(SCALE/w), and the global sort
    of those keys interleaves languages in exact weight proportion over
    ANY prefix (after k positions, language ℓ has ≈ k·wℓ/Σw docs — the
    property curriculum/mixture training needs and multinomial sampling
    only has in expectation).

    Scale: rank + key are one per-language window over a lang-keyed
    shuffle; the global order is a sort by the key — which is exactly
    the order the schedule gets WRITTEN in, so the sort is the output,
    not overhead. First 100 positions emitted here to keep the gate
    output bounded."""
    docs = load_table(spark, sf_dir, "documents")
    wl = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    stride = F.lit(_MIX_SCALE) / F.create_map(
        *[
            x
            for k, v in _MIX_WEIGHTS.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )[F.col("lang")]
    keyed = docs.select(
        "doc_id",
        "lang",
        (F.row_number().over(wl) * stride.cast("long")).alias("k"),
    )
    wg = W.orderBy("k", "lang", "doc_id")
    return (
        keyed.withColumn("position", F.row_number().over(wg).cast("long"))
        .filter(F.col("position") <= 100)
        .select("position", "lang", "doc_id")
    )


@register(
    "sample_mixture_eval",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
      FROM documents),
    keyed AS (
      SELECT doc_id, lang,
             r * ({_MIX_SCALE} // CASE lang
                 {" ".join(f"WHEN '{k}' THEN {v}"
                           for k, v in _MIX_WEIGHTS.items())}
                 ELSE 1 END) AS k
      FROM ranked),
    sched AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, lang, doc_id) AS BIGINT)
               AS position, lang
      FROM keyed),
    pfx AS (SELECT unnest([25, 50, 100, 200]) AS prefix_n),
    counts AS (
      SELECT p.prefix_n, s.lang, COUNT(*) AS n
      FROM sched s JOIN pfx p ON s.position <= p.prefix_n
      GROUP BY p.prefix_n, s.lang),
    w AS (SELECT SUM(v) AS tot FROM (
            SELECT unnest([{", ".join(str(v) for v in _MIX_WEIGHTS.values())}]) AS v))
    SELECT c.prefix_n, c.lang, CAST(c.n AS BIGINT) AS n,
           CAST(CASE c.lang
                {" ".join(f"WHEN '{k}' THEN {v}"
                          for k, v in _MIX_WEIGHTS.items())}
                ELSE 0 END * c.prefix_n AS BIGINT) AS expected_x_tot,
           CAST(c.n * w.tot AS BIGINT) AS actual_x_tot,
           CAST(ABS(c.n * w.tot - CASE c.lang
                {" ".join(f"WHEN '{k}' THEN {v}"
                          for k, v in _MIX_WEIGHTS.items())}
                ELSE 0 END * c.prefix_n) AS BIGINT) AS deviation_x_tot
    FROM counts c CROSS JOIN w
    """,
)
def sample_mixture_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-schedule EVALUATION: for every prefix length the loader
    might stop at (25/50/100/200), the per-language consumed count vs
    the weight-proportional target — all scaled by Σweights so the
    comparison stays integer (n·Σw vs w·prefix; stride scheduling
    bounds the deviation by Σw per language, which is what this query
    lets a reviewer verify from the schedule itself, fifth member of
    the in-engine eval family). One schedule sort + a 4-row prefix
    cross join + one keyed agg."""
    docs = load_table(spark, sf_dir, "documents")
    wl = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    stride = F.lit(_MIX_SCALE) / F.create_map(
        *[x for k, v in _MIX_WEIGHTS.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("lang")]
    keyed = docs.select(
        "doc_id",
        "lang",
        (F.row_number().over(wl) * stride.cast("long")).alias("k"),
    )
    sched = keyed.select(
        F.row_number()
        .over(W.orderBy("k", "lang", "doc_id"))
        .cast("long")
        .alias("position"),
        "lang",
    )
    pfx = spark.createDataFrame(
        [(25,), (50,), (100,), (200,)], "prefix_n int"
    )
    counts = (
        sched.join(F.broadcast(pfx), F.col("position") <= F.col("prefix_n"))
        .groupBy("prefix_n", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = sum(_MIX_WEIGHTS.values())
    wmap = F.create_map(
        *[x for k, v in _MIX_WEIGHTS.items() for x in (F.lit(k), F.lit(v))]
    )
    wexpr = F.coalesce(wmap[F.col("lang")], F.lit(0))
    return counts.select(
        "prefix_n",
        "lang",
        F.col("n").cast("long").alias("n"),
        (wexpr * F.col("prefix_n")).cast("long").alias("expected_x_tot"),
        (F.col("n") * F.lit(tot)).cast("long").alias("actual_x_tot"),
        F.abs(F.col("n") * F.lit(tot) - wexpr * F.col("prefix_n"))
        .cast("long")
        .alias("deviation_x_tot"),
    )


@register("sample_domain_cap", _DOMAIN_CAP_SQL)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget quota (domain capping): admit each
    source's documents in deterministic doc_id order until the source's
    cumulative whitespace-token count crosses the budget, then stop —
    the "no single domain may exceed X tokens of the mix" rule every
    production pretraining recipe applies to Common-Crawl-sized sources
    before mixing (the hard-cap complement of sample_temperature_weights'
    soft reweighting). Prefix semantics: tokens of documents past the
    cap still count toward the cumulative, so the admit decision is a
    pure function of arrival order — which is exactly what makes the
    same rule enforceable at INGEST time by the streaming twin
    (streaming_domain_cap) with carried counters.

    Scale: one window over a source-keyed shuffle — the partition key is
    the domain itself, so a 100 TB corpus shuffles once on source; the
    running sum is a single pass per partition. Skewed sources (one
    domain = half the corpus) are the data's own skew: the cap cuts
    exactly those partitions short, and AQE splits the oversized
    pre-filter partitions. No collect, no second pass."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
    ).withColumn("cum_toks", F.sum("n_toks").over(wc))
    return toks.filter(F.col("cum_toks") <= _CAP_BUDGET)


@register(
    "sample_weighted_reservoir",
    f"""
    WITH toks AS (SELECT doc_id, lang, text, {_D_TOKS} AS t FROM documents),
    q AS (
      SELECT doc_id, lang,
        (CASE WHEN len(t) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END
         + CASE WHEN CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) >= 0.6
                THEN 1 ELSE 0 END
         + CASE WHEN CAST(LENGTH(text) - (len(t) - 1) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE) BETWEEN 2.0 AND 12.0
                THEN 1 ELSE 0 END
         + CASE WHEN CAST(len(list_filter(t,
                       x -> list_contains({_SW['en']}, x))) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE) > 0.0
                THEN 1 ELSE 0 END) AS weight
      FROM toks),
    pri AS (
      SELECT doc_id, lang, CAST(weight AS INTEGER) AS weight,
             list_min(list_transform(range(1, weight + 1), j ->
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))))
               AS priority
      FROM q WHERE weight >= 1)
    SELECT doc_id, lang, weight, priority
    FROM pri ORDER BY priority, doc_id LIMIT 100
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (operators/sampling.py:
    weighted_reservoir) — the one-pass PPS sampler every corpus-ablation
    loop needs: each document races with `quality` (0-4, the Gopher
    gate) integer tickets, ticket j's priority is md5(id ':' j), and
    the sample is the global bottom-100 by best ticket. Integer-weight
    A-ES with no rand()/seed state: both engines draw the identical
    sample from md5 alone, and adding a document never re-rolls another
    document's priority — which also makes the sample incrementally
    maintainable (bottom-k is a semilattice; a stream carries just the
    current 100 rows as state).

    Scale: priority is a row-local HOF (≤4 md5 calls in-row, no
    explode); the global bottom-k compiles to TakeOrderedAndProject —
    per-partition top-k then a 100-row driver merge, no global sort."""
    from ..functions import text as TX
    from ..operators.sampling import weighted_reservoir

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    weighted = docs.select(
        "doc_id",
        "lang",
        TX.quality_score(F.col("text"), toks).cast("int").alias("weight"),
    )
    return weighted_reservoir(weighted, "weight", k=100)


@register(
    "sample_dsir_weights",
    """
    WITH arr AS (SELECT doc_id, lang, string_split(text, ' ') AS a
                 FROM documents),
    bg AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5(a[i] || ' ' || a[i + 1]), 1, 15))::BIGINT
               % 4096 AS bkt
      FROM arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    bt AS (
      SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS ct
      FROM bg GROUP BY bkt)
    SELECT bg.doc_id, COUNT(*) AS n_feats,
           CAST(SUM((ct + 1) * 1048576 // (cr + 1)) AS BIGINT) AS dsir_fp
    FROM bg JOIN bt USING (bkt)
    GROUP BY bg.doc_id
    """,
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.py:dsir_weights; Xie
    et al. 2023): hashed-bigram likelihood-ratio score of every document
    against the English subset as the target domain — the reweighting
    pass that importance-resampling data selection runs over the raw
    crawl before drawing the training sample. Integer fixed-point
    per-bucket ratios (the linear-domain, cross-engine-exact variant of
    the paper's log sum; the rank-neutral global normalizer omitted).

    Scale: the feature-count table is ≤4096 rows regardless of corpus
    size (one conditional map-side agg) and re-enters as a BROADCAST;
    scoring is a broadcast equi-join + one doc-keyed agg — the corpus
    is never shuffled."""
    from ..operators.sampling import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, target=F.col("lang") == "en")


@register(
    "sample_dsir_ess",
    """
    WITH arr AS (SELECT doc_id, lang, string_split(text, ' ') AS a
                 FROM documents),
    bg AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5(a[i] || ' ' || a[i + 1]), 1, 15))::BIGINT
               % 4096 AS bkt
      FROM arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    bt AS (
      SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS ct
      FROM bg GROUP BY bkt),
    wts AS (
      SELECT bg.doc_id, COUNT(*) AS n_feats,
             CAST(SUM((ct + 1) * 1048576 // (cr + 1)) AS BIGINT) AS dsir_fp
      FROM bg JOIN bt USING (bkt)
      GROUP BY bg.doc_id),
    qw AS (
      SELECT d.lang, (w.dsir_fp // w.n_feats) // 131072 + 1 AS wq
      FROM wts w JOIN documents d USING (doc_id)
      WHERE d.lang <> 'en')
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(wq) AS BIGINT) AS sum_w,
           CAST(SUM(wq) * SUM(wq) * 1000 // SUM(wq * wq) AS BIGINT)
             AS ess_permille
    FROM qw GROUP BY lang
    """,
)
def sample_dsir_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the DSIR selection weights, per source
    language pool — the importance-sampling health check run BEFORE
    drawing (Kong 1992: ESS = (Σw)²/Σw²; reported here in permille of a
    perfectly uniform pool): an ESS collapse means a few documents
    dominate the tilted distribution and the resampled shard will be
    near-duplicates of them — the practitioner's signal to widen the
    bucket count or soften the target. Computed over the SAME quantized
    1..9 integer weights pipeline_dsir_select actually draws with, so
    the diagnostic measures the sampler that runs, not an idealization —
    and (Σw)²·1000 DIV Σw² stays exact int64 at any corpus size
    (quantized weights are ≤9, so Σw² ≤ 81·n).

    Scale: the same broadcast-model scoring as sample_dsir_weights plus
    one lang-keyed agg — nothing new shuffles."""
    from ..operators.sampling import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    wts = dsir_weights(docs, target=F.col("lang") == "en")
    qw = wts.join(
        docs.filter(F.col("lang") != "en").select("doc_id", "lang"),
        "doc_id",
    ).select(
        "lang",
        F.expr("(dsir_fp DIV n_feats) DIV 131072 + 1").alias("wq"),
    )
    return qw.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("wq").cast("long").alias("sum_w"),
        F.expr("CAST(SUM(wq) * SUM(wq) * 1000 DIV SUM(wq * wq) AS BIGINT)")
        .alias("ess_permille"),
    )
