"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force top-k: query-set × corpus join with in-row fixed-point
  cosine, then window top-k. The query side is small → broadcast; the
  corpus streams through one narrow stage. This is the exact baseline and
  scales to any corpus size with a bounded query set.
- LSH-bucketed ANN: sign-random-projection buckets (deterministic integer
  LCG hyperplanes) turn the cross product into an equi-join on bucket id —
  the scale path when the query set is itself huge. Recall < 1 by design.

All dot products use functions/vectors.py fixed-point accumulation, so
results are bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..sources.tables import widen


def _with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__norm", V.norm_sq_fixed(F.col(vec_col)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries must be small (it's broadcast). Output: query_id, neighbor_id,
    cos_sim, rank — deterministic tiebreak on neighbor_id.
    """
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    c = _with_norm(
        widen(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    scored = joined.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def range_search(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radius (range) search: EVERY corpus vector within a cosine
    threshold of each query — the FAISS ``range_search`` surface, the
    retrieval primitive when the answer set size is data-dependent
    (dedup candidate pull, recall-complete retrieval) rather than a
    fixed k.

    Same broadcast-query / streaming-corpus shape as brute_force_topk,
    minus the window: no per-query shuffle at all — the filter runs
    inside the one narrow scan stage, so the plan is a pure map over
    the corpus (strictly cheaper than top-k, which needs the rank
    window). The threshold compare is on the fixed-point-derived cosine
    double, bit-identical across engines, so >= is deterministic.

    Scale: corpus streams; output is bounded by the radius, not by
    |corpus|. A selective threshold at 100 TB emits ~nothing per
    partition; a loose one is the user's explicit choice of output
    size. The LSH/IVF bucketed variants compose the same way they do
    for top-k when the query set itself is huge."""
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    c = _with_norm(
        widen(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    return joined.select(
        "query_id", "neighbor_id", sim.alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def maxsim_multivector(
    query_tokens: DataFrame,
    corpus: DataFrame,
    doc_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim scoring against
    multi-vector documents: score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d).
    Documents are vector GROUPS (all corpus rows sharing ``doc_col``);
    the query is a small set of token vectors.

    Plan: corpus ⋈ broadcast(query tokens) → one narrow scored stream,
    then two keyed aggs — max per (doc, token), sum per doc. Never
    materializes a doc×doc or token×token product; the only shuffles
    are on (doc, token) then doc. Determinism: the per-token max is
    over bit-identical cosine doubles; the cross-token SUM goes through
    fixed-point floor (BIGINT) so accumulation order can't flip a ULP
    — same contract as every hashed double in this repo.

    Scale: |Q| is tiny (broadcast); the scored stream is |corpus|·|Q|
    rows in one map stage — linear, and the (doc, token) agg is
    map-side combinable. This is the retrieval scorer for multi-vector
    embeddings (per-token document representations) at corpus scale."""
    s = float(V.FIXED_SCALE)
    q = _with_norm(
        query_tokens.select(
            F.col(id_col).alias("token_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    c = _with_norm(
        widen(corpus).select(
            F.col(doc_col).alias("doc"), F.col(vec_col).alias("c_vec")
        ),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    scored = c.join(F.broadcast(q)).select(
        "doc", "token_id", sim.alias("cos_sim")
    )
    per_token = scored.groupBy("doc", "token_id").agg(
        F.max("cos_sim").alias("best")
    )
    return (
        per_token.groupBy("doc")
        .agg(
            (
                F.sum(F.floor(F.col("best") * F.lit(s)).cast("long")) / F.lit(s)
            ).alias("maxsim"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select("doc", "maxsim", "n_tokens")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_planes: int = 4,
    k: int = 5,
) -> DataFrame:
    """ANN: only score candidates in the query's LSH bucket.

    With b planes, the corpus splits into 2^b buckets; the join is an
    equi-join on bucket id — per-query work drops 2^b× at the cost of
    recall. At 100 TB you'd also multi-probe neighboring buckets; the
    bucket-join skeleton is identical.
    """
    q = _with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
    ).withColumnRenamed("__norm", "q_norm")
    q = q.withColumn("bucket", V.lsh_bucket(F.col("q_vec"), dims, n_planes))
    c = _with_norm(
        widen(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
    ).withColumnRenamed("__norm", "c_norm")
    c = c.withColumn("bucket", V.lsh_bucket(F.col("c_vec"), dims, n_planes))
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = V.dot_fixed(F.col("q_vec"), F.col("c_vec"))
    sim = V.cosine_fixed(dot, F.col("q_norm"), F.col("c_norm"))
    scored = joined.select("query_id", "bucket", "neighbor_id", sim.alias("cos_sim"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

IVF_OFFSET = 7919  # keeps the centroid LCG stream disjoint from SRP planes
IVF_SPAN = 1000


def ivf_centroids(n_centroids: int, dims: int) -> list[list[int]]:
    """Deterministic integer centroids from the shared LCG — data-free
    (a real IVF trains k-means; the INDEX SHAPE — assign once, search
    probed cells — is what this implements), reproducible in plain SQL,
    and integer-valued so assignment dots are exact in every engine."""
    return [
        [
            ((V.LCG_A * (IVF_OFFSET + c * dims + d) + V.LCG_C) % V.LCG_M)
            % (2 * IVF_SPAN + 1)
            - IVF_SPAN
            for d in range(dims)
        ]
        for c in range(n_centroids)
    ]


def _cents_lit(centroids: list[list[int]]):
    """The whole centroid bank as ONE array<array<bigint>> literal.

    The former shape — `F.array(*[F.lit(x) for x in cv])` per centroid —
    built k×dims Literal nodes PLUS a per-element `.cast("long")` call:
    for the 8×64 IVF bank that was ~3.5 s of DRIVER-side
    construction+analysis per query invocation vs ~0.5 s of actual
    execution at sf0.1 (the same disease pq_topk's docstring records
    for the old in-row ADC tree). Note the saving is NOT "one py4j
    call": in this classic (non-Connect) session PySpark's `lit(list)`
    still recursively expands to `array(*[lit(item) ...])` — k×dims
    lit() round-trips either way. What the nested-list literal drops is
    the k×dims per-element `.cast('long')` py4j calls (one outer cast
    instead), and Catalyst constant-folds the fully-foldable array tree
    into ONE Literal during analysis, so the optimizer/codegen never
    walk 512 nodes. Per-row execution work is unchanged (same k dots of
    dims mults)."""
    return F.lit([[int(x) for x in cv] for cv in centroids]).cast(
        "array<array<bigint>>"
    )


def _ivf_assign(qv, centroids: list[list[int]]):
    """Nearest centroid by max integer dot (tiebreak: lowest id) —
    computed in-row over the let-bound quantized vector. The bank is a
    single literal; transform's index lambda supplies the cell id."""
    from ..functions import exprs as EX

    def best(v):
        cands = F.transform(
            _cents_lit(centroids),
            lambda cv, c: F.struct(
                (-V.dot_int(v, cv)).alias("nd"), c.alias("c")
            ),
        )
        return F.array_min(cands)["c"]

    return EX.bind(qv, best)


def _ivf_assign_topp(qv, centroids: list[list[int]], p: int):
    """Top-p nearest centroids (multi-probe): array of cell ids ordered
    by dot desc, centroid-id asc — array_sort on (neg-dot, id) structs,
    same in-row evaluation as the p=1 assign."""
    from ..functions import exprs as EX

    def best(v):
        cands = F.transform(
            _cents_lit(centroids),
            lambda cv, c: F.struct(
                (-V.dot_int(v, cv)).alias("nd"), c.alias("c")
            ),
        )
        return F.slice(F.array_sort(cands), 1, p)

    return EX.bind(qv, best)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    k: int = 5,
    n_probe: int = 1,
    dims: int | None = None,
) -> DataFrame:
    """IVF ANN: assign every CORPUS vector to its nearest centroid cell
    (the index); each query searches its `n_probe` nearest cells. The
    search join stays an equi-join on the cell id — per-query work is
    ~(n_probe/n_centroids)× the corpus, and recall climbs with n_probe
    (the standard IVF recall/latency dial). Cosine uses the
    quantized-integer contract (exact, oracle-reproducible).

    `dims`: pass the vector dimensionality when the caller's table
    contract pins it (the registered queries do — their oracle SQL
    hard-codes it); None falls back to a one-row schema probe, which
    costs a driver job (~0.26 s) per invocation."""
    cents = ivf_centroids(
        n_centroids, dims if dims is not None else _dims(corpus, vec_col)
    )

    def prep(df: DataFrame, side: str) -> DataFrame:
        qv = V.quantized(F.col(vec_col))
        out = df.select(
            F.col(id_col).alias(f"{side}_id"), qv.alias(f"{side}_qv")
        )
        return out.select(
            f"{side}_id",
            f"{side}_qv",
            _ivf_assign(F.col(f"{side}_qv"), cents).cast("long").alias("cell"),
            V.dot_int(F.col(f"{side}_qv"), F.col(f"{side}_qv")).alias(f"{side}_nsq"),
        )

    if n_probe <= 1:
        q = prep(queries, "query")
    else:
        qv = V.quantized(F.col(vec_col))
        q = (
            queries.select(F.col(id_col).alias("query_id"), qv.alias("query_qv"))
            .select(
                "query_id",
                "query_qv",
                F.explode(
                    _ivf_assign_topp(F.col("query_qv"), cents, n_probe)
                ).alias("__probe"),
                V.dot_int(F.col("query_qv"), F.col("query_qv")).alias("query_nsq"),
            )
            .select(
                "query_id", "query_qv", F.col("__probe.c").cast("long").alias("cell"), "query_nsq"
            )
        )
    c = prep(widen(corpus), "neighbor")
    joined = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = V.dot_int(F.col("query_qv"), F.col("neighbor_qv"))
    sim = dot.cast("double") / F.sqrt(
        F.col("query_nsq").cast("double") * F.col("neighbor_nsq").cast("double")
    )
    scored = joined.select(
        "query_id", "cell", "neighbor_id", sim.alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _dims(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(vec_col)).first()[0]


# ---------------------------------------------------------------------------
# k-means (Lloyd) clustering — semantic curation / cluster-balanced sampling
# ---------------------------------------------------------------------------

KMEANS_MEAN_OFFSET = 40_000  # > max |quantized component| (32768)


def _kmeans_best(qv, centroids: list[list[int]]):
    """struct(dist_sq, c) of the nearest centroid by exact integer
    squared L2 distance (ties → lowest centroid id), computed in-row:
    dist² = |v|² − 2·v·c + |c|², with |c|² folded in as a Python-int
    literal. No join — the centroid bank is compiled into the plan."""
    from ..functions import exprs as EX

    csq = F.lit([sum(int(x) * int(x) for x in cv) for cv in centroids]).cast(
        "array<bigint>"
    )

    def best(v):
        vsq = V.dot_int(v, v)
        cands = F.transform(
            _cents_lit(centroids),
            lambda cv, c: F.struct(
                (
                    vsq
                    - F.lit(2).cast("long") * V.dot_int(v, cv)
                    + F.element_at(csq, c + F.lit(1))
                ).alias("dist_sq"),
                c.alias("c"),
            ),
        )
        return F.array_min(cands)

    return EX.bind(qv, best)


KMEANS_LITERAL_CELLS_MAX = 0
"""k×dims threshold above which assignment uses the broadcast data bank
instead of compiled literals. Default 0 = bank ALWAYS: measured at sf0.1
(2k vecs, k=8, dims=64 → 512 cells) the literal tier spends more in
per-round expression analysis + codegen than the whole bank-tier run
(4.8 s vs 2.3 s for 2 Lloyd rounds; 1.6 s vs 0.8 s for one assignment),
and the gap only widens with k since literal trees grow O(k·dims)
(r5 verdict #2) while the bank plan is O(1) in k with a codegen shape
reused across rounds. The literal tier remains for callers that want a
join-free plan (pass a large `literal_cells_max`) and for the
tier-parity pin in tests/test_llm_ops.py."""


KMEANS_BANK_ROUNDS_MAX = 4
"""Hard bound on Lloyd rounds in the LAZY bank tier: each round embeds
the previous round's plan as a subtree (runtime stays linear through the
shared BroadcastExchange, but plan text doubles per round), so
rounds ≫ 4 is exponential analyzer/codegen blowup. Enforced in
kmeans_assign (ADVICE r11); high-round callers use the eager literal
tier, whose per-round cost is flat."""


def _centroid_bank_df(spark, cents: list[list[int]]) -> DataFrame:
    """1-row DataFrame carrying the whole centroid bank as DATA:
    bank = array<struct<c:int, cv:array<long>, csq:long>>. crossJoin +
    broadcast of this single row ships the bank to executors without
    multiplying rows and without literal expression trees."""
    bank = [
        {"c": c, "cv": [int(x) for x in cv], "csq": sum(x * x for x in cv)}
        for c, cv in enumerate(cents)
    ]
    return spark.createDataFrame(
        [(bank,)], "bank array<struct<c:int, cv:array<long>, csq:long>>"
    )


def _kmeans_best_bank(qv, bank):
    """Same struct(dist_sq, c) contract as _kmeans_best, but the centroid
    bank arrives as an array column (from the broadcast 1-row join) and
    the per-candidate distance is a nested HOF: transform over the bank
    with an integer zip_with/aggregate dot inside. All JVM-side; the
    expression tree size is independent of k."""
    from ..functions import exprs as EX

    def best(v):
        vsq = V.dot_int(v, v)
        return F.array_min(
            F.transform(
                bank,
                lambda e: F.struct(
                    (
                        vsq
                        - F.lit(2).cast("long") * V.dot_int(v, e["cv"])
                        + e["csq"]
                    ).alias("dist_sq"),
                    e["c"].alias("c"),
                ),
            )
        )

    return EX.bind(qv, best)


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    literal_cells_max: int = KMEANS_LITERAL_CELLS_MAX,
    with_vec: bool = False,
    dims: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over an embedding column → (vec_id, cluster,
    dist_sq): the semantic-curation primitive (cluster-balanced
    sampling, per-cluster dedup budgets, topic pruning) and the third
    iterative algorithm in the engine next to PageRank and connected
    components.

    Cross-engine-exact by construction: vectors quantized to int64
    (functions/vectors.py contract), assignment by exact integer
    squared-L2 with lowest-id tiebreak, and the centroid update is an
    integer floor-division mean — computed on offset-shifted values
    (component + 40000 ≥ 0) so Spark's truncating DIV and the oracle's
    floor division agree regardless of sign. Initial centroids reuse the
    data-free LCG bank (ivf_centroids), so round 0 is the IVF cell
    assignment; empty clusters keep their previous centroid.

    Scale shape (the MLlib pattern): assignment is in-row against the
    centroid bank (no row-multiplying join, narrow stage); the update is
    one groupBy(cluster, dim) partial-aggregated shuffle of k×dims
    cells; centroids (model state, k×dims ints) stay IN-PLAN as a 1-row
    broadcast between rounds (collect_list → crossJoin broadcast — the
    sim_power_iteration shape), so the whole query is LAZY: no driver
    round-trips, and callers compose it like any other DataFrame
    (r10 verdict #3; previously the one whitelisted EAGER family).
    Caveat shared with every lazy unrolled iteration here (power
    iteration, bpe_train): each round's plan embeds the previous
    round's as a subtree (both consumptions ride ONE BroadcastExchange
    so runtime stays linear — see next_bank), but plan TEXT still
    doubles per round, so keep rounds bounded (≤~4; the registered
    contract is 2). High-round callers use the literal tier, which
    stays eager.

    Two assignment tiers, identical integer semantics (pinned by
    tests/test_llm_ops.py tier-parity):
    - DEFAULT (bank): the centroid bank rides a broadcast 1-row
      crossJoin as DATA and the per-row argmin is a nested HOF
      (_kmeans_best_bank) — the plan is O(1) in k, the codegen shape is
      reused across rounds, it measures faster than the literal
      tier even at k=8 (see KMEANS_LITERAL_CELLS_MAX), and the Lloyd
      update runs fully lazy.
    - k×dims ≤ literal_cells_max (opt-in): centroids compiled into the
      plan as literals — a join-free plan for callers that need one,
      paying O(k·dims) expression analysis/codegen per round plus the
      driver centroid collects between rounds that literals require.

    `dims`: see ivf_topk — pass it when the caller's table contract
    pins the dimensionality; None probes with a driver job.
    """
    if dims is None:
        dims = _dims(df, vec_col)
    q = df.select(
        F.col(id_col).alias("vec_id"), V.quantized(F.col(vec_col)).alias("qv")
    )
    cents = ivf_centroids(k, dims)
    off = KMEANS_MEAN_OFFSET
    use_bank = k * dims > literal_cells_max
    spark = df.sparkSession
    zero = F.lit(0).cast("long")

    if use_bank and rounds > KMEANS_BANK_ROUNDS_MAX:
        # enforce the documented ≤~4-round bound (ADVICE r11): the lazy
        # bank tier doubles plan TEXT per round, so an unguarded
        # rounds=10 is exponential plan blowup, not a slow query.
        # High-round callers opt into the eager literal tier by raising
        # literal_cells_max above k*dims.
        raise ValueError(
            f"kmeans_assign: rounds={rounds} exceeds the lazy bank tier's "
            f"bound ({KMEANS_BANK_ROUNDS_MAX}) — plan size doubles per "
            "round. For more rounds, opt into the eager literal tier by "
            f"passing literal_cells_max >= k*dims ({k * dims})."
        )

    if use_bank:
        def next_bank(bank_df: DataFrame) -> DataFrame:
            """One lazy Lloyd update: assign against the broadcast bank,
            integer offset-mean per (cluster, dim), then rebuild the
            1-row bank — empty clusters keep their previous centroid
            via the left join + coalesce."""
            src = q.crossJoin(F.broadcast(bank_df))
            best = _kmeans_best_bank(F.col("qv"), F.col("bank"))
            # two selects, deliberately: the argmin must land in its own
            # projection BEFORE the posexplode Generate — fused into one
            # select, the nested-HOF argmin re-evaluates once PER
            # EXPLODED ROW (64× the work; measured 10× on this stage —
            # the word_shingles/bind() lesson)
            a = src.select(best["c"].alias("cluster"), "qv")
            cells = (
                a.select("cluster", F.posexplode("qv").alias("d", "v"))
                .groupBy("cluster", "d")
                .agg(
                    F.sum(F.col("v") + F.lit(off)).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .withColumn("cd", F.expr("s DIV n") - F.lit(off))
            )
            upd = cells.groupBy("cluster").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "cd"))),
                    lambda e: e["cd"],
                ).alias("cv_new")
            )
            # in-row merge over the SAME broadcast the assignment used:
            # the round's two bank consumptions (argmin + carry-forward)
            # must both be BroadcastExchange(bank_df) so ReusedExchange
            # dedups the child plan's execution — an explode+join merge
            # consumed the bank through a plain scan, duplicating the
            # whole previous-round subtree per round (2^rounds scans,
            # measured). Empty clusters keep their previous centroid via
            # the try_element_at-miss → coalesce.
            upd1 = upd.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("cluster", "cv_new"))
                ).alias("um")
            )

            def entry(e):
                cv = F.coalesce(
                    F.try_element_at(F.col("um"), e["c"]), e["cv"]
                )
                return F.struct(
                    e["c"].alias("c"),
                    cv.alias("cv"),
                    F.aggregate(cv, zero, lambda a, x: a + x * x).alias(
                        "csq"
                    ),
                )

            return upd1.crossJoin(F.broadcast(bank_df)).select(
                F.transform("bank", entry).alias("bank")
            )

        bank_df = _centroid_bank_df(spark, cents)
        for _ in range(rounds):
            bank_df = next_bank(bank_df)
        src = q.crossJoin(F.broadcast(bank_df))
        best = _kmeans_best_bank(F.col("qv"), F.col("bank"))
    else:
        def assign_lit(frame: DataFrame, cents: list[list[int]]):
            return frame, _kmeans_best(F.col("qv"), cents)

        for _ in range(rounds):
            lsrc, lbest = assign_lit(q, cents)
            a = lsrc.select("qv", lbest["c"].alias("cluster"))
            cell_rows = (
                a.select("cluster", F.posexplode("qv").alias("d", "v"))
                .groupBy("cluster", "d")
                .agg(
                    F.sum(F.col("v") + F.lit(off)).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .withColumn("cd", F.expr("s DIV n") - F.lit(off))
                .collect()  # bounded: k×dims ints — model state, not data
            )
            new: dict[int, dict[int, int]] = {}
            for r in cell_rows:
                new.setdefault(r["cluster"], {})[r["d"]] = r["cd"]
            cents = [
                [new[c][d] for d in range(dims)] if c in new else cents[c]
                for c in range(k)
            ]
        src, best = assign_lit(q, cents)
    cols = [
        F.col("vec_id"),
        best["c"].alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    ]
    if with_vec:
        cols.append(F.col("qv"))  # downstream per-cluster similarity work
    return src.select(*cols)


def kmeans_assign_cells(
    df: DataFrame,
    cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid of an ALREADY-TRAINED
    codebook given as a cells relation (cluster, d, cval) — the APPLY
    half of train-on-sample workflows (FAISS trains the quantizer on a
    bounded sample, then add() assigns the full corpus; this is add()).
    Same integer semantics and lowest-cluster tie-break as
    kmeans_assign; clusters absent from the cells relation (emptied
    during training) simply never win the argmin. An ALL-absent bank
    (empty cells relation) is a caller bug, not a degenerate codebook —
    it raises at execution time instead of silently assigning every
    vector a null cluster (ADVICE r14; the ungrouped agg still emits
    one empty-bank row, and array argmin over nothing is null).

    Scale: the cells relation is model state (≤ k×dims rows) — it
    collapses to a 1-row bank via two tiny aggs and ships to executors
    as a broadcast crossJoin; the corpus pass is one narrow in-row
    argmin, no row-multiplying join, exactly one scan."""
    zero = F.lit(0).cast("long")
    q = df.select(
        F.col(id_col).alias("vec_id"), V.quantized(F.col(vec_col)).alias("qv")
    )
    cv = cells.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cval"))),
            lambda e: e["cval"].cast("long"),
        ).alias("cv")
    )
    bank_df = cv.select(
        F.struct(
            F.col("cluster").cast("int").alias("c"),
            F.col("cv").alias("cv"),
            F.aggregate("cv", zero, lambda a, x: a + x * x).alias("csq"),
        ).alias("e")
    ).agg(F.array_sort(F.collect_list("e")).alias("bank"))
    src = q.crossJoin(F.broadcast(bank_df))
    # fail-fast guard: an empty bank raises per-row instead of winning
    # the argmin with null (plan-side check — no extra driver job)
    bank = F.when(
        F.size(F.col("bank")) > 0, F.col("bank")
    ).otherwise(
        F.raise_error(
            "kmeans_assign_cells: empty cells relation — the trained "
            "codebook must contain at least one (cluster, d, cval) row"
        )
    )
    best = _kmeans_best_bank(F.col("qv"), bank)
    return src.select(
        F.col("vec_id"),
        best["c"].alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    )


def kmeans_assign_grouped(
    df: DataFrame,
    n_groups: int,
    group_col: str = "g",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    with_vec: bool = False,
    dims: int | None = None,
) -> DataFrame:
    """Per-GROUP Lloyd's k-means in ONE lazy plan: every row carries a
    group id in [0, n_groups) and each group trains its own k-centroid
    codebook over its rows. One composite bank of n_groups×k entries
    (entry id = group·k + cluster) rides the same broadcast 1-row
    crossJoin as kmeans_assign's bank tier; each row argmins over ITS
    group's k-entry positional slice, and the update aggregates
    (composite cluster, dim) cells for every group in one shuffle.

    Group-by-group results are IDENTICAL to running kmeans_assign once
    per group: same data-free LCG init per group, same integer
    offset-mean update, same empty-cluster carry-forward, and the
    lowest-id tiebreak is preserved because composite ids are monotone
    within a slice. What changes is COST: one analyzed/codegen'd Lloyd
    chain and one pass per round over the union of groups instead of
    n_groups separate chains — the fix for compile-dominated
    multi-subspace training (sim_pq_train_sampled read ~7.4 s at sf0.1
    with 4 chains, ~70% fixed plan cost; r14 verdict #4).

    Returns (vec_id, g, cluster [LOCAL id, 0..k), dist_sq[, qv])."""
    if rounds > KMEANS_BANK_ROUNDS_MAX:
        raise ValueError(
            f"kmeans_assign_grouped: rounds={rounds} exceeds the lazy "
            f"bank tier's bound ({KMEANS_BANK_ROUNDS_MAX}) — plan size "
            "doubles per round."
        )
    if dims is None:
        dims = _dims(df, vec_col)
    q = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(group_col).cast("int").alias("g"),
        V.quantized(F.col(vec_col)).alias("qv"),
    )
    cents = ivf_centroids(k, dims)
    off = KMEANS_MEAN_OFFSET
    zero = F.lit(0).cast("long")
    spark = df.sparkSession
    # composite init bank: every group starts from the SAME LCG
    # centroids (entry g*k + c carries cents[c]) — per-group parity
    # with kmeans_assign's init by construction
    bank_df = _centroid_bank_df(spark, [cents[c % k] for c in range(n_groups * k)])

    def gslice(bank):
        # the bank always holds exactly n_groups*k entries in composite
        # order (carry-forward keeps empty clusters), so a positional
        # slice is the group's codebook
        return F.slice(bank, F.col("g") * k + 1, k)

    def next_bank(bank_df: DataFrame) -> DataFrame:
        src = q.crossJoin(F.broadcast(bank_df))
        best = _kmeans_best_bank(F.col("qv"), gslice(F.col("bank")))
        # argmin in its own projection BEFORE the posexplode Generate
        # (same 64×-re-eval hazard as kmeans_assign)
        a = src.select(best["c"].alias("cluster"), "qv")  # composite id
        cells = (
            a.select("cluster", F.posexplode("qv").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(
                F.sum(F.col("v") + F.lit(off)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .withColumn("cd", F.expr("s DIV n") - F.lit(off))
        )
        upd = cells.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cd"))),
                lambda e: e["cd"],
            ).alias("cv_new")
        )
        upd1 = upd.agg(
            F.map_from_entries(
                F.collect_list(F.struct("cluster", "cv_new"))
            ).alias("um")
        )

        def entry(e):
            cv = F.coalesce(F.try_element_at(F.col("um"), e["c"]), e["cv"])
            return F.struct(
                e["c"].alias("c"),
                cv.alias("cv"),
                F.aggregate(cv, zero, lambda a, x: a + x * x).alias("csq"),
            )

        return upd1.crossJoin(F.broadcast(bank_df)).select(
            F.transform("bank", entry).alias("bank")
        )

    for _ in range(rounds):
        bank_df = next_bank(bank_df)
    src = q.crossJoin(F.broadcast(bank_df))
    best = _kmeans_best_bank(F.col("qv"), gslice(F.col("bank")))
    cols = [
        F.col("vec_id"),
        F.col("g"),
        (best["c"] % k).cast("int").alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    ]
    if with_vec:
        cols.append(F.col("qv"))
    return src.select(*cols)


def kmeans_assign_cells_grouped(
    df: DataFrame,
    cells: DataFrame,
    k: int,
    group_col: str = "g",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Grouped APPLY half: assign every (group, vector) row to its
    nearest centroid of that GROUP's already-trained codebook, given as
    one cells relation (g, cluster, d, cval) — kmeans_assign_cells
    with a group discriminator, so one broadcast bank and ONE corpus
    pass cover all groups (4 subspace apply passes → 1 for sampled
    PQ). Clusters absent from a group's cells never win its argmin
    (the bank is filtered per row by composite-id range, not sliced
    positionally, so sparse trained codebooks are fine); a group whose
    codebook is entirely absent raises, like the ungrouped operator.

    Scale: cells is model state (≤ n_groups×k×dims rows) collapsing to
    a 1-row broadcast bank; the corpus pass is one narrow in-row
    argmin over ≤k filtered entries — no row-multiplying join."""
    zero = F.lit(0).cast("long")
    q = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(group_col).cast("int").alias("g"),
        V.quantized(F.col(vec_col)).alias("qv"),
    )
    cv = (
        cells.select(
            (F.col(group_col).cast("int") * k + F.col("cluster").cast("int"))
            .alias("cc"),
            "d",
            "cval",
        )
        .groupBy("cc")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cval"))),
                lambda e: e["cval"].cast("long"),
            ).alias("cv")
        )
    )
    bank_df = cv.select(
        F.struct(
            F.col("cc").cast("int").alias("c"),
            F.col("cv").alias("cv"),
            F.aggregate("cv", zero, lambda a, x: a + x * x).alias("csq"),
        ).alias("e")
    ).agg(F.array_sort(F.collect_list("e")).alias("bank"))
    src = q.crossJoin(F.broadcast(bank_df))
    lo = F.col("g") * k
    gbank = F.filter(
        F.col("bank"), lambda e: (e["c"] >= lo) & (e["c"] < lo + k)
    )
    gbank = F.when(F.size(gbank) > 0, gbank).otherwise(
        F.raise_error(
            "kmeans_assign_cells_grouped: no trained cells for a group — "
            "every group id present in the data must have at least one "
            "(g, cluster, d, cval) row"
        )
    )
    best = _kmeans_best_bank(F.col("qv"), gbank)
    return src.select(
        F.col("vec_id"),
        F.col("g"),
        (best["c"] % k).cast("int").alias("cluster"),
        best["dist_sq"].alias("dist_sq"),
    )


PQ_M, PQ_K = 4, 16  # subspaces × codes: 64-dim vector → 4 bytes of code


def pq_codebook(dims: int, m: int = PQ_M, k: int = PQ_K) -> list[list[int]]:
    """Per-subspace codebooks from the shared LCG: entry cid = sub·K + code
    is a (dims/m)-dim integer centroid. Data-free like ivf_centroids (a
    production PQ trains per-subspace k-means; the INDEX SHAPE — encode
    once, ADC-score against codes — is what this implements), so both
    engines can rebuild it from the formula alone."""
    return ivf_centroids(m * k, dims // m)


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    passthrough: tuple = (),
    dims: int | None = None,
) -> DataFrame:
    """Product-quantization encoding: split each vector into `m`
    subvectors, snap each to its nearest codebook entry (exact integer
    L2, lowest-code tiebreak) → (vec_id, code_0..code_{m-1}). The
    compressed corpus representation: m small ints instead of dims
    floats (64×4B → 4B here) — what makes billion-scale ANN fit in
    memory.

    Encoding is a batched numpy argmin under mapInPandas (narrow stage,
    no join, no shuffle): one int64 einsum scores every (row, subspace,
    code) candidate per Arrow batch — the FAISS formulation. The
    previous in-row JVM expression tree (m×k literal-centroid dot
    products per row, ~4k interpreted nodes) measured ~3 ms/row on
    local[32]; the einsum encodes the same batch in microseconds and
    stays bit-identical: quantization is the same floor(x·2^10) IEEE
    op, distances the same int64 arithmetic, and np.argmin's
    first-minimum rule is exactly the lowest-code tiebreak."""
    if dims is None:
        dims = _dims(df, vec_col)
    sub_d = dims // m
    import numpy as np

    cent3 = np.asarray(pq_codebook(dims, m, k), dtype=np.int64).reshape(
        m, k, sub_d
    )
    cnorm = (cent3 * cent3).sum(axis=2)  # (m, k)
    # passthrough: extra (already-computed) columns carried through the
    # Arrow hop unchanged — e.g. the IVF cell id in ivfpq_topk, so the
    # corpus needs no second join to reunite codes with cells
    pt_fields = [df.schema[c] for c in passthrough]
    schema = (
        "vec_id bigint, "
        + ", ".join(f"code_{mi} int" for mi in range(m))
        + "".join(
            f", {f.name} {f.dataType.simpleString()}" for f in pt_fields
        )
    )
    src = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        *[F.col(c) for c in passthrough],
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf["v"].to_numpy()).astype(np.float64)
                * float(V.QUANT_SCALE)
            ).astype(np.int64)
            Xs = X.reshape(len(pdf), m, sub_d)
            # ADC argmin: dot(s,s) is constant per (row, subspace) and
            # cannot change the argmin, so only -2·dot(s,c)+|c|² is scored
            dist = cnorm[None, :, :] - 2 * np.einsum(
                "nmd,mkd->nmk", Xs, cent3
            )
            codes = dist.argmin(axis=2)  # first min == lowest code
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for mi in range(m):
                out[f"code_{mi}"] = codes[:, mi].astype("int32")
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return src.mapInPandas(encode, schema)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    k_out: int = 5,
    dims: int | None = None,
) -> DataFrame:
    """PQ ANN with asymmetric distance (ADC): the corpus is its codes
    only; each query scores a corpus row as Σ_sub L2(query_subvector,
    codebook[code_sub]) — exact distance to the RECONSTRUCTION, the
    standard PQ search. Per query the m×k subspace distances form a
    lookup table evaluated in-row (literal codebooks again), and the
    per-corpus-row score is m array-index lookups + adds — no float
    math, no per-row dot against the raw corpus vector.

    Scale: the corpus side carries 4 small ints per row instead of the
    embedding (the memory/bandwidth win PQ exists for); the bounded
    query set broadcasts (same contract as brute_force_topk) carrying
    its PRE-COMPUTED ADC tables — the m×k subspace distances are
    evaluated once per query BEFORE the join (they depend only on the
    query vector), so the per-(query, corpus-row) work after the join is
    m array lookups + adds, not m×k dot products. Compose with the IVF
    cell join for unbounded query sets."""
    if dims is None:
        dims = _dims(corpus, vec_col)
    sub_d = dims // m
    import numpy as np

    cent3 = np.asarray(pq_codebook(dims, m, k), dtype=np.int64).reshape(
        m, k, sub_d
    )
    cnorm = (cent3 * cent3).sum(axis=2)  # (m, k)
    enc = pq_encode(
        widen(corpus), id_col, vec_col, m, k, dims=dims
    ).withColumnRenamed("vec_id", "neighbor_id")

    def query_tables(batches):
        """(query_id, q_tables): per subspace, the k exact int64 L2
        distances from this query's subvector to every codebook entry.
        Same numpy formulation as pq_encode — the earlier in-row JVM
        expression tree (~4k nodes) cost seconds of DRIVER-side analysis
        and codegen per plan, dwarfing the actual work."""
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf["v"].to_numpy()).astype(np.float64)
                * float(V.QUANT_SCALE)
            ).astype(np.int64)
            Xs = X.reshape(len(pdf), m, sub_d)
            snorm = (Xs * Xs).sum(axis=2)  # (n, m)
            dist = (
                snorm[:, :, None]
                + cnorm[None, :, :]
                - 2 * np.einsum("nmd,mkd->nmk", Xs, cent3)
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "q_tables": [r.tolist() for r in dist],
                }
            )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).mapInPandas(
        query_tables, "query_id bigint, q_tables array<array<bigint>>"
    )
    joined = enc.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    )
    adc = sum(
        (
            F.element_at(
                F.element_at("q_tables", mi + 1),
                F.col(f"code_{mi}").cast("int") + 1,
            )
            for mi in range(1, m)
        ),
        start=F.element_at(
            F.element_at("q_tables", 1), F.col("code_0").cast("int") + 1
        ),
    )
    scored = joined.select(
        "query_id", "neighbor_id", adc.alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_out
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = PQ_M,
    k: int = PQ_K,
    k_out: int = 5,
    dims: int | None = None,
) -> DataFrame:
    """IVF-PQ: the FAISS `IndexIVFPQ` composition — coarse IVF cells
    prune WHICH corpus rows are scored, PQ/ADC codes decide HOW each
    survivor is scored. The two dials are independent: n_probe buys
    recall with more cells searched, m/k buy accuracy with bigger codes;
    the per-(query, row) cost after the cell join is m table lookups.

    Plan: corpus side = one Arrow encode pass emitting (id, codes, cell)
    — the IVF cell rides the pq_encode passthrough, so codes and cells
    never need a reuniting join; query side = top-n_probe cells
    (in-row) exploded × precomputed ADC tables (Arrow), broadcast; the
    search is an equi-join on cell. A (query, corpus-row) pair meets at
    most one probe (a row lives in exactly one cell), so no dedup stage
    is needed.

    Scale: this is the billion-vector layout — the corpus shuffles/
    stores m ints + a cell id per row (no raw vectors in the index),
    the cell join touches n_probe/n_centroids of it per query, and both
    index-build passes are narrow scans. Same integer/ADC determinism
    contract as pq_topk, so the composed oracle reproduces every
    distance bit-for-bit."""
    if dims is None:
        dims = _dims(corpus, vec_col)
    sub_d = dims // m
    import numpy as np

    cents = ivf_centroids(n_centroids, dims)
    cent3 = np.asarray(pq_codebook(dims, m, k), dtype=np.int64).reshape(
        m, k, sub_d
    )
    cnorm = (cent3 * cent3).sum(axis=2)  # (m, k)

    c_cells = widen(corpus).select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).alias(vec_col),
        _ivf_assign(V.quantized(F.col(vec_col)), cents)
        .cast("long")
        .alias("cell"),
    )
    enc = pq_encode(
        c_cells, id_col, vec_col, m, k, passthrough=("cell",), dims=dims
    ).withColumnRenamed("vec_id", "neighbor_id")

    def query_tables(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf["v"].to_numpy()).astype(np.float64)
                * float(V.QUANT_SCALE)
            ).astype(np.int64)
            Xs = X.reshape(len(pdf), m, sub_d)
            snorm = (Xs * Xs).sum(axis=2)
            dist = (
                snorm[:, :, None]
                + cnorm[None, :, :]
                - 2 * np.einsum("nmd,mkd->nmk", Xs, cent3)
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "cell": pdf["cell"].to_numpy(),
                    "q_tables": [r.tolist() for r in dist],
                }
            )

    q_probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v"),
        F.explode(
            _ivf_assign_topp(V.quantized(F.col(vec_col)), cents, n_probe)
        ).alias("__probe"),
    ).select("query_id", "v", F.col("__probe.c").cast("long").alias("cell"))
    q = q_probed.mapInPandas(
        query_tables,
        "query_id bigint, cell bigint, q_tables array<array<bigint>>",
    )
    joined = enc.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    adc = sum(
        (
            F.element_at(
                F.element_at("q_tables", mi + 1),
                F.col(f"code_{mi}").cast("int") + 1,
            )
            for mi in range(1, m)
        ),
        start=F.element_at(
            F.element_at("q_tables", 1), F.col("code_0").cast("int") + 1
        ),
    )
    scored = joined.select(
        "query_id", "cell", "neighbor_id", adc.alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_out
    )


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k most-similar corpus vectors with a DIFFERENT label — the
    near-miss negatives that carry the gradient signal (random negatives
    are trivially separable). Same exact quantized-integer cosine and
    bounded-query-broadcast shape as brute_force_topk; the label
    inequality rides the join condition, so the corpus side streams
    once. For unbounded query sets, swap the broadcast for the IVF cell
    join (ivf_topk) and apply the same label filter post-join."""

    def prep(df: DataFrame, side: str) -> DataFrame:
        qv = V.quantized(F.col(vec_col))
        out = df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(label_col).alias(f"{side}_label"),
            qv.alias(f"{side}_qv"),
        )
        return out.withColumn(
            f"{side}_nsq", V.dot_int(F.col(f"{side}_qv"), F.col(f"{side}_qv"))
        )

    q = prep(queries, "query")
    c = prep(widen(corpus), "neighbor")
    joined = c.join(
        F.broadcast(q), F.col("query_label") != F.col("neighbor_label")
    )
    sim = V.dot_int(F.col("query_qv"), F.col("neighbor_qv")).cast(
        "double"
    ) / F.sqrt(
        F.col("query_nsq").cast("double") * F.col("neighbor_nsq").cast("double")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.col("neighbor_label").cast("int").alias("neighbor_label"),
        sim.alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def semantic_dedup_drops(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    threshold: float = 0.9,
    dims: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the corpus with k-means, then compare embeddings ONLY within each
    cluster and drop any vector whose cosine similarity to a lower-id
    clustermate reaches `threshold`. Output: one row per DROPPED vector —
    (vec_id, cluster, dup_of = lowest such clustermate, n_dups = how many
    lower-id near-twins it has). Keep-lowest-id is the deterministic
    survivor rule (same contract as dedup_drop_near's canonical pick).

    This is the scale shape that makes semantic dedup tractable: the
    quadratic term is PER CLUSTER, not per corpus — k grows with the
    corpus (n/expected-cluster-size), so cluster populations stay
    bounded and the join is an equi-join on the cluster id, never an
    all-pairs scan. The per-cluster work is the same exact
    quantized-integer cosine as the ANN family (bit-identical across
    engines); the k-means stage reuses kmeans_assign unchanged.
    """
    a = kmeans_assign(
        widen(df), id_col, vec_col, k=k, rounds=rounds, with_vec=True,
        dims=dims,
    ).select(
        "vec_id",
        "cluster",
        "qv",
        V.dot_int(F.col("qv"), F.col("qv")).alias("nsq"),
    )
    # NOTE (r16): `a` feeds both pair-join sides, but a counterbalanced
    # fresh-session probe read an eager checkpoint here FLAT (mins
    # 3.58/3.59 vs 3.91/3.58) at +1 job per invocation — the Lloyd
    # chain's repeated subtrees end at exchanges AQE already reuses —
    # and at corpus scale the checkpoint would materialize an
    # O(corpus)-wide (qv) relation. Left lazy (probe in
    # OPTIMIZATION_r16.md / PROBES.md r16).
    keep = a.select(
        F.col("vec_id").alias("keep_id"),
        "cluster",
        F.col("qv").alias("k_qv"),
        F.col("nsq").alias("k_nsq"),
    )
    pairs = a.join(keep, "cluster").filter(F.col("keep_id") < F.col("vec_id"))
    cos = V.dot_int(F.col("qv"), F.col("k_qv")).cast("double") / F.sqrt(
        F.col("nsq").cast("double") * F.col("k_nsq").cast("double")
    )
    return (
        pairs.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .groupBy("vec_id", "cluster")
        .agg(
            F.min("keep_id").alias("dup_of"),
            F.count(F.lit(1)).cast("int").alias("n_dups"),
        )
    )


def power_iteration_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    rounds: int = 2,
    scale: int = 1024,
) -> DataFrame:
    """Top principal direction of the (uncentered) gram matrix XᵀX by
    unrolled power iteration: v_{r+1} ∝ Σ_rows x·(xᵀv_r), starting from
    the ones vector. Returns (d, component) — the direction quantized to
    ±`scale`, exact int64 arithmetic end-to-end so both engines agree
    bit-for-bit.

    Each round is two narrow maps + ONE partial-aggregated shuffle of
    dims cells (posexplode → groupBy(d): dims groups, map-side
    combined), and the model state between rounds is a dims-length
    vector that stays IN-PLAN as a 1-row broadcast (collect_list →
    crossJoin broadcast — same shape as dangling-PageRank's mass
    scalar); nothing is collected to the driver and the whole query
    stays lazy. Normalization between rounds is integer:
    sign(s)·(|s|·scale ÷ max|s|) with truncating division spelled
    sign-split (abs then DIV), which floors and truncates identically.

    int64 bounds: |x_i| ≤ FIXED-scale (1024 for unit floats), |v| ≤
    scale ⇒ per-row dot ≤ dims·scale·1024, per-cell product ≤ 1024× that
    — Σ over rows stays under 2⁶³ through ~10¹⁰ rows at dims=64;
    larger corpora lower `scale`."""
    q = df.select(V.quantized(F.col(vec_col)).alias("qv"))
    final = _pi_rounds(q, rounds, scale)
    m = final.agg(F.max(F.abs(F.col("s"))).alias("m"))
    return final.crossJoin(F.broadcast(m)).select(
        "d",
        F.expr(
            f"CASE WHEN s < 0 THEN -1 ELSE 1 END"
            f" * (abs(s) * {scale} DIV m)"
        ).alias("component"),
    )


def _pi_rounds(q: DataFrame, rounds: int, scale: int) -> DataFrame:
    """(d, s) rows of Σ_rows x·(xᵀv) after `rounds` gram-iterations over
    `q(qv)` starting from the ones vector, with the model state carried
    in-plan as 1-row broadcasts (see power_iteration_top_component)."""
    zero = F.lit(0).cast("long")

    def normalized(s_by_d: DataFrame) -> DataFrame:
        """(d, s) rows → 1-row (vl: array<long>) quantized direction."""
        m = s_by_d.agg(F.max(F.abs(F.col("s"))).alias("m"))
        v = s_by_d.crossJoin(F.broadcast(m)).select(
            "d",
            F.expr(
                f"CASE WHEN s < 0 THEN -1 ELSE 1 END"
                f" * (abs(s) * {scale} DIV m)"
            ).alias("v"),
        )
        return v.agg(
            F.array_sort(F.collect_list(F.struct("d", "v"))).alias("dv")
        ).select(F.transform("dv", lambda e: e["v"]).alias("vl"))

    def one_round(vrow: DataFrame | None) -> DataFrame:
        """(d, s) of Σ_rows x·(xᵀv); v = ones when vrow is None."""
        if vrow is None:
            r = q.withColumn(
                "rd", F.aggregate("qv", zero, lambda a, x: a + x)
            )
        else:
            r = q.crossJoin(F.broadcast(vrow)).withColumn(
                "rd",
                F.aggregate(
                    F.zip_with("qv", "vl", lambda a, b: a * b),
                    zero,
                    lambda a, x: a + x,
                ),
            )
        return (
            r.select(F.posexplode("qv").alias("d", "x"), "rd")
            .groupBy("d")
            .agg(F.sum(F.col("x") * F.col("rd")).alias("s"))
        )

    vrow = None
    for _ in range(rounds - 1):
        vrow = normalized(one_round(vrow))
    return one_round(vrow)


def pca_top2_components(
    df: DataFrame,
    vec_col: str = "embedding",
    rounds: int = 2,
    scale: int = 1024,
) -> DataFrame:
    """Top TWO principal directions by power iteration + Hotelling
    deflation: v1 from `rounds` gram-iterations, then every row is
    deflated in-row — x' = x·|v1|² − (x·v1)·v1, the exact-integer form
    of removing x's v1-projection (scaled by |v1|², which leaves the
    direction of every other eigenvector unchanged) — downscaled by a
    sign-split 2²⁷ floor-toward-zero division back into the |x| ≤ 2¹⁰
    envelope, and v2 is the power iteration of the deflated corpus.
    Returns (d, component1, component2), both quantized to ±scale.

    Fully LAZY like its single-component parent: v1 re-enters the plan
    as a 1-row broadcast (collect_list over 64 rows), the deflation is
    a row-local zip_with with |v1|² and x·v1 LET-BOUND (unbound, the
    nested HOF would re-evaluate both per element — the bind() lesson),
    and no driver round-trips anywhere.

    int64 bounds: |x·|v1|²| ≤ 2¹⁰·2²⁶ = 2³⁶ and |(x·v1)·v1_d| ≤
    2²⁶·2¹⁰ = 2³⁶ ⇒ |x'| ≤ 2³⁷ before the 2²⁷ downscale; the deflated
    corpus then satisfies the same per-round bounds as the parent. The
    division is spelled sign-split (−((−y) DIV 2²⁷) for y < 0) so
    Spark's truncation and DuckDB's floor agree on negatives."""
    from ..functions import exprs as EX

    q = df.select(V.quantized(F.col(vec_col)).alias("qv"))
    zero = F.lit(0).cast("long")

    def quantize(final: DataFrame, name: str) -> DataFrame:
        m = final.agg(F.max(F.abs(F.col("s"))).alias("m"))
        return final.crossJoin(F.broadcast(m)).select(
            "d",
            F.expr(
                f"CASE WHEN s < 0 THEN -1 ELSE 1 END"
                f" * (abs(s) * {scale} DIV m)"
            ).alias(name),
        )

    c1 = quantize(_pi_rounds(q, rounds, scale), "component1")
    v1row = c1.agg(
        F.array_sort(F.collect_list(F.struct("d", "component1"))).alias("dv")
    ).select(F.transform("dv", lambda e: e["component1"]).alias("vl"))

    def deflate(qv, vl):
        def with_s(ssq):
            def with_xv(xv):
                raw = F.zip_with(qv, vl, lambda x, v: x * ssq - xv * v)
                # sign-split floor-toward-zero by 2^27: arithmetic
                # shift on the absolute value (exact for powers of
                # two), negated back — matches the oracle's
                # -((-y) // 2^27) / y // 2^27 spelling
                return F.transform(
                    raw,
                    lambda y: F.when(
                        y < 0, -F.shiftright(-y, 27)
                    ).otherwise(F.shiftright(y, 27)),
                )

            return EX.bind(
                F.aggregate(F.zip_with(qv, vl, lambda x, v: x * v), zero, lambda a, x: a + x),
                with_xv,
            )

        return EX.bind(
            F.aggregate(vl, zero, lambda a, v: a + v * v), with_s
        )

    q2 = q.crossJoin(F.broadcast(v1row)).select(
        deflate(F.col("qv"), F.col("vl")).alias("qv")
    )
    c2 = quantize(_pi_rounds(q2, rounds, scale), "component2")
    return c1.join(c2, "d").select("d", "component1", "component2")


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    rows_per_block: int = 4096,
) -> DataFrame:
    """All pairs above a cosine threshold — block-tiled distributed matmul.

    Round-1 design broadcast the ENTIRE corpus to every task (built from a
    driver-side collect) — a driver OOM at scale, since the broadcast side
    IS the corpus (VERDICT r1, What's wrong #2). This version tiles BOTH
    sides:

    1. quantize each vector to int64 once (functions/vectors.py:quantized)
       and hash-assign it to one of B = ceil(N / rows_per_block) blocks;
    2. pack each block into a single row (collect_list of (id, qv)) —
       bounded at ~rows_per_block vectors ≈ a few MB, one shuffle;
    3. enumerate the B*(B+1)/2 unordered block pairs DISTRIBUTED
       (spark.range × spark.range, no driver materialization) and attach
       both packed blocks via two equi-joins on the block id;
    4. per block pair, one int64 matmul emits the above-threshold pairs
       (Arrow-batched mapInPandas — the only Python stage, BLAS-shaped).

    Work is inherently quadratic for exact all-pairs; what scales now is
    the MEMORY bound — each task holds exactly two blocks, never the
    corpus — and the parallelism: B²/2 independent tasks instead of one
    broadcast. The only driver-side action is a scalar count() to size B.
    For sub-quadratic candidates use lsh_bucketed_topk blocking instead.
    """
    import math

    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    q = widen(corpus).select(
        F.col(id_col).alias("vec_id"), V.quantized(F.col(vec_col)).alias("qv")
    )
    n = q.count()  # scalar aggregate — a distributed job, not a data collect
    n_blocks = max(1, math.ceil(n / rows_per_block))
    # Pack each block as TWO flat columns (ids + row-major flattened
    # matrix) instead of an array of structs: Arrow moves flat int64
    # lists as contiguous buffers that numpy ingests zero-copy-ish,
    # where per-struct conversion costs a Python dict per vector
    # (measured ~4× on the 50k-vector probe). sort_array pins one
    # deterministic order for both derived columns.
    packed = (
        q.withColumn(
            "block", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
        )
        .groupBy("block")
        .agg(
            F.sort_array(F.collect_list(F.struct("vec_id", "qv"))).alias("pk")
        )
        .select(
            "block",
            F.transform("pk", lambda s: s["vec_id"]).alias("ids"),
            F.flatten(F.transform("pk", lambda s: s["qv"])).alias("flat"),
        )
    )
    # Unordered block pairs (a <= b), generated distributed. B is tiny
    # relative to N (N/rows_per_block), so B² rows of two ints is cheap.
    block_pairs = (
        spark.range(n_blocks)
        .select(F.col("id").cast("int").alias("block_a"))
        .join(
            spark.range(n_blocks).select(F.col("id").cast("int").alias("block_b")),
            F.col("block_a") <= F.col("block_b"),
        )
    )
    # Broadcast the PAIR table (B² rows of two ints — bounded and tiny),
    # never the packed blocks: the packed side IS the corpus, and letting
    # the planner broadcast it would reintroduce the exact corpus-sized
    # broadcast this design removes. The second join's shuffle of
    # (pairs × vecs_a) on block_b is the inherent quadratic data movement
    # of exact all-pairs, spread across B²/2 bounded-memory tasks.
    tiled = (
        packed.select(
            F.col("block").alias("block_a"),
            F.col("ids").alias("ids_a"),
            F.col("flat").alias("flat_a"),
        )
        .join(F.broadcast(block_pairs), "block_a")
        .join(
            packed.select(
                F.col("block").alias("block_b"),
                F.col("ids").alias("ids_b"),
                F.col("flat").alias("flat_b"),
            ),
            "block_b",
        )
    )
    # AQE's partition coalescing sizes partitions by BYTES, but this
    # stage's cost is compute (one dense matmul per block pair), so
    # byte-sized partitions serialize many pairs onto few cores
    # (measured: 6 tasks for 91 pairs on 32 cores). Spread pairs across
    # the executor parallelism explicitly.
    n_pairs = n_blocks * (n_blocks + 1) // 2
    parallelism = spark.sparkContext.defaultParallelism
    tiled = tiled.repartition(
        max(1, min(n_pairs, 2 * parallelism)), "block_a", "block_b"
    )
    thr = float(threshold)

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                a_ids = np.asarray(row["ids_a"], dtype=np.int64)
                b_ids = np.asarray(row["ids_b"], dtype=np.int64)
                if not len(a_ids) or not len(b_ids):
                    continue
                a_mat = np.asarray(row["flat_a"], dtype=np.int64).reshape(
                    len(a_ids), -1
                )
                b_mat = np.asarray(row["flat_b"], dtype=np.int64).reshape(
                    len(b_ids), -1
                )
                a_norms = (a_mat * a_mat).sum(axis=1)
                b_norms = (b_mat * b_mat).sum(axis=1)
                # int64 matmul in numpy has no BLAS kernel (naive loops,
                # ~3x the wall time of the whole stage). The quantized
                # values are small — dims * max|a| * max|b| far below
                # 2^53 — so float64 dgemm computes the SAME integers
                # exactly. Guard the bound and fall back to int64 when a
                # pathological input would overflow the mantissa.
                dims = a_mat.shape[1]
                bound = (
                    float(np.abs(a_mat).max(initial=0))
                    * float(np.abs(b_mat).max(initial=0))
                    * dims
                )
                if bound < 2**53:
                    dots = a_mat.astype(np.float64) @ b_mat.astype(np.float64).T
                else:
                    dots = a_mat @ b_mat.T  # int64-exact
                sim = dots / np.sqrt(np.outer(a_norms, b_norms))
                if row["block_a"] == row["block_b"]:
                    # diagonal block: both orientations present → keep a<b
                    mask = (sim >= thr) & (a_ids[:, None] < b_ids[None, :])
                else:
                    mask = sim >= thr
                i, j = np.nonzero(mask)
                if not len(i):
                    continue
                ia, ib = a_ids[i], b_ids[j]
                yield pd.DataFrame(
                    {
                        "vec_a": np.minimum(ia, ib),
                        "vec_b": np.maximum(ia, ib),
                        "cos_sim": sim[i, j],
                    }
                )

    return tiled.mapInPandas(gen, "vec_a long, vec_b long, cos_sim double")


def mutual_knn_margin(
    side_a: DataFrame,
    side_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Margin-scored mutual nearest neighbors between two embedding sets
    — the bitext-mining primitive (Artetxe & Schwenk, "Margin-based
    Parallel Corpus Mining"): a pair (a, b) is emitted iff b is a's top-1
    cosine neighbor in B AND a is b's top-1 in A, scored by the ratio
    margin  2k·cos(a,b) / (Σ top-k cos(a,·) + Σ top-k cos(b,·))  which
    penalizes hubs (vectors near everything score margins ≈ 1).

    Execution: side A broadcasts against a streaming side B (the
    brute_force_topk shape), every pair scored ONCE, then exactly TWO
    window stages over the same scored relation — partition by a (rank
    r_ab + the top-k pivot sum s_a as unordered whole-partition window
    aggregates, same shuffle), then partition by b (r_ba + s_b). No
    joins, no second scoring pass: the plan pin asserts a single
    BroadcastNestedLoopJoin. The top-k sums are rank-pivoted fixed
    expression trees added left-to-right, so the doubles are
    bit-identical to the SQL oracle (float SUM() order is
    engine-defined; a pivoted expression tree is not).

    Scale: exact mining is quadratic by definition — at 100 TB this
    operator runs per-IVF-cell (compose with ivf_topk's cell assignment
    to bound each side, the standard sharded-FAISS mining recipe); the
    two windows shuffle pair rows on each side's id, never vectors. The
    margin formula and mutuality test are unchanged under cell sharding
    whenever both members share a cell, which is the recall the IVF
    partitioning already accepts for top-k."""
    a = _with_norm(
        side_a.select(
            F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec")
        ),
        "a_vec",
    ).withColumnRenamed("__norm", "a_norm")
    b = _with_norm(
        widen(side_b).select(
            F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec")
        ),
        "b_vec",
    ).withColumnRenamed("__norm", "b_norm")
    dot = V.dot_fixed(F.col("a_vec"), F.col("b_vec"))
    sim = V.cosine_fixed(dot, F.col("a_norm"), F.col("b_norm"))
    scored = b.join(F.broadcast(a), F.lit(True)).select(
        "vec_a", "vec_b", sim.alias("cos_sim")
    )

    def _pivot_sum(rank_col: str, part_col: str) -> F.Column:
        wp = W.partitionBy(part_col)
        terms = [
            F.max(F.when(F.col(rank_col) == i, F.col("cos_sim"))).over(wp)
            for i in range(1, k + 1)
        ]
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        return s

    w_ab = W.partitionBy("vec_a").orderBy(F.desc("cos_sim"), F.asc("vec_b"))
    w_ba = W.partitionBy("vec_b").orderBy(F.desc("cos_sim"), F.asc("vec_a"))
    # stage 1: shuffle on vec_a — rank, then the unordered pivot-sum
    # window reuses the SAME partitioning (no extra exchange)
    stage_a = scored.withColumn(
        "r_ab", F.row_number().over(w_ab)
    ).withColumn("s_a", _pivot_sum("r_ab", "vec_a"))
    # stage 2: shuffle on vec_b — same pattern for the other direction
    stage_b = stage_a.withColumn(
        "r_ba", F.row_number().over(w_ba)
    ).withColumn("s_b", _pivot_sum("r_ba", "vec_b"))
    return stage_b.filter(
        (F.col("r_ab") == 1) & (F.col("r_ba") == 1)
    ).select(
        "vec_a",
        "vec_b",
        "cos_sim",
        (
            (F.lit(float(2 * k)) * F.col("cos_sim"))
            / (F.col("s_a") + F.col("s_b"))
        ).alias("margin"),
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_candidates: int = 20,
    k_select: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein):
    from each query's top-`k_candidates` cosine neighbors, greedily
    select `k_select` by  score = λ·rel(c) − (1−λ)·max_{s∈selected}
    sim(c, s)  — the diversity-aware selection used for dedup-aware
    retrieval and diverse few-shot example picking. The first pick is
    pure relevance (empty selected set); every later step penalizes
    similarity to anything already chosen.

    Execution: candidate generation IS brute_force_topk (broadcast
    queries, streaming corpus — swap in the IVF/LSH variants at scale);
    candidate-pair similarities are computed once on the ≤k² bounded
    pair set per query; the greedy loop is `k_select` unrolled argmax
    windows — bounded plan depth, no driver collect. All similarities
    are fixed-point-derived doubles and λ-arithmetic is one mul/sub
    expression, so scores are bit-identical to the SQL oracle.

    Scale: everything after candidate generation is O(|Q|·k²) rows —
    independent of corpus size. Returns (query_id, position,
    neighbor_id, score)."""
    from .iterative import materialize, resolve_reliable

    reliable = resolve_reliable(corpus.sparkSession, None)
    # cand and pair are referenced by EVERY unrolled greedy step (cand
    # ~2x/step, pair 1x/step): without materialization Catalyst carries
    # ~9 copies of the brute-force candidate subplan and re-executes it
    # per step. Both relations are bounded (|Q|*k and |Q|*k^2 rows), so
    # one eager checkpoint each makes the loop plan depth O(k_select).
    cand = materialize(
        brute_force_topk(
            queries, corpus, id_col, vec_col, k=k_candidates
        ).select("query_id", "neighbor_id", F.col("cos_sim").alias("rel")),
        reliable,
        strip=False,
    )
    vecs = _with_norm(
        corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        ),
        "cvec",
    ).withColumnRenamed("__norm", "cnorm")
    cv = cand.join(vecs, cand.neighbor_id == vecs.cid).select(
        "query_id", "neighbor_id", "rel", "cvec", "cnorm"
    )
    a = cv.select(
        "query_id",
        F.col("neighbor_id").alias("c1"),
        F.col("cvec").alias("v1"),
        F.col("cnorm").alias("n1"),
    )
    b = cv.select(
        F.col("query_id").alias("qb"),
        F.col("neighbor_id").alias("c2"),
        F.col("cvec").alias("v2"),
        F.col("cnorm").alias("n2"),
    )
    pair = materialize(
        a.join(b, (a.query_id == b.qb) & (a.c1 != b.c2)).select(
            "query_id",
            "c1",
            "c2",
            V.cosine_fixed(
                V.dot_fixed(F.col("v1"), F.col("v2")),
                F.col("n1"),
                F.col("n2"),
            ).alias("sim"),
        ),
        reliable,
        strip=False,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cid"))
    first = (
        cand.select(
            "query_id",
            F.col("neighbor_id").alias("cid"),
            (F.lit(lam) * F.col("rel")).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "cid", "score", F.lit(1).alias("position"))
    )
    selected = first
    for pos in range(2, k_select + 1):
        sel_keys = selected.select(
            F.col("query_id").alias("qs"), F.col("cid").alias("cs")
        )
        pen = (
            pair.join(
                sel_keys,
                (pair.query_id == F.col("qs")) & (pair.c2 == F.col("cs")),
            )
            .groupBy(
                pair.query_id.alias("qp"), pair.c1.alias("cp")
            )
            .agg(F.max("sim").alias("pen"))
        )
        step = (
            cand.join(
                sel_keys,
                (cand.query_id == F.col("qs"))
                & (cand.neighbor_id == F.col("cs")),
                "left_anti",
            )
            .join(
                pen,
                (cand.query_id == F.col("qp"))
                & (cand.neighbor_id == F.col("cp")),
            )
            .select(
                cand.query_id.alias("query_id"),
                F.col("neighbor_id").alias("cid"),
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("pen")
                ).alias("score"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "cid", "score", F.lit(pos).alias("position")
            )
        )
        # selected is referenced by the NEXT step's anti-join and
        # penalty max (and by the final union): materialize per step so
        # step k's plan reads a checkpoint instead of re-deriving steps
        # 1..k-1's argmax windows (plan size would otherwise be O(2^k))
        selected = materialize(selected.unionByName(step), reliable)
    return selected.select(
        "query_id",
        "position",
        F.col("cid").alias("neighbor_id"),
        "score",
    )


def kcenter_coreset(
    corpus: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection — the
    diversity-first subset picker (Gonzalez' 2-approximation, the
    "k-Center-Greedy" of active-learning/coreset curation): start from
    the min-id vector, then repeatedly pick the vector FURTHEST from
    everything selected so far (here: smallest max-cosine), so the
    selected set spreads over the embedding space instead of clustering
    in its densest region.

    Execution uses the incremental-penalty identity
    pen_i(c) = max(pen_{i-1}(c), cos(c, pick_{i-1})): the state is one
    (vec_id, vec, norm, pen, taken) relation, and each step is (1) a
    bounded argmin (ORDER BY pen, vec_id LIMIT 1), (2) a 1-row
    broadcast of the pick, (3) a NARROW map updating pen with one
    in-row fixed-point cosine — no shuffle at all inside the loop, no
    pairwise matrix ever materialized. pen starts at the -2.0 sentinel
    (below any cosine), so the first argmin is the min-id start and no
    NULL-max semantics differ between engines; the sentinel surfaces as
    NULL cover_cos via nullif.

    Scale: k narrow passes over a co-partitioned state relation +
    k single-row broadcasts; state is checkpointed per step
    (references compound otherwise). Linear in |corpus|·k. Returns
    (position, vec_id, cover_cos) where cover_cos is the pick's
    max-cosine to the previously selected set (its coverage radius in
    similarity terms; NULL for the seed pick)."""
    from .iterative import materialize, resolve_reliable

    reliable = resolve_reliable(corpus.sparkSession, None)
    state = materialize(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        )
        .withColumn("nrm", V.norm_sq_fixed(F.col("vec")))
        .withColumn("pen", F.lit(-2.0))
        .withColumn("taken", F.lit(False)),
        reliable,
        strip=False,
    )
    picks = None
    for pos in range(1, k + 1):
        pick = (
            state.filter(~F.col("taken"))
            .orderBy(F.asc("pen"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.col("vec_id").alias("pid"),
                F.col("vec").alias("pvec"),
                F.col("nrm").alias("pnrm"),
                F.col("pen").alias("ppen"),
            )
        )
        out = pick.select(
            F.lit(pos).alias("position"),
            F.col("pid").alias("vec_id"),
            F.nullif(F.col("ppen"), F.lit(-2.0)).alias("cover_cos"),
        )
        picks = out if picks is None else picks.unionByName(out)
        if pos < k:
            cos = V.cosine_fixed(
                V.dot_fixed(F.col("vec"), F.col("pvec")),
                F.col("nrm"),
                F.col("pnrm"),
            )
            state = materialize(
                state.crossJoin(F.broadcast(pick)).select(
                    "vec_id",
                    "vec",
                    "nrm",
                    F.greatest(F.col("pen"), cos).alias("pen"),
                    (F.col("taken") | (F.col("vec_id") == F.col("pid"))).alias(
                        "taken"
                    ),
                ),
                reliable,
            )
    return picks


def sign_pack_words(
    vec_col: str = "embedding", dims: int = 64, word_bits: int = 32
) -> list:
    """Sign-binarize a float vector and pack the bits into 32-bit words
    carried as BIGINTs: word w bit d = 1 iff vec[w*32 + d] >= 0. The
    binary-embedding compression (64 floats -> 8 bytes, 32x) that makes
    exhaustive Hamming scans feasible at billion scale. 32-bit words (not
    63) keep every packed value far from BIGINT sign territory, so the
    same packing is exact integer arithmetic on any SQL engine.

    Row-local: each word is ONE aggregate HOF over a 32-element sequence
    (no explode, no shuffle), staying inside whole-stage codegen.
    """
    return [
        F.expr(
            f"aggregate(sequence(0, {word_bits - 1}), CAST(0 AS BIGINT),"
            f" (acc, d) -> acc + IF(element_at({vec_col}, {w0} + d + 1) >= 0,"
            f" shiftleft(CAST(1 AS BIGINT), d), CAST(0 AS BIGINT)))"
        ).alias(f"w{wi}")
        for wi, w0 in enumerate(range(0, dims, word_bits))
    ]


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact Hamming top-k over sign-binarized bit-packed embeddings:
    the binary-quantization ANN path (FAISS IndexBinaryFlat) — distance
    is popcount(xor) over two packed words, ~100x cheaper per candidate
    than float cosine and 32x smaller in memory, at the cost of sign-only
    resolution (the standard first-stage filter before a float rerank,
    cf. rerank_topk).

    queries must be small (broadcast); the corpus side packs in-row and
    streams — one narrow scan, a broadcast nested-loop against k rows,
    and the per-query top-k window. Output: query_id, neighbor_id,
    hamming, rank — deterministic (neighbor_id) tiebreak, all-integer.
    """
    n_words = 2  # 64 dims / 32-bit words
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[
            w.alias(f"q{i}")
            for i, w in enumerate(sign_pack_words(vec_col))
        ],
    )
    c = widen(corpus).select(
        F.col(id_col).alias("neighbor_id"), *sign_pack_words(vec_col)
    )
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    hd = None
    for i in range(n_words):
        term = F.bit_count(
            F.expr(f"q{i} ^ w{i}")
        )
        hd = term if hd is None else hd + term
    scored = joined.select(
        "query_id", "neighbor_id", hd.cast("int").alias("hamming")
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)
