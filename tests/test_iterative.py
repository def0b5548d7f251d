"""The iterative loop shell (operators/iterative.py): plan-statistics
reset and checkpoint-mode selection. The stats reset is the regression
pin for a Spark 4 behavior where checkpoint preserves ESTIMATED
statistics (LogicalRDD.originStats) — a self-join loop then compounds
sizeInBytes multiplicatively per round until the optimizer spends
minutes in BigInteger math."""

import pytest
from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators.iterative import (
    materialize,
    resolve_reliable,
    strip_plan_stats,
)


def _size_digits(df) -> int:
    s = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return len(str(s))


def test_stats_stay_bounded_through_selfjoin_rounds(spark):
    """5 rounds of a checkpoint → self-join → checkpoint loop: with the
    stats reset the sizeInBytes estimate stays at the session default
    (~20 digits); without it the digit count roughly triples per round
    (observed 77 → 2298 digits in 4 rounds before the fix)."""
    labels = materialize(
        spark.range(100).select(
            F.col("id").alias("doc_id"), F.col("id").alias("component")
        ),
        reliable=False,
    )
    for _ in range(5):
        jump = labels.select(
            F.col("doc_id").alias("k"), F.col("component").alias("jc")
        ).join(
            labels.select(F.col("component").alias("k"), F.col("doc_id").alias("jd")),
            "k",
        )
        nxt = labels.join(jump, labels["doc_id"] == jump["jd"], "left").select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce(F.col("jc"), F.col("component"))
            ).alias("component"),
        )
        labels = materialize(nxt, reliable=False)
        assert _size_digits(labels) < 40, "inherited stats are compounding"
    assert labels.count() == 100


def test_strip_plan_stats_preserves_rows_and_schema(spark):
    df = spark.range(50).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    ck = df.localCheckpoint(eager=True)
    stripped = strip_plan_stats(ck)
    assert stripped.schema == ck.schema
    assert sorted(r["b"] for r in stripped.collect()) == [
        2 * i for i in range(50)
    ]


def test_materialize_nostrip_keeps_stats_not_partitioning(spark):
    """What strip=False actually preserves on this engine (r5 ADVICE
    investigation): the checkpoint's honest plan STATISTICS — not its
    partitioning. Under AQE (our default), Dataset.checkpoint captures
    outputPartitioning from a non-final AdaptiveSparkPlan, which reports
    UnknownPartitioning(0) — so partitioning reuse through a checkpoint
    never happens here with or without the strip, and the per-round
    exchange on a checkpointed join side is inherent, not a regression
    introduced by strip_plan_stats. Pins both facts so an engine upgrade
    that starts preserving partitioning surfaces as a failure (and an
    opportunity)."""
    edges = spark.range(1000).select(
        (F.col("id") % 97).alias("dst"), F.col("id").alias("src")
    )
    ck = edges.repartition("dst").localCheckpoint(eager=True)
    part = ck._jdf.queryExecution().executedPlan().outputPartitioning().toString()
    assert "UnknownPartitioning" in part  # AQE: never preserved

    kept = materialize(edges.repartition("dst"), reliable=False, strip=False)
    stripped = materialize(edges.repartition("dst"), reliable=False, strip=True)
    kept_size = int(
        str(kept._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    stripped_size = int(
        str(stripped._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    # strip=False keeps the honest ~row-count-sized estimate; strip=True
    # falls back to the session default (spark.sql.defaultSizeInBytes,
    # Long.MaxValue — "unknown, assume huge")
    assert kept_size < 10**6 < stripped_size
    assert kept.count() == stripped.count() == 1000


def test_resolve_reliable_follows_checkpoint_dir(spark, tmp_path):
    sc = spark.sparkContext
    assert resolve_reliable(spark, True) is True
    assert resolve_reliable(spark, False) is False
    had = sc.getCheckpointDir()
    if had is None:
        assert resolve_reliable(spark, None) is False
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        assert resolve_reliable(spark, None) is True
    else:  # a prior test set it — auto mode must say reliable
        assert resolve_reliable(spark, None) is True


def test_connected_components_reliable_mode_matches(spark, tmp_path):
    """Forcing reliable checkpoints (spark.sparkContext checkpoint dir +
    df.checkpoint) must not change the clusters."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.dedup import (
        connected_components,
        connected_components_twolevel,
    )

    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)],
        "doc_a long, doc_b long",
    )
    want = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, reliable=False).collect()
    }
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, reliable=True).collect()
    }
    assert got == want
    got2 = {
        r["doc_id"]: r["component"]
        for r in connected_components_twolevel(pairs, reliable=True).collect()
    }
    assert got2 == want


def test_k_core_peels_hand_graph(spark):
    """k=2, rounds=2 on a graph with a triangle + a pendant chain: the
    chain peels away (its tail has degree 1, then its next node drops
    to 1), the triangle survives with all degrees 2."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        # triangle 1-2-3, chain 3-4-5
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],
        "s1 long, s2 long",
    )
    got = {
        r["node"]: r["degree"]
        for r in k_core(edges, k=2, rounds=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def _brute_k_core(edge_list, k):
    """Reference fixpoint peeling (the NetworkX-style definition): drop
    every node of degree < k, restrict, repeat until stable; return the
    surviving {node: degree}."""
    edges = set(edge_list)
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        new_edges = {(a, b) for a, b in edges if a in keep and b in keep}
        if new_edges == edges:
            break
        edges = new_edges
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_k_core_converge_matches_bruteforce(spark):
    """converge=True must reach the true k-core fixpoint regardless of
    how many peel rounds it takes. The long chain into a clique needs
    ~chain-length rounds (each round only exposes the next chain node),
    so a fixed rounds=3 run is provably NOT converged on this graph —
    pinning that converge=True keeps going until the fixpoint."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import k_core

    # 4-clique 1-2-3-4, chain 4-10-11-12-13-14 (peels one per round),
    # plus an isolated triangle 20-21-22 (survives k=2, dies k=3)
    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    chain = [(4, 10), (10, 11), (11, 12), (12, 13), (13, 14)]
    tri = [(20, 21), (21, 22), (20, 22)]
    edge_list = clique + chain + tri
    edges = spark.createDataFrame(edge_list, "s1 long, s2 long")

    for k in (2, 3):
        want = _brute_k_core(edge_list, k)
        got = {
            r["node"]: r["degree"]
            for r in k_core(edges, k=k, converge=True).collect()
        }
        assert got == want, f"k={k}"
    # sanity: the fixed-round variant is genuinely short of the fixpoint
    # on this graph at k=2 — the chain peels one node per round (only
    # the current tail has degree < 2), so rounds=3 still holds chain
    # nodes that converge=True correctly removes
    partial = {
        r["node"] for r in k_core(edges, k=2, rounds=3).collect()
    }
    assert partial != set(_brute_k_core(edge_list, 2))


def test_k_core_converge_empty_result(spark):
    """k above the max degree: converge mode must terminate (edge count
    reaches 0) and return an empty frame, not loop."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2), (2, 3)], "s1 long, s2 long")
    assert k_core(edges, k=5, converge=True).count() == 0


def test_hits_hand_graph_matches_integer_reference(spark):
    """HITS on a known bipartite graph vs a pure-Python int64 reference
    of the same fixed-point recurrence (sum-normalized half-steps):
    authority must concentrate on the co-cited sink, hubs on the node
    citing both sinks."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        HITS_SCALE,
        hits,
    )

    edges = [(1, 10), (1, 11), (2, 10), (3, 12)]
    nodes = sorted({n for e in edges for n in e})
    h = {n: HITS_SCALE // len(nodes) for n in nodes}
    for _ in range(2):
        a_raw = {
            n: sum(h[s] for s, d in edges if d == n) for n in nodes
        }
        t = sum(a_raw.values())
        a = {n: a_raw[n] * HITS_SCALE // t for n in nodes}
        h_raw = {
            n: sum(a[d] for s, d in edges if s == n) for n in nodes
        }
        t = sum(h_raw.values())
        h = {n: h_raw[n] * HITS_SCALE // t for n in nodes}
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long"), rounds=2
        ).collect()
    }
    assert got == {n: (h[n], a[n]) for n in nodes}
    # node 10 is cited by BOTH strong hubs → top authority; node 1 cites
    # both popular sinks → top hub
    assert max(got, key=lambda n: got[n][1]) == 10
    assert max(got, key=lambda n: got[n][0]) == 1


def test_personalized_pagerank_hand_graph(spark):
    """Seeded PageRank on a known graph vs a pure-Python int64
    reference: mass must flow only from the seed, and a node unreachable
    from the seed must hold rank 0 even when it has in-edges."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        RANK_SCALE,
        personalized_pagerank,
    )

    # 1 -> 2 -> 3; 4 -> 3 (4 is NOT reachable from the seed 1)
    edges = [(1, 2), (2, 3), (4, 3)]
    seeds = [1]
    nodes = sorted({n for e in edges for n in e})
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    r = {n: (RANK_SCALE // len(seeds) if n in seeds else 0) for n in nodes}
    for _ in range(3):
        nr = {}
        for n in nodes:
            tp = (15 * RANK_SCALE // 100) // len(seeds) if n in seeds else 0
            inflow = sum(
                (85 * r[s]) // (100 * outd[s]) for s, d in edges if d == n
            )
            nr[n] = tp + inflow
        r = nr
    got = {
        row["node"]: row["r"]
        for row in personalized_pagerank(
            spark.createDataFrame(edges, "src long, dst long"),
            spark.createDataFrame([(s,) for s in seeds], "node long"),
            rounds=3,
        ).collect()
    }
    assert got == r
    assert got[4] == 0  # has out-edges only; never reachable from seed
    assert got[1] > 0 and got[3] > 0


def test_personalized_pagerank_rejects_empty_seed_set(spark):
    """seeds ∩ nodes = ∅ would divide by ns=0 → NULL ranks propagating
    silently under non-ANSI mode; the operator must fail loud instead
    (r10 advice)."""
    import pytest

    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ghost_seeds = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no seed appears"):
        personalized_pagerank(edges, ghost_seeds, rounds=1)


def test_betweenness_sampled_matches_brandes_reference(spark):
    """Pin betweenness_sampled against a from-scratch bounded-depth
    Brandes reference (same integer fixed-point dependency terms) on a
    hand graph with branching, path-count merging (two equal-length
    paths 0->3), and a chain tail — sigma merging and the backward
    sweep's per-successor division both exercised."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        betweenness_sampled,
    )

    S = 1 << 20
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 6)]
    seeds = [0, 5]

    def ref():
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        bc = {}
        for s in seeds:
            dist, sigma = {s: 0}, {s: 1}
            frontier = [s]
            for d in range(1, 4):
                nxt = sorted(
                    {
                        v
                        for u in frontier
                        for v in adj.get(u, ())
                        if v not in dist
                    }
                )
                for v in nxt:
                    dist[v] = d
                    sigma[v] = sum(
                        sigma[u]
                        for u in adj.get(v, ())
                        if dist.get(u) == d - 1
                    )
                frontier = nxt
            delta = {v: 0 for v in dist}
            for d in range(2, 0, -1):
                for v in [x for x in dist if dist[x] == d]:
                    delta[v] = sum(
                        sigma[v] * (S + delta[w]) // sigma[w]
                        for w in adj.get(v, ())
                        if dist.get(w) == d + 1
                    )
            for v, dl in delta.items():
                if dist[v] > 0 and dl > 0:
                    bc[v] = bc.get(v, 0) + dl
        return bc

    e = spark.createDataFrame(edges, "src long, dst long")
    src = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["bc_fp"]
        for r in betweenness_sampled(e, src, rounds=3).collect()
    }
    assert got == ref()


def test_symmetrize_distinct_false_parity_on_disjoint_ranges(spark):
    """symmetrize_distinct=False must be result-identical to the
    default whenever the contract holds (edges distinct, src/dst id
    ranges disjoint — the bipartite encoding every graph_* query
    uses). Pins the r15 shuffle shave for betweenness/bfs/labeled-bfs
    on a disjoint-range hand graph with path-count merging."""
    from kafka_processor_cosmos_tx_dispatch_spark.operators.graph import (
        betweenness_sampled,
        bfs_hops,
        bfs_hops_labeled,
    )

    # bipartite: lhs {0,1,2} on src, rhs {10,11,12} on dst
    edges = [(0, 10), (0, 11), (1, 10), (1, 12), (2, 11), (2, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (2,)], "node long")

    for fn in (bfs_hops, bfs_hops_labeled):
        base = sorted(
            tuple(r) for r in fn(e, seeds, rounds=3).collect()
        )
        fast = sorted(
            tuple(r)
            for r in fn(
                e, seeds, rounds=3, symmetrize_distinct=False
            ).collect()
        )
        assert base == fast, fn.__name__

    base = sorted(
        tuple(r) for r in betweenness_sampled(e, seeds, rounds=3).collect()
    )
    fast = sorted(
        tuple(r)
        for r in betweenness_sampled(
            e, seeds, rounds=3, symmetrize_distinct=False
        ).collect()
    )
    assert base == fast
