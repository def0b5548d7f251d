"""'graph'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    W,
    _HITS_SCALE,
    _WALK_STEPS,
    _hits_iter,
    _kcore_round,
    _lp_round,
    _ppr_iter,
    _pr_iter,
    _pr_iter_dangling,
    _walk_step_sql,
    _wpr_iter,
    load_table,
    register,
)


@register(
    "graph_pagerank",
    f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    tp AS (SELECT 150000000000 // n AS t FROM nn),
    outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
    {_pr_iter(1, "r0")},
    {_pr_iter(2, "i1")},
    {_pr_iter(3, "i2")}
    SELECT node, CAST(r AS BIGINT) AS r FROM i3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 unrolled iterations, damping 0.85) over
    the customer→supplier purchase graph — the second iterative
    algorithm next to connected components (operators/graph.py:pagerank,
    shared with the 50x scale probe), in the Pregel shape: each
    round is one edges⋈ranks equi-join + a dst-keyed agg. All arithmetic
    is int64 floor division (rank scale 10^12, contribution
    (85·r) DIV (100·outdeg)), so ranks are exact integers: no float
    accumulation order to diverge between engines, and the oracle is the
    same three rounds unrolled as CTEs. Dangling-node mass is not
    redistributed (documented simplification — both engines identical).
    Scale: ranks/nodes/outdeg all partition by node key; for deep
    iteration counts the loop needs checkpoint truncation exactly like
    operators/dedup.py:connected_components (3 rounds doesn't)."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, rounds=3)


@register(
    "graph_assortativity",
    """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS xd
             FROM edges GROUP BY src),
    ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS yd
            FROM edges GROUP BY dst),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(o.xd) AS BIGINT) AS sx,
             CAST(SUM(i.yd) AS BIGINT) AS sy,
             CAST(SUM(o.xd * i.yd) AS BIGINT) AS sxy,
             CAST(SUM(o.xd * o.xd) AS BIGINT) AS sxx,
             CAST(SUM(i.yd * i.yd) AS BIGINT) AS syy
      FROM edges e JOIN outd o ON o.src = e.src
      JOIN ind i ON i.dst = e.dst)
    SELECT n AS n_edges,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS r_assort
    FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r): the Pearson correlation of
    (source out-degree, target in-degree) over edges — the one-number
    graph-health signal crawl analysts read first (strongly
    disassortative ⇒ hub-and-spoke link farms; assortative ⇒ organic
    community structure). All moments are exact int64 sums (edge count
    × degree² stays far under the 2^63 line on this graph family), the
    coefficient is one fixed IEEE expression over them.

    Scale: two degree aggs + two degree joins back onto edges (all on
    the node key), one global 1-row moment agg — linear in edges."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("xd"))
    ind = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("yd"))
    m = (
        edges.join(outd, "src")
        .join(ind, "dst")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xd").alias("sx"),
            F.sum("yd").alias("sy"),
            F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
            F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
            F.sum(F.col("yd") * F.col("yd")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return m.select(
        F.col("n").alias("n_edges"),
        (
            (nd * F.col("sxy").cast("double") - sx * sy)
            / (
                F.sqrt(nd * F.col("sxx").cast("double") - sx * sx)
                * F.sqrt(nd * F.col("syy").cast("double") - sy * sy)
            )
        ).alias("r_assort"),
    )


@register(
    "graph_weighted_pagerank",
    f"""
    WITH edges AS (
      SELECT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    tp AS (SELECT 150000000000 // n AS t FROM nn),
    outw AS (SELECT src, SUM(w) AS wt FROM edges GROUP BY src),
    r0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
    {_wpr_iter(1, "r0")},
    {_wpr_iter(2, "i1")},
    {_wpr_iter(3, "i2")}
    SELECT node, CAST(r AS BIGINT) AS r FROM i3
    """,
)
def graph_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with PURCHASE-COUNT edge weights
    (operators/graph.py:weighted_pagerank): a customer who bought from
    a supplier 12 times pushes 12× the rank mass of a one-off buyer —
    the weighted variant link-graph curation actually runs (link
    multiplicity matters). Contribution (85·r·w) DIV (100·W_out) keeps
    everything int64-exact; oracle = 3 unrolled weighted rounds. The
    edge weight comes from dropping graph_pagerank's DISTINCT: same
    join, one groupBy instead."""
    from ..operators.graph import weighted_pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return weighted_pagerank(edges, rounds=3)


@register(
    "graph_ppr",
    f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    seeds AS (SELECT DISTINCT src AS node FROM edges WHERE src % 50 = 0),
    ns AS (SELECT COUNT(*) AS ns FROM seeds),
    outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT n_.node,
                  CASE WHEN sd.node IS NOT NULL
                       THEN 1000000000000 // ns.ns ELSE 0 END AS r
           FROM nodes n_ CROSS JOIN ns
           LEFT JOIN seeds sd ON sd.node = n_.node),
    {_ppr_iter(1, "r0")},
    {_ppr_iter(2, "i1")},
    {_ppr_iter(3, "i2")}
    SELECT node, CAST(r AS BIGINT) AS r FROM i3
    """,
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized (seeded) PageRank
    (operators/graph.py:personalized_pagerank, 3 rounds): teleport
    restricted to the seed customers (custkey % 50 = 0) — the
    TrustRank-style quality propagation crawl curation runs from
    known-good seed hosts. Same int64 fixed-point contract and plan
    shape as graph_pagerank; the oracle unrolls the seeded teleport as
    CASE on a broadcast seed flag. Nodes unreachable from seeds hold
    rank 0 (suppliers two hops out retain mass only via seed
    customers' purchases — the proximity signal)."""
    from ..operators.graph import personalized_pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") % 50 == 0
    )
    return personalized_pagerank(edges, seeds, rounds=3)


@register(
    "graph_hits",
    f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    h0 AS (SELECT node, {_HITS_SCALE} // nn.n AS h
           FROM nodes CROSS JOIN nn),
    {_hits_iter(1, "h0")},
    {_hits_iter(2, "h1")}
    SELECT h2.node, CAST(h2.h AS BIGINT) AS hub, CAST(a2.a AS BIGINT) AS auth
    FROM h2 JOIN a2 ON h2.node = a2.node
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.py:hits, 2 rounds) over
    the same customer→supplier purchase graph as graph_pagerank — the
    third iterative link-analysis operator. All arithmetic is int64
    fixed-point with sum (L1) normalization per half-step, so both
    engines produce identical integers; the oracle unrolls the same two
    rounds as CTEs. On this bipartite graph authorities land on
    suppliers (demand-weighted) and hubs on customers."""
    from ..operators.graph import hits

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return hits(edges, rounds=2)


@register(
    "graph_pagerank_dangling",
    f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    dang AS (SELECT node FROM nodes EXCEPT SELECT src FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    tp AS (SELECT 150000000000 // n AS t FROM nn),
    outd AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
    {_pr_iter_dangling(1, "r0")},
    {_pr_iter_dangling(2, "i1")},
    {_pr_iter_dangling(3, "i2")},
    {_pr_iter_dangling(4, "i3")},
    {_pr_iter_dangling(5, "i4")}
    SELECT node, CAST(r AS BIGINT) AS r FROM i5
    """,
)
def graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution (operators/graph.py:
    pagerank(dangling=True)): in the customer→supplier purchase graph
    every supplier node is a sink, so without redistribution their rank
    mass (most of the total after round 1) simply vanishes — this
    variant hands it back uniformly, the textbook-correct formulation.
    The per-round mass is a 1-row broadcast aggregate over the static
    sink-node set; 5 rounds also exercises the deep-iteration
    checkpoint shell (operators/iterative.py: lineage truncation +
    plan-stats reset at round 4). Same exact-int64 arithmetic as
    graph_pagerank, so the oracle (the same 5 rounds as unrolled CTEs
    with a scalar dm term) hash-compares exactly."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, rounds=5, dangling=True, checkpoint_every=1)


@register(
    "graph_triangle_count",
    """
    WITH cs AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    topk AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c
                       ORDER BY n DESC, s) AS rn
        FROM cs) WHERE rn <= 4),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS w
      FROM topk a JOIN topk b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2),
    edges AS (SELECT s1, s2 FROM pairs WHERE w >= 8),
    deg AS (SELECT node, COUNT(*) AS d FROM (
              SELECT s1 AS node FROM edges
              UNION ALL SELECT s2 FROM edges) GROUP BY 1),
    keyed AS (
      SELECT e.s1, e.s2, d1.d * 100000000 + e.s1 AS k1,
             d2.d * 100000000 + e.s2 AS k2
      FROM edges e JOIN deg d1 ON d1.node = e.s1
                   JOIN deg d2 ON d2.node = e.s2),
    o AS (SELECT CASE WHEN k1 < k2 THEN s1 ELSE s2 END AS src,
                 CASE WHEN k1 < k2 THEN s2 ELSE s1 END AS dst,
                 CASE WHEN k1 < k2 THEN k2 ELSE k1 END AS dst_key
          FROM keyed),
    tri AS (
      SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
      FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst_key < w2.dst_key
      JOIN o e3 ON e3.src = w1.dst AND e3.dst = w2.dst)
    SELECT node, COUNT(*) AS n_triangles FROM (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri)
    GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.py:triangle_count) over
    the supplier co-purchase graph — the third classic distributed-graph
    algorithm next to PageRank and connected components, and the one
    whose naive form dies on hubs. Two scale guards, both deterministic:
    the bipartite customer→supplier projection is DEGREE-CAPPED (top-4
    suppliers per customer by line count, rank-tiebroken — ≤6 pairs per
    customer, so the projection can't go quadratic in a customer's
    degree) and thresholded (≥8 co-purchases), and the triangle join
    uses DEGREE ORIENTATION so wedge fan-out is bounded by O(√|E|) per
    node instead of raw hub degree. All equi-joins, all integers."""
    from ..operators.graph import triangle_count

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("c").orderBy(F.desc("n"), F.asc("s"))
    topk = cs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 4
    )
    a = topk.select("c", F.col("s").alias("s1"))
    b = topk.select("c", F.col("s").alias("s2"))
    edges = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 8)
        .select("s1", "s2")
    )
    return triangle_count(edges)


@register(
    "graph_k_core",
    f"""
    WITH cs AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    topk AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c
                       ORDER BY n DESC, s) AS rn
        FROM cs) WHERE rn <= 4),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS w
      FROM topk a JOIN topk b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2),
    e0 AS (SELECT s1, s2 FROM pairs WHERE w >= 8),
    {_kcore_round(1, 2)},
    {_kcore_round(2, 2)},
    {_kcore_round(3, 2)}
    SELECT node, COUNT(*) AS degree FROM (
      SELECT s1 AS node FROM e3
      UNION ALL SELECT s2 FROM e3)
    GROUP BY node
    """,
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (3 synchronous peel rounds, k=2) over the
    degree-capped supplier co-purchase graph — the fourth classic graph
    primitive here (after PageRank / CC / triangles / label prop), and
    the standard PRE-FILTER before expensive community or similarity
    passes: nodes that can't sustain k connections after peeling can't
    be in any k-dense structure, so dropping them first shrinks the
    quadratic stages' input. Bounded-round formulation keeps the oracle
    unrollable (operators/graph.py:k_core; each peel = one degree agg +
    two restricting equi-joins on a monotonically shrinking edge set).
    """
    from ..operators.graph import k_core

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("c").orderBy(F.desc("n"), F.asc("s"))
    topk = cs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 4
    )
    a = topk.select("c", F.col("s").alias("s1"))
    b = topk.select("c", F.col("s").alias("s2"))
    edges = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 8)
        .select("s1", "s2")
    )
    return k_core(edges, k=2, rounds=3)


@register(
    "graph_label_propagation",
    f"""
    WITH base AS (
      SELECT DISTINCT o.o_custkey AS a, 10000000 + l.l_suppkey AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT a AS src, b AS dst FROM base
              UNION ALL SELECT b, a FROM base),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    l0 AS (SELECT node, node AS lab FROM nodes),
    {_lp_round(1, "l0")},
    {_lp_round(2, "l1")},
    {_lp_round(3, "l2")}
    SELECT node, lab FROM l3
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation (3 synchronous Pregel rounds) over the
    undirected customer–supplier purchase graph: every node starts
    labelled with its own id and each round adopts the minimum label in
    its closed neighborhood. After convergence labels identify connected
    components; the fixed-round form here pins the *message-passing
    operator itself* (join-shuffle-min per round) against the oracle's
    identical unrolled rounds, complementing run-to-convergence CC
    (operators/dedup.py) which is checked only at its fixed point.

    Scale: each round is edges⋈labels (both partitioned by node key) +
    a min-agg — the same shape Spark reuses across rounds; deep
    iteration would wrap rounds in operators/iterative.py exactly like
    pagerank (3 lazy rounds don't need checkpointing)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = base.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(base.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(3):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
            )
        )
    return labels


@register(
    "graph_jaccard_neighbors",
    """
    WITH cs AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    topk AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c
                       ORDER BY n DESC, s) AS rn
        FROM cs) WHERE rn <= 4),
    deg AS (SELECT s, COUNT(*) AS d FROM topk GROUP BY 1),
    pairs AS (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common
      FROM topk a JOIN topk b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2)
    SELECT p.s1, p.s2, p.common,
           CAST(p.common AS DOUBLE)
             / CAST(d1.d + d2.d - p.common AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN deg d1 ON d1.s = p.s1
    JOIN deg d2 ON d2.s = p.s2
    WHERE p.common >= 3
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node similarity by common-neighbor Jaccard over the bipartite
    customer→supplier purchase graph: suppliers sharing ≥3 top-tier
    customers score |common|/|union| — the link-prediction / entity-
    resolution primitive on graphs (who is substitutable for whom). Hot
    customers are capped to their top-4 suppliers by purchase count
    (unique (n, s) tiebreak) BEFORE pairing — the same per-node degree
    cap as graph_triangle_count, which bounds the per-customer pair
    blowup at C(4,2)=6 instead of C(deg,2).

    The jaccard double is one IEEE division of two exact ints —
    bit-identical across engines.

    Scale: pairing is an equi-join on the customer key (never all-pairs);
    degree joins are on the supplier key. Every shuffle is keyed;
    skew is pre-capped."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("c").orderBy(F.desc("n"), F.asc("s"))
    topk = (
        cs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .select("c", "s")
    )
    deg = topk.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a, b = topk.alias("a"), topk.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= 3)
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    return (
        pairs.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "graph_resource_allocation",
    """
    WITH cs AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    topk AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c
                       ORDER BY n DESC, s) AS rn
        FROM cs) WHERE rn <= 4),
    degc AS (SELECT c, COUNT(*) AS d FROM topk GROUP BY 1)
    SELECT s1, s2, CAST(common AS BIGINT) AS common,
           ra_fp / 1048576.0 AS ra
    FROM (
      SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common,
             SUM(1048576 // degc.d) AS ra_fp
      FROM topk a
      JOIN topk b ON a.c = b.c AND a.s < b.s
      JOIN degc ON degc.c = a.c
      GROUP BY 1, 2)
    WHERE common >= 3
    """,
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction over the capped bipartite
    purchase graph: RA(s1,s2) = Σ_{c ∈ common} 1/deg(c) — common
    neighbors weighted DOWN by how promiscuous they are, the strongest
    of the simple link predictors (Zhou et al. 2009). Chosen over
    Adamic–Adar deliberately: AA's 1/log(deg) needs libm log (last-ULP
    engine drift), while 1/deg is exact in fixed point
    (SUM(2^20 // d) as BIGINT, one final double division). Same top-4
    per-customer degree cap and customer-keyed pair join as
    graph_jaccard_neighbors — C(4,2) pair bound per hot key, never
    all-pairs."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("c").orderBy(F.desc("n"), F.asc("s"))
    topk = (
        cs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .select("c", "s")
    )
    degc = topk.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = topk.alias("a")
    b = topk.alias("b")
    g = degc.alias("g")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .join(g, F.col("a.c") == F.col("g.c"))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr("1048576 DIV d")).alias("ra_fp"),
        )
        .filter(F.col("common") >= 3)
    )
    return pairs.select(
        "s1",
        "s2",
        "common",
        (F.col("ra_fp") / F.lit(1048576.0)).alias("ra"),
    )


@register(
    "graph_bfs_hops",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    walk(node, d) AS (
      SELECT DISTINCT src, 0 FROM und WHERE src < 100
      UNION
      SELECT u.dst, w.d + 1
      FROM walk w JOIN und u ON u.src = w.node WHERE w.d < 3)
    SELECT node, CAST(MIN(d) AS INTEGER) AS dist
    FROM walk GROUP BY node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source bounded-hop BFS (3 hops from customers with key
    < 100) over the undirected purchase graph — the reachability /
    blast-radius primitive (operators/graph.py:bfs_hops). Frontier
    BFS: per round one frontier⋈edges equi-join + distinct + anti-join
    against visited, all keyed on node; first-discovery level = min
    distance, so no per-node min agg is ever shuffled. The oracle is a
    depth-bounded recursive CTE with a MIN rollup — same fixpoint,
    different engine idiom."""
    from ..operators.graph import bfs_hops

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    sources = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") < 100)
        .distinct()
    )
    # bipartite ids (cust < 10M <= supp): reversed pairs can't collide
    # with forward pairs and edges is distinct — skip the dedup shuffle
    return bfs_hops(edges, sources, rounds=3, symmetrize_distinct=False)


@register(
    "graph_closeness_bfs",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    walk(seed, node, d) AS (
      SELECT DISTINCT src, src, 0 FROM und WHERE src < 5
      UNION
      SELECT w.seed, u.dst, w.d + 1
      FROM walk w JOIN und u ON u.src = w.node WHERE w.d < 3),
    dist AS (
      SELECT seed, node, MIN(d) AS dist FROM walk GROUP BY seed, node)
    SELECT seed,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           CAST(SUM(CASE WHEN dist > 0 THEN 1048576 // dist ELSE 0 END)
                AS BIGINT) AS harmonic_fp
    FROM dist GROUP BY seed
    """,
)
def graph_closeness_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark closeness / harmonic centrality for a bounded seed set
    (customers with key < 5) within 3 hops of the undirected purchase
    graph — the "how central is this node really" metric next to
    PageRank, computed the way it is computed at scale: per-seed
    labeled BFS over LANDMARKS (operators/graph.py:bfs_hops_labeled),
    never the all-pairs matrix. harmonic_fp = Σ 2^20 DIV dist is the
    harmonic form (defined even when the graph is disconnected, which
    closeness proper is not), exact in int64: ≤ 2^20 per reached node,
    ~10^4 reachable nodes ⇒ ≤ 2^34 per seed.

    Scale: per round one frontier⋈edges equi-join + (seed, node) dedup
    + anti-join, state linear in Σ per-seed reach; the centrality
    rollup is one (seed)-keyed agg of the final distance relation. The
    oracle re-derives the same distances as a depth-bounded recursive
    CTE with a MIN rollup per (seed, node)."""
    from ..operators.graph import bfs_hops_labeled

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    seeds = orders.select(F.col("o_custkey").alias("node")).filter(
        F.col("node") < 5
    )
    # same disjoint bipartite encoding: no dedup shuffle needed
    dist = bfs_hops_labeled(
        edges, seeds, rounds=3, symmetrize_distinct=False
    )
    return dist.groupBy("seed").agg(
        (F.count(F.lit(1)) - 1).alias("n_reached"),
        F.sum("dist").alias("sum_dist"),
        F.sum(
            F.when(
                F.col("dist") > 0, F.expr("1048576 DIV dist")
            ).otherwise(F.lit(0))
        ).alias("harmonic_fp"),
    )


@register(
    "graph_degree_histogram",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src)
    SELECT CAST(length(printf('%b', d)) - 1 AS INTEGER) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           CAST(SUM(d) AS BIGINT) AS total_edges
    FROM deg GROUP BY 1
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree distribution of the purchase graph in log₂ buckets —
    the power-law / hub-skew sanity check that precedes every other
    graph pass (a heavy tail here is what the degree caps in triangles
    / Jaccard and the salting in skewed joins exist for; crawl-graph
    curation reads this chart before trusting PageRank). floor(log₂ d)
    is computed EXACTLY on both engines as binary-string length − 1
    (Spark `bin()`, DuckDB `printf('%%b')`) — float log2 of an exact
    power can land on x.9999… and bucket one off.

    Scale: degree agg (map-side combined) + a bounded ~64-bucket agg —
    two shuffles, the second tiny; nothing touches the edge payload."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    deg = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.groupBy(
        (F.length(F.bin(F.col("d"))) - 1).cast("int").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").alias("min_degree"),
        F.max("d").alias("max_degree"),
        F.sum("d").alias("total_edges"),
    )


@register(
    "graph_random_walks",
    f"""
    WITH cs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
                FROM orders o JOIN lineitem l
                  ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT c AS src, 10000000 + s AS dst FROM cs
              UNION SELECT 10000000 + s, c FROM cs),
    adj AS (SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rnk
            FROM edges),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    w0 AS (SELECT src AS seed, 0 AS step, src AS node
           FROM deg WHERE src < 20),
    {",".join(_walk_step_sql(i).strip() for i in range(_WALK_STEPS))}
    SELECT seed, CAST(step AS INTEGER) AS step, node
    FROM (SELECT * FROM w0 UNION ALL SELECT * FROM w1
          UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
          UNION ALL SELECT * FROM w4)
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks over the purchase graph — the
    DeepWalk/node2vec CORPUS GENERATOR expressed as iterated equi-joins:
    each step picks the neighbor whose adjacency rank (dst-sorted
    ROW_NUMBER) equals hash(node, step) mod degree, so the "random"
    choice is a pure function of (node, step) — any engine draws the
    identical walks with no RNG state, the same trick as the md5 ticket
    race in sample_weighted_reservoir. 20 seeds × 4 steps here; the
    walk table (seed, step, node) is what a skip-gram embedding
    trainer consumes.

    Scale: one adjacency build (src-keyed window) + one degree agg,
    then each step is ONE equi-join of the frontier against the
    adjacency on (node, rank) — linear in walk count per step,
    billions of walks are just a bigger frontier. The lazy 4-step
    unroll shares the adjacency subplan across steps; deeper walks
    would checkpoint the frontier per step (the iterative.py shell)
    instead of growing the plan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = cs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        cs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    ).distinct()
    adj = edges.withColumn(
        "rnk",
        F.row_number().over(W.partitionBy("src").orderBy("dst")),
    ).localCheckpoint()
    # deg is referenced once for the seed set plus once per step, but all
    # references are IDENTICAL agg subtrees over the checkpointed adj in
    # ONE plan, so AQE exchange reuse already dedupes the execution —
    # an eager localCheckpoint here measured +60% with +3.7 jobs per run
    # (r16 probe, the label-propagation lesson again). Leave lazy.
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    walk = (
        deg.filter(F.col("src") < 20)
        .select(
            F.col("src").alias("seed"),
            F.lit(0).alias("step"),
            F.col("src").alias("node"),
        )
    )
    out = walk
    for i in range(_WALK_STEPS):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("node").cast("string"),
                            F.lit(i + 1).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("deg")
        )
        # (node, rnk) two-column EQUI-join: the frontier computes its
        # pick rank first, so a hub node never fans out deg-wide before
        # a filter — each frontier row matches exactly one adjacency row
        walk = (
            walk.join(deg.withColumnRenamed("src", "node"), "node")
            .withColumn("rnk", (pick + 1).cast("int"))
            .join(
                adj.select(
                    F.col("src").alias("node"),
                    F.col("dst").alias("next_node"),
                    "rnk",
                ),
                ["node", "rnk"],
            )
            .select(
                "seed",
                F.lit(i + 1).alias("step"),
                F.col("next_node").alias("node"),
            )
        )
        out = out.unionByName(walk)
    return out.select(
        "seed", F.col("step").cast("int").alias("step"), "node"
    )


@register(
    "graph_connected_components",
    """
    WITH RECURSIVE
    cs AS (SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS n
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           GROUP BY 1, 2),
    bestc AS (SELECT c, s FROM (SELECT c, s, ROW_NUMBER() OVER
              (PARTITION BY c ORDER BY n DESC, s) AS rn FROM cs)
              WHERE rn = 1),
    bests AS (SELECT c, s FROM (SELECT c, s, ROW_NUMBER() OVER
              (PARTITION BY s ORDER BY n DESC, c) AS rn FROM cs)
              WHERE rn = 1),
    e0 AS (SELECT c, s FROM bestc UNION SELECT c, s FROM bests),
    edges AS (SELECT c AS a, 10000000 + s AS b FROM e0
              UNION SELECT 10000000 + s, c FROM e0),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    lbl(n, l) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.b, lbl.l FROM lbl JOIN edges e ON e.a = lbl.n),
    comp AS (SELECT n, MIN(l) AS component FROM lbl GROUP BY n)
    SELECT CAST(component AS BIGINT) AS component,
           CAST(SUM(CASE WHEN n < 10000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           CAST(SUM(CASE WHEN n >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM comp GROUP BY component
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the best-edge (nearest-neighbor) forest
    of the purchase graph: keep each customer's single strongest
    supplier edge and each supplier's single strongest customer edge
    (count-desc, key-asc ties), union, and resolve components — the
    Boruvka-step clustering that turns a bipartite interaction graph
    into behavioral clusters. Best-edge sparsification is RELATIVE, so
    the graph stays non-degenerate at every scale factor (an absolute
    co-order threshold is one giant component at sf0.01 and near-empty
    at sf0.1). Component id = min node id, the dedup-cluster convention.

    The engine side reuses operators/dedup.py:connected_components —
    accelerated min-label propagation with pointer jumping (O(log
    diameter) checkpointed rounds, convergence detected by an observe()
    metric on the same job). The oracle is a recursive-CTE min-label
    closure — tractable exactly because the NN forest keeps components
    small; the Spark side never enumerates the closure. Scale: the
    best-edge windows partition by node key; each CC round is one
    edges-to-labels equi-join, linear in |E|."""
    from ..operators.dedup import connected_components

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = W.partitionBy("c").orderBy(F.desc("n"), F.asc("s"))
    ws = W.partitionBy("s").orderBy(F.desc("n"), F.asc("c"))
    bestc = cs.withColumn("rn", F.row_number().over(wc)).filter(
        F.col("rn") == 1
    )
    bests = cs.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") == 1
    )
    e0 = bestc.select("c", "s").union(bests.select("c", "s")).distinct()
    pairs = e0.select(
        F.col("c").alias("doc_a"), (F.lit(10000000) + F.col("s")).alias("doc_b")
    )
    cc = connected_components(pairs)
    return cc.groupBy("component").agg(
        F.sum(F.when(F.col("doc_id") < 10000000, 1).otherwise(0))
        .cast("long")
        .alias("n_customers"),
        F.sum(F.when(F.col("doc_id") >= 10000000, 1).otherwise(0))
        .cast("long")
        .alias("n_suppliers"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )


@register(
    "graph_betweenness_sampled",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS src, 10000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    d0 AS (SELECT DISTINCT src AS seed, src AS node, CAST(1 AS BIGINT)
             AS sigma FROM und WHERE src < 5),
    n1 AS (SELECT d0.seed, u.dst AS node, CAST(SUM(d0.sigma) AS BIGINT)
             AS sigma
           FROM d0 JOIN und u ON u.src = d0.node GROUP BY 1, 2),
    d1 AS (SELECT n1.* FROM n1 WHERE NOT EXISTS (SELECT 1 FROM d0
             WHERE d0.seed = n1.seed AND d0.node = n1.node)),
    n2 AS (SELECT d1.seed, u.dst AS node, CAST(SUM(d1.sigma) AS BIGINT)
             AS sigma
           FROM d1 JOIN und u ON u.src = d1.node GROUP BY 1, 2),
    d2 AS (SELECT n2.* FROM n2
           WHERE NOT EXISTS (SELECT 1 FROM d0
             WHERE d0.seed = n2.seed AND d0.node = n2.node)
             AND NOT EXISTS (SELECT 1 FROM d1
             WHERE d1.seed = n2.seed AND d1.node = n2.node)),
    n3 AS (SELECT d2.seed, u.dst AS node, CAST(SUM(d2.sigma) AS BIGINT)
             AS sigma
           FROM d2 JOIN und u ON u.src = d2.node GROUP BY 1, 2),
    d3 AS (SELECT n3.* FROM n3
           WHERE NOT EXISTS (SELECT 1 FROM d0
             WHERE d0.seed = n3.seed AND d0.node = n3.node)
             AND NOT EXISTS (SELECT 1 FROM d1
             WHERE d1.seed = n3.seed AND d1.node = n3.node)
             AND NOT EXISTS (SELECT 1 FROM d2
             WHERE d2.seed = n3.seed AND d2.node = n3.node)),
    dl2 AS (
      SELECT v.seed, v.node,
             CAST(SUM(v.sigma * (1048576 + 0) // w.sigma) AS BIGINT)
               AS delta
      FROM d2 v JOIN und u ON u.src = v.node
      JOIN d3 w ON w.seed = v.seed AND w.node = u.dst
      GROUP BY 1, 2),
    dl2f AS (SELECT d2.seed, d2.node, COALESCE(dl2.delta, 0) AS delta
             FROM d2 LEFT JOIN dl2 USING (seed, node)),
    dl1 AS (
      SELECT v.seed, v.node,
             CAST(SUM(v.sigma * (1048576 + w.delta) // w.sigma) AS BIGINT)
               AS delta
      FROM d1 v JOIN und u ON u.src = v.node
      JOIN (SELECT f.seed, f.node, f.delta, d2.sigma
            FROM dl2f f JOIN d2 USING (seed, node)) w
        ON w.seed = v.seed AND w.node = u.dst
      GROUP BY 1, 2),
    dl1f AS (SELECT d1.seed, d1.node, COALESCE(dl1.delta, 0) AS delta
             FROM d1 LEFT JOIN dl1 USING (seed, node)),
    alld AS (SELECT * FROM dl2f UNION ALL SELECT * FROM dl1f)
    SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_fp
    FROM alld GROUP BY node HAVING SUM(delta) > 0
    """,
)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled betweenness centrality
    (operators/graph.py:betweenness_sampled; Brandes 2001 with a
    5-landmark seed set and a 3-hop bound — the standard approximation
    at scale, since exact betweenness is all-pairs): forward labeled BFS
    carrying exact int64 shortest-path counts, then the backward
    dependency sweep with each (v,w) successor term one exact integer
    division — both engines reproduce the sum bit-for-bit (the float
    form pins neither summation order nor libm). Completes the
    centrality family: degree (histogram), closeness (landmark
    harmonic), eigenvector (PageRank/HITS), and now betweenness.

    Scale: forward state linear in Σ per-seed reach like
    graph_closeness_bfs; the backward sweep is one
    level⋈edges⋈next-level equi-join per level (successor pairs only,
    never all-pairs), keyed on (seed, node) throughout. The oracle
    unrolls the same three levels as plain CTEs."""
    from ..operators.graph import betweenness_sampled

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(10_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") < 5
    )
    # the bipartite id encoding (cust < 10M <= supp) makes forward and
    # reversed pairs disjoint and `edges` is already distinct, so the
    # symmetrization needs no dedup shuffle
    return betweenness_sampled(
        edges, seeds, rounds=3, symmetrize_distinct=False
    )


@register(
    "graph_modularity",
    """
    WITH base AS (
      SELECT DISTINCT o.o_custkey AS a, 10000000 + l.l_suppkey AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM base),
    comm AS (
      SELECT c_custkey AS node, CAST(c_nationkey AS BIGINT) AS com
      FROM customer
      UNION ALL
      SELECT 10000000 + s_suppkey AS node, CAST(s_nationkey AS BIGINT)
      FROM supplier),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM base UNION ALL SELECT b FROM base)
      GROUP BY node),
    dsum AS (
      SELECT com, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d) AS BIGINT) AS d_sum
      FROM comm JOIN deg USING (node) GROUP BY com),
    ein AS (
      SELECT na.com, CAST(COUNT(*) AS BIGINT) AS e_in
      FROM base
      JOIN comm na ON base.a = na.node
      JOIN comm nb ON base.b = nb.node
      WHERE na.com = nb.com
      GROUP BY na.com),
    rows_ AS (
      SELECT dsum.com, dsum.n_nodes, COALESCE(ein.e_in, 0) AS e_in,
             dsum.d_sum,
             4 * m.m * COALESCE(ein.e_in, 0) - dsum.d_sum * dsum.d_sum
               AS q_num
      FROM dsum LEFT JOIN ein USING (com), m)
    SELECT com, n_nodes, e_in, d_sum, q_num,
           CAST((1000 * SUM(q_num) OVER ()) // (4 * m.m * m.m)
             AS BIGINT) AS q_permille
    FROM rows_, m
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman MODULARITY of the nation partition over the undirected
    customer–supplier purchase graph — the community-QUALITY metric the
    detection family (label propagation, connected components) reports
    against: Q = Σ_c [e_c/m − (d_c/2m)²], computed EXACTLY in integers
    as q_num_c = 4·m·e_c − d_c² with Q·4m² = Σ q_num (one final permille
    division). Per community (= nation): member count, intra-community
    edge count, degree sum, exact contribution numerator, plus the
    global q_permille repeated per row. Attribute partitions (nation,
    domain, source) are the practical modularity question at corpus
    scale — 'do purchases/links concentrate within the attribute?' —
    and the same relational shape scores ANY candidate partition, so a
    label-prop or CC output can be plugged in as `comm` unchanged.

    Scale: one distinct-edge agg (the shuffle the whole graph family
    shares), two broadcast-ish dimension joins for endpoint labels, a
    degree agg, and ≤|communities| result rows; the final window runs
    over those ≤25 rows. No iteration, no all-pairs anything."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(10000000) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    comm = (
        cust.select(
            F.col("c_custkey").alias("node"),
            F.col("c_nationkey").cast("long").alias("com"),
        )
        .unionAll(
            supp.select(
                (F.lit(10000000) + F.col("s_suppkey")).alias("node"),
                F.col("s_nationkey").cast("long").alias("com"),
            )
        )
    )
    deg = (
        base.select(F.col("a").alias("node"))
        .unionAll(base.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # the degree join restricts to touched nodes, so no separate
    # membership semijoin is needed
    dsum = (
        comm.join(deg, "node")
        .groupBy("com")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("d_sum"),
        )
    )
    na = comm.select(F.col("node").alias("a"), F.col("com").alias("ca"))
    nb = comm.select(F.col("node").alias("b"), F.col("com").alias("cb"))
    ein = (
        base.join(na, "a")
        .join(nb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("com"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    m1 = base.agg(F.count(F.lit(1)).cast("long").alias("m"))
    rows = (
        dsum.join(ein, "com", "left")
        .crossJoin(F.broadcast(m1))
        .select(
            "com",
            "n_nodes",
            F.coalesce("e_in", F.lit(0).cast("long")).alias("e_in"),
            "d_sum",
            (
                4 * F.col("m") * F.coalesce("e_in", F.lit(0).cast("long"))
                - F.col("d_sum") * F.col("d_sum")
            ).alias("q_num"),
            "m",
        )
    )
    return rows.select(
        "com",
        "n_nodes",
        "e_in",
        "d_sum",
        "q_num",
        F.expr(
            "(1000 * sum(q_num) OVER ()) DIV (4 * m * m)"
        ).alias("q_permille"),
    )
