"""'tpch'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DEC_PRICE,
    DEC_QTY,
    DEC_SMALL,
    DataFrame,
    F,
    SparkSession,
    W,
    _REV_SQL,
    _dsum,
    _revenue,
    load_table,
    register,
)


# --------------------------------------------------------------------------
# Relational surface — aggregations
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM({_REV_SQL} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
           AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-06-30'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → partial agg → final agg on 2 low-cardinality
    keys. At 100 TB: filter + projection push to parquet, map-side partial
    aggregation reduces the shuffle to (#groups × #partitions) rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = _revenue()
    charge = rev * (one + F.col("l_tax").cast(DEC_SMALL))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), DEC_QTY).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.sum(rev).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (_dsum(F.col("l_quantity"), DEC_QTY) / n.cast("double")).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice")) / n.cast("double")).alias("avg_price"),
        (_dsum(F.col("l_discount"), DEC_SMALL) / n.cast("double")).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k. Join
    strategies are left to the cost model: at bench scale every side fits
    the broadcast threshold; at 100 TB orders/customer grow past it and
    the plan degrades to shuffle joins on the keys (forcing broadcast()
    here would OOM instead). Top-10 is a TakeOrdered, no global sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    # No forced broadcast: customer/orders GROW with scale. Locally the
    # planner broadcasts them from file-size stats anyway; at 100 TB it
    # degrades to a shuffle join instead of OOMing the executors.
    joined = li.join(
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. Bounded dims (nation/region) carry
    broadcast hints; supplier/customer scale with SF so their strategy is
    cost-model-chosen — broadcast at bench scale (lineitem never shuffles
    for the dim joins), shuffle join at 100 TB. Catalyst reorders the dim
    joins; AQE re-plans from runtime sizes."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # broadcast() only on the BOUNDED dims (nation/region never grow);
    # supplier/customer scale with SF, so their join strategy is left to
    # the cost model + AQE — broadcast at this scale, shuffle at 100 TB.
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )


# --------------------------------------------------------------------------
# Relational surface — TPC-H battery (adapted to the synthetic schema)
# --------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join with an
    extra non-equi residual (l_shipdate > o_orderdate). The semi join
    shuffles on the orderkey only; the 5-group agg is map-side combined.
    At 100 TB the date filter prunes orders partitions before the join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sel = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-and-aggregate query. Every predicate
    and both columns push into the parquet scan (PushedFilters +
    ReadSchema of 4 columns); the global sum is a two-stage partial/final
    with a 1-row shuffle. This is the query that proves pushdown works."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC_PRICE)
            * F.col("l_discount").cast(DEC_SMALL)
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two nation aliases with a disjunctive cross-dim
    predicate. supplier/customer/nation all broadcast; lineitem⋈orders is
    the single shuffle. The (n1,n2) disjunction evaluates post-broadcast,
    so the fact table is scanned once."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.sum(_revenue()).cast("double").alias("revenue"))


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈fact with selective date window, then top-20
    customers by returned revenue. orders is filtered to a quarter before
    the join (partition pruning at scale); only the bounded nation dim is
    hint-broadcast; the top-k is TakeOrdered (no global sort)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_lines",
    """
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counting (CASE inside agg).
    Only (o_orderkey, o_orderpriority) survive the orders scan — column
    pruning keeps the shuffle narrow; the conditional counts fold into
    one map-side combine."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT (CAST(100 AS DOUBLE)
            * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END)
                   AS DOUBLE))
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + ratio of two conditional
    sums in a single pass (no self-join). Both sums are decimal-exact;
    the one IEEE division happens last, identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(((F.lit(100).cast("double") * promo) / total).alias("promo_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH brand_lines AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#12'
    ), lims AS (
      SELECT l_partkey AS lim_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS qty_lim
      FROM brand_lines GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(7 AS DOUBLE) AS avg_yearly
    FROM brand_lines JOIN lims ON l_partkey = lim_partkey
    WHERE l_quantity < qty_lim
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average, decorrelated as a
    window avg over the brand-restricted lines — ONE shuffle on
    l_partkey instead of the agg+re-join double scan. Restricting to the
    brand first is semantics-preserving (the avg is per partkey, and
    non-brand partkeys never reach the outer filter)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    w = W.partitionBy("l_partkey")
    qty_lim = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast(DEC_QTY)).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        lines.withColumn("qty_lim", qty_lim)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            (
                _dsum(F.col("l_extendedprice")) / F.lit(7).cast("double")
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
             o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING subquery as a semi join. The per-order
    quantity agg and the main join share the l_orderkey partitioning, so
    AQE reuses the exchange; qualifying orderkeys (~0.1%) broadcast back
    against lineitem. Top-20 is TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC_QTY)).alias("qsum"))
        .filter(F.col("qsum") > 300)
        .select("l_orderkey")
    )
    # `big` stays force-broadcast: it is the ~0.1% of orderkeys passing
    # the HAVING, ~MBs even at 100 TB. orders/customer scale linearly, so
    # their joins are left to the planner.
    joined = (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_orderkey")),
                F.col("l_orderkey") == F.col("big_orderkey"), "inner")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
    )
    return (
        joined.groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(_dsum(F.col("l_quantity"), DEC_QTY).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1.0 AND 15.0)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10.0 AND 30.0)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 25 AND 50
           AND l_quantity BETWEEN 25.0 AND 50.0)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicate over a
    broadcast join. Catalyst extracts the common l_quantity/p_brand
    bounds where it can; the OR evaluates as the join residual in one
    pass — no UNION of three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def arm(brand: str, lo: int, hi: int, qlo: float, qhi: float) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo, hi)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        arm("Brand#3", 1, 15, 1.0, 15.0)
        | arm("Brand#7", 10, 30, 10.0, 30.0)
        | arm("Brand#15", 25, 50, 25.0, 50.0)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q22_idle_balances",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (the global average —
    a 1-row broadcast) + NOT EXISTS (left anti join on recent orders).
    The anti join's build side is filtered to one year of orderkeys; the
    final agg is 5 groups."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H completion: the 9 query shapes missing from the classic battery,
# adapted to the reduced driver schema (no partsupp / commitdate — each
# keeps its defining plan shape with available columns)
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem GROUP BY 1, 2),
    eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier, nation, region
      WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'),
    esupply AS (
      SELECT pk, sk, cost, s_name, n_name
      FROM supply JOIN eu ON sk = s_suppkey),
    best AS (SELECT pk, MIN(cost) AS min_cost FROM esupply GROUP BY pk)
    SELECT p_partkey, p_name, sk AS s_suppkey, s_name, n_name,
           CAST(cost AS DOUBLE) AS cost
    FROM esupply, best, part
    WHERE esupply.pk = best.pk AND esupply.cost = best.min_cost
      AND p_partkey = esupply.pk AND p_size <= 15
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN subquery (cheapest regional
    supplier per part), decorrelated the classic way — aggregate once,
    equi-join back on (part, min_cost). Supply relation is derived from
    lineitem (no partsupp in this schema); cost is an exact decimal so
    the min-equality join is bit-stable. supplier⋈nation⋈region
    broadcasts; the supply aggregation is the one fact shuffle, and the
    join-back reuses its partitioning. Ties at min cost emit all
    suppliers, as in the original."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice").cast(DEC_PRICE)).alias("cost"))
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    esupply = supply.join(
        F.broadcast(eu), F.col("sk") == F.col("s_suppkey")
    ).select("pk", "sk", "cost", "s_name", "n_name")
    best = esupply.groupBy("pk").agg(F.min("cost").alias("min_cost"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        esupply.join(best, "pk")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("pk"))
        .select(
            "p_partkey",
            "p_name",
            F.col("sk").alias("s_suppkey"),
            "s_name",
            "n_name",
            F.col("cost").cast("double").alias("cost"),
        )
    )


@register(
    "q8_market_share",
    f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_5' THEN volume END),
                         0) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a conditional-numerator /
    total-denominator ratio over a 5-way star join with TWO nation
    aliases (customer's nation scopes the region, supplier's nation is
    the share dimension). All dims broadcast; lineitem⋈orders is the one
    shuffle. Both sums are decimal-exact; the share is one IEEE division
    at the end, so the ratio hash-compares across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.coalesce(
            F.sum(F.when(F.col("nation") == "NATION_5", _revenue())),
            F.lit(0).cast("decimal(25,4)"),
        ).alias("nat_vol"),
        F.sum(_revenue()).alias("tot_vol"),
    )
    return agg.select(
        "o_year",
        (
            F.col("nat_vol").cast("double") / F.col("tot_vol").cast("double")
        ).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL}
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year —
    revenue minus cost over a part-name LIKE filter (cost comes from
    part.p_retailprice; no partsupp in this schema). The LIKE prunes
    parts BEFORE the broadcast, so the fact scan joins against a small
    dim; lineitem⋈orders is the one shuffle. Profit is a pure decimal
    expression — exact partial aggregation, one double cast at the
    end."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = _revenue() - F.col("p_retailprice").cast(DEC_PRICE) * F.col(
        "l_quantity"
    ).cast(DEC_PRICE)
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_value",
    """
    WITH sup_nation AS (
      SELECT s_suppkey FROM supplier, nation
      WHERE s_nationkey = n_nationkey
        AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')),
    val AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS v
      FROM lineitem JOIN sup_nation ON l_suppkey = s_suppkey
      GROUP BY 1)
    SELECT partkey, CAST(v AS DOUBLE) AS total_value
    FROM val WHERE v * 1000 > (SELECT SUM(v) FROM val)
    """,
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a HAVING against a fraction
    of the GLOBAL total — the aggregate-vs-scalar-subquery pattern. The
    threshold comparison is spelled `v·1000 > Σv` so it stays in exact
    decimal arithmetic (no 0.001 float multiply to diverge on). One
    shuffle builds `val`; the 1-row total broadcasts back over it
    (Catalyst reuses the exchange for both consumers)."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(sup.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC_PRICE)
                * F.col("l_quantity").cast(DEC_PRICE)
            ).alias("v")
        )
    )
    total = val.agg(F.sum("v").alias("tot"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 1000 > F.col("tot"))
        .select("partkey", F.col("v").cast("double").alias("total_value"))
    )


@register(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the two-level aggregation — orders per customer
    (LEFT join keeps zero-order customers, with the filter INSIDE the
    join condition so they survive), then the distribution of those
    counts. First groupBy shuffles on custkey; the second is a tiny
    re-agg on the count value. The join-condition filter (not a WHERE)
    is the defining subtlety of this query."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the view-plus-scalar-max pattern — quarterly
    revenue per supplier, then the supplier(s) achieving the global max.
    Revenue is decimal-exact, so the `= MAX(...)` equality is bit-stable
    and ties surface all winners (the original's semantics). One fact
    shuffle; the 1-row max broadcasts back; supplier broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, with an excluded-supplier NOT IN (here: negative balance,
    standing in for the complaints LIKE — the anti-join is the shape).
    The anti side is a broadcast; COUNT(DISTINCT) expands to the
    standard two-phase distinct-then-count aggregation on the
    (brand, type, size, suppkey) grain."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    """
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      WITH shipped AS (
        SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
      SELECT l_suppkey FROM shipped
      WHERE qty * (SELECT COUNT(*) FROM shipped)
            > (SELECT SUM(qty) FROM shipped))
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested-IN chain — suppliers who moved an
    above-average quantity of name-matched parts in a year. Inner IN
    (parts by LIKE) broadcasts into the fact filter; the grouped
    per-supplier quantities face a threshold derived from the WHOLE
    group (the stand-in for the original's correlated availqty bound,
    partsupp being absent) — spelled `qty·n > Σqty`, a cross-multiplied
    exact-decimal comparison with no division; the outer IN is a
    left-semi join. Scale-invariant by construction: roughly the
    above-mean half qualifies at every SF."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC_PRICE)).alias("qty"))
    )
    stats = shipped.agg(
        F.count(F.lit(1)).alias("n_sup"), F.sum("qty").alias("tot_qty")
    )
    qualifying = shipped.crossJoin(F.broadcast(stats)).filter(
        F.col("qty") * F.col("n_sup") > F.col("tot_qty")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(qualifying),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT EXISTS double correlation on
    the same fact table — the sole at-fault supplier in multi-supplier
    orders (returnflag stands in for the missing commit/receipt dates;
    the two correlated semi/anti joins with a non-equi residual are the
    preserved shape). Plan: fact⋈orders shuffle on orderkey, then a
    LEFT SEMI and a LEFT ANTI against lineitem re-scans partitioned the
    same way — three hash joins on one key, no cartesian anywhere."""
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    base = l1.join(
        orders.select("o_orderkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    with_other = base.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    sole_fault = with_other.join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole_fault.join(
            F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
