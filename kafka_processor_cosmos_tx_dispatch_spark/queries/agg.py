"""'agg'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DEC_QTY,
    DataFrame,
    F,
    SparkSession,
    _dsum,
    load_table,
    pd,
    register,
)


@register(
    "q_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals in one pass (Spark expands grouping
    sets map-side; still a single shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_quantity"), DEC_QTY).alias("sum_qty"),
    )


@register(
    "q_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "orders")
    return li.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("o_totalprice")).alias("sum_price"),
    )


@register(
    "q_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (superset of rollup/cube): Spark expands the
    sets with a single Expand node feeding one hash aggregate — one scan,
    one shuffle, regardless of how many sets are requested."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                 AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS median,
           quantile_cont(l_quantity, 0.75) AS q75,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based within group). p in {.25,.5,.75} are
    exact binary fractions and l_quantity is integer-valued, so the
    linear interpolation (1-f)*lo + f*hi is bit-identical across engines.
    (approx_percentile/HLL variants are engine-specific and not
    oracle-hashed — exercised in tests instead.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q_distinct_counts",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expand + two-phase agg in Spark). The approximate
    path (HLL) is exercised separately — approx values are engine-specific
    so they aren't oracle-hashed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q_pivot_status",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "O",
      CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_dsum(F.col("l_quantity"), DEC_QTY))
    )


@register(
    "q_udaf_grouped_cents",
    """
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): Arrow hands each
    group's column to Python as a pandas Series; integer-cents math keeps
    the result order-independent and oracle-exact. The physical plan is
    the same two-phase hash-partition shape as a native agg, with the
    aggregation body in vectorized Python."""
    from pyspark.sql.functions import pandas_udf

    # type-hint style (Series -> scalar == grouped agg); the hints are
    # strings under `from __future__ import annotations`, so `pd` must be
    # resolvable in THIS module's globals for get_type_hints()
    @pandas_udf("long")
    def sum_cents(v: pd.Series) -> int:
        return int(v.mul(100).round().astype("int64").sum())

    @pandas_udf("long")
    def count_rows(v: pd.Series) -> int:
        return len(v)

    # pandas grouped-agg UDFs can't mix with JVM aggregates in one agg()
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        sum_cents("value").alias("total_cents"),
        count_rows("value").alias("n"),
    )


# --------------------------------------------------------------------------
# round-6 widening: SQL-surface constructs (LATERAL, FILTER-clause aggs,
# rank distributions), content checksums, label propagation, cogrouped
# custom merge, partition-pruned source layout
# --------------------------------------------------------------------------


@register(
    "q_agg_filter_where",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE)
             AS open_total
    FROM orders GROUP BY 1
    """,
)
def q_agg_filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates (conditional aggregation without a
    self-join or CASE pyramid). Spark compiles FILTER (WHERE ...) to the
    same partial-aggregate pipeline as a plain agg, so it stays one
    map-side-combinable hash aggregate — the idiom replaces the
    anti-pattern of N filtered scans unioned together.

    Scale: single scan of orders, one shuffle on the group key."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_filter"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE)
                 AS open_total
        FROM v_orders_filter GROUP BY o_orderpriority
        """
    )
