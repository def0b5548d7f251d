"""The named-query registry: every operator surface of the engine, each as
a (PySpark plan, DuckDB oracle SQL) pair for the correctness harness.

Numeric determinism contract (so order-insensitive value hashes match the
oracle bit-for-bit):

- Sums/averages over double columns go through DECIMAL casts sized to the
  data (inputs are generated with 2 decimal places), making the aggregation
  EXACT and order-independent in both engines; the final value is cast to
  DOUBLE once. Both engines round-trip the same IEEE754 double.
- Averages are computed as CAST(sum AS DOUBLE)/CAST(count AS DOUBLE) — one
  IEEE division in both engines.
- No transcendental functions in hashed outputs (libm vs JVM last-ULP).
- Every LIMIT/top-k has a unique tiebreaker column.
- Timestamps are cast to DATE in outputs (Spark session is UTC).
- Integer-typed function results are cast to the same width on both sides.

Scale notes are in each query's docstring: what shuffles, what broadcasts,
and why the plan survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .operators import dispatch as dsp
from .rules import DispatchRule
from .sources.tables import load_table

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

DEC_PRICE = "decimal(12,2)"  # extendedprice/totalprice ≤ ~600k, 2dp
DEC_SMALL = "decimal(4,2)"  # discount/tax/quantity-scale fractions
DEC_QTY = "decimal(12,2)"


def _dsum(col: F.Column, cast: str = DEC_PRICE) -> F.Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(col.cast(cast)).cast("double")


def _revenue() -> F.Column:
    """l_extendedprice * (1 - l_discount), decimal-exact."""
    return F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(DEC_SMALL)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Dispatch engine queries (the reference's core semantics, on `events`)
# --------------------------------------------------------------------------

EVENT_RULES = [
    DispatchRule("purchases", "topic-purchases", "$[?(@.event_type == 'purchase')]"),
    DispatchRule("high-k", "topic-high-k", "$.props[?(@.k > 90)]"),
    DispatchRule(
        "big-errors", "topic-errors", "$[?(@.event_type == 'error' && @.value >= 100)]"
    ),
    DispatchRule("never-match", "topic-never", "$.missing"),
]


def _events_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a typed record view the JsonPath rules compile against
    natively (zero Python in the hot path — the whole rule bank is one
    codegen'd projection).

    The single JSON field is extracted with get_json_object, which
    measured 3.4× faster than from_json on this shape (5M rows: 1.6s vs
    5.4s end-to-end dispatch) — from_json pays a full parser+struct
    conversion per record. Rule of thumb: ≤2 fields → get_json_object
    per field; wide/nested JSON → one from_json."""
    ev = load_table(spark, sf_dir, "events")
    rec = F.struct(
        F.col("event_type"),
        F.col("value"),
        F.struct(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        ).alias("props"),
    )
    return ev.withColumn("rec", rec)


@register(
    "dispatch_route",
    """
    WITH ev AS (
      SELECT event_id, event_type, value,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
    ), m AS (
      SELECT event_id, 0 AS rule_idx, 'purchases' AS rule_name,
             'topic-purchases' AS topic FROM ev WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, 1, 'high-k', 'topic-high-k' FROM ev WHERE k > 90
      UNION ALL
      SELECT event_id, 2, 'big-errors', 'topic-errors' FROM ev
      WHERE event_type = 'error' AND value >= 100
    )
    SELECT event_id, rule_idx, rule_name, topic FROM m
    UNION ALL
    SELECT event_id, -2 AS rule_idx, CAST(NULL AS VARCHAR) AS rule_name,
           'dlq' AS topic
    FROM ev WHERE event_id NOT IN (SELECT event_id FROM m)
    """,
)
def dispatch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole topology as one narrow, shuffle-free stage:
    evaluate all rules once per record, multicast per match, DLQ fallback
    (TopologyProducer.kt:97-231). Scales linearly — no shuffle, no state,
    rules are literals folded into the plan."""
    ev = _events_record(spark, sf_dir)
    out = dsp.dispatch(ev, EVENT_RULES, struct_col="rec")
    return out.select("event_id", "rule_idx", "rule_name", "topic")


@register(
    "dispatch_dlq_envelope",
    """
    WITH ev AS (
      SELECT event_id, event_type, value, props,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_id, props AS "txJson", to_base64(encode(props)) AS "txBytes",
           CAST(NULL AS VARCHAR) AS message
    FROM ev
    WHERE NOT (event_type = 'purchase') AND NOT (k > 90)
      AND NOT (event_type = 'error' AND value >= 100)
    """,
)
def dispatch_dlq_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ envelope fields for unmatched records (exact Jackson-shape
    envelope string is pinned by tests/test_dispatch.py; here the fields
    are checked against the oracle)."""
    ev = _events_record(spark, sf_dir)
    out = dsp.dispatch(ev, EVENT_RULES, struct_col="rec")
    dlq = out.filter(F.col("topic") == dsp.DEFAULT_DLQ_TOPIC)
    return dlq.select(
        "event_id",
        F.col("props").alias("txJson"),
        F.base64(F.encode(F.col("props"), "UTF-8")).alias("txBytes"),
        F.lit(None).cast("string").alias("message"),
    )


# Rule bank that FORCES the tier-3 Arrow evaluator: evaluated against a
# JSON-string view (no typed struct), so the regex and numeric-band
# filters are outside the tier-2 definite-path subset and fall to the
# fused Python evaluator, while the two definite paths stay tier-2
# native — a mixed bank through with_matches' per-rule tier routing.
TIER3_RULES = [
    DispatchRule(
        "error-or-signup", "topic-es", "$[?(@.eventType =~ /error|signup/)]"
    ),
    DispatchRule("mid-band-k", "topic-mid-k", "$[?(@.k >= 50 && @.k < 80)]"),
    DispatchRule("big-value", "topic-big", "$.bigValue"),
    DispatchRule("never-match", "topic-never", "$.missing"),
]


@register(
    "dispatch_route_tier3",
    """
    WITH ev AS (
      SELECT event_id, event_type, value,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
    ), m AS (
      SELECT event_id, 0 AS rule_idx, 'error-or-signup' AS rule_name,
             'topic-es' AS topic FROM ev
      WHERE regexp_matches(event_type, '^(?:error|signup)$')
      UNION ALL
      SELECT event_id, 1, 'mid-band-k', 'topic-mid-k' FROM ev
      WHERE k >= 50 AND k < 80
      UNION ALL
      SELECT event_id, 2, 'big-value', 'topic-big' FROM ev
      WHERE value >= 100
    )
    SELECT event_id, rule_idx, rule_name, topic FROM m
    UNION ALL
    SELECT event_id, -2 AS rule_idx, CAST(NULL AS VARCHAR) AS rule_name,
           'dlq' AS topic
    FROM ev WHERE event_id NOT IN (SELECT event_id FROM m)
    """,
)
def dispatch_route_tier3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dispatch topology with a rule bank that exercises the TIER-3
    fallback in the driver-proven path (r10 verdict #6: every prior
    driver-green dispatch row compiled 100% tier-1/2 native). The record
    view here is a JSON STRING (to_json of the event — the reference's
    own evaluation substrate, TopologyProducer.kt:213), so the regex
    rule (`=~`, Jayway full-match semantics) and the &&-band filter are
    uncompilable on the definite-path tier-2 and route through the ONE
    fused Arrow UDF (with_matches: single json.loads per record for the
    whole bank), while `$.bigValue` / `$.missing` stay tier-2
    get_json_object natives — per-rule tier mixing in one bank. The
    sometimes-absent `bigValue` key (to_json omits nulls) makes the
    definite-path rule a real filter rather than an always-match.

    Scale: still narrow and shuffle-free like dispatch_route; the Python
    stage is one Arrow hop costing parse + 2 cheap walks per record —
    the measured fused-bank design (SURVEY §8 r7 deltas). The oracle
    re-derives every rule relationally; regex full-match anchoring
    (^(?:...)$) mirrors the evaluator's \\A(?:...)\\Z."""
    ev = load_table(spark, sf_dir, "events")
    view = F.to_json(
        F.struct(
            F.col("event_type").alias("eventType"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.when(F.col("value") >= 100, F.col("value")).alias("bigValue"),
        )
    )
    out = dsp.dispatch(ev.withColumn("tx_json", view), TIER3_RULES, json_col="tx_json")
    return out.select("event_id", "rule_idx", "rule_name", "topic")


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
    "q_string_agg",
    """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (listagg): collect_list is order-nondeterministic
    in a distributed agg, so the deterministic spelling is sort_array
    before array_join — matching the oracle's ORDER BY inside
    string_agg."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "q_scalar_map",
    """
    SELECT event_id,
           event_type AS type_from_map,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_from_map,
           2 AS n_keys,
           concat('k,type') AS keys_sorted
    FROM events
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed scalar functions: build a map column, then element_at /
    map_keys / size. The oracle computes the same scalars straight from
    the source columns (maps themselves aren't hash-comparable across
    engines; their *lookups* are)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("k"), k.cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "k").cast("int").alias("k_from_map"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
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


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q_join_left_outer_count",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS order_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left_outer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (left outer + count preserving zero-order rows)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@register(
    "q_join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no URGENT-priority order. The
    priority filter (vs the bare "no orders at all" form) exists because
    the test data gives nearly every customer an order — the unfiltered
    anti-join returned 0 rows at sf0.001 AND sf0.01, making its oracle
    check an empty-vs-empty match (r8 verdict finding class #1/#7). The
    filtered form returns 18/203/1986 rows at sf0.001/0.01/0.1, so the
    anti-join path is actually value-checked. The filter lands on the
    build side BEFORE the join (pushed to the orders scan), shrinking the
    anti-join's right side ~5× — the shape you want at 100 TB too."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_full_outer",
    """
    WITH eu AS (SELECT DISTINCT user_id FROM events)
    SELECT COALESCE(eu.user_id, c.c_custkey) AS id,
           (eu.user_id IS NOT NULL) AS has_events,
           (c.c_custkey IS NOT NULL) AS has_account
    FROM eu FULL OUTER JOIN customer c ON eu.user_id = c.c_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    eu = load_table(spark, sf_dir, "events").select("user_id").distinct()
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    j = eu.join(cust, F.col("user_id") == F.col("c_custkey"), "full_outer")
    return j.select(
        F.coalesce("user_id", "c_custkey").alias("id"),
        F.col("user_id").isNotNull().alias("has_events"),
        F.col("c_custkey").isNotNull().alias("has_account"),
    )


@register(
    "q_join_range_nonequi",
    """
    WITH buckets AS (
      SELECT 0 AS bucket_id, 0.0 AS lo, 50.0 AS hi UNION ALL
      SELECT 1, 50.0, 100.0 UNION ALL
      SELECT 2, 100.0, 150.0 UNION ALL
      SELECT 3, 150.0, 1e9
    )
    SELECT b.bucket_id, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bucket_id
    """,
)
def q_join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: the small side is broadcast, so the non-equi
    condition is evaluated stream-side with no shuffle — the scalable plan
    for banding/bucketing joins (a nested-loop against a broadcast list)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e9)],
        "bucket_id int, lo double, hi double",
    )
    j = ev.join(
        F.broadcast(buckets),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return j.groupBy("bucket_id").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "q_asof_join_events",
    """
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id AS click_id, value AS click_value, ts
      FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, p.user_id, c.click_id, c.click_value,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it (operators/asof.py — union + window, one shuffle, no
    non-equi join). Oracle is DuckDB's native ASOF LEFT JOIN."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    j = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        right_value_cols=["click_id", "click_value", "click_ts"],
        tiebreak_col="click_id",
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_value").alias("click_value"),
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias("gap_us"),
    )


@register(
    "q_asof_join_forward",
    """
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id AS click_id, value AS click_value, ts
      FROM events WHERE event_type = 'click'),
    m AS (
      SELECT p.purchase_id, p.user_id, c.click_id, c.click_value,
             p.ts AS pts, c.ts AS cts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts),
    g AS (SELECT *, epoch_us(cts) - epoch_us(pts) AS gap FROM m)
    SELECT purchase_id, user_id,
           CASE WHEN gap <= 3600000000 THEN click_id END AS click_id,
           CASE WHEN gap <= 3600000000 THEN click_value END AS click_value,
           CASE WHEN gap <= 3600000000 THEN gap END AS gap_us
    FROM g
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each purchase matched to the
    user's NEXT click, nulled when it is more than an hour later (pandas
    merge_asof direction='forward', tolerance semantics — the
    attribution-window shape). Same union + one-shuffle window plan as
    the backward operator with the time sort reversed; the tolerance is
    a post-predicate on the matched struct, never a join condition, so
    the plan is unchanged. Oracle: DuckDB ASOF with the inequality
    flipped plus the same CASE filter."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    j = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        right_value_cols=["click_id", "click_value", "click_ts"],
        tiebreak_col="click_id",
        direction="forward",
        tolerance_us=3_600_000_000,
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_value").alias("click_value"),
        (F.unix_micros("asof_click_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


@register(
    "q_asof_join_nearest",
    """
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id AS click_id, value AS click_value, ts
      FROM events WHERE event_type = 'click'),
    b AS (
      SELECT p.purchase_id, p.user_id, p.ts AS pts,
             c.click_id AS b_id, c.click_value AS b_val, c.ts AS b_ts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts),
    f AS (
      SELECT p.purchase_id,
             c.click_id AS f_id, c.click_value AS f_val, c.ts AS f_ts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts),
    j AS (SELECT b.*, f.f_id, f.f_val, f.f_ts
          FROM b JOIN f USING (purchase_id)),
    ch AS (
      SELECT purchase_id, user_id, pts,
             CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL AND
                       epoch_us(pts) - epoch_us(b_ts)
                         > epoch_us(f_ts) - epoch_us(pts))
                  THEN f_id ELSE b_id END AS click_id,
             CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL AND
                       epoch_us(pts) - epoch_us(b_ts)
                         > epoch_us(f_ts) - epoch_us(pts))
                  THEN f_val ELSE b_val END AS click_value,
             CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL AND
                       epoch_us(pts) - epoch_us(b_ts)
                         > epoch_us(f_ts) - epoch_us(pts))
                  THEN f_ts ELSE b_ts END AS cts
      FROM j)
    SELECT purchase_id, user_id, click_id, click_value,
           epoch_us(cts) - epoch_us(pts) AS gap_us
    FROM ch
    """,
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest', ties
    toward the earlier row): each purchase matched to the user's click
    with the smallest |time gap| on either side — the sensor-alignment
    shape (match the closest reading, not the last one). STILL one
    shuffle and one sort: both candidate arms are frames over the same
    (user, ts ASC) window — backward = last non-null preceding, forward
    = first non-null following — so the second arm adds a Window node,
    not an Exchange (operators/asof.py:_asof_nearest). The oracle takes
    both DuckDB ASOF directions and re-derives the distance compare
    relationally. gap_us is SIGNED (negative = matched click precedes
    the purchase)."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    j = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        right_value_cols=["click_id", "click_value", "click_ts"],
        tiebreak_col="click_id",
        direction="nearest",
    )
    return j.select(
        "purchase_id",
        "user_id",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_value").alias("click_value"),
        (F.unix_micros("asof_click_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


@register(
    "q_join_right_outer",
    """
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every nation survives even with zero suppliers
    (COUNT(col) skips the null-padded rows; SUM of none is NULL). Spark
    plans it as the mirrored left-outer with the small side broadcast."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "right_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            _dsum(F.col("s_acctbal")).alias("total_bal"),
        )
    )


@register(
    "q_join_cross",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (all region pairs). Tiny×tiny only —
    Spark requires the explicit crossJoin call precisely so an accidental
    unconstrained product can't sneak into a 100 TB plan."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return r1.crossJoin(r2)


@register(
    "q_skew_salted_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join, the manual fallback when AQE's skew
    split can't help (e.g. one hot key inside a single partition of a
    stream-static join). Fact rows get a deterministic salt in [0,S);
    the dim side is exploded ×S so every (key, salt) pair finds its
    match; the hot key's rows now spread over S reducers. Result is
    bit-identical to the plain join (oracle runs the unsalted SQL).
    shuffle_hash hint keeps Spark from broadcasting the (locally tiny)
    dim so the salted shuffle path actually executes."""
    S = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(S)).cast("int")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)).cast("array<int>")))
        .hint("shuffle_hash")
    )
    return (
        ev.join(
            cust,
            (F.col("user_id") == F.col("c_custkey")) & (ev["salt"] == cust["salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


_TIERS = [  # (name, lo, hi) — deliberately unaligned with the 25-bucket grid
    ("bronze", 0.0, 40.0),
    ("silver", 40.0, 100.0),
    ("gold", 100.0, 150.0),
    ("platinum", 150.0, 200.0),
]
_TIER_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _TIERS)


@register(
    "q_join_banded_range",
    f"""
    WITH tiers(tier, lo, hi) AS (VALUES {_TIER_SQL})
    SELECT t.tier, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS tier_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def q_join_banded_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded theta join — the SCALE formulation of a big-big non-equi
    range join: bucketize the join value on a fixed grid, explode each
    range into the buckets it overlaps, equi-join on the bucket id, then
    apply the exact range predicate as a residual filter. The non-equi
    condition never reaches the join operator (no broadcast-nested-loop,
    no cartesian); work is O(rows x avg buckets-per-range) through a
    hash join. Here the dim is broadcastable anyway — the point is the
    pattern, pinned against the oracle's plain non-equi join."""
    ev = load_table(spark, sf_dir, "events")
    width = 25.0
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    banded = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("long"),
                F.floor((F.col("hi") - 0.001) / width).cast("long"),
            )
        ).alias("bucket"),
    )
    ev_b = ev.select(
        "value", F.floor(F.col("value") / width).cast("long").alias("bucket")
    )
    joined = ev_b.join(F.broadcast(banded), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("tier_value"),
    )


@register(
    "q_window_time_range",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_2h,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW
           ) AS n_2h
    FROM events
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (the trailing-window time-series op:
    'sum over the last 2 hours per key'). RANGE bounds are defined on the
    ORDER BY value itself, so equal-ts rows share one frame and no row
    tiebreak is needed — unlike ROWS frames, the result is deterministic
    without a unique ordering column. Decimal sums keep every frame
    exact. One shuffle on the key; frames evaluated with a sliding
    add/remove pass per partition."""
    ev = load_table(spark, sf_dir, "events")
    two_hours = 2 * 3600 * 1_000_000  # RANGE in unix_micros space
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-two_hours, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC_PRICE)).over(w).cast("double").alias("sum_2h"),
        F.count(F.lit(1)).over(w).alias("n_2h"),
    )


@register(
    "q_window_first_last",
    """
    WITH v AS (
      SELECT event_id, user_id, ts,
             CASE WHEN value < 5 THEN NULL ELSE value END AS v
      FROM events)
    SELECT event_id, user_id,
           first_value(v IGNORE NULLS) OVER w AS first_v,
           last_value(v IGNORE NULLS) OVER w AS last_v,
           nth_value(v, 2 IGNORE NULLS) OVER w AS second_v
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value window functions with IGNORE NULLS over a
    full-partition frame (a sparse column: small values nulled). The
    deterministic ordering includes the unique event_id tiebreak; the
    carried doubles are untouched originals, so values hash-compare.
    One shuffle on the partition key, full-frame functions evaluated in
    a single pass per partition."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return v.select(
        "event_id",
        "user_id",
        F.first("v", ignorenulls=True).over(w).alias("first_v"),
        F.last("v", ignorenulls=True).over(w).alias("last_v"),
        F.nth_value("v", 2, ignoreNulls=True).over(w).alias("second_v"),
    )


@register(
    "q_histogram_equiheight",
    """
    WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    c AS (SELECT quantile_cont(cents, 0.125) AS c1, quantile_cont(cents, 0.25) AS c2,
                 quantile_cont(cents, 0.375) AS c3, quantile_cont(cents, 0.5) AS c4,
                 quantile_cont(cents, 0.625) AS c5, quantile_cont(cents, 0.75) AS c6,
                 quantile_cont(cents, 0.875) AS c7
          FROM v)
    SELECT 1 + CAST(cents > c1 AS INT) + CAST(cents > c2 AS INT)
             + CAST(cents > c3 AS INT) + CAST(cents > c4 AS INT)
             + CAST(cents > c5 AS INT) + CAST(cents > c6 AS INT)
             + CAST(cents > c7 AS INT) AS bucket,
           COUNT(*) AS n, MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM v CROSS JOIN c GROUP BY 1
    """,
)
def q_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height (quantile-bucketed) histogram WITHOUT the naive
    global-ntile formulation: ntile needs a single-partition window (the
    whole table through one task — the canonical scale killer). Instead:
    octile cut points in one aggregate pass (binary-fraction percentiles
    over integer cents, bit-stable per the determinism contract), then a
    broadcast of the 1-row cut table and a JVM-side comparison chain
    assigns buckets — two narrow passes, no global sort at any size.
    Boundary ties go left in both engines (strict >). The cents
    conversion must round EXPLICITLY: a bare double→BIGINT cast rounds
    in DuckDB but truncates in Spark, so 35.61*100 = 3560.999… lands on
    different integers and every downstream cut shifts."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.round(F.col("value") * 100).cast("long").alias("cents"))
    cuts = v.agg(
        *[
            F.expr(f"percentile(cents, {k}/8.0)").alias(f"c{k}")
            for k in range(1, 8)
        ]
    )
    b = v.crossJoin(F.broadcast(cuts)).select(
        "cents",
        sum(
            [F.lit(1)]
            + [
                (F.col("cents") > F.col(f"c{k}")).cast("int")
                for k in range(1, 8)
            ],
            start=F.lit(0),
        ).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


@register(
    "q_join_null_safe",
    """
    WITH a AS (SELECT NULLIF(c_nationkey % 5, 0) AS k FROM customer),
    b AS (SELECT NULLIF(s_nationkey % 5, 0) AS k FROM supplier)
    SELECT COALESCE(CAST(a.k AS VARCHAR), 'null') AS k, COUNT(*) AS n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY 1
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): null keys
    match EACH OTHER instead of vanishing — the semantics SQL equality
    silently drops. Catalyst treats EqualNullSafe as a hashable join
    key, so this stays a plain hash/sort-merge equi-join, not a nested
    loop; the null bucket is one more key value (a hot one — at scale
    it's the canonical skew candidate for AQE or salting)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("ka")
    )
    b = supp.select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("kb")
    )
    j = a.join(b, a.ka.eqNullSafe(b.kb))
    return j.groupBy(
        F.coalesce(F.col("ka").cast("string"), F.lit("null")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_gap_fill_locf",
    """
    WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value
                FROM events WHERE user_id < 20),
    hourly AS (SELECT user_id, h,
                      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
               FROM ev GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
               FROM hourly GROUP BY 1),
    spine AS (SELECT user_id,
                     unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM bounds),
    j AS (SELECT s.user_id, s.h, hv.v
          FROM spine s LEFT JOIN hourly hv
            ON s.user_id = hv.user_id AND s.h = hv.h)
    SELECT user_id, epoch_us(h) AS hour_us,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
           v IS NULL AS is_gap
    FROM j
    """,
)
def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (TimescaleDB `time_bucket_gapfill` + `locf`): build the dense hourly
    spine per key from its own min/max hour (sequence + explode — rows
    generated distributed, proportional to key-hours, never a driver
    loop), left-join the sparse hourly aggregate, then one
    last(ignoreNulls) window per key fills the gaps. The fill carries
    exact decimal-sum doubles untouched, so values hash-compare. Scale:
    spine generation and the (key, hour) equi-join partition by key;
    the LOCF window is the same single-shuffle shape as the as-of join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    # key×hours-sized and consumed twice (bounds + the spine join) —
    # checkpoint so the events scan runs once
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(_dsum(F.col("value")).alias("v"))
        .localCheckpoint()
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v").isNull().alias("is_gap"),
    )


@register(
    "q_bucketed_join_agg",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS volume
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table join: both sides written `bucketBy(8, orderkey)`
    (pre-shuffled at write time), then joined and aggregated. On a
    cluster this is THE repeated-fact-join pattern — the scans come up
    hash-partitioned, so the join needs no Exchange on either side
    (pinned by tests/test_scale_plans.py:test_bucketed_join_has_no_exchange);
    here the same path is driven end-to-end through the warehouse with
    the result oracle-checked against the plain join."""
    from .sinks import ensure_bucketed_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    # table setup (warehouse mutation) lives in sinks.py and goes through
    # the Hadoop FileSystem API — works under any warehouse scheme, and
    # keeps this function a pure read + join over the catalog tables
    o = ensure_bucketed_table(spark, orders, "bq_orders", "o_orderkey", 8)
    l = ensure_bucketed_table(spark, li, "bq_lineitem", "l_orderkey", 8)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("l_extendedprice")).alias("volume"),
        )
    )


@register(
    "q_merge_upsert",
    """
    WITH src AS (
      SELECT o_custkey + CASE WHEN o_custkey % 10 = 0 THEN 1000000 ELSE 0 END
               AS key,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
    tgt AS (SELECT c_custkey AS key, c_name AS name,
                   CAST(c_acctbal AS DOUBLE) AS bal
            FROM customer)
    SELECT COALESCE(t.key, s.key) AS key,
           CASE WHEN t.key IS NULL THEN 'NEW' ELSE t.name END AS name,
           CASE WHEN s.key IS NULL THEN t.bal
                WHEN t.key IS NULL THEN s.spend
                ELSE t.bal + s.spend END AS new_bal,
           CASE WHEN s.key IS NULL THEN 'keep'
                WHEN t.key IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM tgt t FULL OUTER JOIN src s ON t.key = s.key
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD-1 upsert) expressed as relational algebra: target
    dim FULL OUTER JOIN source updates on the key, then the three MERGE
    branches as one projection — matched → update, not-matched-by-source
    → keep, not-matched-by-target → insert (a sliver of source keys is
    shifted so the insert branch actually fires). This is exactly what
    Delta/Iceberg MERGE compiles to; at scale the join shuffles both
    sides on the key and a real table format adds file-level pruning of
    untouched partitions on top of this same row algebra. Arithmetic:
    decimal-exact spend sum; new_bal is one double add of two exact
    doubles — bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    src = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(
            (
                F.col("o_custkey")
                + F.when(F.col("o_custkey") % 10 == 0, 1000000).otherwise(0)
            ).alias("key"),
            F.col("o_totalprice"),
        )
        .groupBy("key")
        .agg(_dsum(F.col("o_totalprice")).alias("spend"))
        .withColumn("__s", F.lit(True))
    )
    tgt = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.lit(True).alias("__t"),
    )
    m = tgt.join(src, "key", "full_outer")
    return m.select(
        "key",
        F.when(F.col("__t").isNull(), F.lit("NEW"))
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(F.col("__s").isNull(), F.col("bal"))
        .when(F.col("__t").isNull(), F.col("spend"))
        .otherwise(F.col("bal") + F.col("spend"))
        .alias("new_bal"),
        F.when(F.col("__s").isNull(), F.lit("keep"))
        .when(F.col("__t").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


@register(
    "q_merge_upsert_delete",
    """
    WITH src AS (
      SELECT o_custkey + CASE WHEN o_custkey % 10 = 0 THEN 1000000 ELSE 0 END
               AS key,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend,
             COUNT(*) AS n_orders
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
    tgt AS (SELECT c_custkey AS key, c_name AS name,
                   CAST(c_acctbal AS DOUBLE) AS bal
            FROM customer),
    m AS (
      SELECT COALESCE(t.key, s.key) AS key, t.name, t.bal, s.spend,
             s.n_orders,
             t.key IS NOT NULL AS in_t, s.key IS NOT NULL AS in_s
      FROM tgt t FULL OUTER JOIN src s ON t.key = s.key)
    SELECT key,
           CASE WHEN NOT in_t THEN 'NEW' ELSE name END AS name,
           CASE WHEN NOT in_s THEN bal
                WHEN NOT in_t THEN spend
                ELSE bal + spend END AS new_bal,
           CASE WHEN NOT in_s THEN 'keep'
                WHEN NOT in_t THEN 'insert'
                ELSE 'update' END AS action
    FROM m
    WHERE NOT (in_t AND in_s AND n_orders >= 3 AND bal < 0)
    """,
)
def q_merge_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with a conditional DELETE branch — the full 4-branch MERGE
    surface (WHEN MATCHED AND <cond> THEN DELETE / WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED THEN INSERT / NOT MATCHED BY SOURCE →
    keep), as Delta/Iceberg compile it: the SAME full-outer row algebra
    as q_merge_upsert with the delete branch becoming a FILTER on the
    merged rows (a deleted row is simply not re-emitted into the new
    table version). Deletes here: matched customers with >=3 open
    orders and a negative balance — the purge-on-condition shape of GDPR
    /retention merges.

    Scale: identical to q_merge_upsert (one key-shuffle full-outer
    join); the delete filter is free (no extra pass) because it rides
    the merge projection. Table formats add file pruning on top; the
    row algebra is this."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    src = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(
            (
                F.col("o_custkey")
                + F.when(F.col("o_custkey") % 10 == 0, 1000000).otherwise(0)
            ).alias("key"),
            F.col("o_totalprice"),
        )
        .groupBy("key")
        .agg(
            _dsum(F.col("o_totalprice")).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .withColumn("__s", F.lit(True))
    )
    tgt = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.lit(True).alias("__t"),
    )
    m = tgt.join(src, "key", "full_outer")
    in_t, in_s = F.col("__t").isNotNull(), F.col("__s").isNotNull()
    kept = m.filter(
        ~(
            in_t
            & in_s
            & (F.col("n_orders") >= 3)
            & (F.col("bal") < 0)
        )
    )
    return kept.select(
        "key",
        F.when(~in_t, F.lit("NEW")).otherwise(F.col("name")).alias("name"),
        F.when(~in_s, F.col("bal"))
        .when(~in_t, F.col("spend"))
        .otherwise(F.col("bal") + F.col("spend"))
        .alias("new_bal"),
        F.when(~in_s, F.lit("keep"))
        .when(~in_t, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


@register(
    "q_window_topk_per_group",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the partition key, sort within
    partitions, early filter. At scale AQE handles moderate key skew; a
    heavy-hitter key would get a pre-aggregation salt (see dedup ops)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@register(
    "q_window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC_PRICE)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@register(
    "q_window_ntile_dist",
    """
    SELECT event_id, user_id,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def q_window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist).
    The (value, event_id) ordering is total, so the rank-derived doubles
    are single-division deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_stats_moments",
    """
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(v) AS sv, SUM(v * v) AS svv,
             SUM(k) AS sk, SUM(k * k) AS skk,
             SUM(v * k) AS svk
      FROM c GROUP BY event_type)
    SELECT event_type, n,
           sqrt(CAST(n * svv - sv * sv AS DOUBLE)
                / CAST(n * (n - 1) AS DOUBLE)) / 100.0 AS stddev_value,
           CAST(n * svk - sv * sk AS DOUBLE)
             / (sqrt(CAST(n * svv - sv * sv AS DOUBLE))
                * sqrt(CAST(n * skk - sk * sk AS DOUBLE))) AS corr_value_k
    FROM m
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev + Pearson correlation from exact integer moments
    (values in cents, k integer): the sums are int64-exact, so both
    engines see identical numerators/denominators and the only floating
    point is the final sqrt/division. The native stddev_samp/corr
    aggregates stream Welford updates in partition order — correct but
    not bit-stable across engines/orders, which a value-hash gate can't
    accept. int64 moments hold to ~sf1 here (sv² < 2^63); beyond that,
    cast the moment sums to DECIMAL(38,0) — same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    m = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum(F.col("v") * F.col("k")).alias("svk"),
    )
    var_v = (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
    var_k = (F.col("n") * F.col("skk") - F.col("sk") * F.col("sk")).cast("double")
    cov = (F.col("n") * F.col("svk") - F.col("sv") * F.col("sk")).cast("double")
    denom = (F.col("n") * (F.col("n") - 1)).cast("double")
    return m.select(
        "event_type",
        "n",
        (F.sqrt(var_v / denom) / F.lit(100.0)).alias("stddev_value"),
        (cov / (F.sqrt(var_v) * F.sqrt(var_k))).alias("corr_value_k"),
    )


@register(
    "q_window_lag_lead",
    """
    SELECT event_id, user_id,
           LAG(event_id) OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id,
           CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
                AS INTEGER) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.rank().over(wr).alias("value_rank"),
    )


@register(
    "q_sessionize_batch",
    """
    WITH l AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
      FROM events),
    m AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
      FROM l),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM m)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag → gap flag →
    running sum = session id → per-session rollup. The classic
    lag+cumsum idiom: two window passes over ONE hash shuffle on user_id
    (both windows and the final groupBy share the partitioning, so
    Catalyst plans a single Exchange). Gap math in integer microseconds —
    no float time arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(
        prev_us.isNull() | (us - prev_us > 1_800_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_s).over(wc).alias("session_seq"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )


@register(
    "q_window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC) AS INTEGER)
             AS price_rank,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                        RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS near_total
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames + dense_rank. Range frames are tie-safe by definition
    (every peer of the boundary value is in the frame), so the decimal
    windowed sum is deterministic without a tiebreak column."""
    o = load_table(spark, sf_dir, "orders")
    wr = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    wrange = (
        W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(wr).alias("price_rank"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(wrange)
        .cast("double")
        .alias("near_total"),
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


def _sql_query(sql: str, *tables: str):
    """A query expressed through the SQL API surface (views + spark.sql)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return fn


_EXISTS_SQL = """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
"""
register("q_subquery_exists", _EXISTS_SQL)(
    _sql_query(_EXISTS_SQL, "orders", "lineitem")
)
# Correlated EXISTS — Catalyst rewrites to a left-semi join; integer-exact.

_SCALAR_SUBQ_SQL = """
    SELECT n_name,
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey) AS n_cust
    FROM nation n
"""
register("q_subquery_scalar", _SCALAR_SUBQ_SQL)(
    _sql_query(_SCALAR_SUBQ_SQL, "nation", "customer")
)
# Correlated scalar subquery — rewritten to an outer-join + aggregate.

_IN_SUBQ_SQL = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
"""
register("q_subquery_in", _IN_SUBQ_SQL)(_sql_query(_IN_SUBQ_SQL, "supplier", "nation"))

_RECURSIVE_SQL = """
    WITH RECURSIVE r(n, f) AS (
      SELECT 1, CAST(1 AS BIGINT)
      UNION ALL SELECT n + 1, f * (n + 1) FROM r WHERE n < 12
    ) SELECT n, f FROM r
"""
register("q_recursive_cte", _RECURSIVE_SQL)(_sql_query(_RECURSIVE_SQL))
# Recursive CTE (Spark 4 UnionLoop execution) — factorials, integer-exact.


# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------


@register(
    "q_order_limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, never a full sort of the table."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_set_ops",
    """
    SELECT 'union' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(cust.union(supp).distinct(), "union")
        .unionByName(tag(cust.intersect(supp), "intersect"))
        .unionByName(tag(cust.subtract(supp), "except"))
    )


@register(
    "q_set_ops_all",
    """
    SELECT 'intersect_all' AS op, nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
    UNION ALL
    SELECT 'except_all', nationkey, COUNT(*) FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY 2
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicity-aware — each duplicate survives min(l,r) or max(l-r,0)
    times, which Spark plans as a counted anti/semi computation, not a
    distinct. Output is aggregated per key so the multiplicities
    themselves are what hash-compares."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    def agg(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("nationkey").agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit(op).alias("op"), "nationkey", "n")

    return agg(cust.intersectAll(supp), "intersect_all").unionByName(
        agg(cust.exceptAll(supp), "except_all")
    )


@register(
    "q_scalar_try",
    """
    SELECT event_id,
           value / NULLIF(CAST(event_id % 3 AS DOUBLE), 0.0) AS safe_ratio,
           TRY_CAST(event_type AS INTEGER) AS etype_int,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           list_extract(string_split(event_type, '_'), 3) AS third_piece
    FROM events
    """,
)
def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (try_divide / try_cast / try_element_at):
    malformed input yields NULL instead of a task failure — the ANSI-safe
    row-level error handling a 100 TB batch needs, where one bad record
    must not kill a 10-hour job. Cross-engine parity verified: Spark
    try_divide by zero ≡ DuckDB NULLIF-divide, try_cast ≡ TRY_CAST,
    try_element_at out-of-bounds ≡ list_extract (both NULL)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(
            F.col("value"), (F.col("event_id") % 3).cast("double")
        ).alias("safe_ratio"),
        F.expr("try_cast(event_type AS INT)").alias("etype_int"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.try_element_at(F.split("event_type", "_"), F.lit(3)).alias(
            "third_piece"
        ),
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------


@register(
    "q_scalar_string",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           CAST(CONTAINS(p_name, 'green') AS BOOLEAN) AS has_green,
           LTRIM(RTRIM(p_name)) AS name_trim,
           CAST(STRPOS(p_name, 'a') AS INTEGER) AS first_a
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").contains("green").alias("has_green"),
        F.ltrim(F.rtrim(F.col("p_name"))).alias("name_trim"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
    )


@register(
    "q_scalar_datetime",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
             AS days_since_epoch_start
    FROM orders
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@register(
    "q_scalar_math_case",
    """
    SELECT event_id,
           CAST(FLOOR(value) AS BIGINT) AS v_floor,
           CAST(CEIL(value) AS BIGINT) AS v_ceil,
           ABS(value - 100.0) AS v_dist,
           CAST(SQRT(value) AS DOUBLE) AS v_sqrt,
           CAST(event_id % 7 AS BIGINT) AS id_mod,
           CASE WHEN value >= 150 THEN 'high' WHEN value >= 50 THEN 'mid'
                ELSE 'low' END AS band,
           COALESCE(NULLIF(event_type, 'view'), 'viewed') AS etype2,
           (value BETWEEN 25 AND 75) AS in_band,
           GREATEST(value, 50.0) AS v_hi, LEAST(value, 50.0) AS v_lo
    FROM events
    """,
)
def q_scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.floor(v).alias("v_floor"),
        F.ceil(v).alias("v_ceil"),
        F.abs(v - 100.0).alias("v_dist"),
        F.sqrt(v).alias("v_sqrt"),
        (F.col("event_id") % 7).alias("id_mod"),
        F.when(v >= 150, "high").when(v >= 50, "mid").otherwise("low").alias("band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("viewed")).alias(
            "etype2"
        ),
        v.between(25, 75).alias("in_band"),
        F.greatest(v, F.lit(50.0)).alias("v_hi"),
        F.least(v, F.lit(50.0)).alias("v_lo"),
    )


@register(
    "q_scalar_json_array",
    """
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS e_first,
           embedding[64] AS e_last,
           list_max(embedding) AS e_max,
           list_min(embedding) AS e_min
    FROM embeddings
    """,
)
def q_scalar_json_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column (no float arithmetic —
    element access and min/max are exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("e_first"),
        F.element_at("embedding", 64).alias("e_last"),
        F.array_max("embedding").alias("e_max"),
        F.array_min("embedding").alias("e_min"),
    )


@register(
    "q_json_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           (CAST(json_extract(props, '$.k') AS INTEGER) > 50) AS k_high
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k"), (k > 50).alias("k_high"))


@register(
    "q_variant_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                 THEN 1 END) AS n_high_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via the VARIANT type (Spark 4): parse_json
    once per record into the binary variant encoding, then typed
    try_variant_get extraction — the idiomatic scale path when a JSON
    column is touched by several expressions (one parse, N cheap reads,
    vs get_json_object's parse-per-call). Oracle uses plain JSON
    extraction; the values are identical."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


@register(
    "q_explode_posexplode",
    """
    SELECT vec_id, CAST(pos AS INTEGER) AS pos, val
    FROM (SELECT vec_id, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) - 1 AS pos
          FROM embeddings)
    WHERE pos < 4
    """,
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten (the reference's flatMapValues analog, TopologyProducer.kt:
    100-105): posexplode over an array column, narrow (no shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 4)
    )


# --------------------------------------------------------------------------
# LLM-data-pipeline operators: dedup / similarity / text analysis /
# multimodal (operators/{dedup,similarity,multimodal}.py)
# --------------------------------------------------------------------------

# Shared DuckDB fragments — these MUST stay formula-identical to
# functions/text.py and functions/vectors.py.
_D_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_D_SHINGLES = (
    "CASE WHEN len(t) >= 3 THEN list_transform(generate_series(1, len(t)-2),"
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
    " ELSE CAST([] AS VARCHAR[]) END"
)
_D_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_MINHASH_K, _MINHASH_BANDS, _LSH_MAX_BUCKET = 12, 3, 64
_FIXED = "1048576.0"  # 2^20, functions/vectors.py FIXED_SCALE


@register(
    "dedup_exact_groups",
    f"""
    SELECT md5({_D_NORM}) AS fingerprint, COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-agg on the content fingerprint (map-side
    partial agg ⇒ shuffle is #distinct fingerprints, not #docs)."""
    from .operators.dedup import exact_dup_groups

    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs).select("fingerprint", "n_docs", "keeper")


@register(
    "dedup_drop_exact",
    f"""
    SELECT MIN(doc_id) AS doc_id FROM
      (SELECT doc_id, md5({_D_NORM}) AS fp FROM documents)
    GROUP BY fp
    """,
)
def dedup_drop_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup SURVIVORS (min-id per fingerprint): the agg + semi-join
    formulation shares one hash partitioning on the fingerprint — no
    window, no second shuffle."""
    from .operators.dedup import drop_exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return drop_exact_duplicates(docs).select("doc_id")


def _minhash_sig_sql(src: str = "documents") -> str:
    aggs = ",\n           ".join(
        f"min(h1 + {s} * h2) AS h{s}" for s in range(_MINHASH_K)
    )
    r = _MINHASH_K // _MINHASH_BANDS
    bands = ", ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"h{b * r + i}" for i in range(r))
        + "))"
        for b in range(_MINHASH_BANDS)
    )
    return f"""
    toks AS (SELECT doc_id, {_D_TOKS} AS t FROM {src}),
    sh AS (SELECT DISTINCT doc_id, unnest({_D_SHINGLES}) AS s FROM toks),
    hs AS (SELECT doc_id,
                  ('0x' || substring(md5(s), 1, 15))::BIGINT AS h1,
                  ('0x' || substring(md5(s), 17, 13))::BIGINT AS h2 FROM sh),
    sig AS (SELECT doc_id, {aggs} FROM hs GROUP BY doc_id),
    banded AS (SELECT DISTINCT doc_id, band_key FROM (
      SELECT doc_id, unnest([{bands}]) AS band_key FROM sig)),
    ok AS (SELECT band_key FROM banded GROUP BY band_key
           HAVING COUNT(*) <= {_LSH_MAX_BUCKET})
    """


@register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_minhash_sig_sql()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN ok ON a.band_key = ok.band_key
    JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: shingle → 12 min-hashes (ONE shuffle on
    doc_id for all 12) → 3 band keys → equi-join on band key. Candidate
    generation is O(collisions); the 100 TB plan is identical, plus salting
    if one band key goes hot."""
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )


@register(
    "dedup_incremental",
    f"""
    WITH {_minhash_sig_sql()},
    ok_old AS (SELECT band_key FROM banded WHERE doc_id < 250
               GROUP BY band_key HAVING COUNT(*) <= {_LSH_MAX_BUCKET})
    SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
    FROM banded n
    JOIN ok_old ON n.band_key = ok_old.band_key
    JOIN banded o ON n.band_key = o.band_key AND o.doc_id < 250
    WHERE n.doc_id >= 250
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (new crawl vs existing corpus, here split at
    doc_id 250): banded LSH join ACROSS the snapshots only —
    operators/dedup.py:minhash_lsh_pairs_between skips the corpus×corpus
    quadratic term entirely, so each new batch costs O(new · collisions)
    regardless of corpus size. The production loop: dedup the new batch
    against the corpus, drop hits, append survivors, reuse the corpus's
    banded table next crawl."""
    from .operators.dedup import minhash_lsh_pairs_between

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    return minhash_lsh_pairs_between(
        new, old, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
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
    from .operators.dedup import minhash_lsh_pairs

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
    "dedup_connected_components",
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
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS doc_id, MIN(dst) AS component
    FROM reach GROUP BY src
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assignment over the MinHash pair graph, still
    oracle-checked (DuckDB computes the same components by recursive
    transitive closure). Two-level algorithm
    (operators/dedup.py:connected_components_twolevel): memory-bounded
    partition-local union-find, then accelerated label propagation on
    the cross-partition linker graph only — the iterative rounds run on
    data ~1000× smaller than the pair stream, so per-round driver cost
    stops dominating and long chains (which defeat pure per-round
    propagation: O(diameter) rounds) are collapsed locally first."""
    from .operators.dedup import connected_components_twolevel, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    return connected_components_twolevel(pairs)


@register(
    "dedup_pair_explain",
    f"""
    WITH {_minhash_sig_sql()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    j AS (
      SELECT p.doc_a, p.doc_b, ta.t AS ta, tb.t AS tb,
             len(ta.t) AS na, len(tb.t) AS nb,
             least(len(ta.t), len(tb.t)) AS mn
      FROM pairs p
      JOIN t ta ON ta.doc_id = p.doc_a
      JOIN t tb ON tb.doc_id = p.doc_b),
    ex AS (
      SELECT doc_a, doc_b, na, nb, mn, ta, tb,
             list_position(list_transform(generate_series(1, mn),
               i -> ta[i] = tb[i]), false) AS ppos,
             list_position(list_transform(generate_series(1, mn),
               i -> ta[na + 1 - i] = tb[nb + 1 - i]), false) AS spos,
             len(list_intersect(
               list_distinct(list_transform(generate_series(1, na - 2),
                 i -> concat_ws(' ', ta[i], ta[i+1], ta[i+2]))),
               list_distinct(list_transform(generate_series(1, nb - 2),
                 i -> concat_ws(' ', tb[i], tb[i+1], tb[i+2]))))) AS inter,
             len(list_distinct(list_transform(generate_series(1, na - 2),
                 i -> concat_ws(' ', ta[i], ta[i+1], ta[i+2])))) AS sa,
             len(list_distinct(list_transform(generate_series(1, nb - 2),
                 i -> concat_ws(' ', tb[i], tb[i+1], tb[i+2])))) AS sb
      FROM j)
    SELECT doc_a, doc_b,
           CAST(CASE WHEN ppos IS NULL OR ppos = 0 THEN mn
                ELSE ppos - 1 END AS BIGINT) AS prefix_tokens,
           CAST(CASE WHEN spos IS NULL OR spos = 0 THEN mn
                ELSE spos - 1 END AS BIGINT) AS suffix_tokens,
           CAST(inter AS DOUBLE) / CAST(sa + sb - inter AS DOUBLE)
             AS jaccard3,
           CAST(inter AS DOUBLE) / CAST(least(sa, sb) AS DOUBLE)
             AS containment3
    FROM ex
    """,
)
def dedup_pair_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair EXPLAINABILITY: for every LSH candidate pair, the
    quantities that tell a curator WHAT KIND of duplicate it is —
    common token prefix/suffix lengths (template-with-slots dups have
    long shared affixes; appended-boilerplate dups have long suffixes),
    3-gram Jaccard (symmetric similarity) and containment (subset
    duplication). First-mismatch positions come from a
    transform-over-index-range + position-of-false — identical
    expression in both engines, no UDF; shingle sets are in-row
    distinct lists.

    Scale: all work is per-pair row-local on the LSH-bounded pair
    stream; the two token-array joins shuffle on doc id."""
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    from .functions import text as TX

    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    t = docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    j = (
        pairs.join(
            t.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta")),
            "doc_a",
        )
        .join(
            t.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb")),
            "doc_b",
        )
        .withColumn("na", F.size("ta"))
        .withColumn("nb", F.size("tb"))
        .withColumn("mn", F.least("na", "nb"))
    )
    ex = j.select(
        "doc_a",
        "doc_b",
        "mn",
        F.expr(
            "array_position(transform(sequence(1, mn),"
            " i -> element_at(ta, i) = element_at(tb, i)), false)"
        ).alias("ppos"),
        F.expr(
            "array_position(transform(sequence(1, mn),"
            " i -> element_at(ta, na + 1 - i)"
            " = element_at(tb, nb + 1 - i)), false)"
        ).alias("spos"),
        F.expr(
            "size(array_intersect("
            " array_distinct(transform(sequence(1, na - 2),"
            "  i -> concat_ws(' ', element_at(ta, i), element_at(ta, i+1),"
            "       element_at(ta, i+2)))),"
            " array_distinct(transform(sequence(1, nb - 2),"
            "  i -> concat_ws(' ', element_at(tb, i), element_at(tb, i+1),"
            "       element_at(tb, i+2))))))"
        ).alias("inter"),
        F.expr(
            "size(array_distinct(transform(sequence(1, na - 2),"
            " i -> concat_ws(' ', element_at(ta, i), element_at(ta, i+1),"
            " element_at(ta, i+2)))))"
        ).alias("sa"),
        F.expr(
            "size(array_distinct(transform(sequence(1, nb - 2),"
            " i -> concat_ws(' ', element_at(tb, i), element_at(tb, i+1),"
            " element_at(tb, i+2)))))"
        ).alias("sb"),
    )
    return ex.select(
        "doc_a",
        "doc_b",
        F.expr("CASE WHEN ppos = 0 THEN mn ELSE ppos - 1 END")
        .cast("long")
        .alias("prefix_tokens"),
        F.expr("CASE WHEN spos = 0 THEN mn ELSE spos - 1 END")
        .cast("long")
        .alias("suffix_tokens"),
        (
            F.col("inter").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("inter")).cast("double")
        ).alias("jaccard3"),
        (
            F.col("inter").cast("double")
            / F.least("sa", "sb").cast("double")
        ).alias("containment3"),
    )


@register(
    "dedup_lsh_precision",
    f"""
    WITH {_minhash_sig_sql()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    t AS (SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len({_D_TOKS}) - 2),
                   i -> concat_ws(' ', ({_D_TOKS})[i], ({_D_TOKS})[i+1],
                        ({_D_TOKS})[i+2]))) AS sh
          FROM documents),
    j AS (
      SELECT p.doc_a, p.doc_b,
             len(list_intersect(ta.sh, tb.sh)) AS inter,
             len(ta.sh) + len(tb.sh)
               - len(list_intersect(ta.sh, tb.sh)) AS uni
      FROM pairs p
      JOIN t ta ON ta.doc_id = p.doc_a
      JOIN t tb ON tb.doc_id = p.doc_b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN inter * 2 >= uni THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN inter * 2 >= uni THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS precision
    FROM j
    """,
)
def dedup_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index evaluation: PRECISION of the MinHash-LSH candidate
    pairs against exact 3-gram Jaccard ≥ 0.5 (the all-integer test
    inter·2 ≥ union — no float threshold) — the fourth in-engine eval
    (ANN recall, lang-ID confusion, k-means inertia). Low precision
    means the banding is too loose and the verify stage pays for it;
    the complementary recall direction needs the all-pairs ground
    truth, which sim_embedding_near_dup's block-tiled shape computes
    when a run budgets it.

    Scale: exact Jaccard runs ONLY on the LSH-bounded candidate set —
    precision evaluation costs one shingle-set join over pairs, never
    the corpus square."""
    from .functions import text as TX
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    t = docs.select(
        "doc_id",
        F.array_distinct(
            TX.word_shingles(TX.tokens(F.col("text")), 3)
        ).alias("sh"),
    )
    j = (
        pairs.join(
            t.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")),
            "doc_a",
        )
        .join(
            t.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")),
            "doc_b",
        )
        .select(
            F.size(F.array_intersect("sa", "sb")).alias("inter"),
            (
                F.size("sa") + F.size("sb")
                - F.size(F.array_intersect("sa", "sb"))
            ).alias("uni"),
        )
    )
    true_flag = F.when(F.col("inter") * 2 >= F.col("uni"), 1).otherwise(0)
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(true_flag).alias("n_true"),
        (
            F.sum(true_flag).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("precision"),
    )


@register(
    "dedup_source_matrix",
    f"""
    WITH {_minhash_sig_sql()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — WHICH sources duplicate each
    other (near-dup pair counts per unordered source pair): the
    syndication/mirror-detection view a crawl curation report leads
    with, since a hot off-diagonal cell means one feed is republishing
    another and can be dropped wholesale instead of deduped pairwise.
    Built on the proven MinHash-LSH pair stream; source lookup is two
    doc-keyed joins; least/greatest canonicalizes the pair.

    Scale: pairs are LSH-bounded (never all-pairs); the matrix is
    |sources|² at most — the aggregation output is tiny by
    construction."""
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    src = docs.select("doc_id", "source")
    pa = pairs.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
        "doc_a",
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
        "doc_b",
    )
    return (
        pa.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "dedup_cluster_histogram",
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
      WHERE d.doc_id NOT IN (SELECT doc_id FROM comp)),
    sizes AS (SELECT component, COUNT(*) AS cluster_size
              FROM comp_all GROUP BY component)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup OBSERVABILITY: the near-dup cluster-size distribution —
    "how much of the corpus sits in duplicate clusters of size s" — the
    first chart every dedup report shows (it decides the dedup
    strategy: a fat head of giant clusters wants exact-hash first, a
    long tail of pairs wants LSH). Clusters come from the proven
    MinHash→LSH→connected-components chain; documents in no pair at all
    are size-1 clusters via an anti-join union, so Σ n_docs equals the
    corpus size exactly.

    Scale: everything after CC is two keyed aggs over (doc, component)
    rows; the anti-join is a semi-join-shaped fingerprint lookup."""
    from .operators.dedup import (
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
    sizes = comp_all.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


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
    from .operators.dedup import (
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


def _pr_iter(k: int, prev: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE."""
    return f"""
    i{k} AS (
      SELECT n_.node,
             tp.t + COALESCE(SUM((85 * p.r) // (100 * od.d)), 0) AS r
      FROM nodes n_
      CROSS JOIN tp
      LEFT JOIN edges e ON e.dst = n_.node
      LEFT JOIN {prev} p ON p.node = e.src
      LEFT JOIN outd od ON od.src = e.src
      GROUP BY n_.node, tp.t)"""


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
    from .operators.graph import pagerank

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


def _wpr_iter(k: int, prev: str) -> str:
    """One unrolled WEIGHTED PageRank iteration: mass splits along
    out-edges proportionally to integer edge weight."""
    return f"""
    i{k} AS (
      SELECT n_.node,
             tp.t + COALESCE(SUM((85 * p.r * e.w) // (100 * ow.wt)), 0) AS r
      FROM nodes n_
      CROSS JOIN tp
      LEFT JOIN edges e ON e.dst = n_.node
      LEFT JOIN {prev} p ON p.node = e.src
      LEFT JOIN outw ow ON ow.src = e.src
      GROUP BY n_.node, tp.t)"""


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
    from .operators.graph import weighted_pagerank

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


def _ppr_iter(k: int, prev: str) -> str:
    """One unrolled personalized-PageRank iteration: teleport mass goes
    to SEED nodes only; everything else matches _pr_iter."""
    return f"""
    i{k} AS (
      SELECT n_.node,
             CASE WHEN sd.node IS NOT NULL
                  THEN 150000000000 // ns.ns ELSE 0 END
               + COALESCE(SUM((85 * p.r) // (100 * od.d)), 0) AS r
      FROM nodes n_
      CROSS JOIN ns
      LEFT JOIN seeds sd ON sd.node = n_.node
      LEFT JOIN edges e ON e.dst = n_.node
      LEFT JOIN {prev} p ON p.node = e.src
      LEFT JOIN outd od ON od.src = e.src
      GROUP BY n_.node, ns.ns, sd.node)"""


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
    from .operators.graph import personalized_pagerank

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


_HITS_SCALE = 1_000_000_000  # operators/graph.py HITS_SCALE


def _hits_iter(k: int, prev: str) -> str:
    """One unrolled HITS round as DuckDB CTEs: authority then hub, each
    sum-normalized to SCALE with int64 floor division."""
    return f"""
    ar{k} AS (
      SELECT n_.node, COALESCE(SUM(h.h), 0) AS a
      FROM nodes n_
      LEFT JOIN edges e ON e.dst = n_.node
      LEFT JOIN {prev} h ON h.node = e.src
      GROUP BY n_.node),
    at{k} AS (SELECT SUM(a) AS t FROM ar{k}),
    a{k} AS (SELECT node, (a * {_HITS_SCALE}) // t AS a
             FROM ar{k} CROSS JOIN at{k}),
    hr{k} AS (
      SELECT n_.node, COALESCE(SUM(a.a), 0) AS h
      FROM nodes n_
      LEFT JOIN edges e ON e.src = n_.node
      LEFT JOIN a{k} a ON a.node = e.dst
      GROUP BY n_.node),
    ht{k} AS (SELECT SUM(h) AS t FROM hr{k}),
    h{k} AS (SELECT node, (h * {_HITS_SCALE}) // t AS h
             FROM hr{k} CROSS JOIN ht{k})"""


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
    from .operators.graph import hits

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


def _pr_iter_dangling(k: int, prev: str) -> str:
    """One unrolled dangling-mass PageRank iteration as DuckDB CTEs:
    dm{k} = the uniform share of rank mass held by sink nodes under
    {prev}, added to every node's teleport term."""
    return f"""
    dm{k} AS (SELECT (85 * COALESCE(
                 (SELECT SUM(p.r) FROM {prev} p JOIN dang USING (node)), 0))
               // (100 * (SELECT n FROM nn)) AS dmt),
    i{k} AS (
      SELECT n_.node,
             tp.t + dm{k}.dmt
                  + COALESCE(SUM((85 * p.r) // (100 * od.d)), 0) AS r
      FROM nodes n_
      CROSS JOIN tp
      CROSS JOIN dm{k}
      LEFT JOIN edges e ON e.dst = n_.node
      LEFT JOIN {prev} p ON p.node = e.src
      LEFT JOIN outd od ON od.src = e.src
      GROUP BY n_.node, tp.t, dm{k}.dmt)"""


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
    from .operators.graph import pagerank

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
    "dedup_verify_editdist",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS l FROM toks),
    ex AS (SELECT doc_id, len(l) AS n_shingles,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_shingles AS n_a, b.n_shingles AS n_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.shash = b.shash AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      WHERE CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)
            >= 0.8),
    nt AS (SELECT doc_id, {_D_NORM} AS t FROM documents)
    SELECT doc_a, doc_b,
           CAST(levenshtein(ta.t, tb.t) AS INTEGER) AS lev,
           CASE WHEN greatest(length(ta.t), length(tb.t)) = 0 THEN 1.0
                ELSE 1.0 - CAST(levenshtein(ta.t, tb.t) AS DOUBLE)
                     / CAST(greatest(length(ta.t), length(tb.t)) AS DOUBLE)
           END AS sim
    FROM pairs
    JOIN nt ta ON ta.doc_id = doc_a
    JOIN nt tb ON tb.doc_id = doc_b
    """,
)
def dedup_verify_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage completing the dedup pipeline: exact levenshtein
    similarity computed only over the inverted-index CANDIDATE pairs —
    quadratic edit-distance cost bounded by O(matches), never O(n²) over
    the corpus."""
    from .operators.dedup import ngram_jaccard_pairs, verify_pairs_editdist

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    return verify_pairs_editdist(pairs, docs)


@register(
    "dedup_drop_near",
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
             FROM reach GROUP BY src)
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.component = d.doc_id
    """,
)
def dedup_drop_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step completing near-dedup: keep one canonical survivor
    (min doc_id) per duplicate cluster, pass through everything that
    never entered a cluster. Candidates → components → one anti-join of
    non-canonical members against the corpus — the pair graph is
    O(collisions) and the final pass is one narrow join, so the drop
    step adds nothing quadratic at 100 TB."""
    from .operators.dedup import connected_components_twolevel, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    comp = connected_components_twolevel(pairs)
    losers = comp.filter(F.col("component") != F.col("doc_id")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


@register(
    "dedup_drop_best",
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
    ranked AS (
      SELECT c.doc_id, c.component,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
    SELECT d.doc_id
    FROM documents d
    LEFT JOIN ranked r ON d.doc_id = r.doc_id
    WHERE r.doc_id IS NULL OR r.rn = 1
    """,
)
def dedup_drop_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup APPLY with the PRODUCTION survivor policy: per
    duplicate cluster keep the BEST member — here longest (n_chars
    DESC, doc_id tiebreak), the usual rule since the longest near-dup
    retains the most content — instead of dedup_drop_near's arbitrary
    min-id canonical. One extra broadcast-sized max_by aggregate over
    the component assignment picks each cluster's survivor; everything
    else (candidates → components → one anti-join) is identical, so the
    policy upgrade costs one map-side-combinable agg, nothing
    quadratic.

    Scale: the agg runs over component MEMBERS (O(duplicates), not
    O(corpus)); max_by(struct) needs no per-cluster sort."""
    from .operators.dedup import connected_components_twolevel, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    comp = connected_components_twolevel(pairs)
    members = comp.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    survivors = members.groupBy("component").agg(
        F.max(
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("best")
    ).select(
        "component", (-F.col("best.neg_id")).alias("survivor_id")
    )
    losers = (
        comp.join(survivors, "component")
        .filter(F.col("doc_id") != F.col("survivor_id"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


@register(
    "dedup_hybrid_verify",
    f"""
    WITH {_minhash_sig_sql()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS v
      FROM embeddings),
    nv AS (SELECT vec_id, v,
                  CAST(list_dot_product(v, v) AS BIGINT) AS nsq FROM qv)
    SELECT p.doc_a, p.doc_b,
           list_dot_product(a.v, b.v)
             / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) AS cos_sim,
           (list_dot_product(a.v, b.v)
             / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) >= 0.4)
             AS verified
    FROM pairs p
    JOIN nv a ON p.doc_a = a.vec_id
    JOIN nv b ON p.doc_b = b.vec_id
    """,
)
def dedup_hybrid_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup verification — the full production pipeline
    shape: cheap text blocking (MinHash LSH candidates) verified by
    embedding cosine, so the expensive signal runs over O(candidates),
    never O(n²). Two equi-joins attach each side's quantized embedding;
    the integer-dot cosine keeps both engines bit-identical."""
    from .functions import vectors as V
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        V.quantized(F.col("embedding")).alias("v"),
    )
    emb = emb.select(
        "vec_id", "v", V.dot_int(F.col("v"), F.col("v")).alias("nsq")
    )
    j = (
        pairs.join(
            emb.select(
                F.col("vec_id").alias("doc_a"),
                F.col("v").alias("va"),
                F.col("nsq").alias("na"),
            ),
            "doc_a",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("doc_b"),
                F.col("v").alias("vb"),
                F.col("nsq").alias("nb"),
            ),
            "doc_b",
        )
    )
    sim = V.dot_int(F.col("va"), F.col("vb")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return j.select(
        "doc_a",
        "doc_b",
        sim.alias("cos_sim"),
        (sim >= 0.4).alias("verified"),
    )


_IVF_CELLS = 8


@register(
    "sim_topk_ivf",
    f"""
    WITH cent AS (
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
    assign AS (
      SELECT vec_id, qv, c AS cell,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
      FROM (
        SELECT v.vec_id, v.qv, ct.c,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.qv, ct.cv) DESC, ct.c) AS rn
        FROM q v CROSS JOIN cent ct)
      WHERE rn = 1),
    scored AS (
      SELECT a.vec_id AS query_id, a.cell, b.vec_id AS neighbor_id,
             list_dot_product(a.qv, b.qv)
               / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) AS cos_sim
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < 10 AND a.vec_id != b.vec_id)
    SELECT query_id, cell, neighbor_id, cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (probe=1): deterministic integer centroids, in-row cell
    assignment, equi-join on the cell id. The third similarity path next
    to exact brute force and SRP-LSH."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, n_centroids=_IVF_CELLS, k=5
    )


@register(
    "sim_topk_ivf_multiprobe",
    f"""
    WITH cent AS (
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
    ranked AS (
      SELECT v.vec_id, v.qv, ct.c,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_dot_product(v.qv, ct.cv) DESC, ct.c) AS rn
      FROM q v CROSS JOIN cent ct),
    c_assign AS (
      SELECT vec_id, qv, c AS cell,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
      FROM ranked WHERE rn = 1),
    q_assign AS (
      SELECT vec_id, qv, c AS cell,
             CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
      FROM ranked WHERE rn <= 2 AND vec_id < 10),
    scored AS (
      SELECT a.vec_id AS query_id, a.cell, b.vec_id AS neighbor_id,
             list_dot_product(a.qv, b.qv)
               / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) AS cos_sim
      FROM q_assign a JOIN c_assign b
        ON a.cell = b.cell AND a.vec_id != b.vec_id)
    SELECT query_id, cell, neighbor_id, cos_sim,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-probe (probe=2): the corpus index is unchanged
    (each vector in its nearest cell); each query fans out to its 2
    nearest cells — the standard recall/latency dial. Still an equi-join
    on the cell id, 2× the probe=1 candidate volume."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return _sim_topk_ivf_multiprobe_body(emb)


def _km_assign_sql(cent: str, out: str) -> str:
    """One Lloyd assignment as a DuckDB CTE: nearest centroid by exact
    integer squared L2 (|v|² − 2·v·c + |c|²), ties → lowest centroid."""
    dist = (
        "CAST(list_dot_product(v.qv, v.qv) AS BIGINT)"
        " - 2 * CAST(list_dot_product(v.qv, ct.cv) AS BIGINT)"
        " + CAST(list_dot_product(ct.cv, ct.cv) AS BIGINT)"
    )
    return f"""
    {out} AS (
      SELECT vec_id, qv, c AS cluster, dist_sq FROM (
        SELECT v.vec_id, v.qv, ct.c, {dist} AS dist_sq,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, ct.c ASC) AS rn
        FROM q v CROSS JOIN {cent} ct) WHERE rn = 1)"""


def _km_update_sql(assign: str, prev_cent: str, out: str) -> str:
    """One Lloyd centroid update as DuckDB CTEs: per-(cluster, dim)
    integer floor-div mean over offset-shifted components (+40000 keeps
    the numerator non-negative, so floor and truncating division agree);
    empty clusters keep the previous centroid."""
    return f"""
    {out}_s AS (
      SELECT cluster, d, SUM(qv[d + 1] + 40000) AS s, COUNT(*) AS n
      FROM {assign} CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
      GROUP BY cluster, d),
    {out} AS (
      SELECT p.c, COALESCE(u.cv, p.cv) AS cv
      FROM {prev_cent} p LEFT JOIN (
        SELECT cluster AS c, list(s // n - 40000 ORDER BY d) AS cv
        FROM {out}_s GROUP BY cluster) u USING (c))"""


@register(
    "sim_kmeans_clusters",
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
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, dist_sq
    FROM afinal
    """,
)
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table (k=8, 2 update rounds —
    operators/similarity.py:kmeans_assign): the semantic-curation
    primitive (cluster-balanced sampling, per-cluster dedup budgets) and
    the third iterative algorithm next to PageRank and connected
    components. Assignment is in-row against the broadcast 1-row
    centroid bank (no row-multiplying join); the update is one k×dims
    partial-aggregated shuffle; centroids — model state, k×dims ints —
    stay IN-PLAN as 1-row broadcasts between rounds (lazy since r11,
    the sim_power_iteration shape). Exact integer squared-L2 with
    offset-shifted floor-div means keeps both engines bit-identical; the
    oracle unrolls the same two rounds as CTEs."""
    from .operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=_IVF_CELLS, rounds=2)


@register(
    "sim_kmeans_inertia",
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
    SELECT CAST(cluster AS INTEGER) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(dist_sq) AS BIGINT) AS inertia,
           CAST(SUM(dist_sq) // COUNT(*) AS BIGINT) AS mean_dist_sq
    FROM afinal GROUP BY cluster
    """,
)
def sim_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation: per-cluster size, inertia
    (Σ squared-L2 to the assigned centroid — the quantity Lloyd's
    algorithm minimizes and the elbow-method plots) and integer mean
    distance, over the SAME k-means run sim_kmeans_clusters registers.
    Third member of the in-engine eval family (ANN recall@k, lang-id
    confusion): a cluster with huge inertia or a size-1 cluster tells
    the curator the k or the init is wrong before any downstream op
    trusts the partitioning. All-integer aggregation of the exact
    int64 dist_sq — one keyed agg on k groups after the assign pass."""
    from .operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_assign(emb, k=_IVF_CELLS, rounds=2)
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dist_sq").alias("inertia"),
            F.expr("SUM(dist_sq) DIV COUNT(*)").alias("mean_dist_sq"),
        )
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
    from .operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assign(emb, k=_IVF_CELLS, rounds=2)
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        clusters.select("cluster", "vec_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
    )


def _sim_topk_ivf_multiprobe_body(emb: DataFrame) -> DataFrame:
    from .operators.similarity import ivf_topk

    return ivf_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        n_centroids=_IVF_CELLS,
        k=5,
        n_probe=2,
    )


def _simhash_sql() -> str:
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h32 >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(32)
    )
    bits = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(32))
    return f"""
    toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h32 FROM toks),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes)
    """


@register(
    "dedup_simhash",
    f"WITH {_simhash_sql()} SELECT doc_id, simhash FROM sig",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash: explode tokens (narrow) → one groupBy
    with 32 ±1 votes → bit recombination. One shuffle on doc_id."""
    from .operators.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs)


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_simhash_sql()},
    banded AS (
      SELECT doc_id, simhash, band, (simhash >> (8*band)) & 255 AS key
      FROM sig, (SELECT unnest([0,1,2,3]) AS band)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, banded: hamming ≤ 3 pairs must agree on ≥1
    of 4 signature bytes (pigeonhole), so an equi-join on (band, byte)
    finds all of them — never an all-pairs scan."""
    from .operators.dedup import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = simhash_near_pairs(docs, max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS l FROM toks),
    ex AS (SELECT doc_id, len(l) AS n_shingles,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_shingles AS n_a, b.n_shingles AS n_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.shash = b.shash AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, n_inter, n_a, n_b,
           CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)
             AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram Jaccard over inverted-index candidates: docs sharing a
    shingle meet in an equi-join on the shingle; intersection counts come
    from the join, union from per-doc counts. Never quadratic."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8)


# ---- similarity search ----------------------------------------------------

_D_FLAT = f"""
    flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                    unnest(embedding) AS v
             FROM embeddings),
    norms AS (SELECT vec_id,
                SUM(CAST(floor(CAST(v AS DOUBLE)*CAST(v AS DOUBLE)*{_FIXED})
                    AS BIGINT)) AS n
              FROM flat GROUP BY vec_id)
"""


@register(
    "sim_topk_bruteforce",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 10
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: small query set broadcast against the corpus,
    in-row fixed-point cosine (one codegen'd expression, no explode), then
    per-query top-k window. Corpus side streams — scales to any size."""
    from .operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


def _lsh_bucket_sql(n_planes: int = 4, dims: int = 64) -> str:
    """Bucket id per vec — mirrors functions/vectors.py lsh_bucket."""
    return f"""
    planes AS (
      SELECT p, d,
        ((CAST(1103515245 AS BIGINT) * (p*{dims} + d) + 12345) % 2147483648)
          / 2147483648.0 - 0.5 AS pv
      FROM (SELECT unnest(generate_series(0, {n_planes - 1})) AS p),
           (SELECT unnest(generate_series(0, {dims - 1})) AS d)),
    projs AS (
      SELECT f.vec_id, pl.p,
        SUM(CAST(floor(CAST(f.v AS DOUBLE) * pl.pv * {_FIXED}) AS BIGINT)) AS proj
      FROM flat f JOIN planes pl ON pl.d = f.pos - 1
      GROUP BY 1, 2),
    buckets AS (
      SELECT vec_id,
        SUM(CASE WHEN proj >= 0 THEN (1 << p) ELSE 0 END) AS bucket
      FROM projs GROUP BY vec_id)
    """


@register(
    "sim_topk_lsh_bucketed",
    f"""
    WITH {_D_FLAT},
    {_lsh_bucket_sql()},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q
      JOIN buckets bq ON bq.vec_id = q.vec_id
      JOIN buckets bc ON bc.bucket = bq.bucket
      JOIN flat c ON c.vec_id = bc.vec_id AND q.pos = c.pos
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: sign-random-projection buckets (deterministic LCG
    hyperplanes) make candidate generation an equi-join on bucket id —
    per-query work divided by 2^planes, recall < 1 by design."""
    from .operators.similarity import lsh_bucketed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = lsh_bucketed_topk(
        emb.filter(F.col("vec_id") < 10), emb, dims=64, n_planes=4, k=5
    )
    return out.select("query_id", "neighbor_id", "cos_sim", "rank")


@register(
    "sim_recall_at_k",
    f"""
    WITH {_D_FLAT},
    {_lsh_bucket_sql()},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 10
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= 5),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                 ORDER BY s.cos_sim DESC, s.neighbor_id) AS rn
        FROM scored s
        JOIN buckets bq ON bq.vec_id = s.query_id
        JOIN buckets bc ON bc.vec_id = s.neighbor_id
          AND bc.bucket = bq.bucket)
      WHERE rn <= 5)
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS recall
    FROM exact e
    LEFT JOIN approx a ON a.query_id = e.query_id
      AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation IN the engine: recall@5 of the
    LSH-bucketed index against the exact brute-force baseline, per
    query — the measurement every approximate-retrieval deployment runs
    before trusting an index, here as a join of the two top-k result
    relations (ground truth LEFT JOIN approximate, hit-count per
    query). The approximate side's candidate set is the same-bucket
    subset of the exact scored relation, so the oracle shares one
    scoring CTE for both.

    Scale: both result sets are |Q|·k rows regardless of corpus size —
    the recall join is trivially bounded; evaluating a new index config
    costs one extra candidate-generation pass, not a second corpus
    scan."""
    from .operators.similarity import brute_force_topk, lsh_bucketed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    approx = lsh_bucketed_topk(q, emb, dims=64, n_planes=4, k=5).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    return (
        exact.join(
            approx,
            (exact.query_id == F.col("aq"))
            & (exact.neighbor_id == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("an").alias("n_hit"),
            (
                F.count("an").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


@register(
    "sim_embedding_near_dup",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nsq FROM q)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.qv, b.qv) / sqrt(a.nsq * b.nsq) AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.qv, b.qv) / sqrt(a.nsq * b.nsq) >= 0.45
    """,
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via quantize-once + block-tiled
    dense matmul (operators/similarity.py): hash blocks packed flat, a
    distributed block-pair equi-join, one exact dgemm per pair. Integer
    dots ≪ 2^53 are exact in float64 BLAS, numpy int64, AND DuckDB's
    double-accumulating list_dot_product, so the engines agree
    bit-for-bit."""
    from .operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.45)


def _kcenter_step(i: int) -> str:
    """One unrolled k-center greedy step as DuckDB CTEs: pick the
    smallest-penalty untaken vector (ties → min vec_id), then fold
    cos(·, pick) into every penalty with GREATEST — the incremental
    identity pen_i(c) = max(pen_{i-1}(c), cos(c, pick_i))."""
    prev = f"st{i - 1}"
    picked_prev = f"picked{i - 1}"
    not_taken = (
        f"WHERE vec_id NOT IN (SELECT vid FROM {picked_prev})"
        if i > 1
        else ""
    )
    picked_def = (
        f"SELECT vid FROM {picked_prev} UNION ALL SELECT vid FROM p{i}"
        if i > 1
        else f"SELECT vid FROM p{i}"
    )
    return f"""
    p{i} AS MATERIALIZED (SELECT vec_id AS vid, pen AS ppen FROM {prev}
             {not_taken}
             ORDER BY pen ASC, vec_id ASC LIMIT 1),
    picked{i} AS ({picked_def}),
    d{i} AS MATERIALIZED (
      SELECT f.vec_id,
             SUM(CAST(floor(CAST(f.v AS DOUBLE)*CAST(g.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat f CROSS JOIN p{i}
      JOIN flat g ON g.pos = f.pos AND g.vec_id = p{i}.vid
      GROUP BY f.vec_id),
    st{i} AS MATERIALIZED (
      SELECT s.vec_id,
             GREATEST(s.pen,
               (d{i}.d / {_FIXED})
                 / sqrt((na.n / {_FIXED}) * (nb.n / {_FIXED}))) AS pen
      FROM {prev} s
      JOIN d{i} ON d{i}.vec_id = s.vec_id
      JOIN norms na ON na.vec_id = s.vec_id
      CROSS JOIN p{i}
      JOIN norms nb ON nb.vec_id = p{i}.vid)"""


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
    from .operators.similarity import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=6)


def _mmr_step(k: int) -> str:
    """One unrolled MMR greedy step as DuckDB CTEs: penalty = max sim to
    the selected-so-far set, score = 0.75·rel − 0.25·penalty, argmax per
    query with cid tiebreak. λ = 0.75 on purpose: both 0.75 and 0.25 are
    exact dyadic doubles, so the λ-arithmetic is bit-identical in every
    engine (0.7/0.3 would round differently from 1−λ)."""
    prev_sel = f"sel{k - 1}"
    return f"""
    pen{k} AS (
      SELECT p.query_id, p.c1, MAX(p.sim) AS pen
      FROM pair p JOIN {prev_sel} s
        ON p.query_id = s.query_id AND p.c2 = s.cid
      GROUP BY p.query_id, p.c1),
    s{k}_sc AS (
      SELECT c.query_id, c.neighbor_id AS cid,
             0.75 * c.rel - 0.25 * p.pen AS score
      FROM cand c JOIN pen{k} p
        ON p.query_id = c.query_id AND p.c1 = c.neighbor_id
      WHERE NOT EXISTS (SELECT 1 FROM {prev_sel} s
                        WHERE s.query_id = c.query_id
                          AND s.cid = c.neighbor_id)),
    s{k} AS (
      SELECT query_id, cid, score, {k} AS position FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, cid) AS rn
        FROM s{k}_sc) WHERE rn = 1),
    sel{k} AS (SELECT query_id, cid FROM {prev_sel}
               UNION ALL SELECT query_id, cid FROM s{k})"""


@register(
    "sim_diversify_mmr",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 5
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, cos_sim AS rel FROM (
        SELECT query_id, neighbor_id,
               (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
                 AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
                   DESC, neighbor_id) AS rn
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id)
      WHERE rn <= 20),
    cids AS (SELECT DISTINCT neighbor_id AS cid FROM cand),
    flatc AS (SELECT f.* FROM flat f JOIN cids ON f.vec_id = cids.cid),
    pd AS (
      SELECT x.vec_id AS c1, y.vec_id AS c2,
             SUM(CAST(floor(CAST(x.v AS DOUBLE)*CAST(y.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flatc x JOIN flatc y ON x.pos = y.pos AND x.vec_id <> y.vec_id
      GROUP BY 1, 2),
    pair AS (
      SELECT a.query_id, a.neighbor_id AS c1, b.neighbor_id AS c2,
             (pd.d / {_FIXED}) / sqrt((n1.n / {_FIXED}) * (n2.n / {_FIXED}))
               AS sim
      FROM cand a JOIN cand b ON a.query_id = b.query_id
        AND a.neighbor_id <> b.neighbor_id
      JOIN pd ON pd.c1 = a.neighbor_id AND pd.c2 = b.neighbor_id
      JOIN norms n1 ON n1.vec_id = a.neighbor_id
      JOIN norms n2 ON n2.vec_id = b.neighbor_id),
    s1 AS (
      SELECT query_id, cid, score, 1 AS position FROM (
        SELECT query_id, neighbor_id AS cid, 0.75 * rel AS score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY 0.75 * rel DESC, neighbor_id) AS rn
        FROM cand) WHERE rn = 1),
    sel1 AS (SELECT query_id, cid FROM s1),
    {_mmr_step(2)},
    {_mmr_step(3)},
    {_mmr_step(4)},
    {_mmr_step(5)}
    SELECT query_id, CAST(position AS INTEGER) AS position,
           cid AS neighbor_id, score
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
          UNION ALL SELECT * FROM s5)
    """,
)
def sim_diversify_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval
    (operators/similarity.py:mmr_rerank): top-20 exact candidates per
    query (vec_id < 5), then 5 greedy unrolled selection steps —
    score = 0.75·rel − 0.25·max-sim-to-selected. The diversity-aware
    selection layer retrieval and few-shot-example pickers put on top
    of ANN, here as pure relational algebra: each step is a bounded
    argmax window over the O(k²) candidate-pair relation."""
    from .operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        mmr_rerank(
            emb.filter(F.col("vec_id") < 5),
            emb,
            k_candidates=20,
            k_select=5,
            lam=0.75,
        )
        .select(
            "query_id",
            F.col("position").cast("int").alias("position"),
            "neighbor_id",
            "score",
        )
    )


@register(
    "sim_mutual_knn",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             SUM(CAST(floor(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat a JOIN flat b ON a.pos = b.pos
      WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
      GROUP BY 1, 2),
    scored AS (
      SELECT vec_a, vec_b,
             (d / {_FIXED}) / sqrt((na.n / {_FIXED}) * (nb.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms na ON na.vec_id = vec_a
      JOIN norms nb ON nb.vec_id = vec_b),
    ranked AS (
      SELECT vec_a, vec_b, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_a
               ORDER BY cos_sim DESC, vec_b) AS r_ab,
             ROW_NUMBER() OVER (PARTITION BY vec_b
               ORDER BY cos_sim DESC, vec_a) AS r_ba
      FROM scored),
    suma AS (
      SELECT vec_a,
             MAX(CASE WHEN r_ab = 1 THEN cos_sim END)
           + MAX(CASE WHEN r_ab = 2 THEN cos_sim END)
           + MAX(CASE WHEN r_ab = 3 THEN cos_sim END)
           + MAX(CASE WHEN r_ab = 4 THEN cos_sim END) AS s_a
      FROM ranked GROUP BY vec_a),
    sumb AS (
      SELECT vec_b,
             MAX(CASE WHEN r_ba = 1 THEN cos_sim END)
           + MAX(CASE WHEN r_ba = 2 THEN cos_sim END)
           + MAX(CASE WHEN r_ba = 3 THEN cos_sim END)
           + MAX(CASE WHEN r_ba = 4 THEN cos_sim END) AS s_b
      FROM ranked GROUP BY vec_b)
    SELECT r.vec_a, r.vec_b, r.cos_sim,
           (8.0 * r.cos_sim) / (s_a + s_b) AS margin
    FROM ranked r
    JOIN suma USING (vec_a) JOIN sumb USING (vec_b)
    WHERE r.r_ab = 1 AND r.r_ba = 1
    """,
)
def sim_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mutual-nearest-neighbor mining between two embedding
    sets (even vec_ids vs odd — the two "languages"): the bitext-mining /
    cross-corpus alignment primitive (operators/similarity.py:
    mutual_knn_margin). Every pair is scored once with the fixed-point
    cosine, ranked by two windows over the same relation, and a pair
    survives iff each member is the other's top-1; the ratio margin
    2k·cos / (Σ top-k cos each side) demotes hub vectors. The top-k sums
    are rank-pivoted fixed expression trees, not float SUM()s, so both
    engines add identical doubles in identical order."""
    from .operators.similarity import mutual_knn_margin

    emb = load_table(spark, sf_dir, "embeddings")
    return mutual_knn_margin(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
    )


# ---- text analysis --------------------------------------------------------

_SW = {  # must stay identical to functions/text.py STOPWORDS
    "en": "['the','of','and','to','in','a','is','that','it','was']",
    "es": "['el','la','de','que','y','en','un','una','es','los']",
    "de": "['der','die','das','und','ist','von','mit','den','ein','zu']",
    "fr": "['le','les','des','et','est','dans','une','du','au','pour']",
}


@register(
    "text_lang_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_D_TOKS} AS t FROM documents),
    scores AS (SELECT doc_id, lang,
        len(list_intersect(t, {_SW['en']})) AS s_en,
        len(list_intersect(t, {_SW['es']})) AS s_es,
        len(list_intersect(t, {_SW['de']})) AS s_de,
        len(list_intersect(t, {_SW['fr']})) AS s_fr
      FROM toks)
    SELECT doc_id, lang AS lang_label,
      CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
           WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
           WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
           WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
           ELSE 'fr' END AS lang_pred,
      CAST(s_en AS INTEGER) AS s_en, CAST(s_es AS INTEGER) AS s_es,
      CAST(s_de AS INTEGER) AS s_de, CAST(s_fr AS INTEGER) AS s_fr
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: distinct-stopword hits per language, argmax
    with deterministic tiebreak. Pure column expressions — no shuffle."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    scores = TX.lang_scores(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        TX.lang_id(toks).alias("lang_pred"),
        *[scores[lang].alias(f"s_{lang}") for lang in ("en", "es", "de", "fr")],
    )


@register(
    "text_langid_eval",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_D_TOKS} AS t FROM documents),
    scores AS (SELECT doc_id, lang,
        len(list_intersect(t, {_SW['en']})) AS s_en,
        len(list_intersect(t, {_SW['es']})) AS s_es,
        len(list_intersect(t, {_SW['de']})) AS s_de,
        len(list_intersect(t, {_SW['fr']})) AS s_fr
      FROM toks),
    pred AS (
      SELECT lang AS lang_label,
        CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
             WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
             WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
             WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM scores)
    SELECT lang_label, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang_label = lang_pred THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY lang_label, lang_pred
    """,
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CLASSIFIER EVALUATION: the confusion matrix of
    text_lang_id's prediction against the labeled lang — the companion
    of sim_recall_at_k for the text side (an in-engine eval of an
    in-engine model; zh has no stopword list by design, so its row
    shows exactly where the classifier is blind — the honest eval a
    model card needs). One row-local prediction + one (label, pred)
    keyed agg; n_correct is the diagonal indicator summed in-group."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    pred = docs.select(
        F.col("lang").alias("lang_label"),
        TX.lang_id(toks).alias("lang_pred"),
    )
    return pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("lang_label") == F.col("lang_pred"), 1).otherwise(0)
        ).alias("n_correct"),
    )


_FILL_BUDGET = 5000  # global token budget for the fill query


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
    from .functions import text as TX

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
    "text_quality_score",
    f"""
    WITH toks AS (SELECT doc_id, text, {_D_TOKS} AS t FROM documents),
    c AS (SELECT doc_id,
        CAST(len(t) AS INTEGER) AS n_tokens,
        CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
        CAST(LENGTH(text) - (len(t) - 1) AS DOUBLE) / CAST(len(t) AS DOUBLE)
          AS mean_word_len,
        CAST(len(list_filter(t, x -> list_contains({_SW['en']}, x))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) AS stopword_ratio
      FROM toks)
    SELECT doc_id, n_tokens, alpha_ratio, mean_word_len, stopword_ratio,
      (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END
       + CASE WHEN alpha_ratio >= 0.6 THEN 1 ELSE 0 END
       + CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END
       + CASE WHEN stopword_ratio > 0.0 THEN 1 ELSE 0 END) AS quality
    FROM c
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates: integer score of passed checks plus the
    underlying ratios (each one IEEE division on exact integers)."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    checks = TX.quality_checks(F.col("text"), toks)
    return docs.select(
        "doc_id",
        checks["n_tokens"].alias("n_tokens"),
        checks["alpha_ratio"].alias("alpha_ratio"),
        checks["mean_word_len"].alias("mean_word_len"),
        checks["stopword_ratio"].alias("stopword_ratio"),
        TX.quality_score(F.col("text"), toks).alias("quality"),
    )


@register(
    "text_token_counts",
    rf"""
    SELECT doc_id,
      CAST(len({_D_TOKS}) AS INTEGER) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
           AS INTEGER) AS bpe_tokens,
      CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
      n_chars
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single symbols)."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).alias("ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        "n_chars",
    )


@register(
    "text_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, text, {_D_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_D_SHINGLES}) AS s FROM toks)
    SELECT t.doc_id, md5({_D_NORM}) AS fingerprint, m.min_shingle_hash
    FROM toks t JOIN (
      SELECT doc_id, MIN(md5(s)) AS min_shingle_hash FROM sh GROUP BY doc_id
    ) m ON m.doc_id = t.doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash + winnowing-style
    min-shingle hash (the k=1 MinHash). Both are row-local (array_min
    over the in-row shingle array) — no explode, no groupBy, no join:
    the whole query is one narrow scan-project stage."""
    from .functions import text as TX

    from .sources.tables import widen

    docs = widen(load_table(spark, sf_dir, "documents"))
    toks = TX.tokens(F.col("text"))
    sh = TX.word_shingles(toks, 3)
    return docs.filter(F.size(sh) > 0).select(
        "doc_id",
        TX.content_fingerprint(F.col("text")).alias("fingerprint"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_hash"),
    )


@register(
    "text_udtf_bigrams",
    rf"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents)
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, len(t)-1),
                                 i -> CAST(i AS INTEGER))) AS pos,
           UNNEST(list_transform(generate_series(1, len(t)-1),
                                 i -> concat_ws(' ', t[i], t[i+1]))) AS bigram
    FROM toks
    """,
)
def text_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): one input row → N output rows via a
    lateral table function. Tokenization matches functions/text.py:tokens
    (lowercase, trim, whitespace split). UDTFs are the row-expanding UDF
    tier — here only to pin the API; the same result native is
    posexplode over word_shingles(toks, 2), which is what a hot path
    should use. Arrow-optimized eval keeps the Python transfer batched."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramUDTF:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = text.lower().strip().split()
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigram_udtf", BigramUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM _udtf_docs d, LATERAL bigram_udtf(d.doc_id, d.text) b"
    )


@register(
    "q_scalar_bitwise",
    """
    SELECT event_id,
           CAST(bit_count(event_id) AS INTEGER) AS bits,
           xor(event_id, 255) AS x,
           event_id & 4095 AS a,
           event_id | 15 AS o,
           event_id << 2 AS shl,
           event_id >> 3 AS shr
    FROM events
    """,
)
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (bit_count / xor / and / or / shifts) —
    integer-exact on both engines; narrow, codegen'd projection."""
    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        F.bit_count(e).cast("int").alias("bits"),
        e.bitwiseXOR(F.lit(255)).alias("x"),
        e.bitwiseAND(F.lit(4095)).alias("a"),
        e.bitwiseOR(F.lit(15)).alias("o"),
        F.shiftleft(e, 2).alias("shl"),
        F.shiftright(e, 3).alias("shr"),
    )


@register(
    "q_unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
    """,
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): one Generate per row expands the measure
    columns — narrow, no shuffle, and the scan reads each source column
    once (vs the UNION ALL formulation's three scans, which is how the
    oracle spells it)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn(
        "measure", F.expr("substring(measure, 3)")  # l_quantity → quantity
    )


@register(
    "q_json_corrupt_capture",
    """
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN substring(props, 1, 3)
                  ELSE props END AS payload
      FROM events)
    SELECT event_id,
           json_valid(payload) AS ok,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract(payload, '$.k') AS INTEGER) END AS k
    FROM raw
    """,
)
def q_json_corrupt_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-style failure capture on the JSON tier (the decode stage's
    idiom, §2.1 #2, applied to semi-structured ingestion): a
    deterministically-corrupted payload parses to NULL variant instead
    of failing the job — ok flag + typed field in one narrow pass, bad
    records quarantined by a filter instead of a crashed stage."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 7 == 0, F.substring("props", 1, 3)
    ).otherwise(F.col("props"))
    v = F.try_parse_json(payload)
    return ev.select(
        "event_id",
        v.isNotNull().alias("ok"),
        F.try_variant_get(v, "$.k", "int").alias("k"),
    )


@register(
    "dedup_url_canonical",
    """
    WITH u AS (
      SELECT doc_id,
             concat('https://shard', CAST(doc_id % 5 AS VARCHAR),
                    '.example.com/docs/', CAST(doc_id % 50 AS VARCHAR),
                    '?session=', CAST(doc_id AS VARCHAR)) AS url
      FROM documents),
    c AS (
      SELECT doc_id,
             regexp_extract(url, '^([a-z]+://[^?#]+)', 1) AS canonical
      FROM u)
    SELECT canonical, COUNT(*) AS n_urls, MIN(doc_id) AS keep_doc
    FROM c GROUP BY canonical
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (web-crawl staple): strip the query/
    fragment (session ids, tracking params), group by the canonical form,
    keep the first-seen doc. One narrow projection + one hash agg; the
    canonical key is what a crawl dedup shuffles on at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://shard"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?session="),
        F.col("doc_id").cast("string"),
    )
    canonical = F.concat(
        F.lit("https://"),
        F.parse_url(url, F.lit("HOST")),
        F.parse_url(url, F.lit("PATH")),
    )
    return (
        docs.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("doc_id").alias("keep_doc"),
        )
    )


@register(
    "q_histogram",
    """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           CAST(floor(value / 25.0) * 25.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bucket_sum
    FROM events GROUP BY 1, 2
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (distribution audit): one scan, one hash agg
    on the bucket key. floor(x/25) on doubles is exact for these
    magnitudes; the per-bucket sum follows the decimal contract."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25.0)
    return ev.groupBy(
        bucket.alias("bucket"),
        (bucket * 25.0).cast("double").alias("bucket_lo"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value")).alias("bucket_sum"),
    )


@register(
    "q_data_profile",
    """
    SELECT 'value' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(value) AS n_non_null,
           COUNT(DISTINCT value) AS n_distinct,
           CAST(MIN(value) AS DOUBLE) AS min_v,
           CAST(MAX(value) AS DOUBLE) AS max_v
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(user_id), COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
    FROM events
    """,
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the audit step before any training run): per-
    column row/null/distinct counts and range, computed for ALL profiled
    columns in ONE scan — each metric set is an aggregate over the same
    pass (the oracle spells it as a UNION of scans; Spark computes every
    aggregate together then unpivots the single result row, which is the
    only shape worth running over 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
        F.count("user_id").alias("nn_user"),
        F.countDistinct("user_id").alias("nd_user"),
        F.min("user_id").cast("double").alias("min_user"),
        F.max("user_id").cast("double").alias("max_user"),
    )
    per_col = F.array(
        F.struct(
            F.lit("value").alias("col_name"),
            F.col("n").alias("n_rows"),
            F.col("nn_value").alias("n_non_null"),
            F.col("nd_value").alias("n_distinct"),
            F.col("min_value").alias("min_v"),
            F.col("max_value").alias("max_v"),
        ),
        F.struct(
            F.lit("user_id").alias("col_name"),
            F.col("n").alias("n_rows"),
            F.col("nn_user").alias("n_non_null"),
            F.col("nd_user").alias("n_distinct"),
            F.col("min_user").alias("min_v"),
            F.col("max_user").alias("max_v"),
        ),
    )
    return agg.select(F.explode(per_col).alias("p")).select("p.*")


@register(
    "text_vocab_coverage",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok LIMIT 100),
    cover AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS in_vocab
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(in_vocab AS BIGINT) AS in_vocab,
           CAST(in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
    FROM cover
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + apply (tokenizer-prep shape): global top-100
    token vocabulary (corpus-wide agg), then per-doc OOV/coverage via a
    broadcast of the BOUNDED vocab against the exploded token stream.
    The global stats → per-row apply round trip is the pattern every
    tokenizer/normalizer pipeline runs; only the fixed-size vocab ever
    moves, the corpus shuffles once for the frequency agg."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(100)
        .select("tok", F.lit(True).alias("__v"))
    )
    cover = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v"), 1).otherwise(0)).alias("in_vocab"),
        )
    )
    return cover.select(
        "doc_id",
        "n_tokens",
        "in_vocab",
        (F.col("in_vocab").cast("double") / F.col("n_tokens").cast("double")).alias(
            "coverage"
        ),
    )


@register(
    "text_contamination",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_D_SHINGLES}) AS shingle FROM t),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
    hits AS (
      SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS shared_shingles
      FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE s.doc_id >= 10
      GROUP BY s.doc_id)
    SELECT doc_id, CAST(shared_shingles AS BIGINT) AS shared_shingles
    FROM hits
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check (benchmark-leakage audit): flag
    training docs sharing any 3-gram shingle with the eval set (doc_id <
    10 here). The eval shingle set is BOUNDED → broadcast semi-join
    against the training shingle stream — one pass over the corpus, no
    all-pairs. The production shape for 'did my training data see the
    test set'."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens(F.col("text")), 3)).alias("shingle"),
    )
    eval_sh = (
        sh.filter(F.col("doc_id") < 10).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("shared_shingles"))
    )


@register(
    "text_tfidf_topterms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    ranked AS (
      SELECT t.doc_id, t.tok, t.tf, d.df,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf DESC, d.df ASC, t.tok ASC) AS rnk
      FROM tf t JOIN df d ON t.tok = d.tok)
    SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per document, TF-IDF shape: term frequency from
    a (doc, token) agg, document frequency from a vocab-sized re-agg of
    the SAME tf table (no second corpus scan), equi-join tf x df on the
    token, rank within each doc. Rank order (tf DESC, df ASC, tok) is the
    pure-integer stand-in for tf*ln(N/df) — ln() is not correctly-rounded
    IEEE so its last bit differs across engines; the integer sort key is
    bit-stable everywhere and preserves the 'frequent here, rare
    globally' semantics. Scale: df is vocab-sized (sublinear); the tf-df
    join shuffles on the token key where stopword skew is AQE-split; the
    final rank shuffles by doc_id."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    # tf feeds BOTH the df re-agg and the final join; without
    # materialization Spark recomputes the whole scan+explode+agg per
    # consumer (verified: no exchange/stage reuse even under AQE —
    # post-agg tf is the small relation, so one localCheckpoint beats
    # two corpus tokenization passes).
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("tok")
    )
    return (
        tf.join(dfreq, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "df", "rnk")
    )


@register(
    "text_token_rarity",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
    r AS (SELECT f.tok,
                 CAST(FLOOR(1000000.0 * CAST(t.total AS DOUBLE)
                            / CAST(f.cnt AS DOUBLE)) AS BIGINT) AS rarity
          FROM freq f CROSS JOIN tot t),
    per_doc AS (
      SELECT tk.doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(r.rarity) AS BIGINT) AS rarity_sum
      FROM toks tk JOIN r ON tk.tok = r.tok
      GROUP BY tk.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, rarity_sum,
           CAST(rarity_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             / 1000000.0 AS mean_rarity
    FROM per_doc
    """,
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (CCNet shape): build corpus-wide token
    frequencies, score each doc by its mean inverse token frequency —
    rare-token-heavy docs score high, boilerplate scores low. The exact
    stand-in for mean unigram log-prob: ln() differs across engines in
    the last ULP, while FLOOR(1e6 * total/cnt) is one correctly-rounded
    IEEE divide + floor, so the per-token rarity is an exact integer and
    per-doc sums are order-independent. Scale: the LM 'model' (freq) is
    vocab-sized; the apply step is a corpus x vocab equi-join on the
    token (AQE handles stopword skew), then one doc-keyed agg."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    per_doc = TX.token_rarity_scores(docs, scale=1_000_000)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "rarity_sum",
        (
            F.col("rarity_sum").cast("double")
            / F.col("n_tokens").cast("double")
            / F.lit(1000000.0)
        ).alias("mean_rarity"),
    )


@register(
    "text_duplicate_ngrams",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    g AS (SELECT doc_id,
                 unnest(CASE WHEN len(t) >= 5 THEN
                   list_transform(generate_series(1, len(t) - 4),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))
                 ELSE CAST([] AS VARCHAR[]) END) AS ng
          FROM t)
    SELECT ng, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY ng
    ORDER BY n DESC, ng LIMIT 20
    """,
)
def text_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-substring audit (the aggregate view of
    'Deduplicating Training Data Makes LMs Better': which exact 5-gram
    spans recur most, and across how many documents). One explode + one
    hash agg + bounded top-k — the shuffle keys are the n-grams
    themselves, map-side partial aggregation collapses the hot ones, and
    TakeOrderedAndProject keeps only 20 rows per partition. The full
    suffix-array approach finds arbitrary-length spans; fixed-length
    n-gram counting is its bounded-memory streaming approximation."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens(F.col("text")), 5)).alias("ng"),
    )
    return (
        g.groupBy("ng")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), F.asc("ng"))
        .limit(20)
    )


@register(
    "text_chunk_overlap",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    n AS (SELECT doc_id, t, len(t) AS n_toks,
                 ((greatest(len(t) - 32, 0) + 23) // 24) + 1 AS n_chunks
          FROM t),
    c AS (SELECT doc_id, t, n_toks,
                 unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
          FROM n)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32))
                AS INTEGER) AS chunk_tokens,
           array_to_string(
             list_slice(t, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')
             AS chunk_text
    FROM c
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 32, stride 24 — the
    embedding/pretraining chunker: every token is covered, consecutive
    chunks share 8 tokens of context). The token array is built ONCE per
    row (let-bound), the chunk count is a closed-form integer, and the
    explode emits only index rows — each chunk then slices the bound
    array, so work is O(total chunk tokens), with no re-tokenization per
    chunk and no shuffle at all: the whole operator is a narrow
    Generate + Project at any corpus size."""
    from .functions import exprs as EX
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    size, stride = 32, 24

    def chunks(t: F.Column) -> F.Column:
        n_chunks = (
            (F.greatest(F.size(t) - size, F.lit(0)) + (stride - 1))
            .cast("long")
            / stride
        ).cast("long") + 1
        return F.struct(
            t.alias("t"), F.sequence(F.lit(0), n_chunks - 1).alias("idx")
        )

    b = docs.select(
        "doc_id", EX.bind(TX.tokens(F.col("text")), chunks).alias("s")
    ).select("doc_id", F.col("s.t").alias("t"), F.explode("s.idx").alias("chunk_idx"))
    sliced = F.slice(F.col("t"), F.col("chunk_idx") * stride + 1, size)
    return b.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sliced).alias("chunk_tokens"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    )


@register(
    "text_repetition_ratio",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks,
                  CASE WHEN len(toks) >= 2 THEN
                    list_transform(generate_series(1, len(toks) - 1),
                                   i -> concat_ws(' ', toks[i], toks[i+1]))
                  ELSE CAST([] AS VARCHAR[]) END AS bigrams
           FROM t)
    SELECT doc_id,
           CAST(len(bigrams) AS INTEGER) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS INTEGER) AS n_distinct,
           CASE WHEN len(bigrams) > 0
                THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                           / CAST(len(bigrams) AS DOUBLE)
                ELSE 0.0 END AS rep_ratio
    FROM bg
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher/C4-style quality gate): share
    of duplicate bigrams per doc. Row-local HOFs only — bigrams never
    explode into rows, so the operator is a narrow codegen'd projection
    at any corpus size. The ratio divides identical exact integers on
    both engines, so the doubles are bit-identical."""
    from .functions import exprs as EX
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")

    def body(toks: F.Column) -> F.Column:
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            F.size(bigrams).alias("n_bigrams"),
            F.size(F.array_distinct(bigrams)).alias("n_distinct"),
        )

    c = EX.bind(TX.tokens(F.col("text")), body)
    n_bg = c["n_bigrams"]
    n_d = c["n_distinct"]
    ratio = F.when(
        n_bg > 0,
        F.lit(1.0) - n_d.cast("double") / n_bg.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_bg.alias("n_bigrams"),
        n_d.alias("n_distinct"),
        ratio.alias("rep_ratio"),
    )


@register(
    "text_redact",
    r"""
    WITH t AS (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com ref ', CAST(doc_id * 7919 + 100003 AS VARCHAR))
               AS annotated
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(annotated,
                '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+')) AS INTEGER) AS n_emails,
           regexp_replace(
             regexp_replace(annotated,
                            '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+', '<EMAIL>', 'g'),
             '[0-9]{4,}', '<NUM>', 'g') AS redacted
    FROM t
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction (training-data scrubbing): regex masking of
    emails and long digit runs, plus a match count — one narrow
    projection, JVM regex, no Python. The corpus carries no natural PII,
    so a deterministic synthetic annotation is appended first (the
    redaction path itself is what's under test). Note DuckDB needs the
    'g' flag to match Spark's replace-all semantics."""
    docs = load_table(spark, sf_dir, "documents")
    annotated = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919 + 100003).cast("string"),
    )
    email_re = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
    return docs.select(
        "doc_id",
        F.regexp_count(annotated, F.lit(email_re)).cast("int").alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace(annotated, email_re, "<EMAIL>"),
            r"[0-9]{4,}",
            "<NUM>",
        ).alias("redacted"),
    )


@register(
    "q_scalar_url",
    r"""
    WITH u AS (
      SELECT doc_id,
             concat('https://shard', CAST(doc_id % 5 AS VARCHAR),
                    '.example.com/docs/', CAST(doc_id AS VARCHAR),
                    '?lang=en&rev=', CAST(doc_id % 7 AS VARCHAR)) AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]rev=([^&]*)', 1) AS rev,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (web-scrape pipeline staple): host / path /
    query-param / protocol extraction with Spark's parse_url — a JVM
    built-in the oracle mirrors with anchored regexes. Deterministic
    synthetic URLs (corpus has none); one narrow projection."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://shard"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang=en&rev="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("rev")).alias("rev"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "q_scalar_array",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           COALESCE(array_to_string(list_sort(list_distinct(toks))[1:5],
                                    '|'), '') AS uniq5,
           list_contains(toks, 'the') AS has_the,
           COALESCE(array_to_string(list_sort(list_intersect(
                    list_distinct(toks), ['the', 'of', 'and'])), '|'), '')
             AS sw_hits,
           array_to_string(toks[1:3], '|') AS first3
    FROM t
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar family (size / sort / distinct / slice / contains /
    intersect / join-to-string) — all JVM built-ins in one narrow
    projection. Engine-divergence traps handled: array_distinct keeps
    first-occurrence order in Spark but is unordered in DuckDB, so every
    distinct/intersect result is sorted before comparison. Array-valued
    results are serialized with array_join (r8): the driver's pandas
    canonicalizer cannot sort/hash list cells, so every top-level output
    column must be scalar (CORRECTNESS_r07 q_scalar_array err)."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    uniq = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_join(F.slice(uniq, 1, 5), "|").alias("uniq5"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(
            F.array_sort(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(F.lit("the"), F.lit("of"), F.lit("and")),
                )
            ),
            "|",
        ).alias("sw_hits"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
    )


@register(
    "q_scalar_hof",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents)
    SELECT doc_id,
           COALESCE(array_to_string(list_transform(toks,
                    x -> CAST(length(x) AS VARCHAR)), '|'), '') AS lens,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER)
             AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS tot_chars,
           CAST(list_sum(list_transform(generate_series(1, len(toks)),
                                        i -> length(toks[i]) * i)) AS BIGINT)
             AS pos_weighted
    FROM t
    """,
)
def q_scalar_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function family (transform / filter / aggregate /
    index-aware lambda) — array pipelines stay in one codegen'd
    projection instead of explode→agg round trips (no Generate, no
    shuffle). The token array is let-bound (functions/exprs.py:bind) so
    four HOFs over it evaluate the split ONCE — the HOF re-evaluation
    trap pinned in round 1. The per-token length vector is serialized
    with array_join (r8): top-level array outputs are driver-unhashable
    (CORRECTNESS_r07 q_scalar_hof err), and the oracle-type gate now
    rejects them structurally."""
    from .functions import exprs as EX
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")

    def body(toks: F.Column) -> F.Column:
        lens = F.transform(toks, lambda x: F.length(x).cast("long"))
        zero = F.lit(0).cast("long")
        add = lambda a, x: a + x  # noqa: E731
        return F.struct(
            F.array_join(
                F.transform(lens, lambda x: x.cast("string")), "|"
            ).alias("lens"),
            F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
            F.aggregate(lens, zero, add).alias("tot_chars"),
            F.aggregate(
                F.transform(toks, lambda x, i: (F.length(x) * (i + 1)).cast("long")),
                zero,
                add,
            ).alias("pos_weighted"),
        )

    packed = EX.bind(TX.tokens(F.col("text")), body)
    return docs.select(
        "doc_id",
        packed["lens"].alias("lens"),
        packed["n_long"].alias("n_long"),
        packed["tot_chars"].alias("tot_chars"),
        packed["pos_weighted"].alias("pos_weighted"),
    )


@register(
    "q_approx_distinct",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog++): the sketch VALUE is
    engine-specific so it can't be hash-compared directly — instead the
    oracle pins the INVARIANT: the approximation must land within 5% of
    the exact count (rsd=0.02 ⇒ ~2σ margin; Spark's sketch is
    deterministic for fixed data+rsd, so this is a stable boolean, not a
    flaky tolerance). At 100 TB the approx path is one narrow pass +
    fixed-size sketch merge vs the exact path's expand+two-phase agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "q_approx_quantiles",
    """
    SELECT event_type,
           COUNT(*) AS n,
           quantile_cont(user_id, 0.25) AS p25,
           quantile_cont(user_id, 0.5)  AS p50,
           quantile_cont(user_id, 0.75) AS p75,
           TRUE AS approx_in_band
    FROM events GROUP BY event_type
    """,
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch): like the HLL
    query, the sketch value is engine-specific, so the oracle pins the
    INVARIANT — the approx median must land inside the exact rank band
    [p48, p52] (accuracy=10000 ⇒ rank error ~n/10000, far inside the
    band; Spark's GK sketch is deterministic for fixed data+accuracy, so
    the boolean is stable). The exact p25/p50/p75 columns ARE
    hash-compared: binary-fraction p over an integer column keeps the
    interpolation bit-identical across engines. At 100 TB the sketch is
    a fixed-size mergeable summary per group — one narrow pass, no
    per-group sort — while exact percentiles buffer each group."""
    ev = load_table(spark, sf_dir, "events")
    ap = F.expr("approx_percentile(user_id, 0.5, 10000)")
    lo = F.expr("percentile(user_id, 0.48)")
    hi = F.expr("percentile(user_id, 0.52)")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(user_id, 0.25)").alias("p25"),
        F.expr("percentile(user_id, 0.5)").alias("p50"),
        F.expr("percentile(user_id, 0.75)").alias("p75"),
        ((ap >= lo) & (ap <= hi)).alias("approx_in_band"),
    )


@register(
    "q_nested_lines",
    """
    WITH g AS (
      SELECT l_orderkey,
             list({'l_linenumber': l_linenumber,
                   'l_quantity': CAST(l_quantity AS BIGINT)}
                  ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS lines
      FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(len(lines) AS INTEGER) AS n_lines,
           lines[1]['l_quantity'] AS first_qty,
           lines[len(lines)]['l_quantity'] AS last_qty,
           list_max(list_transform(generate_series(1, len(lines) - 1),
             i -> abs(lines[i+1]['l_quantity'] - lines[i]['l_quantity'])))
             AS max_jump
    FROM g
    """,
)
def q_nested_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data round trip: build a per-order array<struct> of line
    items (collect_list is shuffle-order-nondeterministic, so sort_array
    on the struct — lexicographic over (l_linenumber, l_quantity), which
    the oracle's ORDER BY mirrors; the synthetic line numbers are NOT
    unique per order, so the second key is load-bearing), then
    consume it with index-aware HOF lambdas (first/last element, max
    adjacent-quantity jump) without ever exploding back to rows. The
    nested column stays row-local: one shuffle for the groupBy, every
    derived value a codegen'd projection."""
    from .functions import exprs as EX

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber"),
                    F.col("l_quantity").cast("long").alias("l_quantity"),
                )
            )
        ).alias("lines")
    )

    def body(lines: F.Column) -> F.Column:
        jumps = F.transform(
            F.sequence(F.lit(1), F.size(lines) - 1),
            lambda i: F.abs(
                F.element_at(lines, i + 1)["l_quantity"]
                - F.element_at(lines, i)["l_quantity"]
            ),
        )
        return F.struct(
            F.size(lines).alias("n_lines"),
            F.element_at(lines, 1)["l_quantity"].alias("first_qty"),
            F.element_at(lines, F.size(lines))["l_quantity"].alias("last_qty"),
            # sequence(1, 0) is DESCENDING in Spark — guard single-line
            F.when(F.size(lines) >= 2, F.array_max(jumps)).alias("max_jump"),
        )

    return g.select(
        "l_orderkey", EX.bind(F.col("lines"), body).alias("s")
    ).select("l_orderkey", "s.n_lines", "s.first_qty", "s.last_qty", "s.max_jump")


@register(
    "q_funnel_stages",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id)
    SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
    UNION ALL
    SELECT 'click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → later click → later purchase):
    how many users reach each stage, where each stage must occur AT OR
    AFTER the previous stage's first occurrence. The oracle spells it as
    three scans + two joins; the Spark plan is ONE shuffle — chained
    window minimums over the same user partitioning (each select layer
    references the previous stage's windowed result; same partition spec
    ⇒ Catalyst plans one Exchange), then a per-user rollup and three
    conditional counts unpivoted to stage rows."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("v"),
        F.max("t_click").alias("c"),
        F.max("t_purchase").alias("p"),
    )
    counts = per_user.agg(
        F.count("v").alias("n_view"),
        F.count("c").alias("n_click"),
        F.count("p").alias("n_purchase"),
    )
    stages = F.array(
        F.struct(F.lit("view").alias("stage"), F.col("n_view").alias("users")),
        F.struct(
            F.lit("click_after_view").alias("stage"),
            F.col("n_click").alias("users"),
        ),
        F.struct(
            F.lit("purchase_after_click").alias("stage"),
            F.col("n_purchase").alias("users"),
        ),
    )
    return counts.select(F.explode(stages).alias("s")).select("s.*")


@register(
    "q_latest_by_key",
    """
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, event_type, value FROM r WHERE rn = 1
    """,
)
def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key compaction (the CDC/upsert-log dedup step) via
    max_by over a lexicographic (ts, event_id) struct — deliberately not
    the window row_number formulation the oracle uses. The win is
    shuffle VOLUME: partial_max_by combines map-side, so the exchange
    moves one row per key per map partition, where the window shuffles
    every input row and then sorts each partition by (key, ts, id).
    (Struct agg state isn't hash-aggregable, so the local step is a
    SortAggregate on the key alone — the cheap part; the wire is what
    matters at 100 TB.) Unique event_id tiebreak keeps both engines
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("s")
    )
    return s.select("user_id", "s.event_id", "s.event_type", "s.value")


@register(
    "q_sketch_countmin",
    """
    WITH it AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS item,
             COUNT(*) AS cnt
      FROM events GROUP BY 1),
    h AS (SELECT item, cnt,
                 ('0x' || substring(md5(CAST(item AS VARCHAR)), 1, 12))::BIGINT % 64 AS b0,
                 ('0x' || substring(md5(CAST(item AS VARCHAR)), 13, 12))::BIGINT % 64 AS b1,
                 ('0x' || substring(md5(CAST(item AS VARCHAR)), 21, 12))::BIGINT % 64 AS b2
          FROM it),
    s0 AS (SELECT b0, SUM(cnt) AS s FROM h GROUP BY b0),
    s1 AS (SELECT b1, SUM(cnt) AS s FROM h GROUP BY b1),
    s2 AS (SELECT b2, SUM(cnt) AS s FROM h GROUP BY b2)
    SELECT h.item, CAST(h.cnt AS BIGINT) AS n_exact,
           CAST(least(s0.s, s1.s, s2.s) AS BIGINT) AS est,
           least(s0.s, s1.s, s2.s) >= h.cnt AS admissible
    FROM h JOIN s0 USING (b0) JOIN s1 USING (b1) JOIN s2 USING (b2)
    """,
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=3 rows × w=64 buckets) for approximate
    frequencies — and unlike HLL/GK, the ESTIMATES are hash-compared,
    not just invariant-pinned: every CMS cell is an integer sum over
    md5-derived buckets (the same conv/'0x'-substring idiom as MinHash),
    so both engines build the identical sketch. est = min over rows of
    the item's bucket sums; `admissible` pins the CMS guarantee
    est >= exact. Scale: the sketch is built from the domain-sized item
    counts (one corpus agg), then three bucket re-aggs of that bounded
    table — raw events are touched once."""
    ev = load_table(spark, sf_dir, "events")
    # domain-sized and consumed four times (three bucket re-aggs + the
    # estimate join) — checkpoint so the raw events scan runs once
    it = (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("item")
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    digest = F.md5(F.col("item").cast("string"))
    h = it.select(
        "item",
        "cnt",
        (F.conv(F.substring(digest, 1, 12), 16, 10).cast("long") % 64).alias("b0"),
        (F.conv(F.substring(digest, 13, 12), 16, 10).cast("long") % 64).alias("b1"),
        (F.conv(F.substring(digest, 21, 12), 16, 10).cast("long") % 64).alias("b2"),
    )
    rows = [
        h.groupBy(f"b{j}").agg(F.sum("cnt").alias(f"s{j}")) for j in range(3)
    ]
    j = h.join(rows[0], "b0").join(rows[1], "b1").join(rows[2], "b2")
    est = F.least("s0", "s1", "s2")
    return j.select(
        "item",
        F.col("cnt").alias("n_exact"),
        est.alias("est"),
        (est >= F.col("cnt")).alias("admissible"),
    )


@register(
    "q_sketch_merge_hll",
    """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS approx_ok
    FROM events
    """,
)
def q_sketch_merge_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store-partials-merge-later sketch pattern (Apache
    DataSketches HLL): build one sketch per day partition, then
    hll_union_agg merges the fixed-size binaries and estimates the
    global distinct — the shape that lets a 100 TB pipeline keep
    per-partition summaries and answer corpus-wide cardinality without
    re-scanning. Sketch bytes are engine-specific, so the oracle pins
    the INVARIANT: merged estimate within 5% of exact (deterministic
    for fixed data+lgK, not a flaky tolerance)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.countDistinct("user_id").alias("nd_day"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("approx_ok"),
    )


@register(
    "q_normalize_zscore",
    """
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS ss
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           (e.value - g.s / CAST(g.n AS DOUBLE))
             / sqrt((g.ss - (g.s * g.s) / CAST(g.n AS DOUBLE))
                    / CAST(g.n - 1 AS DOUBLE)) AS z
    FROM events e JOIN g USING (event_type)
    """,
)
def q_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization — the feature-standardization
    map every ML prep pipeline applies, as a two-pass plan: group
    moments from decimal-exact sums (one map-side-combinable agg over
    the 5-value type domain, broadcast back), then a row-local
    (x−μ)/σ with a fixed IEEE expression tree (sqrt is
    correctly-rounded). The moments join is a broadcast: the stats
    table is |groups| rows, the data never shuffles.

    Scale: two narrow passes over the events scan, zero data shuffles
    — the exact shape that survives 100 TB (contrast: a window-based
    z-score shuffles every row on the group key)."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    var = (
        F.col("ss") - (F.col("s") * F.col("s")) / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    return ev.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        "value",
        ((F.col("value") - mean) / F.sqrt(var)).alias("z"),
    )


@register(
    "q_rfm_segmentation",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey),
    mx AS (SELECT MAX(last_order) AS anchor FROM base),
    scored AS (
      SELECT custkey,
             CAST(anchor - last_order AS BIGINT) AS recency_days,
             frequency, monetary
      FROM base CROSS JOIN mx),
    tiled AS (
      SELECT custkey, recency_days, frequency, monetary,
             NTILE(4) OVER (ORDER BY recency_days ASC, custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m
      FROM scored)
    SELECT custkey, recency_days, frequency, monetary,
           CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
           CAST(m AS INTEGER) AS m,
           'R' || r || 'F' || f || 'M' || m AS segment
    FROM tiled
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order,
    anchored to the corpus max date so the answer is reproducible),
    frequency, monetary (decimal-exact spend), each quartiled with
    NTILE(4) and fused into the classic 'R1F2M1' segment code. Tile 1
    is always the BEST quartile (most recent / most frequent / highest
    spend), tiebreak custkey — both engines tile identically.

    Scale: one customer-keyed agg (map-side combinable), a 1-row
    anchor broadcast, then three global NTILE windows. The global sort
    is the price of exact quantile ranks; approximate tiles at 100 TB
    would swap in percentile_approx cut points (q_histogram_equiheight
    pattern) without changing the output contract."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC_PRICE))
        .cast("double")
        .alias("monetary"),
    )
    mx = base.agg(F.max("last_order").alias("anchor"))
    scored = base.crossJoin(F.broadcast(mx)).select(
        "custkey",
        F.datediff(F.col("anchor"), F.col("last_order"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    r = F.ntile(4).over(W.orderBy(F.asc("recency_days"), F.asc("custkey")))
    f = F.ntile(4).over(W.orderBy(F.desc("frequency"), F.asc("custkey")))
    m = F.ntile(4).over(W.orderBy(F.desc("monetary"), F.asc("custkey")))
    tiled = scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        r.cast("int").alias("r"),
        f.cast("int").alias("f"),
        m.cast("int").alias("m"),
    )
    return tiled.withColumn(
        "segment",
        F.concat(
            F.lit("R"), F.col("r"), F.lit("F"), F.col("f"),
            F.lit("M"), F.col("m"),
        ),
    )


@register(
    "q_timeseries_ohlc",
    """
    WITH r AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch,
             event_type, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
               event_type ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts),
               event_type ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT bucket_epoch, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM r GROUP BY bucket_epoch, event_type
    """,
)
def q_timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (open/high/low/close per hour per event type)
    — the candlestick resample every metrics/financial pipeline runs.
    First/last are NOT min_by/max_by (tie order is engine-defined):
    both engines rank by (ts, event_id) fully deterministically and
    pivot rank-1 rows with a MAX(CASE), so open/close are exact picked
    values, and high/low are plain extrema — no float arithmetic at
    all.

    Scale: one shuffle on (hour, type) shared by the two rank windows
    and the aggregation — the bucket key is the series key, so series
    stay co-located; map-side the Expand-free plan carries only
    (bucket, type, value, ranks)."""
    ev = load_table(spark, sf_dir, "events")
    b = F.date_trunc("hour", F.col("ts"))
    wa = W.partitionBy(b, F.col("event_type")).orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = W.partitionBy(b, F.col("event_type")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.select(
        F.unix_timestamp(b).alias("bucket_epoch"),
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("bucket_epoch", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
    )


@register("streaming_ohlc", _ORACLE["q_timeseries_ohlc"])
def streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candles maintained over the EVENT stream
    (streaming/incremental.py:incremental_ohlc): the canonical
    non-commutative aggregate made mergeable by carrying the extremal
    order keys — each batch's partial holds min/max struct(ts,
    event_id, value) per candle, and the cross-batch merge is
    least/greatest of those structs, so ANY batch split (ordered or
    not) converges to the batch twin's answer. Oracle =
    q_timeseries_ohlc's exact query."""
    import tempfile

    from .streaming.incremental import incremental_ohlc

    stream = _events_stream(spark, sf_dir)
    return incremental_ohlc(
        stream.select("ts", "event_id", "event_type", "value"),
        tempfile.mkdtemp(prefix="sohlc_"),
    )


@register(
    "q_time_bucket_rollup",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_epoch,
           'hour' AS grain, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT), 'day', event_type,
           COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
    FROM events GROUP BY 1, 3
    """,
)
def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same event scan
    aggregated at hour AND day grain (the timescale/materialized-rollup
    shape) via GROUPING SETS — ONE scan, one Expand, one shuffle. The
    naive union-of-two-groupBys formulation plans as two full scans
    (Catalyst does not reuse the hour aggregation across union branches —
    verified with .explain), which is the formulation that dies at 100 TB
    of raw events; grouping sets is the single-pass plan."""
    ev = load_table(spark, sf_dir, "events")
    exp = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        "event_type",
        F.col("value").cast(DEC_PRICE).alias("v"),
    )
    agg = exp.groupingSets(
        [["h", "event_type"], ["d", "event_type"]], "h", "d", "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_dec"),
        (F.grouping("h") == 0).alias("__is_hour"),  # only valid inside agg
    )
    is_hour = F.col("__is_hour")
    return agg.select(
        F.when(is_hour, F.unix_timestamp("h"))
        .otherwise(F.unix_timestamp("d"))
        .alias("bucket_epoch"),
        F.when(is_hour, F.lit("hour")).otherwise(F.lit("day")).alias("grain"),
        "event_type",
        "n",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


@register(
    "text_pack_sequences",
    rf"""
    WITH t AS (SELECT doc_id, CAST(len({_D_TOKS}) AS BIGINT) AS n
               FROM documents),
    c AS (SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM t)
    SELECT doc_id, n AS n_tokens,
           CAST((cum - n) // 512 AS INTEGER) AS bin,
           CAST(ROW_NUMBER() OVER (PARTITION BY (cum - n) // 512
                                   ORDER BY doc_id) AS INTEGER) AS bin_pos
    FROM c
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (LLM pretraining assembly): docs in id order
    binned by exclusive token prefix-sum DIV budget. The Spark side runs
    the DISTRIBUTED scan (range-bucketed partial sums + tiny offset
    window + per-bucket windows, operators/sampling.py:pack_sequences);
    the oracle replays it as one global window — same numbers, but only
    one of the two survives 100 TB."""
    from .functions import text as TX
    from .operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn("n_tokens", F.size(TX.tokens(F.col("text"))).cast("long"))
    return pack_sequences(d, "n_tokens", budget=512, range_size=64)


@register(
    "pipeline_curate",
    rf"""
    WITH base AS (
      SELECT doc_id, text, {_D_TOKS} AS t, md5({_D_NORM}) AS fp
      FROM documents),
    dd AS (
      SELECT doc_id, text, t FROM (
        SELECT doc_id, text, t,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS dr
        FROM base) WHERE dr = 1),
    q AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n,
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
      FROM dd),
    kept AS (SELECT doc_id, n FROM q WHERE quality >= 3),
    c AS (SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM kept)
    SELECT doc_id, n AS n_tokens,
           CAST((cum - n) // 512 AS INTEGER) AS bin,
           CAST(ROW_NUMBER() OVER (PARTITION BY (cum - n) // 512
                                   ORDER BY doc_id) AS INTEGER) AS bin_pos
    FROM c
    """,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation composition — the three core stages of a
    training-data pipeline CHAINED as one lazy plan: exact dedup (keep
    min-id per normalized-md5 fingerprint) → Gopher-style quality gate
    (score >= 3 of 4 checks) → sequence packing of the survivors
    (distributed prefix-sum binning, budget 512). Each stage is an
    already-proven operator (drop_exact_duplicates / quality_score /
    pack_sequences); this query pins that they COMPOSE — schemas line
    up, no stage forces materialization, and Catalyst plans the whole
    chain as one job with the dedup semi-join, the row-local quality
    projection, and the pack windows sharing scans.

    Scale: dedup is one fingerprint-partitioned agg+semi-join; quality
    is row-local; packing is the range-bucketed scan — no stage
    introduces anything super-linear, so the composed pipeline is
    exactly as scalable as its weakest stage (the global prefix-sum's
    tiny offset table)."""
    from .functions import text as TX
    from .operators.dedup import drop_exact_duplicates
    from .operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    deduped = drop_exact_duplicates(docs)
    toks = TX.tokens(F.col("text"))
    scored = deduped.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        TX.quality_score(F.col("text"), toks).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= 3).select("doc_id", "n_tokens")
    return pack_sequences(kept, "n_tokens", budget=512, range_size=64)


_EPOCHS = {  # per-lang epoch factor as exact rational (num, den)
    "en": (5, 2),  # 2.5 epochs
    "de": (3, 2),  # 1.5
    "fr": (1, 1),  # 1.0
    "es": (1, 2),  # 0.5 — deterministic half subsample
    "zh": (2, 1),  # 2.0
}


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
    from .functions import text as TX

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
    from .operators.sampling import stratified_sample

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
    from .operators.sampling import hash_split

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


# ---- streaming (run to completion, then checked like any batch query) -----

_EVENTS_PHYSICAL_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)  # ts read as raw int64 — nanos or micros since epoch depending on the
# harness generation's physical type (see _events_stream)

_DISPATCH_ROUTE_ORACLE = _ORACLE["dispatch_route"]


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file stream (the broker-free production shape)."""
    from .streaming.dispatch import file_stream_reader

    # glob (not a bare file path): FileStreamSource requires a directory
    # basePath, which a glob resolves to the parent dir
    stream = file_stream_reader(
        spark, f"{sf_dir}/events*.parquet", _EVENTS_PHYSICAL_SCHEMA
    )
    # The long-typed read surfaces the parquet's physical int64 verbatim:
    # ns-since-epoch for TIMESTAMP(NANOS) files, µs-since-epoch for
    # TIMESTAMP(MICROS) files. 2024 epochs are ~1.7e15 µs vs ~1.7e18 ns, so
    # a 1e17 threshold cleanly discriminates per row (both harness
    # generations stay correct without re-probing the file footer).
    return stream.withColumn(
        "ts",
        F.timestamp_micros(
            F.when(F.col("ts") > F.lit(10**17), F.expr("ts DIV 1000")).otherwise(
                F.col("ts")
            )
        ),
    )


def _run_stream_to_table(df: DataFrame, prefix: str, mode: str) -> DataFrame:
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


@register("streaming_dispatch_route", _DISPATCH_ROUTE_ORACLE)
def streaming_dispatch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME oracle as dispatch_route, satisfied through Structured
    Streaming: file stream → rule evaluation → multicast → memory sink.
    Streaming/batch parity is the core guarantee of sharing one plan
    builder (the dispatch path is stateless ⇒ append mode, no watermark)."""
    from .streaming.dispatch import streaming_dispatch

    ev = _events_stream(spark, sf_dir)
    rec = F.struct(
        F.col("event_type"),
        F.col("value"),
        F.struct(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        ).alias("props"),
    )
    routed = streaming_dispatch(
        ev.withColumn("rec", rec), EVENT_RULES, struct_col="rec"
    ).select("event_id", "rule_idx", "rule_name", "topic")
    return _run_stream_to_table(routed, "stream_route", "append")


@register(
    "streaming_tumbling_counts",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream (complete mode so the
    result is the full deterministic window set; watermarked append is
    exercised in tests where flush timing is controlled)."""
    from .streaming.windows import tumbling_counts

    ev = _events_stream(spark, sf_dir)
    agg = tumbling_counts(ev, width="1 hour", watermark="2 hours")
    out = _run_stream_to_table(agg, "stream_tumble", "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "streaming_sliding_counts",
    """
    WITH w AS (
      SELECT event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
      FROM events)
    SELECT CAST(epoch(ws) AS BIGINT) AS window_start_epoch, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows: each event lands in exactly width/slide = 2
    windows (the oracle materializes the same two window-starts per event
    with unnest)."""
    from .streaming.windows import sliding_counts

    ev = _events_stream(spark, sf_dir)
    agg = sliding_counts(ev, width="2 hours", slide="1 hour", watermark="4 hours")
    out = _run_stream_to_table(agg, "stream_slide", "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "streaming_session_window",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS sess_id FROM o)
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM s GROUP BY user_id, sess_id
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user. Spark merges sessions whose
    [ts, ts+gap) intervals overlap, i.e. a new session starts exactly when
    the gap to the previous event is >= 30 min — the oracle reproduces
    that with a lag()-based gaps-and-islands numbering."""
    from .streaming.windows import session_windows

    ev = _events_stream(spark, sf_dir)
    agg = session_windows(ev, gap="30 minutes", watermark="2 hours")
    out = _run_stream_to_table(agg, "stream_sess", "complete")
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("session_window.start")).alias("session_start_epoch"),
        "n_events",
        "session_value",
    )


@register(
    "streaming_windowed_topk",
    """
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS w, user_id,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS user_value
      FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY w
                    ORDER BY user_value DESC, user_id) AS rn FROM agg)
    SELECT CAST(epoch(w) AS BIGINT) AS window_start_epoch, user_id,
           user_value, CAST(rn AS INTEGER) AS rank
    FROM r WHERE rn <= 3
    """,
)
def streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: rank functions can't run inside a streaming
    aggregation, so the production pattern is two tiers — the STREAM
    maintains the windowed per-user sums (incremental state), and the
    top-k rank runs as a batch window function over the materialized
    sink. This query exercises exactly that composition."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(
            F.sum(F.col("value").cast(DEC_PRICE)).cast("double").alias("user_value")
        )
    )
    out = _run_stream_to_table(agg, "stream_topk", "complete")
    w = W.partitionBy("window").orderBy(F.desc("user_value"), F.asc("user_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "user_id",
            "user_value",
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "streaming_dedup_watermark",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state. The watermark (40 days)
    exceeds the dataset's 30-day span, so no key's state is evicted
    mid-run and each (user_id, event_type) is emitted exactly once —
    making the append-mode output equal to batch DISTINCT."""
    from .streaming.windows import dedup_within_watermark

    ev = _events_stream(spark, sf_dir)
    dd = dedup_within_watermark(ev, keys=("user_id", "event_type"), watermark="40 days")
    out = _run_stream_to_table(dd, "stream_dedup", "append")
    return out.select("user_id", "event_type")


@register(
    "streaming_user_profiles",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           MAX(CASE WHEN rn = 1 THEN event_type END) AS last_type
    FROM ranked GROUP BY user_id
    """,
)
def streaming_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    profile. Update mode emits one row per touched user per micro-batch;
    n_events strictly increases, so max_by(n_events) recovers the final
    state regardless of how the file source split batches."""
    from .streaming.stateful import running_user_profiles

    ev = _events_stream(spark, sf_dir)
    prof = running_user_profiles(ev)
    out = _run_stream_to_table(prof, "stream_prof", "update")
    final = out.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "total_value", "last_type"), "n_events").alias("s")
    )
    return final.select("user_id", "s.n_events", "s.total_value", "s.last_type")


@register(
    "streaming_incremental_merge",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def streaming_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: each micro-batch's
    partial aggregate is MERGEd (the q_merge_upsert algebra — full-outer
    join + coalesce) into a parquet state table via foreachBatch. The
    partials are DECIMAL, and decimal addition is associative-exact, so
    ANY micro-batch split reproduces the one-shot batch aggregate
    bit-for-bit — the oracle is the plain batch GROUP BY. The double
    cast happens once, at read-out. Scale: state and delta shuffle on
    the group key per batch (a lakehouse table format adds file-level
    pruning on top of this same row algebra); state versions rotate, no
    driver-side accumulation anywhere. Multi-batch split-invariance is
    pinned by tests/test_streaming.py (maxFilesPerTrigger=1)."""
    import tempfile

    from .streaming.incremental import incremental_decimal_merge

    ev = _events_stream(spark, sf_dir)
    return incremental_decimal_merge(
        ev,
        tempfile.mkdtemp(prefix="inc_merge_"),
        key="user_id",
        value_col="value",
    )


@register(
    "streaming_static_join",
    """
    SELECT e.event_id, e.event_type, n.n_name AS region_name
    FROM events e
    JOIN nation n
      ON n.n_nationkey = CAST(json_extract_string(e.props, '$.k') AS INTEGER) % 25
    """,
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the 25-row nation dim is broadcast
    to every task, so the stream side never shuffles — the canonical
    pattern for dimension lookups on unbounded input."""
    ev = _events_stream(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    key = F.get_json_object("props", "$.k").cast("int") % 25
    joined = ev.withColumn("__nk", key).join(
        F.broadcast(nation), F.col("__nk") == F.col("n_nationkey")
    )
    out = _run_stream_to_table(
        joined.select("event_id", "event_type", F.col("n_name").alias("region_name")),
        "stream_sjoin",
        "append",
    )
    return out


@register(
    "streaming_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (self-join of the event stream): each
    purchase paired with the same user's clicks in the preceding hour.
    Both sides watermarked; the time-range condition is what lets Spark
    bound the join state (rows age out once the watermark passes the
    interval), which is the difference between O(window) and O(stream)
    state at scale."""
    ev = _events_stream(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "40 days")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "40 days")
    )
    j = p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts >= p_ts - interval 1 hour AND c_ts <= p_ts"
        ),
    )
    out = _run_stream_to_table(
        j.select("purchase_id", "click_id", F.col("p_user").alias("user_id")),
        "stream_ssjoin",
        "append",
    )
    return out


# ---- multimodal -----------------------------------------------------------


@register(
    "multimodal_audio_energy",
    """
    WITH w AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
               AS win
      FROM documents),
    seg AS (
      SELECT doc_id, CAST(win AS INTEGER) AS win_idx,
             substr(text, win * 64 + 1, 64) AS s
      FROM w)
    SELECT doc_id, win_idx,
           CAST(length(s) AS INTEGER) AS n_samples,
           sqrt(list_sum(list_transform(string_split(s, ''),
                                        c -> ord(c) * ord(c)))
                / CAST(length(s) AS DOUBLE)) AS rms
    FROM seg
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over the audio-like payload (byte = unsigned
    PCM sample; real pipelines decode with librosa here). 1→N Arrow rows
    per payload; exact integer square-sums, one IEEE divide+sqrt. The
    oracle rebuilds the same windows from the UTF-8 text (ASCII corpus ⇒
    byte == codepoint)."""
    from .operators.multimodal import audio_window_energy, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return audio_window_energy(with_binary_payload(docs), window=64)


_VAD_TH = 9850  # mean-square-per-sample activity threshold (~median)


@register(
    "multimodal_audio_vad_spans",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(generate_series(0,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
        AS win, text
      FROM documents),
    seg AS (
      SELECT doc_id, CAST(win AS INTEGER) AS win,
             substr(text, win * 64 + 1, 64) AS s
      FROM w),
    e AS (
      SELECT doc_id, win,
             CAST(list_sum(list_transform(string_split(s, ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(s) AS BIGINT) AS n
      FROM seg),
    act AS (
      SELECT doc_id, win, ssq,
             win - ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY win) AS island
      FROM e WHERE ssq > {_VAD_TH} * n)
    SELECT doc_id,
           CAST(MIN(win) AS INTEGER) AS span_start,
           CAST(MAX(win) AS INTEGER) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(ssq) AS BIGINT) AS ssq_total
    FROM act GROUP BY doc_id, island
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_audio_vad_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style span extraction over audio-like payloads —
    the segmentation step speech training pipelines run to cut silence
    and keep contiguous speech: windowed integer energy (exact
    sum-of-squares, the float RMS never gates anything), an all-integer
    activity threshold (mean square > TH), and a gaps-and-islands merge
    of adjacent active windows into spans (≥2 windows). Composes the
    audio-energy windowing with the islands idiom; a real pipeline
    swaps the byte-energy for decoded PCM energy in the same Arrow
    slot.

    Scale: windows are generated in-row (no shuffle), the only shuffle
    is the doc-keyed islands window + span agg — frames of one clip
    co-locate, same as scene cuts."""
    docs = load_table(spark, sf_dir, "documents")
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    # empty payload ⇒ n_wins = -1 and sequence(0,-1) is DESCENDING in
    # Spark (two phantom zero-length windows) while DuckDB's
    # generate_series(0,-1) is empty — filter before the explode so
    # both engines agree that an empty clip has no windows at all
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        "win",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id",
        "win",
        ssq.alias("ssq"),
        F.length("s").cast("long").alias("n"),
    )
    wd = W.partitionBy("doc_id").orderBy("win")
    act = e.filter(F.col("ssq") > F.lit(_VAD_TH) * F.col("n")).withColumn(
        "island", F.col("win") - F.row_number().over(wd)
    )
    return (
        act.groupBy("doc_id", "island")
        .agg(
            F.min("win").cast("int").alias("span_start"),
            F.max("win").cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("ssq").alias("ssq_total"),
        )
        .filter(F.col("n_windows") >= 2)
        .drop("island")
    )


@register(
    "multimodal_audio_snr_gate",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(generate_series(0,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
        AS win, text
      FROM documents),
    e AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(
               string_split(substr(text, win * 64 + 1, 64), ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(substr(text, win * 64 + 1, 64)) AS BIGINT) AS n
      FROM w),
    g AS (
      SELECT doc_id,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 1 ELSE 0 END)
               AS active_windows,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE 1 END)
               AS silent_windows,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN ssq ELSE 0 END)
               AS active_ssq,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE ssq END)
               AS silent_ssq,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN n ELSE 0 END)
               AS active_n,
             SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 0 ELSE n END)
               AS silent_n
      FROM e GROUP BY doc_id)
    SELECT doc_id,
           CAST(active_windows AS BIGINT) AS active_windows,
           CAST(silent_windows AS BIGINT) AS silent_windows,
           CAST(CASE WHEN silent_ssq > 0 AND active_n > 0
                THEN ((active_ssq * 1000000) // active_n)
                     // (CASE WHEN silent_n > 0
                         THEN silent_ssq // silent_n ELSE 1 END)
                ELSE -1 END AS BIGINT) AS snr_fp,
           CAST(CASE WHEN active_windows * 5 >= 2 * (active_windows
                + silent_windows) THEN 1 ELSE 0 END AS INTEGER) AS kept
    FROM g
    """,
)
def multimodal_audio_snr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio quality gate: per-payload signal-to-noise proxy — mean
    active-window energy over mean silent-window energy (the VAD
    threshold splits the windows), all-integer fixed-point (10^6-scaled
    DIV chain, -1 sentinel when a side is empty), plus the keep rule
    speech curation applies (≥40%% of windows active — clips that are
    mostly silence are dropped before they waste tokenizer/encoder
    budget). One in-row window explode + one doc-keyed agg; no Python,
    no shuffle beyond the agg."""
    docs = load_table(spark, sf_dir, "documents")
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    # empty payload: sequence(0,-1) would emit phantom windows (the
    # vad_spans divergence) — an empty clip has no windows on either
    # engine, and therefore 0%% activity: correctly absent from output
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id",
        ssq.alias("ssq"),
        F.length("s").cast("long").alias("n"),
    )
    act = F.col("ssq") > F.lit(_VAD_TH) * F.col("n")
    g = e.groupBy("doc_id").agg(
        F.sum(F.when(act, 1).otherwise(0)).alias("active_windows"),
        F.sum(F.when(act, 0).otherwise(1)).alias("silent_windows"),
        F.sum(F.when(act, F.col("ssq")).otherwise(0)).alias("active_ssq"),
        F.sum(F.when(act, 0).otherwise(F.col("ssq"))).alias("silent_ssq"),
        F.sum(F.when(act, F.col("n")).otherwise(0)).alias("active_n"),
        F.sum(F.when(act, 0).otherwise(F.col("n"))).alias("silent_n"),
    )
    snr = F.expr(
        "CASE WHEN silent_ssq > 0 AND active_n > 0"
        " THEN ((active_ssq * 1000000) DIV active_n)"
        " DIV (CASE WHEN silent_n > 0"
        " THEN silent_ssq DIV silent_n ELSE 1 END)"
        " ELSE -1 END"
    )
    return g.select(
        "doc_id",
        F.col("active_windows").cast("long").alias("active_windows"),
        F.col("silent_windows").cast("long").alias("silent_windows"),
        snr.cast("long").alias("snr_fp"),
        F.expr(
            "CASE WHEN active_windows * 5 >= 2 *"
            " (active_windows + silent_windows) THEN 1 ELSE 0 END"
        ).cast("int").alias("kept"),
    )


_SCENE_CUT_TH = 192  # |Δ byte-sum| above this = cut (~p92 of deltas)


@register(
    "multimodal_scene_cuts",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx, feat,
             feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx) AS d0
      FROM feat)
    SELECT doc_id, frame_idx, feat,
           CAST(ABS(d0) AS BIGINT) AS delta,
           CASE WHEN d0 IS NULL THEN FALSE
                ELSE ABS(d0) > {_SCENE_CUT_TH} END AS is_cut
    FROM d
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video-like payloads — the clip
    segmentation step video training pipelines run before sampling
    clips: per-frame scalar feature (operators/multimodal.py:
    frame_features, the decode stand-in in an Arrow batch), then a
    frame-lag delta per document and a threshold flag, all JVM-side.
    Byte-sum frames stand in for luminance histograms (codecs absent);
    the analytics layer — lag window keyed by doc, exact integer
    deltas, deterministic threshold — is the real operator.

    Scale: decode is one narrow Arrow pass (payloads never shuffle);
    the cut detection shuffles only (doc_id, frame_idx, feat) rows on
    doc_id for the lag window — frames of one video co-locate, which is
    also what a real GOP-aware decoder needs."""
    from .operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    d0 = F.col("feat") - F.lag("feat").over(wd)
    return feats.withColumn("d0", d0).select(
        "doc_id",
        "frame_idx",
        "feat",
        F.abs(F.col("d0")).cast("long").alias("delta"),
        F.when(F.col("d0").isNull(), F.lit(False))
        .otherwise(F.abs(F.col("d0")) > _SCENE_CUT_TH)
        .alias("is_cut"),
    )


@register(
    "pipeline_clip_extract",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx) AS d0
      FROM feat),
    sc AS (
      SELECT doc_id, frame_idx,
             SUM(CASE WHEN d0 IS NOT NULL
                       AND ABS(d0) > {_SCENE_CUT_TH} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM d),
    scenes AS (
      SELECT doc_id, scene_id,
             CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
             CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
             CAST(COUNT(*) AS BIGINT) AS n_frames
      FROM sc GROUP BY doc_id, scene_id)
    SELECT doc_id, CAST(rn AS INTEGER) AS clip_rank,
           start_frame, end_frame, n_frames
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY n_frames DESC, start_frame) AS rn
      FROM scenes)
    WHERE rn <= 2
    """,
)
def pipeline_clip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal composition: scene-cut detection → scene
    assembly → clip selection, one lazy plan — the "pick the k longest
    coherent clips per video" step that turns raw footage into training
    clips. Scene ids are a running sum of cut flags (the islands idiom
    on change-points instead of gaps), scenes aggregate per (doc,
    scene), and a per-doc rank keeps the 2 longest (start-frame
    tiebreak). Everything after the Arrow frame-feature pass is three
    windows/aggs on the SAME doc-keyed shuffle."""
    from .operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    d0 = F.col("feat") - F.lag("feat").over(wd)
    cut = (
        F.when(
            d0.isNotNull() & (F.abs(d0) > _SCENE_CUT_TH), F.lit(1)
        ).otherwise(F.lit(0))
    )
    wcum = wd.rowsBetween(W.unboundedPreceding, W.currentRow)
    sc = feats.withColumn("scene_id", F.sum(cut).over(wcum))
    scenes = sc.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.max("frame_idx").cast("int").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    wr = W.partitionBy("doc_id").orderBy(
        F.desc("n_frames"), F.asc("start_frame")
    )
    return (
        scenes.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 2)
        .select(
            "doc_id",
            F.col("rn").cast("int").alias("clip_rank"),
            "start_frame",
            "end_frame",
            "n_frames",
        )
    )


@register(
    "multimodal_video_keyframes",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c)))  AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             ABS(feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx)) AS delta,
             CASE WHEN COALESCE(ABS(feat - LAG(feat)
                    OVER (PARTITION BY doc_id ORDER BY frame_idx)), 0)
                    > {_SCENE_CUT_TH} THEN 1 ELSE 0 END AS cut
      FROM feat),
    sc AS (
      SELECT doc_id, frame_idx, delta,
             SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM d)
    SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
           frame_idx AS keyframe_idx,
           CAST(delta AS BIGINT) AS kf_delta,
           CAST(n_frames AS BIGINT) AS n_frames
    FROM (
      SELECT *, COUNT(*) OVER (PARTITION BY doc_id, scene_id) AS n_frames,
             ROW_NUMBER() OVER (PARTITION BY doc_id, scene_id
               ORDER BY delta DESC NULLS LAST, frame_idx) AS rn
      FROM sc)
    WHERE rn = 1
    """,
)
def multimodal_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection per scene — the representative-frame pick
    that turns scene segments into a thumbnail/embedding budget: within
    each scene (running-sum ids over threshold cuts, same machinery as
    pipeline_clip_extract), the keyframe is the frame of maximum
    feature change (the most visually informative), deterministic
    tiebreak on frame index; a single-frame scene keeps its only frame
    with NULL delta. All windows share the one doc-keyed shuffle."""
    from .operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("feat") - F.lag("feat").over(wd))
    d = feats.select(
        "doc_id",
        "frame_idx",
        delta.alias("delta"),
        F.when(
            F.coalesce(delta, F.lit(0)) > _SCENE_CUT_TH, F.lit(1)
        ).otherwise(F.lit(0)).alias("cut"),
    )
    wcum = wd.rowsBetween(W.unboundedPreceding, W.currentRow)
    sc = d.withColumn("scene_id", F.sum("cut").over(wcum)).drop("cut")
    ws = W.partitionBy("doc_id", "scene_id")
    wr = ws.orderBy(F.desc_nulls_last("delta"), F.asc("frame_idx"))
    return (
        sc.withColumn("n_frames", F.count(F.lit(1)).over(ws))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("scene_id").cast("long").alias("scene_id"),
            F.col("frame_idx").alias("keyframe_idx"),
            F.col("delta").cast("long").alias("kf_delta"),
            F.col("n_frames").cast("long").alias("n_frames"),
        )
    )


@register(
    "pipeline_media_curate",
    f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    dd AS (SELECT d.doc_id, d.text FROM documents d
           JOIN keepers k ON k.doc_id = d.doc_id),
    w AS (
      SELECT doc_id, unnest(generate_series(0,
        CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
        AS win, text
      FROM dd),
    e AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(
               string_split(substr(text, win * 64 + 1, 64), ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(substr(text, win * 64 + 1, 64)) AS BIGINT) AS n
      FROM w),
    gate AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               SUM(CASE WHEN ssq > {_VAD_TH} * n THEN 1 ELSE 0 END) AS act,
               COUNT(*) AS tot
        FROM e GROUP BY doc_id)
      WHERE act * 5 >= 2 * tot),
    f AS (
      SELECT dd.doc_id,
             unnest(generate_series(0,
               octet_length(encode(dd.text)) // 32 - 1)) AS i,
             dd.text
      FROM dd JOIN gate USING (doc_id)
      WHERE octet_length(encode(dd.text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             feat - LAG(feat) OVER (PARTITION BY doc_id
               ORDER BY frame_idx) AS d0
      FROM feat),
    sc AS (
      SELECT doc_id, frame_idx,
             SUM(CASE WHEN d0 IS NOT NULL
                       AND ABS(d0) > {_SCENE_CUT_TH} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM d),
    scenes AS (
      SELECT doc_id, scene_id,
             CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
             CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
             CAST(COUNT(*) AS BIGINT) AS n_frames
      FROM sc GROUP BY doc_id, scene_id)
    SELECT doc_id, start_frame, end_frame, n_frames
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY n_frames DESC, start_frame) AS rn
      FROM scenes)
    WHERE rn = 1
    """,
)
def pipeline_media_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTIMODAL curation pipeline, one lazy plan: exact payload
    dedup (md5 keeper — identical bytes are the first cut in any media
    crawl) → audio activity gate (≥40% active windows, the SNR-gate
    keep rule) → best clip per surviving asset (longest scene, the
    clip-extract selection). Mirrors what pipeline_curate does for
    text: every stage is a proven operator, composed without
    materialization barriers — the dedup semi-join, the window-energy
    agg, and the scene windows share one doc-keyed partitioning after
    the dedup shuffle."""
    from .operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # exact payload dedup on raw md5 (not the whitespace-normalized
    # fingerprint: byte-identical assets only, the media contract)
    keepers = docs.groupBy(F.md5("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    dd = docs.join(keepers.select("doc_id"), "doc_id", "left_semi")
    # audio activity gate
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    # empty payloads get no windows (sequence(0,-1) phantom-window
    # guard, same as the snr_gate / vad_spans fix)
    seg = dd.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        "text",
    ).select(
        "doc_id",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    act = (
        seg.select(
            "doc_id",
            ssq.alias("ssq"),
            F.length("s").cast("long").alias("n"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("ssq") > F.lit(_VAD_TH) * F.col("n"), 1)
                .otherwise(0)
            ).alias("act"),
            F.count(F.lit(1)).alias("tot"),
        )
        .filter(F.col("act") * 5 >= 2 * F.col("tot"))
        .select("doc_id")
    )
    gated = dd.join(act, "doc_id", "left_semi")
    # best clip per asset
    feats = frame_features(with_binary_payload(gated), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    d0 = F.col("feat") - F.lag("feat").over(wd)
    cut = F.when(
        d0.isNotNull() & (F.abs(d0) > _SCENE_CUT_TH), F.lit(1)
    ).otherwise(F.lit(0))
    wcum = wd.rowsBetween(W.unboundedPreceding, W.currentRow)
    scenes = (
        feats.withColumn("scene_id", F.sum(cut).over(wcum))
        .groupBy("doc_id", "scene_id")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.max("frame_idx").cast("int").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
        )
    )
    wr = W.partitionBy("doc_id").orderBy(
        F.desc("n_frames"), F.asc("start_frame")
    )
    return (
        scenes.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("doc_id", "start_frame", "end_frame", "n_frames")
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           (i * octet_length(encode(text))) // 4 AS frame_offset,
           least(16, octet_length(encode(text))
                     - (i * octet_length(encode(text))) // 4) AS frame_len
    FROM documents, unnest(generate_series(0, 3)) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1→k rows per payload via mapInPandas): the batch
    shape of any frame/chunk extractor, with deterministic offsets so the
    oracle can pin them."""
    from .operators.multimodal import sample_frames, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs), k=4)


@register(
    "multimodal_features",
    """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      md5(text) AS content_md5,
      CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
      CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
      CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + Arrow-batched
    mapInPandas feature extraction (the decode step is a deterministic
    fake — codecs aren't in this container; the Spark-side batch shape is
    the real thing being exercised)."""
    from .operators.multimodal import extract_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))


@register(
    "multimodal_dedup_payload",
    """
    WITH h AS (SELECT doc_id, md5(text) AS content_md5,
                      octet_length(encode(text)) AS n_bytes
               FROM documents)
    SELECT content_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes
    FROM h GROUP BY content_md5 HAVING COUNT(*) >= 1
    """,
)
def multimodal_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection on the BINARY payload column (the image
    dedup step every multimodal crawl runs first: same bytes ⇒ same
    asset, before any perceptual hashing). md5 runs JVM-side directly on
    the binary column — the payload never leaves the executor and the
    shuffle carries 16-byte digests, not blobs; min-id keeper per
    content group mirrors the text dedup contract."""
    from .operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return (
        b.select(
            "doc_id",
            F.md5(F.col("payload")).alias("content_md5"),
            F.length(F.col("payload")).alias("n_bytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
        )
    )


@register(
    "q_join_bloom_prefilter",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom) join pre-pruning, built by hand since this
    build doesn't SQL-register bloom_filter_agg: the filtered dim's keys
    are folded into a 16 Kbit bloom (3 md5-derived positions, bit-or'd
    into 256 words — one narrow agg), the single-row word array is
    broadcast into the fact scan, and only rows passing all three bit
    probes reach the join. The exact semi-join then removes false
    positives, so the bloom is RESULT-TRANSPARENT (oracle = plain join).
    At 100 TB this is the shape of Spark's own runtime row-group
    filters: the fact side is pruned BEFORE the shuffle, for the cost of
    broadcasting 2 KB. Probes are O(1) element_at on the dense word
    array — no per-row scan of a position list."""
    M, W = 16384, 256  # bits, 64-bit words
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )

    def pos(col: Column, i: int) -> Column:
        # same md5 'hash family' idiom as MinHash / Count-Min
        digest = F.md5(F.concat(col.cast("string"), F.lit(f"#bloom{i}")))
        return F.conv(F.substring(digest, 1, 12), 16, 10).cast("long") % M

    key = F.col("c_custkey")
    words = (
        cust.select(
            F.explode(F.array(pos(key, 0), pos(key, 1), pos(key, 2))).alias(
                "bit"
            )
        )
        .select(
            F.shiftright("bit", 6).alias("w"),
            F.expr("shiftleft(1L, cast(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )
    # dense, index-addressable word array in ONE row (no driver collect)
    bloom = (
        spark.range(W)
        .join(words, F.col("id") == F.col("w"), "left")
        .select("id", F.coalesce("word", F.lit(0).cast("long")).alias("word"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("id", "word"))),
                lambda s: s["word"],
            ).alias("bloom")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    okey = F.col("o_custkey")
    probed = orders.crossJoin(F.broadcast(bloom)).withColumns(
        {f"p{i}": pos(okey, i) for i in range(3)}
    )
    hit = " AND ".join(
        f"(element_at(bloom, cast(p{i} DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, cast(p{i} % 64 AS INT))) != 0"
        for i in range(3)
    )
    pref = probed.filter(F.expr(hit)).drop("bloom", "p0", "p1", "p2")
    return (
        pref.join(
            F.broadcast(cust), okey == F.col("c_custkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("volume"),
        )
    )


@register(
    "q_window_interval_overlap",
    """
    WITH pts AS (
      SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d
      FROM events
      UNION ALL
      SELECT event_type, CAST(epoch_us(ts) AS BIGINT) + 1800000000, -1
      FROM events),
    r AS (SELECT event_type,
                 SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                              ROWS UNBOUNDED PRECEDING) AS load
          FROM pts)
    SELECT event_type, CAST(MAX(load) AS BIGINT) AS peak_concurrent
    FROM r GROUP BY event_type
    """,
)
def q_window_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent intervals (sweep line): each 30-min interval
    becomes a +1 point at its start and a -1 at its end; a running sum
    ordered by time is the instantaneous load and its max the peak. The
    SCALE point: the naive formulation is an interval self-join
    (O(n·overlap), a banded-join at best); the sweep is one union + ONE
    window over the same partitioning — linear in events. Tie rule: ends
    sort before starts at the same microsecond (d ascending ⇒ [t, t+30m)
    half-open semantics), identical in the oracle's ORDER BY t, d."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    half_hour = 1_800_000_000
    pts = ev.select("event_type", "t", F.lit(1).alias("d")).unionAll(
        ev.select(
            "event_type",
            (F.col("t") + half_hour).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        pts.withColumn("load", F.sum("d").over(w))
        .groupBy("event_type")
        .agg(F.max("load").alias("peak_concurrent"))
    )


@register(
    "q_stats_outlier_mad",
    """
    WITH v AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (
      SELECT event_type, AVG(v) AS med FROM v
      WHERE rn IN ((n + 1) // 2, n // 2 + 1) GROUP BY event_type),
    dev AS (
      SELECT v.event_type, ABS(v.v - med.med) AS dv, v.event_id, med.med,
             ROW_NUMBER() OVER (PARTITION BY v.event_type
                                ORDER BY ABS(v.v - med.med), v.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY v.event_type) AS n
      FROM v JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, AVG(dv) AS mad FROM dev
      WHERE rn IN ((n + 1) // 2, n // 2 + 1) GROUP BY event_type)
    SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n, med.med, mad.mad,
           CAST(SUM(CASE WHEN ABS(v.v - med.med) > 3.5 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY v.event_type, med.med, mad.mad
    """,
)
def q_stats_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate (median absolute deviation) — the
    training-data quality filter that survives heavy tails where
    mean/stddev z-scores don't. Exact rank-based medians (avg of the two
    middle values on a (value, id)-ordered multiset) rather than
    percentile interpolation, so both engines produce bit-identical
    doubles and the 3.5·MAD threshold compares exactly. Scale: two
    window passes + two tiny per-group joins, all partitioned by the
    SAME group key — one logical shuffle family, no global sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v"), "event_id"
    )
    wv = W.partitionBy("event_type").orderBy("v", "event_id")
    wn = W.partitionBy("event_type")
    v = ev.select(
        "event_type",
        "v",
        "event_id",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = (F.col("rn") == F.expr("(n + 1) DIV 2")) | (
        F.col("rn") == F.expr("n DIV 2 + 1")
    )  # integer DIV — float / would make rn == 105.5 silently never match
    med = v.filter(mid).groupBy("event_type").agg(F.avg("v").alias("med"))
    dv = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        "event_id",
        F.abs(F.col("v") - F.col("med")).alias("dv"),
        "v",
    )
    wd = W.partitionBy("event_type").orderBy("dv", "event_id")
    d = dv.withColumn("rn", F.row_number().over(wd)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    mad = d.filter(mid).groupBy("event_type").agg(F.avg("dv").alias("mad"))
    return (
        dv.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("dv") > 3.5 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
    )


@register(
    "q_latest_by_key_tombstone",
    """
    WITH c AS (
      SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             event_id, event_type, CAST(value AS DOUBLE) AS value,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                CAST(json_extract_string(props, '$.k') AS INTEGER)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, k, CAST(event_id AS BIGINT) AS last_event,
           event_type AS last_type, value AS last_value
    FROM c WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_latest_by_key_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction WITH DELETES: the changelog's latest row per key
    wins, and a tombstone ('error' here) as the latest row removes the
    key from the compacted view — the full Kafka-compacted-topic /
    Delta-CDF semantics, one step past q_latest_by_key. Same scale
    shape: max_by hash-agg (map-side combinable partials, no per-key
    sort), tombstone filter applied AFTER the winner is chosen — filter
    first would wrongly resurrect the previous version."""
    ev = load_table(spark, sf_dir, "events")
    latest = F.max_by(
        F.struct("event_id", "event_type", "value"),
        F.struct("ts", "event_id"),
    )
    return (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            "event_id",
            "event_type",
            F.col("value").cast("double").alias("value"),
            "ts",
        )
        .groupBy("user_id", "k")
        .agg(latest.alias("last"))
        .filter(F.col("last.event_type") != "error")
        .select(
            "user_id",
            "k",
            F.col("last.event_id").alias("last_event"),
            F.col("last.event_type").alias("last_type"),
            F.col("last.value").alias("last_value"),
        )
    )


def _phash_block_sql(b: int) -> str:
    """One 16-bit block signature over the TEXT (ASCII ⇒ char == byte
    offsets, asserted by the query): md5 of the b-th of 8 equal slices."""
    return (
        f"substring(md5(substring(text, 1 + {b} * ((length(text) + 7) // 8),"
        f" (length(text) + 7) // 8)), 1, 4)"
    )


@register(
    "multimodal_near_dup_phash",
    f"""
    WITH sig AS (
      SELECT doc_id,
             [{", ".join(_phash_block_sql(b) for b in range(8))}] AS s
      FROM documents WHERE octet_length(encode(text)) = length(text)),
    banded AS (
      SELECT doc_id, s, j AS band_idx, s[2 * j + 1] || s[2 * j + 2] AS band
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band = b.band
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(8 - (SELECT COUNT(*) FROM unnest(range(8)) t(i)
                     WHERE sa[i + 1] = sb[i + 1]) AS INT) AS diff_blocks
    FROM cand
    WHERE (SELECT COUNT(*) FROM unnest(range(8)) t(i)
           WHERE sa[i + 1] = sb[i + 1]) >= 6
    """,
)
def multimodal_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-duplicate detection for binary assets:
    the payload is cut into 8 equal blocks, each block hashed to a
    16-bit signature (a block-level 'phash' — robust to edits localized
    in ≤2 blocks, the CDC-chunking idea), signatures banded 2-blocks-
    per-band into 4 keys, candidates generated by band equi-join
    (pigeonhole: ≤2 differing blocks can kill at most 2 of 4 bands), and
    verified by block hamming distance ≥6-of-8. All JVM-side on the
    BINARY payload — blobs never shuffle, 4-char band digests do. The
    oracle computes the same signatures over the text (payload = UTF-8
    bytes; the ASCII guard keeps char and byte slicing identical)."""
    from .operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs).filter(
        F.length(F.col("payload")) == F.length(F.col("text"))
    )
    sigs = F.array(
        *[
            F.substring(
                F.md5(
                    F.expr(
                        f"substring(payload, 1 + {bi} *"
                        " ((length(payload) + 7) DIV 8),"
                        " (length(payload) + 7) DIV 8)"
                    )
                ),
                1,
                4,
            )
            for bi in range(8)
        ]
    )
    sig = b.select("doc_id", sigs.alias("s"))
    banded = sig.select(
        "doc_id",
        "s",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        F.col("s").getItem(2 * j), F.col("s").getItem(2 * j + 1)
                    )
                    for j in range(4)
                ]
            )
        ).alias("band_idx", "band"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("s2"),
        )
        .distinct()
    )
    same = sum(
        (F.col("s").getItem(i) == F.col("s2").getItem(i)).cast("int")
        for i in range(8)
    )
    return (
        cand.withColumn("n_same", same)
        .filter(F.col("n_same") >= 6)
        .select(
            "doc_a", "doc_b", (F.lit(8) - F.col("n_same")).cast("int").alias("diff_blocks")
        )
    )


@register(
    "multimodal_phash_calibration",
    f"""
    WITH sig AS (
      SELECT doc_id,
             [{", ".join(_phash_block_sql(b) for b in range(8))}] AS s
      FROM documents WHERE octet_length(encode(text)) = length(text)),
    banded AS (
      SELECT doc_id, s, j AS band_idx, s[2 * j + 1] || s[2 * j + 2] AS band
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.s AS sa, b.s AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band = b.band
       AND a.doc_id < b.doc_id),
    d AS (
      SELECT CAST(8 - (SELECT COUNT(*) FROM unnest(range(8)) t(i)
                       WHERE sa[i + 1] = sb[i + 1]) AS INT) AS diff_blocks
      FROM cand)
    SELECT diff_blocks, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM d GROUP BY diff_blocks
    """,
)
def multimodal_phash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold CALIBRATION for the perceptual-hash near-dup: the
    distribution of block-hamming distances over ALL band-join
    candidates (multimodal_near_dup_phash keeps only diff ≤ 2) — the
    histogram an operator reads to place the verify threshold: a clean
    valley between the near-dup mass at 0-2 and the collision tail at
    5+ says the banding is calibrated; mass in the middle says the
    block size disagrees with the edit granularity. Same signature and
    candidate machinery; the only change is aggregating instead of
    filtering."""
    from .operators.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs).filter(
        F.length(F.col("payload")) == F.length(F.col("text"))
    )
    sigs = F.array(
        *[
            F.substring(
                F.md5(
                    F.expr(
                        f"substring(payload, 1 + {bi} *"
                        " ((length(payload) + 7) DIV 8),"
                        " (length(payload) + 7) DIV 8)"
                    )
                ),
                1,
                4,
            )
            for bi in range(8)
        ]
    )
    sig = b.select("doc_id", sigs.alias("s"))
    banded = sig.select(
        "doc_id",
        "s",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        F.col("s").getItem(2 * j), F.col("s").getItem(2 * j + 1)
                    )
                    for j in range(4)
                ]
            )
        ).alias("band_idx", "band"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("s2"),
        )
        .distinct()
    )
    same = sum(
        (F.col("s").getItem(i) == F.col("s2").getItem(i)).cast("int")
        for i in range(8)
    )
    return (
        cand.select((F.lit(8) - same).cast("int").alias("diff_blocks"))
        .groupBy("diff_blocks")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# round-6 additions: SCD2 history, hashed-linear quality model, SemDeDup,
# interchange-format (CSV/JSONL) source roundtrips
# --------------------------------------------------------------------------


@register(
    "q_source_csv_roundtrip",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           MIN(CAST(o_orderdate AS DATE)) AS first_day,
           MAX(CAST(o_orderdate AS DATE)) AS last_day
    FROM orders GROUP BY 1, 2
    """,
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source path, proven by roundtrip: write orders as headered CSV
    under the warehouse, read it back with an EXPLICIT schema, and
    aggregate — the oracle runs on the original parquet, so any loss or
    misparse in the CSV writer/reader surfaces as a hash mismatch.
    Column choice is deliberate: ints, strings, and dates are the
    CSV-lossless subset (doubles/timestamps ride parquet or JSON, not
    CSV — text float formatting is where roundtrips die).

    Scale: explicit read schema (no inference scan); CSV splits on line
    boundaries so the read parallelizes like any text source."""
    from .sinks import roundtrip_dataset

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    back = roundtrip_dataset(
        spark,
        orders,
        "rt_orders_csv",
        "csv",
        "o_orderkey bigint, o_orderstatus string, o_orderdate date,"
        " o_orderpriority string",
        options={"header": "true"},
    )
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderdate").alias("first_day"),
        F.max("o_orderdate").alias("last_day"),
    )


@register(
    "q_source_jsonl_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           MIN(CAST(epoch_us(ts) AS BIGINT)) AS first_us,
           MAX(CAST(epoch_us(ts) AS BIGINT)) AS last_us
    FROM events GROUP BY 1
    """,
)
def q_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source path, proven by roundtrip: events → JSONL under
    the warehouse → read back with an explicit schema → aggregate, oracle
    on the original parquet. Timestamps travel as integer epoch-µs and
    money as decimal — the two representations that are exact in JSON
    text (JSON timestamp strings truncate to millis under the default
    format; doubles depend on the writer's float formatter).

    Scale: JSONL is the corpus interchange format (crawl dumps, API
    exports) — line-splittable, schema-on-read with the schema given, so
    ingest parallelizes and never runs an inference pre-scan."""
    from .sinks import roundtrip_dataset

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.col("value").cast(DEC_PRICE).alias("value_dec"),
    )
    back = roundtrip_dataset(
        spark,
        ev,
        "rt_events_jsonl",
        "json",
        f"event_id bigint, ts_us bigint, event_type string,"
        f" value_dec {DEC_PRICE}",
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_dec").cast("double").alias("total_value"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


@register(
    "q_source_orc_roundtrip",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source path, proven by roundtrip: lineitem columns → ORC under
    the warehouse → read back → aggregate, oracle on the original
    parquet. Unlike the CSV/JSONL paths, ORC is a binary columnar format
    — doubles travel bit-exact with no text-formatting caveats, and the
    reader gets the same predicate-pushdown/column-pruning treatment as
    parquet, so it's the second first-class columnar lake format."""
    from .sinks import roundtrip_dataset

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus",
        "l_extendedprice", "l_quantity",
    )
    back = roundtrip_dataset(
        spark,
        li,
        "rt_lineitem_orc",
        "orc",
        "l_orderkey bigint, l_returnflag string, l_linestatus string,"
        " l_extendedprice double, l_quantity double",
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_extendedprice")).alias("total_price"),
        _dsum(F.col("l_quantity")).alias("total_qty"),
    )


@register(
    "q_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(lead(ts) OVER w) AS BIGINT) AS valid_to_us,
           CAST(row_number() OVER w AS INTEGER) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change log: collapse
    consecutive same-value runs per user (lag filter), then stamp each
    surviving change with its validity interval (lead) and version
    (row_number) — the standard warehouse history-table build that the
    reference's CDC-adjacent users run downstream of `q_latest_by_key`.

    Scale: ONE shuffle on user_id. The lag window, the filter, and the
    lead/row_number windows share partitioning AND sort order, so
    Catalyst plans a single exchange + sort with the second window
    running sort-free on the filtered output. Intervals are integer
    microseconds (unix_micros) — the engine-portable representation the
    sessionize query already pins."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    return chg.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register("streaming_scd2_history", _ORACLE["q_scd2_history"])
def streaming_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD Type-2 maintenance
    (streaming/incremental.py:incremental_scd2): micro-batches append to
    a bucket-partitioned change log and rebuild ONLY the touched
    buckets' history via dynamic partition overwrite. SCD2's
    run-collapsing is order-sensitive, so unlike the decimal MERGE view
    this is maintained by key-scoped recompute — the order-invariant
    formulation — and the finished stream must equal the one-shot batch
    build exactly (same oracle as q_scd2_history; micro-batch
    split-invariance pinned in tests/test_streaming.py)."""
    import tempfile

    from .streaming.incremental import incremental_scd2

    ev = _events_stream(spark, sf_dir)
    return incremental_scd2(ev, tempfile.mkdtemp(prefix="scd2_"))


_QM_WEIGHT_SQL = "('0x' || substr(md5(f), 1, 12))::BIGINT % 2001 - 1000"
_QM_BIGRAMS_SQL = (
    "CASE WHEN len(t) >= 2 THEN list_transform(generate_series(1, len(t)-1),"
    " i -> concat_ws(' ', t[i], t[i+1]))"
    " ELSE CAST([] AS VARCHAR[]) END"
)


@register(
    "text_quality_model",
    f"""
    WITH t AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    f AS (SELECT doc_id, t || {_QM_BIGRAMS_SQL} AS feats FROM t)
    SELECT doc_id,
           CAST(len(feats) AS INTEGER) AS n_feats,
           CAST(COALESCE(list_sum(list_transform(feats,
                  f -> {_QM_WEIGHT_SQL})), 0) AS BIGINT) AS score_milli,
           COALESCE(list_sum(list_transform(feats,
                  f -> {_QM_WEIGHT_SQL})), 0) > 0 AS keep
    FROM f
    """,
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier: features are
    unigrams + word bigrams, each hashed to a fixed-point milli-weight
    (md5-derived — the deterministic stand-in for trained weights, same
    conv/'0x' idiom as the sketch family), document score = Σ weights,
    keep = score > 0. The inference shape of the linear quality filters
    used for corpus curation (CCNet/fastText gates): real deployments
    swap the md5 weight for a broadcast weight-table lookup; the plan is
    identical.

    Scale: 100% row-local — tokenize, shingle, hash, and sum are all
    higher-order functions inside one narrow projection. Zero shuffles,
    zero Python; throughput is scan-bound at any corpus size."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")

    def weight(tok: F.Column) -> F.Column:
        return (
            F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("long")
            % 2001
            - 1000
        )

    toks = TX.tokens(F.col("text"))
    feats = F.concat(toks, TX.word_shingles(toks, 2))
    score = F.aggregate(
        feats, F.lit(0).cast("long"), lambda acc, x: acc + weight(x)
    )
    out = docs.select(
        "doc_id",
        F.size(feats).alias("n_feats"),
        score.alias("score_milli"),
    )
    return out.withColumn("keep", F.col("score_milli") > 0)


@register(
    "dedup_semantic",
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
    {_km_assign_sql("cent2", "afinal")},
    n AS (SELECT vec_id, cluster, qv,
                 CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
          FROM afinal),
    p AS (
      SELECT b.vec_id, b.cluster, a.vec_id AS keep_id,
             list_dot_product(a.qv, b.qv)
               / sqrt(CAST(a.nsq AS DOUBLE) * CAST(b.nsq AS DOUBLE)) AS cos_sim
      FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
           MIN(keep_id) AS dup_of,
           CAST(COUNT(*) AS INTEGER) AS n_dups
    FROM p WHERE cos_sim >= 0.4
    GROUP BY vec_id, cluster
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication: k-means the
    embeddings, compare cosines only WITHIN each cluster, drop any
    vector with a lower-id clustermate at cos ≥ τ (keep-lowest survivor
    rule). Emits the drop list with provenance (dup_of, n_dups).

    Scale: the defining property is that the quadratic term is bounded
    per cluster — the pair join is an equi-join on the cluster id, and k
    grows with the corpus so cluster populations stay ~constant. The
    k-means stage is `kmeans_assign` (fully lazy since r11: the
    centroid bank rides in-plan 1-row broadcasts between Lloyd
    rounds); the pair stage is one shuffle on cluster.
    τ = 0.4 fits the synthetic embedding distribution (max within-
    cluster cosine ≈ 0.51 at sf0.01); production corpora use ~0.95+."""
    from .operators.similarity import semantic_dedup_drops

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_drops(emb, k=_IVF_CELLS, rounds=2, threshold=0.4)


@register(
    "sim_power_iteration",
    """
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    r1 AS (SELECT qv, CAST(list_sum(qv) AS BIGINT) AS rd FROM q),
    s1 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r1 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m1 AS (SELECT MAX(abs(s)) AS m FROM s1),
    v1 AS (SELECT list(CASE WHEN s < 0 THEN -1 ELSE 1 END
                       * (abs(s) * 1024 // m) ORDER BY d) AS vl
           FROM s1 CROSS JOIN m1),
    r2 AS (SELECT qv, CAST(list_dot_product(qv, vl) AS BIGINT) AS rd
           FROM q CROSS JOIN v1),
    s2 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r2 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m2 AS (SELECT MAX(abs(s)) AS m FROM s2)
    SELECT CAST(d AS INTEGER) AS d,
           CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END
                * (abs(s) * 1024 // m) AS BIGINT) AS component
    FROM s2 CROSS JOIN m2
    """,
)
def sim_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding gram matrix by 2-round
    unrolled power iteration (operators/similarity.py:
    power_iteration_top_component) — the spectral primitive under PCA
    whitening, spectral clustering seeds, and embedding-drift monitors,
    and the engine's fourth iterative algorithm next to PageRank,
    connected components, and k-means. Unlike those, it needs NO driver
    round-trips: the dims-length model state stays in-plan as a 1-row
    broadcast between rounds, so the whole query is lazy. Exact int64
    arithmetic (quantized vectors, integer normalization) makes both
    engines bit-identical; the oracle unrolls the same two rounds."""
    from .operators.similarity import power_iteration_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration_top_component(emb, rounds=2)


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
    from .operators.similarity import hard_negative_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


@register(
    "q_window_running_distinct",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — a frame no
    engine supports directly (distinct isn't frame-incremental), solved
    by the first-seen decomposition: flag each (user, type)'s first
    occurrence with one window, then a plain running SUM of flags in a
    second. Two window passes over the SAME user_id partitioning —
    one exchange, two sorts (the first sorts by (type, ts), the second
    by ts). The pattern behind every 'unique items to date' product
    metric at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
    )


@register(
    "q_drift_chi2",
    """
    WITH b AS (
      SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
             CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cur
      FROM events GROUP BY 1)
    SELECT bucket, n_ref, n_cur,
           CAST((n_ref - n_cur) * (n_ref - n_cur) * 1000
                // (n_ref + n_cur) AS BIGINT) AS chi2_milli
    FROM b
    """,
)
def q_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: chi-square contribution per value
    bucket between two interleaved snapshots (event_id parity stands in
    for crawl A/B — production compares reference vs current windows).
    The monitoring gate a curation pipeline runs before accepting a new
    crawl: a bucket whose contribution spikes is where the distribution
    moved. Contributions are fixed-point integers ((Δ²·1000) DIV total
    — no float sums to diverge on, and the global score is then an
    exact integer sum downstream). One scan, one hash agg."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        F.floor(F.col("value") / 25.0).alias("bucket")
    ).agg(
        F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    )
    return b.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.expr(
            "CAST((n_ref - n_cur) * (n_ref - n_cur) * 1000"
            " DIV (n_ref + n_cur) AS BIGINT)"
        ).alias("chi2_milli"),
    )


@register("streaming_drift_monitor", _ORACLE["q_drift_chi2"])
def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift gate maintained WHILE data lands
    (streaming/incremental.py:incremental_drift_counts): per-bucket
    snapshot counts merge per micro-batch — integer addition is
    associative, so any split reproduces the one-shot histogram exactly
    — and the fixed-point chi-square reads out at the end. Same oracle
    as the batch gate."""
    import tempfile

    from .streaming.incremental import incremental_drift_counts

    ev = _events_stream(spark, sf_dir)
    return incremental_drift_counts(ev, tempfile.mkdtemp(prefix="drift_"))


# PQ index construction + ADC scoring as relational CTEs — shared by
# the pure-PQ top-k oracle and the coarse->fine rerank oracle below.
_PQ_CTES = """
    cent AS (
      SELECT i // 16 AS cid, list(
               ((1103515245 * (7919 + i) + 12345) % 2147483648) % 2001 - 1000
               ORDER BY i) AS cv
      FROM unnest(generate_series(0, 64 * 16 - 1)) AS t(i)
      GROUP BY 1),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    sub AS (
      SELECT vec_id, m, qv[m * 16 + 1 : m * 16 + 16] AS sv
      FROM q CROSS JOIN unnest(generate_series(0, 3)) AS t(m)),
    dists AS (
      SELECT s.vec_id, s.m, c.cid,
             CAST(list_dot_product(s.sv, s.sv) AS BIGINT)
               - 2 * CAST(list_dot_product(s.sv, c.cv) AS BIGINT)
               + CAST(list_dot_product(c.cv, c.cv) AS BIGINT) AS dist
      FROM sub s JOIN cent c ON c.cid // 16 = s.m),
    enc AS (
      SELECT vec_id, m, cid % 16 AS code FROM (
        SELECT vec_id, m, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist ASC, cid ASC) AS rn
        FROM dists) WHERE rn = 1),
    scored AS (
      SELECT qs.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(SUM(CAST(list_dot_product(qs.sv, qs.sv) AS BIGINT)
                 - 2 * CAST(list_dot_product(qs.sv, c.cv) AS BIGINT)
                 + CAST(list_dot_product(c.cv, c.cv) AS BIGINT))
               AS BIGINT) AS adc_dist
      FROM sub qs
      JOIN enc e ON qs.m = e.m AND qs.vec_id <> e.vec_id
      JOIN cent c ON c.cid = e.m * 16 + e.code
      WHERE qs.vec_id < 10
      GROUP BY 1, 2)"""


@register(
    "sim_topk_pq",
    f"""
    WITH {_PQ_CTES}
    SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc_dist ASC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py:pq_encode/
    pq_topk): the corpus is compressed to 4 subspace codes per vector
    (the billion-scale memory trick — 4 ints instead of 64 floats) and
    queries rank by asymmetric distance to the reconstruction (ADC), the
    fourth ANN path next to brute force, SRP-LSH, and IVF. Encoding and
    the per-query ADC lookup tables are in-row against the data-free LCG
    codebooks (exact integer L2, lowest-code ties), so the oracle
    rebuilds the identical index relationally."""
    from .operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(emb.filter(F.col("vec_id") < 10), emb, k_out=5)


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
    from .operators.graph import triangle_count

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


def _kcore_round(r: int, k: int) -> str:
    """One unrolled peel: degrees on e{r-1}, keep deg>=k, restrict."""
    return f"""
    d{r} AS (SELECT node, COUNT(*) AS d FROM (
               SELECT s1 AS node FROM e{r - 1}
               UNION ALL SELECT s2 FROM e{r - 1}) GROUP BY 1),
    k{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
    e{r} AS (SELECT e.s1, e.s2 FROM e{r - 1} e
             JOIN k{r} a ON e.s1 = a.node
             JOIN k{r} b ON e.s2 = b.node)"""


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
    from .operators.graph import k_core

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


@register(
    "q_subquery_lateral",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-2 orders by price).
    Spark 3.2+ parses JOIN LATERAL and decorrelates it into a
    rank-filtered window over the join — no per-row re-execution of the
    inner query (that driver-loop shape is the thing LATERAL exists to
    avoid in a distributed plan). Unique (o_totalprice, o_orderkey)
    tiebreak keeps the LIMIT deterministic in both engines.

    Scale: decorrelates to one equi-join + one window partitioned by
    c_custkey; both shuffle on the customer key and AQE handles skew."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_cust_lat"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_lat"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM v_cust_lat c
        JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM v_orders_lat o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "q_window_percent_rank",
    """
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution window functions: percent_rank ((rank-1)/(n-1))
    and cume_dist (peers/n) per market segment. The order key carries
    c_custkey as a unique tiebreak so every row's rank — and therefore
    both quotients — is identical across engines; each value is a single
    IEEE division, so the doubles match bit-for-bit.

    Scale: one shuffle on c_mktsegment; low-cardinality partitions are
    the known hazard for global-order windows, but segment cardinality
    here bounds each partition to ~1/5 of customers and the frame is
    unbounded (no per-row frame re-scan)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_table_checksum",
    """
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat_ws('|',
                 l_orderkey, l_linenumber, l_returnflag, l_linestatus)),
                 1, 12)) AS BIGINT) AS DECIMAL(38, 0)))
             AS DECIMAL(38, 0)) AS VARCHAR) AS cksum,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprint: per returnflag, the sum of
    a 48-bit md5 prefix of each row's canonical '|'-joined key string,
    plus the row count. This is the migration-audit primitive for
    verifying a 100 TB copy (engine A vs engine B) without sorting or
    moving the data — the checksum is commutative, so it needs only one
    scan and a map-side-combinable agg on each side. Only exactly-
    representable columns (ints, strings) enter the canonical string,
    because float formatting is engine-specific.

    The accumulator is DECIMAL(38,0), NOT int64: 48-bit prefixes
    overflow a long at ~32k rows per group — the first bench run at
    sf0.1 (200k rows/group) crashed under ANSI mode exactly there,
    while sf0.01 passed at 5.6e18 of int64's 9.2e18 ceiling. Decimal
    partials are still map-side combinable; capacity is 10^38 ≈ 2^48 ×
    10^23 rows per group. The OUTPUT column is the checksum rendered as
    a decimal string: DuckDB surfaces the same accumulator as HUGEINT/
    DECIMAL physical types whose value hash differs from Spark's
    Decimal128 under type-sensitive comparison, while the digit string
    is identical on both engines (r6 verdict #1).

    Scale: one scan, one tiny shuffle (3 groups); partial sums combine
    map-side so the exchange carries bytes, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|", "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    prefix48 = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast(
        "bigint"
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(prefix48.cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("cksum"),
        F.count(F.lit(1)).alias("n"),
    )


def _lp_round(k: int, prev: str) -> str:
    """One unrolled min-label-propagation round as a DuckDB CTE: each
    node takes the min of its own label and its neighbors' labels."""
    return f"""
    l{k} AS (
      SELECT p.node,
             LEAST(p.lab, COALESCE(MIN(p2.lab), p.lab)) AS lab
      FROM {prev} p
      LEFT JOIN edges e ON e.src = p.node
      LEFT JOIN {prev} p2 ON p2.node = e.dst
      GROUP BY p.node, p.lab)"""


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
    "q_cogroup_reconcile",
    """
    SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           COALESCE(l.cents, 0) AS line_cents,
           COALESCE(l.n, 0) AS n_lines
    FROM orders o
    FULL JOIN (SELECT l_orderkey,
                      CAST(SUM(CAST(round(l_extendedprice * 100)
                          AS BIGINT)) AS BIGINT) AS cents,
                      COUNT(*) AS n
               FROM lineitem GROUP BY 1) l
      ON o.o_orderkey = l.l_orderkey
    """,
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped custom merge (df.groupBy(k).cogroup(other.groupBy(k))
    .applyInPandas): orders and their lineitems arrive as two aligned
    pandas frames and a Python reconciliation emits header total vs
    summed line revenue — the escape hatch for per-key merge logic SQL
    can't express (here it CAN, which is what makes the oracle possible;
    the query pins the cogroup plumbing: key alignment, empty-side
    frames, Arrow batch shapes). Money moves as integer cents (pandas/
    Python round is half-even while DuckDB round() is
    half-away-from-zero, but 2-decimal prices times 100 can never land
    on a .5 tie, so the engines agree on every input this data can
    produce).

    The cogroup key is a COARSE bucket (orderkey % 64), not the raw
    orderkey: applyInPandas invokes Python once per group, so keying on
    orderkey means one interpreter call per order — O(keys) constant
    overhead that measured ~60 s at sf0.01 (15k calls) and scales with
    the key count, the classic cogroup anti-pattern. Bucketing fixes
    the call count at 64 and does the per-order merge VECTORIZED inside
    each call (pandas groupby + outer merge) — same shuffle (both sides
    hash-partition once), same semantics, per-call work is data-
    proportional. At 100 TB you'd size the bucket count to cores, not
    rows.

    Scale: cogroup shuffles both sides by the bucket once — same cost
    as the equivalent join; per-bucket frames are ~1/64 of each side,
    bounded by bucket count not key count."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", (F.col("o_orderkey") % 64).alias("b")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", (F.col("l_orderkey") % 64).alias("b")
    )

    def reconcile(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if len(ldf):
            lagg = (
                ldf.assign(
                    cents=(ldf["l_extendedprice"] * 100)
                    .round()
                    .astype("int64")
                )
                .groupby("l_orderkey", as_index=False)
                .agg(cents=("cents", "sum"), n=("cents", "size"))
            )
        else:
            lagg = pd.DataFrame(
                {
                    "l_orderkey": pd.array([], dtype="int64"),
                    "cents": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        oh = odf[["o_orderkey", "o_totalprice"]].copy()
        oh["total_cents"] = (
            (oh["o_totalprice"] * 100).round().astype("Int64")
            if len(oh)
            else pd.array([], dtype="Int64")
        )
        m = oh.merge(
            lagg, left_on="o_orderkey", right_on="l_orderkey", how="outer"
        )
        key = m["o_orderkey"].where(
            m["o_orderkey"].notna(), m["l_orderkey"]
        )
        return pd.DataFrame(
            {
                "o_orderkey": key.astype("int64"),
                "total_cents": m["total_cents"].astype("Int64"),
                "line_cents": m["cents"].fillna(0).astype("int64"),
                "n_lines": m["n"].fillna(0).astype("int64"),
            }
        )

    return (
        orders.groupBy("b")
        .cogroup(li.groupBy("b"))
        .applyInPandas(
            reconcile,
            "o_orderkey bigint, total_cents bigint, line_cents bigint,"
            " n_lines bigint",
        )
    )


@register(
    "q_source_partition_prune",
    """
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'purchase' GROUP BY 1
    """,
)
def q_source_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout + partition pruning: events are written
    under the warehouse partitioned by event_type, read back, and
    filtered to one partition value — the directory-level skip that
    makes a 100 TB corpus queryable by its routing dimension without
    scanning it (the batch analogue of the reference's topic fan-out:
    one directory per route). tests/test_scale_plans.py asserts the
    pruned scan reads a single partition directory.

    Scale: pruning happens at file listing, before any I/O; the
    partition column must be low-cardinality (event_type: 5 values) or
    the small-files explosion outweighs the skip."""
    ev = load_table(spark, sf_dir, "events")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = f"{warehouse}/pp_events_{sf_dir.strip('/').split('/')[-1]}"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("value")).alias("total"),
        )
    )


@register(
    "q_pk_uniqueness_audit",
    """
    SELECT 'orders.o_orderkey' AS pk,
           (SELECT COUNT(*) FROM orders) AS n_rows,
           (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_keys
    UNION ALL
    SELECT 'customer.c_custkey',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(DISTINCT c_custkey) FROM customer)
    UNION ALL
    SELECT 'part.p_partkey',
           (SELECT COUNT(*) FROM part),
           (SELECT COUNT(DISTINCT p_partkey) FROM part)
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM
             (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
    UNION ALL
    SELECT 'documents.doc_id',
           (SELECT COUNT(*) FROM documents),
           (SELECT COUNT(DISTINCT doc_id) FROM documents)
    """,
)
def q_pk_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit — the PK half of constraint
    validation (q_fk_integrity_audit is the FK half): rows vs distinct
    key count per declared key, including the composite lineitem key.
    n_rows − n_keys > 0 names a table whose ingest double-wrote. Each
    check is one count-distinct agg (map-side partial on the key), the
    five checks union into one lazy plan."""
    tables = {
        "orders.o_orderkey": ("orders", ["o_orderkey"]),
        "customer.c_custkey": ("customer", ["c_custkey"]),
        "part.p_partkey": ("part", ["p_partkey"]),
        "lineitem.(l_orderkey,l_linenumber)": (
            "lineitem",
            ["l_orderkey", "l_linenumber"],
        ),
        "documents.doc_id": ("documents", ["doc_id"]),
    }
    out = None
    for name, (tbl, keys) in tables.items():
        df = load_table(spark, sf_dir, tbl)
        chk = df.agg(
            F.lit(name).alias("pk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
        ).select("pk", "n_rows", "n_keys")
        out = chk if out is None else out.unionByName(chk)
    return out


@register(
    "q_fk_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           (SELECT COUNT(*) FROM lineitem) AS n_checked,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    """,
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for the four core
    foreign keys — the constraint validation a lakehouse must run
    itself (no FK enforcement at write time anywhere in the large-scale
    stack). Each check is one LEFT ANTI join counted; the dimension
    sides broadcast when small, and at 100 TB each becomes one
    shuffle-on-key semi-join — there is no cheaper shape for exact
    orphan detection. A healthy snapshot reads all-zeros; a nonzero row
    names the broken ingest."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")

    def check(name, child, child_key, parent, parent_key):
        # lazy 1-row aggregate: left join against the distinct parent
        # keys, count rows and unmatched rows in one pass (no
        # driver-side counts — the four checks union into one plan)
        pk = parent.select(
            F.col(parent_key).alias(child_key)
        ).distinct().withColumn("__hit", F.lit(1))
        return (
            child.select(child_key)
            .join(pk, child_key, "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(
                    F.when(F.col("__hit").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select("fk", "n_checked", "n_orphans")
        )

    checks = [
        check("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        check("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        check("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"),
        check("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "q_stats_ab_ttest",
    """
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS ss
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type),
    a AS (SELECT n, s, ss FROM g WHERE event_type = 'purchase'),
    b AS (SELECT n, s, ss FROM g WHERE event_type = 'click'),
    m AS (
      SELECT a.n AS n1, b.n AS n2,
             a.s / CAST(a.n AS DOUBLE) AS m1,
             b.s / CAST(b.n AS DOUBLE) AS m2,
             (a.ss - (a.s * a.s) / CAST(a.n AS DOUBLE))
               / CAST(a.n - 1 AS DOUBLE) AS v1,
             (b.ss - (b.s * b.s) / CAST(b.n AS DOUBLE))
               / CAST(b.n - 1 AS DOUBLE) AS v2
      FROM a CROSS JOIN b)
    SELECT n1, n2, m1, m2, v1, v2,
           (m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)
                            + v2 / CAST(n2 AS DOUBLE)) AS t_welch,
           ((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
            * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)))
           / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                / CAST(n1 - 1 AS DOUBLE)
              + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                / CAST(n2 - 1 AS DOUBLE)) AS df_welch
    FROM m
    """,
)
def q_stats_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between purchase and click values —
    the A/B significance gate (unequal variances, Welch–Satterthwaite
    df). Sums and sums-of-squares ride DECIMAL (2dp inputs ⇒ 4dp
    squares, both exact and order-free); every downstream mean /
    variance / t / df is a fixed IEEE expression tree over those exact
    aggregates — sqrt is correctly-rounded by IEEE 754, so unlike
    exp/log it is safe in hashed outputs. Scale: one map-side
    combinable agg per group, then 1-row arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    g = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s"),
            F.sum(dec * dec).cast("double").alias("ss"),
        )
    )
    a = g.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    b = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    m = a.crossJoin(F.broadcast(b)).select(
        "n1",
        "n2",
        (F.col("s1") / F.col("n1").cast("double")).alias("m1"),
        (F.col("s2") / F.col("n2").cast("double")).alias("m2"),
        (
            (F.col("ss1") - (F.col("s1") * F.col("s1")) / F.col("n1").cast("double"))
            / (F.col("n1") - 1).cast("double")
        ).alias("v1"),
        (
            (F.col("ss2") - (F.col("s2") * F.col("s2")) / F.col("n2").cast("double"))
            / (F.col("n2") - 1).cast("double")
        ).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1").cast("double")
    se2 = F.col("v2") / F.col("n2").cast("double")
    return m.select(
        "n1",
        "n2",
        "m1",
        "m2",
        "v1",
        "v2",
        ((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)).alias("t_welch"),
        (
            ((se1 + se2) * (se1 + se2))
            / (
                se1 * se1 / (F.col("n1") - 1).cast("double")
                + se2 * se2 / (F.col("n2") - 1).cast("double")
            )
        ).alias("df_welch"),
    )


@register(
    "q_benford_audit",
    """
    WITH c0 AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0),
    dg AS (
      SELECT CASE
             WHEN c >= 1000000000 THEN c // 1000000000
             WHEN c >= 100000000 THEN c // 100000000
             WHEN c >= 10000000 THEN c // 10000000
             WHEN c >= 1000000 THEN c // 1000000
             WHEN c >= 100000 THEN c // 100000
             WHEN c >= 10000 THEN c // 10000
             WHEN c >= 1000 THEN c // 1000
             WHEN c >= 100 THEN c // 100
             WHEN c >= 10 THEN c // 10
             ELSE c END AS digit
      FROM c0),
    obs AS (SELECT digit, COUNT(*) AS n_obs FROM dg GROUP BY digit),
    t AS (SELECT SUM(n_obs) AS n FROM obs)
    SELECT CAST(digit AS INTEGER) AS digit, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(CASE digit WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129 WHEN 9 THEN 0.04575749056067514 END AS DOUBLE) AS exp_share,
           CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
           CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(CASE digit WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129 WHEN 9 THEN 0.04575749056067514 END AS DOUBLE) AS deviation
    FROM obs CROSS JOIN t
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance audit over order totals — the
    classic numeric-integrity screen (fabricated or unit-mangled values
    drift from log10(1+1/d)). The first digit is extracted with an
    integer magnitude CASE over exact cents (no log10, no string
    formatting — floats never touch the digit), expected shares are
    pasted full-precision literals (identical parse in both engines),
    and the output is PER-DIGIT (share + deviation, one IEEE
    divide/subtract each) — no float aggregation whose order could
    differ. Scale: one map + a 9-key agg; the total is a 1-row
    broadcast."""
    cents = (
        F.col("o_totalprice").cast("decimal(12,2)") * 100
    ).cast("long")
    digit = F.expr(
        """CASE
             WHEN c >= 1000000000 THEN c DIV 1000000000
             WHEN c >= 100000000 THEN c DIV 100000000
             WHEN c >= 10000000 THEN c DIV 10000000
             WHEN c >= 1000000 THEN c DIV 1000000
             WHEN c >= 100000 THEN c DIV 100000
             WHEN c >= 10000 THEN c DIV 10000
             WHEN c >= 1000 THEN c DIV 1000
             WHEN c >= 100 THEN c DIV 100
             WHEN c >= 10 THEN c DIV 10
             ELSE c END"""
    )
    exp_share = F.expr("CASE digit WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129 WHEN 9 THEN 0.04575749056067514 END").cast("double")
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(cents.alias("c"))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = obs.agg(F.sum("n_obs").alias("n"))
    obs_share = F.col("n_obs").cast("double") / F.col("n").cast("double")
    return obs.crossJoin(F.broadcast(t)).select(
        F.col("digit").cast("int").alias("digit"),
        "n_obs",
        exp_share.alias("exp_share"),
        obs_share.alias("obs_share"),
        (obs_share - exp_share).alias("deviation"),
    )


@register(
    "q_join_dpp",
    f"""
    WITH f AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             l_extendedprice, l_discount
      FROM lineitem),
    y AS (
      SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS ship_year
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1996-01-01')
    SELECT f.ship_year, COUNT(*) AS n,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM f JOIN y USING (ship_year)
    GROUP BY f.ship_year
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: lineitem lives hive-partitioned by
    ship year; the join's dim side (years with urgent 1995 orders) is
    only known at runtime, so no static filter can prune — Catalyst
    inserts a DynamicPruningExpression into the fact scan that reuses
    the broadcast join's build side as a partition filter, and the scan
    lists ONE year directory out of seven (plan-pinned in
    tests/test_scale_plans.py). This is the partition-level analogue of
    the bloom prefilter query, and the single most important scan
    optimization for star joins at 100 TB: the fact side's I/O is
    bounded by the dim filter's selectivity, decided per run, for free.

    Scale: the dim aggregates to a handful of distinct years →
    broadcast; the fact scan prunes before I/O. The warehouse write is
    per-sf-dir, once (overwrite), like the other layout queries."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = f"{warehouse}/dpp_lineitem_{sf_dir.strip('/').split('/')[-1]}"
    li.select(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        "l_extendedprice",
        "l_discount",
    ).write.mode("overwrite").partitionBy("ship_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .select(F.year("o_orderdate").cast("int").alias("ship_year"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "ship_year")
        .groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_revenue()).cast("double").alias("revenue"),
        )
    )


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
    "q_source_schema_evolution",
    """
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1)
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(o_orderpriority) AS n_with_priority,
           MIN(o_orderpriority) AS min_priority
    FROM unioned GROUP BY 1
    """,
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across dataset generations: generation A was
    written before the `o_orderpriority` column existed, generation B
    carries it; one mergeSchema read unions both directories with NULL
    fill for the missing column — the standard drift pattern of any
    long-lived 100 TB corpus (new fields appear; old files never get
    rewritten). The oracle reproduces the union + NULL-fill relationally
    on the original table.

    Scale: mergeSchema reconciles FOOTERS (per-file metadata), not data;
    the read itself stays a normal parallel parquet scan with pruning
    intact. The caveat that keeps this pattern honest at 100 TB:
    reconciliation cost grows with file COUNT, so wide-evolution corpora
    pair it with a table-format manifest (or a user-supplied schema) —
    exactly what the explicit-schema roundtrip queries pin."""
    orders = load_table(spark, sf_dir, "orders")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    tag = sf_dir.strip("/").split("/")[-1]
    base = f"{warehouse}/schema_evo_{tag}"
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    ).write.mode("overwrite").parquet(f"{base}/gen=a")
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{base}/gen=b")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=a", f"{base}/gen=b"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.min("o_orderpriority").alias("min_priority"),
    )


# Ordered BPE merge table (word chars + </w> terminator). Symbols are
# DELIMITER-WRAPPED in the replace stream ("|o|t|h|e|r|</w>|") so a
# merge is one global replace of "|a|b|" -> "|ab|": the closing "|"
# after each symbol makes cross-boundary prefix matches impossible
# ("|th|e|" cannot match inside "|th|er</w>|" — an undelimited "th e"
# WOULD, which tests/test_llm_ops.py pins as the bug this form fixes).
# Spark replace() and DuckDB replace() share single-pass left-to-right
# semantics, so both engines agree on every input; vs canonical BPE the
# ONLY residual divergence is the same pair repeating immediately
# adjacent (a b a b — the replace's consumed trailing delimiter hides
# the second occurrence for that pass), pinned by the same test.
# Precondition: "|" never appears in a token. Derived offline from the
# corpus vocabulary.
_BPE_MERGES = [
    ("e r", "er"),
    ("er </w>", "er</w>"),
    ("t h", "th"),
    ("th e", "the"),
    ("the </w>", "the</w>"),
    ("o r", "or"),
    ("a n", "an"),
    ("i n", "in"),
    ("s c", "sc"),
    ("sc an", "scan"),
    ("j o", "jo"),
    ("jo in", "join"),
]


def _bpe_oracle_replace_chain(expr: str) -> str:
    for a, b in _BPE_MERGES:
        pa = "|" + a.replace(" ", "|") + "|"
        pb = f"|{b}|"
        expr = f"replace({expr}, '{pa}', '{pb}')"
    return expr


@register(
    "text_bpe_encode",
    f"""
    WITH words AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''),
    vocab AS (SELECT DISTINCT w FROM words),
    enc AS (
      SELECT w,
             {_bpe_oracle_replace_chain(
                 "'|' || array_to_string(string_split(w, ''), '|')"
                 " || '|</w>|'"
             )} AS e
      FROM vocab),
    vn AS (
      SELECT w, CAST(len(string_split(e, '|')) - 2 AS BIGINT) AS n_sub
      FROM enc)
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_subwords
    FROM words JOIN vn USING (w)
    GROUP BY doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization — APPLYING a trained merge table (the encode
    half of byte-pair encoding; training the table is a driver-side
    loop over pair counts, the applying is what runs over 100 TB).
    Per-doc output: word count and post-merge subword count (the
    compression the tokenizer achieves).

    The scale pattern is DICTIONARY ENCODING: the expensive per-token
    transform (char split + chained merge replaces) runs on the
    DISTINCT vocabulary only — thousands of rows — then broadcast-joins
    back onto the exploded corpus; per-corpus cost is one explode + one
    broadcast hash join, independent of how elaborate the tokenizer
    is. This is exactly how a production pipeline tokenizes a repeated
    vocabulary (and why tokenizer microbenchmarks on unique-string
    corpora mislead). Merge application = ordered single-pass global
    replaces over the DELIMITER-WRAPPED symbol stream ("|t|h|e|</w>|");
    the wrapping makes cross-boundary prefix matches impossible and the
    form equal to canonical BPE except on immediately-adjacent repeats
    of one pair — both engines share replace() semantics and the
    equivalence envelope is pinned in tests/test_llm_ops.py (see
    _BPE_MERGES).

    Scale: explode is narrow; vocab distinct is a small shuffle; the
    join back is broadcast. No Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.select("w").distinct()
    enc = F.concat(
        F.lit("|"),
        F.array_join(
            F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
            "|",
        ),
        F.lit("|</w>|"),
    )
    for a, b in _BPE_MERGES:
        pa = "|" + a.replace(" ", "|") + "|"
        enc = F.replace(enc, F.lit(pa), F.lit(f"|{b}|"))
    vn = vocab.select(
        "w",
        (F.size(F.split(enc, r"\|")) - 2).cast("long").alias("n_sub"),
    )
    return (
        words.join(F.broadcast(vn), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


@register(
    "sim_scalar_quantize_int8",
    """
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx
      FROM embeddings),
    coded AS (
      SELECT vec_id, mn, mx, v,
             CASE WHEN mx = mn
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x ->
                    CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5)
                         AS BIGINT))
             END AS c
      FROM base)
    SELECT vec_id, mn, mx,
           CAST(len(v) AS INTEGER) AS n_dims,
           CAST(list_sum(c) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(c, (x, i) -> i * x))
                AS BIGINT) AS code_wsum,
           CAST(list_sum(list_transform(v, (x, i) ->
                 CAST(floor(
                   (x - (mn + c[i] * (mx - mn) / 255.0))
                   * (x - (mn + c[i] * (mx - mn) / 255.0))
                   * 1e12 + 0.5) AS BIGINT)))
                AS BIGINT) AS err_fp
    FROM coded
    """,
)
def sim_scalar_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    4x storage/bandwidth cut before ANN indexing (per-vector min/max
    affine scale to [0,255] codes) plus the reconstruction-error audit
    that decides whether int8 is acceptable for a given corpus.

    Cross-engine exactness: codes come from floor(z + 0.5) on
    identically-computed IEEE doubles (no engine-specific rounding
    mode); the error sum is per-element FIXED-POINT (floor(e^2 * 1e12))
    summed as int64, so element order cannot perturb a float
    accumulation. code_wsum is the 1-based index-weighted sum — an
    order-sensitive checksum of the full code vector without shipping
    it. Everything is built-in HOFs (transform/aggregate): JVM-side,
    whole-stage codegen, zero Python.

    Scale: row-local (no shuffle at all); at 100 TB this runs at scan
    speed and writes 1/4 the bytes."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        dv.alias("v"),
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
    )
    mn, mx = F.col("mn"), F.col("mx")

    def code(x):
        return F.floor((x - mn) * F.lit(255.0) / (mx - mn) + F.lit(0.5)).cast(
            "long"
        )

    coded = base.withColumn(
        "c",
        F.when(
            mx == mn,
            F.transform(F.col("v"), lambda x: F.lit(0).cast("long")),
        ).otherwise(F.transform(F.col("v"), code)),
    )

    def sum_long(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    recon_err_fp = F.transform(
        F.col("v"),
        lambda x, i: F.floor(
            (x - (mn + F.element_at(F.col("c"), i + 1) * (mx - mn) / 255.0))
            * (x - (mn + F.element_at(F.col("c"), i + 1) * (mx - mn) / 255.0))
            * F.lit(1e12)
            + F.lit(0.5)
        ).cast("long"),
    )
    return coded.select(
        "vec_id",
        "mn",
        "mx",
        F.size("v").alias("n_dims"),
        sum_long(F.col("c")).alias("code_sum"),
        sum_long(
            F.transform(F.col("c"), lambda x, i: (i + 1) * x)
        ).alias("code_wsum"),
        sum_long(recon_err_fp).alias("err_fp"),
    )


@register(
    "sim_topk_rerank",
    f"""
    WITH {_PQ_CTES},
    cand AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY adc_dist ASC, neighbor_id) AS rn
            FROM scored)
      WHERE rn <= 20),
    exact AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_dot_product(qq.qv, qq.qv) AS BIGINT)
               - 2 * CAST(list_dot_product(qq.qv, qn.qv) AS BIGINT)
               + CAST(list_dot_product(qn.qv, qn.qv) AS BIGINT)
               AS exact_dist
      FROM cand c
      JOIN q qq ON qq.vec_id = c.query_id
      JOIN q qn ON qn.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, exact_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY exact_dist ASC, neighbor_id) AS rn
          FROM exact)
    WHERE rn <= 5
    """,
)
def sim_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine retrieval — the canonical two-stage ANN serving
    pattern: PQ/ADC generates 20 candidates per query from the
    compressed index (operators/similarity.py:pq_topk, 4 ints per
    corpus row), then ONLY those 10x20 pairs are reranked by exact
    fixed-point L2 against the full vectors. The quantization error
    that reorders PQ's tail ranks is repaired where it matters (the
    head) at the cost of touching 20 full vectors per query instead of
    the whole corpus — the recall/cost dial every production vector
    store (FAISS refine, ScaNN reorder) exposes.

    Scale: stage 1 streams the coded corpus against broadcast ADC
    tables; stage 2 is a candidate-set (O(queries x 20)) broadcast join
    back to the full vectors — corpus bandwidth stays PQ-compressed, the
    exact reads are point lookups. Distances are integer (x1024
    fixed-point, same convention as the PQ index), so ranks are
    deterministic cross-engine."""
    from .operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cand = pq_topk(emb.filter(F.col("vec_id") < 10), emb, k_out=20).select(
        "query_id", "neighbor_id"
    )
    qv = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1024.0)).cast("long"),
        ).alias("qv"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qq, qn = F.col("q.qv"), F.col("n.qv")
    exact = (
        cand.join(F.broadcast(qv.alias("q")), F.col("query_id") == F.col("q.vec_id"))
        .join(qv.alias("n"), F.col("neighbor_id") == F.col("n.vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(qq, qq) - 2 * dot(qq, qn) + dot(qn, qn)).alias("exact_dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy("exact_dist", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
    )


def _bigram_lm(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, lm_fp) for the given documents relation — the
    corpus-self-trained integer-fixed-point bigram LM shared by
    text_bigram_lm_score, sample_perplexity_buckets and
    pipeline_curate_cap (the LM trains on whatever corpus the caller
    passes: the full table for the standalone score, the deduped
    survivors inside the curation pipeline)."""
    arr = docs.select("doc_id", F.split("text", " ").alias("a"))
    # CASE guard: sequence(1, 0) is the DESCENDING array [1, 0], so a
    # single-token document would evaluate element_at(a, 0) and die
    # under ANSI — the oracle's generate_series(1, 0) is simply empty.
    # Empty array -> explode drops the doc, matching the oracle.
    bg = arr.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(a) >= 2 THEN"
                " filter(transform(sequence(1, size(a) - 1),"
                " i -> struct(element_at(a, i) AS w1,"
                " concat(element_at(a, i), ' ', element_at(a, i + 1)) AS b,"
                " element_at(a, i + 1) AS w2)),"
                " p -> p.w1 <> '' AND p.w2 <> '')"
                " ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.b")
    uc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("uc"))
    )
    bc = bg.groupBy("b").agg(F.count(F.lit(1)).alias("bc"))
    return (
        bg.join(F.broadcast(bc), "b")
        .join(F.broadcast(uc), F.col("w1") == F.col("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr("bc * 1000000 DIV uc")).alias("lm_fp"),
        )
    )


@register(
    "text_bigram_lm_score",
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
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(bc.c * 1000000 // uc.c) AS BIGINT) AS lm_fp
    FROM bg JOIN bc USING (b) JOIN uc ON uc.w = bg.w1
    GROUP BY bg.doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score (the KenLM-style fluency
    gate of CCNet/RefinedWeb pipelines, self-trained on the corpus):
    per document, the summed conditional bigram probability mass
    P(w2|w1) = count(w1 w2)/count(w1), estimated from corpus counts.
    Low mass ⇒ improbable word sequences ⇒ quality-filter candidate.

    Cross-engine exactness: probabilities ride as INTEGER fixed-point
    (count*1e6 DIV count — exact integer division in both engines) and
    sum as int64, replacing the log-domain float accumulation whose
    ordering neither engine pins. The monotone ranking a filter
    thresholds on is unchanged.

    Scale: the model is VOCAB-BOUNDED (unigram + bigram count tables ≤
    |V|² rows regardless of corpus size), built by one map-side-
    combinable agg each, then broadcast back onto the exploded corpus —
    per-doc scoring never shuffles the corpus itself. Bigrams come from
    an index-aware HOF over the split array (no self-join, no
    posexplode alignment shuffle)."""
    return _bigram_lm(load_table(spark, sf_dir, "documents"))


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


# --------------------------------------------------------------------------
# round-8 widening: radius retrieval, late-interaction scoring, regression
# / diversity stats, link-prediction + BFS graph ops, BM25 ranking,
# containment dedup, cohort retention
# --------------------------------------------------------------------------


@register(
    "sim_range_search",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 10
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id)
    WHERE cos_sim >= 0.25
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius retrieval (FAISS range_search): every neighbor within a
    cosine threshold, answer set size data-dependent. Unlike top-k
    there is NO per-query window shuffle — the threshold filter runs
    inside the one narrow corpus scan stage (operators/similarity.py:
    range_search), so the plan is strictly cheaper than brute-force
    top-k. Fixed-point cosine ⇒ the >= compare is bit-deterministic."""
    from .operators.similarity import range_search

    emb = load_table(spark, sf_dir, "embeddings")
    return range_search(emb.filter(F.col("vec_id") < 10), emb, threshold=0.25)


@register(
    "sim_maxsim_multivector",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS token_id, c.vec_id AS cid,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 4
      GROUP BY 1, 2),
    scored AS (
      SELECT e.label AS doc, dots.token_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN embeddings e ON e.vec_id = dots.cid
      JOIN norms nq ON nq.vec_id = dots.token_id
      JOIN norms nc ON nc.vec_id = dots.cid),
    per_token AS (
      SELECT doc, token_id, MAX(cos_sim) AS best
      FROM scored GROUP BY 1, 2)
    SELECT doc,
           SUM(CAST(floor(best * {_FIXED}) AS BIGINT)) / {_FIXED} AS maxsim,
           COUNT(*) AS n_tokens
    FROM per_token GROUP BY doc
    """,
)
def sim_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT) MaxSim: multi-vector documents (all
    embeddings sharing a label) scored against a small query-token set
    as Σ_token max_docvec cos. Plan: corpus × broadcast(4 tokens) in one
    map stage, then two map-side-combinable keyed aggs ((doc, token)
    max → doc fixed-point sum) — never a doc×doc product
    (operators/similarity.py:maxsim_multivector). The cross-token sum
    goes through fixed-point floor so accumulation order is moot."""
    from .operators.similarity import maxsim_multivector

    emb = load_table(spark, sf_dir, "embeddings")
    return maxsim_multivector(emb.filter(F.col("vec_id") < 4), emb)


@register(
    "q_stats_linreg",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(user_id) AS sx,
             SUM(CAST(value AS DECIMAL(12,2))) AS sy,
             SUM(CAST(user_id AS DECIMAL(18,0))
                 * CAST(value AS DECIMAL(12,2))) AS sxy,
             SUM(user_id * user_id) AS sxx,
             SUM(CAST(value AS DECIMAL(12,2))
                 * CAST(value AS DECIMAL(12,2))) AS syy
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM s
    """,
)
def q_stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (slope / intercept / r²) from
    the five classical sufficient statistics — the REGR_* family
    re-expressed shuffle-minimal: ONE map-side-combinable agg computes
    the exact sums (BIGINT for x, decimal for y and cross terms — no
    float accumulation), then the closed-form arithmetic runs in double
    on exact operands with identical expression trees in both engines,
    so every output bit matches the oracle. Spark's built-in
    regr_slope/corr accumulate doubles (order-dependent); this shape is
    how a 100 TB fit stays deterministic AND one-pass."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sx"),
        F.sum(F.col("value").cast(DEC_PRICE)).alias("sy"),
        F.sum(
            F.col("user_id").cast("decimal(18,0)")
            * F.col("value").cast(DEC_PRICE)
        ).alias("sxy"),
        F.sum(F.col("user_id") * F.col("user_id")).alias("sxx"),
        F.sum(
            F.col("value").cast(DEC_PRICE) * F.col("value").cast(DEC_PRICE)
        ).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    slope = cov_n / var_n
    return s.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((cov_n * cov_n) / (var_n * (n * syy - sy * sy))).alias("r2"),
    )


@register(
    "q_stats_gini_diversity",
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS cnt
      FROM documents GROUP BY source, lang),
    s AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ssq,
             COUNT(*) AS n_langs
      FROM c GROUP BY source)
    SELECT source, n, CAST(n_langs AS INTEGER) AS n_langs,
           1.0 - CAST(ssq AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_diversity
    FROM s
    """,
)
def q_stats_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language diversity as the Gini–Simpson index
    1 − Σpᵢ² — the rational (log-free) diversity measure, chosen over
    Shannon entropy deliberately: entropy needs libm log whose last-ULP
    differs across engines, while Σcᵢ²/N² is exact-integer work plus
    one IEEE division. Corpus-composition dashboards at 100 TB are two
    map-side-combinable aggs — no distinct, no window."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    s = c.groupBy("source").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ssq"),
        F.count(F.lit(1)).cast("int").alias("n_langs"),
    )
    return s.select(
        "source",
        "n",
        "n_langs",
        (
            F.lit(1.0)
            - F.col("ssq").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("gini_diversity"),
    )


@register(
    "q_retention_cohort",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort,
                  CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER)
               AS week_offset
      FROM events e JOIN firsts f USING (user_id))
    SELECT cohort, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort, week_offset
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted
    distinct per (cohort, week-offset) — the product-analytics staple.
    Plan: one user-keyed agg for cohorts, joined back user-keyed (no
    broadcast needed at scale: both sides partition by user_id, AQE
    broadcasts when the cohort side is small), distinct on (user,
    cohort, offset) then count. Every shuffle is keyed on user or
    (cohort, offset); nothing is all-pairs. date_trunc week (Monday
    epoch) and integer day-diff // 7 are engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
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
    from .operators.graph import bfs_hops

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
    return bfs_hops(edges, sources, rounds=3)


@register(
    "dedup_ngram_containment",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS l FROM toks),
    ex AS (SELECT doc_id, len(l) AS n_shingles,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_shingles AS n_a, b.n_shingles AS n_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.shash = b.shash AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, n_inter, n_a, n_b,
           CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
             AS containment
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) >= 0.9
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle containment |∩|/min(|A|,|B|) over the same inverted-index
    candidate join as dedup_ngram_jaccard — catches SUBSET duplication
    (a short doc embedded in a long one) that symmetric Jaccard
    structurally misses (operators/dedup.py:ngram_containment_pairs)."""
    from .operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, threshold=0.9)


@register(
    "text_decontaminate_exact",
    f"""
    WITH toks AS (SELECT doc_id, {{TOKS}} AS t FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM sh a JOIN keep USING (shingle) JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    agg AS (SELECT doc_a, doc_b, COUNT(*) AS run_len
            FROM runs GROUP BY doc_a, doc_b, diag, isl),
    pairs AS (SELECT doc_a, doc_b,
                     CAST(MAX(run_len) + 7 AS BIGINT) AS overlap_tokens
              FROM agg GROUP BY doc_a, doc_b),
    straddle AS (
      SELECT CASE WHEN doc_a % 97 = 0 THEN doc_b ELSE doc_a END AS doc_id,
             CASE WHEN doc_a % 97 = 0 THEN doc_a ELSE doc_b END AS bench_id,
             overlap_tokens
      FROM pairs WHERE (doc_a % 97 = 0) <> (doc_b % 97 = 0))
    SELECT doc_id,
           CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_partners,
           CAST(MAX(overlap_tokens) AS BIGINT) AS max_overlap_tokens,
           CAST(CASE WHEN MAX(overlap_tokens) >= 13 THEN 1 ELSE 0 END
                AS INTEGER) AS contaminated
    FROM straddle GROUP BY doc_id
    """.replace("{TOKS}", _D_TOKS),
)
def text_decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by VERBATIM overlap — the Lee et al.
    ExactSubstr primitive pointed at eval leakage instead of dedup:
    training documents that share a ≥8-token verbatim run with any
    held-out benchmark document (here: doc_id % 97 = 0 plays the
    benchmark), with the standard ≥13-token contamination flag
    (the n-gram-Jaccard `text_contamination` catches paraphrase-level
    leakage; this catches the exact-copy kind that actually inflates
    benchmarks). Per train doc: how many benchmark partners, the
    longest verbatim overlap, and the flag.

    Scale: identical machinery to dedup_exact_substring (df-capped
    shingle inverted index + diagonal islands); production would
    shingle ONLY the benchmark side and semi-join the corpus stream
    against that tiny index — same plan, one side bounded."""
    from .operators.dedup import exact_substring_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_substring_pairs(docs, min_tokens=8, max_shingle_df=64)
    bench_a = F.col("doc_a") % 97 == 0
    bench_b = F.col("doc_b") % 97 == 0
    straddle = pairs.filter(bench_a != bench_b).select(
        F.when(bench_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "doc_id"
        ),
        F.when(bench_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "bench_id"
        ),
        "overlap_tokens",
    )
    return straddle.groupBy("doc_id").agg(
        F.count_distinct("bench_id").alias("n_bench_partners"),
        F.max("overlap_tokens").alias("max_overlap_tokens"),
        F.when(F.max("overlap_tokens") >= 13, 1)
        .otherwise(0)
        .cast("int")
        .alias("contaminated"),
    )


@register(
    "dedup_exact_substring",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM sh a JOIN keep USING (shingle) JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    agg AS (SELECT doc_a, doc_b, COUNT(*) AS run_len
            FROM runs GROUP BY doc_a, doc_b, diag, isl)
    SELECT doc_a, doc_b, CAST(SUM(run_len) AS BIGINT) AS n_anchors,
           CAST(MAX(run_len) + 7 AS BIGINT) AS overlap_tokens
    FROM agg GROUP BY doc_a, doc_b
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim ≥8-token cross-document overlap — the Lee et al. 2022
    ExactSubstr primitive the near-dup family (Jaccard/containment/
    MinHash) statistically approximates but never decides exactly.
    Shingle-anchored inverted-index self-join (sharing one 8-token
    shingle ⇔ having a ≥8-token verbatim overlap) + relational
    longest-common-extension: matched positions on one (pa−pb) diagonal
    form gaps-and-islands runs, max run + 7 = the longest overlap in
    tokens (operators/dedup.py:exact_substring_pairs). Boilerplate
    shingles with doc-frequency > 64 are dropped pre-join (quadratic
    fan-out guard at 100 TB; the cap is mirrored in the oracle)."""
    from .operators.dedup import exact_substring_pairs

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_pairs(docs, min_tokens=8, max_shingle_df=64)


@register(
    "dedup_exact_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM sh a JOIN keep USING (shingle) JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    agg AS (SELECT doc_a, doc_b, diag, isl, COUNT(*) AS run_len,
                   MIN(pa) AS start_a, MIN(pb) AS start_b
            FROM runs GROUP BY doc_a, doc_b, diag, isl),
    spans AS (
      SELECT DISTINCT doc_id, s, e FROM (
        SELECT doc_a AS doc_id, start_a AS s,
               start_a + run_len + 6 AS e FROM agg
        UNION ALL
        SELECT doc_b, start_b, start_b + run_len + 6 FROM agg)),
    fl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM spans),
    fi AS (
      SELECT doc_id, s, e,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM fl),
    mg AS (SELECT doc_id, isl, MIN(s) AS ms, MAX(e) AS me
           FROM fi GROUP BY doc_id, isl),
    pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                  CAST(SUM(me - ms + 1) AS BIGINT) AS covered_tokens
           FROM mg GROUP BY doc_id),
    lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT doc_id, n_spans, covered_tokens, n_tokens,
           CAST(covered_tokens * 1000 // n_tokens AS BIGINT)
             AS coverage_milli
    FROM pd JOIN lens USING (doc_id)
    """,
)
def dedup_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document verbatim-overlap COVERAGE — the REMOVE half of Lee
    et al.'s ExactSubstr (the paper deletes duplicated spans, not
    documents; dedup_exact_substring is the detector, this is the
    actionable per-doc map of what to cut). All cross-document overlap
    spans a document participates in (either side of any pair) merge
    into disjoint intervals via a second gaps-and-islands at interval
    granularity — a window flag + running sum, no self-join
    (operators/dedup.py:exact_substring_spans). All-integer output
    (coverage_milli = covered·1000 DIV n_tokens)."""
    from .operators.dedup import exact_substring_spans

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_spans(docs, min_tokens=8, max_shingle_df=64)


@register(
    "dedup_drop_substring",
    f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    lens AS (SELECT doc_id, len(t) AS n_toks FROM toks),
    sh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM sh a JOIN keep USING (shingle) JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    agg AS (SELECT doc_a, doc_b, COUNT(*) AS run_len
            FROM runs GROUP BY doc_a, doc_b, diag, isl),
    ov AS (SELECT doc_a, doc_b, MAX(run_len) + 7 AS overlap_tokens
           FROM agg GROUP BY doc_a, doc_b),
    pairs AS (
      SELECT doc_a, doc_b
      FROM ov JOIN lens la ON la.doc_id = ov.doc_a
              JOIN lens lb ON lb.doc_id = ov.doc_b
      WHERE 2 * overlap_tokens >= least(la.n_toks, lb.n_toks)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component
             FROM reach GROUP BY src)
    SELECT d.doc_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.component = d.doc_id
    """,
)
def dedup_drop_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step for exact-substring dedup: drop every document
    whose longest VERBATIM overlap with another covers ≥ half the
    shorter document (containment-by-verbatim-run — the deterministic
    cousin of dedup_drop_near's statistical LSH gate), keeping one
    canonical survivor (min doc_id) per overlap component. Same shape
    as the rest of the drop family: exact pairs
    (operators/dedup.py:exact_substring_pairs) → threshold → connected
    components → one anti-join against the corpus; everything upstream
    of the anti-join is cardinality-bounded by the qualifying pairs,
    never the corpus."""
    from .functions import text as TX
    from .operators.dedup import (
        connected_components_twolevel,
        exact_substring_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_substring_pairs(docs, min_tokens=8, max_shingle_df=64)
    lens = docs.select(
        "doc_id", F.size(TX.tokens(F.col("text"))).alias("n_toks")
    )
    qual = (
        pairs.join(
            lens.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_toks").alias("na"),
            ),
            "doc_a",
        )
        .join(
            lens.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_toks").alias("nb"),
            ),
            "doc_b",
        )
        .filter(
            F.lit(2) * F.col("overlap_tokens")
            >= F.least(F.col("na"), F.col("nb"))
        )
        .select("doc_a", "doc_b")
    )
    comp = connected_components_twolevel(qual)
    losers = comp.filter(F.col("component") != F.col("doc_id")).select(
        "doc_id"
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


@register(
    "dedup_passage_lsh",
    f"""
    WITH toks0 AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    nn AS (SELECT doc_id, t,
                  ((greatest(len(t) - 32, 0) + 31) // 32) + 1 AS n_chunks
           FROM toks0),
    cc AS (SELECT doc_id, t,
                  unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
           FROM nn),
    passages AS (
      SELECT doc_id * 1000 + chunk_idx AS doc_id,
             array_to_string(
               list_slice(t, chunk_idx * 32 + 1, chunk_idx * 32 + 32),
               ' ') AS text
      FROM cc),
    {_minhash_sig_sql(src="passages")}
    SELECT DISTINCT
      a.doc_id // 1000 AS doc_a,
      CAST(a.doc_id % 1000 AS INTEGER) AS chunk_a,
      b.doc_id // 1000 AS doc_b,
      CAST(b.doc_id % 1000 AS INTEGER) AS chunk_b
    FROM banded a
    JOIN ok ON a.band_key = ok.band_key
    JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE a.doc_id // 1000 <> b.doc_id // 1000
    """,
)
def dedup_passage_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASSAGE-granularity near-dup: the granularity production curation
    actually dedups at — a document that quotes one paragraph of
    another is invisible to whole-document MinHash (the rest of the
    text drowns the signature) but lights up when each 32-token
    non-overlapping passage carries its own signature. Composition of
    two existing operators: text_chunk_overlap's bound-once chunker
    (stride = size, so sibling chunks never trivially self-collide) →
    minhash_lsh_pairs over passages with a composite passage id
    (doc_id·1000 + chunk_idx), cross-document pairs only.

    Scale: chunking is a narrow Generate; the LSH self-join is the same
    capped band-key equi-join as dedup_minhash_lsh_pairs — passage rows
    are ~L/32× more numerous but each signature is over 32 tokens, so
    the shuffle volume per corpus byte is unchanged."""
    from .functions import exprs as EX
    from .functions import text as TX
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    size = stride = 32

    def chunks(t: F.Column) -> F.Column:
        n_chunks = (
            (F.greatest(F.size(t) - size, F.lit(0)) + (stride - 1))
            .cast("long")
            / stride
        ).cast("long") + 1
        return F.struct(
            t.alias("t"), F.sequence(F.lit(0), n_chunks - 1).alias("idx")
        )

    b = docs.select(
        "doc_id", EX.bind(TX.tokens(F.col("text")), chunks).alias("s")
    ).select(
        "doc_id",
        F.col("s.t").alias("t"),
        F.explode("s.idx").alias("chunk_idx"),
    )
    sliced = F.slice(F.col("t"), F.col("chunk_idx") * stride + 1, size)
    passages = b.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("pid"),
        F.concat_ws(" ", sliced).alias("text"),
    )
    pairs = minhash_lsh_pairs(
        passages,
        id_col="pid",
        k=_MINHASH_K,
        bands=_MINHASH_BANDS,
        max_bucket=_LSH_MAX_BUCKET,
    )
    da, db = F.expr("doc_a DIV 1000"), F.expr("doc_b DIV 1000")
    return (
        pairs.filter(da != db)
        .select(
            da.alias("doc_a"),
            (F.col("doc_a") % 1000).cast("int").alias("chunk_a"),
            db.alias("doc_b"),
            (F.col("doc_b") % 1000).cast("int").alias("chunk_b"),
        )
        .distinct()
    )


_BM25_TERMS = ("data", "vector", "query")


def _bm25_term_sql(term: str) -> str:
    """One fixed-point BM25 term contribution (k1=1.2, b=0.75, odds
    idf) — mirrors the Spark expression tree token for token."""
    tf = f"tf_{term}"
    df = f"df_{term}"
    return f"""
      CASE WHEN {tf} = 0 THEN 0 ELSE CAST(floor(
        ((CAST(2 * (nd - {df}) + 1 AS DOUBLE) / CAST(2 * {df} + 1 AS DOUBLE))
         * (CAST({tf} AS DOUBLE) * 2.2)
         / (CAST({tf} AS DOUBLE)
            + 1.2 * (0.25 + 0.75
                     * ((CAST(dl AS DOUBLE) * CAST(nd AS DOUBLE))
                        / CAST(tot AS DOUBLE)))))
        * 1048576.0) AS BIGINT) END"""


@register(
    "text_bm25_rank",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    per_doc AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT)"
                 f" AS tf_{w}" for w in _BM25_TERMS)}
      FROM toks),
    corpus AS (
      SELECT COUNT(*) AS nd, SUM(dl) AS tot,
             {", ".join(
                 f"SUM(CASE WHEN tf_{w} > 0 THEN 1 ELSE 0 END) AS df_{w}"
                 for w in _BM25_TERMS)}
      FROM per_doc)
    SELECT doc_id,
           ({" + ".join(_bm25_term_sql(w) for w in _BM25_TERMS)})
             / 1048576.0 AS bm25
    FROM per_doc CROSS JOIN corpus
    WHERE {" + ".join(f"tf_{w}" for w in _BM25_TERMS)} > 0
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document for a fixed 3-term query,
    entirely JVM-side: per-doc term frequencies are IN-ROW array
    filters (no explode, no shuffle), corpus statistics (N, Σdl, df_t)
    are ONE 1-row aggregate broadcast back, and each term's score is a
    fixed-point floor so the cross-term sum is order-free. The idf is
    the log-free odds form (N−df+0.5)/(df+0.5) — monotone in the
    classic log idf (same ranking) but exactly reproducible across
    engines, the same libm-avoidance contract as the rest of the repo
    (Robertson–Spärck Jones weight without the log).

    Scale: corpus stats are O(1) state; the scoring pass is one narrow
    map over the corpus — BM25 at 100 TB is scan-bound, exactly as it
    should be."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions import text as TX

    toks = TX.tokens(F.col("text"))

    def _tf(word: str) -> F.Column:
        # NB: a plain `lambda x, w=w:` would have arity 2, which PySpark's
        # HOF layer interprets as (element, index) — the index would
        # silently shadow the captured word. A factory keeps arity 1.
        return F.size(F.filter(toks, lambda x: x == F.lit(word)))

    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(w).cast("long").alias(f"tf_{w}") for w in _BM25_TERMS],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("tot"),
        *[
            F.sum(F.when(F.col(f"tf_{w}") > 0, 1).otherwise(0)).alias(f"df_{w}")
            for w in _BM25_TERMS
        ],
    )

    def term_fp(w: str) -> F.Column:
        tf = F.col(f"tf_{w}").cast("double")
        df = F.col(f"df_{w}")
        idf = (F.lit(2) * (F.col("nd") - df) + F.lit(1)).cast("double") / (
            F.lit(2) * df + F.lit(1)
        ).cast("double")
        dl_ratio = (
            F.col("dl").cast("double") * F.col("nd").cast("double")
        ) / F.col("tot").cast("double")
        score = (
            idf
            * (tf * F.lit(2.2))
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * dl_ratio))
        )
        return F.when(
            F.col(f"tf_{w}") == 0, F.lit(0).cast("long")
        ).otherwise(F.floor(score * F.lit(1048576.0)).cast("long"))

    total_tf = sum(
        (F.col(f"tf_{w}") for w in _BM25_TERMS[1:]),
        F.col(f"tf_{_BM25_TERMS[0]}"),
    )
    fp_sum = sum(
        (term_fp(w) for w in _BM25_TERMS[1:]), term_fp(_BM25_TERMS[0])
    )
    return (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(total_tf > 0)
        .select("doc_id", (fp_sum / F.lit(1048576.0)).alias("bm25"))
    )


@register(
    "q_heavy_hitters_mg",
    """
    WITH s AS (SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS u
               FROM events),
    c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    SELECT user_id, cnt AS n_events,
           CAST(cnt * u AS DOUBLE) / CAST(n AS DOUBLE) AS rel_freq
    FROM c CROSS JOIN s
    WHERE cnt * u * 5 > 6 * n
    """,
)
def q_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (users with >1.2× the mean event count) via
    Misra–Gries sketch-guided pruning: pass 1 builds per-partition
    k-counter MG summaries whose survivor union provably contains every
    key above frequency n/(k+1) (operators/sketches.py — the 1.2×-mean
    threshold is 1.2·n/u ≥ n/(k+1) whenever distinct keys u ≤ 1.2·(k+1)
    ≈ 2459 at k=2048; the test envelope tops out at u=1500 and a larger
    domain just means a proportionally larger k, still ≪ the key
    domain); pass 2 exact-counts ONLY the broadcast candidate set. At
    100 TB this replaces a full-domain groupBy shuffle with a
    cardinality-bounded one (≤ partitions·k candidate keys) plus a
    broadcast semi-join — the sketch prunes, the answer stays exact,
    which is why the oracle is the plain exact query.

    Threshold history: r8 used 2×-mean, which yields 0 rows at EVERY
    test scale factor (the driver green was an empty-vs-empty hash match
    — r8 verdict finding #1). 1.2× yields 1/9/83 rows at sf0.001/0.01/
    0.1. The comparison is kept all-integer (cnt·u·5 > 6·n) so Spark and
    DuckDB agree bit-for-bit with no float threshold."""
    from .operators.sketches import misra_gries_candidates

    ev = load_table(spark, sf_dir, "events")
    cand = misra_gries_candidates(ev, "user_id", k=2048)
    stats = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("u"),
    )
    counts = (
        ev.join(F.broadcast(cand), "user_id", "leftsemi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") * F.col("u") * F.lit(5) > F.lit(6) * F.col("n"))
        .select(
            "user_id",
            F.col("cnt").alias("n_events"),
            (
                (F.col("cnt") * F.col("u")).cast("double")
                / F.col("n").cast("double")
            ).alias("rel_freq"),
        )
    )


@register(
    "q_changepoint_cusum",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1),
    t AS (SELECT CAST(SUM(n) // COUNT(*) AS BIGINT) AS target FROM daily),
    r AS (
      SELECT day, n, target,
             SUM(n - target) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM daily CROSS JOIN t)
    SELECT day, n AS n_events,
           CAST(run - LEAST(MIN(run) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS BIGINT) AS cusum
    FROM r
    """,
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point statistic over the daily event-count
    series: the textbook recursion sᵢ = max(0, sᵢ₋₁ + (xᵢ − target)) is
    not directly expressible relationally, but the closed form
    sᵢ = Rᵢ − min_{j≤i} Rⱼ (R = running sum of deviations) is — two
    stacked window functions, no recursion, no UDF. All-integer
    arithmetic (target = floor-mean), so both engines agree bit-for-bit.

    Scale: the raw stream collapses to one row per day FIRST (keyed,
    map-side-combinable agg); the unpartitioned ordered window then runs
    over the bounded time dimension (days), which is the correct
    single-partition residue — a monitoring series is small by
    construction, its source need not be."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = daily.agg(
        F.expr("CAST(SUM(n) DIV COUNT(*) AS BIGINT)").alias("target")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = daily.crossJoin(F.broadcast(t)).withColumn(
        "run", F.sum(F.col("n") - F.col("target")).over(w)
    )
    return r.select(
        "day",
        F.col("n").alias("n_events"),
        (F.col("run") - F.least(F.min("run").over(w), F.lit(0)))
        .cast("long")
        .alias("cusum"),
    )


@register("streaming_changepoint_monitor", _ORACLE["q_changepoint_cusum"])
def streaming_changepoint_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM change-point gate maintained WHILE data lands
    (streaming/incremental.py:incremental_cusum_daily): per-day counts
    merge per micro-batch — integer addition is associative, so any
    split reproduces the one-shot daily histogram exactly — and the
    R − prefix-min closed form reads out over the bounded daily series
    at the end. Same oracle as the batch gate; replay-idempotent via
    the batch-id state ledger."""
    import tempfile

    from .streaming.incremental import incremental_cusum_daily

    ev = _events_stream(spark, sf_dir)
    return incremental_cusum_daily(ev, tempfile.mkdtemp(prefix="cusum_"))


@register(
    "q_table_diff_blocks",
    """
    WITH b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 997 = 0
                  THEN o_orderstatus || '*' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 1013 <> 0),
    ca AS (
      SELECT o_orderkey % 64 AS block,
             CAST(CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat_ws('|',
                   o_orderkey, o_orderstatus)), 1, 12)) AS BIGINT)
                 AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS VARCHAR)
               AS cksum_a,
             COUNT(*) AS n_a
      FROM orders GROUP BY 1),
    cb AS (
      SELECT o_orderkey % 64 AS block,
             CAST(CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat_ws('|',
                   o_orderkey, o_orderstatus)), 1, 12)) AS BIGINT)
                 AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS VARCHAR)
               AS cksum_b,
             COUNT(*) AS n_b
      FROM b GROUP BY 1)
    SELECT block, cksum_a, n_a, cksum_b, n_b
    FROM ca JOIN cb USING (block)
    WHERE cksum_a <> cksum_b OR n_a <> n_b
    """,
)
def q_table_diff_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style block diff between two table copies: per key-block
    commutative md5-prefix checksums on each side, joined on block id,
    emitting ONLY mismatching blocks — the drill-down step after
    q_table_checksum says 'the copies differ'. At 100 TB each side is
    one scan + a map-side-combinable 64-group agg; the join compares 64
    rows, and re-verification re-scans only the flagged blocks (here
    the B side is the A side with deterministic injected drift: one
    mutated status per 997 keys, one dropped row per 1013 — so the
    output pins both corruption detection AND missing-row detection).
    Same DECIMAL(38,0) accumulator + digit-string rendering as
    q_table_checksum (48-bit prefixes overflow int64; HUGEINT hashes
    differently)."""
    orders = load_table(spark, sf_dir, "orders")

    def cksum(df: DataFrame, suffix: str) -> DataFrame:
        row_str = F.concat_ws("|", "o_orderkey", "o_orderstatus")
        prefix48 = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast(
            "bigint"
        )
        return df.groupBy((F.col("o_orderkey") % 64).alias("block")).agg(
            F.sum(prefix48.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias(f"cksum_{suffix}"),
            F.count(F.lit(1)).alias(f"n_{suffix}"),
        )

    a = cksum(orders.select("o_orderkey", "o_orderstatus"), "a")
    b_side = orders.filter(F.col("o_orderkey") % 1013 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 997 == 0,
            F.concat(F.col("o_orderstatus"), F.lit("*")),
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    b = cksum(b_side, "b")
    return a.join(b, "block").filter(
        (F.col("cksum_a") != F.col("cksum_b")) | (F.col("n_a") != F.col("n_b"))
    )


@register(
    "sim_topk_ivfpq",
    f"""
    WITH {_PQ_CTES},
    icent AS (
      SELECT i // 64 AS c, list(
               ((1103515245 * (7919 + i) + 12345) % 2147483648) % 2001 - 1000
               ORDER BY i) AS cv
      FROM unnest(generate_series(0, {_IVF_CELLS} * 64 - 1)) AS t(i)
      GROUP BY 1),
    assign AS (
      SELECT vec_id, c AS cell FROM (
        SELECT v.vec_id, ct.c,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.qv, ct.cv) DESC, ct.c) AS rn
        FROM q v CROSS JOIN icent ct)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id, c AS cell FROM (
        SELECT v.vec_id, ct.c,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.qv, ct.cv) DESC, ct.c) AS rn
        FROM q v CROSS JOIN icent ct
        WHERE v.vec_id < 10)
      WHERE rn <= 2),
    iscored AS (
      SELECT qs.vec_id AS query_id, p.cell, e.vec_id AS neighbor_id,
             CAST(SUM(CAST(list_dot_product(qs.sv, qs.sv) AS BIGINT)
                 - 2 * CAST(list_dot_product(qs.sv, c.cv) AS BIGINT)
                 + CAST(list_dot_product(c.cv, c.cv) AS BIGINT))
               AS BIGINT) AS adc_dist
      FROM sub qs
      JOIN probes p ON p.vec_id = qs.vec_id
      JOIN assign a ON a.cell = p.cell
      JOIN enc e ON e.vec_id = a.vec_id AND qs.m = e.m
        AND qs.vec_id <> e.vec_id
      JOIN cent c ON c.cid = e.m * 16 + e.code
      WHERE qs.vec_id < 10
      GROUP BY 1, 2, 3)
    SELECT query_id, cell, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc_dist ASC, neighbor_id) AS rn
          FROM iscored)
    WHERE rn <= 5
    """,
)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS IndexIVFPQ): coarse cells prune WHICH rows are
    scored (probe=2 of {_IVF_CELLS} cells), PQ/ADC codes decide HOW
    (operators/similarity.py:ivfpq_topk). The corpus index is one Arrow
    pass emitting (id, 4 codes, cell) — the cell rides the pq_encode
    passthrough so codes and cells never re-join; the search is an
    equi-join on cell against broadcast (query, probe-cell, ADC-table)
    rows. The billion-vector layout: m ints + a cell id per corpus row,
    n_probe/n_cells of the index touched per query."""
    from .operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        n_centroids=_IVF_CELLS,
        n_probe=2,
        k_out=5,
    )


@register(
    "streaming_incremental_dedup",
    f"""
    WITH {_minhash_sig_sql()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates maintained over a DOCUMENT
    stream (streaming/incremental.py:incremental_lsh_dedup): each
    micro-batch pairs against itself AND the accumulated corpus
    band-key state, so the union of per-batch outputs equals the
    one-shot batch pair set under any split — the crawl-ingest dedup
    loop as Structured Streaming, per-batch cost O(new · collisions)
    independent of corpus size. Oracle = the batch LSH pair set
    (uncapped: a bucket cap would make results depend on batch
    boundaries; production re-adds it on the state side)."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_lsh_dedup

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return incremental_lsh_dedup(stream, tempfile.mkdtemp(prefix="sdedup_"))


@register(
    "text_bpe_pair_counts",
    """
    WITH words AS (
      SELECT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''),
    wf AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
    syms AS (
      SELECT w, f,
             list_append(list_filter(string_split(w, ''), c -> c <> ''),
                         '</w>') AS s
      FROM wf),
    prs AS (
      SELECT f, unnest(list_transform(generate_series(1, len(s) - 1),
                       i -> s[i] || ' ' || s[i + 1])) AS pair
      FROM syms),
    agg AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
            FROM prs GROUP BY pair)
    SELECT pair, cnt, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rn
          FROM agg)
    WHERE rn <= 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING statistic — the corpus-weighted adjacent-symbol-pair
    counts whose argmax picks the next merge (the other half of
    text_bpe_encode, which APPLIES a trained table). Same dictionary-
    encoding scale pattern: pair extraction runs over the DISTINCT
    vocabulary (thousands of rows) weighted by word frequency, so the
    raw corpus is touched exactly once for the frequency agg no matter
    how long the words are; a full BPE trainer is a driver loop calling
    this with the merge table applied so far — each iteration is one
    bounded vocab pass, which is how sentencepiece-scale training
    parallelizes over a 100 TB corpus. Top-20 with a deterministic
    (count desc, pair asc) tiebreak."""
    from .functions import exprs as EX

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    syms = F.concat(
        F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
        F.array(F.lit("</w>")),
    )

    def pair_list(s: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(s, i), F.element_at(s, i + 1)
            ),
        )

    prs = wf.select(
        "f", F.explode(EX.bind(syms, pair_list)).alias("pair")
    )
    agg = prs.groupBy("pair").agg(F.sum("f").alias("cnt"))
    w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select("pair", "cnt", "rank")
    )


_BPE_TRAIN_ITERS = 4


def _bpe_train_oracle(iters: int) -> str:
    """Unrolled BPE-trainer oracle: iteration i counts adjacent symbol
    pairs over the (i-1)-merged vocabulary, picks the (cnt DESC, pair
    ASC) argmax, and applies it as a delimiter-wrapped replace — the
    same unroll-the-loop oracle style as graph_pagerank."""

    def pair_counts(src: str) -> str:
        return (
            "SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM ("
            "SELECT f, unnest(list_transform(generate_series(1, len(s)-1),"
            " i -> s[i] || ' ' || s[i+1])) AS pair FROM ("
            "SELECT f, list_filter(string_split(e, '|'), c -> c <> '') AS s"
            f" FROM {src})) GROUP BY pair"
        )

    ctes = [
        "wf AS (SELECT w, COUNT(*) AS f FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "WHERE w <> '' GROUP BY w)",
        "e0 AS (SELECT f, '|' || array_to_string("
        "list_filter(string_split(w, ''), c -> c <> ''), '|') "
        "|| '|</w>|' AS e FROM wf)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"p{i} AS ({pair_counts(f'e{i - 1}')})")
        ctes.append(
            f"b{i} AS (SELECT pair, cnt FROM p{i} "
            "ORDER BY cnt DESC, pair LIMIT 1)"
        )
        if i < iters:
            ctes.append(
                f"e{i} AS (SELECT f, replace(e, "
                "'|' || replace(pair, ' ', '|') || '|', "
                "'|' || replace(pair, ' ', '') || '|') AS e "
                f"FROM e{i - 1} CROSS JOIN b{i})"
            )
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS it, pair AS merge_pair, cnt "
        f"FROM b{i}"
        for i in range(1, iters + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


@register("text_bpe_train", _bpe_train_oracle(_BPE_TRAIN_ITERS))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINER loop — 4 unrolled iterations of (pair counts →
    argmax → apply merge → recount), completing the family:
    text_bpe_pair_counts is ONE iteration's statistic, text_bpe_encode
    APPLIES a finished table, this LEARNS the table. Output: the merge
    table itself, (it, merge_pair, cnt).

    Each iteration is pure DataFrame algebra: the 1-row argmax
    broadcast-crossJoins back onto the vocabulary and the merge applies
    as a replace over the delimiter-wrapped symbol stream — the whole
    4-iteration trainer is ONE lazy Catalyst plan, no driver-side
    collect between iterations (the data-dependent merge pair rides in
    a Column, not in Python). Same adjacent-repeat equivalence envelope
    as text_bpe_encode (both engines share replace() semantics, so
    oracle parity is exact regardless); pinned against a reference
    Python BPE trainer in tests/test_llm_ops.py.

    Scale: the corpus is touched ONCE (the word-frequency agg); every
    iteration after that runs over the DISTINCT vocabulary — thousands
    of rows at any corpus size (dictionary encoding, the
    sentencepiece-at-scale pattern). The union's 4 branches repeat the
    identical wf/e0 subtrees textually, but AQE's exchange reuse
    collapses them at runtime (the executed plan carries ReusedExchange
    nodes over the shared aggregates — verified on local[4]); a
    many-hundred-merge production run would checkpoint the vocab table
    once instead of relying on reuse."""
    from functools import reduce

    from .functions import exprs as EX

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    enc0 = F.concat(
        F.lit("|"),
        F.array_join(
            F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
            "|",
        ),
        F.lit("|</w>|"),
    )
    cur = wf.select("f", enc0.alias("e"))

    def pair_counts(df: DataFrame) -> DataFrame:
        syms = F.filter(
            F.split(F.col("e"), r"\|"), lambda c: c != F.lit("")
        )

        def pair_list(s: F.Column) -> F.Column:
            return F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(s, i), F.element_at(s, i + 1)
                ),
            )

        prs = df.select(
            "f", F.explode(EX.bind(syms, pair_list)).alias("pair")
        )
        return prs.groupBy("pair").agg(
            F.sum("f").cast("long").alias("cnt")
        )

    bests: list[DataFrame] = []
    for it in range(1, _BPE_TRAIN_ITERS + 1):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        bests.append(
            best.select(
                F.lit(it).cast("int").alias("it"),
                F.col("pair").alias("merge_pair"),
                "cnt",
            )
        )
        if it < _BPE_TRAIN_ITERS:
            pat = F.concat(
                F.lit("|"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("|")),
                F.lit("|"),
            )
            rep = F.concat(
                F.lit("|"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                F.lit("|"),
            )
            picked = best.select(pat.alias("__pat"), rep.alias("__rep"))
            cur = cur.crossJoin(F.broadcast(picked)).select(
                "f",
                F.replace(
                    F.col("e"), F.col("__pat"), F.col("__rep")
                ).alias("e"),
            )
    return reduce(DataFrame.unionAll, bests)


_MIX_WEIGHTS = {"en": 4, "de": 2, "fr": 2, "es": 1, "zh": 1}
_MIX_SCALE = 840  # divisible by every weight → integer stride keys


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


@register(
    "streaming_mixture_schedule",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS r
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
def streaming_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture schedule maintained over a DOCUMENT stream
    (streaming/incremental.py:incremental_mixture_schedule) — stride
    scheduling where every arriving document gets its FINAL schedule
    key at arrival (per-lang arrival rank × stride, counters carried
    across micro-batches, batch-id-ledgered exactly-once), so a
    training loader can consume "next by key" while ingest runs. The
    oracle ranks per lang by doc_id — the stream's arrival order — and
    equals the batch schedule under any ordered micro-batch split
    (split-invariance pinned in tests/test_streaming.py); the batch
    twin sample_mixture_schedule differs only in its md5 shuffle
    order."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_mixture_schedule

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    keyed = incremental_mixture_schedule(
        stream,
        tempfile.mkdtemp(prefix="smix_"),
        _MIX_WEIGHTS,
        _MIX_SCALE,
    )
    wg = W.orderBy("k", "lang", "doc_id")
    return (
        keyed.withColumn(
            "position", F.row_number().over(wg).cast("long")
        )
        .filter(F.col("position") <= 100)
        .select("position", "lang", "doc_id")
    )


_CAP_BUDGET = 600  # whitespace tokens per source (trims at sf≥0.01)

_DOMAIN_CAP_SQL = f"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len({_D_TOKS}) AS BIGINT) AS n_toks
               FROM documents),
    c AS (SELECT doc_id, source, n_toks,
                 SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_toks
          FROM t)
    SELECT doc_id, source, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= {_CAP_BUDGET}
    """


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
    from .functions import text as TX

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


@register("streaming_domain_cap", _DOMAIN_CAP_SQL)
def streaming_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain cap enforced over a DOCUMENT stream
    (streaming/incremental.py:incremental_domain_cap) — per-source token
    counters carried across micro-batches, batch-id-ledgered
    exactly-once, each document admitted or dropped ONCE at arrival and
    never revised. The oracle is the batch twin's window SQL: under any
    ordered micro-batch split the carried counter equals the batch
    running sum (split-invariance pinned in tests/test_streaming.py),
    so the admitted set is byte-identical."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_domain_cap

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    return incremental_domain_cap(
        stream, tempfile.mkdtemp(prefix="sdcap_"), _CAP_BUDGET
    ).select("doc_id", "source", "n_toks", "cum_toks")


@register("streaming_heavy_hitters", _ORACLE["q_heavy_hitters_mg"])
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters maintained over the EVENT stream
    (streaming/incremental.py:incremental_heavy_hitters) — a carried
    k-counter Misra–Gries sketch absorbs each micro-batch's count delta
    (weighted Agarwal merge, batch-id-ledgered exactly-once, ≤k rows of
    state at all times, anytime superset guarantee), and the final
    candidate set is exact-recounted against the archived per-batch
    deltas. The answer — and therefore the oracle — is the batch twin
    q_heavy_hitters_mg's exact >1.2×-mean query."""
    import tempfile

    from .streaming.incremental import incremental_heavy_hitters

    stream = _events_stream(spark, sf_dir)
    return incremental_heavy_hitters(
        stream.select("user_id"), tempfile.mkdtemp(prefix="shh_"), k=2048
    )


@register(
    "q_fuzzy_join_symdel",
    """
    WITH dirty AS (
      SELECT c_custkey AS dirty_id,
             substring(c_name, 1, 1 + (c_custkey % length(c_name)) - 1)
               || substring(c_name, 1 + (c_custkey % length(c_name)) + 1,
                            1000) AS dname
      FROM customer WHERE c_custkey % 3 = 0),
    dv AS (
      SELECT dirty_id, dname,
             unnest(list_prepend(dname,
               list_transform(generate_series(1, length(dname)),
                 i -> substring(dname, 1, i - 1)
                   || substring(dname, i + 1, 1000)))) AS v
      FROM dirty),
    cv AS (
      SELECT c_custkey, c_name,
             unnest(list_prepend(c_name,
               list_transform(generate_series(1, length(c_name)),
                 i -> substring(c_name, 1, i - 1)
                   || substring(c_name, i + 1, 1000)))) AS v
      FROM customer),
    cand AS (
      SELECT DISTINCT dv.dirty_id, dv.dname, cv.c_custkey, cv.c_name
      FROM dv JOIN cv USING (v))
    SELECT dirty_id, c_custkey,
           CAST(levenshtein(dname, c_name) AS INTEGER) AS lev
    FROM cand
    WHERE levenshtein(dname, c_name) <= 1
    """,
)
def q_fuzzy_join_symdel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (entity-resolution) JOIN via symmetric-delete blocking —
    the SymSpell algorithm as a distributed join: both sides expand to
    their single-deletion neighborhoods (the string itself + every
    one-char deletion, ~len variants in-row), candidates meet in an
    EQUI-join on the variant, and exact Levenshtein verifies the
    bounded candidate set. Deletion neighborhoods intersect whenever
    edit distance ≤ 1, so recall is exact for distance 1 — unlike
    prefix/length blocking, which misses first-char edits — and the
    plan never compares all pairs. The dirty side here is a
    deterministic corruption (every 3rd customer, one char deleted at
    key mod length), so matches pin both the recall (every corruption
    re-finds its source) and the collision behavior (distance-1
    neighbors of OTHER customers match too, deterministically).

    Scale: ~len× row amplification into a string equi-join (hash the
    variant to a 64-bit key at 100 TB to shrink the shuffle — same
    trick as the shingle join), then O(candidates) verify. This is the
    SymSpell/deletion-index structure that makes spell-correct joins
    tractable at corpus scale."""
    cust = load_table(spark, sf_dir, "customer")

    def variants(df: DataFrame, id_out: str, name_out: str) -> DataFrame:
        name = F.col(name_out)
        dels = F.transform(
            F.sequence(F.lit(1), F.length(name)),
            lambda i: F.concat(
                name.substr(F.lit(1), i - 1),
                name.substr(i + 1, F.lit(1000)),
            ),
        )
        return df.select(
            id_out,
            name_out,
            F.explode(F.concat(F.array(name), dels)).alias("v"),
        )

    pos = F.lit(1) + F.col("c_custkey") % F.length("c_name")
    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.col("c_name").substr(F.lit(1), pos - 1),
            F.col("c_name").substr(pos + 1, F.lit(1000)),
        ).alias("dname"),
    )
    dv = variants(dirty, "dirty_id", "dname")
    cv = variants(
        cust.select("c_custkey", "c_name"), "c_custkey", "c_name"
    )
    cand = (
        dv.join(cv, "v")
        .select("dirty_id", "dname", "c_custkey", "c_name")
        .distinct()
    )
    lev = F.levenshtein("dname", "c_name")
    return (
        cand.filter(lev <= 1)
        .select("dirty_id", "c_custkey", lev.cast("int").alias("lev"))
    )


@register(
    "q_skyline_pareto",
    """
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS psize,
             MIN(p_partkey) AS p_partkey, COUNT(*) AS n_dups
      FROM part GROUP BY 1, 2)
    SELECT price, psize, p_partkey, n_dups
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price <= p.price AND q.psize <= p.psize
        AND (q.price < p.price OR q.psize < p.psize))
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of parts over (retail price, size),
    both minimized — the "best trade-offs" operator Spark lacks and the
    textbook formulation makes quadratic (the oracle IS that quadratic
    NOT-EXISTS, on the distinct-point set). The engine's plan
    (operators/skyline.py:skyline_2d) is three bounded stages: distinct
    -point pre-agg, partition-local linear sweep (sound: local
    dominance ⇒ global dominance, so no frontier point is droppable),
    then an exact resolve of the tiny per-partition frontiers. At
    100 TB the quadratic term never materializes — only frontiers
    cross partitions."""
    from .operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    return skyline_2d(
        part.select(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("psize"),
            "p_partkey",
        ),
        "price",
        "psize",
        "p_partkey",
    )


@register(
    "q_temporal_scd2_lookup",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    hist AS (
      SELECT user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS INTEGER)
               AS version
      FROM chg),
    facts AS (
      SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events WHERE event_type = 'purchase'),
    cand AS (
      SELECT f.event_id, f.user_id, f.ts_us,
             h.event_type AS profile_type, h.version,
             ROW_NUMBER() OVER (PARTITION BY f.event_id
               ORDER BY h.valid_from_us DESC, h.version DESC) AS rn
      FROM facts f
      JOIN hist h ON h.user_id = f.user_id
        AND h.valid_from_us <= f.ts_us)
    SELECT event_id, user_id, ts_us, profile_type, version
    FROM cand WHERE rn = 1
    """,
)
def q_temporal_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup — the warehouse pattern downstream of
    every SCD2 build: each fact row (purchases) joins the dimension
    VERSION that was valid at the fact's own timestamp. Because SCD2
    validity intervals tile contiguously per key, 'valid_from ≤ ts <
    valid_to' is exactly the nearest-predecessor match on valid_from —
    so the plan is the as-of operator (operators/asof.py: ONE shuffle,
    union + window), not an interval join; the oracle spells out the
    interval semantics as the quadratic candidates + ROW_NUMBER
    formulation. Equal-timestamp version stacks (zero-width intervals)
    resolve to the LATEST version via the as-of tiebreak, matching the
    oracle's version DESC."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    hist = q_scd2_history(spark, sf_dir).select(
        "user_id",
        F.col("valid_from_us").alias("ts_us"),
        F.col("event_type").alias("profile_type"),
        "version",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    out = asof_join(
        facts,
        hist,
        keys=["user_id"],
        ts_col="ts_us",
        right_value_cols=["profile_type", "version"],
        tiebreak_col="version",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_profile_type").alias("profile_type"),
        F.col("asof_version").cast("int").alias("version"),
    )


@register(
    "sim_knn_classify",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 20
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY (d / {_FIXED}) / sqrt((nq.n / {_FIXED})
                          * (nc.n / {_FIXED})) DESC, neighbor_id) AS rn
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id)
      WHERE rn <= 5),
    votes AS (
      SELECT t.query_id, e.label, COUNT(*) AS n_votes
      FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
      GROUP BY 1, 2)
    SELECT query_id, label AS predicted_label,
           CAST(n_votes AS INTEGER) AS n_votes
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY n_votes DESC, label) AS rn FROM votes)
    WHERE rn = 1
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification — ML inference as retrieval: each query
    vector takes the majority label of its 5 exact nearest neighbors
    (deterministic tiebreak: vote count desc, then smallest label).
    Plan: the brute-force top-k (bounded query broadcast, corpus
    streams) + a neighbor→label equi-join + two small keyed aggs — the
    per-query work after retrieval is O(k). At 100 TB the retrieval
    stage swaps for the IVF/PQ index (same downstream vote); this is
    how embedding-based labeling (nearest-labeled-example propagation)
    runs over an unlabeled corpus."""
    from .operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    topk = brute_force_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)
    votes = (
        topk.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            F.col("n_votes").cast("int").alias("n_votes"),
        )
    )


@register(
    "q_gaps_islands",
    """
    WITH marked AS (
      SELECT event_type, event_id,
             event_id - ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY event_id) AS grp
      FROM events),
    islands AS (
      SELECT event_type, grp,
             COUNT(*) AS island_len,
             MIN(event_id) AS island_start
      FROM marked GROUP BY event_type, grp)
    SELECT event_type,
           COUNT(*) AS n_islands,
           CAST(MAX(island_len) AS BIGINT) AS max_island_len,
           CAST(MIN(island_start) AS BIGINT) AS first_start
    FROM islands GROUP BY event_type
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive event_ids per
    event_type via the classic id − row_number() grouping key (two
    consecutive ids in the same partition get the same difference; a
    gap shifts it) — sequence-continuity auditing (missed deliveries,
    retention holes) with ONE window + two keyed aggs, no self-join.
    All-integer, so the island keys are engine-exact.

    Scale: one shuffle on event_type for the window (at 100 TB the
    partition column would be (event_type, id-range bucket) with
    island stitching at bucket boundaries — the standard two-level
    refinement; the single-window form is right up to the point a
    single type's sequence outgrows one executor's sort)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("event_id")
    marked = ev.select(
        "event_type",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("grp"),
    )
    islands = marked.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("island_len"),
        F.min("event_id").alias("island_start"),
    )
    return islands.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("island_len").alias("max_island_len"),
        F.min("island_start").alias("first_start"),
    )


@register(
    "text_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS l FROM toks),
    ex AS (SELECT doc_id,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    owner AS (SELECT shash, MIN(doc_id) AS owner FROM ex GROUP BY shash)
    SELECT e.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN o.owner = e.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN o.owner = e.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM ex e JOIN owner o USING (shash)
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty attribution: every distinct trigram is OWNED by
    the lowest doc_id containing it; a document's novelty is the
    fraction of its shingles it owns — the corpus-order contribution
    curve (what fraction of each new document is text the corpus has
    not seen before). The dedup/contamination families detect COPIES;
    this measures marginal new content, the curation metric for
    deciding whether another crawl snapshot still adds information.

    Plan: the same integer shingle-hash explode as the dedup family,
    one min-agg over the shingle key (map-side combinable), one
    keyed join back, one doc agg — all shuffles on shingle or doc
    keys, never pairwise. The novelty double is one IEEE division of
    two exact ints."""
    from .functions import exprs as EX
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    sh = F.array_distinct(TX.word_shingles(toks, 3))

    def hashes(l: F.Column) -> F.Column:
        return F.transform(l, lambda s: TX.minhash_base_hashes(s)[0])

    ex = (
        docs.select(
            "doc_id",
            F.explode_outer(EX.bind(sh, hashes)).alias("shash"),
        )
        .filter(F.col("shash").isNotNull())
    )
    owner = ex.groupBy("shash").agg(F.min("doc_id").alias("owner"))
    novel = F.sum(
        F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        ex.join(owner, "shash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (
                novel.cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )


@register(
    "pipeline_curate_mix",
    f"""
    WITH base AS (
      SELECT doc_id, text, lang, {_D_TOKS} AS t, md5({_D_NORM}) AS fp
      FROM documents),
    dd AS (
      SELECT doc_id, lang, t FROM (
        SELECT doc_id, lang, t,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS dr
        FROM base) WHERE dr = 1),
    shl AS (SELECT doc_id, lang, list_distinct({_D_SHINGLES}) AS l FROM dd),
    ex AS (SELECT doc_id, len(l) AS n_shingles,
                  unnest(list_transform(l,
                    s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS shash
           FROM shl),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_shingles AS n_a, b.n_shingles AS n_b, COUNT(*) AS n_inter
      FROM ex a JOIN ex b ON a.shash = b.shash AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    drops AS (
      SELECT DISTINCT doc_b AS doc_id FROM inter
      WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
            >= 0.9),
    kept AS (
      SELECT doc_id, lang FROM dd
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
      FROM kept),
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
    QUALIFY position <= 50
    """,
)
def pipeline_curate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 composition proof — the NEW operators chained as one
    lazy plan: exact dedup (min-id per normalized fingerprint) →
    containment near-dup drop (subset-duplication survivors,
    operators/dedup.py:ngram_containment_pairs, larger id loses) →
    stride-scheduled mixture interleave of the survivors (first 50
    positions). Complements pipeline_curate (dedup → quality → pack):
    together they pin that every curation stage added this round
    composes without materialization barriers — the containment
    anti-join, the per-language rank window, and the schedule sort
    plan as one Catalyst job.

    Scale: each stage is its proven operator's plan — fingerprint agg,
    shingle-keyed inverted-index join, lang-keyed window + global
    schedule sort. Nothing super-linear appears by composing."""
    from .operators.dedup import drop_exact_duplicates, ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    deduped = drop_exact_duplicates(docs)
    drops = (
        ngram_containment_pairs(deduped, threshold=0.9)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = deduped.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang"
    )
    wl = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    stride = F.lit(_MIX_SCALE) / F.create_map(
        *[
            x
            for kk, v in _MIX_WEIGHTS.items()
            for x in (F.lit(kk), F.lit(v))
        ]
    )[F.col("lang")]
    keyed = kept.select(
        "doc_id",
        "lang",
        (F.row_number().over(wl) * stride.cast("long")).alias("k"),
    )
    wg = W.orderBy("k", "lang", "doc_id")
    return (
        keyed.withColumn("position", F.row_number().over(wg).cast("long"))
        .filter(F.col("position") <= 50)
        .select("position", "lang", "doc_id")
    )


@register(
    "pipeline_curate_soft",
    f"""
    WITH fp AS (
      SELECT doc_id, lang, text, md5({_D_NORM}) AS fingerprint
      FROM documents),
    g AS (SELECT fingerprint, COUNT(*) AS n_copies FROM fp GROUP BY 1),
    docs_arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM fp),
    bg AS (
      SELECT doc_id, a[i] AS w1, a[i] || ' ' || a[i + 1] AS b
      FROM docs_arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    uc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM fp)
      WHERE w <> '' GROUP BY w),
    bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
    lm AS (
      SELECT bg.doc_id, COUNT(*) AS nb,
             CAST(SUM(bc.c * 1000000 // uc.c) AS BIGINT) AS fp_
      FROM bg JOIN bc USING (b) JOIN uc ON uc.w = bg.w1
      GROUP BY bg.doc_id),
    tiled AS (
      SELECT f.doc_id, f.lang, f.fingerprint,
             CAST(len({_D_TOKS}) AS BIGINT) AS n_tokens,
             NTILE(3) OVER (PARTITION BY f.lang
               ORDER BY lm.fp_ // lm.nb DESC, f.doc_id) AS tile
      FROM fp f JOIN lm ON lm.doc_id = f.doc_id)
    SELECT t.doc_id, t.lang, t.n_tokens,
           CAST(1000000 // g.n_copies AS BIGINT) AS weight_fp,
           CAST((1000000 // g.n_copies) * t.n_tokens AS BIGINT)
             AS token_mass_fp
    FROM tiled t JOIN g ON g.fingerprint = t.fingerprint
    WHERE t.tile <= 2
    """,
)
def pipeline_curate_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SOFT curation pipeline: nothing is dropped for being a
    duplicate — exact-dup clusters are REWEIGHTED (1/cluster fixed-
    point, sample_softdedup_weights) while the CCNet tail-drop still
    gates on fluency, and each surviving doc carries its weighted token
    mass (weight × tokens — what the mixture planner actually budgets).
    Fourth pipeline ending, complementing pack (curate), mixture
    (curate_mix) and quota (curate_cap): the no-deletion variant
    loaders with immutable storage need.

    Scale: fingerprint agg + vocab-bounded LM broadcast aggs + one
    lang-keyed NTILE window + a fingerprint-keyed weights join — one
    lazy plan, every shuffle on a bounded key."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.withColumn(
        "fingerprint", TX.content_fingerprint(F.col("text"))
    )
    g = with_fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    lm = _bigram_lm(with_fp)
    tiled = (
        with_fp.join(lm, "doc_id")
        .withColumn(
            "tile",
            F.ntile(3).over(
                W.partitionBy("lang").orderBy(
                    F.desc(F.expr("lm_fp DIV n_bigrams")), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("tile") <= 2)
        .select(
            "doc_id",
            "lang",
            "fingerprint",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
    )
    wfp = F.expr("1000000 DIV n_copies")
    return tiled.join(g, "fingerprint").select(
        "doc_id",
        "lang",
        "n_tokens",
        wfp.cast("long").alias("weight_fp"),
        (wfp * F.col("n_tokens")).cast("long").alias("token_mass_fp"),
    )


_PIPE_CAP_BUDGET = 400  # tokens per source after dedup + tail-drop


@register(
    "pipeline_curate_cap",
    f"""
    WITH base AS (
      SELECT doc_id, text, lang, source, md5({_D_NORM}) AS fp
      FROM documents),
    dd AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS dr
        FROM base) WHERE dr = 1),
    docs_arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM dd),
    bg AS (
      SELECT doc_id, a[i] AS w1, a[i] || ' ' || a[i + 1] AS b
      FROM docs_arr, unnest(generate_series(1, len(a) - 1)) t(i)
      WHERE a[i] <> '' AND a[i + 1] <> ''),
    uc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM dd)
      WHERE w <> '' GROUP BY w),
    bc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
    lm AS (
      SELECT bg.doc_id, COUNT(*) AS nb,
             CAST(SUM(bc.c * 1000000 // uc.c) AS BIGINT) AS fp
      FROM bg JOIN bc USING (b) JOIN uc ON uc.w = bg.w1
      GROUP BY bg.doc_id),
    tiled AS (
      SELECT d.doc_id, d.lang, d.source, d.text,
             NTILE(3) OVER (PARTITION BY d.lang
               ORDER BY lm.fp // lm.nb DESC, d.doc_id) AS tile
      FROM dd d JOIN lm ON lm.doc_id = d.doc_id),
    kept AS (
      SELECT doc_id, lang, source,
             CAST(len({_D_TOKS}) AS BIGINT) AS n_toks
      FROM tiled WHERE tile <= 2),
    c AS (
      SELECT doc_id, lang, source, n_toks,
             SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_toks
      FROM kept)
    SELECT doc_id, lang, source, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= {_PIPE_CAP_BUDGET}
    """,
)
def pipeline_curate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 composition proof — THIS round's operators chained as
    one lazy plan: exact dedup (min-id per normalized fingerprint) →
    CCNet tail-drop (the self-trained bigram LM now trains on the
    DEDUPED corpus — the order production pipelines use, since dup
    clusters would otherwise dominate the LM counts) → per-source
    token-budget cap of the fluent survivors. Complements
    pipeline_curate (… → pack) and pipeline_curate_mix (… → mixture):
    the third pipeline ending, quota enforcement.

    Scale: fingerprint agg → vocab-bounded LM broadcast-aggs →
    lang-keyed NTILE window → source-keyed prefix-sum window. Four
    shuffles on four different bounded keys, no stage super-linear, no
    materialization barrier between stages."""
    from .functions import text as TX
    from .operators.dedup import drop_exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    dd = drop_exact_duplicates(docs)
    lm = _bigram_lm(dd)
    scored = dd.join(lm, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.expr("lm_fp DIV n_bigrams").alias("avg_fp"),
    )
    wt = W.partitionBy("lang").orderBy(F.desc("avg_fp"), F.asc("doc_id"))
    kept = (
        scored.withColumn("tile", F.ntile(3).over(wt))
        .filter(F.col("tile") <= 2)
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
        )
    )
    wc = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return kept.withColumn("cum_toks", F.sum("n_toks").over(wc)).filter(
        F.col("cum_toks") <= _PIPE_CAP_BUDGET
    )


@register(
    "text_lexical_stats",
    rf"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({_D_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS words,
           CAST(COUNT(*) AS BIGINT) AS distinct_toks,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
           CAST(1000 * COUNT(*) // SUM(c) AS BIGINT) AS ttr_milli,
           CAST(1000 * COUNT(*) FILTER (WHERE c = 1) // SUM(c) AS BIGINT)
             AS hapax_milli,
           CAST(1000 * SUM(LENGTH(tok) * c) // SUM(c) AS BIGINT)
             AS avg_len_milli
    FROM tf GROUP BY doc_id
    """,
)
def text_lexical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity statistics per document: type-token ratio,
    hapax-legomenon fraction and mean token length — the boilerplate /
    template-spam gate (machine-generated and boilerplate text shows
    abnormally LOW TTR and hapax rates; keyword-stuffed spam abnormally
    high). Next to the stopword/length heuristics in
    text_quality_score, TTR is the standard third axis (CCNet, Gopher
    both gate on near-duplicate token distributions).

    Plan: ONE shuffle — explode to (doc, token), partial-aggregated
    count per (doc, token), then the per-doc rollup rides the same
    partitioning (two-level agg, no second exchange of corpus-sized
    data). All integer fixed-point (×1000 DIV), bit-stable across
    engines."""
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, F.lit(1)).otherwise(F.lit(0)))
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("c").alias("words"),
            F.count(F.lit(1)).alias("distinct_toks"),
            hapax.alias("hapax"),
            F.sum(F.length("tok") * F.col("c")).alias("char_mass"),
        )
        .select(
            "doc_id",
            "words",
            "distinct_toks",
            "hapax",
            F.expr("1000 * distinct_toks DIV words").alias("ttr_milli"),
            F.expr("1000 * hapax DIV words").alias("hapax_milli"),
            F.expr("1000 * char_mass DIV words").alias("avg_len_milli"),
        )
    )


@register(
    "q_arrival_gaps",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) AS gap_us
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS avg_gap_us,
           CAST(COUNT(*) FILTER (WHERE gap_us > 3600000000) AS BIGINT)
             AS n_gaps_over_1h
    FROM g GROUP BY user_id HAVING COUNT(gap_us) > 0
    """,
)
def q_arrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat / liveness audit: per-key inter-arrival gap statistics
    (min/max/mean gap, count of >1 h silences) — the stream-hygiene
    check a pipeline runs to find dead producers, burst-then-silence
    sources and watermark-risk keys before they corrupt windowed aggs.
    (A ts-inversion audit is VACUOUS on this data — the generator emits
    per-user subsequences of a globally ordered stream, 0 inversions at
    every sf — so the registered form audits gaps, which genuinely vary
    8 s…4 days here.)

    Plan: one user-keyed shuffle shared by the lag window and the
    rollup; exact integer µs arithmetic (floor-div mean)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "gap_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.expr("SUM(gap_us) DIV COUNT(gap_us)").alias("avg_gap_us"),
            F.sum(
                F.when(F.col("gap_us") > 3_600_000_000, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_gaps_over_1h"),
        )
        .filter(F.col("min_gap_us").isNotNull())
        .select(
            "user_id",
            "n_events",
            "min_gap_us",
            "max_gap_us",
            "avg_gap_us",
            "n_gaps_over_1h",
        )
    )


@register("streaming_arrival_monitor", _ORACLE["q_arrival_gaps"])
def streaming_arrival_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heartbeat/liveness audit maintained over the EVENT stream
    (streaming/incremental.py:incremental_arrival_monitor) — carried
    per-user (last_ts, count, min/max/sum gap, >1 h count) state,
    batch-id-ledgered exactly-once, with the BRIDGE gap (carried
    last_ts → batch's first arrival) stitching micro-batches so any
    ordered split reproduces the batch window's gap sequence
    (split-invariance + stale-replay pinned in tests/test_streaming.py).
    The oracle is the batch twin q_arrival_gaps' window SQL."""
    import tempfile

    from .streaming.incremental import incremental_arrival_monitor

    stream = _events_stream(spark, sf_dir)
    return incremental_arrival_monitor(
        stream.select("user_id", "event_id", "ts"),
        tempfile.mkdtemp(prefix="sarr_"),
    )


@register(
    "sim_pca_top2",
    """
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS qv
      FROM embeddings),
    r1 AS (SELECT qv, CAST(list_sum(qv) AS BIGINT) AS rd FROM q),
    s1 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r1 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m1 AS (SELECT MAX(abs(s)) AS m FROM s1),
    v1 AS (SELECT list(CASE WHEN s < 0 THEN -1 ELSE 1 END
                       * (abs(s) * 1024 // m) ORDER BY d) AS vl
           FROM s1 CROSS JOIN m1),
    r2 AS (SELECT qv, CAST(list_dot_product(qv, vl) AS BIGINT) AS rd
           FROM q CROSS JOIN v1),
    s2 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r2 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m2 AS (SELECT MAX(abs(s)) AS m FROM s2),
    c1 AS (SELECT CAST(d AS INTEGER) AS d,
                  CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END
                       * (abs(s) * 1024 // m) AS BIGINT) AS component1
           FROM s2 CROSS JOIN m2),
    w1 AS (SELECT list(component1 ORDER BY d) AS wl FROM c1),
    ss AS (SELECT wl, CAST(list_dot_product(wl, wl) AS BIGINT) AS ssq
           FROM w1),
    defl AS (
      SELECT list_transform(generate_series(1, len(qv)),
               i -> CASE WHEN qv[i] * ssq - xv * wl[i] < 0
                         THEN -((-(qv[i] * ssq - xv * wl[i])) // 134217728)
                         ELSE (qv[i] * ssq - xv * wl[i]) // 134217728
                    END) AS qv
      FROM (SELECT qv, wl, ssq,
                   CAST(list_dot_product(qv, wl) AS BIGINT) AS xv
            FROM q CROSS JOIN ss)),
    r3 AS (SELECT qv, CAST(list_sum(qv) AS BIGINT) AS rd FROM defl),
    s3 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r3 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m3 AS (SELECT MAX(abs(s)) AS m FROM s3),
    v3 AS (SELECT list(CASE WHEN s < 0 THEN -1 ELSE 1 END
                       * (abs(s) * 1024 // m) ORDER BY d) AS vl
           FROM s3 CROSS JOIN m3),
    r4 AS (SELECT qv, CAST(list_dot_product(qv, vl) AS BIGINT) AS rd
           FROM defl CROSS JOIN v3),
    s4 AS (SELECT d, CAST(SUM(qv[d + 1] * rd) AS BIGINT) AS s
           FROM r4 CROSS JOIN unnest(generate_series(0, 63)) AS t(d)
           GROUP BY d),
    m4 AS (SELECT MAX(abs(s)) AS m FROM s4),
    c2 AS (SELECT CAST(d AS INTEGER) AS d,
                  CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END
                       * (abs(s) * 1024 // m) AS BIGINT) AS component2
           FROM s4 CROSS JOIN m4)
    SELECT c1.d, component1, component2 FROM c1 JOIN c2 ON c1.d = c2.d
    """,
)
def sim_pca_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TWO principal directions by power iteration + Hotelling
    deflation (operators/similarity.py:pca_top2_components) — the
    2-component PCA under embedding-drift dashboards and whitening
    preludes: v1 from the gram iteration, every row deflated IN-ROW
    (x·|v1|² − (x·v1)·v1, the scaled projection-removal that keeps all
    other eigendirections), sign-split 2²⁷ downscale back into the
    input envelope, v2 = power iteration of the deflated corpus.
    Exact int64 end-to-end and fully lazy — v1 re-enters the plan as a
    1-row broadcast, |v1|² and x·v1 are let-bound in the deflation
    zip_with (unbound they re-evaluate per element), and the oracle
    unrolls the identical arithmetic; pinned against a pure-Python
    integer reference in tests/test_llm_ops.py.

    Scale: two power iterations = four linear passes + dims-cell aggs;
    the deflation is one narrow map. Nothing quadratic, nothing
    collected."""
    from .operators.similarity import pca_top2_components

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top2_components(emb, rounds=2)


_FRAME_DUP_TH = 64  # |Δ byte-sum| at or below this = same content (~p45)


@register(
    "multimodal_frame_dedup",
    f"""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    d AS (
      SELECT doc_id, frame_idx,
             CASE WHEN LAG(feat) OVER w IS NULL
                    OR ABS(feat - LAG(feat) OVER w) > {_FRAME_DUP_TH}
                  THEN 1 ELSE 0 END AS fresh
      FROM feat WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
    runs AS (
      SELECT doc_id, frame_idx,
             SUM(fresh) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM d)
    SELECT doc_id, CAST(MIN(frame_idx) AS INTEGER) AS kept_frame,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY doc_id, run_id
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal frame deduplication: collapse runs of near-identical
    consecutive frames (|Δfeature| ≤ TH) to their first frame — the
    static-shot pruning video pipelines run before feature extraction,
    typically dropping 30-60%% of frames of talking-head/slide content
    (here TH=64 ≈ p45 of deltas, so runs genuinely form). The dual of
    scene cuts: cuts find where content CHANGES, this collapses where
    it DOESN'T.

    Plan: the same narrow Arrow frame-feature pass as scene cuts, one
    doc-keyed shuffle shared by the lag window, the running-sum run ids
    and the run rollup — frames of one video co-locate once."""
    from .operators.multimodal import frame_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    feats = frame_features(with_binary_payload(docs), frame=32)
    wd = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("feat").over(wd)
    fresh = (
        F.when(
            prev.isNull() | (F.abs(F.col("feat") - prev) > _FRAME_DUP_TH),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("fresh")
    )
    runs = feats.select("doc_id", "frame_idx", fresh).withColumn(
        "run_id",
        F.sum("fresh").over(
            wd.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("frame_idx").alias("kept_frame"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .select("doc_id", "kept_frame", "run_len")
    )


@register(
    "multimodal_av_align",
    f"""
    WITH seg AS (
      SELECT doc_id,
             unnest(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1))
               AS win,
             text
      FROM documents WHERE octet_length(encode(text)) > 0),
    e AS (
      SELECT doc_id, win,
             CAST(list_sum(list_transform(string_split(
               substr(text, win * 64 + 1, 64), ''),
               c -> ord(c) * ord(c))) AS BIGINT) AS ssq,
             CAST(length(substr(text, win * 64 + 1, 64)) AS BIGINT) AS n
      FROM seg),
    act AS (
      SELECT doc_id, win,
             win - ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY win) AS island
      FROM e WHERE ssq > {_VAD_TH} * n),
    spans AS (
      SELECT doc_id, MIN(win) AS span_start, MAX(win) AS span_end
      FROM act GROUP BY doc_id, island HAVING COUNT(*) >= 2),
    f AS (
      SELECT doc_id,
             unnest(generate_series(0,
               octet_length(encode(text)) // 32 - 1)) AS i,
             text
      FROM documents WHERE octet_length(encode(text)) >= 32),
    feat AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             CAST(list_sum(list_transform(
               string_split(substr(text, i * 32 + 1, 32), ''),
               c -> ord(c))) AS BIGINT) AS feat
      FROM f),
    cuts AS (
      SELECT doc_id, frame_idx,
             CASE WHEN LAG(feat) OVER w IS NULL THEN 0
                  WHEN ABS(feat - LAG(feat) OVER w) > {_SCENE_CUT_TH}
                  THEN 1 ELSE 0 END AS is_cut
      FROM feat WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
    sc AS (
      SELECT doc_id, frame_idx,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS scene_id
      FROM cuts),
    scenes AS (
      SELECT doc_id, scene_id, MIN(frame_idx) AS smin, MAX(frame_idx) AS smax
      FROM sc GROUP BY doc_id, scene_id)
    SELECT s.doc_id,
           CAST(s.span_start AS INTEGER) AS span_start,
           CAST(sn.scene_id AS BIGINT) AS scene_id,
           CAST(GREATEST(s.span_start * 2, sn.smin) AS INTEGER)
             AS overlap_start,
           CAST(LEAST(s.span_end * 2 + 1, sn.smax) AS INTEGER)
             AS overlap_end,
           CAST(LEAST(s.span_end * 2 + 1, sn.smax)
                - GREATEST(s.span_start * 2, sn.smin) + 1 AS BIGINT)
             AS overlap_frames
    FROM spans s JOIN scenes sn
      ON s.doc_id = sn.doc_id
     AND s.span_start * 2 <= sn.smax
     AND s.span_end * 2 + 1 >= sn.smin
    """,
)
def multimodal_av_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-visual alignment: join speech spans (the VAD islands, in
    64-byte audio windows) to video scenes (cut-delimited frame runs,
    32-byte frames — one audio window spans exactly 2 frames) of the
    SAME asset by interval overlap — the "which scenes contain speech"
    selector that talking-head/captioned-clip curation runs before
    sampling clips (a speech span touching scene k means scene k is a
    speech scene; overlap_frames sizes the evidence).

    Plan: the VAD span derivation and the scene derivation each share
    one doc-keyed shuffle; the alignment is a doc_id EQUI-join with the
    interval test as a residual — spans and scenes of one asset number
    in the tens, so the per-doc pair term is trivially bounded and no
    banded-range machinery is needed (contrast q_join_banded_range,
    where the intervals do not share a bounding key)."""
    docs = load_table(spark, sf_dir, "documents")

    # speech spans (the VAD island derivation, inline)
    n_wins = (
        F.ceil(F.octet_length(F.col("text")) / F.lit(64.0)).cast("int") - 1
    )
    seg = docs.filter(F.octet_length(F.col("text")) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins)).alias("win"),
        F.col("text"),
    ).select(
        "doc_id",
        "win",
        F.substring(F.col("text"), F.col("win") * 64 + 1, 64).alias("s"),
    )
    ssq = F.aggregate(
        F.split(F.col("s"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.when(c == "", F.lit(0)).otherwise(F.ascii(c) * F.ascii(c)),
    )
    e = seg.select(
        "doc_id", "win", ssq.alias("ssq"), F.length("s").cast("long").alias("n")
    )
    wd = W.partitionBy("doc_id").orderBy("win")
    act = e.filter(F.col("ssq") > F.lit(_VAD_TH) * F.col("n")).withColumn(
        "island", F.col("win") - F.row_number().over(wd)
    )
    spans = (
        act.groupBy("doc_id", "island")
        .agg(
            F.min("win").alias("span_start"),
            F.max("win").alias("span_end"),
            F.count(F.lit(1)).alias("nw"),
        )
        .filter(F.col("nw") >= 2)
        .select("doc_id", "span_start", "span_end")
    )

    # scenes (the scene-cut run derivation, inline)
    from .operators.multimodal import frame_features, with_binary_payload

    feats = frame_features(with_binary_payload(docs), frame=32)
    wf = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("feat").over(wf)
    is_cut = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.abs(F.col("feat") - prev) > _SCENE_CUT_TH, F.lit(1))
        .otherwise(F.lit(0))
    )
    sc = feats.select("doc_id", "frame_idx", is_cut.alias("is_cut")).withColumn(
        "scene_id",
        F.sum("is_cut").over(
            wf.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    scenes = sc.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").alias("smin"), F.max("frame_idx").alias("smax")
    )

    fs = F.col("span_start") * 2
    fe = F.col("span_end") * 2 + 1
    return (
        spans.join(
            scenes,
            (spans.doc_id == scenes.doc_id)
            & (fs <= F.col("smax"))
            & (fe >= F.col("smin")),
        )
        .select(
            spans.doc_id.alias("doc_id"),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("scene_id").cast("long").alias("scene_id"),
            F.greatest(fs, F.col("smin")).cast("int").alias("overlap_start"),
            F.least(fe, F.col("smax")).cast("int").alias("overlap_end"),
            (
                F.least(fe, F.col("smax")) - F.greatest(fs, F.col("smin")) + 1
            )
            .cast("long")
            .alias("overlap_frames"),
        )
    )


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
    from .operators.graph import bfs_hops_labeled

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
    dist = bfs_hops_labeled(edges, seeds, rounds=3)
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


_HOLDOUT_BUDGET = 1500  # tokens per lang in the packed eval shard


@register(
    "pipeline_eval_holdout",
    f"""
    WITH dtoks AS (SELECT doc_id, {{TOKS}} AS t FROM documents),
    dsh AS (
      SELECT doc_id, i AS pos,
             concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]) AS shingle
      FROM dtoks, LATERAL (SELECT unnest(generate_series(1, len(t)-7)) AS i) g(i)
      WHERE len(t) >= 8),
    keepsh AS (SELECT shingle FROM dsh GROUP BY shingle
               HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM dsh a JOIN keepsh USING (shingle) JOIN dsh b USING (shingle)
          WHERE a.doc_id < b.doc_id),
    runs AS (SELECT doc_a, doc_b, pa - pb AS diag,
                    pa - ROW_NUMBER() OVER (
                      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS isl
             FROM m),
    aggr AS (SELECT doc_a, doc_b, COUNT(*) AS run_len
             FROM runs GROUP BY doc_a, doc_b, diag, isl),
    overl AS (SELECT doc_a, doc_b,
                     CAST(MAX(run_len) + 7 AS BIGINT) AS overlap_tokens
              FROM aggr GROUP BY doc_a, doc_b),
    contam AS (
      SELECT DISTINCT CASE WHEN doc_a % 97 = 0 THEN doc_b ELSE doc_a END
               AS doc_id
      FROM overl
      WHERE (doc_a % 97 = 0) <> (doc_b % 97 = 0) AND overlap_tokens >= 13),
    {_minhash_sig_sql().lstrip()},
    neardrop AS (
      SELECT DISTINCT b.doc_id
      FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    clean AS (
      SELECT d.doc_id, d.lang, d.text FROM documents d
      LEFT JOIN contam c ON d.doc_id = c.doc_id
      LEFT JOIN neardrop n ON d.doc_id = n.doc_id
      WHERE d.doc_id % 97 <> 0 AND c.doc_id IS NULL AND n.doc_id IS NULL),
    val AS (
      SELECT doc_id, lang,
             CAST(len({_D_TOKS}) AS BIGINT) AS n_toks
      FROM clean
      WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 10 = 8),
    c AS (
      SELECT doc_id, lang, n_toks,
             SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_toks
      FROM val)
    SELECT doc_id, lang, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
    FROM c WHERE cum_toks <= {_HOLDOUT_BUDGET}
    """.replace("{TOKS}", _D_TOKS),
)
def pipeline_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sixth pipeline ending: build the CLEAN HELD-OUT EVAL SHARD —
    decontaminate (drop train docs with a ≥13-token verbatim benchmark
    overlap, the text_decontaminate_exact gate; the benchmark docs
    themselves, doc_id %% 97 = 0, never enter the shard) → near-dup
    exclusion (drop any doc that is the higher id of an LSH candidate
    pair — conservative: if a near-twin exists ANYWHERE in the corpus,
    the doc cannot serve as eval, or its twin trains on the answer) →
    deterministic hash-split 'val' bucket → per-language token-budget
    pack of what remains. One lazy plan; the complement of
    pipeline_curate: that one builds the training shard, this one
    builds the shard you measure it with.

    Scale: shingle inverted index (df-capped) + banded LSH join + a
    narrow hash-bucket filter + one lang-keyed prefix window — the
    decontamination and near-dup stages are the same bounded joins
    their standalone queries pin; nothing here funnels through a
    global window."""
    from .operators.dedup import exact_substring_pairs, minhash_lsh_pairs
    from .operators.sampling import hash_split
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_substring_pairs(docs, min_tokens=8, max_shingle_df=64)
    bench_a = F.col("doc_a") % 97 == 0
    bench_b = F.col("doc_b") % 97 == 0
    contam = (
        pairs.filter((bench_a != bench_b) & (F.col("overlap_tokens") >= 13))
        .select(
            F.when(bench_a, F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_id")
        )
        .distinct()
    )
    neardrop = (
        minhash_lsh_pairs(
            docs, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    clean = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .join(contam, "doc_id", "left_anti")
        .join(neardrop, "doc_id", "left_anti")
    )
    val = hash_split(clean).filter(F.col("split") == "val").select(
        "doc_id",
        "lang",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    wc = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return val.withColumn("cum_toks", F.sum("n_toks").over(wc)).filter(
        F.col("cum_toks") <= _HOLDOUT_BUDGET
    )


_SPIPE_CAP_BUDGET = 600  # tokens per source after dedup + quality gate


@register(
    "streaming_pipeline_curate",
    rf"""
    WITH base AS (
      SELECT doc_id, text, source, {_D_TOKS} AS t, md5({_D_NORM}) AS fp
      FROM documents),
    dd AS (
      SELECT doc_id, text, source, t FROM (
        SELECT doc_id, text, source, t,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS dr
        FROM base) WHERE dr = 1),
    q AS (
      SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n,
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
      FROM dd),
    kept AS (SELECT doc_id, source, n FROM q WHERE quality >= 3),
    capd AS (
      SELECT doc_id, n FROM (
        SELECT doc_id, n,
               SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS scum
        FROM kept) WHERE scum <= {_SPIPE_CAP_BUDGET}),
    c AS (SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM capd)
    SELECT doc_id, n AS n_tokens,
           CAST((cum - n) // 512 AS INTEGER) AS bin,
           CAST(ROW_NUMBER() OVER (PARTITION BY (cum - n) // 512
                                   ORDER BY doc_id) AS INTEGER) AS bin_pos
    FROM c
    """,
)
def streaming_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING curation pipeline ending (r11 verdict #5) — the
    production shape of continuous crawl ingestion: exact dedup →
    quality gate → per-source domain cap → sequence packing, maintained
    over a DOCUMENT stream with every stateful stage's state carried
    across micro-batches (streaming/incremental.py:
    incremental_pipeline_curate — carried fingerprint set, per-source
    token counters, and the (cum, open-bin) packing scalar,
    batch-id-ledgered exactly-once). The six batch pipeline endings are
    all one-shot compositions; this is the same curation chain run
    CONTINUOUSLY, each arriving document admitted/binned once and never
    revised. The oracle is the composed batch chain: under any ordered
    micro-batch split the admitted, capped, packed shard is
    row-identical (split-invariance + cross-restart replay pinned in
    tests/test_streaming.py)."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_pipeline_curate

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    return incremental_pipeline_curate(
        stream,
        tempfile.mkdtemp(prefix="spcur_"),
        cap_budget=_SPIPE_CAP_BUDGET,
        pack_budget=512,
    )


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
    from .functions import text as TX
    from .operators.sampling import weighted_reservoir

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    weighted = docs.select(
        "doc_id",
        "lang",
        TX.quality_score(F.col("text"), toks).cast("int").alias("weight"),
    )
    return weighted_reservoir(weighted, "weight", k=100)


@register(
    "streaming_weighted_reservoir",
    _ORACLE["sample_weighted_reservoir"],
)
def streaming_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample_weighted_reservoir maintained over the documents STREAM
    (streaming/incremental.py:incremental_weighted_reservoir): the
    carried k-row bottom-k state is the anytime PPS sample of
    everything seen so far. The ticket priorities are row-intrinsic
    (md5 of id and ticket index — no rand()), so bottom-k merge is a
    semilattice and the drained state is row-identical to the one-shot
    batch sample under ANY micro-batch split — the oracle is literally
    the batch query's SQL. Weighting (the Gopher quality score) is
    stateless and computed inside each micro-batch."""
    import tempfile

    from .functions import text as TX
    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_weighted_reservoir

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    toks = TX.tokens(F.col("text"))
    weighted = stream.select(
        "doc_id",
        "lang",
        TX.quality_score(F.col("text"), toks).cast("int").alias("weight"),
    )
    return incremental_weighted_reservoir(
        weighted, tempfile.mkdtemp(prefix="swres_"), k=100
    )


@register(
    "streaming_connected_components",
    f"""
    WITH RECURSIVE
    base AS (SELECT doc_id, md5({_D_NORM}) AS fp,
                    md5(substring({_D_NORM}, 1, 32)) AS pfp
             FROM documents),
    keys AS (SELECT doc_id,
                    1000000000 + ('0x' || substring(fp, 1, 12))::BIGINT
                      AS knode
             FROM base
             UNION ALL
             SELECT doc_id,
                    2000000000000000
                      + ('0x' || substring(pfp, 1, 12))::BIGINT
             FROM base),
    edges AS (SELECT doc_id AS a, knode AS b FROM keys
              UNION SELECT knode, doc_id FROM keys),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    lbl(n, l) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.b, lbl.l FROM lbl JOIN edges e ON e.a = lbl.n),
    comp AS (SELECT n, MIN(l) AS component FROM lbl GROUP BY n)
    SELECT n AS doc_id, CAST(component AS BIGINT) AS component
    FROM comp WHERE n < 1000000000
    """,
)
def streaming_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity resolution over the document stream
    (streaming/incremental.py:incremental_connected_components): each
    arriving document statelessly emits link-key edges — one to its
    exact-content fingerprint node, one to its 32-char-prefix
    fingerprint node (the multi-key ER shape: different evidence kinds
    chain records transitively, so A~B by full text and B~C by shared
    prefix puts {{A,B,C}} in ONE component across any number of
    micro-batches) — and the carried (node, comp) labels absorb them by
    CONTRACTION: batch edges are rewritten onto current component ids,
    a batch-bounded pointer-jump CC merges what this batch connects,
    and only the touched labels remap. The drained labels are
    row-identical to the one-shot CC of the full edge set (oracle: the
    recursive-CTE min-label closure over the same dual-key graph —
    tractable because link-key components are small; key-node ids live
    above 10^9 so the min-id component convention always lands on a
    real doc_id)."""
    import tempfile

    from .functions.text import normalized
    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_connected_components

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    norm = normalized(F.col("text"))
    k1 = F.lit(1000000000) + F.conv(
        F.substring(F.md5(norm), 1, 12), 16, 10
    ).cast("long")
    k2 = F.lit(2000000000000000) + F.conv(
        F.substring(F.md5(F.substring(norm, 1, 32)), 1, 12), 16, 10
    ).cast("long")
    edges = stream.select(
        F.col("doc_id").alias("node_a"),
        F.explode(F.array(k1, k2)).alias("node_b"),
    )
    labels = incremental_connected_components(
        edges, tempfile.mkdtemp(prefix="scc_")
    )
    return labels.filter(F.col("node") < 1000000000).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )


_WALK_STEPS = 4


def _walk_step_sql(i: int) -> str:
    """One unrolled walk step: from w{i}'s node, pick the neighbor whose
    adjacency rank equals hash(node, step) mod degree."""
    return f"""
    w{i + 1} AS (
      SELECT w.seed, {i + 1} AS step, a.dst AS node
      FROM w{i} w
      JOIN deg d ON d.src = w.node
      JOIN adj a ON a.src = w.node
        AND a.rnk = 1 + (('0x' || substring(md5(
              CAST(w.node AS VARCHAR) || ':' || CAST({i + 1} AS VARCHAR)
            ), 1, 8))::BIGINT % d.deg))
    """


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
    "sim_topk_hamming",
    """
    WITH packed AS (
      SELECT vec_id,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 1] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w0,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 33] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w1
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
                  AS INTEGER) AS hamming
      FROM packed q JOIN packed c
        ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, hamming, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY hamming, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def sim_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (operators/similarity.py:hamming_topk):
    sign-binarize each embedding and bit-pack it into two 32-bit words
    (64 floats -> 8 bytes, the 32x compression that lets an exhaustive
    scan hold a billion vectors in RAM — FAISS IndexBinaryFlat), then
    rank candidates by popcount-XOR Hamming distance. The fifth ANN
    path next to brute force, SRP-LSH, IVF, and PQ, and the standard
    cheap first stage before a float rerank (sim_topk_rerank).

    Scale: packing is one aggregate HOF per word inside the corpus scan
    (no explode, whole-stage codegen); queries broadcast; distance is
    two XOR+popcounts per candidate — all integer, so the oracle is the
    identical packing in SQL."""
    from .operators.similarity import hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return hamming_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@register(
    "sim_hamming_recall",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 10
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= 5),
    packed AS (
      SELECT vec_id,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 1] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w0,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 33] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w1
      FROM embeddings),
    hscored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
               AS hamming
      FROM packed q JOIN packed c
        ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY hamming, neighbor_id) AS rn
        FROM hscored) WHERE rn <= 5)
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS recall
    FROM exact e
    LEFT JOIN approx a ON a.query_id = e.query_id
      AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the binary-quantized Hamming index (sim_topk_hamming)
    against the exact cosine baseline, per query — the measurement that
    decides whether 32x compression is usable as a first-stage filter
    or needs a wider candidate pool before the float rerank
    (sim_topk_rerank's pattern). Same two-relation LEFT JOIN shape as
    sim_recall_at_k; both result sets are |Q|*k rows regardless of
    corpus size, so the eval itself is scale-free. Measured: ~0.24
    mean recall@5 on the sf0.01 embeddings — the testdata vectors are
    zero-centered but near-uniform (weakly separated neighbors), the
    regime where 1 bit/dim genuinely loses rank order; this eval
    existing IS the point (measure, don't guess)."""
    from .operators.similarity import brute_force_topk, hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q10 = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q10, emb, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = hamming_topk(q10, emb, k=5).select(
        "query_id", F.col("neighbor_id").alias("h_neighbor")
    )
    return (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["h_neighbor"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("h_neighbor").cast("long").alias("n_hit"),
            (
                F.count("h_neighbor").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


@register(
    "sim_topk_hamming_rerank",
    """
    WITH packed AS (
      SELECT vec_id,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 1] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w0,
        CAST(list_sum(list_transform(range(0, 32), d ->
          CASE WHEN embedding[CAST(d AS INT) + 33] >= 0
               THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END))
          AS BIGINT) AS w1
      FROM embeddings),
    hscored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
               AS hamming
      FROM packed q JOIN packed c
        ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
    cand AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY hamming, neighbor_id) AS rn
            FROM hscored)
      WHERE rn <= 50),
    qv AS (SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(floor(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS v
           FROM embeddings),
    exact AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_dot_product(qq.v, qq.v) AS BIGINT)
               - 2 * CAST(list_dot_product(qq.v, qn.v) AS BIGINT)
               + CAST(list_dot_product(qn.v, qn.v) AS BIGINT)
               AS exact_dist
      FROM cand c
      JOIN qv qq ON qq.vec_id = c.query_id
      JOIN qv qn ON qn.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, exact_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY exact_dist ASC, neighbor_id) AS rn
          FROM exact)
    WHERE rn <= 5
    """,
)
def sim_topk_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of binary-quantized retrieval — and the
    direct answer to sim_hamming_recall's measured 0.24: Hamming top-50
    over the 8-byte packed corpus (sim_topk_hamming's scan, 10x the
    final k) generates candidates, then ONLY those 10x50 pairs are
    reranked by exact fixed-point L2 against the full vectors — the
    same coarse-to-fine dial as sim_topk_rerank with the binary index
    as stage 1 (FAISS IndexBinaryFlat + refine). Measured on the sf0.01
    embeddings: recall@5 vs the exact baseline goes 0.24 (raw
    hamming@5, sim_hamming_recall) -> 0.68 with the 50-candidate pool +
    rerank, while the corpus scan still reads 8 bytes/vector.

    Scale: stage 1 is the popcount-XOR scan (corpus streams, queries
    broadcast); stage 2 touches 50 full vectors per query as point
    lookups. All-integer distances, deterministic ranks."""
    from .operators.similarity import hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cand = hamming_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=50
    ).select("query_id", "neighbor_id")
    qv = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1024.0)).cast("long"),
        ).alias("qv"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qq, qn = F.col("q.qv"), F.col("n.qv")
    exact = (
        cand.join(
            F.broadcast(qv.alias("q")),
            F.col("query_id") == F.col("q.vec_id"),
        )
        .join(qv.alias("n"), F.col("neighbor_id") == F.col("n.vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(qq, qq) - 2 * dot(qq, qn) + dot(qn, qn)).alias(
                "exact_dist"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy("exact_dist", "neighbor_id")
    return exact.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= 5)


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
    from .operators.dedup import connected_components

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


_CDC_CHUNKS_SQL = """
    pos AS (
      SELECT doc_id, text,
             unnest(range(1, GREATEST(LENGTH(text) - 7, 0) + 1)) AS i
      FROM documents),
    bnd AS (
      SELECT doc_id, i + 7 AS cut FROM pos
      WHERE substring(md5(substring(text, CAST(i AS INT), 8)), 1, 2) < '08'),
    kept AS (
      SELECT doc_id, cut FROM (
        SELECT doc_id, cut,
               LAG(cut, 1, -7) OVER (PARTITION BY doc_id ORDER BY cut) AS pc
        FROM bnd) WHERE cut - pc >= 8),
    cuts AS (SELECT doc_id, cut FROM kept
             UNION SELECT doc_id, LENGTH(text) FROM documents
             WHERE LENGTH(text) > 0),
    spans AS (SELECT doc_id, cut,
                     LAG(cut, 1, 0) OVER (PARTITION BY doc_id ORDER BY cut)
                       AS prev
              FROM cuts),
    chunks AS (
      SELECT s.doc_id,
             md5(substring(d.text, CAST(s.prev + 1 AS INT),
                           CAST(s.cut - s.prev AS INT))) AS fp,
             s.cut - s.prev AS clen
      FROM spans s JOIN documents d ON s.doc_id = d.doc_id
      WHERE s.cut > s.prev)
"""  # the CDC span derivation, shared by text_cdc_chunks / dedup_cdc_pairs


@register(
    "text_cdc_chunks",
    f"""
    WITH {_CDC_CHUNKS_SQL}
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(clen) AS BIGINT) AS chunk_len
    FROM chunks GROUP BY fp HAVING COUNT(*) > 1
    ORDER BY n_occ DESC, fp LIMIT 50
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup — the rsync/LBFS/
    data-pipeline trick that finds SHARED SUBSTRINGS across documents
    without any pairwise comparison: a boundary falls wherever the
    rolling 8-gram fingerprint (md5 here) lands in a 1/32 target band,
    so two documents sharing a run of text cut it at the SAME offsets
    and produce bit-identical chunks; duplicated chunks then surface
    with one groupBy. Boundary placement is stateless per position
    (the fingerprint is a pure function of the 8-gram), which is what
    makes it embarrassingly parallel; a LAG-based anti-chain pass
    enforces the >=8-char minimum chunk size (deterministic relational
    variant of sequential CDC's skip rule — documented divergence:
    suppression here compares against the previous RAW cut, sequential
    CDC against the previous KEPT cut).

    Scale: positions explode within a doc (bounded by doc length), the
    only corpus-wide shuffles are the per-doc cut windows (doc-keyed)
    and the final chunk-hash groupBy; blobs never move — only 16-byte
    fingerprints. This is the substring-dedup primitive that scales
    where the suffix-diagonal index (dedup_exact_substring) needs its
    df cap. Span derivation shared with dedup_cdc_pairs
    (operators/dedup.py:cdc_chunks)."""
    from .operators.dedup import cdc_chunks

    docs = load_table(spark, sf_dir, "documents")
    return (
        cdc_chunks(docs).groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("clen").cast("long").alias("chunk_len"),
        )
        .filter(F.col("n_occ") > 1)
        .orderBy(F.desc("n_occ"), "fp")
        .limit(50)
    )


@register(
    "dedup_cdc_pairs",
    f"""
    WITH {_CDC_CHUNKS_SQL},
    cset AS (SELECT DISTINCT doc_id, fp FROM chunks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM cset GROUP BY doc_id),
    df_ok AS (SELECT fp FROM cset GROUP BY fp HAVING COUNT(*) <= 10),
    slim AS (SELECT c.doc_id, c.fp FROM cset c JOIN df_ok USING (fp)),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_chunks
      FROM slim a JOIN slim b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b, s.shared_chunks,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           CAST(s.shared_chunks AS DOUBLE)
             / CAST(LEAST(na.n, nb.n) AS DOUBLE) AS containment
    FROM shared s
    JOIN sizes na ON na.doc_id = s.doc_a
    JOIN sizes nb ON nb.doc_id = s.doc_b
    WHERE s.shared_chunks * 2 >= LEAST(na.n, nb.n)
    """,
)
def dedup_cdc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by CDC chunk CONTAINMENT
    (operators/dedup.py:cdc_containment_pairs) — the rsync/RefinedWeb
    alternative to MinHash: candidates are docs sharing a literal
    >=8-char chunk (equi-join on chunk fingerprints, never all-pairs),
    emitted when shared chunks cover >= 1/2 of the SMALLER doc's chunk
    set. Containment, not Jaccard, so a small document swallowed by a
    large one still surfaces — the contamination/quote-detection
    semantics Jaccard dilutes. Chunk fingerprints with document
    frequency > 10 are dropped from candidate generation (the
    boilerplate-bucket cap, same role as the LSH max_bucket); the
    threshold compare is cross-multiplied integer arithmetic, the one
    division only in the reported score."""
    from .operators.dedup import cdc_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return cdc_containment_pairs(
        docs, threshold_num=1, threshold_den=2, max_df=10
    )


@register(
    "text_skipgram_pairs",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    flat AS (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS w
             FROM toks),
    offs AS (SELECT unnest([-2, -1, 1, 2]) AS d),
    ctx AS (
      SELECT c.w AS center, x.w AS context
      FROM flat c
      CROSS JOIN offs o
      JOIN flat x ON x.doc_id = c.doc_id AND x.p = c.p + o.d)
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
    FROM ctx GROUP BY center, context
    ORDER BY n DESC, center, context LIMIT 100
    """,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction with a ±2 window —
    the word2vec/fastText training-pair generator: each token pairs
    with its neighbors at offsets {{-2,-1,1,2}}, counted corpus-wide.
    The window is an EQUI-join, not a range join: context positions are
    materialized by a 4-row offset explode on the center side, then
    joined on (doc_id, position) — so the plan is one position-keyed
    shuffle and scales linearly in tokens × window, never tokens².
    Top-100 pairs by count (deterministic tiebreak) as the view; the
    full pair stream is what a trainer would consume."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    flat = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "p", "w"
        ),
    )
    ctx = (
        flat.select(
            "doc_id",
            F.col("w").alias("center"),
            F.explode(
                F.array(*[F.lit(d) for d in (-2, -1, 1, 2)])
            ).alias("d"),
            (F.col("p") + F.col("d")).alias("cp"),
        )
        .join(
            flat.select(
                "doc_id",
                F.col("p").alias("cp"),
                F.col("w").alias("context"),
            ),
            ["doc_id", "cp"],
        )
    )
    return (
        ctx.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "center", "context")
        .limit(100)
    )


@register(
    "text_neg_sampling_table",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
      HAVING COUNT(*) >= 5),
    wt AS (
      SELECT w, cnt,
             CAST(FLOOR(1048576.0 * sqrt(CAST(cnt AS DOUBLE)
                    * sqrt(CAST(cnt AS DOUBLE)))) AS BIGINT) AS w_fixed
      FROM counts),
    tot AS (SELECT CAST(SUM(w_fixed) AS BIGINT) AS tw FROM wt)
    SELECT w AS word, cnt,
           w_fixed,
           CAST(w_fixed AS DOUBLE) / CAST(t.tw AS DOUBLE) AS prob
    FROM wt CROSS JOIN tot t
    """,
)
def text_neg_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling distribution: unigram counts
    raised to the 3/4 power, normalized. cnt^0.75 is computed as
    sqrt(cnt · sqrt(cnt)) — two correctly-rounded IEEE sqrts and one
    multiply, the same no-transcendentals trick as
    sample_temperature_weights' alpha=0.5 — then fixed-pointed to
    floor(2^20 · x) so the normalizing sum is an exact integer and the
    final shares are single divides. Words under 5 occurrences are
    dropped (the min-count vocab rule). Scale: one exploded token agg
    into a vocab-bounded table; the 1-row total broadcasts."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )
    wt = counts.select(
        "w",
        "cnt",
        F.floor(
            F.lit(1048576.0)
            * F.sqrt(
                F.col("cnt").cast("double")
                * F.sqrt(F.col("cnt").cast("double"))
            )
        )
        .cast("long")
        .alias("w_fixed"),
    ).localCheckpoint()
    tot = wt.agg(F.sum("w_fixed").cast("long").alias("tw"))
    return wt.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("word"),
        "cnt",
        "w_fixed",
        (F.col("w_fixed").cast("double") / F.col("tw").cast("double")).alias(
            "prob"
        ),
    )


@register(
    "text_rake_keywords",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents
                  WHERE lang = 'en'),
    flat AS (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS w
             FROM toks),
    marked AS (
      SELECT doc_id, p, w,
             CASE WHEN list_contains({_SW['en']}, w)
                       OR NOT regexp_matches(w, '^[a-z]+$')
                  THEN 1 ELSE 0 END AS b
      FROM flat),
    isl AS (SELECT doc_id, p, w, b,
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS g
            FROM marked),
    members AS (SELECT doc_id, g, w FROM isl WHERE b = 0),
    plen AS (SELECT doc_id, g, COUNT(*) AS phrase_len
             FROM members GROUP BY doc_id, g),
    stats AS (
      SELECT m.w AS word, SUM(p2.phrase_len) AS degree, COUNT(*) AS freq
      FROM members m JOIN plen p2 ON m.doc_id = p2.doc_id AND m.g = p2.g
      GROUP BY m.w)
    SELECT word, CAST(degree AS BIGINT) AS degree,
           CAST(freq AS BIGINT) AS freq,
           CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS score
    FROM stats ORDER BY score DESC, degree DESC, word LIMIT 30
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the English
    corpus: candidate phrases are maximal runs of content tokens
    between delimiters (stopwords or any non-[a-z] token), a word's
    degree is the summed length of every phrase it appears in (its
    co-occurrence mass), and score = degree/freq favors words that
    travel in long multi-word phrases — the zero-model keyword
    extractor that needs no training corpus.

    All-integer until the single output division. Scale: phrase
    segmentation is the gaps-and-islands pattern — posexplode, one
    doc-keyed running-sum window, one (doc, island) agg — then one
    word-keyed agg; no self-joins over the corpus, vocabulary-bounded
    output."""
    from .functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "p", "w"
        ),
    )
    sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    marked = toks.withColumn(
        "b",
        F.when(
            F.array_contains(sw, F.col("w"))
            | ~F.col("w").rlike("^[a-z]+$"),
            1,
        ).otherwise(0),
    )
    wdoc = W.partitionBy("doc_id").orderBy("p")
    isl = marked.withColumn("g", F.sum("b").over(wdoc))
    members = isl.filter(F.col("b") == 0).select("doc_id", "g", "w")
    plen = members.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    stats = (
        members.join(plen, ["doc_id", "g"])
        .groupBy(F.col("w").alias("word"))
        .agg(
            F.sum("phrase_len").cast("long").alias("degree"),
            F.count(F.lit(1)).cast("long").alias("freq"),
        )
    )
    return (
        stats.withColumn(
            "score",
            F.col("degree").cast("double") / F.col("freq").cast("double"),
        )
        .orderBy(F.desc("score"), F.desc("degree"), "word")
        .limit(30)
    )


@register(
    "dedup_paragraph_exact",
    f"""
    WITH toks AS (SELECT doc_id, {_D_TOKS} AS t FROM documents),
    ch AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(t[i*32+1 : i*32+32], ' ') AS p
      FROM toks, unnest(generate_series(0,
           (greatest(len(t) - 32, 0) + 31) // 32)) AS u(i)),
    fps AS (SELECT doc_id, chunk_idx, p, md5(p) AS f,
                   doc_id * 1024 + chunk_idx AS ck FROM ch),
    kp AS (SELECT f, MIN(ck) AS keep_ck FROM fps GROUP BY f)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN ck = keep_ck THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(CASE WHEN ck = keep_ck THEN p END, ' '
                               ORDER BY chunk_idx), '') AS text_dedup
    FROM fps JOIN kp USING (f)
    GROUP BY doc_id
    """,
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAGRAPH-granularity exact dedup with reassembly
    (operators/dedup.py:paragraph_dedup) — the RefinedWeb/Dolma stage
    between whole-document exact dedup and near-dup: every distinct
    32-token passage survives exactly ONCE corpus-wide (first occurrence
    in (doc_id, chunk_idx) order); each document is rebuilt from its
    surviving passages, so boilerplate that repeats across millions of
    otherwise-distinct pages (headers, license blocks) is removed
    everywhere but its first occurrence — invisible to document
    fingerprints, recovered here.

    Scale: narrow chunk Generate → ONE hash-agg on the 16-byte passage
    fingerprint (min composite key, window-free, map-side partial) →
    fingerprint equi-join sharing that partitioning → one doc-keyed
    reassembly agg. Shuffle volume is digests + kept passage text;
    nothing quadratic, no skew hazard beyond AQE's reach."""
    from .operators.dedup import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents")
    return paragraph_dedup(docs, size=32)


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
    from .operators.sampling import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, target=F.col("lang") == "en")


@register(
    "sim_matryoshka_recall",
    f"""
    WITH {_D_FLAT},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id < 10
        AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= 5),
    pnorms AS (
      SELECT vec_id,
             SUM(CAST(floor(CAST(v AS DOUBLE)*CAST(v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS n
      FROM flat WHERE pos <= 16 GROUP BY vec_id),
    pdots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(floor(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)*{_FIXED})
                 AS BIGINT)) AS d
      FROM flat q JOIN flat c ON q.pos = c.pos AND q.pos <= 16
        AND c.pos <= 16 AND q.vec_id < 10 AND q.vec_id <> c.vec_id
      GROUP BY 1, 2),
    pscored AS (
      SELECT query_id, neighbor_id,
             (d / {_FIXED}) / sqrt((nq.n / {_FIXED}) * (nc.n / {_FIXED}))
               AS cos_sim
      FROM pdots
      JOIN pnorms nq ON nq.vec_id = query_id
      JOIN pnorms nc ON nc.vec_id = neighbor_id),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM pscored) WHERE rn <= 5)
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS recall
    FROM exact e
    LEFT JOIN approx a ON a.query_id = e.query_id
      AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of PREFIX-dimension retrieval (the Matryoshka/MRL
    truncation: score with only the first 16 of 64 dims) against the
    full-dimension exact cosine baseline — the eval that sizes the
    adaptive-retrieval ladder: how much rank order does a 4x-cheaper
    prefix scan keep, before the full-dim rerank pays for the rest.
    Composition: brute_force_topk over SLICED vectors (the prefix is
    just a narrower embedding — same fixed-point dot/norm machinery,
    zero new scoring code) vs the same operator on full vectors; the
    eval join is |Q|*k rows, scale-free. At 100 TB the prefix scan
    reads 1/4 the bytes of the full scan with the identical plan —
    that byte ratio, times the recall this query MEASURES, is the
    prefix ladder's whole value proposition."""
    from .operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")

    def prefix(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", F.slice("embedding", 1, 16).alias("embedding")
        )

    q10 = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q10, emb, k=5).select("query_id", "neighbor_id")
    approx = brute_force_topk(prefix(q10), prefix(emb), k=5).select(
        "query_id", F.col("neighbor_id").alias("p_neighbor")
    )
    return (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["p_neighbor"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("p_neighbor").cast("long").alias("n_hit"),
            (
                F.count("p_neighbor").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
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
    from .operators.graph import betweenness_sampled

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
    return betweenness_sampled(edges, seeds, rounds=3)


@register(
    "text_gopher_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_D_TOKS}, w -> w <> '') AS t
      FROM documents),
    st AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT)
               AS n_chars,
             CAST(len(list_filter(t,
                    w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
               AS n_alpha,
             CAST(len(list_distinct(list_filter(t, w -> list_contains(
                    ['the','be','to','of','and','that','have','with'], w))))
               AS BIGINT) AS n_stop
      FROM toks)
    SELECT doc_id, n_words,
           n_chars * 1000 // n_words AS mean_wlen_fp,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            + CASE WHEN 3 * n_words <= n_chars AND n_chars <= 10 * n_words
                   THEN 2 ELSE 0 END
            + CASE WHEN 5 * n_alpha >= 4 * n_words THEN 4 ELSE 0 END
            + CASE WHEN n_stop >= 2 THEN 8 ELSE 0 END AS BIGINT)
             AS rules_mask,
           (n_words BETWEEN 50 AND 100000
            AND 3 * n_words <= n_chars AND n_chars <= 10 * n_words
            AND 5 * n_alpha >= 4 * n_words
            AND n_stop >= 2) AS gopher_pass
    FROM st WHERE n_words > 0
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, the filter bundle
    Dolma/RedPajama-style pipelines apply verbatim), per document as a
    RULES BITMASK plus the conjunctive pass flag: (1) word count in
    [50, 100k], (2) mean word length in [3, 10] — cross-multiplied so
    the bound check is exact integers, (4) ≥80%% of words contain an
    alphabetic character, (8) ≥2 distinct stop words from the published
    8-word list. The bitmask (not just the verdict) is the practical
    output: pipeline dashboards track WHICH rule kills documents per
    source before tuning thresholds. Differs from text_quality_score
    (additive heuristic score) by being the named, thresholded,
    auditable rule set.

    Scale: entirely ROW-LOCAL — one tokenize plus four HOF aggregates
    inside a single projection; no shuffle at all (the plan is scan →
    project). Exactly the shape that saturates IO at 100 TB."""
    from .functions import exprs as EX
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(TX.tokens(F.col("text")), lambda w: w != "")

    def stats(tc: F.Column) -> F.Column:
        stop = F.array(
            *[
                F.lit(w)
                for w in ("the", "be", "to", "of", "and", "that", "have", "with")
            ]
        )
        return F.struct(
            F.size(tc).cast("long").alias("n_words"),
            F.aggregate(
                tc,
                F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ).alias("n_chars"),
            F.size(
                F.filter(tc, lambda w: w.rlike("[a-zA-Z]"))
            ).cast("long").alias("n_alpha"),
            F.size(
                F.array_distinct(
                    F.filter(tc, lambda w: F.array_contains(stop, w))
                )
            ).cast("long").alias("n_stop"),
        )

    st = docs.select("doc_id", EX.bind(t, stats).alias("s")).select(
        "doc_id", "s.*"
    )
    nw, nc, na, ns = (
        F.col("n_words"),
        F.col("n_chars"),
        F.col("n_alpha"),
        F.col("n_stop"),
    )
    r1 = nw.between(50, 100000)
    r2 = (3 * nw <= nc) & (nc <= 10 * nw)
    r3 = 5 * na >= 4 * nw
    r4 = ns >= 2
    mask = (
        F.when(r1, 1).otherwise(0)
        + F.when(r2, 2).otherwise(0)
        + F.when(r3, 4).otherwise(0)
        + F.when(r4, 8).otherwise(0)
    )
    return st.filter(nw > 0).select(
        "doc_id",
        "n_words",
        F.expr("n_chars * 1000 DIV n_words").alias("mean_wlen_fp"),
        mask.cast("long").alias("rules_mask"),
        (r1 & r2 & r3 & r4).alias("gopher_pass"),
    )


@register(
    "streaming_dsir_weights",
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
def streaming_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of sample_dsir_weights — the DSIR hashed-bigram
    model (per-bucket raw/target counts) maintained continuously over
    the document stream (streaming/incremental.py:
    incremental_dsir_weights: carried ≤4096-row count table absorbed
    with a full-outer integer sum per micro-batch, batch-id-ledgered
    exactly-once; per-document feature rows archived as disjoint
    deltas), scored at drain time by ONE broadcast join of the final
    model onto the archives. Bucket counts are associative-commutative
    integers and features are row-local, so the drained weights are
    row-identical to the batch operator under ANY micro-batch split —
    the batch SQL is the oracle (split-invariance + cross-restart
    replay pinned in tests/test_streaming.py)."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_dsir_weights

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    return incremental_dsir_weights(stream, tempfile.mkdtemp(prefix="sdsir_"))


@register(
    "pipeline_dsir_select",
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
      SELECT w.doc_id, w.n_feats, w.dsir_fp,
             CAST((w.dsir_fp // w.n_feats) // 131072 + 1 AS INTEGER)
               AS weight
      FROM wts w JOIN documents d USING (doc_id)
      WHERE d.lang <> 'en'),
    pri AS (
      SELECT doc_id, n_feats, dsir_fp, weight,
             list_min(list_transform(range(1, weight + 1), j ->
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))))
               AS priority
      FROM qw WHERE weight >= 1)
    SELECT doc_id, n_feats, dsir_fp, weight
    FROM pri ORDER BY priority, doc_id LIMIT 100
    """,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EIGHTH pipeline ending and the DSIR paper's actual endgame
    (Xie et al. 2023 §3: weight, then importance-RESAMPLE): hashed-
    bigram importance weights against the English target → per-feature
    normalized into a small-integer PPS weight (dsir_fp DIV n_feats is
    the average per-bucket ratio in (0, 2²⁰]; DIV 2¹⁷ + 1 maps it to
    1..9 — integer throughout) → the deterministic md5-ticket bottom-k
    reservoir draws the 100-document selection from the NON-target pool
    (target docs are what the sample is tilted TOWARD, not drawn from).
    Composition of two existing operators (dsir_weights +
    weighted_reservoir), zero new machinery — the point of building
    them as composable pieces.

    Scale: the model is a 4096-row broadcast, the weight map is
    row-local, and the selection is TakeOrderedAndProject — per-
    partition top-k then a k-row driver merge. The corpus is never
    shuffled end to end."""
    from .operators.sampling import dsir_weights, weighted_reservoir

    docs = load_table(spark, sf_dir, "documents")
    wts = dsir_weights(docs, target=F.col("lang") == "en")
    qw = (
        wts.join(
            docs.filter(F.col("lang") != "en").select("doc_id"), "doc_id"
        )
        .withColumn(
            "weight",
            F.expr("CAST((dsir_fp DIV n_feats) DIV 131072 + 1 AS INT)"),
        )
    )
    return weighted_reservoir(qw, k=100, weight_col="weight").select(
        "doc_id", "n_feats", "dsir_fp", "weight"
    )


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
    from .operators.sampling import dsir_weights

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


@register(
    "streaming_paragraph_dedup",
    _ORACLE["dedup_paragraph_exact"],  # the twin shares the batch oracle
)
def streaming_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of dedup_paragraph_exact — corpus-level paragraph
    dedup with reassembly over the continuously-arriving document stream
    (streaming/incremental.py:incremental_paragraph_dedup): carried SEEN
    passage-fingerprint set, batch-id-ledgered exactly-once; each batch
    applies the batch operator's within-batch keep-first rule, then
    drops anything an earlier batch already kept — prefix semantics
    (taxonomy class (2)), so under the doc_id-ordered split the drained
    shard is row-identical to the batch operator and the batch SQL is
    the oracle (split-invariance + replay + restart pinned in
    tests/test_streaming.py)."""
    import tempfile

    from .streaming.dispatch import file_stream_reader
    from .streaming.incremental import incremental_paragraph_dedup

    stream = file_stream_reader(
        spark,
        f"{sf_dir}/documents*.parquet",
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    return incremental_paragraph_dedup(
        stream, tempfile.mkdtemp(prefix="spard_")
    )



@register(
    "dedup_funnel_report",
    f"""
    WITH ex AS (
      SELECT MIN(doc_id) AS doc_id FROM
        (SELECT doc_id, md5({_D_NORM}) AS fp FROM documents)
      GROUP BY fp),
    exd AS (SELECT d.* FROM documents d JOIN ex USING (doc_id)),
    {_minhash_sig_sql("exd")},
    drops AS (
      SELECT DISTINCT b.doc_id FROM banded a
      JOIN ok ON a.band_key = ok.band_key
      JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    near AS (SELECT * FROM exd
             WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
    ptoks AS (SELECT doc_id, {_D_TOKS} AS t FROM near),
    pch AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(t[i*32+1 : i*32+32], ' ') AS p
      FROM ptoks, unnest(generate_series(0,
           (greatest(len(t) - 32, 0) + 31) // 32)) AS u(i)),
    pfps AS (SELECT doc_id, chunk_idx, p, md5(p) AS f,
                    doc_id * 1024 + chunk_idx AS ck FROM pch),
    pkp AS (SELECT f, MIN(ck) AS keep_ck FROM pfps GROUP BY f),
    pkept AS (SELECT doc_id, p FROM pfps JOIN pkp USING (f)
              WHERE ck = keep_ck),
    tok AS (SELECT doc_id,
                   CAST(len(list_filter({_D_TOKS}, w -> w <> ''))
                        AS BIGINT) AS nt
            FROM documents)
    SELECT 'a_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM tok
    UNION ALL
    SELECT 'b_exact', CAST(COUNT(*) AS BIGINT), CAST(SUM(nt) AS BIGINT)
    FROM tok JOIN exd USING (doc_id)
    UNION ALL
    SELECT 'c_near', CAST(COUNT(*) AS BIGINT), CAST(SUM(nt) AS BIGINT)
    FROM tok JOIN near USING (doc_id)
    UNION ALL
    SELECT 'd_paragraph', CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(SUM(len(list_filter(string_split(p, ' '), w -> w <> '')))
                AS BIGINT)
    FROM pkept
    """,
)
def dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup FUNNEL dashboard: how many documents and tokens survive
    each curation stage in production order — raw → exact (document
    fingerprints) → near (conservative LSH: the higher id of every
    candidate pair drops) → paragraph (corpus-level passage keep-first,
    counting surviving tokens) — the one-glance report a pipeline owner
    reads before arguing about thresholds; monotone by construction, and
    the stage-to-stage deltas ARE the yield of each dedup family on this
    corpus. Pure composition of three existing operators plus one token
    count; each stage reuses the exact machinery its standalone query
    pins.

    Scale: the same bounded joins as the standalone stages (fingerprint
    hash-agg, capped band-key equi-join, passage-digest agg) feeding
    4 one-row aggregates — nothing new shuffles."""
    from .operators.dedup import (
        drop_exact_duplicates,
        minhash_lsh_pairs,
        paragraph_chunks,
    )
    from .functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(TX.tokens(F.col("text")), lambda w: w != "")
    ).cast("long")
    tok = docs.select("doc_id", ntok.alias("nt"))

    def stage(name: str, ids: DataFrame) -> DataFrame:
        return (
            tok.join(ids.select("doc_id"), "doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("nt").cast("long").alias("n_tokens"),
            )
            .select(F.lit(name).alias("stage"), "n_docs", "n_tokens")
        )

    ex = drop_exact_duplicates(docs)
    drops = (
        minhash_lsh_pairs(
            ex, k=_MINHASH_K, bands=_MINHASH_BANDS, max_bucket=_LSH_MAX_BUCKET
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    near = ex.join(drops, "doc_id", "left_anti")
    chunked = paragraph_chunks(near, size=32)
    keepers = chunked.groupBy("fp").agg(F.min("ck").alias("keep_ck"))
    pkept = chunked.join(keepers, "fp").filter(
        F.col("ck") == F.col("keep_ck")
    )
    para = pkept.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        # empty-filtered tokenization, the SAME counting rule as stages
        # a_raw..c_near (ADVICE r12: size(split('',' ')) reads 1, which
        # could break the funnel's monotonicity on a corpus with
        # empty/whitespace-only documents — the lone kept empty passage
        # must count 0 tokens, not 1)
        F.sum(
            F.size(F.filter(F.split("p", " "), lambda w: w != ""))
        ).cast("long").alias("n_tokens"),
    ).select(F.lit("d_paragraph").alias("stage"), "n_docs", "n_tokens")
    raw = tok.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    ).select(F.lit("a_raw").alias("stage"), "n_docs", "n_tokens")
    return (
        raw.unionByName(stage("b_exact", ex))
        .unionByName(stage("c_near", near))
        .unionByName(para)
    )


def _family(name: str) -> str:
    """Coarse family tag for interleaving (prefix heuristics)."""
    if name.startswith("dispatch"):
        return "dispatch"
    if len(name) > 1 and name[0] == "q" and name[1].isdigit():
        return "tpch"
    for prefix, fam in (
        ("q_scd2", "window"),
        ("q_source", "scan"),
        ("q_join", "join"),
        ("q_merge", "join"),
        ("q_asof", "join"),
        ("q_skew", "join"),
        ("q_window", "window"),
        ("q_stats", "window"),
        ("q_subquery", "subquery"),
        ("q_recursive", "subquery"),
        ("q_agg", "agg"),
        ("q_cogroup", "join"),
        ("q_rollup", "agg"),
        ("q_cube", "agg"),
        ("q_grouping", "agg"),
        ("q_percentiles", "agg"),
        ("q_distinct", "agg"),
        ("q_pivot", "agg"),
        ("q_udaf", "agg"),
        ("q_explode", "flatten"),
        ("q_unpivot", "flatten"),
        ("graph_", "graph"),
        ("dedup_", "dedup"),
        ("sim_", "sim"),
        ("text_", "text"),
        ("sample_", "sample"),
        ("streaming_", "streaming"),
        ("multimodal_", "multimodal"),
    ):
        if name.startswith(prefix):
            return fam
    return "scalar"  # q_scalar_*, q_json_*, q_variant_*, q_order/set ops


def _interleaved() -> list[str]:
    """Round-robin interleave of all registered query names across families
    (dispatch family leads), so any prefix samples every family."""
    buckets: dict[str, list[str]] = {}
    for name in _QUERIES:  # registration order within each family
        buckets.setdefault(_family(name), []).append(name)
    ordered: list[str] = []
    groups = list(buckets.values())  # dispatch registered first → leads
    i = 0
    while True:
        emitted = False
        for g in groups:
            if i < len(g):
                ordered.append(g[i])
                emitted = True
        if not emitted:
            break
        i += 1
    return ordered


def _driver_history() -> tuple[set[str], set[str]]:
    """Scan the repo-root ``CORRECTNESS_r*.json`` driver reports.

    Returns ``(proved, errored)``: names that have at least one FULLY
    green driver result (rows matched, value hash matched when the
    driver recorded one, no error), and names whose only driver
    appearances were errors/mismatches (highest re-proof priority).
    A rows-match-but-hash-fail row is NOT proof — r6's two oracle-typing
    reds would otherwise sink into the proved bucket and never be
    re-sampled after the oracle fix (r6 verdict #2).
    Missing/unreadable reports are ignored — fresh checkouts fall back to
    the plain family interleave.
    """
    import glob as _glob
    import json as _json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proved: set[str] = set()
    seen_bad: set[str] = set()
    for path in sorted(_glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                report = _json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(report, dict):
            continue
        for name, res in report.items():
            if not isinstance(res, dict):
                continue
            hash_ok = res.get("hash_match", res.get("rows_match"))
            if res.get("rows_match") and hash_ok and res.get("err") is None:
                proved.add(name)
            else:
                seen_bad.add(name)
    return proved, seen_bad - proved


def queries() -> dict[str, QueryFn]:
    """All registered queries, ordered so the driver's fixed sampling
    budget keeps extending coverage round over round.

    The correctness driver checks only a *prefix* of this dict (50 of
    138 as of round 5), so a static ordering would leave the tail
    forever unverified. This ordering is self-maintaining: it reads the
    driver's own past ``CORRECTNESS_r*.json`` reports and front-loads

    1. ``dispatch_route`` — the flagship, always slot 1;
    2. names whose only driver appearances were errors (re-proof first);
    3. names never driver-checked green, family-interleaved;
    4. already-proved names, family-interleaved (regression backstop).

    Each round the newly-proved prefix migrates into bucket 4, rotating
    fresh entries into the driver's budget with no manual bookkeeping.
    """
    base = _interleaved()
    proved, errored = _driver_history()
    if not proved and not errored:
        return {n: _QUERIES[n] for n in base}
    flagship = [n for n in ("dispatch_route",) if n in _QUERIES]
    rest = [n for n in base if n not in flagship]
    # builder-flagged re-proof names: semantics/oracles changed since
    # their last driver check; front of the never-proved bucket so the
    # fix lands inside this round's sample budget (r7: the two latent
    # HUGEINT/DECIMAL oracle repairs). r10's forced re-proofs
    # (q_heavy_hitters_mg / q_join_anti, de-vacuated empty-vs-empty
    # greens) both landed real nonempty driver greens in
    # CORRECTNESS_r10.json, so the unconditional force is retired —
    # they sit in the proved bucket again and their two slots go to
    # never-proven names (pipeline_curate_cap first).
    priority = [
        n
        for n in ("q_table_checksum", "q_cogroup_reconcile")
        if n in _QUERIES and n not in proved
    ]
    never = [
        n
        for n in rest
        if n not in errored and n not in proved and n not in priority
    ]
    ordered = (
        flagship
        + [n for n in rest if n in errored and n not in priority]
        + priority
        + never
        + [n for n in rest if n in proved and n not in priority]
    )
    return {n: _QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
