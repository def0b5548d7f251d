"""'subquery'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    SparkSession,
    _EXISTS_SQL,
    _IN_SUBQ_SQL,
    _RECURSIVE_SQL,
    _SCALAR_SUBQ_SQL,
    _sql_query,
    load_table,
    register,
)
register("q_subquery_exists", _EXISTS_SQL)(
    _sql_query(_EXISTS_SQL, "orders", "lineitem")
)
register("q_subquery_scalar", _SCALAR_SUBQ_SQL)(
    _sql_query(_SCALAR_SUBQ_SQL, "nation", "customer")
)
register("q_subquery_in", _IN_SUBQ_SQL)(_sql_query(_IN_SUBQ_SQL, "supplier", "nation"))
register("q_recursive_cte", _RECURSIVE_SQL)(_sql_query(_RECURSIVE_SQL))


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
