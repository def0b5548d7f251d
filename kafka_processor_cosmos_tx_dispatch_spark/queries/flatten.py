"""'flatten'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    load_table,
    register,
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
