"""2-D skyline (Pareto frontier) — the "best trade-offs" operator.

Not in the reference (stateless router) and not built into Spark; the
classic relational formulation is a quadratic NOT EXISTS self-join. The
distributed formulation here exploits that dominance is a GLOBAL
property checkable LOCALLY: a point dominated by any partition-mate is
dominated globally, so a linear partition-local sweep prunes almost
everything, and only the per-partition frontiers (≤ partition count ×
frontier size, tiny in practice) meet for the exact global resolve.

Minimization on both dimensions; q dominates p iff q.x <= p.x ∧
q.y <= p.y ∧ (q.x < p.x ∨ q.y < p.y). Duplicates of the same point do
not dominate each other (both survive), which the distinct-points
pre-aggregation makes moot: one row per point with a representative id
and a multiplicity count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _sweep(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Linear 2-D skyline sweep over one in-memory frame: sort by
    (x asc, y asc), keep rows with y strictly below the running min of
    everything BEFORE them. Correct on distinct points: a preceding row
    in this order has smaller x (any y ≤ mine dominates me) or equal x
    with smaller y (dominates me) — so `preceding min(y) <= my y` is
    exactly the dominance test."""
    s = pdf.sort_values([x, y], kind="mergesort").reset_index(drop=True)
    run_min = s[y].cummin().shift(1)
    keep = run_min.isna() | (s[y] < run_min)
    return s[keep]


def skyline_2d(
    points: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Exact global skyline of (x_col, y_col), both minimized.

    Plan: (1) distinct-point pre-agg — one row per (x, y) with the min
    id as representative and the multiplicity (keyed shuffle, map-side
    combinable); (2) partition-local linear sweep under mapInPandas —
    sound because local dominance implies global dominance, so no
    skyline point is ever dropped; (3) exact resolve of the surviving
    per-partition frontiers with the same sweep as a single-partition
    window (survivors are bounded by partitions × local frontier size —
    for the final stage to be a bottleneck, the GLOBAL frontier itself
    would have to be data-sized, in which case the answer is too).

    Returns (x_col, y_col, id_col, n_dups) for every Pareto-optimal
    point."""
    pts = points.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(
        F.min(id_col).alias("rep"),
        F.count(F.lit(1)).alias("n_dups"),
    )

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = []
        for pdf in batches:
            if len(pdf):
                acc.append(_sweep(pdf, "x", "y"))
        if acc:
            # re-sweep the concatenation: Arrow may split one partition
            # into several batches, and the frontier must hold across
            # all of them
            yield _sweep(pd.concat(acc, ignore_index=True), "x", "y")

    survivors = pts.mapInPandas(local, pts.schema)
    w = W.orderBy("x", "y").rowsBetween(W.unboundedPreceding, -1)
    resolved = survivors.withColumn("__pm", F.min("y").over(w))
    return (
        resolved.filter(F.col("__pm").isNull() | (F.col("y") < F.col("__pm")))
        .select(
            F.col("x").alias(x_col),
            F.col("y").alias(y_col),
            F.col("rep").alias(id_col),
            "n_dups",
        )
    )
