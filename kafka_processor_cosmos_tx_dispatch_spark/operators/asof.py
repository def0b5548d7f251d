"""As-of (nearest-predecessor) join — an operator the reference lacks
(its only dataflow is stateless routing, TopologyProducer.kt:84-202) and
Spark has no built-in for.

Implemented as union + window instead of a non-equi join:

    left  (key, ts, ...)   tagged __side=1
    right (key, ts, vals)  tagged __side=0
    union → window last(val, ignoreNulls) over
        (partition by key order by ts, __side, tiebreak
         rows unbounded preceding)
    → keep __side=1 rows

Why this shape at scale: a naive `left join right on key and r.ts <= l.ts`
+ max() explodes to O(|left| x |matching right|) intermediate rows, and a
range-join needs a broadcast or a bucketized interval index. The union
form is ONE shuffle on the key (both inputs hash-partitioned together),
linear state per partition, and sort-based — exactly how a 1000-executor
cluster wants it. Equal timestamps: right sorts before left (__side 0<1),
so the join is inclusive (r.ts <= l.ts), matching DuckDB `ASOF JOIN ...
ON l.ts >= r.ts` semantics; among equal-ts right rows the largest
tiebreak value wins deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    `keys` group (NULLs when none exists — left-outer semantics):
    `direction="backward"` (default) matches the greatest right `ts_col`
    <= left's; `direction="forward"` the smallest right `ts_col` >=
    left's — the same union + window plan with the sort reversed, still
    one shuffle.

    `right_value_cols` are carried from the matched right row, renamed
    `asof_<name>`. `tiebreak_col` (a right column) resolves equal-ts
    right rows toward the largest value. `tolerance_us` (microseconds,
    pandas merge_asof semantics) nulls the ENTIRE match when the nearest
    row is farther than the bound — nearest-within-tolerance equals
    nearest-overall-then-filter, so it's a post-predicate on the matched
    struct, not a different join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in keys and c != ts_col
        ]
    carried = [f"asof_{c}" for c in right_value_cols]
    left_cols = [c for c in left.columns]

    # Carry the matched right row as ONE struct (ADVICE r1, asof.py:90):
    # filling each value column independently with last(ignoreNulls) mixes
    # fields from DIFFERENT right rows whenever a right value is null —
    # null fields of the true predecessor get revived from older rows.
    # A single non-null struct per right row keeps the match row-atomic.
    match_type = T.StructType(
        [
            T.StructField(a, right.schema[c].dataType)
            for c, a in zip(right_value_cols, carried)
        ]
        # right row's own ts rides along ONLY when a tolerance predicate
        # needs it — the field costs window-state bytes per row otherwise
        + (
            [T.StructField("__asof_ts", right.schema[ts_col].dataType)]
            if tolerance_us is not None
            else []
        )
    )
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(None).cast(match_type).alias("__asof"),
    )
    tie = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    r_tagged = right.select(
        *keys,
        F.col(ts_col),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in keys and c != ts_col
        ],
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.struct(
            *[F.col(c).alias(a) for c, a in zip(right_value_cols, carried)],
            *(
                [F.col(ts_col).alias("__asof_ts")]
                if tolerance_us is not None
                else []
            ),
        ).alias("__asof"),
    ).select(*l_tagged.columns)  # align column order for union

    # backward scans time ascending (last-seen right = greatest ts <= l);
    # forward scans descending (last-seen right = smallest ts >= l). At
    # equal ts the right row sorts first either way (inclusive match).
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left_cols,
        F.col("__side"),
        F.last("__asof", ignorenulls=True).over(w).alias("__asof"),
    )
    matched = filled.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        is_ts = isinstance(right.schema[ts_col].dataType, T.TimestampType)

        def us(c: F.Column) -> F.Column:
            return F.unix_micros(c) if is_ts else c.cast("long")

        gap = (
            us(F.col(ts_col)) - us(F.col("__asof.__asof_ts"))
            if direction == "backward"
            else us(F.col("__asof.__asof_ts")) - us(F.col(ts_col))
        )
        matched = matched.withColumn(
            "__asof", F.when(gap <= F.lit(tolerance_us), F.col("__asof"))
        )
    return matched.select(
        *left_cols,
        *[F.col(f"__asof.{a}").alias(a) for a in carried],
    )
