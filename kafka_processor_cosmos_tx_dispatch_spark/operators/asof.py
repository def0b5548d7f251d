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
    one shuffle. `direction="nearest"` the minimum |gap| on either side
    (ties toward the earlier row) — two frames over one sort, still one
    shuffle (_asof_nearest).

    `right_value_cols` are carried from the matched right row, renamed
    `asof_<name>`. `tiebreak_col` (a right column) resolves equal-ts
    right rows toward the largest value. `tolerance_us` (microseconds,
    pandas merge_asof semantics) nulls the ENTIRE match when the nearest
    row is farther than the bound — nearest-within-tolerance equals
    nearest-overall-then-filter, so it's a post-predicate on the matched
    struct, not a different join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
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
        # or the nearest-direction distance compare needs it — the field
        # costs window-state bytes per row otherwise
        + (
            [T.StructField("__asof_ts", right.schema[ts_col].dataType)]
            if tolerance_us is not None or direction == "nearest"
            else []
        )
    )
    need_ts = tolerance_us is not None or direction == "nearest"
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
            *([F.col(ts_col).alias("__asof_ts")] if need_ts else []),
        ).alias("__asof"),
    ).select(*l_tagged.columns)  # align column order for union

    if direction == "nearest":
        return _asof_nearest(
            isinstance(right.schema[ts_col].dataType, T.TimestampType),
            l_tagged, r_tagged, keys, ts_col, left_cols,
            carried, tolerance_us,
        )

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


def _asof_nearest(
    ts_is_ts: bool,
    l_tagged: DataFrame,
    r_tagged: DataFrame,
    keys: list[str],
    ts_col: str,
    left_cols: list[str],
    carried: list[str],
    tolerance_us: int | None,
) -> DataFrame:
    """direction="nearest": min |right.ts - left.ts|, ties toward the
    BACKWARD (earlier) row — stated semantics, since pandas leaves the
    tie unspecified. Still ONE shuffle and ONE sort: both candidate
    arms are window frames over the SAME (keys, ts ASC) ordering, so
    Spark reuses a single Exchange+Sort for both (the second frame adds
    a Window node, not a shuffle). The arm picks are VALUE-BASED struct
    aggregates rather than sort-position picks (first/last): one sort
    direction cannot give the backward arm its largest-tiebreak winner
    AND the forward arm its largest-tiebreak winner simultaneously —
    position-based arms silently inverted the forward tiebreak (caught
    in the r7 review) — so backward = max(struct(ts, tie, match)) over
    preceding, forward = min(struct(ts, -tie, match)) over following:
    lexicographic struct ordering yields greatest-ts/greatest-tie and
    smallest-ts/greatest-tie respectively, matching the documented
    'largest tiebreak wins' contract of both plain directions. Equal-ts
    right rows sort before the left row and are only visible to the
    backward arm; that is exactly right, because a 0-distance match can
    never lose the nearest compare."""

    def us(c):
        return F.unix_micros(c) if ts_is_ts else c.cast("long")

    order = [F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc()]
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # right rows contribute a comparable struct; left rows contribute
    # NULL (aggregates skip it), so the arms see only candidates
    right_key_b = F.when(
        F.col("__side") == 0,
        F.struct(
            us(F.col(ts_col)).alias("t"),
            F.col("__tie").alias("tie"),
            F.col("__asof").alias("m"),
        ),
    )
    right_key_f = F.when(
        F.col("__side") == 0,
        F.struct(
            us(F.col(ts_col)).alias("t"),
            (-F.col("__tie")).alias("ntie"),
            F.col("__asof").alias("m"),
        ),
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left_cols,
        F.col("__side"),
        F.max(right_key_b).over(w_b).alias("__bk"),
        F.min(right_key_f).over(w_f).alias("__fk"),
    )
    matched = filled.select(
        *left_cols,
        F.col("__side"),
        F.col("__bk.m").alias("__b"),
        F.col("__fk.m").alias("__f"),
    ).filter(F.col("__side") == 1)
    lts = us(F.col(ts_col))
    dt_b = lts - us(F.col("__b.__asof_ts"))
    dt_f = us(F.col("__f.__asof_ts")) - lts
    chosen = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(dt_b <= dt_f, F.col("__b"))
        .otherwise(F.col("__f"))
    )
    matched = matched.withColumn("__asof", chosen)
    if tolerance_us is not None:
        gap = F.abs(lts - us(F.col("__asof.__asof_ts")))
        matched = matched.withColumn(
            "__asof", F.when(gap <= F.lit(tolerance_us), F.col("__asof"))
        )
    return matched.select(
        *left_cols,
        *[F.col(f"__asof.{a}").alias(a) for a in carried],
    )
