"""'join'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DataFrame,
    F,
    SparkSession,
    W,
    _REV_SQL,
    _TIERS,
    _TIER_SQL,
    _dsum,
    _revenue,
    load_table,
    pd,
    register,
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
    from ..operators.asof import asof_join

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
    from ..operators.asof import asof_join

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
    from ..operators.asof import asof_join

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
