"""'window'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DEC_PRICE,
    DataFrame,
    F,
    SparkSession,
    W,
    load_table,
    register,
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
