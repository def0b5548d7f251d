"""'scalar'-family queries — split verbatim from the queries.py
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
    _D_NORM,
    _D_SHINGLES,
    _D_TOKS,
    _HOLDOUT_BUDGET,
    _LSH_MAX_BUCKET,
    _MINHASH_BANDS,
    _MINHASH_K,
    _MIX_SCALE,
    _MIX_WEIGHTS,
    _PIPE_CAP_BUDGET,
    _SCENE_CUT_TH,
    _SW,
    _VAD_TH,
    _bigram_lm,
    _dsum,
    _minhash_sig_sql,
    load_table,
    register,
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
    from ..sinks import ensure_bucketed_table

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
    from ..functions import text as TX

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
    from ..functions import exprs as EX
    from ..functions import text as TX

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
    from ..functions import exprs as EX

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
    from ..functions import text as TX
    from ..operators.dedup import drop_exact_duplicates
    from ..operators.sampling import pack_sequences

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
    from ..operators.multimodal import frame_features, with_binary_payload

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
    from ..operators.multimodal import frame_features, with_binary_payload

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
    from ..operators.sketches import misra_gries_candidates

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
    from ..operators.skyline import skyline_2d

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
    from ..operators.asof import asof_join

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
    from ..operators.dedup import drop_exact_duplicates, ngram_containment_pairs

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
    from ..functions import text as TX

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
    from ..functions import text as TX
    from ..operators.dedup import drop_exact_duplicates

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
    from ..operators.dedup import exact_substring_pairs, minhash_lsh_pairs
    from ..operators.sampling import hash_split
    from ..functions import text as TX

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
    from ..operators.sampling import dsir_weights, weighted_reservoir

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
