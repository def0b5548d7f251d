"""'scan'-family queries — split verbatim from the queries.py
monolith (r13); registration order within the family is
unchanged, so the driver-sampling interleave is identical.
Shared helpers come from queries/_core.py."""

from __future__ import annotations

from ._core import (  # noqa: F401 — shared query toolkit
    DEC_PRICE,
    DataFrame,
    F,
    SparkSession,
    _dsum,
    load_table,
    register,
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
    from ..sinks import roundtrip_dataset

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
    from ..sinks import roundtrip_dataset

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
    from ..sinks import roundtrip_dataset

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
