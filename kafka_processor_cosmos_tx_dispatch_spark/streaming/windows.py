"""Streaming time-window aggregations: tumbling / sliding / session, with
watermark-based late-data handling, plus streaming dedup.

The reference is stateless (no time semantics at all — the Kafka record
timestamp is never read); these are the stateful streaming operators the
north star adds. All are stock Structured Streaming: state lives in the
state store, watermarks bound it, AQE/shuffle partitioning rules match
the batch engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC_VALUE = "decimal(12,2)"


def _exact_sum(col: str) -> Column:
    """Decimal-exact sum surfaced as double (same determinism contract as
    queries.py)."""
    return F.sum(F.col(col).cast(DEC_VALUE)).cast("double")


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts+sums. Watermark bounds state: windows older
    than (max event time - watermark) are finalized and evicted — the knob
    that keeps state finite over unbounded input."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), _exact_sum("value").alias("sum_value"))
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows (state
    multiplier — size watermark accordingly)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width, slide), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), _exact_sum("value").alias("sum_value"))
    )


def session_windows(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (dynamic, gap-based): merges events within `gap` of
    each other per key — the sessionization primitive."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_sum("value").alias("session_value"),
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps keys only until the watermark
    passes — the unbounded-input version of dropDuplicates."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
