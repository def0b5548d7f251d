"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps no state (explicitly: no state stores / KTables).
This is the escape hatch the north star requires for operators Spark's
built-ins can't express: arbitrary per-key state with timeout control,
Arrow-batched.

Example operator: per-user running profile (event count, value sum, last
event type) maintained across micro-batches — the shape of any
per-entity accumulator (rate limiting, fraud scoring, feature freshness).

Scale notes: state is partitioned by the group key across executors;
Arrow moves whole groups per batch. State size = O(#distinct keys) —
pair with a timeout (GroupStateTimeout) to evict idle keys on unbounded
key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_type string"
STATE_SCHEMA = "n_events long, total_value double, last_type string"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        # cents-exact accumulation: values are 2-decimal; per-row int math
        # keeps the running sum order-independent
        total += int(pdf["value"].mul(100).round().astype("int64").sum())
        last = str(pdf["event_type"].iloc[-1])
    state.update((n, float(total), last))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total / 100.0, "last_type": last}]
    )


def running_user_profiles(stream: DataFrame) -> DataFrame:
    """Per-user running aggregate with explicit state; update-mode output
    (one row per user per micro-batch that touched it)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
