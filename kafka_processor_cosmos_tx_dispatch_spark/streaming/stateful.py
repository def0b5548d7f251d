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

Determinism contract: Arrow may hand one group to the function as
several chunks in arbitrary row order, and micro-batch boundaries are
an accident of file listing — so every accumulator here is
order-independent (count, integer-cents sum) or carries its own total
order ("last" = max by (ts, event_id), tracked in state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_type string"
STATE_SCHEMA = (
    "n_events long, total_cents long, last_ts long, last_event_id long, last_type string"
)


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, cents, last_ts, last_eid, last = state.get
    else:
        n, cents, last_ts, last_eid, last = 0, 0, -1, -1, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        # cents-exact accumulation: values are 2-decimal; per-row int math
        # keeps the running sum order-independent
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        idx = pdf.sort_values(["ts", "event_id"]).index[-1]
        c_ts = int(pd.Timestamp(pdf.at[idx, "ts"]).value)
        c_eid = int(pdf.at[idx, "event_id"])
        if (c_ts, c_eid) > (last_ts, last_eid):
            last_ts, last_eid, last = c_ts, c_eid, str(pdf.at[idx, "event_type"])
    state.update((n, cents, last_ts, last_eid, last))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": cents / 100.0,
                "last_type": last,
            }
        ]
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
