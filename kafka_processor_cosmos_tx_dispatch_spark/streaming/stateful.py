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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 StatefulProcessor API)
# ---------------------------------------------------------------------------

TYPE_COUNTS_SCHEMA = "user_id long, event_type string, n long"


def per_type_counts(stream: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts on the newer StatefulProcessor
    API (transformWithStateInPandas) — the successor to
    applyInPandasWithState, with TYPED state primitives instead of one
    state tuple. Here the state is a MapState keyed by event_type, the
    shape flatMapGroupsWithState forces into an awkward encoded blob.

    Update-mode: emits one row per (user, type) touched in the batch with
    the count so far; counts strictly increase, so the final table is
    max(n) per key pair. State size is O(#users × #types), partitioned by
    user across executors — the per-key map lives in the state store, so
    a hot user's map never transits whole; only touched entries are
    read/written per batch.

    Environment note: Spark's transformWithState driver worker speaks a
    protobuf protocol and needs the `protobuf` Python package at
    runtime. This container doesn't ship it, so the operator is exercised
    by an importorskip-gated test rather than a registry query
    (applyInPandasWithState above covers the stateful gate).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PerTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            batch: dict[str, int] = {}
            for pdf in rows:
                if not len(pdf):
                    continue
                for et, c in pdf["event_type"].value_counts().items():
                    batch[str(et)] = batch.get(str(et), 0) + int(c)
            out = []
            # sorted for a deterministic emit order within the batch
            for et in sorted(batch):
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                n = prev + batch[et]
                self._counts.updateValue((et,), (n,))
                out.append({"user_id": key[0], "event_type": et, "n": n})
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PerTypeCounts(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
