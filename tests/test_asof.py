"""As-of join semantics: nearest predecessor, inclusivity at equal ts,
left-outer nulls, and deterministic tiebreak among equal-ts right rows."""

import datetime as dt

from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators.asof import asof_join


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), 100),  # right rows at 5 and 10 exist → picks 10 (inclusive)
            (1, _t(7), 101),  # → right at 5
            (1, _t(1), 102),  # no predecessor → null
            (2, _t(30), 103),  # other key, right only at 20 → 20
            (3, _t(30), 104),  # key with no right rows at all → null
        ],
        "k int, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [
            (1, _t(5), 7, "a"),
            (1, _t(10), 8, "b"),
            (1, _t(10), 9, "c"),  # equal ts: tiebreak → max rid wins
            (1, _t(20), 10, "d"),  # after every left row → never matched
            (2, _t(20), 11, "e"),
        ],
        "k int, ts timestamp, rid int, val string",
    )
    out = asof_join(
        left,
        right,
        keys=["k"],
        ts_col="ts",
        right_value_cols=["rid", "val"],
        tiebreak_col="rid",
    )
    got = {r["left_id"]: (r["asof_rid"], r["asof_val"]) for r in out.collect()}
    assert got == {
        100: (9, "c"),  # inclusive at equal ts, tiebreak picks rid 9 over 8
        101: (7, "a"),
        102: (None, None),
        103: (11, "e"),
        104: (None, None),
    }
    assert out.count() == left.count()  # left-outer: every left row survives


def test_asof_matched_row_is_atomic(spark):
    """ADVICE r1 (asof.py:90): when the matched right row carries NULL in
    one value column, that null must SURVIVE — filling each column
    independently with last(ignoreNulls) used to revive the stale value
    from an older right row, emitting a row that never existed."""
    left = spark.createDataFrame(
        [(1, _t(10), 100)], "k int, ts timestamp, left_id int"
    )
    right = spark.createDataFrame(
        [
            (1, _t(5), 7, "old"),  # older row: val non-null
            (1, _t(9), 8, None),  # true predecessor: val IS NULL
        ],
        "k int, ts timestamp, rid int, val string",
    )
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_value_cols=["rid", "val"]
    )
    row = out.collect()[0]
    # the matched row is (rid=8, val=None) — not a chimera (8, "old")
    assert (row["asof_rid"], row["asof_val"]) == (8, None)


def test_asof_single_shuffle_plan(spark):
    """The whole operator must compile to ONE exchange (the window's
    hash partitioning) — no join node anywhere in the plan."""
    left = spark.range(10).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(5).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_micros(F.col("id") * 2_000_000).alias("ts"),
        F.col("id").alias("rid"),
    )
    out = asof_join(left, right, keys=["k"], ts_col="ts", right_value_cols=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_naive_reference(spark):
    """Property check against a naive per-row reference on a pseudo-random
    input (deterministic seed)."""
    import random

    rng = random.Random(42)
    left = [(rng.randrange(4), rng.randrange(100), i) for i in range(120)]
    right = [(rng.randrange(4), rng.randrange(100), 1000 + i) for i in range(80)]

    import datetime as dt

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in left], "k int, ts timestamp, left_id int"
    )
    rdf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in right], "k int, ts timestamp, rid int"
    )
    out = asof_join(
        ldf, rdf, keys=["k"], ts_col="ts", right_value_cols=["rid"], tiebreak_col="rid"
    )
    got = {r["left_id"]: r["asof_rid"] for r in out.collect()}

    def expect(k, m):
        cands = [(rm, rid) for rk, rm, rid in right if rk == k and rm <= m]
        return max(cands)[1] if cands else None  # latest ts, then max rid

    want = {i: expect(k, m) for k, m, i in left}
    assert got == want


def test_asof_forward_with_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), 100),  # right at 10 (inclusive) and 12 → picks 10
            (1, _t(11), 101),  # nearest following is 12
            (1, _t(40), 102),  # nothing after → null
            (1, _t(0), 103),   # nearest following (5) is 5 min away → tolerance kills it
        ],
        "k int, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [
            (1, _t(5), 7, "a"),
            (1, _t(10), 8, "b"),
            (1, _t(12), 9, "c"),
        ],
        "k int, ts timestamp, rid int, val string",
    )
    out = asof_join(
        left,
        right,
        keys=["k"],
        ts_col="ts",
        right_value_cols=["rid", "val"],
        tiebreak_col="rid",
        direction="forward",
        tolerance_us=3 * 60 * 1_000_000,  # 3 minutes
    )
    got = {r["left_id"]: (r["asof_rid"], r["asof_val"]) for r in out.collect()}
    assert got == {
        100: (8, "b"),  # inclusive at equal ts
        101: (9, "c"),
        102: (None, None),  # no following row
        103: (None, None),  # following row exists but outside tolerance
    }
    assert out.count() == left.count()


def test_asof_forward_matches_naive_reference(spark):
    """Property check for direction='forward' + tolerance against a naive
    per-row reference on a pseudo-random input (deterministic seed)."""
    import datetime as dt
    import random

    rng = random.Random(7)
    left = [(rng.randrange(4), rng.randrange(100), i) for i in range(120)]
    right = [(rng.randrange(4), rng.randrange(100), 1000 + i) for i in range(80)]
    tol_min = 15

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in left], "k int, ts timestamp, left_id int"
    )
    rdf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in right], "k int, ts timestamp, rid int"
    )
    out = asof_join(
        ldf,
        rdf,
        keys=["k"],
        ts_col="ts",
        right_value_cols=["rid"],
        tiebreak_col="rid",
        direction="forward",
        tolerance_us=tol_min * 60 * 1_000_000,
    )
    got = {r["left_id"]: r["asof_rid"] for r in out.collect()}

    def expect(k, m):
        cands = [(rm, rid) for rk, rm, rid in right if rk == k and rm >= m]
        if not cands:
            return None
        # earliest ts wins; among equal ts the max rid (tiebreak_col)
        best_ts = min(rm for rm, _ in cands)
        if best_ts - m > tol_min:
            return None
        return max(rid for rm, rid in cands if rm == best_ts)

    want = {i: expect(k, m) for k, m, i in left}
    assert got == want


def test_asof_nearest_matches_naive_reference(spark):
    """direction='nearest' vs a naive per-row reference: min |gap|, tie
    toward the earlier (backward) row, left-outer nulls, and the stated
    equal-ts behavior (0-distance rows come through the backward arm
    with the usual tiebreak)."""
    import random

    rng = random.Random(4242)
    left = [(rng.randrange(4), rng.randrange(100), i) for i in range(120)]
    right = [(rng.randrange(4), rng.randrange(100), 1000 + i) for i in range(80)]

    import datetime as dt

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in left], "k int, ts timestamp, left_id int"
    )
    rdf = spark.createDataFrame(
        [(k, ts(m), i) for k, m, i in right], "k int, ts timestamp, rid int"
    )
    out = asof_join(
        ldf,
        rdf,
        keys=["k"],
        ts_col="ts",
        right_value_cols=["rid"],
        tiebreak_col="rid",
        direction="nearest",
    )
    got = {r["left_id"]: r["asof_rid"] for r in out.collect()}

    def expect(k, m):
        back = [(rm, rid) for rk, rm, rid in right if rk == k and rm <= m]
        fwd = [(rm, rid) for rk, rm, rid in right if rk == k and rm > m]
        b = max(back) if back else None  # latest ts, then max rid
        f = None
        if fwd:
            # largest-tiebreak contract, same as direction='forward':
            # earliest future ts, then MAX rid among its duplicates
            fm = min(rm for rm, _ in fwd)
            f = (fm, max(rid for rm, rid in fwd if rm == fm))
        if b is None and f is None:
            return None
        if b is None:
            return f[1]
        if f is None:
            return b[1]
        return b[1] if (m - b[0]) <= (f[0] - m) else f[1]

    want = {i: expect(k, m) for k, m, i in left}
    assert got == want


def test_asof_nearest_single_shuffle_plan(spark):
    """nearest must ALSO be one exchange: the forward arm is a second
    window frame over the same partitioning+sort, never a join or a
    second shuffle."""
    left = spark.range(10).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(5).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_micros(F.col("id") * 2_000_000).alias("ts"),
        F.col("id").alias("rid"),
    )
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", right_value_cols=["rid"],
        direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_nearest_tolerance(spark):
    out = asof_join(
        spark.createDataFrame(
            [(1, _t(10), 100), (1, _t(40), 101)],
            "k int, ts timestamp, left_id int",
        ),
        spark.createDataFrame(
            [(1, _t(8), 7, "a"), (1, _t(13), 8, "b")],
            "k int, ts timestamp, rid int, val string",
        ),
        keys=["k"],
        ts_col="ts",
        right_value_cols=["rid", "val"],
        direction="nearest",
        tolerance_us=5 * 60 * 1_000_000,
    )
    got = {r["left_id"]: r["asof_rid"] for r in out.collect()}
    # left@10: back gap 2 <= fwd gap 3 -> rid 7; left@40: nearest is 13
    # (27 min away) but tolerance is 5 min -> null
    assert got == {100: 7, 101: None}


def test_asof_nearest_forward_arm_tiebreak_matches_forward_direction(spark):
    """r7 review finding, pinned: when the nearest winner is on the
    FORWARD side and multiple right rows share that timestamp, the
    survivor must be the largest-tiebreak row — identical to
    direction='forward' on the same data (the position-based forward
    arm used to return the smallest)."""
    left = spark.createDataFrame(
        [(1, _t(10), 100)], "k int, ts timestamp, left_id int"
    )
    right = spark.createDataFrame(
        [(1, _t(12), 1, "a"), (1, _t(12), 2, "b")],
        "k int, ts timestamp, rid int, val string",
    )
    kwargs = dict(
        keys=["k"], ts_col="ts", right_value_cols=["rid", "val"],
        tiebreak_col="rid",
    )
    fwd = asof_join(left, right, direction="forward", **kwargs).collect()[0]
    near = asof_join(left, right, direction="nearest", **kwargs).collect()[0]
    assert fwd["asof_rid"] == 2
    assert near["asof_rid"] == 2
    assert near["asof_val"] == "b"
