"""load_table's session-scoped PLAN memo (r16): repeated loads of the
same (session, path) return the same immutable DataFrame handle —
saving the per-call spark.read py4j round-trips and footer/schema read
— while different paths and different sessions stay isolated, and the
memoized frame still computes from the parquet files on every action
(it is a plan, never a result)."""

from __future__ import annotations

import pytest

from kafka_processor_cosmos_tx_dispatch_spark.sources import tables as TB


def test_same_session_same_path_returns_same_handle(spark, sf_dir):
    a = TB.load_table(spark, sf_dir, "nation")
    b = TB.load_table(spark, sf_dir, "nation")
    assert a is b


def test_different_tables_and_dirs_are_distinct(spark, sf_dir):
    a = TB.load_table(spark, sf_dir, "nation")
    b = TB.load_table(spark, sf_dir, "region")
    assert a is not b
    # a second sf_dir must never serve the first's plan
    import os

    other = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if os.path.isdir(other):
        c = TB.load_table(spark, other, "nation")
        assert c is not a


def test_memoized_frame_recomputes_from_parquet(spark, sf_dir, tmp_path):
    # write a tiny table, load (memoized), read again: both actions scan
    # the files — the memo caches the PLAN, not any result
    p = str(tmp_path / "t.parquet")
    spark.range(5).toDF("doc_id").write.parquet(p)
    df = TB.load_table(spark, str(tmp_path), "t")
    assert df.count() == 5
    assert TB.load_table(spark, str(tmp_path), "t") is df
    assert df.count() == 5


def test_timestamp_normalization_preserved(spark, sf_dir):
    ev = TB.load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # second (memoized) call sees the identical normalized schema
    assert TB.load_table(spark, sf_dir, "events").dtypes == ev.dtypes


def test_memo_keyed_per_session(spark, sf_dir):
    a = TB.load_table(spark, sf_dir, "nation")
    memo = TB._TABLE_MEMO.get(spark)
    assert memo is not None and TB.table_path(sf_dir, "nation") in memo
    assert memo[TB.table_path(sf_dir, "nation")] is a


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
