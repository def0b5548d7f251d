"""Unit tests for bench.py's round-record I/O (r6 verdict #2/#3): the
prior-round loader must skip unparseable driver captures (r6's
overflowed tail -> parsed: null) instead of returning an empty record
that silences every delta, must prefer the repo-committed
BENCH_DETAIL_rNN.json over the driver's stdout capture, and the compact
stdout line must stay under the driver's ~2000-char tail window."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _with_home(monkeypatch, tmp_path):
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )


def test_skips_unparseable_round_and_falls_back(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps(
            {"parsed": {"value": 17.6, "queries": {"q1": 1.0}}}
        )
    )
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": None}))
    _with_home(monkeypatch, tmp_path)
    data, rnd = bench._load_previous_round()
    assert rnd == "r05"
    assert data["queries"] == {"q1": 1.0}


def test_prefers_committed_detail_over_driver_capture(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": None}))
    (tmp_path / "BENCH_DETAIL_r06.json").write_text(
        json.dumps(
            {
                "queries": {"q1": 1.1},
                "queries_stats": {"q1": {"min": 1.1, "median": 1.2}},
                "calibration_cpu_sec": 0.1,
            }
        )
    )
    _with_home(monkeypatch, tmp_path)
    data, rnd = bench._load_previous_round()
    assert rnd == "r06"
    assert data["queries_stats"]["q1"]["median"] == 1.2


def test_no_usable_round_returns_none(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": None}))
    _with_home(monkeypatch, tmp_path)
    assert bench._load_previous_round() is None


def test_detail_writes_next_round_for_gate_sf(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": None}))
    _with_home(monkeypatch, tmp_path)
    p = bench._write_detail({"value": 1.0}, 0.1)
    assert p.endswith("BENCH_DETAIL_r07.json")
    p = bench._write_detail({"value": 1.0}, 0.001)
    assert p.endswith("BENCH_DETAIL_local.json")
