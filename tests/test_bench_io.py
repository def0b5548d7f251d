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


def _mkrun(**qs):
    return {
        "queries": {n: {"min": v, "median": v} for n, v in qs.items()},
        "cal_cpu_big": [0.33, 0.34],
    }


def test_ab_stats_pair_mean_and_spread():
    # pair 1: 10 -> 11 (+10%); pair 2: 10 -> 10.4 (+4%) on the shared
    # set {q1,q2}; q3 is missing from one run and must be excluded
    runs = {
        "A": [_mkrun(q1=4.0, q2=6.0, q3=1.0), _mkrun(q1=4.0, q2=6.0)],
        "B": [
            _mkrun(q1=4.4, q2=6.6, q3=1.0),
            _mkrun(q1=4.2, q2=6.2, q3=1.0),
        ],
    }
    s = bench._ab_stats(runs, ["q1", "q2", "q3"])
    assert s["ab_pairs"] == 2
    assert s["ab_shared_queries"] == 2
    assert s["ab_pair_deltas_pct"] == [10.0, 4.0]
    assert s["ab_delta_vs_prev_pct"] == 7.0
    assert s["ab_spread_pct"] == 6.0
    assert s["ab_queries_pct"]["q1"] == 7.5  # (+10 +5)/2


def test_ab_stats_single_pair_has_no_spread():
    runs = {"A": [_mkrun(q1=2.0)], "B": [_mkrun(q1=2.2), _mkrun(q1=9.9)]}
    s = bench._ab_stats(runs, ["q1"])
    assert s["ab_pairs"] == 1  # unpaired trailing B run is discarded
    assert s["ab_delta_vs_prev_pct"] == 10.0
    assert s["ab_spread_pct"] is None


def test_ab_stats_error_paths():
    assert "ab_error" in bench._ab_stats({"A": [], "B": [_mkrun(q1=1)]}, ["q1"])
    runs = {"A": [_mkrun(q1=1.0)], "B": [_mkrun(q2=1.0)]}
    assert "ab_error" in bench._ab_stats(runs, ["q1", "q2"])


def test_ab_alternated_records_error_without_prior_round(tmp_path, monkeypatch):
    _with_home(monkeypatch, tmp_path)
    detail = {}
    bench._ab_alternated(["q1"], "/root/testdata/sf0.001", detail)
    assert detail["ab_error"] == "no prior round bench record"
    assert "delta_basis" not in detail


def test_ab_quality_gate_passes_healthy_run():
    stats = {"ab_pairs": 2, "ab_cal_cpu_big": [[0.40, 0.42], [0.43, 0.39]]}
    assert bench._ab_quality_gate(stats, iters=3) is None


def test_ab_quality_gate_rejects_the_r13_failure_modes():
    # iters=1 — compile-dominated (the committed false +54.5% headline)
    healthy = {"ab_pairs": 2, "ab_cal_cpu_big": [[0.4, 0.41]]}
    assert "iters=1" in bench._ab_quality_gate(healthy, iters=1)
    # a single pair has no spread to read the delta against
    assert "pairs=1" in bench._ab_quality_gate(
        {"ab_pairs": 1, "ab_cal_cpu_big": [[0.4]]}, iters=5
    )
    # cpu_big probe doubled mid-phase (r13: 0.43 -> 0.99)
    gate = bench._ab_quality_gate(
        {"ab_pairs": 2, "ab_cal_cpu_big": [[0.43, 0.45], [0.99, 0.97]]},
        iters=5,
    )
    assert gate is not None and "drift" in gate
    # null probes (older run records) are tolerated, not a crash
    assert (
        bench._ab_quality_gate(
            {"ab_pairs": 2, "ab_cal_cpu_big": [None, [None]]}, iters=3
        )
        is None
    )
    # pairs that disagree wildly (r14 sf0.001 smoke: 25.1 vs 51.1 →
    # spread 26 promoted a +38% weather reading) are advisory-only
    gate = bench._ab_quality_gate(
        {
            "ab_pairs": 2,
            "ab_spread_pct": 26.0,
            "ab_cal_cpu_big": [[0.4, 0.41], [0.42, 0.4]],
        },
        iters=3,
    )
    assert gate is not None and "spread" in gate
    # a sweep that already measured the box unsteady (r15 run 2: cal
    # spread 57.1 → a −23.2% reading on code-identical queries passed
    # every in-phase check) disqualifies the phase that follows it
    healthy2 = {"ab_pairs": 2, "ab_cal_cpu_big": [[0.40, 0.42], [0.43, 0.39]]}
    gate = bench._ab_quality_gate(healthy2, iters=3, sweep_spread=57.1)
    assert gate is not None and "sweep calibration spread" in gate
    # ...while a quiet-box sweep (r15 run 1: 27.9) still passes
    assert (
        bench._ab_quality_gate(healthy2, iters=3, sweep_spread=27.9)
        is None
    )
    # and an absent sweep reading (older records) is tolerated
    assert (
        bench._ab_quality_gate(healthy2, iters=3, sweep_spread=None)
        is None
    )


def test_compact_line_parses_and_fits_tail():
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": 123.4,
        "unit": "sec",
        "sf": 0.1,
        "delta_basis": "median",
        "delta_vs_prev_pct": 2.5,
        "ab_error": "quality gate: pairs=1 < 2 — ab_* advisory",
        "ab_pair_deltas_pct": [1.2],
        "not_compact_key": "x" * 5000,  # must NOT leak into the line
    }
    line = bench._compact_line(detail, 296, "/tmp/BENCH_DETAIL_r14.json")
    parsed = json.loads(line)
    assert parsed["n_queries"] == 296
    assert parsed["detail_file"] == "BENCH_DETAIL_r14.json"
    assert "not_compact_key" not in parsed
    assert len(line) < 1800
