"""The driver re-proof rotation (r13 verdict #5): the correctness
driver samples only a fixed prefix of queries() (50 of 296), so once
every name is proven the proved bucket must be ordered STALEST FIRST
(by the round of each name's latest green driver result) or the same
static prefix would re-check forever and the r1-era tail would never
re-prove. Pure-Python tests against the repo's real CORRECTNESS_r*.json
history — no Spark session needed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_processor_cosmos_tx_dispatch_spark.queries import _core


def test_driver_history_maps_latest_green_round():
    proved, errored = _core._driver_history()
    # the repo ships 13+ rounds of reports; the flagship is green in
    # the latest one and must carry the max round seen
    assert proved, "no driver history found at the repo root"
    assert proved["dispatch_route"] == max(proved.values())
    # errored = names whose ONLY appearances were bad. NOT asserted
    # empty here: a brand-new query whose first driver appearance is
    # red would flake this rotation test even though rotation itself
    # is fine (ADVICE r14 — same repo-state coupling class as the
    # budget-window flake fixed in 2572922). Rotation only needs the
    # errored set to rank ahead of the proved tail, which
    # test_stalest_names_fit_driver_sample_budget covers via the
    # unproven-names window. A red latest status is the DRIVER's
    # signal to fix the query, not a rotation defect.
    assert isinstance(errored, set)


def test_proved_bucket_is_stalest_first():
    proved, _ = _core._driver_history()
    names = list(_core.queries())
    assert names[0] == "dispatch_route"  # flagship always slot 1
    # after the flagship and any unproven names, the proved tail must be
    # non-decreasing in latest-green round
    tail = [proved[n] for n in names[1:] if n in proved]
    assert tail == sorted(tail)


def test_stalest_names_fit_driver_sample_budget():
    """Every name whose latest green is ≥2 rounds stale ranks inside
    the first max(50, n_stale) entries — i.e. the staleness sort
    actually front-loads the re-proof tail into the sample budget."""
    proved, _ = _core._driver_history()
    if not proved:
        return
    latest = max(proved.values())
    names = list(_core.queries())
    stale = {n for n, r in proved.items() if r <= latest - 2}
    budget = max(50, len(stale))
    # names never driver-proven (e.g. queries added this round) rank
    # AHEAD of the proved tail by design — widen the window by them
    n_unproven = sum(1 for n in names if n not in proved)
    head = set(names[: budget + n_unproven + 1])  # +1: the flagship slot
    missing = stale - head
    assert not missing, f"stale names outside the sample budget: {sorted(missing)[:5]}"
