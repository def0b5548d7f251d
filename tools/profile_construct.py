"""Split each query's cost into CONSTRUCT (driver-side plan building:
py4j calls, analysis, any eager materialization the query does at build
time) vs EXECUTE (noop-sink run of the built DataFrame) — the r15
lesson ("count py4j round-trips and construction-time jobs, not just
plan nodes") made into a reusable instrument.

Usage:
    python tools/profile_construct.py OUT.json [--sf-dir DIR] [--iters N] [name ...]

With no names, profiles every registered non-streaming query (the
streaming twins run their stream at construct time by design — the
split is meaningless for them, and they would dominate the wall time).
Writes {"queries": {name: {"construct": s, "execute": s, "iters": N}},
"order": [...]} min-of-iters per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USAGE = (
    "usage: python tools/profile_construct.py OUT.json [--sf-dir DIR] "
    "[--iters N] [name ...]"
)


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(USAGE)
    out_path = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = 3
    while rest and rest[0].startswith("--"):
        if rest[0] == "--sf-dir" and len(rest) >= 2:
            sf_dir, rest = rest[1], rest[2:]
        elif rest[0] == "--iters" and len(rest) >= 2:
            iters, rest = int(rest[1]), rest[2:]
        else:
            raise SystemExit(USAGE)
    names = rest

    from kafka_processor_cosmos_tx_dispatch_spark import queries as q
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

    spark = get_spark(app_name="profile_construct")
    registry = q.queries()
    if not names:
        names = [n for n in registry if not n.startswith("streaming_")]

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + parquet footers
    run(registry["q1_pricing_summary"](spark, sf_dir))

    out: dict[str, dict] = {}
    for name in names:
        if name not in registry:
            print(f"MISSING: {name}", file=sys.stderr)
            continue
        cs, es = [], []
        try:
            for _ in range(iters):
                t0 = time.perf_counter()
                df = registry[name](spark, sf_dir)
                t1 = time.perf_counter()
                run(df)
                t2 = time.perf_counter()
                cs.append(t1 - t0)
                es.append(t2 - t1)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            continue
        out[name] = {
            "construct": round(min(cs), 3),
            "execute": round(min(es), 3),
            "iters": iters,
        }
    with open(out_path, "w") as fh:
        json.dump({"queries": out, "order": list(out)}, fh, indent=1)
    tot_c = sum(v["construct"] for v in out.values())
    tot_e = sum(v["execute"] for v in out.values())
    print(
        f"profiled {len(out)} queries: construct {tot_c:.1f}s, "
        f"execute {tot_e:.1f}s -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
