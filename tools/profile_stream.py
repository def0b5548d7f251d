"""Per-micro-batch overhead profile for the streaming-family queries
(VERDICT r15 item 3 instrument): run one streaming query end-to-end the
way bench.py does (construct = the stream runs at build time), but
capture every StreamingQuery progress event so the cost splits into
micro-batch count x per-batch durationMs components (addBatch,
getBatch/latestOffset, queryPlanning, walCommit/commitOffsets,
stateOperators custom metrics) instead of one opaque wall number.

Usage:
    python tools/profile_stream.py OUT.json [--sf-dir DIR] [name ...]

With no names, profiles every streaming_* registered query. Each query
runs once in THIS session (progress listeners are session-global, so
queries run sequentially); wall time is measured around the registry
call + one noop action on the returned frame, mirroring bench.py's
timed region.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USAGE = "usage: python tools/profile_stream.py OUT.json [--sf-dir DIR] [name ...]"


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(USAGE)
    out_path = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    while rest and rest[0].startswith("--"):
        if rest[0] == "--sf-dir" and len(rest) >= 2:
            sf_dir, rest = rest[1], rest[2:]
        else:
            raise SystemExit(USAGE)
    names = rest

    from pyspark.sql.streaming import StreamingQueryListener

    from kafka_processor_cosmos_tx_dispatch_spark import queries as q
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

    spark = get_spark(app_name="profile_stream")
    registry = q.queries()
    if not names:
        names = [n for n in registry if n.startswith("streaming_")]

    progress_log: list[dict] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:  # noqa: N802
            pass

        def onQueryProgress(self, event) -> None:  # noqa: N802
            p = event.progress
            progress_log.append(json.loads(p.json))

        def onQueryIdle(self, event) -> None:  # noqa: N802
            pass

        def onQueryTerminated(self, event) -> None:  # noqa: N802
            pass

    spark.streams.addListener(_Capture())

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup (batch query): JVM + parquet footers
    run(registry["q1_pricing_summary"](spark, sf_dir))

    out: dict[str, dict] = {}
    for name in names:
        if name not in registry:
            print(f"MISSING: {name}", file=sys.stderr)
            continue
        progress_log.clear()
        t0 = time.perf_counter()
        try:
            df = registry[name](spark, sf_dir)
            run(df)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            continue
        wall = time.perf_counter() - t0
        # listener events arrive asynchronously; give stragglers a beat
        time.sleep(0.5)
        batches = [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs", {}),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "commitTimeMs",
                            "numShufflePartitions",
                            "numStateStoreInstances",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
            for p in progress_log
        ]
        dur_sum: dict[str, int] = {}
        for b in batches:
            for k, v in (b["durationMs"] or {}).items():
                dur_sum[k] = dur_sum.get(k, 0) + int(v)
        out[name] = {
            "wall": round(wall, 3),
            "n_batches": len(batches),
            "durationMs_sum": dur_sum,
            "batches": batches,
        }
        print(
            f"{name:38s} wall={wall:6.2f}s batches={len(batches)} "
            f"durSum={dur_sum}",
            flush=True,
        )

    with open(out_path, "w") as fh:
        json.dump({"queries": out, "sf_dir": sf_dir}, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
