"""Dump LAZY (materialize-stripped) plans for the BFS-family graph queries.

The three BFS-family queries (graph_bfs_hops, graph_closeness_bfs,
graph_betweenness_sampled) checkpoint every round inside the operator, so
their registry-level `.explain` only shows the post-checkpoint tail — the
round-15 reshapes (symmetrization dedup skip, backward-sweep left join +
coalesce, visited-as-union) all live BEFORE those checkpoints. This tool
monkeypatches `operators.graph.materialize` to identity so the whole loop
unrolls into one lazy plan, making those shapes visible to `.explain`.

Nothing is executed; the dumped plan is NOT the execution plan the engine
runs (the real one is split at each checkpoint) — it is evidence for the
per-round sub-plan shapes only.

Usage:
    python tools/dump_graph_subplans.py OUTDIR SUFFIX [--sf-dir DIR] name [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USAGE = (
    "usage: python tools/dump_graph_subplans.py OUTDIR SUFFIX "
    "[--sf-dir DIR] name [name ...]"
)


def main() -> int:
    if len(sys.argv) < 4:
        raise SystemExit(USAGE)
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest[0] == "--sf-dir":
        if len(rest) < 3:
            raise SystemExit(USAGE)
        sf_dir, rest = rest[1], rest[2:]
    names = rest
    os.makedirs(outdir, exist_ok=True)

    from kafka_processor_cosmos_tx_dispatch_spark import queries as _q
    from kafka_processor_cosmos_tx_dispatch_spark.operators import graph as graph_ops
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

    # Strip checkpoints for the dump, restoring on exit (ADVICE r15):
    # safe standalone, and now also safe for anyone importing main()
    # into a process that keeps using the real operators afterwards.
    orig_materialize = graph_ops.materialize
    graph_ops.materialize = lambda df, *a, **k: df
    try:
        spark = get_spark()
        registry = _q.queries()
        rc = 0
        for name in names:
            if name not in registry:
                print(f"MISSING: {name}", file=sys.stderr)
                rc = 1
                continue
            try:
                df = registry[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(outdir, f"{name}_lazy_{suffix}.txt")
                with open(path, "w") as f:
                    f.write(
                        "# LAZY plan: operators.graph.materialize patched to "
                        "identity so the\n# per-round sub-plan shapes are "
                        "visible (the executed plan is split at\n# each "
                        "checkpoint; see tools/dump_graph_subplans.py).\n"
                    )
                    f.write(buf.getvalue())
                print(f"wrote {path} ({os.path.getsize(path)} bytes)")
            except Exception as exc:  # noqa: BLE001 - report and continue
                print(f"ERROR {name}: {exc}", file=sys.stderr)
                rc = 1
        return rc
    finally:
        graph_ops.materialize = orig_materialize


if __name__ == "__main__":
    raise SystemExit(main())
