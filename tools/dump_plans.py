"""Dump `.explain("formatted")` output for declared queries to files.

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX [--sf-dir DIR] name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query name. Plans are the
pre-execution formatted physical plans (AdaptiveSparkPlan initial plans
where AQE applies); nothing is executed. --sf-dir defaults to
/root/testdata/sf0.1 to match the bench scale.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USAGE = (
    "usage: python tools/dump_plans.py OUTDIR SUFFIX [--sf-dir DIR] "
    "name [name ...]"
)


def parse_args(argv: list[str]) -> tuple[str, str, str, list[str]]:
    """(outdir, suffix, sf_dir, names) — explicit --sf-dir flag instead
    of isdir-sniffing the first name (ADVICE r15: a query name matching
    a local directory was silently dropped from the dump list)."""
    if len(argv) < 4:
        raise SystemExit(USAGE)
    outdir, suffix = argv[1], argv[2]
    rest = argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest[0] == "--sf-dir":
        if len(rest) < 3:
            raise SystemExit(USAGE)
        sf_dir, rest = rest[1], rest[2:]
    return outdir, suffix, sf_dir, rest


def main() -> int:
    outdir, suffix, sf_dir, names = parse_args(sys.argv)
    os.makedirs(outdir, exist_ok=True)

    from kafka_processor_cosmos_tx_dispatch_spark import queries as _q
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

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
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
