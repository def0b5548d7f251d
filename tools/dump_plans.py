"""Dump `.explain("formatted")` output for declared queries to files.

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX [SF_DIR] name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query name. Plans are the
pre-execution formatted physical plans (AdaptiveSparkPlan initial plans
where AQE applies); nothing is executed. SF_DIR defaults to
/root/testdata/sf0.1 to match the bench scale.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
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
