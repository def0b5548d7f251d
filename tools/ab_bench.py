"""A/B bench runner: time a query subset against ONE code tree in a
fresh process, so an orchestrator can alternate trees (counterbalanced
A B B A or A B A B ...) and compare distributions taken minutes — not a
full round — apart on the same box. This is the instrument the r11/r12
noise investigations proved out (PROBES.md: "the alternation, not the
probe, is what cancels drift"); bench.py's headline delta is now built
on it (_ab_alternated), and it remains directly usable for ad-hoc
bisects of a single query.

Usage:
    python tools/ab_bench.py <repo_root> <q1,q2,...|@listfile> [iters] [out.json]

- <repo_root> is prepended to sys.path, so the same runner script can
  measure any checked-out tree (bench.py points it at a detached git
  worktree of the prior round's commit).
- names not in that tree's registry are SKIPPED and reported under
  "missing" (the orchestrator intersects across runs).
- [out.json]: when given, the result JSON is written there INSTEAD of
  stdout, so Spark progress noise never corrupts the parse.

Protocol (mirrors bench.py's noise discipline, PROBES.md r11 findings):
- warmup query + discarded probe sample first (JVM C2 tiering);
- one cpu_big (~0.3 s pure-compute) probe sample before AND after the
  query block — the only probe whose spread gates attribution on this
  box; the IO scan probe is box-inherent noise and is skipped here;
- min-of-N and median per query, noop sink (full plan, no collect).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo_root = os.path.abspath(sys.argv[1])
    names_arg = sys.argv[2]
    if names_arg.startswith("@"):
        with open(names_arg[1:]) as fh:
            names = [ln.strip() for ln in fh if ln.strip()]
    else:
        names = names_arg.split(",")
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    sys.path.insert(0, repo_root)

    from kafka_processor_cosmos_tx_dispatch_spark import queries as q
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_bench")
    registry = q.queries()
    missing = [n for n in names if n not in registry]
    names = [n for n in names if n in registry]

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def probe() -> float:
        big = spark.range(1_500_000_000).agg(
            F.sum(F.col("id") * 3 % 7), F.count(F.lit(1))
        )
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(big)
            dt = min(dt, time.perf_counter() - t0)
        return round(dt, 4)

    # warmup: JVM, parquet footers, probe plan codegen (discarded)
    warm = "q1_pricing_summary" if "q1_pricing_summary" in registry else names[0]
    run(registry[warm](spark, sf_dir))
    probe()

    cal_before = probe()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run(registry[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = {
            "min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
        }
    cal_after = probe()

    result = json.dumps(
        {
            "repo": repo_root,
            "iters": iters,
            "cal_cpu_big": [cal_before, cal_after],
            "missing": missing,
            "queries": out,
        }
    )
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(result)
    else:
        print(result)


if __name__ == "__main__":
    main()
