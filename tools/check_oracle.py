"""Self-check harness mimicking the driver's correctness gate:

For every query in __spark_entry__.queries(), run the Spark plan and the
DuckDB oracle at the given sf_dir, then compare row count, column names,
and an order-insensitive value comparison (columns sorted by name, rows
sorted, values normalized). Run:

    python tools/check_oracle.py [sf_dir] [query ...]

The comparison core is importable — tests/test_oracle_sweep.py runs the
same check over the full declared surface as a pytest gate, so a
regression in any oracle-paired query fails CI even when the round
driver's budget window samples only a subset.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class DriverIncompatibleShape(Exception):
    """An output cell holds a list/dict — the ROUND DRIVER's pandas
    canonicalizer (`sort_values` over all columns) throws
    ``unhashable type`` on these before any value compare, so the local
    harness must REFUSE them rather than normalize (r7 verdict #3: the
    old list→tuple normalization here is exactly why the q_scalar_array
    / q_scalar_hof driver reds were invisible locally)."""


def normalize(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, dict)):
        raise DriverIncompatibleShape(
            "driver-incompatible output shape: list/map/struct cell "
            f"({type(v).__name__}) — serialize with array_join/to_json"
        )
    return v


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # stringify for total ordering across None/mixed types; equality of the
    # stringified rows is what the comparison needs
    return sorted(
        tuple(repr(normalize(r[i])) for i in order) for r in rows
    )


def make_duckdb(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """Connection with the harness tables registered as views (the same
    registration the round driver performs)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, fn, oracle_sql, sf_dir) -> list[str]:
    """Run one Spark query + its DuckDB oracle; return a list of mismatch
    descriptions (empty = parity). Raises nothing: engine errors are
    returned as findings so a sweep reports every broken query at once."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        return [f"spark error: {e}"]
    if oracle_sql is None:
        return []  # rows-only queries have no oracle to diff against
    try:
        res = con.execute(oracle_sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        return [f"duckdb error: {e}"]
    status = []
    if len(srows) != len(drows):
        status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        status.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if not status:
        try:
            sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
        except DriverIncompatibleShape as e:
            return [str(e)]
        if sk != dk:
            n_diff = sum(1 for a, b in zip(sk, dk) if a != b)
            first = next((f"spark={a} duck={b}" for a, b in zip(sk, dk) if a != b), "")
            status.append(f"values differ ({n_diff}/{len(sk)} rows); first: {first}")
    return status


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = make_duckdb(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = len(fn(spark, sf_dir).collect())
                print(f"SKIP {name}: no oracle (rows={n}) [{time.time()-t0:.1f}s]")
            except Exception as e:
                failures.append(name)
                print(f"FAIL {name}: spark error: {e}")
            continue
        status = compare_query(spark, con, fn, oracles[name], sf_dir)
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK   {name} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
