"""Oracle output-type gate (r6 verdict #1c).

The round driver's value hash is type-sensitive: DuckDB silently widens
integer aggregates (``SUM(BIGINT)`` -> HUGEINT/INT128, decimal sums ->
DECIMAL(38,x)) so an oracle whose outer aggregate is not explicitly cast
produces values that are EQUAL to Spark's but hash differently — r6's
only two driver-red rows (`q_udaf_grouped_cents`, `sim_topk_pq`) were
exactly this. This test plans (DESCRIBE — no execution) every registered
oracle against the sf0.001 tables and asserts every output column's
DuckDB type is in the allowlist of types whose Python surfacing matches
Spark's. Any new oracle that leaks a HUGEINT/DECIMAL output fails CI
immediately instead of going driver-red the round it is sampled.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Types whose duckdb-python surfacing is value-identical to PySpark's
# collect() for equal data. Notably ABSENT: HUGEINT, UHUGEINT,
# DECIMAL(*,*) — the driver-red classes.
SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "BLOB",
    "BOOLEAN",
}


def _base_type(t: str) -> str:
    """VARCHAR[] -> VARCHAR, BIGINT[] -> BIGINT; scalars unchanged.

    NOTE (r8): used only to *detect* nesting now — a ``[]`` suffix (or
    any STRUCT/MAP/LIST/UNION type) is REJECTED by the gate, not
    normalized away. r7's two driver-red rows (`q_scalar_array`,
    `q_scalar_hof`) were top-level array outputs that this very gate
    waved through by stripping the suffix; the driver's pandas
    canonicalizer (`sort_values` over all columns) throws
    ``TypeError: unhashable type: 'list'`` on them, so list-shaped
    output is driver-incompatible regardless of element type."""
    return re.sub(r"(\[\])+$", "", t.strip())


def _is_nonscalar(t: str) -> bool:
    """True for any DuckDB output type the driver cannot hash: array
    (``[]`` suffix or LIST(...)), STRUCT, MAP, UNION."""
    t = t.strip()
    if _base_type(t) != t:
        return True
    return bool(re.match(r"(STRUCT|MAP|LIST|UNION)\b", t, re.IGNORECASE))


@pytest.fixture(scope="module")
def oracle_descriptions():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    import __spark_entry__ as entry

    out = {}
    for name, sql in entry.oracle_sql().items():
        out[name] = con.execute(f"DESCRIBE {sql}").fetchall()
    con.close()
    return out


def test_every_oracle_registered_output_type_is_hash_safe(
    oracle_descriptions,
):
    offenders = []
    for name, desc in oracle_descriptions.items():
        for col, typ, *_ in desc:
            if _is_nonscalar(typ):
                offenders.append(f"{name}.{col}: {typ} (non-scalar)")
            elif typ.strip() not in SAFE:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracles declaring DuckDB-widened / driver-hash-unsafe output "
        "types (wrap the outer aggregate in CAST(... AS BIGINT); "
        "serialize arrays with array_to_string — the driver cannot "
        f"hash list cells): {offenders}"
    )


# DuckDB physical type -> the Spark type(s) whose driver-side value
# surfacing matches it. Anything outside this map (or a mismatch) is a
# latent hash failure of the r6 class.
_DUCK_TO_SPARK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP_NS": {"timestamp", "timestamp_ntz"},
    "BLOB": {"binary"},
    "BOOLEAN": {"boolean"},
}


def test_spark_schema_matches_oracle_types(oracle_descriptions):
    """End-to-end type-pairing gate: for every oracle-paired query, the
    Spark plan's output schema must pair with the DuckDB oracle's
    DESCRIBE types column-for-column (by name). The r6 driver reds were
    value-EQUAL results hashed differently because of type drift; the
    allowlist test above catches DuckDB-side widening, this one catches
    a Spark-side int vs the oracle's BIGINT (or any other pairing
    slip) before a driver round does. Runs at sf0.001 so the ~18 eager
    queries (warehouse writes, iterative collects) stay cheap."""
    import __spark_entry__ as entry
    from kafka_processor_cosmos_tx_dispatch_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    mismatches = []
    for name, desc in oracle_descriptions.items():
        try:
            df = qs[name](spark, SF_DIR)
        except Exception as e:  # pragma: no cover - surfaced as failure
            mismatches.append(f"{name}: query build failed: {e}")
            continue
        spark_types = {f.name: f.dataType.simpleString() for f in df.schema}
        for sname, st in spark_types.items():
            # Mirror of the DuckDB-side non-scalar rejection: a Spark
            # top-level array/map/struct output crashes the driver's
            # canonicalizer even when the oracle side looks scalar.
            if st.startswith(("array<", "map<", "struct<")):
                mismatches.append(
                    f"{name}.{sname}: spark top-level {st} is "
                    "driver-unhashable — serialize (array_join/to_json)"
                )
        for col, typ, *_ in desc:
            st = spark_types.get(col)
            if st is None:
                mismatches.append(f"{name}.{col}: missing in Spark schema")
                continue
            ok = st in _DUCK_TO_SPARK.get(typ.strip(), set())
            if not ok:
                mismatches.append(
                    f"{name}.{col}: oracle {typ} vs spark "
                    f"{spark_types[col]}"
                )
    assert not mismatches, mismatches


def test_gate_red_bars_array_output_fixture():
    """The r7 hole, pinned: a deliberately array/struct-outputting
    oracle MUST be flagged by the non-scalar rejection (r7's gate
    stripped the [] suffix and passed exactly the class that went
    driver-red)."""
    con = duckdb.connect()
    desc = con.execute(
        "DESCRIBE SELECT [1, 2] AS arr, {'x': 1} AS st, "
        "MAP([1],[2]) AS mp, 'ok' AS s, CAST(1 AS BIGINT) AS b"
    ).fetchall()
    con.close()
    flags = {col: _is_nonscalar(typ) for col, typ, *_ in desc}
    assert flags["arr"] and flags["st"] and flags["mp"]
    assert not flags["s"] and not flags["b"]


def test_oracle_and_query_surfaces_align():
    """Every oracle name must have a queries() entry (dangling oracles
    are dead weight; queries without oracles are allowed — they get the
    weaker rows-only driver check by design)."""
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
