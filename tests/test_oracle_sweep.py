"""Full-surface oracle gate: EVERY oracle-paired entry in
__spark_entry__.queries() is diffed against its DuckDB oracle at sf0.001
on every test run.

Why this exists (round-2 verdict, top advice item): the round driver's
correctness budget samples only ~50 of the declared queries, so a
regression in an unsampled query could otherwise ship silently. This
sweep is the machine check that the whole declared surface stays green —
one parametrized test per query, so a failure names the exact query.

sf0.001 keeps the sweep minutes-scale; the driver re-proves sf0.01.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle import compare_query, make_duckdb

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = make_duckdb(sf_dir)
    yield con
    con.close()


# Queries whose oracle legitimately returns 0 rows at the tiny sweep sf
# but is nonempty at the driver's sf0.01 (verified in DuckDB): TPC-H Q7's
# nation-pair × 2-year date filter simply has no qualifying lineitem at
# 1/1000 scale. Anything else returning 0 rows is a VACUOUS oracle pair
# (empty-vs-empty hash match proves nothing — r8 verdict finding #1:
# q_heavy_hitters_mg was green at every sf with a 0-row answer) and must
# be reworked, not whitelisted.
_EMPTY_OK_AT_SWEEP_SF = {"q7_volume_shipping"}


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_answer_is_nonempty(name, duck):
    """No registered query may be vacuously green: its oracle answer at
    the sweep sf must have ≥1 row so the value-hash comparison actually
    compares values. Pure-DuckDB (no Spark run), so the whole-registry
    sweep stays cheap."""
    if name in _EMPTY_OK_AT_SWEEP_SF:
        pytest.skip("documented empty-at-sweep-sf; nonempty at sf0.01")
    n = duck.execute(
        f"SELECT COUNT(*) FROM ({_ORACLES[name]})"
    ).fetchone()[0]
    assert n >= 1, (
        f"{name}: oracle returns 0 rows at the sweep sf — the driver's "
        "hash check would match empty-vs-empty and prove nothing"
    )


def test_every_query_declares_an_oracle_or_is_known_rows_only():
    # Queries without oracle SQL get only the driver's weaker rows-only
    # check; keep that set explicit so additions are a conscious choice.
    known_rows_only: set[str] = set()
    assert set(_QUERIES) - set(_ORACLES) == known_rows_only


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(name, spark, duck, sf_dir):
    problems = compare_query(
        spark, duck, _QUERIES[name], _ORACLES.get(name), sf_dir
    )
    assert not problems, f"{name}: {'; '.join(problems)}"


def test_comparator_catches_breakage(spark, duck, sf_dir):
    # The gate is only as good as its comparator: prove a broken query
    # (wrong rows / wrong values / engine error) actually reports.
    ok_fn = _QUERIES["q1_pricing_summary"]
    ok_sql = _ORACLES["q1_pricing_summary"]
    assert compare_query(spark, duck, ok_fn, "SELECT 1 AS one", sf_dir)
    assert compare_query(
        spark, duck, lambda s, d: ok_fn(s, d).limit(1), ok_sql, sf_dir
    )
    boom = lambda s, d: (_ for _ in ()).throw(RuntimeError("boom"))  # noqa: E731
    assert compare_query(spark, duck, boom, ok_sql, sf_dir)
