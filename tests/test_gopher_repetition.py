"""Hand-corpus tests for text_gopher_repetition: exact fixed-point
values for the modal-n-gram rules, the duplicated-5-gram positional
coverage (which the synthetic corpus never triggers), and the
lexicographic tie-break both engines must share. The corpus-level
oracle parity is covered by the sweep; here the expected numbers are
computed by hand."""

from __future__ import annotations

import os

import duckdb
import pytest

from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

DOCS = [
    # (doc_id, text) — single-char tokens make char math trivial
    (1, "a b a b a b a b"),  # modal 2-gram "a b" ×4 → top2 = 4*2*1000//8
    (2, "v w x y z v w x y z m n"),  # dup 5-gram covers positions 1-10
    (3, "x y x y z w z w"),  # top2 tie: "x y"=2, "z w"=2 → min wins
    (4, "q"),  # 1 token: every gram list empty, all rules pass
    # exactly 5 tokens: ONE 5-gram — passes the size(g5)>0 gate with a
    # size-1 sorted gram list, the sequence(1, 0) ANSI crash of
    # ADVICE r13 (a single 5-gram can never be duplicated → dup5 = 0)
    (5, "p q r s t"),
]


@pytest.fixture(scope="module")
def hand_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gopher_rep"))
    spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _rows(spark, hand_dir):
    df = Q.queries()["text_gopher_repetition"](spark, hand_dir)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_hand_values(spark, hand_dir):
    r = _rows(spark, hand_dir)
    # doc 1: 8 chars; "a b" occurs 4x, charlen 2 → 4*2*1000//8 = 1000
    assert r[1]["top2_fp"] == 1000
    assert r[1]["rep_pass"] is False
    # doc 2: 12 chars; grams 1..8, gram1==gram6 duplicated → positions
    # 1-10 covered, 10 chars → 10*1000//12 = 833
    assert r[2]["dup5_fp"] == 833
    assert not r[2]["rep_pass"]
    # doc 3: tie "x y"/"z w" at 2 → lexicographic min "x y", charlen 2,
    # 8 chars → 2*2*1000//8 = 500
    assert r[3]["top2_fp"] == 500
    # doc 4: no grams at any n → all zero, passes
    assert r[4] == {
        "doc_id": 4,
        "top2_fp": 0,
        "top3_fp": 0,
        "top4_fp": 0,
        "dup5_fp": 0,
        "rules_mask": 15,
        "rep_pass": True,
    }
    # doc 5 (ADVICE r13): one 5-gram — must not crash, and dup5 is 0
    # (a single 5-gram has no duplicate). Modal grams: every n-gram
    # occurs once over 5 single-char tokens → n*1000//5.
    assert r[5]["dup5_fp"] == 0
    assert r[5]["top2_fp"] == 400
    assert r[5]["top3_fp"] == 600
    assert r[5]["top4_fp"] == 800


def test_hand_oracle_parity(spark, hand_dir):
    """The DuckDB oracle agrees with Spark on the hand corpus — the
    dup5 and tie-break paths the synthetic corpus never exercises."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(hand_dir, 'documents.parquet')}/*.parquet'"
    )
    got = {
        row[0]: row
        for row in con.execute(
            Q.oracle_sql()["text_gopher_repetition"]
        ).fetchall()
    }
    sp = _rows(spark, hand_dir)
    assert set(got) == set(sp)
    for did, row in got.items():
        s = sp[did]
        assert row == (
            did,
            s["top2_fp"],
            s["top3_fp"],
            s["top4_fp"],
            s["dup5_fp"],
            s["rules_mask"],
            s["rep_pass"],
        ), did
