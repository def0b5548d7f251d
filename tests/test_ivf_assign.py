"""Pins for the in-row IVF cell-assignment helpers after the r15
literal-bank rewrite (operators/similarity.py:_cents_lit).

The rewrite replaced per-centroid `F.array(*[F.lit(x) ...])` trees
(k×dims Literal nodes built through k×dims py4j calls — ~3.5 s of
driver-side construction+analysis per IVF query invocation) with ONE
array<array<bigint>> literal iterated by transform's index lambda.
Results must be bit-identical: nearest cell by max integer dot with
lowest-id tiebreak, and the top-p ordering (dot desc, id asc). These
tests pin that contract against an independent pure-Python evaluation
on deterministic vectors, including a constructed exact-tie case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators import similarity as S


def _py_dot(a, b):
    return sum(x * y for x, y in zip(a, b))


@pytest.fixture(scope="module")
def cents():
    return S.ivf_centroids(8, 64)


@pytest.fixture(scope="module")
def vec_df(spark):
    # deterministic integer-ish vectors via the same LCG family the
    # centroids use, plus one vector crafted to tie between two cells
    rows = []
    for vid in range(20):
        rows.append(
            (
                vid,
                [
                    float((((1103515245 * (vid * 64 + d) + 12345) % (1 << 31)) % 41) - 20)
                    / 16.0
                    for d in range(64)
                ],
            )
        )
    # the all-zero vector dots 0 against EVERY centroid — an 8-way tie,
    # so the lowest centroid id must win in p=1 and order p>1 by id
    rows.append((99, [0.0] * 64))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _quantized_rows(df):
    from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

    return {
        r["vec_id"]: r["qv"]
        for r in df.select(
            "vec_id", V.quantized(F.col("embedding")).alias("qv")
        ).collect()
    }


class TestIvfAssign:
    def test_assign_matches_python_argmax(self, vec_df, cents):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

        got = {
            r["vec_id"]: r["cell"]
            for r in vec_df.select(
                "vec_id",
                S._ivf_assign(V.quantized(F.col("embedding")), cents).alias("cell"),
            ).collect()
        }
        qvs = _quantized_rows(vec_df)
        for vid, qv in qvs.items():
            # max dot, tiebreak lowest id — via min on (-dot, id)
            want = min((( -_py_dot(qv, cv), c) for c, cv in enumerate(cents)))[1]
            assert got[vid] == want, f"vec {vid}: {got[vid]} != {want}"

    def test_assign_tie_breaks_to_lowest_id(self, vec_df, cents):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

        row = (
            vec_df.filter(F.col("vec_id") == 99)
            .select(
                S._ivf_assign(V.quantized(F.col("embedding")), cents).alias("cell")
            )
            .collect()[0]
        )
        assert row["cell"] == 0

    def test_topp_order_and_prefix_consistency(self, vec_df, cents):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

        got = {
            r["vec_id"]: [e["c"] for e in r["probes"]]
            for r in vec_df.select(
                "vec_id",
                S._ivf_assign_topp(
                    V.quantized(F.col("embedding")), cents, 3
                ).alias("probes"),
            ).collect()
        }
        qvs = _quantized_rows(vec_df)
        for vid, qv in qvs.items():
            want = [
                c
                for _, c in sorted(
                    ((-_py_dot(qv, cv), c) for c, cv in enumerate(cents))
                )
            ][:3]
            assert got[vid] == want, f"vec {vid}: {got[vid]} != {want}"
        # p=1 head equals the single-assign cell (the prep/probe contract)
        assert got[99][0] == 0

    def test_kmeans_best_matches_python_argmin(self, vec_df):
        from kafka_processor_cosmos_tx_dispatch_spark.functions import vectors as V

        cents = S.ivf_centroids(8, 64)
        got = {
            r["vec_id"]: (r["best"]["dist_sq"], r["best"]["c"])
            for r in vec_df.select(
                "vec_id",
                S._kmeans_best(V.quantized(F.col("embedding")), cents).alias("best"),
            ).collect()
        }
        qvs = _quantized_rows(vec_df)
        for vid, qv in qvs.items():
            vsq = _py_dot(qv, qv)
            want = min(
                (
                    (vsq - 2 * _py_dot(qv, cv) + _py_dot(cv, cv), c)
                    for c, cv in enumerate(cents)
                )
            )
            assert got[vid] == want, f"vec {vid}: {got[vid]} != {want}"
