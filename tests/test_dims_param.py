"""Pins for the r15 `dims=` threading: registered queries pass the
embeddings table's dimensionality (the constant their own oracle SQL
hard-codes — queries/_core.py:_EMB_DIMS) to the similarity operators,
skipping the operators' fallback one-row schema probe (a ~0.26 s
driver job per invocation). The contract: passing the true dims must
be indistinguishable from probing it, on every operator that accepts
the parameter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [
        (
            vid,
            [
                float((((1103515245 * (vid * 16 + d) + 54321) % (1 << 31)) % 37) - 18)
                / 8.0
                for d in range(16)
            ],
        )
        for vid in range(30)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDimsParam:
    def test_probe_matches_schema(self, emb_df):
        assert S._dims(emb_df, "embedding") == 16

    def test_kmeans_assign_dims_equals_probed(self, emb_df):
        probed = S.kmeans_assign(emb_df, k=4, rounds=1)
        passed = S.kmeans_assign(emb_df, k=4, rounds=1, dims=16)
        assert _rows(probed) == _rows(passed)

    def test_ivf_topk_dims_equals_probed(self, emb_df):
        q = emb_df.filter(F.col("vec_id") < 3)
        probed = S.ivf_topk(q, emb_df, n_centroids=4, k=3)
        passed = S.ivf_topk(q, emb_df, n_centroids=4, k=3, dims=16)
        assert _rows(probed) == _rows(passed)

    def test_pq_topk_dims_equals_probed(self, emb_df):
        q = emb_df.filter(F.col("vec_id") < 3)
        probed = S.pq_topk(q, emb_df, m=4, k=4, k_out=3)
        passed = S.pq_topk(q, emb_df, m=4, k=4, k_out=3, dims=16)
        assert _rows(probed) == _rows(passed)

    def test_ivfpq_topk_dims_equals_probed(self, emb_df):
        q = emb_df.filter(F.col("vec_id") < 3)
        probed = S.ivfpq_topk(q, emb_df, n_centroids=4, n_probe=2, m=4, k=4, k_out=3)
        passed = S.ivfpq_topk(
            q, emb_df, n_centroids=4, n_probe=2, m=4, k=4, k_out=3, dims=16
        )
        assert _rows(probed) == _rows(passed)

    def test_wrong_dims_is_not_silently_equal(self, emb_df):
        # sanity that the parameter is actually load-bearing: a wrong
        # dims builds a wrong-width centroid bank and must CHANGE the
        # assignment (else the threading could rot into a no-op)
        probed = S.kmeans_assign(emb_df, k=4, rounds=0)
        wrong = S.kmeans_assign(emb_df, k=4, rounds=0, dims=8)
        assert _rows(probed) != _rows(wrong)
