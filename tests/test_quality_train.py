"""Unit tests for the in-engine trained quality classifier
(operators/quality.py): sign-of-learning on a hand corpus, the exact
corpus-duplication invariance the h-preconditioner guarantees, and the
bias-only path on feature-less documents. Oracle parity of the two
registered queries is covered by the oracle sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.operators.quality import (
    quality_features,
    quality_scored,
    quality_train,
    quality_train_model,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learns_discriminative_token(spark):
    """Positives share a marker token; after 3 preconditioned steps the
    positive class scores strictly higher than the negative class."""
    pos_text = "good clean prose " * 20
    neg_text = "spam junk noise " * 20
    rows = [(i, pos_text) for i in range(10)] + [
        (10 + i, neg_text) for i in range(10)
    ]
    docs = _docs(spark, rows)
    label = F.col("doc_id") < 10  # aligned with the marker tokens
    feats = quality_features(docs, label, buckets=64)
    model = quality_train_model(feats, buckets=64, lr_dens=(1, 2, 4))
    scored = {
        r["doc_id"]: r["p_milli"]
        for r in quality_scored(feats, model).collect()
    }
    pos = [scored[i] for i in range(10)]
    neg = [scored[10 + i] for i in range(10)]
    assert min(pos) > max(neg)
    assert max(pos) > 500  # positives pushed up, not just negatives down


def test_duplication_invariance(spark):
    """Exactly duplicating every document leaves the learned weights
    bit-identical: g and h both double, and trunc((2g·k)/(2h·d)) ==
    trunc((g·k)/(h·d)) — the property that makes the step size
    corpus-size-invariant with no N division."""
    rows = [
        (i, f"alpha beta w{i % 7} gamma w{i % 3} delta " * (3 + i % 5))
        for i in range(12)
    ]
    docs1 = _docs(spark, rows)
    docs2 = _docs(
        spark, rows + [(100 + i, t) for i, t in rows]
    )
    label = F.length("text") > 150
    w1 = {
        r["bucket"]: r["w"]
        for r in quality_train(docs1, label, buckets=32).collect()
    }
    w2 = {
        r["bucket"]: r["w"]
        for r in quality_train(docs2, label, buckets=32).collect()
    }
    assert w1 == w2
    assert len(w1) == 33  # 32 buckets + bias


def test_bias_only_on_empty_docs(spark):
    """Whitespace-only docs carry only the bias feature; with a 25%
    base rate the trained bias drives every p below the 500 start."""
    rows = [(i, "   ") for i in range(8)]
    docs = _docs(spark, rows)
    label = F.col("doc_id") < 2
    feats = quality_features(docs, label, buckets=16)
    assert feats.select(F.size("fb").alias("n")).agg(
        F.max("n")
    ).collect()[0][0] == 1
    model = quality_train_model(feats, buckets=16, lr_dens=(1, 2, 4))
    ps = [
        r["p_milli"]
        for r in quality_scored(feats, model).collect()
    ]
    assert len(set(ps)) == 1  # identical docs, identical score
    assert ps[0] < 500


def test_train_output_shape(spark, sf_dir):
    """Registered query: buckets+1 rows, int/long schema, non-trivial
    learned weights (not all zero)."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

    df = Q.queries()["text_quality_train"](spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["bucket", "w"]
    rows = df.collect()
    assert len(rows) == 513
    assert any(r["w"] != 0 for r in rows)


def test_holdout_roc_staircase(spark, sf_dir):
    """Holdout eval: ROC endpoints reach (1000, 1000), counts are
    consistent, and no training doc leaks into the val rows (val size
    == the hash-bucket-8 count)."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

    df = Q.queries()["text_quality_train_holdout"](spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: -r["decile"])
    assert rows[-1]["cum_tpr_permille"] == 1000
    assert rows[-1]["cum_fpr_permille"] == 1000
    n_val = sum(r["n_docs"] for r in rows)
    docs = Q.load_table(spark, sf_dir, "documents")
    expected = docs.filter(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 10
        == 8
    ).count()
    assert n_val == expected


def test_pq_train_improves_quantization(spark, sf_dir):
    """The trained codebooks must beat the data-free LCG codebook on
    every subspace (sim_pq_train_gain's whole point)."""
    from kafka_processor_cosmos_tx_dispatch_spark import queries as Q

    rows = Q.queries()["sim_pq_train_gain"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["inertia_trained"] < r["inertia_init"], r
        assert r["gain_permille"] > 0
