"""Approximate aggregates (HLL distinct, approx percentile): values are
engine-specific so they are NOT oracle-hashed — instead pin that they
land within their documented error bounds of the exact answers."""

from pyspark.sql import functions as F

from kafka_processor_cosmos_tx_dispatch_spark.sources.tables import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.1 * row["exact"]


def test_approx_percentile_within_accuracy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_quantity, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    # l_quantity is 1..50 integers; accuracy 1000 keeps the approx median
    # within one quantity step of the exact interpolated median
    assert abs(float(row["approx"]) - float(row["exact"])) <= 1.0
