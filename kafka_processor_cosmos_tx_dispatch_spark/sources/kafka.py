"""Kafka source/sink builders — the production wiring of the dispatch
engine, mirroring the reference's topology endpoints:

    topic.in    (TopologyProducer.kt:61-62, consumer at :85)
    topic.dlq   (:64-65, producer at :196-199)
    topic.error (:67-68 optional, producer at :126-129)

No broker exists in the test container, so these builders are exercised
only for plan construction; the semantics they feed (decode → evaluate →
multicast → route) are fully tested through the file-stream path in
streaming/dispatch.py, which shares every operator.

Scale: one Kafka sink with a `topic` column replaces the reference's
N+2 hand-built producers — Spark routes rows to their destination topic
natively, and `maxOffsetsPerTrigger` gives the backpressure the reference
got from Kafka Streams' poll loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_in: str,
    starting_offsets: str = "earliest",  # ≅ auto.offset.reset=earliest
    max_offsets_per_trigger: int | None = None,
):
    """readStream on the input topic: key binary, value binary — the
    KStream<String, ByteArray> analog (key stays bytes until needed)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic_in)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def kafka_topic_sink(
    routed: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
):
    """writeStream for a routed frame carrying (key, value, topic): Spark's
    Kafka sink reads the destination from the `topic` column — the whole
    split()/branch() fan-out of the reference collapses here."""
    for col in ("value", "topic"):
        if col not in routed.columns:
            raise ValueError(f"routed frame needs a '{col}' column")
    return (
        routed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
