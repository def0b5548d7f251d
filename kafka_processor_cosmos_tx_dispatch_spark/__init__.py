"""PySpark-native analytics + dispatch engine.

A from-scratch re-expression of the capabilities of the reference
``okp4/kafka-processor-cosmos-tx-dispatch`` (a Kafka Streams router that
dispatches Cosmos-SDK transactions to topics by JsonPath rules — see
/root/reference/src/main/kotlin/com/okp4/processor/cosmos/TopologyProducer.kt)
as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; we don't hand-schedule)
- Structured Streaming for the unbounded dispatch path
- a relational operator surface (joins/aggs/windows/set-ops/functions)
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing) designed for 100 TB scale.

Package layout:
    session      — SparkSession factory tuned for the target scale
    rules        — YAML dispatch-rule loader (≅ TxsDispatch.kt)
    functions/   — column-level function libraries (jsonpath, text, vectors)
    operators/   — composite operators (dispatch, dedup, similarity, multimodal)
    sources/     — table/stream source builders (parquet tables, kafka)
    streaming/   — structured-streaming dispatch + windowed/stateful ops
    plans/       — plan-inspection helpers (pushdown/broadcast assertions)
    queries.py   — the registry of named queries + DuckDB oracles
"""

__version__ = "0.1.0"
