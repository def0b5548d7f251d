"""`cosmos_tx_gen` — a Python DataSource (Spark 4 API) generating the
reference's input record shape: (key string, value binary) where the
value is a protobuf `TxRaw` on the wire, exactly what the reference's
Kafka consumer sees (TopologyProducer.kt:85, Consumed.with(String,
ByteArray); fixtures TopologyTest.kt:25-69).

Deterministic by construction: record i is a pure function of i, so any
(n, partitions) request reproduces bit-identical data on every run and
every executor — usable as a correctness corpus and as an
arbitrarily-large load generator for the decode→dispatch path without
storing a single byte.

The record mix cycles: MsgSend from a rotating address (routes by type
rule), MsgSend from the okp4 fixture address (multicasts), an empty tx
(DLQ), and — every `error_every`-th record — undecodable bytes (error
topic), mirroring the reference's four golden fixtures.

Batch: `spark.read.format("cosmos_tx_gen").option("n", N)`.
Stream: `spark.readStream.format("cosmos_tx_gen")` — micro-batches of
`rows_per_batch`, bounded by `n` (so availableNow-style runs terminate).

Scale notes: partitions are index ranges — parallelism is
`--option partitions`, each partition generates only its slice (no
driver materialization, no shuffle); the stream reader's offset is a
single integer, so checkpoint state is O(1).
"""

from __future__ import annotations

import functools as _functools
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

MSG_SEND_URL = "type.googleapis.com/cosmos.bank.v1beta1.MsgSend"
OKP4_ADDR = "okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27"


# --- minimal protobuf wire encoding (varint + length-delimited only) -------
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | 0x80]) if n else bytes([b])
        if not n:
            return out


def _ld(field_no: int, data: bytes) -> bytes:
    return _varint(field_no << 3 | 2) + _varint(len(data)) + data


def _msg_send(frm: str, to: str, amount: int) -> bytes:
    coin = _ld(1, b"uknow") + _ld(2, str(amount).encode())
    return _ld(1, frm.encode()) + _ld(2, to.encode()) + _ld(3, coin)


def _tx_raw_bytes(body_msgs: Sequence[bytes]) -> bytes:
    body = b"".join(
        _ld(1, _ld(1, MSG_SEND_URL.encode()) + _ld(2, m)) for m in body_msgs
    )
    return _ld(1, body) + _ld(2, b"")


_VALUE_CYCLE = 1400  # lcm(4, 8, 50, 7): every value field is periodic in i


@_functools.lru_cache(maxsize=_VALUE_CYCLE)
def _value_at(phase: int) -> bytes:
    """Non-error value for i ≡ phase (mod 1400). Every varying field
    (kind i%4, address i%8, amounts i%50 / i%7) divides the cycle, so
    records repeat with period 1400 — memoizing turns the generator's
    per-record byte assembly (~30k rows/s of tiny concats, measured the
    source bottleneck) into a dict hit without changing a single byte."""
    kind = phase % 4
    if kind == 0:  # routes by message-type rule
        return _tx_raw_bytes(
            [_msg_send(f"addr{phase % 8}", "dest", 100 + phase % 50)]
        )
    if kind == 1:  # multicasts: type rule + from-address rule
        return _tx_raw_bytes([_msg_send(OKP4_ADDR, "dest", 100 + phase % 50)])
    if kind == 2:  # two messages — still one record, array semantics
        return _tx_raw_bytes(
            [
                _msg_send(f"addr{phase % 8}", "dest", phase % 50),
                _msg_send(f"addr{(phase + 1) % 8}", "dest2", phase % 7),
            ]
        )
    return _ld(1, b"") + _ld(2, b"")  # empty tx → DLQ


def record_at(i: int, error_every: int) -> tuple[str, bytes]:
    """The i-th record, a pure function of i (deterministic fleet-wide)."""
    key = f"tx-{i}"
    if error_every > 0 and i % error_every == error_every - 1:
        return key, b"not-protobuf-%d" % i  # raw i — NOT periodic
    return key, _value_at(i % _VALUE_CYCLE)


class _Range(InputPartition):
    def __init__(self, start: int, end: int, error_every: int):
        self.start, self.end, self.error_every = start, end, error_every


def _ranges(start: int, end: int, parts: int, error_every: int) -> list[_Range]:
    n = max(0, end - start)
    parts = max(1, min(parts, n) if n else 1)
    step, rem = divmod(n, parts)
    out, pos = [], start
    for p in range(parts):
        width = step + (1 if p < rem else 0)
        out.append(_Range(pos, pos + width, error_every))
        pos += width
    return out


def _gen(part: _Range) -> Iterator:
    """Arrow RecordBatch chunks, not per-row tuples: Spark 4's Python
    data source accepts pyarrow.RecordBatch yields, which skip the
    per-row pickle→Row conversion — measured the dominant cost of the
    synthetic source at bench scale (the per-row path caps the whole
    32-core streaming pipeline near ~100k rows/s; batch yield moves the
    bottleneck back to the decode tier where it belongs)."""
    import pyarrow as pa

    chunk = 8192
    pos = part.start
    while pos < part.end:
        hi = min(part.end, pos + chunk)
        keys: list[str] = []
        vals: list[bytes] = []
        for i in range(pos, hi):
            k, v = record_at(i, part.error_every)
            keys.append(k)
            vals.append(v)
        yield pa.RecordBatch.from_arrays(
            [pa.array(keys, pa.string()), pa.array(vals, pa.binary())],
            names=["key", "value"],
        )
        pos = hi


class _TxGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))
        self.error_every = int(options.get("error_every", 10))

    def partitions(self) -> list[InputPartition]:
        return _ranges(0, self.n, self.parts, self.error_every)

    def read(self, partition: _Range) -> Iterator:
        return _gen(partition)


class _TxGenStreamReader(DataSourceStreamReader):
    """Offset = plain record index; each latestOffset() call advances one
    micro-batch of rows_per_batch, capped at n so bounded runs finish."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))
        self.error_every = int(options.get("error_every", 10))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self.n, self._latest + self.rows_per_batch)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return _ranges(start["index"], end["index"], self.parts, self.error_every)

    def read(self, partition: _Range) -> Iterator:
        return _gen(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class TxGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cosmos_tx_gen"

    def schema(self) -> str:
        return "key string, value binary"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _TxGenReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:  # noqa: ANN001
        return _TxGenStreamReader(dict(self.options))


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the cosmos_tx_gen format."""
    spark.dataSource.register(TxGenDataSource)


def expected_routing_json(i: int, error_every: int) -> str | None:
    """For tests: the canonical JSON the i-th record decodes to (None for
    the error records) — lets assertions derive oracle routing without
    re-running the engine's own decoder."""
    if error_every > 0 and i % error_every == error_every - 1:
        return None
    kind = i % 4

    def msg(frm: str, to: str, amount: int) -> dict:
        return {
            "@type": MSG_SEND_URL,
            "fromAddress": frm,
            "toAddress": to,
            "amount": [{"denom": "uknow", "amount": str(amount)}],
        }

    if kind == 0:
        msgs = [msg(f"addr{i % 8}", "dest", 100 + i % 50)]
    elif kind == 1:
        msgs = [msg(OKP4_ADDR, "dest", 100 + i % 50)]
    elif kind == 2:
        msgs = [
            msg(f"addr{i % 8}", "dest", i % 50),
            msg(f"addr{(i + 1) % 8}", "dest2", i % 7),
        ]
    else:
        return json.dumps({})
    return json.dumps({"body": {"messages": msgs}})
