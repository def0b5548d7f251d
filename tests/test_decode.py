"""Binary protobuf decode → dispatch, end-to-end against the reference's
golden corpus (TopologyTest.kt:25-69, 88-94): tx1 routes to topic-1, tx2
multicasts to topic-1+topic-2, tx3 lands in the DLQ with the JSON
envelope, and the literal bytes "test" fail decode into the error topic
with the ORIGINAL bytes preserved."""

import base64
import json

from kafka_processor_cosmos_tx_dispatch_spark.functions import protowire
from kafka_processor_cosmos_tx_dispatch_spark.operators import dispatch as dsp
from kafka_processor_cosmos_tx_dispatch_spark.operators.decode import decode_tx_records
from kafka_processor_cosmos_tx_dispatch_spark.rules import DispatchRule

MSG_SEND_URL = "type.googleapis.com/cosmos.bank.v1beta1.MsgSend"
OKP4_ADDR = "okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27"


# --- tiny wire-format ENCODER (tests only; the engine only decodes) --------
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


def _msg_send(frm: str, to: str) -> bytes:
    coin = _ld(1, b"uknow") + _ld(2, b"100")
    return _ld(1, frm.encode()) + _ld(2, to.encode()) + _ld(3, coin)


def _any(url: str, value: bytes) -> bytes:
    return _ld(1, url.encode()) + _ld(2, value)


def _tx_raw(body: bytes, auth: bytes = b"") -> bytes:
    return _ld(1, body) + _ld(2, auth)


TX1 = _tx_raw(_ld(1, _any(MSG_SEND_URL, _msg_send("testFrom", "tesTo"))))
TX2 = _tx_raw(_ld(1, _any(MSG_SEND_URL, _msg_send(OKP4_ADDR, "tesTo"))))
TX3 = _tx_raw(b"", b"")  # empty body / authInfo
TX_ERR = b"test"  # fails decode (TopologyTest.kt:69)

RULES = [
    DispatchRule(
        "message-type-MsgSend",
        "topic-1",
        f"$.body.messages[?(@.@type == '{MSG_SEND_URL}')]",
    ),
    DispatchRule(
        "from-okp4-address", "topic-2", f"$..messages[?(@.fromAddress == '{OKP4_ADDR}')]"
    ),
    DispatchRule("never", "topic-3", "$.nop"),
]


def test_decoder_unit():
    tx = protowire.decode_tx(TX2)
    assert tx["body"]["messages"][0]["@type"] == MSG_SEND_URL
    assert tx["body"]["messages"][0]["fromAddress"] == OKP4_ADDR
    assert tx["body"]["messages"][0]["amount"] == [{"denom": "uknow", "amount": "100"}]
    assert protowire.decode_tx(TX3) == {"body": {}, "authInfo": {}}
    try:
        protowire.decode_tx(TX_ERR)
        raise AssertionError("expected DecodeError")
    except protowire.DecodeError:
        pass


def test_golden_routing_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, TX1), (2, TX2), (3, TX3), (4, TX_ERR)], "tx_id int, value binary"
    )
    decoded = decode_tx_records(df)
    routed = dsp.dispatch(
        decoded,
        RULES,
        json_col="tx_json",
        error_col="error",
        error_topic="error",
    )
    got = sorted((r["tx_id"], r["topic"]) for r in routed.collect())
    assert got == [
        (1, "topic-1"),
        (2, "topic-1"),
        (2, "topic-2"),  # multicast
        (3, "dlq"),
        (4, "error"),
    ]

    valued = dsp.value_for_topic(
        routed, RULES, payload_col="value", raw_col="value", json_col="tx_json"
    )
    rows = {(r["tx_id"], r["topic"]): bytes(r["value"]) for r in valued.collect()}
    # error topic carries the ORIGINAL bytes (TopologyProducer.kt:122)
    assert rows[(4, "error")] == TX_ERR
    # rule topics carry the payload bytes
    assert rows[(1, "topic-1")] == TX1
    # DLQ carries the Jackson-shaped envelope with txJson + base64 bytes
    dlq = json.loads(rows[(3, "dlq")].decode())
    assert set(dlq.keys()) == {"txJson", "txBytes", "message"}
    assert json.loads(dlq["txJson"]) == {"body": {}, "authInfo": {}}
    assert base64.b64decode(dlq["txBytes"]) == TX3
    assert dlq["message"] is None


def test_error_records_dropped_without_error_topic(spark):
    df = spark.createDataFrame([(4, TX_ERR)], "tx_id int, value binary")
    routed = dsp.dispatch(
        decode_tx_records(df), RULES, json_col="tx_json", error_col="error"
    )
    assert routed.count() == 0


def test_streaming_decode_dispatch(spark, tmp_path):
    """The production shape end-to-end as a STREAM: binary records from a
    file stream → decode → dispatch → sink (decode + dispatch are both
    stateless, so the streaming plan is the batch plan)."""
    src = str(tmp_path / "txs")
    spark.createDataFrame(
        [(1, TX1), (2, TX2), (3, TX3), (4, TX_ERR)], "tx_id int, value binary"
    ).write.parquet(src)

    stream = spark.readStream.schema("tx_id int, value binary").parquet(src)
    routed = dsp.dispatch(
        decode_tx_records(stream),
        RULES,
        json_col="tx_json",
        error_col="error",
        error_topic="error",
    ).select("tx_id", "topic")
    q = (
        routed.writeStream.format("memory")
        .queryName("decode_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["tx_id"], r["topic"]) for r in spark.table("decode_stream").collect())
    assert got == [
        (1, "topic-1"),
        (2, "topic-1"),
        (2, "topic-2"),
        (3, "dlq"),
        (4, "error"),
    ]
