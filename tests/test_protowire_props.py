"""Property-based tests (hypothesis) for the protobuf wire decoder:
random well-formed transactions encode → decode to the expected JSON
object, and arbitrary byte garbage either decodes or raises DecodeError
(never hangs, never returns junk silently). The reference declares a
property-testing library but never uses it (SURVEY.md §5); the decoder
here is the one component where malformed input is a ROUTINE code path
(the error topic), so it gets the property treatment."""

import base64

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_processor_cosmos_tx_dispatch_spark.functions import protowire

MSG_SEND_URL = "type.googleapis.com/cosmos.bank.v1beta1.MsgSend"


# --- wire encoder (tests only) ---------------------------------------------
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


ADDR = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=24
)
AMOUNT = st.integers(min_value=0, max_value=10**12)


@st.composite
def tx_strategy(draw):
    msgs = draw(
        st.lists(
            st.tuples(ADDR, ADDR, st.lists(AMOUNT, max_size=3)), max_size=3
        )
    )
    sigs = draw(st.lists(st.binary(max_size=16), max_size=2))
    body = b""
    expected_msgs = []
    for frm, to, amounts in msgs:
        coins = b"".join(
            _ld(1, b"uknow") + _ld(2, str(a).encode()) for a in amounts
        )
        m = _ld(1, frm.encode()) + _ld(2, to.encode())
        m += b"".join(
            _ld(3, _ld(1, b"uknow") + _ld(2, str(a).encode())) for a in amounts
        )
        del coins
        body += _ld(1, _ld(1, MSG_SEND_URL.encode()) + _ld(2, m))
        exp = {"@type": MSG_SEND_URL}
        if frm:
            exp["fromAddress"] = frm
        if to:
            exp["toAddress"] = to
        if amounts:
            exp["amount"] = [
                {"denom": "uknow", "amount": str(a)} for a in amounts
            ]
        expected_msgs.append(exp)
    raw = _ld(1, body) + _ld(2, b"")
    for s in sigs:
        raw += _ld(3, s)
    expected = {"body": {}, "authInfo": {}}
    if expected_msgs:
        expected["body"]["messages"] = expected_msgs
    if sigs:
        expected["signatures"] = [base64.b64encode(s).decode() for s in sigs]
    return raw, expected


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(tx_strategy())
def test_roundtrip_encode_decode(case):
    raw, expected = case
    assert protowire.decode_tx(raw) == expected


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_garbage_never_hangs_or_lies(data):
    """Arbitrary bytes: either a clean DecodeError (→ error topic) or a
    dict — the decoder must terminate and never raise anything else."""
    try:
        out = protowire.decode_tx(data)
    except protowire.DecodeError:
        return
    assert isinstance(out, dict)
