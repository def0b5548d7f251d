"""Descriptor-driven protobuf-JSON rendering for `Any` payloads.

The reference resolves `Any` types by scanning the classpath for every
compiled protobuf class and folding their descriptors into a JsonFormat
TypeRegistry (/root/reference/src/main/kotlin/com/okp4/processor/cosmos/
ProtoTypeRegistry.kt:16-31) — i.e. it can render ANY type it was compiled
with, with zero per-type code. This module is the same idea for an engine
with no compiled classes: the checked-in FileDescriptorSet
(resources/cosmos_tx.desc, also consumed by the JVM decode tier) carries
the full schema, and ONE table-driven walker renders any message type in
it by the protobuf-JSON conventions (camelCase/json_name keys, 64-bit
ints as strings, bytes as base64, enums by name with unknown numbers as
ints, proto3 scalar default-omission, `Any` nesting with `@type`).

A FileDescriptorSet is itself a protobuf message, so it is parsed with
the same pure-Python wire reader used for transactions
(functions/protowire.py) — no `protobuf` package dependency. Field and
type numbers below are from the public descriptor.proto.

Well-known types: `google.protobuf.Timestamp` and `Duration` fields
render as JsonFormat's string forms (RFC3339 "Z" / "Ns" with 0/3/6/9
fractional digits) — the feegrant allowance types carry both. The other
wrapper specials (Struct/Value/wrappers.proto) remain absent from the tx
schema; a hypothetical occurrence would render as a plain object, and
Timestamp/Duration wrapped DIRECTLY in an Any (never seen in Cosmos
traffic — they appear as fields) also take the object form.

Not implemented (absent from the tx schema): groups, proto2 extensions,
map fields; encountering one raises DecodeError, which the decode stage
converts to error-topic routing.
"""

from __future__ import annotations

import base64
import os
import struct
from datetime import datetime, timedelta
from dataclasses import dataclass
from typing import Any, Callable

from . import protowire as _pw
from .protowire import (
    DecodeError,
    encode_ld,
    encode_varint,
    parse_fields,
    parse_group,
)

__all__ = ["TypeRegistry", "default_registry"]

# FieldDescriptorProto.Type (descriptor.proto)
_T_DOUBLE = 1
_T_FLOAT = 2
_T_INT64 = 3
_T_UINT64 = 4
_T_INT32 = 5
_T_FIXED64 = 6
_T_FIXED32 = 7
_T_BOOL = 8
_T_STRING = 9
_T_GROUP = 10
_T_MESSAGE = 11
_T_BYTES = 12
_T_UINT32 = 13
_T_ENUM = 14
_T_SFIXED32 = 15
_T_SFIXED64 = 16
_T_SINT32 = 17
_T_SINT64 = 18

_LABEL_REPEATED = 3

# JsonFormat renders 64-bit integers as JSON strings (precision safety)
_AS_STRING_64 = {_T_INT64, _T_UINT64, _T_FIXED64, _T_SFIXED64, _T_SINT64}
_SIGNED_VARINT = {_T_INT64, _T_INT32}  # two's-complement varints
_ZIGZAG = {_T_SINT32, _T_SINT64}
# proto3 packed-by-default scalar types: a repeated field may arrive as
# one length-delimited blob of concatenated values
_PACKED_VARINT = {
    _T_INT64,
    _T_UINT64,
    _T_INT32,
    _T_UINT32,
    _T_BOOL,
    _T_ENUM,
    _T_SINT32,
    _T_SINT64,
}
_PACKED_FIXED64 = {_T_FIXED64, _T_SFIXED64, _T_DOUBLE}
_PACKED_FIXED32 = {_T_FIXED32, _T_SFIXED32, _T_FLOAT}

_ANY_FQN = "google.protobuf.Any"
_TIMESTAMP_FQN = "google.protobuf.Timestamp"
_DURATION_FQN = "google.protobuf.Duration"


@dataclass(frozen=True)
class _Field:
    json_name: str
    number: int
    ftype: int
    repeated: bool
    type_name: str  # fully-qualified (no leading dot) for message/enum


_g = parse_group  # fused parse+group (protowire.py) — the decode hot path


def _utf8(v) -> str:
    if not isinstance(v, bytes):
        raise DecodeError("expected length-delimited field")
    try:
        return v.decode("utf-8")
    except UnicodeDecodeError as e:
        raise DecodeError("invalid utf-8 string") from e


def _camel(name: str) -> str:
    # protoc's jsonName: uppercase the first letter of each segment after
    # the first, PRESERVING the rest (capitalize() would lowercase it:
    # foo_bAR must give fooBAR, not fooBar)
    parts = name.split("_")
    return parts[0] + "".join(p[:1].upper() + p[1:] for p in parts[1:])


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


# -- well-known Timestamp/Duration string forms (JsonFormat parity) ----------

_EPOCH = datetime(1970, 1, 1)


def _wkt_parts(v) -> tuple[int, int]:
    """(seconds, nanos) of a wire-encoded Timestamp/Duration message —
    both are {int64 seconds=1; int32 nanos=2}. Singular numerics:
    last occurrence wins; negative int32 arrives sign-extended to 64
    bits (standard varint encoding), so _signed64 recovers both."""
    if not isinstance(v, bytes):
        raise DecodeError("expected length-delimited message")
    secs = nanos = 0
    for no, occ in _g(v).items():
        raw = occ[-1]
        if no == 1:
            if not isinstance(raw, int):
                raise DecodeError("expected varint seconds")
            secs = _signed64(raw)
        elif no == 2:
            if not isinstance(raw, int):
                raise DecodeError("expected varint nanos")
            nanos = _signed64(raw)
    return secs, nanos


def _frac(n: int) -> str:
    """JsonFormat fractional seconds: none / 3 / 6 / 9 digits."""
    if n == 0:
        return ""
    if n % 1_000_000 == 0:
        return f".{n // 1_000_000:03d}"
    if n % 1_000 == 0:
        return f".{n // 1_000:06d}"
    return f".{n:09d}"


def _render_timestamp(v) -> str:
    """RFC3339 UTC string, the form JsonFormat prints for a Timestamp
    field (range 0001-01-01..9999-12-31, nanos in [0, 1e9); out-of-range
    raises — JsonFormat throws there too, which the decode stage maps to
    error-topic routing)."""
    secs, nanos = _wkt_parts(v)
    if not -62_135_596_800 <= secs <= 253_402_300_799:
        raise DecodeError("timestamp seconds out of range")
    if not 0 <= nanos <= 999_999_999:
        raise DecodeError("timestamp nanos out of range")
    dt = _EPOCH + timedelta(seconds=secs)
    return (
        f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
        f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}{_frac(nanos)}Z"
    )


def _render_duration(v) -> str:
    """JsonFormat Duration string: "<sign><seconds><.frac>s" (range
    ±315,576,000,000s ≈ ±10,000 years; seconds and nanos must agree in
    sign)."""
    secs, nanos = _wkt_parts(v)
    if abs(secs) > 315_576_000_000 or abs(nanos) > 999_999_999:
        raise DecodeError("duration out of range")
    if secs and nanos and (secs < 0) != (nanos < 0):
        raise DecodeError("duration seconds/nanos sign mismatch")
    sign = "-" if (secs < 0 or nanos < 0) else ""
    return f"{sign}{abs(secs)}{_frac(abs(nanos))}s"


class TypeRegistry:
    """fqn → message/enum tables parsed from a FileDescriptorSet, plus
    the generic JsonFormat-convention decoder over them."""

    def __init__(
        self,
        messages: dict[str, list[_Field]],
        enums: dict[str, dict[int, str]],
    ) -> None:
        self._messages = messages
        self._enums = enums
        # (fqn, strict_any) → compiled decoder closure; built lazily so
        # recursive message types resolve their children at decode time
        self._dec_cache: dict[tuple[str, bool], Any] = {}

    # -- construction --------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes) -> "TypeRegistry":
        messages: dict[str, list[_Field]] = {}
        enums: dict[str, dict[int, str]] = {}

        def add_enum(buf: bytes, scope: str) -> None:
            f = _g(buf)  # EnumDescriptorProto: name=1, value=2
            fqn = f"{scope}.{_utf8(f[1][-1])}"
            table: dict[int, str] = {}
            for ev in f.get(2, []):  # EnumValueDescriptorProto: name=1, number=2
                e = _g(ev)
                table[e.get(2, [0])[-1]] = _utf8(e[1][-1])
            enums[fqn] = table

        def add_message(buf: bytes, scope: str) -> None:
            # DescriptorProto: name=1, field=2, nested_type=3, enum_type=4
            f = _g(buf)
            fqn = f"{scope}.{_utf8(f[1][-1])}"
            fields = []
            for fd in f.get(2, []):
                # FieldDescriptorProto: name=1, number=3, label=4, type=5,
                # type_name=6, json_name=10
                d = _g(fd)
                name = _utf8(d[1][-1])
                fields.append(
                    _Field(
                        json_name=(
                            _utf8(d[10][-1]) if 10 in d else _camel(name)
                        ),
                        number=d[3][-1],
                        ftype=d[5][-1],
                        repeated=d.get(4, [0])[-1] == _LABEL_REPEATED,
                        type_name=(
                            _utf8(d[6][-1]).lstrip(".") if 6 in d else ""
                        ),
                    )
                )
            messages[fqn] = fields
            for nested in f.get(3, []):
                add_message(nested, fqn)
            for en in f.get(4, []):
                add_enum(en, fqn)

        # FileDescriptorSet: file=1; FileDescriptorProto: package=2,
        # message_type=4, enum_type=5
        for fdp in _g(data).get(1, []):
            f = _g(fdp)
            pkg = _utf8(f[2][-1]) if 2 in f else ""
            for m in f.get(4, []):
                add_message(m, pkg)
            for e in f.get(5, []):
                add_enum(e, pkg)
        return cls(messages, enums)

    # -- lookup --------------------------------------------------------------

    def has_message(self, fqn: str) -> bool:
        return fqn in self._messages

    # -- decoding ------------------------------------------------------------

    def decode(self, fqn: str, buf: bytes, strict_any: bool = False) -> dict:
        """Render one message of type `fqn` as its protobuf-JSON object.

        Dispatch is COMPILED per message type: the first decode of a type
        builds a closure with every field's converter and default-
        omission predicate pre-resolved (no per-value type if-chain, no
        dataclass attribute walks in the hot loop — this module is the
        decode tier's inner loop, see r5 verdict perf item). Semantics
        are identical to the interpreted walk (_value/_printable, kept
        for re-encoding and pinned by the goldens + the equivalence
        property test in tests/test_descriptors.py)."""
        return self._compiled(fqn, strict_any)(buf)

    def _compiled(self, fqn: str, strict_any: bool) -> "Callable[[bytes], dict]":
        key = (fqn, strict_any)
        fn = self._dec_cache.get(key)
        if fn is None:
            if fqn not in self._messages:
                raise DecodeError(f"type not in descriptor set: {fqn!r}")
            fn = self._compile(fqn, strict_any)
            self._dec_cache[key] = fn
        return fn

    def _compile(self, fqn: str, strict_any: bool) -> "Callable[[bytes], dict]":
        """Build the specialized decoder closure for one message type.

        Per field: conv(raw wire value) → JSON value (raising DecodeError
        on shape violations — same garbage-tolerance contract as _value),
        printable(v, raw) → proto3 default-omission. Nested message
        fields resolve their child decoder lazily through the cache, so
        recursive types terminate."""
        specs: list[tuple] = []
        for fd in self._messages[fqn]:
            t = fd.ftype
            conv: Callable
            if t == _T_MESSAGE:
                if fd.type_name == _ANY_FQN:

                    def conv(v, _sa=strict_any):
                        if not isinstance(v, bytes):
                            raise DecodeError("expected length-delimited message")
                        return _pw._decode_any(v, _sa)

                elif fd.type_name == _TIMESTAMP_FQN:
                    conv = _render_timestamp
                elif fd.type_name == _DURATION_FQN:
                    conv = _render_duration
                else:

                    def conv(v, _tn=fd.type_name, _sa=strict_any, _c=self._compiled):
                        if not isinstance(v, bytes):
                            raise DecodeError("expected length-delimited message")
                        return _c(_tn, _sa)(v)

                printable = lambda v, raw: True  # noqa: E731
            elif t == _T_STRING:
                conv = _utf8
                printable = lambda v, raw: v != ""  # noqa: E731
            elif t == _T_BYTES:

                def conv(v):
                    if not isinstance(v, bytes):
                        raise DecodeError("expected length-delimited bytes")
                    return base64.b64encode(v).decode("ascii")

                printable = lambda v, raw: v != ""  # noqa: E731
            elif t == _T_GROUP:

                def conv(v):
                    raise DecodeError("proto2 groups are not supported")

                printable = lambda v, raw: True  # noqa: E731
            else:
                # numeric on the wire: a length-delimited occurrence must
                # surface as DecodeError, not leak bytes into the JSON
                if t == _T_BOOL:

                    def num(v):
                        return bool(v)

                    printable = lambda v, raw: v is True  # noqa: E731
                elif t == _T_ENUM:

                    def num(v, _table=self._enums.get(fd.type_name, {})):
                        return _table.get(v, v)

                    printable = lambda v, raw: raw != 0  # noqa: E731
                elif t == _T_DOUBLE:

                    def num(v):
                        if v >> 64:
                            raise DecodeError("double value exceeds 64 bits")
                        return struct.unpack("<d", v.to_bytes(8, "little"))[0]

                    printable = lambda v, raw: v != 0  # noqa: E731
                elif t == _T_FLOAT:

                    def num(v):
                        if v >> 32:
                            raise DecodeError("float value exceeds 32 bits")
                        return struct.unpack("<f", v.to_bytes(4, "little"))[0]

                    printable = lambda v, raw: v != 0  # noqa: E731
                else:
                    if t in _ZIGZAG:

                        def xform(v):
                            return (v >> 1) ^ -(v & 1)

                    elif t in _SIGNED_VARINT or t == _T_SFIXED64:
                        xform = _signed64
                    elif t == _T_SFIXED32:

                        def xform(v):
                            return v - (1 << 32) if v >= (1 << 31) else v

                    else:
                        xform = None
                    if t in _AS_STRING_64:
                        if xform is None:

                            def num(v):
                                return str(v)

                        else:

                            def num(v, _x=xform):
                                return str(_x(v))

                        printable = lambda v, raw: v != "0"  # noqa: E731
                    else:
                        if xform is None:

                            def num(v):
                                return v

                        else:
                            num = xform
                        printable = lambda v, raw: v != 0  # noqa: E731

                def conv(v, _num=num, _t=t):
                    if not isinstance(v, int):
                        raise DecodeError(f"expected numeric wire value for type {_t}")
                    return _num(v)

            needs_unpack = fd.repeated and t not in (_T_MESSAGE, _T_STRING, _T_BYTES)
            specs.append((fd.number, fd.json_name, fd.repeated, conv, printable, needs_unpack, fd))

        table = tuple(specs)
        unpack = self._unpack

        def dec(buf: bytes) -> dict:
            wire = _g(buf)
            out: dict = {}
            for number, name, repeated, conv, printable, needs_unpack, fd in table:
                vals = wire.get(number)
                if vals is None:
                    continue
                if repeated:
                    if needs_unpack:
                        vals = unpack(fd, vals)
                    if vals:
                        out[name] = [conv(v) for v in vals]
                else:
                    raw = vals[-1]  # last occurrence wins for singular
                    v = conv(raw)
                    if printable(v, raw):
                        out[name] = v
            return out

        return dec

    def _unpack(self, fd: _Field, vals: list) -> list:
        """Expand packed encodings: any length-delimited occurrence of a
        packable scalar field is a concatenation of values."""
        flat: list = []
        for v in vals:
            if not isinstance(v, bytes):
                flat.append(v)
            elif fd.ftype in _PACKED_VARINT:
                pos = 0
                while pos < len(v):
                    # varints inside a packed blob
                    item, shift = 0, 0
                    while True:
                        if pos >= len(v):
                            raise DecodeError("truncated packed varint")
                        b = v[pos]
                        pos += 1
                        item |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                        if shift > 63:
                            raise DecodeError("packed varint too long")
                    flat.append(item)
            elif fd.ftype in _PACKED_FIXED64:
                if len(v) % 8:
                    raise DecodeError("truncated packed fixed64")
                flat.extend(
                    int.from_bytes(v[i : i + 8], "little")
                    for i in range(0, len(v), 8)
                )
            elif fd.ftype in _PACKED_FIXED32:
                if len(v) % 4:
                    raise DecodeError("truncated packed fixed32")
                flat.extend(
                    int.from_bytes(v[i : i + 4], "little")
                    for i in range(0, len(v), 4)
                )
            else:
                raise DecodeError(
                    f"length-delimited value for scalar type {fd.ftype}"
                )
        return flat

    def _value(self, fd: _Field, v, strict_any: bool):
        t = fd.ftype
        if t == _T_MESSAGE:
            if not isinstance(v, bytes):
                raise DecodeError("expected length-delimited message")
            if fd.type_name == _ANY_FQN:
                # route through protowire so ONE unknown-type policy
                # (opaque vs strict) governs every nesting level
                return _pw._decode_any(v, strict_any)
            if fd.type_name == _TIMESTAMP_FQN:
                return _render_timestamp(v)
            if fd.type_name == _DURATION_FQN:
                return _render_duration(v)
            return self.decode(fd.type_name, v, strict_any)
        if t == _T_STRING:
            return _utf8(v)
        if t == _T_BYTES:
            if not isinstance(v, bytes):
                raise DecodeError("expected length-delimited bytes")
            return base64.b64encode(v).decode("ascii")
        if t == _T_GROUP:
            raise DecodeError("proto2 groups are not supported")
        # every remaining type is numeric on the wire: a length-delimited
        # occurrence (e.g. an enum encoded as bytes) must surface as
        # DecodeError — the error-topic trigger — not leak raw bytes into
        # the JSON object (json.dumps would then TypeError and crash the
        # task instead of routing the record)
        if not isinstance(v, int):
            raise DecodeError(f"expected numeric wire value for type {t}")
        if t == _T_BOOL:
            return bool(v)
        if t == _T_ENUM:
            return self._enums.get(fd.type_name, {}).get(v, v)
        if t == _T_DOUBLE:
            if v >> 64:
                raise DecodeError("double value exceeds 64 bits")
            return struct.unpack("<d", v.to_bytes(8, "little"))[0]
        if t == _T_FLOAT:
            if v >> 32:
                raise DecodeError("float value exceeds 32 bits")
            return struct.unpack("<f", v.to_bytes(4, "little"))[0]
        if t in _ZIGZAG:
            v = (v >> 1) ^ -(v & 1)
        elif t in _SIGNED_VARINT:
            v = _signed64(v)
        elif t == _T_SFIXED64:
            v = _signed64(v)
        elif t == _T_SFIXED32:
            v = v - (1 << 32) if v >= (1 << 31) else v
        if t in _AS_STRING_64:
            return str(v)
        return v

    # -- re-encoding ---------------------------------------------------------

    def reencode(self, fqn: str, buf: bytes, strict_any: bool = False) -> bytes:
        """Canonical re-serialization of one message: the bytes
        protobuf-java produces after parse→toByteArray() — known fields
        in ascending number order, minimal varints, proto3 default-valued
        singular scalars omitted, repeated packable scalars emitted
        packed, singular fields last-occurrence-wins, message fields
        emitted whenever present on the wire (even empty). Field numbers
        NOT in the descriptor go to the trailing unknown-field section —
        protobuf-java writes the UnknownFieldSet after all known fields
        (sorted by number among themselves; per number: varints, fixed32,
        fixed64, length-delimited), so an unknown number lower than a
        known one must NOT interleave. Wrong-wire-type occurrences raise
        DecodeError, mirroring the decoder's strictness."""
        try:
            known = {f.number: f for f in self._messages[fqn]}
        except KeyError:
            raise DecodeError(f"type not in descriptor set: {fqn!r}") from None
        occ: dict[int, list[tuple[int, object]]] = {}
        for no, wt, val in parse_fields(buf):
            occ.setdefault(no, []).append((wt, val))
        out = b""
        for no in sorted(occ):
            fd = known.get(no)
            if fd is not None:
                out += self._reenc_field(fd, occ[no], strict_any)
        for no in sorted(occ):
            if no not in known:
                out += self._reenc_unknown(no, occ[no])
        return out

    def _reenc_field(
        self, fd: _Field, occ: list[tuple[int, object]], strict_any: bool
    ) -> bytes:
        t, no = fd.ftype, fd.number
        if t == _T_GROUP:
            raise DecodeError("proto2 groups are not supported")
        if t == _T_MESSAGE:
            vals = [v for _wt, v in occ]
            if not fd.repeated:
                vals = vals[-1:]
            out = b""
            for v in vals:
                if not isinstance(v, bytes):
                    raise DecodeError("expected length-delimited message")
                if fd.type_name == _ANY_FQN:
                    body = self._reenc_any(v, strict_any)
                else:
                    body = self.reencode(fd.type_name, v, strict_any)
                out += encode_ld(no, body)
            return out
        if t in (_T_STRING, _T_BYTES):
            vals = [v for _wt, v in occ]
            if not fd.repeated:
                vals = vals[-1:]
            out = b""
            for v in vals:
                if not isinstance(v, bytes):
                    raise DecodeError("expected length-delimited field")
                if v or fd.repeated:  # singular "" is the proto3 default
                    out += encode_ld(no, v)
            return out
        # numeric families: re-emit raw wire integers canonically.
        # Repeated fields unpack packed blobs and re-emit packed (proto3
        # writer default); SINGULAR fields require an int occurrence —
        # a length-delimited value on a singular scalar is the same
        # wrong-wire-type error the decoder raises.
        if t in _PACKED_VARINT:
            if fd.repeated:
                ints = [
                    self._canon_varint(t, v)
                    for v in self._unpack(fd, [v for _wt, v in occ])
                ]
                payload = b"".join(encode_varint(v) for v in ints)
                return encode_ld(no, payload) if payload else b""
            v = self._canon_varint(t, occ[-1][1])
            return encode_varint(no << 3 | 0) + encode_varint(v) if v else b""
        if t in _PACKED_FIXED64:
            if fd.repeated:
                ints = self._unpack(fd, [v for _wt, v in occ])
                self._require_ints(ints)
                payload = b"".join(v.to_bytes(8, "little") for v in ints)
                return encode_ld(no, payload) if payload else b""
            v = occ[-1][1]
            self._require_ints([v])
            return (
                encode_varint(no << 3 | 1) + v.to_bytes(8, "little") if v else b""
            )
        if t in _PACKED_FIXED32:
            if fd.repeated:
                ints = self._unpack(fd, [v for _wt, v in occ])
                self._require_ints(ints)
                payload = b"".join(v.to_bytes(4, "little") for v in ints)
                return encode_ld(no, payload) if payload else b""
            v = occ[-1][1]
            self._require_ints([v])
            return (
                encode_varint(no << 3 | 5) + v.to_bytes(4, "little") if v else b""
            )
        raise DecodeError(f"unsupported field type {t}")

    @staticmethod
    def _require_ints(vals: list) -> None:
        for v in vals:
            if not isinstance(v, int):
                raise DecodeError("expected numeric wire value")

    @staticmethod
    def _canon_varint(t: int, v) -> int:
        """The 64-bit varint payload protobuf-java would re-emit for a
        parsed value: 32-bit types truncate then sign-extend (int32/enum)
        or zero-extend (uint32/sint32's zigzag), bool collapses to 0/1."""
        if not isinstance(v, int):
            raise DecodeError("expected numeric wire value")
        mask64 = (1 << 64) - 1
        v &= mask64
        if t == _T_BOOL:
            return 1 if v else 0
        if t in (_T_INT32, _T_ENUM):
            v &= 0xFFFFFFFF
            if v >= 1 << 31:  # negative int32 re-emits sign-extended
                v = (v - (1 << 32)) & mask64
            return v
        if t in (_T_UINT32, _T_SINT32):
            return v & 0xFFFFFFFF
        return v

    def _reenc_any(self, buf: bytes, strict_any: bool) -> bytes:
        """Re-serialize a google.protobuf.Any the way protobuf-java does:
        the ENVELOPE (type_url, value) is a parsed message and gets the
        canonical treatment, but `value` is a BYTES field — the payload
        passes through VERBATIM, never recursively canonicalized. (The
        reference's TxRaw.parseFrom→toTx→toByteArray never parses the
        payload behind an Any, so non-canonical-but-legal payload bytes
        survive the round-trip; an earlier revision normalized them,
        breaking byte parity — r5 ADVICE.) Routing through the generic
        reencode over the descriptor's own Any entry also preserves
        unknown envelope fields in the trailing section. strict_any keeps
        the pinned unknown-type policy: unregistered type_urls raise so
        the record routes to the error topic."""
        if strict_any:
            f = _g(buf)
            type_url = _utf8(f[1][-1]) if 1 in f else ""
            if not self.has_message(type_url.rsplit("/", 1)[-1]):
                raise DecodeError(f"unregistered Any type: {type_url!r}")
        return self.reencode(_ANY_FQN, buf, strict_any)

    @staticmethod
    def _reenc_unknown(no: int, occ: list[tuple[int, object]]) -> bytes:
        out = b""
        for want_wt, emit in (
            (0, lambda v: encode_varint(no << 3 | 0) + encode_varint(v & ((1 << 64) - 1))),
            (5, lambda v: encode_varint(no << 3 | 5) + v.to_bytes(4, "little")),
            (1, lambda v: encode_varint(no << 3 | 1) + v.to_bytes(8, "little")),
            (2, lambda v: encode_ld(no, v)),
        ):
            for wt, val in occ:
                if wt == want_wt:
                    out += emit(val)
        return out

    @staticmethod
    def _printable(fd: _Field, v, raw) -> bool:
        """proto3 default-omission for singular fields: scalars at their
        default are not printed (no field presence); message fields print
        whenever set on the wire, even if empty. Enums are judged by the
        wire NUMBER (0 omitted whatever its name renders as)."""
        if fd.ftype == _T_MESSAGE:
            return True
        if fd.ftype == _T_ENUM:
            return raw != 0
        if fd.ftype in _AS_STRING_64:
            return v != "0"
        if fd.ftype == _T_BOOL:
            return v is True
        if fd.ftype in (_T_STRING, _T_BYTES):
            return v != ""
        return v != 0


_DESC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "cosmos_tx.desc",
)

_default: TypeRegistry | None = None


def default_registry() -> TypeRegistry:
    """Lazy singleton over the checked-in descriptor set — the analog of
    the reference's lazily-built classpath registry
    (ProtoTypeRegistry.kt:13-16): parsed once per process, shared by
    every decode call (and by every Arrow batch worker that imports this
    module)."""
    global _default
    if _default is None:
        with open(_DESC_PATH, "rb") as fh:
            _default = TypeRegistry.from_bytes(fh.read())
    return _default
