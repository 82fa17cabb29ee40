"""Pure-stdlib proto3 wire-format codec for the reference's messages.

Implements exactly the subset of the protobuf wire format that
``src/ahghee.grpc/types.proto`` uses — varint (wire type 0), fixed64
(1), length-delimited (2), fixed32 (5) — against a declarative schema
transcribed from that file (``types.proto:10-239``). Messages are plain
Python dicts: a field is "present" iff its name is a key; repeated
fields are lists; nested messages are nested dicts. proto3 oneof
semantics fall out naturally (whichever member key is present gets
encoded; decode keeps the last one seen, per spec).

Encoding is canonical (ascending field number, minimal varints), so
equal dicts produce equal bytes — the golden vectors in
``tests/test_wire.py`` pin the byte layout against hand-derived
encodings from the protobuf spec, and the round-trip test mirrors the
reference's "When I put a node in I can get the same out"
(``src/core.tests/Tests.fs:354-373``).

Negative int32/int64 values encode as 10-byte two's-complement varints
(proto3 int32/int64 rule; the reference never uses sint/zigzag).
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

# ---------------------------------------------------------------------------
# primitive wire helpers

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
_WIRE_BY_TYPE = {
    "double": 1,
    "fixed64": 1,
    "sfixed64": 1,
    "float": 5,
    "fixed32": 5,
    "sfixed32": 5,
    "string": 2,
    "bytes": 2,
}


def write_varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1  # two's complement, 10 bytes
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _tag(field_no: int, wire: int) -> bytes:
    return write_varint((field_no << 3) | wire)


def _signed(value: int, bits: int) -> int:
    """Reinterpret an unsigned varint as two's-complement signed."""
    if value >= 1 << (bits - 1):
        value -= 1 << bits
    return value


# ---------------------------------------------------------------------------
# schema: transcribed from src/ahghee.grpc/types.proto (file:line cited
# per message). Each message maps field number -> (name, type) where
# type is a primitive name above or "msg:<MessageName>"; repeated
# fields use ("name", "type", "repeated").

SCHEMA: dict[str, dict[int, tuple]] = {
    # types.proto:10-15
    "MemoryPointer": {
        1: ("partitionkey", "fixed32"),
        2: ("filename", "fixed32"),
        3: ("offset", "fixed64"),
        4: ("length", "fixed64"),
    },
    # types.proto:17-20
    "TypeBytes": {1: ("typeiri", "string"), 2: ("bytes", "bytes")},
    # types.proto:22-26
    "NodeID": {
        1: ("remote", "string"),
        2: ("iri", "string"),
        3: ("pointer", "msg:MemoryPointer"),
    },
    # types.proto:28-46 — the oneof's members are ordinary fields on
    # the wire; presence-in-dict selects the member.
    "DataBlock": {
        1: ("nodeid", "msg:NodeID"),
        2: ("metabytes", "msg:TypeBytes"),
        3: ("str", "string"),
        4: ("i32", "int32"),
        5: ("i64", "int64"),
        6: ("ui32", "uint32"),
        7: ("ui64", "uint64"),
        8: ("d", "double"),
        9: ("f", "float"),
        10: ("b", "bool"),
        11: ("memorypointer", "msg:MemoryPointer"),
        12: ("array", "msg:Array"),
        13: ("map", "msg:Map"),
    },
    # types.proto:48-53
    "Array": {1: ("item", "msg:DataBlock", "repeated")},
    "Map": {1: ("attributes", "msg:KeyValue", "repeated")},
    # types.proto:55-59
    "TMD": {
        1: ("Timestamp", "int64"),
        2: ("MetaData", "msg:DataBlock"),
        3: ("Data", "msg:DataBlock"),
    },
    # types.proto:61-64
    "KeyValue": {1: ("key", "msg:TMD"), 2: ("value", "msg:TMD")},
    # types.proto:66-70 (field 2 is reserved-by-omission in the source)
    "Node": {
        1: ("id", "msg:NodeID"),
        3: ("fragments", "msg:MemoryPointer", "repeated"),
        4: ("attributes", "msg:KeyValue", "repeated"),
    },
    # types.proto:72-78
    "Attributes": {1: ("attributes", "msg:KeyValue", "repeated")},
    "Pointers": {1: ("pointers", "msg:MemoryPointer", "repeated")},
    # types.proto:79-82
    "Range": {1: ("from", "int32"), 2: ("to", "int32")},
    # types.proto:83-106
    "FollowOperator.FollowAny": {1: ("range", "msg:Range")},
    "FollowOperator.EdgeRange": {
        1: ("edge", "msg:DataBlock"),
        2: ("range", "msg:Range"),
    },
    "FollowOperator.EdgeCMP": {
        1: ("left", "msg:FollowOperator.EdgeNum"),
        2: ("BOOLOP", "string"),
        3: ("right", "msg:FollowOperator.EdgeNum"),
    },
    "FollowOperator.EdgeNum": {
        1: ("edgeRange", "msg:FollowOperator.EdgeRange"),
        2: ("edgeCmp", "msg:FollowOperator.EdgeCMP"),
    },
    "FollowOperator": {
        1: ("followAny", "msg:FollowOperator.FollowAny"),
        2: ("followEdge", "msg:FollowOperator.EdgeNum"),
    },
    # types.proto:107-125
    "FilterOperator.Compare": {
        1: ("kevValueCmp", "msg:FilterOperator.CompareKeyValue"),
        2: ("compoundCmp", "msg:FilterOperator.CompareCompound"),
    },
    "FilterOperator.CompareKeyValue": {
        1: ("Property", "msg:DataBlock"),
        2: ("MATHOP", "string"),
        3: ("Value", "msg:DataBlock"),
    },
    "FilterOperator.CompareCompound": {
        1: ("left", "msg:FilterOperator.Compare"),
        2: ("BOOLOP", "string"),
        3: ("right", "msg:FilterOperator.Compare"),
    },
    "FilterOperator": {1: ("compare", "msg:FilterOperator.Compare")},
    # types.proto:126-131
    "LimitFilter": {1: ("value", "int32")},
    "SkipFilter": {1: ("value", "int32")},
    # types.proto:132-168
    "FieldsOperator.TwoClude": {
        1: ("left", "msg:FieldsOperator.Clude"),
        2: ("include", "msg:FieldsOperator.Clude"),
        3: ("exclude", "msg:FieldsOperator.Clude"),
    },
    "FieldsOperator.CludeList": {
        1: ("cludes", "msg:FieldsOperator.Clude", "repeated"),
    },
    "FieldsOperator.CludeOp.CludePart": {
        1: ("carrotStringMatch", "string"),
        2: ("isCaret", "bool"),
        3: ("stringMatch", "string"),
        4: ("isStar", "bool"),
        5: ("isTypeString", "bool"),
        6: ("isTypeInt", "bool"),
        7: ("isTypeFloat", "bool"),
    },
    "FieldsOperator.CludeOp": {
        1: ("left", "msg:FieldsOperator.CludeOp.CludePart"),
        2: ("right", "msg:FieldsOperator.CludeOp.CludePart"),
    },
    "FieldsOperator.Clude": {
        1: ("list", "msg:FieldsOperator.CludeList"),
        2: ("include", "msg:FieldsOperator.Clude"),
        3: ("exclude", "msg:FieldsOperator.Clude"),
        4: ("twoclude", "msg:FieldsOperator.TwoClude"),
        5: ("op", "msg:FieldsOperator.CludeOp"),
    },
    "FieldsOperator": {1: ("clude", "msg:FieldsOperator.Clude")},
    # types.proto:169-178
    "Step": {
        1: ("follow", "msg:FollowOperator"),
        2: ("filter", "msg:FilterOperator"),
        3: ("next", "msg:Step"),
        4: ("limit", "msg:LimitFilter"),
        5: ("skip", "msg:SkipFilter"),
        6: ("fields", "msg:FieldsOperator"),
    },
    # types.proto:180-183
    "Query": {
        1: ("step", "msg:Step"),
        2: ("iris", "string", "repeated"),
    },
    # types.proto:185-230
    "PutResponse": {1: ("success", "bool")},
    "GetMetricsResponse.Metric": {
        1: ("value", "float"),
        2: ("name", "string"),
        3: ("time", "msg:Timestamp"),
    },
    "GetMetricsResponse": {
        1: ("metrics", "msg:GetMetricsResponse.Metric", "repeated"),
    },
    "GetMetricsRequest": {1: ("names", "string", "repeated")},
    "GetStatsRequest.Stat": {
        1: ("value", "float"),
        2: ("topic", "string"),
        3: ("stat", "string"),
    },
    "GetStatsRequest": {
        1: ("stats", "msg:GetStatsRequest.Stat", "repeated"),
    },
    "GetStatsResponse": {1: ("names", "string", "repeated")},
    "ListStatsRequest": {1: ("match", "string", "repeated")},
    "ListStatsResponse": {1: ("names", "string", "repeated")},
    "ListPoliciesRequest": {1: ("iris", "string", "repeated")},
    "ListPoliciesResponse": {1: ("nodes", "msg:Node", "repeated")},
    "LoadFile": {1: ("type", "string"), 2: ("path", "string")},
    "LoadFileResponse": {1: ("progress", "int64"), 2: ("length", "int64")},
    # google/protobuf/timestamp.proto (imported by types.proto:5)
    "Timestamp": {1: ("seconds", "int64"), 2: ("nanos", "int32")},
}


# ---------------------------------------------------------------------------
# encode


def _encode_scalar(ftype: str, value: Any) -> bytes:
    if ftype in _VARINT_TYPES:
        if ftype == "bool":
            value = 1 if value else 0
        return write_varint(int(value))
    if ftype == "string":
        raw = value.encode("utf-8")
        return write_varint(len(raw)) + raw
    if ftype == "bytes":
        raw = bytes(value)
        return write_varint(len(raw)) + raw
    if ftype == "double":
        return struct.pack("<d", float(value))
    if ftype == "float":
        return struct.pack("<f", float(value))
    if ftype == "fixed64":
        return struct.pack("<Q", int(value))
    if ftype == "sfixed64":
        return struct.pack("<q", int(value))
    if ftype == "fixed32":
        return struct.pack("<I", int(value))
    if ftype == "sfixed32":
        return struct.pack("<i", int(value))
    raise ValueError(f"unknown scalar type {ftype!r}")


def encode(msg_name: str, obj: dict) -> bytes:
    """Encode a plain dict as canonical protobuf bytes of ``msg_name``."""
    fields = SCHEMA[msg_name]
    by_name = {spec[0]: (no, spec) for no, spec in fields.items()}
    out = bytearray()
    for no in sorted(fields):
        name, ftype = fields[no][0], fields[no][1]
        repeated = len(fields[no]) > 2
        if name not in obj:
            continue
        values = obj[name] if repeated else [obj[name]]
        for v in values:
            if ftype.startswith("msg:"):
                payload = encode(ftype[4:], v)
                out += _tag(no, 2) + write_varint(len(payload)) + payload
            else:
                wire = 0 if ftype in _VARINT_TYPES else _WIRE_BY_TYPE[ftype]
                out += _tag(no, wire) + _encode_scalar(ftype, v)
    unknown = set(obj) - set(by_name)
    if unknown:
        raise ValueError(f"{msg_name} has no fields {sorted(unknown)}")
    return bytes(out)


# ---------------------------------------------------------------------------
# decode


def _skip(wire: int, buf: bytes, pos: int) -> int:
    if wire == 0:
        _, pos = read_varint(buf, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 5:
        return pos + 4
    if wire == 2:
        ln, pos = read_varint(buf, pos)
        return pos + ln
    raise ValueError(f"unsupported wire type {wire}")


def _decode_scalar(ftype: str, wire: int, buf: bytes, pos: int):
    if ftype in _VARINT_TYPES:
        raw, pos = read_varint(buf, pos)
        if ftype == "bool":
            return bool(raw), pos
        if ftype in ("int32", "int64"):
            # negative int32 is sign-extended to 10 bytes on the wire
            # (proto3 rule), so both decode as signed-64.
            return _signed(raw, 64), pos
        return raw, pos
    if ftype in ("string", "bytes"):
        ln, pos = read_varint(buf, pos)
        raw = buf[pos : pos + ln]
        if len(raw) != ln:
            raise ValueError("truncated length-delimited field")
        return (raw.decode("utf-8") if ftype == "string" else bytes(raw)), pos + ln
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "fixed64":
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    if ftype == "sfixed64":
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if ftype == "fixed32":
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if ftype == "sfixed32":
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    raise ValueError(f"unknown scalar type {ftype!r}")


def decode(msg_name: str, buf: bytes) -> dict:
    """Decode protobuf bytes into a plain dict (unknown fields skipped)."""
    fields = SCHEMA[msg_name]
    obj: dict[str, Any] = {}
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        no, wire = key >> 3, key & 7
        spec = fields.get(no)
        if spec is None:
            pos = _skip(wire, buf, pos)
            continue
        name, ftype = spec[0], spec[1]
        repeated = len(spec) > 2
        if ftype.startswith("msg:"):
            ln, pos = read_varint(buf, pos)
            value = decode(ftype[4:], buf[pos : pos + ln])
            pos += ln
        else:
            value, pos = _decode_scalar(ftype, wire, buf, pos)
        if repeated:
            obj.setdefault(name, []).append(value)
        else:
            obj[name] = value
    return obj


# ---------------------------------------------------------------------------
# gRPC stream framing (the 5-byte message prefix every gRPC transport
# uses: 1-byte compressed flag + 4-byte big-endian length).


class UnsupportedCompressionError(ValueError):
    """gRPC frame with a set compressed flag — the server advertises
    identity-only, so this maps to grpc-status 12 (UNIMPLEMENTED)."""


class TruncatedFrameError(ValueError):
    """gRPC frame whose declared length overruns the body (or a body
    too short for the 5-byte prefix) — wire corruption, which the gRPC
    spec maps to grpc-status 13 (INTERNAL), not UNIMPLEMENTED."""


def frame(payload: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", len(payload)) + payload


def iter_frames(stream: bytes) -> Iterator[bytes]:
    pos = 0
    while pos < len(stream):
        if pos + 5 > len(stream):
            raise TruncatedFrameError("truncated gRPC frame prefix")
        if stream[pos] != 0:
            raise UnsupportedCompressionError(
                "compressed gRPC frames unsupported"
            )
        (ln,) = struct.unpack_from(">I", stream, pos + 1)
        start = pos + 5
        if start + ln > len(stream):
            raise TruncatedFrameError("truncated gRPC frame")
        yield stream[start : start + ln]
        pos = start + ln
