"""Protobuf wire-format parity for the reference's gRPC message types.

The reference's serving surface is gRPC over the proto3 messages in
``src/ahghee.grpc/types.proto``; its round-trip contract is the test
"When I put a node in I can get the same out"
(``src/core.tests/Tests.fs:354-373``). These tests pin:

1. golden byte vectors hand-derived from the protobuf spec, so the
   stdlib codec (``ekati_spark.wire.proto``) produces bytes a real
   protobuf parser — the reference's — would accept;
2. the put/get round-trip over Node messages built from the same
   TinkerPop GraphML corpus the reference test uses;
3. gRPC 5-byte stream framing round-trip.
"""

import math
import os

import pytest

from ekati_spark.wire import proto as W

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tinkerpop-modern.xml")


# -- 1. golden vectors (spec-derived, byte-exact) ---------------------------


def test_golden_nodeid():
    # NodeID{remote:"r", iri:"abc"}: field1 tag 0x0A len 1 'r',
    # field2 tag 0x12 len 3 'abc'.
    got = W.encode("NodeID", {"remote": "r", "iri": "abc"})
    assert got == bytes.fromhex("0a01721203616263")
    assert W.decode("NodeID", got) == {"remote": "r", "iri": "abc"}


def test_golden_memory_pointer_fixed_widths():
    # fixed32 partitionkey=1 -> tag 0x0D + 01000000 LE;
    # fixed64 offset=2 -> tag 0x19 + 0200000000000000 LE.
    got = W.encode("MemoryPointer", {"partitionkey": 1, "offset": 2})
    assert got == bytes.fromhex("0d010000001902000000" + "00000000")
    assert W.decode("MemoryPointer", got) == {"partitionkey": 1, "offset": 2}


def test_golden_datablock_variants():
    # str member: field 3, tag 0x1A.
    assert W.encode("DataBlock", {"str": "hi"}) == bytes.fromhex("1a026869")
    # i64 member: field 5 varint, tag 0x28; 300 -> AC 02.
    assert W.encode("DataBlock", {"i64": 300}) == bytes.fromhex("28ac02")
    # negative int64: 10-byte two's-complement varint.
    assert W.encode("DataBlock", {"i64": -1}) == bytes.fromhex(
        "28ffffffffffffffffff01"
    )
    assert W.decode("DataBlock", W.encode("DataBlock", {"i64": -1})) == {"i64": -1}
    # double member: field 8, tag 0x41, IEEE LE.
    assert W.encode("DataBlock", {"d": 1.0}) == bytes.fromhex("41000000000000f03f")
    # bool member: field 10, tag 0x50.
    assert W.encode("DataBlock", {"b": True}) == bytes.fromhex("5001")


def test_golden_nested_node():
    # Node{id: NodeID{iri:"n"}, attributes:[KeyValue{key:TMD{Data:{str:"k"}},
    # value:TMD{Timestamp:7, Data:{i32:5}}}]}
    kv = {
        "key": {"Data": {"str": "k"}},
        "value": {"Timestamp": 7, "Data": {"i32": 5}},
    }
    node = {"id": {"iri": "n"}, "attributes": [kv]}
    got = W.encode("Node", node)
    # id: tag 0x0A len 3 (NodeID: tag 0x12 len 1 'n')
    # attributes: tag 0x22 (field 4) len 15:
    #   key:  tag 0x0A len 5 (TMD Data: tag 0x1A len 3 (str: 1A 01 6B))
    #   value: tag 0x12 len 6 (TMD Timestamp: 08 07, Data: 1A 02 20 05)
    assert got == bytes.fromhex(
        "0a03" "12016e" "220f" "0a05" "1a03" "1a016b" "1206" "0807" "1a02" "2005"
    )
    assert W.decode("Node", got) == node


def test_golden_query_repeated_strings():
    q = {"step": {"limit": {"value": 7}}, "iris": ["a", "b"]}
    got = W.encode("Query", q)
    # step: tag 0x0A len 4 (limit field 4: tag 0x22 len 2 (value: 08 07))
    # iris: tag 0x12 'a', tag 0x12 'b'
    assert got == bytes.fromhex("0a0422020807" "120161" "120162")
    assert W.decode("Query", got) == q


def test_golden_float_metric():
    m = {"value": 1.5, "name": "reads"}
    got = W.encode("GetMetricsResponse.Metric", m)
    assert got == bytes.fromhex("0d0000c03f" "12057265616473")
    back = W.decode("GetMetricsResponse.Metric", got)
    assert back["name"] == "reads" and math.isclose(back["value"], 1.5)


# -- 2. put/get round-trip over the reference's test corpus -----------------


def _crew_nodes() -> list[dict]:
    """Node messages from the TinkerPop GraphML fixture — the same
    corpus the reference's round-trip test feeds through its stores
    (buildNodesTheCrew, src/core/TinkerPop.fs:163)."""
    from ekati_spark.sources.graphml import graphml_rows

    nodes: dict[str, dict] = {}
    for row in graphml_rows(FIXTURE):
        node_id, _remote, key, ts, dtype, s, i, f, b, ref = row[:10]
        n = nodes.setdefault(node_id, {"id": {"iri": node_id}, "attributes": []})
        if dtype == "str":
            data = {"str": s}
        elif dtype == "i64":
            data = {"i64": i}
        elif dtype == "dbl":
            data = {"d": f}
        elif dtype == "bool":
            data = {"b": b}
        elif dtype == "ref":  # edges become NodeID-valued attributes
            data = {"nodeid": {"iri": ref}}
        else:
            raise AssertionError(f"unexpected dtype {dtype!r}")
        n["attributes"].append(
            {
                "key": {"Data": {"str": key}},
                "value": {"Timestamp": ts, "Data": data},
            }
        )
    return sorted(nodes.values(), key=lambda n: n["id"]["iri"])


def test_put_get_roundtrip_the_crew():
    """Mirror of "When I put a node in I can get the same out"
    (Tests.fs:354-373) at the wire layer: every Node message survives
    encode -> decode bit-exactly and dict-exactly."""
    nodes = _crew_nodes()
    assert len(nodes) >= 6  # tinkerpop-modern has 6 vertices
    for n in nodes:
        raw = W.encode("Node", n)
        back = W.decode("Node", raw)
        assert back == n
        # canonical encoding: re-encoding the decoded dict is stable
        assert W.encode("Node", back) == raw


def test_query_message_roundtrip_all_operators():
    """A Query exercising every Step operator arm (follow/filter/
    limit/skip/fields), nested like the reference's AST."""
    q = {
        "iris": ["1", "*"],
        "step": {
            "follow": {"followAny": {"range": {"from": 1, "to": 3}}},
            "next": {
                "filter": {
                    "compare": {
                        "kevValueCmp": {
                            "Property": {"str": "age"},
                            "MATHOP": ">",
                            "Value": {"i32": 30},
                        }
                    }
                },
                "next": {
                    "skip": {"value": 2},
                    "next": {
                        "limit": {"value": 10},
                        "next": {
                            "fields": {
                                "clude": {
                                    "op": {
                                        "left": {"isStar": True},
                                        "right": {"isTypeString": True},
                                    }
                                }
                            }
                        },
                    },
                },
            },
        },
    }
    assert W.decode("Query", W.encode("Query", q)) == q


def test_unknown_fields_are_skipped():
    """Forward compat: bytes with a field number we don't know decode
    without error (proto3 unknown-field rule)."""
    raw = W.encode("NodeID", {"iri": "x"})
    # append unknown field 15 varint 1: tag (15<<3)|0 = 0x78
    assert W.decode("NodeID", raw + bytes.fromhex("7801")) == {"iri": "x"}


# -- 3. gRPC stream framing --------------------------------------------------


def test_grpc_framing_roundtrip():
    msgs = [W.encode("LoadFileResponse", {"progress": i, "length": 100}) for i in range(5)]
    stream = b"".join(W.frame(m) for m in msgs)
    assert list(W.iter_frames(stream)) == msgs
    with pytest.raises(ValueError):
        list(W.iter_frames(b"\x01\x00\x00\x00\x00"))  # compressed flag


# ---------------------------------------------------------------------------
# property-based roundtrip: SCHEMA-driven random messages


def _scalar_strategy(ftype):
    import math
    import struct as _struct

    from hypothesis import strategies as st

    if ftype == "bool":
        return st.booleans()
    if ftype in ("int32", "int64"):
        # int32 rides the wire sign-extended to 64 bits (proto3), so
        # the codec decodes both as signed-64; generate the full range
        # the decoder hands back.
        lo, hi = (-(2**31), 2**31 - 1) if ftype == "int32" else (
            -(2**63), 2**63 - 1
        )
        return st.integers(lo, hi)
    if ftype in ("uint32", "enum"):
        return st.integers(0, 2**32 - 1)
    if ftype == "uint64":
        return st.integers(0, 2**64 - 1)
    if ftype == "fixed32":
        return st.integers(0, 2**32 - 1)
    if ftype == "fixed64":
        return st.integers(0, 2**64 - 1)
    if ftype == "sfixed32":
        return st.integers(-(2**31), 2**31 - 1)
    if ftype == "sfixed64":
        return st.integers(-(2**63), 2**63 - 1)
    if ftype == "string":
        return st.text(max_size=40)
    if ftype == "bytes":
        return st.binary(max_size=40)
    if ftype == "double":
        return st.floats(allow_nan=False)
    if ftype == "float":
        # quantize through float32 so roundtrip equality is exact
        return st.floats(allow_nan=False, width=32).map(
            lambda x: _struct.unpack("<f", _struct.pack("<f", x))[0]
        )
    raise AssertionError(ftype)


def _message_strategy(msg_name, depth=0):
    from hypothesis import strategies as st

    from ekati_spark.wire.proto import SCHEMA

    parts = {}
    for no, spec in SCHEMA[msg_name].items():
        name, ftype = spec[0], spec[1]
        repeated = len(spec) > 2
        if ftype.startswith("msg:"):
            if depth >= 2:
                continue  # bound recursion (Node -> attrs -> DataBlock...)
            inner = _message_strategy(ftype[4:], depth + 1)
        else:
            inner = _scalar_strategy(ftype)
        if repeated:
            inner = st.lists(inner, max_size=3)
        # presence is optional per field: omitted != default-encoded,
        # and the codec skips absent names on encode
        parts[name] = st.one_of(st.none(), inner)
    return st.fixed_dictionaries({}, optional=parts).map(
        lambda d: {k: v for k, v in d.items() if v is not None}
    )


def _prune_empty(obj):
    """Drop empty repeated fields: absent and [] are indistinguishable
    on the wire (proto3 has no presence for repeateds)."""
    out = {}
    for k, v in obj.items():
        if isinstance(v, list):
            v = [
                _prune_empty(x) if isinstance(x, dict) else x for x in v
            ]
            if not v:
                continue
        elif isinstance(v, dict):
            v = _prune_empty(v)
        out[k] = v
    return out


def test_roundtrip_property_all_rpc_messages():
    """decode(encode(x)) == x for schema-conforming random instances of
    every RPC-surface message (hypothesis; empty-repeated normalization
    is the only wire-inherent loss)."""
    from hypothesis import HealthCheck, given, settings

    from ekati_spark.wire.proto import SCHEMA, decode, encode

    for msg in (
        "Node",
        "Query",
        "GetMetricsRequest",
        "GetMetricsResponse",
        "GetStatsResponse",
        "ListStatsResponse",
        "ListPoliciesRequest",
        "LoadFile",
        "LoadFileResponse",
        "Timestamp",
    ):
        if msg not in SCHEMA:
            continue

        def check(obj, _msg=msg):
            want = _prune_empty(obj)
            got = decode(_msg, encode(_msg, obj))
            assert got == want, (_msg, want, got)

        settings(
            max_examples=60,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )(given(_message_strategy(msg))(lambda obj: check(obj)))()
