"""Canonical schemas for the graph data model (SURVEY.md §1.5).

The reference's Node is an attribute multimap with per-attribute
timestamps and a tagged-union value type (DataBlock,
reference ``src/ahghee.grpc/types.proto:28-70``). We store it long-format:
one row per (node, key, version) with a flattened variant — exactly one
value branch populated, discriminated by ``dtype``.

dtype values: 'str' | 'i64' | 'dbl' | 'bool' | 'ref' | 'bytes'
('ref' = NodeID-valued attribute, i.e. an edge — the reference treats any
NodeID-valued attribute as followable, ``types.proto:29-31``).

Edges are a projection of props where dtype='ref'; identity is
(remote, node_id) mirroring NodeID equality over (remote, iri) only
(``MemoryPointer.partial.cs:234-245``) — storage pointers have no Spark
analog and are dropped.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Long-format property table: one row per attribute version.
PROPS_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("remote", T.StringType(), True),  # "" = local graph
        T.StructField("key", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),  # batch write timestamp
        T.StructField("dtype", T.StringType(), False),
        T.StructField("str", T.StringType(), True),
        T.StructField("i64", T.LongType(), True),
        T.StructField("dbl", T.DoubleType(), True),
        T.StructField("bool", T.BooleanType(), True),
        T.StructField("ref", T.StringType(), True),  # target node_id for edges
        T.StructField("bytes", T.BinaryType(), True),
        # metadata: RDF ^^type IRI / @lang tag / provenance
        # (TMD.MetaData, types.proto:55-59)
        T.StructField("meta_type", T.StringType(), True),
        T.StructField("meta_lang", T.StringType(), True),
    ]
)

# Edge view: props rows where dtype='ref'.
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
    ]
)

PROPS_COLUMNS = [f.name for f in PROPS_SCHEMA.fields]


def prop_row(
    node_id: str,
    key: str,
    value,
    ts: int = 0,
    remote: str = "",
    meta_type: str | None = None,
    meta_lang: str | None = None,
    is_ref: bool = False,
) -> tuple:
    """Build one PROPS_SCHEMA row from a Python value (test/ingest helper)."""
    s = i = d = b = r = by = None
    if is_ref:
        dtype, r = "ref", str(value)
    elif isinstance(value, bool):
        dtype, b = "bool", value
    elif isinstance(value, int):
        dtype, i = "i64", value
    elif isinstance(value, float):
        dtype, d = "dbl", value
    elif isinstance(value, (bytes, bytearray)):
        dtype, by = "bytes", bytes(value)
    else:
        dtype, s = "str", str(value)
    return (node_id, remote, key, ts, dtype, s, i, d, b, r, by, meta_type, meta_lang)
