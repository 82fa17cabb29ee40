"""GraphML loader with the reference's reified-edge convention
(``src/core/TinkerPop.fs:36-164``):

- every GraphML vertex becomes a node carrying its typed data attributes
  (key decls map string→str, int→i64, double→dbl — xsType at
  TinkerPop.fs:27-32);
- every GraphML edge becomes a *first-class edge-node* carrying its own
  attributes (labelE, weight, …) plus ``source``/``target`` refs back to
  the vertices;
- each vertex gains ``out.<labelE>`` / ``in.<labelE>`` refs pointing at
  the edge-nodes (TinkerPop.fs:78-156).

Files are small toy graphs (≤ MBs), so parsing happens driver-side with
xml.etree and lands in a distributed DataFrame; a 100 TB graph would
arrive as parquet/nt, not GraphML.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ekati_spark.schemas import PROPS_SCHEMA, prop_row

_NS = "{http://graphml.graphdrawing.org/xmlns}"


def _typed(value: str, attr_type: str):
    if attr_type == "int":
        return int(value)
    if attr_type in ("double", "float"):
        return float(value)
    return value


def graphml_rows(path: str, ts: int = 0) -> list[tuple]:
    tree = ET.parse(path)
    root = tree.getroot()

    keys: dict[str, tuple[str, str]] = {}
    for k in root.iter(f"{_NS}key"):
        keys[k.get("id")] = (k.get("attr.name"), k.get("attr.type", "string"))

    graph = root.find(f"{_NS}graph")
    nodes = graph.findall(f"{_NS}node")
    edges = graph.findall(f"{_NS}edge")

    rows: list[tuple] = []

    def data_attrs(el) -> list[tuple[str, object]]:
        out = []
        for d in el.findall(f"{_NS}data"):
            name, typ = keys[d.get("key")]
            out.append((name, _typed(d.text, typ)))
        return out

    def edge_label(e) -> str:
        for name, v in data_attrs(e):
            if name == "labelE":
                return str(v)
        return "edge"

    # one O(E) pass builds adjacency (and computes each edge's label
    # once) — scanning the edge list per node is O(V·E)
    out_edges: dict[str, list[tuple[str, str]]] = {}
    in_edges: dict[str, list[tuple[str, str]]] = {}
    for e in edges:
        lab = edge_label(e)
        out_edges.setdefault(e.get("source"), []).append((lab, e.get("id")))
        in_edges.setdefault(e.get("target"), []).append((lab, e.get("id")))

    for n in nodes:
        nid = n.get("id")
        for name, v in data_attrs(n):
            rows.append(prop_row(nid, name, v, ts=ts))
        for lab, eid in out_edges.get(nid, ()):
            rows.append(prop_row(nid, f"out.{lab}", eid, ts=ts, is_ref=True))
        for lab, eid in in_edges.get(nid, ()):
            rows.append(prop_row(nid, f"in.{lab}", eid, ts=ts, is_ref=True))

    for e in edges:
        eid = e.get("id")
        for name, v in data_attrs(e):
            rows.append(prop_row(eid, name, v, ts=ts))
        rows.append(prop_row(eid, "source", e.get("source"), ts=ts, is_ref=True))
        rows.append(prop_row(eid, "target", e.get("target"), ts=ts, is_ref=True))

    return rows


def load_graphml(spark: SparkSession, path: str, ts: int = 0) -> DataFrame:
    return spark.createDataFrame(graphml_rows(path, ts), PROPS_SCHEMA)
