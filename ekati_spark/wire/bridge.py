"""proto message <-> engine IR / row bridge.

Maps the reference's wire messages (``src/ahghee.grpc/types.proto``)
onto the engine's native forms: ``Node`` -> ``ir.PutCommand`` (the Put
RPC, ``WatService.cs:97-130``), attribute rows -> ``Node`` messages
(the Get RPC's streamed results, ``WatService.cs:284-293``), and
``Query``'s singly-linked Step chain -> ``ir.GetQuery`` (types.proto:
169-183; the reference builds the same chain from its ANTLR listener).
"""

from __future__ import annotations

from ekati_spark.graph import ir
from ekati_spark.graph.traverse import And, Any, Edge, Or

# -- DataBlock helpers -------------------------------------------------------

_LITERAL_MEMBERS = ("str", "i32", "i64", "ui32", "ui64", "d", "f", "b")


def datablock_value(db: dict):
    """Python literal for a DataBlock's set member (oneof, types.proto:
    28-46). NodeID members are returned as ir.NodeRef."""
    if "nodeid" in db:
        n = db["nodeid"]
        return ir.NodeRef(n.get("iri", ""), n.get("remote", ""))
    if "metabytes" in db:
        return bytes(db["metabytes"].get("bytes", b""))
    for m in _LITERAL_MEMBERS:
        if m in db:
            return db[m]
    raise ValueError(f"DataBlock with no supported member: {sorted(db)}")


def value_datablock(dtype: str, row) -> dict:
    """DataBlock message for one long-format attribute row."""
    if dtype == "str":
        return {"str": row.str}
    if dtype == "i64":
        return {"i64": row.i64}
    if dtype == "dbl":
        return {"d": row.dbl}
    if dtype == "bool":
        return {"b": row.bool}
    if dtype == "ref":
        return {"nodeid": {"iri": row.ref}}
    if dtype == "bytes":
        # get results project the 10 lookup columns (compiler.py
        # _materialize) — bytes/meta_type ride only on full prop rows
        return {
            "metabytes": {
                "typeiri": getattr(row, "meta_type", None) or "",
                "bytes": getattr(row, "bytes", None) or b"",
            }
        }
    raise ValueError(f"unknown dtype {dtype!r}")


# -- Put: proto Node -> ir.PutCommand ---------------------------------------


def node_msg_to_put(node: dict) -> ir.PutCommand:
    """One wire Node into the engine's put form. Key/value NodeID
    members map onto the four pair kinds exactly as the DSL does
    (fedge/dedge = key-side references, graph/parser.py)."""
    nid = node.get("id", {})
    ref = ir.NodeRef(nid.get("iri", ""), nid.get("remote", ""))
    pairs = []
    for kv in node.get("attributes", []):
        key_v = datablock_value(kv.get("key", {}).get("Data", {"str": ""}))
        val_v = datablock_value(kv.get("value", {}).get("Data", {"str": ""}))
        key_is_ref = isinstance(key_v, ir.NodeRef)
        val_is_ref = isinstance(val_v, ir.NodeRef)
        kind = (
            ir.PairKind.DEDGE
            if key_is_ref and val_is_ref
            else ir.PairKind.FEDGE
            if key_is_ref
            else ir.PairKind.EDGE
            if val_is_ref
            else ir.PairKind.KVP
        )
        key = key_v.iri if key_is_ref else str(key_v)
        pairs.append(ir.PutPair(kind, key, val_v))
    return ir.PutCommand((ir.PutNode(ref, tuple(pairs)),))


# -- Get results: long-format rows -> proto Node messages --------------------


def rows_to_node_msgs(rows) -> list[dict]:
    """Group attribute rows (PROPS_SCHEMA shape) into wire Node
    messages, ordered by (remote, node_id) for a deterministic stream."""
    by_node: dict[tuple, dict] = {}
    for r in rows:
        key = (getattr(r, "remote", "") or "", r.node_id)
        n = by_node.setdefault(
            key,
            {
                "id": (
                    {"iri": r.node_id, "remote": key[0]}
                    if key[0]
                    else {"iri": r.node_id}
                ),
                "attributes": [],
            },
        )
        n["attributes"].append(
            {
                "key": {"Data": {"str": r.key}},
                "value": {"Timestamp": r.ts, "Data": value_datablock(r.dtype, r)},
            }
        )
    return [by_node[k] for k in sorted(by_node)]


# -- Query message -> ir.GetQuery --------------------------------------------


def _range(rg: dict) -> tuple[int, int]:
    return rg.get("from", 0), rg.get("to", 0)


def _follow_spec(num: dict):
    """FollowOperator.EdgeNum (types.proto:96-101)."""
    if "edgeRange" in num:
        er = num["edgeRange"]
        frm, to = _range(er.get("range", {}))
        label = datablock_value(er.get("edge", {"str": ""}))
        return Edge(str(label), frm, to)
    if "edgeCmp" in num:
        cmp_ = num["edgeCmp"]
        left = _follow_spec(cmp_.get("left", {}))
        right = _follow_spec(cmp_.get("right", {}))
        op = cmp_.get("BOOLOP", "&&")
        return And(left, right) if op == "&&" else Or(left, right)
    raise ValueError("EdgeNum with neither edgeRange nor edgeCmp")


def _filter_pred(cmp_: dict):
    """FilterOperator.Compare (types.proto:108-123)."""
    if "kevValueCmp" in cmp_:
        kvc = cmp_["kevValueCmp"]
        return ir.KeyValueCmp(
            str(datablock_value(kvc.get("Property", {"str": ""}))),
            kvc.get("MATHOP", "=="),
            datablock_value(kvc.get("Value", {"str": ""})),
        )
    if "compoundCmp" in cmp_:
        cc = cmp_["compoundCmp"]
        return ir.Compound(
            _filter_pred(cc.get("left", {})),
            cc.get("BOOLOP", "&&"),
            _filter_pred(cc.get("right", {})),
        )
    raise ValueError("Compare with neither kevValueCmp nor compoundCmp")


def _clude_part(part: dict) -> ir.CludePart:
    if "carrotStringMatch" in part:
        return ir.CludePart("caret_target", part["carrotStringMatch"])
    if "stringMatch" in part:
        return ir.CludePart("lit", part["stringMatch"])
    if part.get("isCaret"):
        return ir.CludePart("caret")
    if part.get("isStar"):
        return ir.CludePart("star")
    if part.get("isTypeString"):
        return ir.CludePart("type", "string")
    if part.get("isTypeInt"):
        return ir.CludePart("type", "int")
    if part.get("isTypeFloat"):
        return ir.CludePart("type", "float")
    raise ValueError(f"CludePart with no member: {sorted(part)}")


def _clude(cl: dict):
    if "op" in cl:
        op = cl["op"]
        return ir.CludeOp(
            _clude_part(op.get("left", {})), _clude_part(op.get("right", {}))
        )
    if "list" in cl:
        return tuple(_clude(c) for c in cl["list"].get("cludes", []))
    if "include" in cl:
        return ir.Include(_clude(cl["include"]))
    if "exclude" in cl:
        return ir.Exclude(_clude(cl["exclude"]))
    if "twoclude" in cl:
        tc = cl["twoclude"]
        out = [_clude(tc.get("left", {}))]
        if "include" in tc:
            out.append(ir.Include(_clude(tc["include"])))
        if "exclude" in tc:
            out.append(ir.Exclude(_clude(tc["exclude"])))
        return tuple(out)
    raise ValueError(f"Clude with no member: {sorted(cl)}")


def query_msg_to_get(query: dict, history: bool = False) -> ir.GetQuery:
    seeds = tuple(ir.NodeRef(i) for i in query.get("iris", []))
    steps = []
    step = query.get("step")
    while step:
        if "follow" in step:
            fo = step["follow"]
            if "followAny" in fo:
                frm, to = _range(fo["followAny"].get("range", {}))
                steps.append(ir.FollowStep(Any(frm, to)))
            elif "followEdge" in fo:
                steps.append(ir.FollowStep(_follow_spec(fo["followEdge"])))
        elif "filter" in step:
            steps.append(ir.FilterStep(_filter_pred(step["filter"].get("compare", {}))))
        elif "limit" in step:
            steps.append(ir.LimitStep(step["limit"].get("value", 0)))
        elif "skip" in step:
            steps.append(ir.SkipStep(step["skip"].get("value", 0)))
        elif "fields" in step:
            cl = _clude(step["fields"].get("clude", {}))
            steps.append(
                ir.FieldsStep(cl if isinstance(cl, tuple) else (cl,))
            )
        step = step.get("next")
    return ir.GetQuery(seeds, tuple(steps), history=history)
