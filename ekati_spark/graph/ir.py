"""Step IR — Python mirror of the reference's protobuf query IR
(``src/ahghee.grpc/types.proto:79-183``: Step = follow | filter | skip |
limit | fields, singly linked; here a plain list) plus the command forms
(put / get / load, grammar ``src/cli-grammer/AHGHEE.g4:5-22``).

The IR is deliberately engine-agnostic: the parser produces it, the
compiler lowers it to DataFrame plans, and tests can construct it
directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ekati_spark.graph.traverse import And, Any, Edge, Or  # follow spec tree

# re-export for IR consumers
__all__ = [
    "Any", "Edge", "And", "Or",
    "NodeRef", "KeyValueCmp", "Compound", "CludePart", "CludeOp",
    "Include", "Exclude", "FollowStep", "FilterStep", "SkipStep",
    "LimitStep", "FieldsStep", "GetQuery", "PairKind", "PutPair",
    "PutNode", "PutCommand", "LoadCommand",
]


@dataclass(frozen=True)
class NodeRef:
    """NodeID identity = (remote, iri) only (MemoryPointer.partial.cs:234-245)."""
    iri: str
    remote: str = ""


# -- filter compare tree (types.proto:107-125) ------------------------------


@dataclass(frozen=True)
class KeyValueCmp:
    """∃ attribute with key == prop and value MATHOP literal.

    Implements the *documented* semantics (docs/index.md:202-206), not the
    reference's self-compare defect (FileStore.fs:147); '!=' is supported
    (grammar allows it, the reference evaluator didn't — FileStore.fs:94-101).
    Cross-type comparisons are false (documented deviation from the
    declaration-order DataBlock ordering, MemoryPointer.partial.cs:377-402).
    """
    prop: str
    op: str  # == < <= >= > !=
    value: object  # str | int | float | bool


@dataclass(frozen=True)
class Compound:
    left: object
    bool_op: str  # && or ||
    right: object


# -- fields clude tree (types.proto:132-168, AHGHEE.g4:105-123,164-181) -----


@dataclass(frozen=True)
class CludePart:
    """One side of a cludeop: literal key/string, '*', '^', '^"iri"', or a
    value-type test int|string|float."""
    kind: str  # 'lit' | 'star' | 'caret' | 'caret_target' | 'type'
    value: str | None = None


@dataclass(frozen=True)
class CludeOp:
    key: CludePart
    val: CludePart


@dataclass(frozen=True)
class Include:
    item: object  # CludeOp | list


@dataclass(frozen=True)
class Exclude:
    item: object


# -- pipeline steps (types.proto:169-183) -----------------------------------


@dataclass(frozen=True)
class FollowStep:
    spec: object  # Any | Edge | And | Or


@dataclass(frozen=True)
class FilterStep:
    pred: object  # KeyValueCmp | Compound


@dataclass(frozen=True)
class SkipStep:
    n: int


@dataclass(frozen=True)
class LimitStep:
    n: int


@dataclass(frozen=True)
class FieldsStep:
    cludes: tuple  # sequence of CludeOp | Include | Exclude | nested tuple


@dataclass(frozen=True)
class TransformStep:
    """User plugin operator by name (the WASM query-operator seam,
    ekati_spark/plugins.py)."""

    name: str


@dataclass(frozen=True)
class GetQuery:
    seeds: tuple[NodeRef, ...]  # ('*',) wildcard handled via iri='*'
    steps: tuple = ()
    history: bool = False  # get -h: all versions (Listener.cs:125-134)


# -- put / load (AHGHEE.g4:11-21) -------------------------------------------


class PairKind:
    KVP = "kvp"      # "k": v
    EDGE = "edge"    # "k": ^"id"
    FEDGE = "fedge"  # ^"k": v
    DEDGE = "dedge"  # ^"k": ^"id"


@dataclass(frozen=True)
class PutPair:
    kind: str
    key: str
    value: object  # literal, or NodeRef for edge/dedge


@dataclass(frozen=True)
class PutNode:
    id: NodeRef
    pairs: tuple[PutPair, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class PutCommand:
    nodes: tuple[PutNode, ...]


@dataclass(frozen=True)
class LoadCommand:
    kind: str  # 'graphml' | 'nt'
    path: str
