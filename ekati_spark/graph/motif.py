"""Motif (pattern) matching over the edge table — GraphFrames-style
``find`` compiled to a chain of joins, plus a join-based triangle count.

No reference analog (the reference's only traversal is the linear
``follow`` pipeline); this is part of the analytics extension alongside
graph/algorithms.py. Patterns are conjunctions of edge atoms::

    (a)-[placed]->(b); (b)-[contains]->(c)

Each atom becomes an edge-scan filtered to its label (label omitted =
any); atoms join on shared vertex variables. The result has one column
per vertex variable. Catalyst orders the joins; label filters push into
the (pruned) edge scan, so a motif is exactly the join query a user
would hand-write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_ATOM = re.compile(
    r"\(\s*(\w+)\s*\)\s*-\s*\[\s*([\w.]*)\s*\]\s*->\s*\(\s*(\w+)\s*\)"
)


def parse_pattern(pattern: str) -> list[tuple[str, str, str]]:
    """-> [(src_var, label, dst_var)]; label '' means any edge."""
    atoms = []
    for part in pattern.split(";"):
        part = part.strip()
        if not part:
            continue
        m = _ATOM.fullmatch(part)
        if not m:
            raise ValueError(f"bad motif atom: {part!r}")
        atoms.append((m.group(1), m.group(2), m.group(3)))
    if not atoms:
        raise ValueError("empty motif pattern")
    return atoms


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match the motif; returns one column per vertex variable.

    Like GraphFrames ``find``, a variable repeated across atoms means the
    same vertex; distinct variables may still bind the same vertex (add
    ``result.filter("a != c")`` for strict distinctness).
    """
    result: DataFrame | None = None
    for i, (sv, label, dv) in enumerate(parse_pattern(pattern)):
        e = edges
        if label:
            e = e.filter(F.col("label") == label)
        step = e.select(F.col("src").alias(sv), F.col("dst").alias(dv))
        if result is None:
            result = step
            continue
        on = [v for v in (sv, dv) if v in result.columns]
        if on:
            result = result.join(step, on)
        else:
            result = result.crossJoin(step)
    assert result is not None
    # a variable bound by several atoms collapsed via the equi-join; each
    # var is one column
    return result


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of the *undirected* simple graph induced by
    ``edges`` — one row, one ``n_triangles`` column.

    Canonical orientation (src < dst after symmetrizing + dedup) makes
    each triangle match exactly once in the two-join plan: a<b<c with
    edges (a,b),(b,c),(a,c). Cost is the standard power-law bound — the
    join fans out on high-degree vertices; at 100 TB one pre-partitions
    the oriented edge list by src (the joins then co-locate).
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    ab = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )
