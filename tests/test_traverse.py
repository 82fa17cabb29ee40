"""Traversal-kernel tests replicating the reference's operator unit tests
(SURVEY.md §5: dedup invariant Tests.fs:882-900, skip/take set-level
assertions Tests.fs:375-515, cycles + multimap FIXTURES.md A2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ekati_spark.graph.model import PropertyGraph
from ekati_spark.graph.traverse import Any, Edge, Or, follow
from ekati_spark.schemas import prop_row


@pytest.fixture(scope="module")
def follows3(spark):
    """FIXTURES.md A2: 1↔2 cycle; node 3 has two multi-valued follows."""
    rows = [
        prop_row("1", "firstName", "Richard"),
        prop_row("1", "follows", "2", is_ref=True),
        prop_row("2", "firstName", "Sam"),
        prop_row("2", "follows", "1", is_ref=True),
        prop_row("3", "firstName", "Jim"),
        prop_row("3", "follows", "1", is_ref=True),
        prop_row("3", "follows", "2", is_ref=True),
    ]
    return PropertyGraph.from_rows(spark, rows)


def _ids(df):
    return sorted(r.node_id for r in df.select("node_id").collect())


def test_follow_one_hop(follows3, spark):
    seeds = spark.createDataFrame([("3",)], "node_id string")
    out = follow(follows3.edges, seeds, Edge("follows", 1, 1))
    assert _ids(out) == ["1", "2"]


def test_follow_cycle_terminates_and_dedups(follows3, spark):
    """follow * 0..6 from node 1 visits each node at most once
    (the reference's bloom-dedup test, exact here)."""
    seeds = spark.createDataFrame([("1",)], "node_id string")
    out = follow(follows3.edges, seeds, Any(0, 6), with_hop=True).collect()
    ids = [r.node_id for r in out]
    assert sorted(ids) == ["1", "2"]  # 3 unreachable; no duplicates
    assert len(ids) == len(set(ids))


def test_follow_monotone_in_hops(follows3, spark):
    """Metamorphic: follow * 1..k ⊆ follow * 1..(k+1)."""
    seeds = spark.createDataFrame([("3",)], "node_id string")
    prev = set()
    for k in (1, 2, 3):
        cur = set(_ids(follow(follows3.edges, seeds, Any(1, k))))
        assert prev <= cur
        prev = cur


def test_follow_hop_zero_emits_seed(follows3, spark):
    seeds = spark.createDataFrame([("2",)], "node_id string")
    out0 = _ids(follow(follows3.edges, seeds, Any(0, 1)))
    out1 = _ids(follow(follows3.edges, seeds, Any(1, 1)))
    assert "2" in out0
    assert out1 == ["1"]


def test_follow_min_hop_excludes_earlier(follows3, spark):
    """from=2 must not emit hop-1 nodes."""
    seeds = spark.createDataFrame([("3",)], "node_id string")
    out = follow(follows3.edges, seeds, Any(2, 2), with_hop=True).collect()
    assert all(r.hop == 2 for r in out)
    # hop1 = {1,2}; hop2 from 1,2 = {} (1,2 visited) => empty
    assert out == []


def test_follow_label_tree_or(follows3, spark):
    seeds = spark.createDataFrame([("3",)], "node_id string")
    spec = Or(Edge("follows", 1, 1), Edge("nonexistent", 1, 1))
    assert _ids(follow(follows3.edges, seeds, spec)) == ["1", "2"]


def test_multimap_accumulation(follows3):
    """Node 3 carries two follows rows (attribute multimap, §1.1)."""
    n3 = follows3.edges.filter(F.col("src") == "3")
    assert n3.count() == 2


def test_latest_vs_history(spark):
    """FIXTURES.md A5: ts 1<2<3 values a,b,c — latest='c', history=all."""
    rows = [
        prop_row("n", "status", "a", ts=1),
        prop_row("n", "status", "b", ts=2),
        prop_row("n", "status", "c", ts=3),
    ]
    g = PropertyGraph.from_rows(spark, rows)
    latest = g.latest().collect()
    assert len(latest) == 1 and latest[0]["str"] == "c"
    hist = [r["str"] for r in g.history().collect()]
    assert hist == ["a", "b", "c"]


def test_fragment_accumulation(spark):
    """FIXTURES.md A4: m puts to one id accumulate attributes."""
    rows = [prop_row("TESTID", f"property-{i}", str(i)) for i in range(5)]
    g = PropertyGraph.from_rows(spark, rows)
    merged = g.props.filter(F.col("node_id") == "TESTID")
    assert merged.count() == 5
    assert g.latest().filter(F.col("node_id") == "TESTID").count() == 5


def test_follow_frontier_cap_star_graph(spark):
    """Adversarial fan-out guard: a 400-leaf star explodes hop 1; with
    max_frontier=25 the default errors loudly, truncate mode keeps the
    25 lowest node_ids (deterministic) and continues through hop 2."""
    from ekati_spark.graph.traverse import FrontierOverflow

    rows = [("hub", "fan", f"leaf{i:04d}") for i in range(400)]
    # every leaf links onward to one shared sink, so hop 2 exists
    rows += [(f"leaf{i:04d}", "fan", "sink") for i in range(400)]
    edges = spark.createDataFrame(rows, "src string, label string, dst string")
    seeds = spark.createDataFrame([("hub",)], "node_id string")

    with pytest.raises(FrontierOverflow, match="hop 1"):
        follow(edges, seeds, Any(1, 2), max_frontier=25).collect()

    out = follow(
        edges, seeds, Any(1, 2), max_frontier=25, on_overflow="truncate",
        with_hop=True,
    ).collect()
    hop1 = sorted(r.node_id for r in out if r.hop == 1)
    assert hop1 == [f"leaf{i:04d}" for i in range(25)]  # lowest ids kept
    assert [r.node_id for r in out if r.hop == 2] == ["sink"]

    # uncapped the same traversal reaches all 400 leaves
    assert follow(edges, seeds, Any(1, 2)).count() == 401
