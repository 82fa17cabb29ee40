"""Graph-analytics kernels (Pregel-style DataFrame iteration,
ekati_spark/graph/algorithms.py) on hand-built toy graphs with
closed-form expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ekati_spark.graph.algorithms import (
    connected_components,
    page_rank,
    shortest_hops,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, "e", d, 0) for s, d in pairs],
        "src string, label string, dst string, ts long",
    )


def test_pagerank_star(spark):
    """Star a,b,c -> hub: hub collects damped rank; leaves keep base."""
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    pr = {r.node_id: r.rank for r in page_rank(e, iterations=1).collect()}
    n = 4
    base = 0.15 / n
    assert pr["a"] == pytest.approx(base)
    assert pr["hub"] == pytest.approx(base + 0.85 * 3 * (1 / n))
    # total mass = 1 minus the leak from the dangling hub
    assert sum(pr.values()) == pytest.approx(base * 4 + 0.85 * 3 / n)


def test_pagerank_cycle_uniform(spark):
    """On a cycle every node keeps exactly 1/n at every iteration."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    pr = {r.node_id: r.rank for r in page_rank(e, iterations=4).collect()}
    for v in pr.values():
        assert v == pytest.approx(1 / 3)


def test_connected_components_two_islands(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    cc = {r.node_id: r.component for r in connected_components(e).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_chain_converges(spark):
    """A 6-node chain needs several propagation rounds; early-exit on
    convergence must still reach the global min label."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    e = _edges(spark, chain)
    cc = {r.node_id: r.component for r in connected_components(e).collect()}
    assert set(cc.values()) == {"n0"}


def test_shortest_hops_min_over_paths(spark):
    """d is reachable in 1 (a->d) and in 2 (a->b->d): BFS must report 1."""
    e = _edges(spark, [("a", "b"), ("b", "d"), ("a", "d"), ("d", "z")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    hops = {r.node_id: r.hops for r in shortest_hops(e, seeds, 3).collect()}
    assert hops == {"a": 0, "b": 1, "d": 1, "z": 2}


def test_shortest_hops_frontier_exhaustion(spark):
    """Loop exits when the frontier empties before max_hops."""
    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",)], "node_id string")
    hops = {r.node_id: r.hops for r in shortest_hops(e, seeds, 10).collect()}
    assert hops == {"a": 0, "b": 1}
