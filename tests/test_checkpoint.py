"""Reliable-checkpoint mode (ekati_spark/checkpoint.py): the same
iterative kernels must produce identical results whether lineage is
cut with executor-local blocks (default) or with the reliable
``DataFrame.checkpoint`` path, and the reliable path must actually
write to the configured checkpoint directory (what survives executor
loss on a real cluster — the Spark analog of the reference's FASTER
snapshots, reference: src/serverlib/NodeAttrIndex.cs:66-85)."""

from __future__ import annotations

import os

import pytest

from ekati_spark.checkpoint import (
    MODE_KEY,
    disable_reliable_checkpoints,
    enable_reliable_checkpoints,
)
from ekati_spark.graph.algorithms import connected_components, page_rank
from ekati_spark.graph.traverse import Any, follow


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, "e", d, 0) for s, d in pairs],
        "src string, label string, dst string, ts long",
    )


@pytest.fixture
def reliable(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    enable_reliable_checkpoints(spark, ckdir)
    try:
        yield ckdir
    finally:
        disable_reliable_checkpoints(spark)


def test_pagerank_identical_under_reliable_checkpoint(spark, reliable):
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")])
    rel = {r.node_id: r.rank for r in page_rank(e, iterations=3).collect()}
    disable_reliable_checkpoints(spark)
    loc = {r.node_id: r.rank for r in page_rank(e, iterations=3).collect()}
    assert rel == loc


def test_reliable_checkpoint_writes_to_dir(spark, reliable):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    cc = {r.node_id: r.component for r in connected_components(e).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # the reliable path must have materialized RDD state on disk
    found = []
    for root, _dirs, files in os.walk(reliable):
        found.extend(files)
    assert found, "reliable mode produced no checkpoint files"


def test_follow_identical_under_reliable_checkpoint(spark, reliable):
    e = _edges(
        spark,
        [("s", "a"), ("a", "b"), ("b", "t"), ("s", "x"), ("x", "t")],
    )
    seeds = spark.createDataFrame([("s",)], "node_id string")
    rel = sorted(
        r.node_id for r in follow(e, seeds, Any(1, 3)).collect()
    )
    disable_reliable_checkpoints(spark)
    loc = sorted(
        r.node_id for r in follow(e, seeds, Any(1, 3)).collect()
    )
    assert rel == loc
    assert spark.conf.get(MODE_KEY, "local") == "local"
