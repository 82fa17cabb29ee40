"""Lineage-cut policy for iterative kernels (PageRank, BFS, star-CC,
k-means, k-truss, ...).

Every driver-side loop in this repo must cut lineage once per round —
otherwise the lazy plan re-derives the whole iteration history each
round and the optimizer DAG grows without bound. Two modes:

- ``local`` (default): ``DataFrame.localCheckpoint`` — executor-local
  block storage, zero HDFS round-trip, the right call on a healthy
  cluster and in local[] testing. NOT replicated: on a real
  1000-executor cluster a lost executor mid-iteration loses the blocks
  it held, and because localCheckpoint also TRUNCATES lineage, the
  job cannot recompute them — the query fails and restarts from zero.
- ``reliable``: ``DataFrame.checkpoint`` — writes the per-round state
  to the SparkContext checkpoint directory (HDFS/S3/DBFS on a
  cluster). Survives executor loss; costs one distributed-FS write of
  the O(|V|) state per round. The Spark analog of the reference's
  FASTER durable snapshots (reference:
  src/serverlib/NodeAttrIndex.cs:66-85 — index state checkpointed so
  a restarted node resumes instead of re-ingesting).

Switch at the session level, no per-call-site changes:

    from ekati_spark.checkpoint import enable_reliable_checkpoints
    enable_reliable_checkpoints(spark, "hdfs:///checkpoints/ekati")

Rule of thumb at 100 TB: iteration state is O(|V|) (a few GB for a
billion nodes) while one PageRank round over the edge table costs
minutes — the reliable write is cheap insurance once expected
executor-loss-per-job is non-trivial. Keep ``local`` for short loops
on small state where a rare restart is cheaper than N round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MODE_KEY = "spark.ekati.checkpoint.mode"


def enable_reliable_checkpoints(spark: SparkSession, checkpoint_dir: str):
    """Route every subsequent ``cut_lineage`` through reliable
    ``DataFrame.checkpoint`` against ``checkpoint_dir``."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.conf.set(MODE_KEY, "reliable")


def disable_reliable_checkpoints(spark: SparkSession):
    spark.conf.set(MODE_KEY, "local")


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eager lineage cut under the session's checkpoint mode.

    Used as ``df.transform(cut_lineage)`` so call sites keep method
    chaining. Eager because every caller immediately consumes the
    result ≥2 times — materializing now is the point.
    """
    return _cut(df, eager=True)


def cut_lineage_lazy(df: DataFrame) -> DataFrame:
    """Lazy variant: plan the cut, materialize on first action (for
    results that may be consumed zero times on some branches)."""
    return _cut(df, eager=False)


def _cut(df: DataFrame, eager: bool) -> DataFrame:
    mode = df.sparkSession.conf.get(MODE_KEY, "local")
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
