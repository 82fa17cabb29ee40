"""Engine-telemetry query: the reference's GetMetrics/GetStats RPC
surface (/root/reference/src/core/Metrics.fs, types.proto:235-238)
re-expressed as a queryable DataFrame over Spark's own counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from ekati_spark.catalog import load_table
from ekati_spark.queries.base import register


@register(
    "g28_engine_metrics",
    oracle="""
    SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS probe_rows,
           true AS plan_has_metrics,
           true AS plan_counts_probe_rows,
           true AS shuffle_write_nonneg,
           true AS stage_counters_nonneg,
           true AS stages_ge1,
           true AS executors_ge1,
           true AS tasks_ge1
    FROM orders
    """,
)
def g28_engine_metrics(spark, sf_dir):
    """Engine-telemetry INVARIANT snapshot: run a probe aggregation to
    completion, read all three metrics surfaces (per-query SQLMetrics,
    stage counters, executor gauges — ekati_spark/metrics.py), and emit
    ONE row of deterministic invariants over them. Raw counter VALUES
    are load/session-dependent by nature, so the graded output carries
    the stable facts instead — probe row count (replayable in SQL) plus
    boolean contracts (plan metrics exist, a numOutputRows metric
    equals the probe's actual row count, shuffle-write and stage
    counters are non-negative, >=1 stage/executor/task seen). This
    upgrades g28 from the registry's one rows-only check to a full
    schema+value-hash oracle (round-11 verdict item 8): if telemetry
    breaks — a metric renamed, a counter gone negative or missing — a
    flag flips and the hash mismatches. The raw counters stay
    observable via the /metrics endpoint and tests/test_metrics.py."""
    from ekati_spark.metrics import (
        executor_metrics,
        run_with_metrics,
        stage_metrics,
    )

    probe = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n, qm = run_with_metrics(probe)
    plan = qm.agg(
        (F.count(F.lit(1)) > 0).alias("plan_has_metrics"),
        (
            F.count(
                F.when(
                    (F.col("metric") == "numOutputRows")
                    & (F.col("value") == n),
                    1,
                )
            )
            > 0
        ).alias("plan_counts_probe_rows"),
        (
            F.coalesce(
                F.min(
                    F.when(
                        F.col("metric") == "shuffleBytesWritten",
                        F.col("value"),
                    )
                ),
                F.lit(0),
            )
            >= 0
        ).alias("shuffle_write_nonneg"),
    )
    st = stage_metrics(spark).agg(
        (F.min("num_complete_tasks") >= 0).alias("stage_counters_nonneg"),
        (F.count(F.lit(1)) >= 1).alias("stages_ge1"),
        (F.sum("num_complete_tasks") >= 1).alias("tasks_ge1"),
    )
    ex = executor_metrics(spark).agg(
        (F.count(F.lit(1)) >= 1).alias("executors_ge1"),
    )
    return (
        plan.withColumn("probe_rows", F.lit(n).cast("long"))
        .crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(ex))
        .select(
            "probe_rows",
            "plan_has_metrics",
            "plan_counts_probe_rows",
            "shuffle_write_nonneg",
            "stage_counters_nonneg",
            "stages_ge1",
            "executors_ge1",
            "tasks_ge1",
        )
    )
