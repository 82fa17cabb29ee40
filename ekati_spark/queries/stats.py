"""Engine-telemetry query: the reference's GetMetrics/GetStats RPC
surface (/root/reference/src/core/Metrics.fs, types.proto:235-238)
re-expressed as a queryable DataFrame over Spark's own counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from ekati_spark.catalog import load_table
from ekati_spark.queries.base import register


@register("g28_engine_metrics")
def g28_engine_metrics(spark, sf_dir):
    """Engine-telemetry snapshot: run a probe aggregation to completion,
    then read all three metrics surfaces (per-query SQLMetrics, stage
    counters, executor gauges — ekati_spark/metrics.py) and emit ONE
    summary row. Rows-only check (counter values are load- and
    session-dependent by nature; the row count — 1 — is the contract);
    tests/test_metrics.py asserts the semantics: counters exist, move
    when a shuffle runs, and per-plan numOutputRows matches the probe's
    actual row count."""
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
        F.count(F.lit(1)).alias("plan_metric_rows"),
        F.sum(F.when(F.col("metric") == "shuffleBytesWritten", F.col("value")))
        .alias("shuffle_write_bytes"),
        F.max(F.when(F.col("metric") == "peakMemory", F.col("value")))
        .alias("peak_memory"),
    )
    st = stage_metrics(spark).agg(
        F.count(F.lit(1)).alias("stages_seen"),
        F.sum("num_complete_tasks").alias("tasks_completed"),
    )
    ex = executor_metrics(spark).agg(
        F.count(F.lit(1)).alias("executors"),
        F.sum("total_tasks").alias("executor_tasks"),
    )
    return (
        plan.withColumn("probe_rows", F.lit(n).cast("long"))
        .crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(ex))
        .select(
            "probe_rows",
            "plan_metric_rows",
            "shuffle_write_bytes",
            "peak_memory",
            "stages_seen",
            "tasks_completed",
            "executors",
            "executor_tasks",
        )
    )
