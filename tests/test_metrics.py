"""Engine-telemetry surface: stage/executor/per-query metrics are real,
queryable, and move when work runs (SURVEY §2.1 row 10; the reference's
GetMetrics/GetStats RPCs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ekati_spark.metrics import (
    executor_metrics,
    query_metrics,
    run_with_metrics,
    stage_metrics,
)


def test_stage_counters_move_when_a_shuffle_runs(spark):
    # Attribute the delta to NEW stages only: the AppStatusStore retains
    # a bounded stage history, so a whole-store before/after sum can
    # DECREASE when old stages evict mid-test (observed in long suite
    # runs) — the eviction-proof check is shuffle bytes on stages that
    # did not exist before the job.
    last = (
        stage_metrics(spark).agg(F.max("stage_id").alias("m")).first().m
        or -1
    )
    spark.range(0, 200_000).groupBy((F.col("id") % 13).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    new_written = (
        stage_metrics(spark)
        .filter(F.col("stage_id") > last)
        .agg(F.sum("shuffle_write_bytes").alias("b"))
        .first()
        .b
        or 0
    )
    assert new_written > 0

    st = stage_metrics(spark)
    assert st.filter(F.col("num_complete_tasks") > 0).count() > 0
    assert st.filter(F.col("peak_execution_memory") > 0).count() > 0


def test_executor_metrics_present(spark):
    rows = executor_metrics(spark).collect()
    assert len(rows) >= 1
    assert any(r.total_tasks > 0 for r in rows)
    assert all(r.max_memory > 0 for r in rows)


def test_query_metrics_match_actual_output(spark):
    df = spark.range(0, 50_000).groupBy((F.col("id") % 7).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    n, qm = run_with_metrics(df)
    assert n == 7
    m = qm.collect()
    assert len(m) > 10
    # the final aggregate's numOutputRows equals the query's result size
    agg_rows = [
        r.value
        for r in m
        if r.node == "HashAggregate" and r.metric == "numOutputRows"
    ]
    assert n in agg_rows
    # the exchange reports shuffle bytes for a real shuffle
    assert any(
        r.metric == "shuffleBytesWritten" and r.value > 0 for r in m
    )
    # source rows are accounted
    assert any(
        r.node == "Range" and r.metric == "numOutputRows"
        and r.value == 50_000
        for r in m
    )


def test_query_metrics_unexecuted_plan_is_zero(spark):
    df = spark.range(0, 1000).groupBy((F.col("id") % 3).alias("k")).count()
    qm = query_metrics(df)  # not executed: metrics legitimately zero
    assert qm.filter(
        (F.col("metric") == "numOutputRows") & (F.col("value") > 0)
    ).count() == 0


def test_g28_contract(spark, sf_dir):
    from ekati_spark.queries import REGISTRY

    row = REGISTRY["g28_engine_metrics"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.probe_rows >= 1
    assert r.plan_has_metrics
    assert r.plan_counts_probe_rows
    assert r.shuffle_write_nonneg
    assert r.stage_counters_nonneg
    assert r.stages_ge1 and r.executors_ge1 and r.tasks_ge1


def test_observation_metrics_no_second_pass(spark, sf_dir):
    """Observation metrics arrive from the SAME action that produced
    the rows (no second scan) and match an independent aggregate."""
    from pyspark.sql import functions as F

    from ekati_spark.catalog import load_table
    from ekati_spark.metrics import run_with_observation

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 10)
    n, got = run_with_observation(
        li,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )
    expect = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    ).first()
    assert n == got["rows"] == expect["rows"]
    assert got["qty"] == expect["qty"]
