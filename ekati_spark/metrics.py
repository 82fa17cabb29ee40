"""Queryable engine-telemetry surface (the reference's Metrics/Stats API
re-expressed Spark-natively).

The reference exposes an App.Metrics registry over RPC — process gauges
plus per-component meters/timers (GetMetrics/GetStats/ListStats,
/root/reference/src/core/Metrics.fs:1-357, types.proto:235-238). Spark
already *collects* the equivalent telemetry (task, shuffle, spill, and
memory counters in the AppStatusStore; per-operator SQLMetrics on every
executed plan); this module makes it queryable as DataFrames so a user
can join, filter, and aggregate engine counters like any other table:

- ``stage_metrics``     one row per stage: task counts, run time, I/O,
                        shuffle read/write, spill, peak execution memory
                        (the FileStore/Partition meter-timer analog)
- ``executor_metrics``  one row per executor: the process-gauge analog
                        (memory used, task totals, shuffle totals)
- ``query_metrics``     one row per (plan node, SQLMetric) of a single
                        executed DataFrame — per-QUERY telemetry the
                        reference only had per-process

Scale note: these read driver-side control-plane state (status store /
plan tree), never executor data; result sizes are O(stages), O(execs),
O(plan nodes). ``createDataFrame`` over them is control-plane work by
construction. On a 1000-executor cluster the same calls serve the
cluster-wide registry view the Spark UI renders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAGE_SCHEMA = (
    "stage_id int, attempt int, name string, status string, "
    "num_tasks int, num_complete_tasks int, executor_run_time_ms long, "
    "input_bytes long, input_records long, "
    "shuffle_read_bytes long, shuffle_read_records long, "
    "shuffle_write_bytes long, shuffle_write_records long, "
    "memory_spilled_bytes long, disk_spilled_bytes long, "
    "peak_execution_memory long"
)

EXECUTOR_SCHEMA = (
    "executor_id string, is_active boolean, total_cores int, "
    "total_tasks int, failed_tasks int, total_duration_ms long, "
    "total_input_bytes long, total_shuffle_read long, "
    "total_shuffle_write long, memory_used long, max_memory long"
)

QUERY_METRIC_SCHEMA = "node_id long, node string, metric string, value long"

# Generous row ceiling for control-plane probes executed driver-side
# (run_with_metrics / run_with_observation): far above any telemetry
# probe's result, far below a data-plane frame at 100 TB.
CONTROL_PLANE_BOUND = 1_000_000


def stage_metrics(spark: SparkSession) -> DataFrame:
    """All stages the engine has run this session, as a DataFrame.

    Reads AppStatusStore.stageList (the store behind the Spark UI and
    the /api/v1/stages REST endpoint) via the JVM gateway; the
    ``$default$`` accessors supply the Scala default arguments, so the
    call tracks the method's real signature."""
    store = spark.sparkContext._jsc.sc().statusStore()
    defaults = [
        getattr(store, f"stageList$default${i}")() for i in range(2, 6)
    ]
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    stages = store.stageList(empty, *defaults)
    rows = []
    for i in range(stages.size()):
        s = stages.apply(i)
        rows.append(
            (
                s.stageId(),
                s.attemptId(),
                s.name(),
                str(s.status()),
                s.numTasks(),
                s.numCompleteTasks(),
                s.executorRunTime(),
                s.inputBytes(),
                s.inputRecords(),
                s.shuffleReadBytes(),
                s.shuffleReadRecords(),
                s.shuffleWriteBytes(),
                s.shuffleWriteRecords(),
                s.memoryBytesSpilled(),
                s.diskBytesSpilled(),
                s.peakExecutionMemory(),
            )
        )
    return spark.createDataFrame(rows, STAGE_SCHEMA)


def executor_metrics(spark: SparkSession) -> DataFrame:
    """One row per executor (driver included in local mode) — the
    process-gauge analog of the reference's Process context."""
    store = spark.sparkContext._jsc.sc().statusStore()
    ex = store.executorList(False)
    rows = []
    for i in range(ex.size()):
        e = ex.apply(i)
        rows.append(
            (
                e.id(),
                e.isActive(),
                e.totalCores(),
                e.totalTasks(),
                e.failedTasks(),
                e.totalDuration(),
                e.totalInputBytes(),
                e.totalShuffleRead(),
                e.totalShuffleWrite(),
                e.memoryUsed(),
                e.maxMemory(),
            )
        )
    return spark.createDataFrame(rows, EXECUTOR_SCHEMA)


def _walk_plan(node, out: list) -> list:
    cls = node.getClass().getSimpleName()
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out.append((node.id(), node.nodeName(), kv._1(), kv._2().value()))
    # AQE wraps the physical tree in query stages whose subtrees are not
    # children(): descend explicitly (executedPlan / plan), same shape
    # the Spark UI's SQL tab renders
    if cls == "AdaptiveSparkPlanExec":
        _walk_plan(node.executedPlan(), out)
    elif cls.endswith("QueryStageExec"):
        _walk_plan(node.plan(), out)
    ch = node.children()
    for i in range(ch.size()):
        _walk_plan(ch.apply(i), out)
    return out


def query_metrics(df: DataFrame) -> DataFrame:
    """Per-plan-node SQLMetrics of ``df``'s (already executed) physical
    plan: (node_id, node, metric, value) rows — per-query telemetry
    (rows produced, shuffle bytes, spill, peak memory, codegen pipeline
    time) addressable by operator. Execute the DataFrame first; metrics
    on an unexecuted plan are legitimately zero."""
    spark = df.sparkSession
    rows = _walk_plan(df._jdf.queryExecution().executedPlan(), [])
    return spark.createDataFrame(rows, QUERY_METRIC_SCHEMA)


def run_with_metrics(df: DataFrame) -> tuple[int, DataFrame]:
    """Execute ``df`` to completion and return (row_count, its
    per-operator metrics frame).

    Executes ``df``'s own plan deliberately: ``df.count()`` builds a
    SEPARATE query execution (an added aggregate), leaving the walked
    plan's SQLMetrics at zero. Meant for control-plane probes whose
    results are small — the bound is executable
    (``driverside.count_bounded_exec`` streams the result and fails
    loudly past ``CONTROL_PLANE_BOUND`` rows instead of materializing
    it); for a large result, write it to a sink and call
    ``query_metrics(df)`` on the same DataFrame afterwards."""
    from ekati_spark.driverside import count_bounded_exec

    n = count_bounded_exec(df, CONTROL_PLANE_BOUND, "run_with_metrics")
    return n, query_metrics(df)


def run_with_observation(df, *metric_cols, name: str = "obs"):
    """Execute ``df`` with an attached Observation (Spark's
    zero-extra-pass accumulator channel: metric expressions evaluate
    inline DURING the action, unlike a separate .agg() job) and return
    (row_count, observed-metrics dict). The per-query counterpart of
    the AppStatusStore surfaces above — use it when a pipeline wants
    its own domain metrics (rows kept, bytes after filter, null count)
    without a second scan at 100 TB.

    ``metric_cols`` are aggregate Columns, e.g.
    ``F.count(F.lit(1)).alias("rows"), F.sum("value").alias("total")``.

    Driver-side contract: the action is ``count()`` — the observe node
    rides the SAME plan (unlike ``run_with_metrics``' SQLMetrics walk,
    an Observation doesn't care which action drives the execution, but
    it DOES need one single completed action to resolve its listener
    event — a streamed ``toLocalIterator`` never fires it), so the
    observed metrics cover every row while the driver materializes one
    scalar, at any result size."""
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *metric_cols)
    n = out.count()
    return n, obs.get
