"""Table-maintenance operations for parquet layouts: small-file
compaction and layout stats.

At 100 TB the dominant silent cost of an append-heavy table (streaming
sinks, micro-batch ingest, the reference's fragment appends —
`src/core/Program.fs` write path) is file-count explosion: every scan
pays per-file open/footer costs and the driver pays listing time. The
fix is periodic bin-packing compaction — what Delta OPTIMIZE / Iceberg
rewrite_data_files do — expressed here with plain Spark so it works on
any parquet directory.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def layout_stats(path: str) -> dict:
    """File-count / byte statistics for a parquet directory (driver-side
    listing — the same listing a scan would do)."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_bytes": total // len(sizes) if sizes else 0,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Bin-pack a parquet directory into ~``target_file_bytes`` files.

    File count is derived from the CURRENT on-disk bytes (compressed),
    so the output files land near the target regardless of row width.
    With ``sort_cols`` the rewrite range-partitions + sorts on those
    columns — clustering that gives scans min/max-pruning on the sort
    key (the poor man's Z-order for a single key prefix). Without, a
    plain ``coalesce`` avoids any shuffle (pure file-stitching).

    Writes to ``dst_path`` (copy-compact): an atomic swap is a rename at
    the table-catalog layer; compacting in place over the source of a
    live reader is the caller's transaction problem (Delta/Iceberg solve
    exactly that — documented deliberate scope cut).
    """
    stats = layout_stats(src_path)
    n_files = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(dst_path)
    return {"before": stats, "after": layout_stats(dst_path)}


def zorder_compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> dict:
    """Multi-column clustered rewrite on a Morton (Z-order) curve — what
    Delta ``OPTIMIZE ZORDER BY`` does, with plain Spark: quantize each
    cluster column to ``bits`` bits, interleave the bits into one
    z-value, and range-partition + sort the rewrite on it. Unlike
    ``compact(sort_cols=...)`` (which clusters only a prefix), every
    z-ordered file covers a small hyper-rectangle in ALL ``cols``, so
    parquet row-group min/max stats prune scans filtered on ANY of them.

    Quantization is linear between the observed min/max (one tiny
    2-aggregate job, broadcast as literals). Heavily skewed columns
    would under-use the low quantization levels — for those, rank-based
    quantization (approxQuantile boundaries folded into a CASE ladder)
    slots in at the same place; linear is the right default for the
    id/date/numeric-measure columns z-ordering is typically asked for.
    The z-value itself is a pure bitwise expression (shift/or), fully
    inside whole-stage codegen; total extra cost over a plain sorted
    rewrite is one scan-local projection.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit in a signed int64")
    stats = layout_stats(src_path)
    n_files = max(1, math.ceil(stats["total_bytes"] / target_file_bytes))
    df: DataFrame = spark.read.parquet(src_path)
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    levels = (1 << bits) - 1
    qcols = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(levels),
            F.floor(
                (F.col(c).cast("double") - F.lit(mn))
                / F.lit(span)
                * F.lit(float(levels + 1))
            ).cast("bigint"),
        )
        qcols.append(F.greatest(F.lit(0), q))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, q in enumerate(qcols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + i,
                )
            )
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").parquet(dst_path)
    return {"before": stats, "after": layout_stats(dst_path)}
