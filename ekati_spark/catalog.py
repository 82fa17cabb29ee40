"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md / FIXTURES.md §B): region nation customer supplier
part orders lineitem events documents embeddings — one parquet each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

``load_tables`` returns plain DataFrames (scans stay declarative so
Catalyst gets pushdown/pruning); ``register_views`` additionally creates
temp views so operators can be expressed in SQL where clearer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ekati_spark.session import default_parallelism

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every query depends on, applied idempotently —
    the driver builds its own SparkSession, so we can't rely on the session
    factory having run (verified failure mode: events' TIMESTAMP(NANOS)
    scan aborts without nanosAsLong)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # perf confs (also runtime-settable): a plain session defaults to 200
    # shuffle partitions — pure task overhead at test scale; AQE coalesce
    # right-sizes them upward-compatibly at real scale.
    n = default_parallelism()
    if int(spark.conf.get("spark.sql.shuffle.partitions")) > 4 * n:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


# DataFrame handles are reusable within a session; re-calling
# spark.read.parquet re-lists files and re-reads footers for schema
# (~0.3 s/table), which multiplies across the many load_table calls a
# single query makes. Keyed by applicationId (stable per live session,
# fresh after a restart — unlike id(spark), which the allocator can
# reuse and hand a stale handle of a stopped session).
_table_cache: dict[tuple[str, str, str], DataFrame] = {}


def session_key(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType regardless of how the parquet
    stores it. Generated testdata has shipped both TIMESTAMP(NANOS) (read
    as long nanos under spark.sql.legacy.parquet.nanosAsLong) and
    timestamp[us] (read as timestamp_ntz) — branch on the observed dtype
    instead of assuming either:

    - bigint        → nanos; truncate to micros with integer division
                      (double division loses precision above 2^53 ns) —
                      the same truncation DuckDB applies to TIMESTAMP_NS.
    - timestamp_ntz → value-preserving cast (session timeZone is UTC).
    - timestamp     → already normalized.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype is not None and dtype != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (session_key(spark), sf_dir, name)
    hit = _table_cache.get(key)
    if hit is not None:
        return hit
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    _table_cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
