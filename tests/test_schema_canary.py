"""Schema-drift canary (VERDICT r2 #2).

The driver regenerates /root/testdata between rounds; round 2 proved a
silent dtype change (events.ts TIMESTAMP(NANOS) -> timestamp[us]) can
break every query touching a table. This canary loads every table through
``load_table`` from every sf dir present and pins the post-load dtypes the
query inventory relies on, so drift fails loudly in pytest instead of in
the graded run.
"""

from __future__ import annotations

import os

import pytest

from ekati_spark.catalog import TABLES, load_table, normalize_events_ts

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# Dtypes the inventory depends on (not the raw file schema — what
# load_table hands to queries). Columns not listed are unconstrained.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int", "n_name": "string"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # normalize_events_ts output, whatever the file stores
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_post_load_dtypes(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED[table].items():
        assert col in dtypes, f"{sf_dir}/{table}: missing column {col}"
        assert dtypes[col] == want, (
            f"{sf_dir}/{table}.{col}: dtype drifted to {dtypes[col]!r} "
            f"(queries assume {want!r}) — fix catalog.load_table normalization"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_dim_contract(spark, sf_dir):
    """The l07 oracle inlines 64-dim hyperplanes as SQL literals and l06/
    l05/l15 unroll 64-element dot products — a drifted embedding dim
    must fail HERE with a clear message, not as a deep hash mismatch."""
    from pyspark.sql import functions as F

    dims = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert {r.d for r in dims} == {64}, (
        f"{sf_dir}: embedding dim drifted to {sorted(r.d for r in dims)} "
        "— regenerate l07's hyperplane literals (queries/llm.py::_l07_oracle "
        "dim constant) and re-verify the similarity queries"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_values_sane(spark, sf_dir):
    """ts values must land in the generator's era regardless of storage
    dtype — catches a wrong nanos/micros branch (values 1000x off land
    centuries away), not just a wrong declared type."""
    import datetime as dt

    row = load_table(spark, sf_dir, "events").selectExpr(
        "min(ts) AS lo", "max(ts) AS hi"
    ).first()
    assert row.lo.year >= 1990, f"{sf_dir}: min ts {row.lo} — unit mis-scaled?"
    assert row.hi.year <= 2100, f"{sf_dir}: max ts {row.hi} — unit mis-scaled?"
    assert row.lo <= row.hi
    assert isinstance(row.lo, dt.datetime)


def test_normalize_events_ts_bigint_nanos(spark):
    """The legacy long-nanos shape still normalizes (integer division)."""
    df = spark.createDataFrame(
        [(1, 1_600_000_000_123_456_789)], "event_id bigint, ts bigint"
    )
    out = normalize_events_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    val = out.first().ts
    assert val.year == 2020 and val.microsecond == 123456


def test_normalize_events_ts_passthrough(spark):
    """timestamp input is returned untouched (no extra projection)."""
    df = spark.createDataFrame(
        [(1, "2020-09-13 12:26:40")], "event_id bigint, ts string"
    ).selectExpr("event_id", "cast(ts as timestamp) AS ts")
    out = normalize_events_ts(df)
    assert out is df


def test_graded_first_window_is_complete():
    """The driver grades the first 50 registered queries: the curated
    list must name exactly 50 real entries (import stays defensive —
    this test is where a drifted name fails loudly). Rows-only entries
    (non-SQL-expressible ops, driver records a weaker check) are pinned
    explicitly so one can't slip into the window unnoticed."""
    from ekati_spark.queries import REGISTRY, oracle_sql
    from ekati_spark.queries import _GRADED_FIRST

    assert len(_GRADED_FIRST) == 50
    missing = [n for n in _GRADED_FIRST if n not in REGISTRY]
    assert not missing, missing
    assert list(REGISTRY)[:50] == _GRADED_FIRST
    rows_only = sorted(n for n in _GRADED_FIRST if n not in oracle_sql())
    # g28 (the registry's one documented rows-only query) received its
    # driver row in CORRECTNESS_r10; the round-11 window is all
    # oracle-backed, so nothing may be rows-only in it.
    assert rows_only == [], rows_only


def test_graded_first_window_matches_artifact_record():
    """_GRADED_FIRST is derived, not hand-curated: it must equal the
    window tools/rotate_window.py computes from the committed
    CORRECTNESS/JUDGE artifacts (sentinels + never-attested +
    least-recently-attested fillers), so the list can't drift from the
    attestation record."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotate_window",
        os.path.join(os.path.dirname(__file__), "..", "tools", "rotate_window.py"),
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)

    import ekati_spark.queries as q

    names = [n for n in q.REGISTRY if n not in set(q._POST_WINDOW)]
    derived = rw.derive_window(names, rw.attestation_record())
    assert q._GRADED_FIRST == derived
