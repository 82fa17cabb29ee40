"""Cross-engine column-TYPE audit for every oracle-checked query.

The value-hash compare canonicalizes values, so an INTEGER-vs-BIGINT (or
SUM->HUGEINT) divergence passes the hash but can still fail a strict
schema compare. This audit runs each query's Spark plan (analysis only,
no collect) and its DuckDB oracle, maps both type systems onto a common
vocabulary, and prints any column whose widths disagree.

timestamp vs timestamp_ntz is reported but usually benign: DuckDB
TIMESTAMP is ntz by definition, and parquet TIMESTAMP(isAdjustedToUTC=
false) columns read as ntz on the Spark side — the values hash the same
under the UTC session.

Usage: python tools/audit_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_SPARK = {
    "int": "i32",
    "integer": "i32",
    "bigint": "i64",
    "long": "i64",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp_ntz": "ts_ntz",
    "date": "date",
}
_DUCK = {
    "integer": "i32",
    "bigint": "i64",
    "hugeint": "i128",
    "double": "f64",
    "float": "f32",
    "varchar": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp with time zone": "ts_tz",
    "date": "date",
}


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            stypes = {
                c: _SPARK.get(t.lower(), t.lower())
                for c, t in qs[name](spark, sf).dtypes
            }
            rel = con.sql(sql)
            dtypes = {
                c: _DUCK.get(str(t).lower(), str(t).lower())
                for c, t in zip(rel.columns, rel.types)
            }
            diffs = {
                c: (stypes.get(c), dtypes.get(c))
                for c in set(stypes) | set(dtypes)
                if stypes.get(c) != dtypes.get(c)
            }
            if diffs:
                bad += 1
                print(f"MISMATCH {name}: {diffs}")
        except Exception as e:  # noqa: BLE001 — report and keep auditing
            bad += 1
            print(f"ERROR {name}: {str(e)[:160]}")
    print(f"{len(oracles) - bad} clean, {bad} mismatched/errored")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
