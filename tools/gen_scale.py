"""Scale-up generator: derive an sfN-equivalent dataset from the
driver's sf0.1 parquet by key-shifted replication (no hand-synthesized
distributions — every row is a driver row with its keys offset into a
disjoint range, so schemas, value distributions, skew, and FK
integrity are exactly the driver's).

Usage: python tools/gen_scale.py [factor] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /root/repo/.testdata_sf1)

Replication rules:
- region/nation: fixed dimensions, copied once (as in TPC-H, dims
  don't scale with SF).
- fact/entity tables: ``factor`` replicas with every id column shifted
  by replica*OFFSET (OFFSET = 10^ceil(log10(max_id+1)), so replica key
  ranges never collide and FK joins land on the same replica).
- events keep their timestamps (densifying the timeline 10x — the
  conservative choice for window/concurrency queries: MORE rows per
  window, never fewer).
- document text / embeddings are replicated verbatim: dedup operators
  see 10x group sizes (a harder workload than unique rows).

Written with DuckDB (vectorized, no JVM) — regenerating sf1 takes
seconds; the output is ~10x the source bytes.
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ("region", "nation")

# Every id column belongs to an ENTITY key space; all columns of one
# entity shift by the SAME offset so foreign keys keep landing on the
# matching replica (events.user_id joins customer.c_custkey — st04).
ENTITY_COLS: dict[str, list[tuple[str, str]]] = {
    "custkey": [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}
SCALED_TABLES = (
    "customer supplier part orders lineitem events documents embeddings"
).split()


def run(factor: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    # one offset per entity key space = next power of 10 above the max
    # observed anywhere that entity's ids appear
    col_off: dict[tuple[str, str], int] = {}
    for entity, sites in ENTITY_COLS.items():
        mx = max(
            con.sql(
                f"SELECT max({c}) FROM '{src}/{t}.parquet'"
            ).fetchone()[0]
            for t, c in sites
        )
        off = 1
        while off <= mx:
            off *= 10
        for site in sites:
            col_off[site] = off

    for t in SCALED_TABLES:
        cols = con.sql(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").columns
        sel = ", ".join(
            f"{c} + r.i * {col_off[(t, c)]} AS {c}"
            if (t, c) in col_off
            else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' CROSS JOIN "
            f"(SELECT unnest(range({factor})) AS i) r) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        offs = {c: col_off[(t, c)] for c in cols if (t, c) in col_off}
        print(f"{t}: x{factor} -> {n} rows (offsets {offs})")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.testdata_sf1"
    run(factor, src, out)
