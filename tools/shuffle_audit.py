"""Per-query shuffle/spill audit of the headline bench set.

For each bench.HEADLINE query, snapshot the engine's stage store
(ekati_spark.metrics.stage_metrics — the AppStatusStore behind the
Spark UI) before and after one full execution and attribute the delta:
shuffle bytes written/read, records shuffled, bytes spilled, and peak
single-stage execution memory. This is the scale evidence the wall
clock can't show: a query that is fast at sf0.1 but shuffles its whole
input is a 100 TB hazard; one whose shuffle is a small multiple of its
*output* is not.

Usage: python tools/shuffle_audit.py [sf_dir] [prefix...]
Prints a markdown table (paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys


def human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} TiB"


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    prefixes = tuple(sys.argv[2:])

    from bench import HEADLINE
    from ekati_spark.session import get_spark
    import ekati_spark.queries as Q

    spark = get_spark("ekati_shuffle_audit")
    store = spark.sparkContext._jsc.sc().statusStore()

    def snapshot() -> dict[int, tuple]:
        defaults = [
            getattr(store, f"stageList$default${i}")() for i in range(2, 6)
        ]
        empty = spark.sparkContext._jvm.java.util.ArrayList()
        stages = store.stageList(empty, *defaults)
        out = {}
        for i in range(stages.size()):
            s = stages.apply(i)
            out[(s.stageId(), s.attemptId())] = (
                s.inputBytes(),
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
                s.shuffleWriteRecords(),
                s.memoryBytesSpilled() + s.diskBytesSpilled(),
                s.peakExecutionMemory(),
            )
        return out

    # warm-up (mirrors bench.py: session + FK edge table)
    Q.REGISTRY["r01_scan_count"].fn(spark, sf_dir).collect()
    from ekati_spark.queries.graph import _graph

    _graph(spark, sf_dir).edges.count()

    names = [n for n in HEADLINE if not prefixes or n.startswith(prefixes)]
    if prefixes and not names:
        # prefixes naming non-headline queries: audit from the registry
        # (any registered query is auditable; HEADLINE is the default
        # set, not a limit of the instrumentation)
        names = [n for n in Q.REGISTRY if n.startswith(prefixes)]
    rows = []
    for name in names:
        before = snapshot()
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        n_out = len(df.collect())
        after = snapshot()
        delta = [
            tuple(a - b for a, b in zip(after[k], before.get(k, (0,) * 6)))
            for k in after
            if k not in before or after[k] != before[k]
        ]
        agg = [sum(d[i] for d in delta) for i in range(5)]
        peak = max((after[k][5] for k in after if k not in before), default=0)
        rows.append((name, n_out, *agg, peak))
        print(
            f"{name:32s} out={n_out:>8d} input={human(rows[-1][2]):>10s} "
            f"shW={human(rows[-1][4]):>10s} shRec={rows[-1][5]:>9d} "
            f"spill={human(rows[-1][6]):>8s} peak={human(peak):>10s}",
            file=sys.stderr,
        )

    print("\n| query | out rows | input | shuffle write | shuffle rec | spill | peak stage mem |")
    print("|---|---|---|---|---|---|---|")
    for name, n_out, inp, shr, shw, rec, spill, peak in rows:
        print(
            f"| {name} | {n_out} | {human(inp)} | {human(shw)} | {rec} "
            f"| {human(spill)} | {human(peak)} |"
        )
    total = [sum(r[i] for r in rows) for i in (2, 4, 5, 6)]
    print(
        json.dumps(
            {
                "metric": "headline_shuffle_audit",
                "sf_dir": sf_dir,
                "queries": len(rows),
                "input_bytes": total[0],
                "shuffle_write_bytes": total[1],
                "shuffle_write_records": total[2],
                "spill_bytes": total[3],
            }
        )
    )


if __name__ == "__main__":
    main()
