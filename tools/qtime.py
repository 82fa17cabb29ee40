"""Isolated per-query timing via the noop sink (guide §1.4).

Builds each named registry query fresh and times `write.format("noop")`
N times (default 3), printing every run plus min/median — min-of-N is
the unthrottled estimate under this box's bursty throttling windows
(OPTIMIZATION_r15.md "Measurement caveat"). Jobs are labelled so the
UI/event-log attributes them (guide §1.5).

Usage: python tools/qtime.py [--n N] [sf_dir] query [query...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "--n":
        n = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ekati_spark.session import get_spark
    import ekati_spark.queries as Q

    spark = get_spark("ekati_qtime")
    # Same warm-up as bench.py so timings are comparable.
    Q.REGISTRY["r01_scan_count"].fn(spark, sf_dir).collect()
    from ekati_spark.queries.graph import _graph

    _graph(spark, sf_dir).edges.count()

    for name in names:
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{i}")
            t0 = time.monotonic()
            df = Q.REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: runs={['%.3f' % r for r in runs]} "
            f"min={min(runs):.3f} median={statistics.median(runs):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
