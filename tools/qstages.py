"""Per-stage decomposition of a query's one-shot execution.

For each named registry query: warm the session, snapshot the
AppStatusStore stage list, run the query once through the noop sink
(guide §1.4), and print the NEW stages sorted by executor run time —
the stage-level attribution the wall clock can't show (which stage has
the CPU, how many tasks it got, what it shuffled). Stage history is
bounded, so attribution uses stage_id > max-before (the test_metrics
precedent).

Usage: python tools/qstages.py [sf_dir] query [query...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ekati_spark.session import get_spark
    from ekati_spark.metrics import stage_metrics
    import ekati_spark.queries as Q

    spark = get_spark("ekati_qstages")
    Q.REGISTRY["r01_scan_count"].fn(spark, sf_dir).collect()

    for name in args:
        # the status store registers stages ASYNCHRONOUSLY: snapshot
        # too early and the warm-up's own stages leak past the HWM
        # into the query's attribution (observed: r01's 32-task scan
        # charged to the profiled query) — settle first
        time.sleep(1.0)
        before = [r["stage_id"] for r in stage_metrics(spark).collect()]
        hwm = max(before) if before else -1
        spark.sparkContext.setJobDescription(f"qstages:{name}")
        t0 = time.monotonic()
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        t1 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        rows = [
            r
            for r in stage_metrics(spark).collect()
            if r["stage_id"] > hwm
        ]
        tot_rt = sum(r["executor_run_time_ms"] for r in rows)
        print(
            f"== {name}: build={t1 - t0:.3f}s action={t2 - t1:.3f}s "
            f"stages={len(rows)} exec_cpu={tot_rt / 1000:.1f}s"
        )
        for r in sorted(
            rows, key=lambda r: -r["executor_run_time_ms"]
        )[:12]:
            print(
                f"  stage={r['stage_id']:4d} tasks={r['num_tasks']:4d} "
                f"rt_ms={r['executor_run_time_ms']:7d} "
                f"in={r['input_records']:9d} "
                f"shR={r['shuffle_read_records']:9d} "
                f"shW={r['shuffle_write_records']:9d} "
                f"spill={r['disk_spilled_bytes']:6d}"
            )


if __name__ == "__main__":
    main()
