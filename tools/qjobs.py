"""Per-invocation Spark JOB count for a registry query (driver
orchestration profile).

The l127b/l108b serve paths are latency-bound at bench SF: wall clock
is ~N sequential driver-orchestrated jobs, not executor compute
(PERF_r15 8c/32c ratios 0.48 / 0.72). This tool measures N directly:
run the query once cold (store/index builds land there), then M warm
invocations each under a fresh job group, and count the group's jobs
plus their stage/task totals via the status tracker.

Usage: python tools/qjobs.py [--n M] [sf_dir] query [query...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    m = 3
    if args and args[0] == "--n":
        m = int(args[1])
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

    spark = get_spark("ekati_qjobs")
    sc = spark.sparkContext
    Q.REGISTRY["r01_scan_count"].fn(spark, sf_dir).collect()

    for name in names:
        fn = Q.REGISTRY[name].fn
        # cold run: session-keyed store/index builds land here so the
        # warm runs measure the serve path (the bench-median shape)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        print(f"{name} cold: {time.perf_counter() - t0:.3f}s")
        for i in range(m):
            group = f"qjobs_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            time.sleep(0.5)  # status store updates asynchronously
            st = sc.statusTracker()
            jids = sorted(st.getJobIdsForGroup(group))
            n_stages = n_tasks = 0
            one_task_jobs = 0
            for j in jids:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                jt = 0
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si is None:
                        continue
                    # skipped stages report 0 active/completed work
                    n_stages += 1
                    jt += si.numTasks
                n_tasks += jt
                if jt <= 1:
                    one_task_jobs += 1
            print(
                f"{name} warm{i}: {wall:.3f}s jobs={len(jids)} "
                f"(single-task-ish={one_task_jobs}) stages={n_stages} "
                f"tasks={n_tasks}"
            )


if __name__ == "__main__":
    main()
