"""Run N full bench.py cycles and combine per-query medians.

The r12 protocol behind BENCH_LOCAL_r*: each cycle is one bench.py
invocation (its own JVM, median-of-3/5 per query internally); the
combined map takes the per-query MEDIAN across cycles from the
stderr `# name: median Xs of [...]` lines, so one throttle window
cannot dominate any query's entry. Prints the combined JSON document.

Usage: python tools/bench_cycles.py [n_cycles] > BENCH_LOCAL_rNN.json
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import re
import statistics
import subprocess
import sys
import time


def one_cycle() -> tuple[dict[str, float], float, float]:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True
    )
    wall = time.monotonic() - t0
    meds: dict[str, float] = {}
    for line in proc.stderr.splitlines():
        m = re.match(r"# (\w+): (?:interleaved )?median ([0-9.]+)s", line)
        if m:
            meds[m.group(1)] = float(m.group(2))
    total = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            total = json.loads(line)["value"]
    if total is None or not meds:
        sys.stderr.write(proc.stderr[-2000:])
        raise SystemExit(f"cycle failed (rc={proc.returncode})")
    with open("/tmp/bench_cycles_stderr.log", "a") as f:
        f.write(proc.stderr)
    return meds, total, wall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cycles: list[dict[str, float]] = []
    totals: list[float] = []
    for i in range(n):
        meds, total, wallted = one_cycle()
        cycles.append(meds)
        totals.append(total)
        print(
            f"# cycle {i + 1}/{n}: total {total:.1f}s wall {wallted:.0f}s",
            file=sys.stderr,
        )
    names = sorted({k for c in cycles for k in c})
    combined = {
        k: round(statistics.median([c[k] for c in cycles if k in c]), 3)
        for k in names
    }
    doc = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(combined.values()), 3),
        "unit": "sec",
        "queries": dict(
            sorted(combined.items(), key=lambda kv: -kv[1])
        ),
        "sf": 0.1,
        "cycles_total": [round(t, 3) for t in totals],
        "protocol": (
            "per-query median across %d full bench cycles (the r12 "
            "protocol); full per-query map, not the top-25 emission"
            % n
        ),
    }
    json.dump(doc, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
