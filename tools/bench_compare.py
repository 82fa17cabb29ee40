"""Diff two bench.py JSON artifacts and flag per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts both artifact shapes: the raw one-line JSON bench.py prints and
the driver's recorded shape ({"parsed": {...}}). Prints queries only in
one side, the common-set totals, and any query slower than ``threshold``
(default 1.2×) — the round-over-round gate VERDICT.md applies. Exits 1
if a regression exceeds the threshold, so it can gate a round's final
commit. Machine-load variance can inflate everything uniformly; when
BOTH totals move together but no query dominates, read it as load, not
regression (the tool prints the uniform-shift ratio for exactly this
call).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        d = json.loads(text)  # whole-file JSON (driver artifact shape)
    except json.JSONDecodeError:
        d = None
        for line in reversed(
            [ln for ln in text.splitlines() if ln.strip()]
        ):
            if line.lstrip().startswith("{"):
                try:
                    d = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if d is None:
            raise SystemExit(f"{path}: no JSON object line found")
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key")
    return d


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"only in OLD: {only_old}")
    if only_new:
        print(f"only in NEW: {only_new}")
    to = sum(qo[q] for q in common)
    tn = sum(qn[q] for q in common)
    shift = tn / to if to else float("nan")
    print(
        f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s "
        f"(uniform-shift ratio {shift:.2f})"
    )
    regressions = []
    for q in common:
        if qo[q] <= 0:
            continue
        r = qn[q] / qo[q]
        if r > thr and qn[q] - qo[q] > 0.2:  # ignore sub-noise absolutes
            regressions.append((r, q, qo[q], qn[q]))
    for r, q, a, b in sorted(regressions, reverse=True):
        print(f"REGRESSION {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    improved = sorted(
        (qn[q] / qo[q], q)
        for q in common
        if qo[q] > 0.2 and qn[q] / qo[q] < 0.8
    )
    for r, q in improved[:10]:
        print(f"improved {q}: {qo[q]:.2f}s -> {qn[q]:.2f}s ({r:.2f}x)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
