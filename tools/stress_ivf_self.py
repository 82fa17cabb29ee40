#!/usr/bin/env python
"""sf1/sf10 stress of the whole-corpus IVF self-probe kernel
(`similarity.ivf_self_topk_int`, the l108b candidate generator) and
the warm-served l127b query — the round-15 scale rows.

Protocol matches the round-13/14 kernel stress: run each subject twice
on the generated key-shifted datasets (tools/gen_scale.py outputs at
`.testdata_sf1` / `.testdata_sf10`) and record the WARM second-run
wall (codegen/page-cache amortized), plus the derived per-10× scaling
exponent.

The kernel is stressed stand-alone because the registered l108b query
deliberately carries the EXACT all-pairs predictor as its agreement
ground truth (the documented quadratic audit baseline, the l05-vs-l05b
split) — at sf10 that arm is 4e10 pairs by definition. The serving
path whose scale claim needs evidence is the IVF side: probe + grouped
per-list matmul + global top-k.

Usage: python tools/stress_ivf_self.py [sf1_dir] [sf10_dir]
Prints one JSON line per (subject, sf) plus exponents.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata_sf10"

    from ekati_spark.session import get_spark
    import ekati_spark.queries as Q
    from ekati_spark.catalog import load_table
    from ekati_spark.operators import similarity as S

    spark = get_spark("ekati_stress")
    results: dict[str, dict[str, float]] = {}

    def timed(subject: str, sf_name: str, fn) -> None:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            walls.append(round(time.perf_counter() - t0, 1))
        results.setdefault(subject, {})[sf_name] = walls[1]
        print(
            json.dumps(
                {
                    "subject": subject,
                    "sf": sf_name,
                    "cold": walls[0],
                    "warm": walls[1],
                    "rows": n,
                }
            ),
            flush=True,
        )

    for sf_name, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        emb = load_table(spark, sf_dir, "embeddings")
        n_vec = emb.count()
        print(f"# {sf_name}: {n_vec} vectors, n_lists="
              f"{S.auto_n_lists(n_vec)}", flush=True)
        timed(
            "ivf_self_topk_int",
            sf_name,
            lambda: S.ivf_self_topk_int(emb, k=5, n_probe=6).count(),
        )
        timed(
            "l127b_hybrid_rrf_indexed(warm-served)",
            sf_name,
            lambda: Q.REGISTRY["l127b_hybrid_rrf_indexed"]
            .fn(spark, sf_dir)
            .count(),
        )

    import math

    for subject, walls in results.items():
        if "sf1" in walls and "sf10" in walls and walls["sf1"] > 0:
            ratio = walls["sf10"] / walls["sf1"]
            print(
                json.dumps(
                    {
                        "subject": subject,
                        "ratio_10x": round(ratio, 2),
                        "exponent": round(math.log10(max(ratio, 1e-9)), 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
