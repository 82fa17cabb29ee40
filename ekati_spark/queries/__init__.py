"""The judged query inventory (SURVEY.md §2).

Each query is registered once with a Spark implementation
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle SQL string computing the same result with the same column names.

Modules register into ``REGISTRY`` on import.
"""

from __future__ import annotations

from ekati_spark.queries.base import REGISTRY, oracle_sql, queries

# Importing registers the queries.
from ekati_spark.queries import relational  # noqa: F401
from ekati_spark.queries import graph  # noqa: F401
from ekati_spark.queries import llm  # noqa: F401
from ekati_spark.queries import streaming  # noqa: F401
from ekati_spark.queries import stats  # noqa: F401

# The driver grades the first 50 registered queries, so registration
# order IS the graded set. Rounds 1-3 attested r01-r50 plus the round-3
# curated core; this round rotates the window onto 40 names with only
# local (verify_local.py) evidence so far, keeping a 10-query sentinel
# core spanning every family to detect drift against prior rounds.
#
# ROTATION RULE (round 5+): rotate ONCE at the START of a round, never
# mid-round (the driver grades at round end; a mid-round rotation
# orphans the current window). Next-round candidates = everything not
# in the r3 or r4 windows, plus this round's additions: r56-r60, l41-
# l56, g29-g34, st02, st03, st09, st11, st12, r02, r49, r55, l09-l11,
# l13, l16, l19, l23-l25, l27-l30, l32-l36, l39 (keep the same 10-query
# sentinel core; prefer names that have never had a driver row).
_GRADED_FIRST = [
    # sentinel core: re-attested every round (green in r3's window)
    "r01_scan_count", "r03_pricing_summary", "r37_asof_join",
    "g01_follow_one_hop", "g10_cycle_dedup",
    "l01_dedup_exact", "l06_knn_bruteforce", "l20_dedup_groups",
    "st01_tumbling_window", "st04_stream_static_join",
    # relational: never driver-attested aggs/joins/subqueries/time-series
    "r05_count_distinct", "r08_grouping_sets", "r13_join_full_outer",
    "r20_window_rank_ntile", "r34_correlated_exists",
    "r39_percentiles", "r52_lateral_topk", "r54_merge_upsert",
    # graph analytics kernels: first driver attestation
    "g11_latest_version", "g12_multi_valued_keys", "g13_pagerank",
    "g14_connected_components", "g15_shortest_hops",
    "g16_motif_supply_path", "g17_triangle_count", "g20_kcore",
    "g21_label_propagation", "g23_cheapest_trade_route",
    "g24_cosupplier_graph", "g25_personalized_pagerank",
    "g27_edge_label_histogram",
    # LLM pipeline: dedup/ANN/curation entries with only local evidence
    "l03_minhash_lsh_pairs", "l04_simhash_pairs", "l07_knn_lsh",
    "l12_multimodal_features", "l14_top_bigrams", "l15_knn_ivf",
    "l18_token_budget", "l21_stratified_sample", "l22_train_split",
    "l26_dedup_keep_one", "l31_domain_mix", "l37_semantic_dedup",
    "l38_chunk_dedup_rewrite", "l40_leakage_safe_split",
    # streaming: stateful/stream-stream entries not yet attested
    "st05_stateful_dedup", "st06_stream_stream_join",
    "st07_stream_curation", "st08_trending_topk", "st10_anomaly_windows",
]


def _curate_order() -> None:
    # Defensive, not assertive: a stale name here must cost that one slot,
    # never the whole driver import (everything flows through this module).
    # tests/test_schema_canary.py pins the 50/zero-missing invariant.
    front = [n for n in _GRADED_FIRST if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(front)]
    ordered = {n: REGISTRY[n] for n in [*front, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_curate_order()

__all__ = ["REGISTRY", "queries", "oracle_sql"]
