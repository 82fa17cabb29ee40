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
# order IS the graded set. CORRECTNESS_r13.json graded the round-13
# window green (50/50 hash-match), so every query registered through
# round 12 is driver-attested-ever. The never-driver-attested set is
# the 7 round-13 additions (l127-l131, r78, st34) plus
# g28_engine_metrics, whose upgraded deterministic-invariant oracle
# (round-11 item 8) has never earned a hash-match driver row (its only
# driver row is the rows-only r10 one; the rotation rule now demands a
# hash attestation once an oracle exists). This round-14 window = the
# 5-query sentinel core + those 8 + 37 least-recently-attested fillers
# (last green: CORRECTNESS_r05/r06). Queries added during round 14 go
# into _POST_WINDOW below and rotate in next round.
#
# This list is DERIVED, not hand-curated: `python tools/rotate_window.py`
# regenerates it from the committed CORRECTNESS/JUDGE artifacts, and
# tests/test_schema_canary.py asserts the committed list matches the
# derived one (so the list can't drift from the artifact record).
#
# ROTATION RULE (round 5+): rotate ONCE at the START of a round, never
# mid-round (the driver grades at round end; a mid-round rotation
# orphans the current window).
#
# Queries ADDED mid-round are listed here: they stay OUT of the graded
# window this round (the window was fixed at round start) and become
# the never-attested block of the NEXT round's rotation, at which point
# this list is cleared. tools/rotate_window.py excludes these names
# when re-deriving the window.
_POST_WINDOW: list[str] = [
    "l127b_hybrid_rrf_indexed",
    "l108b_knn_label_consistency_ivf",
]

_GRADED_FIRST = [
    # sentinel core: one per family, re-attested every round
    "r03_pricing_summary", "g01_follow_one_hop",
    "l01_dedup_exact", "l06_knn_bruteforce", "st01_tumbling_window",
    # --- never driver-attested ---
    "r78_pivot_revenue_matrix",
    "l127_hybrid_rrf_fusion",
    "l128_mmr_diversified_topk",
    "l129_domain_reweighting",
    "l130_retrieval_quality_metrics",
    "l131_contamination_report",
    "st34_stream_domain_reweighting",
    "g28_engine_metrics",
    # --- least-recently attested fillers ---
    "l21_stratified_sample",  # last green r05
    "l22_train_split",  # last green r05
    "l26_dedup_keep_one",  # last green r05
    "l31_domain_mix",  # last green r05
    "l37_semantic_dedup",  # last green r05
    "l38_chunk_dedup_rewrite",  # last green r05
    "l40_leakage_safe_split",  # last green r05
    "st04_stream_static_join",  # last green r05
    "st05_stateful_dedup",  # last green r05
    "st06_stream_stream_join",  # last green r05
    "st07_stream_curation",  # last green r05
    "st08_trending_topk",  # last green r05
    "st10_anomaly_windows",  # last green r05
    "r51_funnel",  # last green r06
    "r53_sliding_distinct_users",  # last green r06
    "r55_locf_gapfill",  # last green r06
    "r56_incremental_mv",  # last green r06
    "r57_max_concurrency",  # last green r06
    "r58_quantile_sketch",  # last green r06
    "r59_scd2_history",  # last green r06
    "r60_heavy_hitters",  # last green r06
    "r61_key_skew_report",  # last green r06
    "r62_retention_cohorts",  # last green r06
    "r63_kmv_distinct_sketch",  # last green r06
    "r64_event_pattern_match",  # last green r06
    "r65_event_transition_matrix",  # last green r06
    "r66_last_touch_attribution",  # last green r06
    "g19_connected_components_star",  # last green r06
    "g29_follow_asof",  # last green r06
    "g30_link_prediction",  # last green r06
    "g31_nation_modularity",  # last green r06
    "g32_hits",  # last green r06
    "g33_harmonic_centrality",  # last green r06
    "g34_diameter_sweep",  # last green r06
    "g35_temporal_reachability",  # last green r06
    "g36_ktruss",  # last green r06
    "g37_degree_assortativity",  # last green r06
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
