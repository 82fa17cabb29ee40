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
# order IS the graded set. CORRECTNESS_r15.json graded the round-15
# window green (50/50 hash-match), so the never-driver-attested set is
# now exactly the 6 round-15 mid-round additions that sat in
# _POST_WINDOW (l132–l136, st35 — the suffix-sort and graph-ANN
# lifecycle families). This round-16 window = the 5-query sentinel
# core + those 6 + 39 least-recently-attested fillers (last green:
# CORRECTNESS_r08/r10). No queries were added during round 16 (an
# optimization round), so _POST_WINDOW is empty.
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
_POST_WINDOW: list[str] = []

_GRADED_FIRST = [
    # sentinel core: one per family, re-attested every round
    "r03_pricing_summary", "g01_follow_one_hop",
    "l01_dedup_exact", "l06_knn_bruteforce", "st01_tumbling_window",
    # --- never driver-attested ---
    "l132_suffix_dedup_spans",
    "l133_knn_graph_serve",
    "l134_knn_graph_delete",
    "l135_knn_graph_append",
    "l136_knn_graph_route_serve",
    "st35_stream_graph_maintenance",
    # --- least-recently attested fillers ---
    "l51_curriculum_order",  # last green r08
    "l52_bigram_interp_logprob",  # last green r08
    "l53_perceptual_dhash",  # last green r08
    "l56_ngram_novelty",  # last green r08
    "l58_sq8_recall_audit",  # last green r08
    "l59_source_overlap_matrix",  # last green r08
    "l60_eval_apportionment",  # last green r08
    "l62_audio_resample",  # last green r08
    "l63_frame_sampling",  # last green r08
    "l64_skipgram_collocations",  # last green r08
    "l65_snapshot_diff",  # last green r08
    "l68_feature_bucketize",  # last green r08
    "l69_decode_coverage",  # last green r08
    "l70_ivf_append_parity",  # last green r08
    "l71_dedup_threshold_sweep",  # last green r08
    "l73_temperature_mixture",  # last green r08
    "l75_knn_filtered",  # last green r08
    "l74_chunk_embedding_pool",  # last green r08
    "l77_minhash_persisted",  # last green r08
    "l78_split_integrity_audit",  # last green r08
    "st15_stream_kmv_distinct",  # last green r08
    "st16_stream_nt_ingest",  # last green r08
    "st17_stream_countmin",  # last green r08
    "r02_filter_project",  # last green r10
    "r04_single_row_agg",  # last green r10
    "r07_cube",  # last green r10
    "r11_local_supplier_volume",  # last green r10
    "r12_join_left",  # last green r10
    "r14_join_semi",  # last green r10
    "r15_join_anti",  # last green r10
    "r16_cross_theta",  # last green r10
    "r18_window_running_sum",  # last green r10
    "r19_window_lag_lead",  # last green r10
    "r71_dup_drift_daily",  # last green r10
    "r72_topk_with_ties",  # last green r10
    "r73_rollup_router",  # last green r10
    "r74_ordered_set_aggs",  # last green r10
    "r75_percentile_cont",  # last green r10
    "g45_bucketed_follow_parity",  # last green r10
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
