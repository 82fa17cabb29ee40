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
# order IS the graded set. Round 9 produced NO driver CORRECTNESS
# artifact (like round 7), so the never-driver-attested set at the
# round-10 start is 35 names: the 22 round-8 additions the round-9
# window targeted (g45-g47, g28, l05b/l45b, l72, l76, l79-l84,
# r71-r74, st18-st21) PLUS the 13 round-9 additions (l85-l93, r75,
# st22-st24; registry now 241). This window = the 5-query sentinel
# core (one per family, green in every prior graded window) + all 35
# never-attested names + 10 least-recently attested fillers (last
# green row: CORRECTNESS_r02). If this window is graded, every query
# registered through round 9 is driver-attested-ever (241/241).
# The queries ADDED in round 10 (l94-l101, st25-st27 — registry now
# 252) are attested by LOCAL_CORRECTNESS_r10.json this round and take
# the never-attested slots in the round-11 rotation.
#
# ROTATION RULE (round 5+): rotate ONCE at the START of a round, never
# mid-round (the driver grades at round end; a mid-round rotation
# orphans the current window).
_GRADED_FIRST = [
    # sentinel core: one per family, re-attested every round
    "r03_pricing_summary", "g01_follow_one_hop",
    "l01_dedup_exact", "l06_knn_bruteforce", "st01_tumbling_window",
    # --- never driver-attested: round-8 additions ---
    "r71_dup_drift_daily", "r72_topk_with_ties",
    "r73_rollup_router", "r74_ordered_set_aggs",
    "g45_bucketed_follow_parity", "g46_dsl_end_to_end",
    "g47_reverse_follow", "g28_engine_metrics",
    "l05b_dup_pairs_ann", "l45b_bitext_margin_ann",
    "l72_audio_dedup_resampled", "l76_pii_source_report",
    "l79_minhash_incremental", "l80_bm25_topk", "l81_warc_ingest",
    "l82_cdc_chunk_dedup", "l83_pca_power_iteration",
    "l84_chunk_store_gc",
    "st18_rocksdb_state_parity", "st19_warc_tail_ingest",
    "st20_stream_rollup_maintenance", "st21_stream_chunk_dedup_ingest",
    # --- never driver-attested: round-9 additions ---
    "r75_percentile_cont",
    "l85_ann_recall_audit", "l86_bm25_index_incremental",
    "l87_semantic_decontamination", "l88_kcenter_coreset",
    "l89_adaptive_quality_threshold", "l90_kcenter_composable",
    "l91_maxsim_late_interaction", "l92_signature_store_gc",
    "l93_ivf_delete_parity",
    "st22_stream_bm25_maintenance", "st23_stream_quality_gate",
    "st24_stream_ivf_maintenance",
    # --- least-recently attested (last green: CORRECTNESS_r02) ---
    "r02_filter_project", "r04_single_row_agg", "r07_cube",
    "r11_local_supplier_volume", "r12_join_left", "r14_join_semi",
    "r15_join_anti", "r16_cross_theta", "r18_window_running_sum",
    "r19_window_lag_lead",
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
