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
# order IS the graded set. Attested-ever after r5 = 116/190; this
# round's window keeps a 5-query sentinel (one per family, green in
# every prior window) and fills the other 45 slots with names that
# have NEVER had a driver CORRECTNESS row (rounds-4/5 additions:
# graph analytics g19/g29-g42, time-series/sketches r51-r66, curation/
# ANN audits l41-l67, stateful streaming st11-st14).
#
# ROTATION RULE (round 5+): rotate ONCE at the START of a round, never
# mid-round (the driver grades at round end; a mid-round rotation
# orphans the current window). Round-7 candidates = the 29 names never
# attested before round 6 (g28, l11, l19, l23, l25, l27, l29, l32-l36,
# l39, l42, l43, l45, l49, l51-l53, l56, l58-l60, l62-l65, l68) plus
# round 6's 21 additions (l69-l78, g43, g44, r67-r72, st15-st17) = 50;
# a 5-query sentinel + 45 slots covers all but five — defer g28 (the
# rows-only telemetry) and four sturdy locals (l72, l76, r71, r72) to
# round 8.
_GRADED_FIRST = [
    # sentinel core: one per family, re-attested every round
    "r03_pricing_summary", "g01_follow_one_hop",
    "l01_dedup_exact", "l06_knn_bruteforce", "st01_tumbling_window",
    # time-series / sketches / maintenance: first driver attestation
    "r51_funnel", "r53_sliding_distinct_users", "r55_locf_gapfill",
    "r56_incremental_mv", "r57_max_concurrency", "r58_quantile_sketch",
    "r59_scd2_history", "r60_heavy_hitters", "r61_key_skew_report",
    "r62_retention_cohorts", "r63_kmv_distinct_sketch",
    "r64_event_pattern_match", "r65_event_transition_matrix",
    "r66_last_touch_attribution",
    # graph analytics kernels: first driver attestation
    "g19_connected_components_star", "g29_follow_asof",
    "g30_link_prediction", "g31_nation_modularity", "g32_hits",
    "g33_harmonic_centrality", "g34_diameter_sweep",
    "g35_temporal_reachability", "g36_ktruss",
    "g37_degree_assortativity", "g38_clustering_coefficient",
    "g39_betweenness_sampled", "g40_random_walk_corpus",
    "g41_coreness_buckets", "g42_temporal_broker_score",
    # LLM pipeline: curation/ANN-audit entries with only local evidence
    "l41_perplexity_buckets", "l44_bpe_merge_pairs",
    "l46_incremental_dedup", "l47_token_waterfill",
    "l48_quality_classifier", "l50_dedup_keep_best",
    "l54_knn_pq", "l55_lsh_recall_audit", "l57_curation_pipeline",
    "l61_audio_decode", "l66_token_dropout", "l67_feature_standardize",
    # streaming: stateful/SCD2/full-outer entries not yet attested
    "st11_stream_scd2", "st12_dedup_ingest",
    "st13_stream_stream_full_join", "st14_spend_threshold_alerts",
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
