"""Frequency sketches: distributed heavy hitters (Misra-Gries).

Completes the engine's sketch family — r47 rolls up HLL distinct-count
registers, r58 carries a Greenwald-Khanna quantile summary; this module
adds the frequent-items sketch. The reference has no sketch surface at
all (SURVEY.md §2 "explicitly absent" — no aggregation of any kind);
these exist for the 100 TB regime where exact global answers are a
luxury and a two-pass sketch+verify is the honest contract.

Design (two-pass candidate/verify, the classic distributed shape):

1. **Per-partition Misra-Gries summaries**, bounded memory (``capacity``
   counters), computed in one ``mapInPandas`` sweep. Each Arrow batch is
   reduced with a vectorized ``value_counts`` before touching the dict,
   so Python-level work is O(distinct keys per batch), not O(rows).
2. **Candidate union**: the summaries (≤ capacity × partitions rows —
   KB-sized, independent of data volume) are unioned and deduped.
3. **Exact re-count restricted to candidates**: a broadcast semi-join
   filters the fact table to candidate keys, then an exact groupBy
   count + top-k. The full-cardinality shuffle never happens — only
   candidate-keyed rows reach the aggregation.

Exactness contract (why the result is oracle-checkable): batched MG
decrements remove ≥ (capacity+1) units of mass per unit of per-key
undercount, so a partition of n_p rows undercounts any key by at most
n_p/(capacity+1); summed over partitions, every key with true count
> N/(capacity+1) survives into the candidate set. The re-count is
exact, so whenever the k-th heavy hitter clears that threshold the
top-k is exact — and it is trivially exact whenever per-partition
distinct keys ≤ capacity (MG never evicts), which holds at test SFs.
At 100 TB pick capacity ≥ N/(expected k-th frequency); memory per task
stays O(capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def misra_gries_summaries(
    df: DataFrame,
    key_cols: list[str],
    capacity: int = 1024,
) -> DataFrame:
    """Pass 1 alone: per-partition Misra-Gries summaries of ``df``'s
    ``key_cols`` tuples — ``key_cols + [mg_lb]`` rows, ≤ capacity per
    input partition. Summaries are MERGEABLE by summing ``mg_lb`` per
    key (the union keeps the n_p/(capacity+1) undercount bound
    additive), which is what the streaming maintenance twin (st30)
    appends through the epoch sink; ``misra_gries_heavy_hitters``
    composes this with the exact candidate re-count."""
    keyed = df.select(*key_cols)
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    summary_schema = f"{out_fields}, `mg_lb` bigint"

    def mg_summaries(batches):
        import pandas as pd

        counts: dict[tuple, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            vc = pdf.groupby(key_cols, sort=False, dropna=True).size()
            for key, c in vc.items():
                kt = key if isinstance(key, tuple) else (key,)
                counts[kt] = counts.get(kt, 0) + int(c)
            if len(counts) > capacity:
                # Batched MG: subtract the (capacity+1)-th largest count
                # from everyone; ≥ capacity+1 counters shrink per unit,
                # giving the n_p/(capacity+1) undercount bound.
                d = sorted(counts.values(), reverse=True)[capacity]
                counts = {kk: v - d for kk, v in counts.items() if v > d}
        if counts:
            rows = [(*kk, v) for kk, v in counts.items()]
            yield pd.DataFrame(rows, columns=[*key_cols, "mg_lb"])

    return keyed.mapInPandas(mg_summaries, schema=summary_schema)


def misra_gries_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    k: int = 20,
    capacity: int = 1024,
    summaries: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` most frequent ``key_cols`` tuples of ``df``.

    Returns ``key_cols + [n_events]`` ordered by (count desc, *keys) —
    a total order, so ties at the k-boundary are deterministic. Null
    keys are not counted (pandas groupby drops them; the callers'
    key columns are non-nullable facts). Pass ``summaries`` to supply
    a pre-built (possibly stream-maintained) summary table instead of
    sketching ``df`` in-line; the exact re-count still runs on ``df``.
    """
    if summaries is None:
        summaries = misra_gries_summaries(df, key_cols, capacity)
    candidates = summaries.select(*key_cols).distinct()
    exact = (
        df.join(F.broadcast(candidates), key_cols, "left_semi")
        .groupBy(*key_cols)
        .agg(F.count("*").alias("n_events"))
    )
    return exact.orderBy(F.col("n_events").desc(), *key_cols).limit(k)
