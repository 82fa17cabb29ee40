"""Skew-handling join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our sessions) handles most skew at runtime; explicit salting remains the
tool when one side has pathological hot keys AND the other side is small
enough to replicate — the classic power-law fact⋈dim case where a single
hot key would otherwise pin one task.

``salted_join``: the big (skewed) side gets a salt in [0, n_salts)
derived from ``monotonically_increasing_id`` (partition id + row index),
which spreads a hot key uniformly even when its rows are byte-identical
(hashing payload columns would collapse them onto one salt, re-pinning
the task). The salt only picks WHICH replica of a small-side row a big
row joins to — the joined payload is identical for every replica — so
the result is salt-independent and task retries are safe despite the id
function's nondeterminism. The small side is replicated n_salts×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on``, salted ``n_salts`` ways.

    ``small`` is replicated ``n_salts``× (explode of a literal range), so
    its effective size must stay ≪ shuffle capacity — the same constraint
    as broadcast, relaxed n_salts-fold.

    Only ``inner`` and ``left`` joins are supported: right/full outer
    would emit every unmatched small-side row once per salt replica,
    breaking the row-identity contract.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}"
        )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
