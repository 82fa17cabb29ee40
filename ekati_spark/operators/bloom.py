"""Bloom-filter membership operators for cross-corpus set probes.

The 100-TB pattern this module packages: when a reference set (a
benchmark's n-grams, a previously-ingested corpus's digests) must be
probed by EVERY row of a huge corpus, an exact broadcast join ships
8+ bytes per distinct member plus a hash table; a Bloom filter ships a
fixed ``m/8``-byte bitmap no matter how large the reference grows, at
the cost of a tunable one-sided error (false positives only, never
false negatives). The probe stays a broadcast — the corpus never
shuffles — and the (rare) candidates are confirmed by an exact join
that carries candidate rows only.

Determinism contract: bit positions are md5-derived (``pos_j(v) =
int(md5(j ':' v)[:15 hex]) mod m``), so a DuckDB oracle replays the
exact same bitmap and candidate set — the false positives themselves
are attested, not just the confirmed hits.

Sizing rule (applied by default, not just documented): the textbook
formulae are ``m = -n ln p / (ln 2)^2`` and ``k = (m/n) ln 2``; this
module fixes ``k = 3`` (serves p ≈ 1-5%) and sizes the bitmap with the
INTEGER-EXACT equivalent ``m = next multiple of 64 ≥ 13·n``
(at k=3, fp = (1 − e^(−3n/m))³ ≈ 0.9% for m = 13n). Integer
arithmetic, not ln/ceil floats, so a DuckDB oracle reproduces the
exact same ``m`` from the same reference count — no cross-libm ulp
hazard deciding a boundary. ``bloom_word_table``/``bloom_bitmap``
auto-size when ``m`` is omitted; passing fixed ``m`` is the explicit
test/fixture lever (an undersized bitmap saturates gracefully — every
probe becomes a candidate and the exact confirm join does all the
work — wrong speed, never wrong answers).

Spark built-ins (``BloomFilterAggregate`` / ``might_contain``) are not
used deliberately: their xxhash-based layout is not replayable in the
DuckDB oracle, and the explicit word table is what the streaming twin
joins against. Reference analog: none (LLM-data extension; the graph
engine uses the same idea for traversal dedup — see
``graph/traverse.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_params",
    "bloom_position",
    "bloom_word_table",
    "bloom_bitmap",
    "bloom_probe",
    "BLOOM_POS_SQL",
    "BLOOM_M_SQL",
    "BITS_PER_MEMBER",
    "DEFAULT_K",
]

# Integer-exact sizing constants (see module docstring): m = next
# multiple of 64 >= BITS_PER_MEMBER * n, probed with DEFAULT_K hashes.
BITS_PER_MEMBER = 13
DEFAULT_K = 3

# DuckDB twin of ``bloom_params`` — .format(n=<count expr>) yields the
# same m for the same reference-set count, pure integer arithmetic.
# greatest(n, 1) mirrors bloom_params's clamp so an EMPTY reference
# set gives m=64 on both sides instead of a SQL modulo-by-zero.
BLOOM_M_SQL = "(({bpm} * greatest(({n}), 1) + 63) // 64) * 64".replace(
    "{bpm}", str(BITS_PER_MEMBER)
)


def bloom_params(n: int) -> int:
    """Bitmap size for ``n`` reference members: next multiple of 64
    ≥ ``BITS_PER_MEMBER·n`` (≈0.9% fp at k=3). Integer-exact so an
    oracle replays it from the same count — see module docstring."""
    n = max(int(n), 1)
    return ((BITS_PER_MEMBER * n + 63) // 64) * 64

# DuckDB twin of ``bloom_position`` — .format(j=..., val=..., m=...)
# into oracle texts so both engines derive identical bit positions.
BLOOM_POS_SQL = (
    "CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || {val}),"
    " 1, 15)) AS BIGINT) % {m}"
)


def bloom_position(value: Column, j: int, m: int) -> Column:
    """Bit position of hash ``j`` for ``value``: first 60 md5 bits of
    ``"j:value"`` mod ``m``. Non-negative (60-bit magnitude), codegen
    string/conv ops only — identical in DuckDB via ``BLOOM_POS_SQL``."""
    h = F.md5(F.concat(F.lit(f"{j}:"), value))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m


def _positions(df: DataFrame, value_col: str, m: int, k: int) -> Column:
    return F.explode(
        F.array(*[bloom_position(F.col(value_col), j, m) for j in range(k)])
    )


def bloom_word_table(
    df: DataFrame, value_col: str, m: int | None = None, k: int = DEFAULT_K
) -> DataFrame:
    """The filter as data: ``(word_idx, word)`` rows packing the ``m``
    bits into 64-bit words, built with one distributed aggregate
    (map-side ``bit_or`` partials, shuffle ≤ ``m/64`` rows per
    partition regardless of input size). This is the form a streaming
    gate joins against (stream-static, broadcast) and what lands on
    disk next to an ingest ledger.

    ``m=None`` (the default) auto-sizes from the reference-set row
    count via ``bloom_params`` — one count job over the (small)
    reference set, never the corpus. Pass fixed ``m`` only as a
    test/fixture lever; an undersized filter stays correct but
    degrades the probe to pass-through."""
    if m is None:
        m = bloom_params(df.count())
    assert m % 64 == 0, "m must pack into 64-bit words"
    return (
        df.select(_positions(df, value_col, m, k).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_bitmap(
    df: DataFrame, value_col: str, m: int | None = None, k: int = DEFAULT_K
) -> np.ndarray:
    """Collect the word table into a packed ``int64[m/64]`` bitmap.
    ``m=None`` auto-sizes via ``bloom_params`` (see
    ``bloom_word_table``); the chosen m is recoverable from the result
    as ``bitmap.size * 64`` — ``bloom_probe`` does exactly that.

    The collect is bounded by ``m/64`` rows — a filter sized for 10^10
    members at 1% fp is ~12 GB of BITS but the driver only ever holds
    the words actually set, scattered into the dense array; for the
    filters this repo sizes (m ≤ 2^27) it is a few MB. At cluster
    scale the bitmap rides to executors once per job as a broadcast
    closure — the constant-size alternative to an ever-growing
    broadcast-join hash table."""
    if m is None:
        m = bloom_params(df.count())
    words = np.zeros(m // 64, dtype=np.int64)
    for r in bloom_word_table(df, value_col, m, k).collect():
        words[int(r["word_idx"])] = r["word"]
    return words


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bitmap: np.ndarray,
    m: int | None = None,
    k: int = DEFAULT_K,
    out_col: str = "is_candidate",
) -> DataFrame:
    """Append boolean ``out_col``: true iff all ``k`` bits for
    ``value_col`` are set in ``bitmap`` (Bloom candidate — a superset
    of true members). Positions are computed JVM-side (same codegen
    exprs as the build); only the k small ints cross into one
    Arrow-batched pandas UDF that indexes the closure-captured packed
    bitmap. ``&1`` after an arithmetic shift reads the target bit
    correctly even for bit 63 of a negative int64 word. ``m=None``
    derives the build-time m from the bitmap itself (size·64); ``k``
    is NOT recoverable from the bitmap — a probe k different from the
    build k silently breaks the no-false-negative contract (a smaller
    build k leaves bits the probe then requires), so either default
    BOTH sides or state k explicitly at both call sites.

    The k positions cross as k separate int64 columns, NOT one array
    column: an Arrow list column lands in pandas as object-dtype rows
    of tiny ndarrays whose re-stack is Python-speed — measured +6 s on
    a 21M-gram sf1 probe vs near-zero for the columnar form (and a
    chain of k JVM broadcast word-joins was 7× worse still; see
    SCALE.md probe-path note)."""
    if m is None:
        m = int(bitmap.size) * 64
    words = bitmap  # closure capture; ships once per executor

    @F.pandas_udf("boolean")
    def _probe(*pos: pd.Series) -> pd.Series:
        n = len(pos[0])
        if not n:  # empty Arrow batch
            return pd.Series([], dtype=bool)
        hit = np.ones(n, dtype=bool)
        for p in pos:
            v = p.to_numpy()
            hit &= ((words[v >> 6] >> (v & 63)) & 1).astype(bool)
        return pd.Series(hit)

    return df.withColumn(
        out_col,
        _probe(*[bloom_position(F.col(value_col), j, m) for j in range(k)]),
    )


def counting_bloom_counts(
    adds: DataFrame,
    deletes: DataFrame,
    value_col: str,
    m: int,
    k: int,
) -> DataFrame:
    """COUNTING Bloom filter as data: ``(pos, cnt)`` rows where cnt =
    (# add occurrences hashing to pos) − (# delete occurrences).
    The deletable variant of ``bloom_word_table`` — the piece a plain
    bitmap can't do: with the standard contract (every delete was
    previously added), a member's k counters each keep ≥ 1 until ITS
    delete arrives, so membership (all k counters ≥ 1) has no false
    negatives even after arbitrary interleaved GC — the ingest-ledger
    twin of the chunk-store/signature/IVF delete paths (l84/l92/l93):
    retire corpus slices from the dedup gate WITHOUT rebuilding the
    filter over surviving history. Build is one union + one aggregate
    (map-side partial sums; shuffle ≤ m rows per partition); zero-cnt
    rows are dropped so the table stays ≤ min(m, live positions)."""
    a = adds.select(_positions(adds, value_col, m, k).alias("pos")).select(
        "pos", F.lit(1).cast("long").alias("d")
    )
    d = deletes.select(
        _positions(deletes, value_col, m, k).alias("pos")
    ).select("pos", F.lit(-1).cast("long").alias("d"))
    return (
        a.unionByName(d)
        .groupBy("pos")
        .agg(F.sum("d").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def counting_bloom_probe(
    df: DataFrame,
    value_col: str,
    counts: DataFrame,
    m: int,
    k: int,
    out_col: str = "is_candidate",
) -> DataFrame:
    """Append boolean ``out_col``: true iff all ``k`` counters for
    ``value_col`` are ≥ 1 in the counting filter. Pure JVM and ZERO
    corpus shuffle: the k positions are plain columns and each checks
    against the (≤ m row) counts table with its own broadcast hash
    join — k map-side probes, no explode/regroup cycle (an exploded
    formulation would shuffle the corpus ×k just to reassemble it)."""
    out = df
    checks = []
    for j in range(k):
        cj = counts.select(
            F.col("pos").alias(f"__pos{j}"), F.col("cnt").alias(f"__cnt{j}")
        )
        out = out.withColumn(
            f"__pos{j}", bloom_position(F.col(value_col), j, m)
        ).join(F.broadcast(cj), f"__pos{j}", "left")
        checks.append(F.coalesce(F.col(f"__cnt{j}"), F.lit(0)) >= 1)
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return out.withColumn(out_col, cond).drop(
        *[f"__pos{j}" for j in range(k)], *[f"__cnt{j}" for j in range(k)]
    )
