"""Deterministic sampling for training-data pipelines.

All predicates hash a stable key with md5 and compare the first 8 hex
chars against a precomputed threshold string. Properties that matter at
100 TB:

- **Deterministic & reproducible**: no RNG, no seed-per-partition state;
  the same row always lands on the same side of every split, across
  reruns, retries, and engines (md5 hex is portable — the DuckDB oracles
  compute the identical predicate).
- **No shuffle**: sampling/splitting is a narrow ``filter``/``select``;
  at 100 TB it runs scan-local and composes with partition pruning.
- **Stable under appends**: membership depends only on the key, so
  growing the corpus never resamples old rows (unlike ``df.sample``,
  whose per-partition RNG re-draws when partitioning changes).

Rate precision is 1/16^8 (~6e-10). Hex-prefix comparison is valid
because '0'-'9' < 'a'-'f' in ASCII: lexicographic order on the prefix
equals numeric order of the 32-bit value.

No reference analog: Astn/ekati has no sampling surface; this is part of
the training-pipeline extension (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ekati_spark.driverside import local_rows_df

_SPACE = 16**8


def _hex_prefix(key: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || key) — a uniform 32-bit draw."""
    s = key.cast("string") if not salt else F.concat(F.lit(salt), key.cast("string"))
    return F.substring(F.md5(s), 1, 8)


def _threshold(rate: float) -> str:
    """Hex threshold such that P[prefix < threshold] = rate.

    rate=1.0 returns 'g' (one char past 'f'): every 8-hex-char prefix
    sorts below it, whereas the 9-char string '100000000' would sort
    below almost every prefix and silently drop ~94% of rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * _SPACE), "08x")


def sample_predicate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean column: deterministically keep ~``rate`` of rows by key."""
    thr = _threshold(rate)  # validates range even when short-circuiting
    if rate >= 1.0:
        return F.lit(True)
    return _hex_prefix(key, salt) < F.lit(thr)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose hashed key falls
    below the rate threshold."""
    return df.filter(sample_predicate(F.col(key_col), rate, salt))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep the tail): ``rates`` maps stratum value → keep rate.

    One narrow filter — the per-stratum threshold is a CASE expression,
    so no join and no shuffle; the predicate evaluates in the scan stage
    (md5 isn't a parquet-pushable filter, but it never leaves the task
    that read the row).
    """
    thr = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_threshold(rate))
        ).otherwise(thr)
    return df.filter(_hex_prefix(F.col(key_col), salt) < thr)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Assign a deterministic ``split`` column ('train'/'val'/'test').

    The salt decorrelates the split draw from any sampling draw on the
    same key (otherwise "the first 5% of hash space" would be the same
    rows in both). Row-local projection — no shuffle.
    """
    if val_rate + test_rate >= 1.0:
        raise ValueError("val_rate + test_rate must be < 1")
    h = _hex_prefix(F.col(key_col), salt)
    t_val = _threshold(val_rate)
    t_test = _threshold(val_rate + test_rate)
    split = (
        F.when(h < F.lit(t_val), F.lit("val"))
        .when(h < F.lit(t_test), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def domain_mix(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a corpus toward target domain *weights* by deterministic
    per-domain downsampling (the pre-training "data mixing" step).

    Keep rate per domain: ``rate_d = (w_d / n_d) / max_e(w_e / n_e)`` —
    the domain with the highest weight-per-row keeps everything and all
    others downsample proportionally, so the *expected* output mix is
    ``weights`` (up to domains too small to supply their share). Rates
    are data-dependent, so unlike ``stratified_sample`` they can't be
    literals: one tiny count aggregate per domain is broadcast back and
    the row predicate compares the md5 prefix against the domain's
    computed hex threshold. Scale shape: a domain-cardinality shuffle
    (#domains rows) + a broadcast join; the per-row filter stays in the
    scan stage.

    Float determinism: the rate arithmetic is double division + floor
    only (no accumulation order), so Spark and an oracle engine compute
    bit-identical thresholds from identical counts.
    """
    w = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        w = F.when(F.col(domain_col) == value, F.lit(float(wt))).otherwise(w)
    per = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("n"))
        .select(domain_col, (w / F.col("n")).alias("wn"))
    )
    mx = per.agg(F.max("wn").alias("mx"))
    thr = (
        per.crossJoin(F.broadcast(mx))
        .select(domain_col, (F.col("wn") / F.col("mx")).alias("rate"))
        .select(
            domain_col,
            F.when(F.col("rate") >= 1.0, F.lit("g"))
            .otherwise(
                F.format_string(
                    "%08x",
                    F.floor(F.col("rate") * F.lit(float(_SPACE))).cast(
                        "bigint"
                    ),
                )
            )
            .alias("thr"),
        )
    )
    return df.join(F.broadcast(thr), domain_col).filter(
        _hex_prefix(F.col(key_col), salt) < F.col("thr")
    )


def weighted_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic size-proportional sampling (systematic/PPS): lay the
    rows end-to-end on a weight line in canonical ``key_col`` order and
    take the ``k`` evenly spaced points ``j·W/k`` (j=0..k-1, W = total
    weight). A row occupying ``[cum, cum+w)`` is picked
    ``floor(k·(cum+w)/W) − floor(k·cum/W)`` times — integer arithmetic
    only, so the draw is exact, reproducible across engines, and the
    total pick count is exactly ``k``. Heavy rows (w > W/k) are picked
    multiple times (``n_picks`` is the multiplicity — the caller decides
    clamp-vs-repeat), which is the correct PPS semantics for building
    e.g. a token-budget-proportional eval slice.

    Scale shape (the reason this isn't one ``row_number`` window): the
    prefix sum is two-level — range-repartition by key, per-partition
    weight totals (a #partitions-row collect), broadcast the partition
    offsets, and a partition-local window adds the within-partition
    prefix. No single-partition global window; shuffle is the one range
    exchange. The sorted frame is persisted so the offset job and the
    output job see identical range boundaries (same rationale as
    ``global_shuffle``). Intermediate products ``k·cum`` stay in int64 —
    safe while ``k·W < 2^63`` (true for any corpus where W counts
    chars/tokens and k ≤ ~1e5; switch the two products to
    ``decimal(38,0)`` past that).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    n = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    w = F.col(weight_col).cast("bigint")
    rng = (
        df.withColumn("_w", w)
        .repartitionByRange(n, key_col)
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per = {
        r["_pid"]: r["s"]
        for r in rng.groupBy("_pid").agg(F.sum("_w").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in range(n):
        offsets.append((pid, acc))
        acc += per.get(pid, 0)
    total = acc
    if total <= 0:
        raise ValueError("total weight must be positive")
    off = local_rows_df(
        df.sparkSession, offsets, "_pid int, _off long"
    )
    win = (
        W.partitionBy("_pid")
        .orderBy(key_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("_w").over(win), F.lit(0)) + F.col("_off")
    picks = F.expr(f"(({k} * (_cum + _w)) div {total})") - F.expr(
        f"(({k} * _cum) div {total})"
    )
    return (
        rng.join(F.broadcast(off), "_pid")
        .withColumn("_cum", cum)
        .withColumn("n_picks", picks)
        .filter(F.col("n_picks") > 0)
        .drop("_w", "_pid", "_off", "_cum")
    )


def global_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "shuf",
    num_partitions: int | None = None,
    prefix_col: Column | None = None,
) -> DataFrame:
    """Deterministic global shuffle: every row gets a stable 1-based
    ``pos`` in the order of ``md5(salt || key)`` (ties broken by key) —
    the "shuffle the corpus before training" step, reproducible across
    reruns and engines because the permutation is a hash order, not RNG.

    Scale shape: a naive ``row_number() OVER (ORDER BY hash)`` collapses
    into ONE window partition. Instead: range-repartition + sort by the
    hash (Spark's distributed sort), count rows per partition (a
    #partitions-row aggregate), broadcast the cumulative offsets, and
    assign ``pos = offset + local index`` in a single Arrow pass. The
    sorted frame is persisted so the count job and the assignment job
    see identical partition boundaries (range sampling is otherwise
    re-drawn per job; a deployment would checkpoint instead).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    if prefix_col is not None:
        # Curriculum use: a fixed-width string prefix makes the order
        # (prefix asc, hash) — deterministic shuffle WITHIN each prefix
        # stage. Same machinery, same scale shape (the prefix breaks
        # the hash's uniformity, so no analytic bucket: this path
        # keeps the sampled range exchange).
        h = F.concat(prefix_col, h)
        return ordered_row_number(
            df.withColumn("_h", h),
            ["_h", key_col],
            out_col="pos",
            drop_cols=["_h"],
            num_partitions=num_partitions,
        )
    # The sort key IS a uniform hash, so the range boundaries are known
    # analytically: bucket i covers hash prefixes [i/n, (i+1)/n) of the
    # 48-bit keyspace. lowercase-hex lexicographic order == numeric
    # order of the prefix, so the bucket is monotone in the (_h, key)
    # total order — ordered_row_number's pinned-bucket contract — and
    # the sampled range exchange, its boundary-sampling job, and the
    # persist all drop out (round-16 verdict item 6; guide §2.4).
    n = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # 64 buckets per partition (guide §2.5: many more distinct bucket
    # values than partitions, so the hash layout stays even), capped so
    # value*m stays in int64 against the 40-bit prefix (10 hex chars);
    # integer div keeps the mapping exact end-to-end.
    m = min(64 * n, 1 << 22)
    bucket = F.expr(
        f"cast(conv(substring(_h, 1, 10), 16, 10) as bigint) * {m}"
        " div 1099511627776"  # 2^40
    )
    return ordered_row_number(
        df.withColumn("_h", h),
        ["_h", key_col],
        out_col="pos",
        drop_cols=["_h"],
        num_partitions=n,
        bucket_col=bucket,
    )


def ordered_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    drop_cols: list[str] | None = None,
    num_partitions: int | None = None,
    neighbor_col: str | None = None,
    bucket_col: Column | None = None,
) -> DataFrame:
    """Distributed ``row_number() OVER (ORDER BY order_cols)``: a stable
    1-based ``out_col`` in the total order of ``order_cols`` (which must
    be a total order — include a unique tie-break key).

    Scale shape: a naive global-ORDER-BY window collapses into ONE
    window partition. Instead: range-repartition by the order columns
    (Spark's distributed sort layout), count rows per partition (a
    #partitions-row aggregate), broadcast-join the cumulative offsets
    back by partition id, and assign ``out_col = offset + local
    row_number`` with a window PARTITIONED by partition id — every
    stage is JVM-side whole-stage-codegen-adjacent (no Python/Arrow
    round-trip: the first version Arrow-assigned the index and paid
    the pandas conversion of every payload column on every
    consumption — measured ~3× the job cost when rows carry token
    arrays, ``suffix_window_spans`` at sf1). The ranged frame is
    persisted so the count job and the assignment job see identical
    partition boundaries (range sampling is otherwise re-drawn per
    job; a deployment would checkpoint instead). ``drop_cols`` lets
    callers discard sort-only helper columns. Shared by
    ``global_shuffle`` (hash order) and the suffix-array sort
    (``dedup.suffix_window_spans``).

    ``neighbor_col`` additionally emits ``<neighbor_col>_next`` /
    ``<neighbor_col>_prev`` — that column's value on the global-order
    successor/predecessor row (NULL at the two ends of the total
    order). Within a range partition these are a lead/lag over the SAME
    window the row number already pays for (no new exchange, no
    self-join); the ≤ #partitions boundary rows are fixed up with two
    broadcast joins keyed on the dense ``out_col`` (each partition's
    first row is the successor of index ``off``, its last row the
    predecessor of index ``off + count + 1``). This replaces the
    adjacent-pair SELF-JOIN consumers used to run on ``out_col`` —
    which re-shuffled the whole sorted frame once per join side
    (ENSURE_REQUIREMENTS hash exchanges; the round-16 l132 profile
    showed three extra 270k-row exchanges at sf0.1) — with in-row
    neighbor columns (guide §2.4: remove shuffles outright).
    ``bucket_col`` (round-16 verdict item 6 — pin the boundaries): a
    caller-supplied DETERMINISTIC partition id, monotone
    non-decreasing in the ``order_cols`` total order (all rows of
    bucket i sort before all rows of bucket i+1). When given, the
    range exchange is replaced by the bucket expression: no
    ``repartitionByRange`` (whose per-job boundary re-sampling is an
    extra full input pass AND the reason the ranged frame had to be
    persisted for bit-stability), and the cached layout is a hash
    partitioning on ``_pid`` that the assignment window consumes with
    NO further exchange — the range path re-shuffled its cache
    through an ENSURE_REQUIREMENTS hash exchange on every
    consumption. Used by ``global_shuffle`` (md5-hash
    order ⇒ an analytic uniform bucket from the hash prefix exists);
    the suffix-array sort keeps the sampled range path — string keys
    have no analytic boundary, and a re-sampled boundary set would
    not be bit-stable across the two consuming jobs.
    """
    drop_cols = drop_cols or []
    n = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if bucket_col is not None and neighbor_col is None:
        # The pinned bucket needs no range exchange and no boundary
        # sampling pass — one full input pass fewer. Hash-repartition
        # by the bucket BEFORE the persist: hashpartitioning(_pid)
        # satisfies the window's ClusteredDistribution(_pid), so the
        # assignment job reads the cache with NO further exchange
        # (guide §2.4 — the range path paid an ENSURE_REQUIREMENTS
        # hash exchange above its cache on every consumption). The
        # persist is NOT a correctness guard here (the bucket is
        # deterministic; both jobs would agree without it) — it is a
        # measured recompute guard for the second consumption. A
        # 100-TB deployment drops it and re-derives the narrow
        # (key, hash, bucket) projection per pass instead of spilling
        # a corpus-sized cache.
        rng = (
            df.withColumn("_pid", bucket_col.cast("int"))
            .repartition(n, F.col("_pid"))
            .persist()
        )
        # The bucket ids are data columns, so the offsets need NO
        # driver round-trip at all: per-bucket counts + a running sum
        # over the (#buckets)-row aggregate, broadcast-joined back.
        # The first version collected the counts and replayed them as
        # a local_rows_df literal frame — at 64 buckets/partition
        # that is a thousands-of-structs literal expression tree,
        # re-analyzed on every build and every plan copy (the exact
        # Catalyst literal-blowup failure mode the k-means/minhash
        # kernels hit in round 12; l32 at sf1 measured 18.7 s
        # minimum against sub-3 s before). Distributed offsets fold
        # the count pass into the one final action (no separate
        # collect job) and keep the plan tree constant-size.
        per = rng.groupBy("_pid").agg(F.count("*").alias("_n"))
        off = per.select(
            "_pid",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_pid").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_off"),
        )
    else:
        rng = (
            df.repartitionByRange(n, *order_cols)
            .withColumn("_pid", F.spark_partition_id())
            .persist()
        )
        cnt = {
            r["pid"]: r["n"]
            for r in rng.groupBy(F.col("_pid").alias("pid"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        offsets, acc = [], 0
        for pid in range(n):
            offsets.append((pid, acc))
            acc += cnt.get(pid, 0)
        off = local_rows_df(
            df.sparkSession, offsets, "_pid int, _off long"
        )
    w = W.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    base = (
        rng.join(F.broadcast(off), "_pid")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(out_col, F.col("_rn") + F.col("_off"))
    )
    if neighbor_col is None:
        return base.drop("_pid", "_off", "_rn", *drop_cols)
    nxt, prv = f"{neighbor_col}_next", f"{neighbor_col}_prev"
    base = base.withColumn(
        "_ld", F.lead(neighbor_col).over(w)
    ).withColumn("_lg", F.lag(neighbor_col).over(w))
    # partition-FIRST rows are the global successors of index off (the
    # previous partition's last row); partition-LAST rows (local
    # row_number == partition count) the predecessors of index
    # off+count+1. Indices are dense 1..N by construction, so the two
    # fix-up frames join purely on out_col — ≤ n rows each, broadcast.
    firsts = base.filter(F.col("_rn") == 1).select(
        (F.col(out_col) - 1).alias(out_col),
        F.col(neighbor_col).alias("_bnd_n"),
    )
    lasts = base.filter(F.col("_ld").isNull()).select(
        (F.col(out_col) + 1).alias(out_col),
        F.col(neighbor_col).alias("_bnd_p"),
    )
    return (
        base.join(F.broadcast(firsts), out_col, "left")
        .join(F.broadcast(lasts), out_col, "left")
        .withColumn(nxt, F.coalesce("_ld", "_bnd_n"))
        .withColumn(prv, F.coalesce("_lg", "_bnd_p"))
        .drop(
            "_pid", "_off", "_rn", "_ld", "_lg", "_bnd_n", "_bnd_p",
            *drop_cols,
        )
    )
