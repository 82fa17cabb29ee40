"""Streaming operators over ``events`` (Structured Streaming).

Every transformation here works identically on a batch DataFrame (the
unified Dataset API) — the query-inventory entries run them batch-mode so
the DuckDB oracle can check values; the pytest suite drives the same
plans through ``readStream`` → memory sink with AvailableNow semantics,
plus the streaming-only behaviors (watermark late-data drop,
dropDuplicatesWithinWatermark, applyInPandasWithState).

Scale notes: watermarks bound state; session/tumbling aggregations shuffle
on (window, keys); state-store size is ∝ open windows × keys, so the gap
and watermark delay are the scale knobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream (parquet source, one-file dir).

    readStream needs a declared schema; probe it from a batch read of the
    same file (one footer read) instead of hard-coding the ts dtype — the
    generated testdata has shipped ts as both long-nanos and timestamp[us]
    across rounds, and ``normalize_events_ts`` branches on what it finds.
    """
    from ekati_spark.catalog import ensure_session_confs, normalize_events_ts

    ensure_session_confs(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = (
        spark.readStream.format("parquet")
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(raw)


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling-window counts/sums per event_type (watermarked)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding-window counts (each event lands in width/slide windows)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: session = events with < gap between them."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("total"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Stateful dedup on event_id bounded by the watermark (streaming-only
    state GC; batch mode degenerates to dropDuplicates)."""
    w = events.withWatermark("ts", "10 minutes")
    if events.isStreaming:
        return w.dropDuplicatesWithinWatermark(["event_id"])
    return w.dropDuplicates(["event_id"])


def stream_static_join(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich events with the customer dimension (the
    static side is broadcast; re-read per micro-batch)."""
    return events.join(
        F.broadcast(customers),
        events.user_id == customers.c_custkey,
        "inner",
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def stream_stream_join(
    events: DataFrame, window: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: each click joins the same user's
    purchases within ``window`` after it. Both sides watermarked and the
    join condition carries the time range, so Spark can GC join state
    (state ∝ events inside watermark+window, not the full history). Works
    identically batch-mode (the unified-API oracle path)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "10 minutes")
        buys = buys.withWatermark("purchase_ts", "10 minutes")
    return clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def stream_stream_left_join(
    events: DataFrame, window: str = "30 minutes"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every click, padded with nulls when
    no same-user purchase follows within ``window``. The streaming-only
    semantics: an unmatched click emits its null-padded row only once the
    watermark passes click_ts + window (state can then be GC'd — no
    earlier emission is possible because a matching purchase could still
    arrive). Batch mode is a plain left join, the oracle path. Join state
    is watermark-bounded exactly like the inner variant."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "10 minutes")
        buys = buys.withWatermark("purchase_ts", "10 minutes")
    return clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
        "left_outer",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)



def stream_stream_full_join(
    events: DataFrame, window: str = "30 minutes"
) -> DataFrame:
    """Stream-stream FULL OUTER join: matched click/purchase pairs plus
    null-padded rows for BOTH unmatched sides — clicks with no purchase
    in the window AND purchases no click preceded. Streaming semantics:
    each side's unmatched row is emitted once the watermark proves no
    counterpart can still arrive (click_ts + window for clicks, the
    symmetric bound for purchases), after which its join state is GC'd;
    the time-range condition on both watermarked columns is what makes
    that state bounded. Batch mode is a plain full join, the oracle
    path."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "10 minutes")
        buys = buys.withWatermark("purchase_ts", "10 minutes")
    return clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
        "full_outer",
    ).select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def _user_stats_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    event count + value total, emitted every micro-batch — the principled
    replacement for the reference's WASM plugin seam (SURVEY §2 #22 note)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink and
    return the collected table (test/oracle harness helper).

    ``mode`` must match the plan: 'append' for stream-stream joins and
    per-row transforms, 'complete' for windowed aggregations (an 'update'
    memory sink would accumulate each window's intermediate emissions
    across micro-batches), 'update' for applyInPandasWithState."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file stream (the source takes the sf
    DIRECTORY + a glob — FileStreamSource rejects a bare file path)."""
    from ekati_spark.catalog import ensure_session_confs

    ensure_session_confs(spark)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.format("parquet")
        .schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def curation_map(docs: DataFrame) -> DataFrame:
    """Stateless curation pipeline (quality gate -> PII redaction ->
    token count) — identical semantics batch and streaming, no state,
    no watermark, scan-local at any scale."""
    from ekati_spark.operators import text as X

    t = F.col("text")
    n_tok = X.token_count(t)
    return (
        docs.filter(
            n_tok.between(20, 400) & (X.distinct_token_ratio(t) > 0.3)
        )
        .select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            F.md5(X.redact_pii(t)).alias("redacted_md5"),
        )
    )


def windowed_type_counts(
    events: DataFrame, width: str = "15 minutes"
) -> DataFrame:
    """Streaming-safe stage of trending top-k: tumbling counts per
    event type. Runs identically under readStream (complete/update
    mode); state is ∝ open windows × event types."""
    return events.groupBy(
        F.window("ts", width).alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))


def rank_topk(agg: DataFrame, k: int = 3) -> DataFrame:
    """Ranking stage of trending top-k. Window functions can't run on a
    live streaming aggregation, so under streaming this applies
    downstream of the sink (or per-batch in foreachBatch) — the
    standard continuously-updated-leaderboard pattern; in batch it
    composes directly. Deterministic: count desc, event_type asc."""
    from pyspark.sql import Window as W

    w = W.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        agg.select(
            "w",
            "event_type",
            "n",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "rnk",
        )
    )


def trending_topk(
    events: DataFrame, k: int = 3, width: str = "15 minutes"
) -> DataFrame:
    """Top-k trending event types per tumbling window."""
    return rank_topk(windowed_type_counts(events, width), k)


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)
_GAP_US = 30 * 60 * 1_000_000


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time-timeout sessionizer: fold events into gap-separated
    sessions; the open session lives in state and is flushed by the
    timeout once the watermark passes last_event + gap."""
    (user_id,) = key
    out = []

    def emit(s0: int, last: int, n: int, tot: float) -> None:
        out.append(
            (
                user_id,
                pd.Timestamp(s0, unit="us"),
                pd.Timestamp(last + _GAP_US, unit="us"),
                n,
                tot,
            )
        )

    if state.hasTimedOut:
        if state.exists:
            emit(*state.get)
            state.remove()
    else:
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values("ts")
        cur = list(state.get) if state.exists else None
        for ts, value in zip(ev["ts"], ev["value"]):
            t = _us(ts)
            v = float(value)
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] >= _GAP_US:
                emit(*cur)
                cur = [t, t, 1, v]
            else:
                # a late-but-within-watermark event can precede the open
                # session's start — extend backward like session_window
                cur[0] = min(cur[0], t)
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
        state.update(tuple(cur))
        # flush when the event-time watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + _GAP_US) // 1000)
    yield pd.DataFrame(
        out,
        columns=["user_id", "session_start", "session_end", "n_events", "total"],
    )


def sessionize_with_state(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState +
    EventTimeTimeout) — the timeout-driven flavor of st03's built-in
    session_window, and the full custom-stateful-operator surface the
    reference's WASM plugin seam would host: per-key mutable state,
    watermark-driven timers, exactly-once session emission, state GC on
    close. State per user = one open session tuple."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def anomaly_windows(
    events: DataFrame,
    baseline: DataFrame,
    width: str = "15 minutes",
    factor: float = 2.0,
) -> DataFrame:
    """Stream-vs-baseline alerting: tumbling per-type counts joined to a
    STATIC baseline (expected count per event_type per window), flagging
    windows at >= ``factor`` x expected. Streaming-safe by construction —
    windowed agg + stream-static broadcast join; the baseline table is a
    dimension (one row per event_type) refreshed out-of-band, exactly how
    a production alerting job consumes its trained thresholds."""
    counts = windowed_type_counts(events, width)
    return (
        counts.join(F.broadcast(baseline), "event_type")
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "expected_n",
            (F.col("n") >= factor * F.col("expected_n")).alias("is_anomaly"),
        )
    )


def type_window_baseline(events: DataFrame, width: str = "15 minutes") -> DataFrame:
    """Train the baseline from history: mean per-window count per type,
    as an exact ratio of two counts (bit-identical in any engine)."""
    counts = windowed_type_counts(events, width)
    return counts.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count("*")).alias("expected_n")
    )


class _SinkFS:
    """Marker/metadata operations for the idempotent sink family,
    routed through the Hadoop FileSystem API so ``base_path`` may live
    on any store Spark can reach (HDFS, s3a, gs, local file://) — the
    sink contract says shared storage in deployment, and a
    ``os.listdir``/``shutil.rmtree`` implementation would silently only
    work on POSIX-visible paths. All calls are driver-side metadata
    ops on KB-scale marker files, never data reads."""

    def __init__(self, spark: SparkSession, base_path: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._base = self._Path(base_path)
        self._fs = self._base.getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, name: str):
        return self._Path(self._base, name)

    def exists(self, name: str) -> bool:
        return self._fs.exists(self._p(name))

    def touch(self, name: str, payload: bytes = b"") -> None:
        out = self._fs.create(self._p(name), True)
        try:
            if payload:
                out.write(bytearray(payload))
        finally:
            out.close()

    def read(self, name: str) -> bytes:
        # py4j passes bytearray args by VALUE (Java-side writes don't
        # come back), so a read-into-buffer loop silently returns
        # zeros; IOUtils returns the byte[] as the call result, which
        # py4j converts correctly. commons-io ships with Spark.
        inp = self._fs.open(self._p(name))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(inp)
            return bytes(data)
        finally:
            inp.close()

    def delete(self, name: str) -> None:
        self._fs.delete(self._p(name), True)

    def names(self, pattern: str | None = None) -> list[str]:
        """Child names of base_path; with ``pattern``, a glob over the
        children (``globStatus`` — one prefix listing of the MATCHING
        names, not an enumeration of every batch directory; the sink
        calls this per micro-batch, so on an object store with
        thousands of committed epochs the difference is the trigger
        latency)."""
        if pattern is not None:
            sts = self._fs.globStatus(self._p(pattern))
            return (
                [st.getPath().getName() for st in sts] if sts else []
            )
        if not self._fs.exists(self._base):
            return []
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._base)
        ]

    def committed_ids(self) -> list[int]:
        return sorted(
            int(n.rsplit("_", 1)[1])
            for n in self.names("_committed_*")
        )

    def compacted_through(self) -> int | None:
        """High-water mark of epochs folded by compaction (see
        ``compact_committed_batches``): max over the
        ``_compacted_through_<id>`` markers, None if never compacted."""
        hwms = [
            int(n.rsplit("_", 1)[1])
            for n in self.names("_compacted_through_*")
        ]
        return max(hwms) if hwms else None


def idempotent_batch_sink(base_path: str):
    """Exactly-once ``foreachBatch`` sink: the transactional pattern that
    makes Structured Streaming's at-least-once batch replay safe against
    a non-transactional store. Each micro-batch writes to its own
    ``batch_id=<n>`` directory (mode=overwrite — a re-run of a partially
    written batch replaces, never appends) and then drops a commit
    marker; a replayed batch whose marker exists — or whose id is at or
    below the compaction high-water mark (its marker was folded away by
    ``compact_committed_batches``) — is skipped entirely. The (epoch,
    write, commit) protocol is the same one Delta's
    ``txnAppId``/``txnVersion`` and the Kafka sink's epoch dedup encode.

    ``base_path`` may be any Spark-reachable store (HDFS/object store in
    deployment — foreachBatch bodies run on the driver, so the marker
    check is a driver-side metadata read, never a data read; all marker
    I/O goes through the Hadoop FileSystem API). Read the sink with
    ``read_committed_batches``: it lists marker files (tiny,
    driver-side) and reads ONLY committed batch directories, so a crash
    between data write and marker write exposes nothing (write-ahead
    ordering).
    """

    def sink(df: DataFrame, batch_id: int) -> None:
        fs = _SinkFS(df.sparkSession, base_path)
        if fs.exists(f"_committed_{batch_id}"):
            return  # replayed epoch: already committed, exactly-once skip
        hwm = fs.compacted_through()
        if hwm is not None and batch_id <= hwm:
            # Replay of an epoch whose per-epoch marker compaction
            # folded away: its rows already live in the compacted
            # batch. Without this check a crash-replay after an
            # offline compaction would double-land the epoch.
            return
        df.write.mode("overwrite").parquet(
            f"{base_path}/batch_id={batch_id}"
        )
        fs.touch(f"_committed_{batch_id}")

    return sink


def read_committed_batches(spark: SparkSession, base_path: str) -> DataFrame:
    """Read only the committed batch directories of an
    ``idempotent_batch_sink`` output (uncommitted/partial batches are
    invisible). Returns an empty-schema-less error only if nothing has
    committed yet — callers should gate on at least one marker."""
    ids = _SinkFS(spark, base_path).committed_ids()
    paths = [f"{base_path}/batch_id={i}" for i in ids]
    return spark.read.parquet(*paths)


def compact_committed_batches(
    spark: SparkSession,
    base_path: str,
    merge=None,
) -> int:
    """Compact an ``idempotent_batch_sink`` store: fold every committed
    ``batch_id=<n>`` directory into ONE compacted batch (id =
    ``-(max_id + 1)`` — negative, so it can never collide with the
    stream's own future epoch ids), optionally re-aggregating with
    ``merge`` (e.g. ``groupBy(pos).sum`` for counting-bloom deltas,
    st26) so the stored state stops growing with batch count. Returns
    the number of source batches folded (0 = nothing to do).

    Crash contract (the ``compact_ivf_lists`` precedent — recoverable,
    not atomic, and NOT safe under concurrent readers; run it as the
    offline maintenance step it is): a ``_compact_inprogress`` sentinel
    records the source ids and target id BEFORE any visible change.
    Crash before the compacted marker lands → old batches intact,
    compacted dir invisible; re-run restarts cleanly. Crash after →
    the sentinel tells the re-run to finish removing exactly the
    recorded sources (never re-reading state), so the brief
    double-visibility window closes deterministically.

    Replay safety: folding deletes the per-epoch ``_committed_<n>``
    markers — the sink's only replay-dedup evidence — so BEFORE any
    marker is removed, a ``_compacted_through_<max_folded_epoch>``
    high-water mark lands; ``idempotent_batch_sink`` skips any epoch at
    or below it. Epochs are sequential per stream and compaction is
    offline, so every epoch ≤ the fold max had a marker and is covered
    by the compacted batch. All metadata I/O goes through the Hadoop
    FileSystem API (shared-storage safe)."""
    import json

    fs = _SinkFS(spark, base_path)
    sentinel = "_compact_inprogress"
    if fs.exists(sentinel):
        plan = json.loads(fs.read(sentinel).decode())
        ids, cid = plan["ids"], plan["cid"]
    else:
        ids = fs.committed_ids()
        if len(ids) <= 1:
            return 0
        # negative and below every existing id (including prior
        # compactions), so it can never collide with the stream's own
        # future epoch ids or a re-compaction
        cid = min(-(max(ids) + 1), min(ids) - 1)
        fs.touch(sentinel, json.dumps({"ids": ids, "cid": cid}).encode())
    cmark = f"_committed_{cid}"
    if not fs.exists(cmark):
        df = spark.read.parquet(
            *[f"{base_path}/batch_id={i}" for i in ids]
        )
        if merge is not None:
            df = merge(df)
        df.write.mode("overwrite").parquet(f"{base_path}/batch_id={cid}")
        fs.touch(cmark)
    # High-water mark BEFORE removing any per-epoch marker (write-ahead
    # ordering: a crash in between leaves both, and the HWM wins).
    # Prior compactions' ids fold in too; only real epochs (>= 0) gate.
    folded_max = max((i for i in ids if i >= 0), default=None)
    if folded_max is not None:
        prior = fs.compacted_through()
        if prior is None or folded_max > prior:
            fs.touch(f"_compacted_through_{folded_max}")
        for n in fs.names("_compacted_through_*"):
            if int(n.rsplit("_", 1)[1]) < max(folded_max, prior or 0):
                fs.delete(n)
    for i in ids:
        if fs.exists(f"_committed_{i}"):
            fs.delete(f"_committed_{i}")
        fs.delete(f"batch_id={i}")
    fs.delete(sentinel)
    return len(ids)


SCD2_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("state", T.DoubleType(), False),
        T.StructField("valid_from", T.TimestampType(), False),
        T.StructField("valid_to", T.TimestampType(), False),
    ]
)
_SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_state", T.DoubleType(), False),
        T.StructField("from_us", T.LongType(), False),
        T.StructField("version", T.IntegerType(), False),
    ]
)


def _scd2_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming SCD2 fold: per-key state = the open version
    (cur_state, valid_from, version_no). A batch's events apply in
    (ts, event_id) order; a change of tracked state CLOSES the open
    version (emitting its validity interval) and opens the next. The
    open version never leaves state — exactly r59's closed-interval
    rows stream out incrementally, no timeout needed (nothing expires:
    a dimension's current version stays open forever)."""
    (user_id,) = key
    out = []
    ev = pd.concat(list(pdfs), ignore_index=True)
    ev = ev.sort_values(["ts", "event_id"])
    cur = list(state.get) if state.exists else None
    for ts, eid, value in zip(ev["ts"], ev["event_id"], ev["value"]):
        t = _us(ts)
        s = round(float(value), 2)
        if cur is None:
            cur = [s, t, 1]
        elif s != cur[0]:
            out.append(
                (
                    user_id,
                    cur[2],
                    cur[0],
                    pd.Timestamp(cur[1], unit="us"),
                    pd.Timestamp(t, unit="us"),
                )
            )
            cur = [s, t, cur[2] + 1]
    state.update(tuple(cur))
    yield pd.DataFrame(
        out, columns=["user_id", "version", "state", "valid_from", "valid_to"]
    )


def scd2_with_state(
    events: DataFrame, watermark: str = "10 minutes",
    event_type: str = "purchase",
) -> DataFrame:
    """Streaming SCD Type-2 maintenance (applyInPandasWithState): the
    incremental form of the r59 batch history build — each micro-batch
    folds CDC events into the per-key open version and emits newly
    CLOSED validity intervals append-only. A warehouse consumes this as
    the SCD2 dimension's change feed; the open versions are the state
    store. In-order processing within the watermark is assumed (same
    contract as the sessionizer; a late event older than the open
    version would need a compensating rewrite, which CDC pipelines
    handle downstream)."""
    return (
        events.filter(F.col("event_type") == event_type)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_fn,
            outputStructType=SCD2_OUT_SCHEMA,
            stateStructType=_SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def dedup_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    ck_dir: str,
    schema: str = DOC_SCHEMA,
) -> DataFrame:
    """Dedup-on-ingest: land only documents whose normalized-text digest
    has never been seen — the streaming form of ``exact_dedup``, for
    deduplicating a crawl AS it arrives instead of in a nightly batch
    pass over the accumulated corpus.

    Per micro-batch (foreachBatch): digest → keep the min-id row per
    digest WITHIN the batch → left-anti join against the digests already
    landed in the sink → append survivors. The dedup state IS the sink's
    digest column (no driver-side set, no state store growth beyond the
    output itself); at 100 TB the sink is a digest-bucketed table so the
    anti-join is bucket-pruned. The anti-join also makes the append
    idempotent under Structured Streaming's at-least-once batch replay:
    a replayed batch anti-joins against its own landed output and
    contributes nothing.
    """
    from pyspark.sql import Window as W

    from ekati_spark.operators.dedup import normalized

    sdf = spark.readStream.schema(schema).parquet(src_dir)

    def land(batch: DataFrame, _batch_id: int) -> None:
        sess = batch.sparkSession
        dig = batch.withColumn("digest", F.md5(normalized(F.col("text"))))
        w = W.partitionBy("digest").orderBy("doc_id")
        first = (
            dig.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        try:
            seen = sess.read.parquet(out_dir).select("digest")
            first = first.join(seen, "digest", "left_anti")
        except Exception:  # first batch: sink doesn't exist yet
            pass
        first.write.mode("append").parquet(out_dir)

    q = (
        sdf.writeStream.foreachBatch(land)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


SPEND_ALERT_SCHEMA = (
    "user_id long, event_id long, level long, cum_cents long"
)


def _spend_alert_processor(threshold_cents: int):
    # processor class defined lazily (base class imported inside the
    # factory) so importing ops.py never requires the streaming-state
    # module
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendAlerts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "acc", "cum_cents BIGINT, level BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            cum, level = (0, 0)
            if self._st.exists():
                cum, level = self._st.get()
            out_uid, out_eid, out_lvl, out_cum = [], [], [], []
            for pdf in rows:
                # replay in deterministic event order: state semantics
                # must not depend on micro-batch internal ordering
                pdf = pdf.sort_values(["ts", "event_id"])
                for eid, val in zip(pdf["event_id"], pdf["value"]):
                    # HALF_UP on the shortest decimal repr of the double
                    # product — bit-identical to the batch twin's
                    # F.round(value*100) (Spark rounds the BigDecimal of
                    # Double.toString with HALF_UP; Python round() is
                    # half-even and diverges on exact .5 cents).
                    cum += int(
                        Decimal(repr(float(val) * 100)).quantize(
                            Decimal(1), rounding=ROUND_HALF_UP
                        )
                    )
                    new_level = cum // threshold_cents
                    if new_level > level:
                        out_uid.append(int(key[0]))
                        out_eid.append(int(eid))
                        out_lvl.append(int(new_level))
                        out_cum.append(int(cum))
                        level = new_level
            self._st.update((cum, level))
            yield pd.DataFrame(
                {
                    "user_id": out_uid,
                    "event_id": out_eid,
                    "level": out_lvl,
                    "cum_cents": out_cum,
                }
            )

        def close(self) -> None:
            pass

    return SpendAlerts()


def spend_alerts(events: DataFrame, threshold_cents: int = 50000) -> DataFrame:
    """Per-user cumulative-spend threshold alerts on the NEW Spark 4
    stateful API (``transformWithStateInPandas`` — typed ValueState,
    the successor of applyInPandasWithState): emit one row each time a
    user's running spend crosses another multiple of the threshold.

    Exactness contract: spend accumulates in integer CENTS
    (round(value*100)) in (ts, event_id) order, so the feed is
    bit-identical to the batch window replay (st14's oracle) — the
    st10/l16 integer-sum doctrine applied to running state. State per
    user is two BIGINTs; alert output is sparse (rows only at
    crossings), so state size and output both stay O(users), not
    O(events), at 100 TB.

    ENVIRONMENT: the transformWithState driver worker imports the
    ``protobuf`` package (its state-server wire protocol); where that
    package is absent (this container) the streaming path raises at
    query start and the pytest is skipif-gated — the batch twin
    ``spend_alerts_batch`` carries the oracle-checked semantics
    (st14), exactly the Pillow pattern from the image seam."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_spend_alert_processor(threshold_cents),
        outputStructType=SPEND_ALERT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def spend_alerts_batch(
    events: DataFrame, threshold_cents: int = 50000
) -> DataFrame:
    """Batch-window equivalent of ``spend_alerts`` (the oracle path):
    integer-cents running sum + level lag over (ts, event_id) order."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    c = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .alias("cum_cents"),
    )
    lv = c.select(
        "user_id",
        "event_id",
        F.expr(f"cum_cents div {threshold_cents}").alias("level"),
        F.coalesce(
            F.lag(F.expr(f"cum_cents div {threshold_cents}")).over(wl),
            F.lit(0),
        ).alias("prev"),
        "cum_cents",
    )
    return lv.filter(F.col("level") > F.col("prev")).select(
        "user_id",
        "event_id",
        F.col("level").cast("long").alias("level"),
        F.col("cum_cents").cast("long").alias("cum_cents"),
    )


def kmv_distinct_stream(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    ck_dir: str,
    schema: str,
    key_col: str = "user_id",
    k: int = 256,
) -> DataFrame:
    """Streaming distinct-count sketch: maintain a KMV (bottom-k)
    sketch of ``key_col`` ACROSS micro-batches. Each batch appends its
    own bottom-k partial (k rows max) to ``state_dir``; the merged
    sketch is the bottom-k of the union — exact associativity of
    bottom-k merges is what makes the sketch streamable with NO
    user-visible error from batching: the final estimate is
    bit-identical to the batch KMV over the whole history (r63's
    estimator, attested by st15's oracle). Replayed batches append a
    duplicate partial, which the distinct-union absorbs — idempotent
    under at-least-once batch replay. State grows k rows per batch
    (KBs), independent of stream volume; a deployment compacts partials
    into one k-row file periodically (same bottom-k merge).

    Returns a one-row DataFrame: sketch_size, kth_min, est_kmv.
    """
    from pyspark.sql import Window as W

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def land(batch: DataFrame, _batch_id: int) -> None:
        hh = (
            batch.select(
                F.conv(
                    F.substring(F.md5(F.col(key_col).cast("string")), 1, 13),
                    16,
                    10,
                )
                .cast("long")
                .alias("hv")
            )
            .distinct()
            .orderBy("hv")
            .limit(k)
        )
        hh.write.mode("append").parquet(state_dir)

    q = (
        sdf.writeStream.foreachBatch(land)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = spark.read.parquet(state_dir).distinct()
    bk = (
        merged.select(
            "hv", F.row_number().over(W.orderBy("hv")).alias("rn")
        )
        .filter(F.col("rn") <= k)
    )
    POW52 = 4503599627370496
    return bk.agg(
        F.count("*").cast("long").alias("sketch_size"),
        F.max("hv").cast("long").alias("kth_min"),
    ).select(
        "sketch_size",
        "kth_min",
        F.when(F.col("sketch_size") < k, F.col("sketch_size"))
        .otherwise(F.expr(f"{k - 1} * {POW52}L div kth_min"))
        .cast("long")
        .alias("est_kmv"),
    )


def countmin_stream(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    ck_dir: str,
    schema: str,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming Count-Min: each micro-batch appends its own counter
    GRID partial; the merged sketch is the cell-wise SUM of partials —
    CM is linear, so the merged grid is bit-identical to the batch
    grid over the whole history (st17's oracle proves it). The
    frequency-sketch twin of ``kmv_distinct_stream``: state is
    depth×width rows per batch, independent of stream volume; a
    replayed batch WOULD double-count (addition is not idempotent), so
    partials are keyed by batch_id and the merge takes each batch's
    LAST partial — the epoch-keyed overwrite rule that makes the
    at-least-once foreachBatch contract exactly-once here.

    Returns the merged grid ``(d, bucket, c)``."""
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def land(batch: DataFrame, batch_id: int) -> None:
        dd = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
        hh = batch.select(F.col(key_col)).select(dd, key_col).select(
            "d",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("d").cast("string"),
                                F.lit(":"),
                                F.col(key_col).cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("bucket"),
        )
        grid = hh.groupBy("d", "bucket").agg(F.count("*").alias("c"))
        grid.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(state_dir)

    q = (
        sdf.writeStream.foreachBatch(land)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    parts = spark.read.parquet(state_dir)
    # exactly-once merge: one partial per (batch, cell) — replays that
    # re-append a batch's grid collapse to a single contribution
    dedup = parts.groupBy("batch_id", "d", "bucket").agg(
        F.max("c").alias("c")
    )
    return dedup.groupBy("d", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )
