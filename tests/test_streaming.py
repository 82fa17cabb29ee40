"""Structured Streaming tests: the batch-mode inventory plans run under
readStream (AvailableNow → memory sink) and produce the same results;
streaming-only behaviors (stateful dedup, applyInPandasWithState,
watermark plumbing) execute for real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ekati_spark.catalog import load_table
from ekati_spark.streaming import ops


@pytest.fixture(scope="module")
def ev_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture()
def ev_stream(spark, sf_dir):
    return ops.events_stream(spark, sf_dir)


def _run(spark, sdf, name, mode):
    return ops.run_to_memory(sdf, name, mode)


def test_tumbling_stream_equals_batch(spark, ev_batch, ev_stream):
    batch = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in ops.tumbling_counts(ev_batch).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in _run(
            spark, ops.tumbling_counts(ev_stream), "t_tumbling", "complete"
        ).collect()
    }
    assert stream == batch


def test_session_stream_equals_batch(spark, ev_batch, ev_stream):
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in ops.session_counts(ev_batch).collect()
    }
    stream = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in _run(
            spark, ops.session_counts(ev_stream), "t_session", "complete"
        ).collect()
    }
    assert stream == batch


def test_dedup_within_watermark_stream(spark, ev_stream, ev_batch):
    out = _run(
        spark, ops.dedup_within_watermark(ev_stream), "t_dedup", "append"
    )
    assert out.count() == ev_batch.select("event_id").distinct().count()


def test_stream_static_join(spark, ev_stream, sf_dir, ev_batch):
    cust = load_table(spark, sf_dir, "customer")
    out = _run(
        spark, ops.stream_static_join(ev_stream, cust), "t_ssj", "append"
    )
    expect = ev_batch.join(
        cust, ev_batch.user_id == cust.c_custkey
    ).count()
    assert out.count() == expect


def test_apply_in_pandas_with_state(spark, ev_stream, ev_batch):
    out = _run(
        spark, ops.user_running_stats(ev_stream), "t_state", "update"
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in out.collect()}
    expect = {
        r.user_id: (r.n, round(r.total, 4))
        for r in ev_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    # state emits once per batch per key; AvailableNow over one file = one
    # emission per key holding the final totals
    assert got == expect


def test_stream_stream_join(spark, ev_stream, ev_batch):
    """Stream-stream interval join under real watermarks equals batch."""
    batch = {
        (r.click_id, r.purchase_id)
        for r in ops.stream_stream_join(ev_batch).collect()
    }
    stream = {
        (r.click_id, r.purchase_id)
        for r in _run(
            spark, ops.stream_stream_join(ev_stream), "t_ssj", "append"
        ).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_foreach_batch_parquet_sink(spark, ev_stream, tmp_path):
    """foreachBatch sink: micro-batches land in parquet exactly once
    (checkpointed); total rows equal the source."""
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out)

    q = (
        ops.tumbling_counts(ev_stream)
        .writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch = ops.tumbling_counts(load_table(spark, "/root/testdata/sf0.001", "events"))
    assert got.count() == batch.count()


def test_stream_curation_equals_batch(spark, sf_dir):
    batch = ops.curation_map(load_table(spark, sf_dir, "documents"))
    sdf = ops.curation_map(ops.documents_stream(spark, sf_dir))
    got = _run(spark, sdf, "curation_t", "append")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    """writeStream to a real parquet sink with checkpointing, then read
    the sink back — batch-equivalent results (the memory sink tests
    cover semantics; this covers the durable-sink path)."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sdf = ops.curation_map(ops.documents_stream(spark, sf_dir))
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch = ops.curation_map(load_table(spark, sf_dir, "documents"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_trending_topk_stream_equals_batch(spark, ev_batch, ev_stream):
    """Windowed counts run as a real stream (complete mode); the rank
    stage applies over the sink table and must match the batch plan."""
    batch = {
        (r.window_start, r.rnk): (r.event_type, r.n)
        for r in ops.trending_topk(ev_batch).collect()
    }
    sink = _run(
        spark, ops.windowed_type_counts(ev_stream), "t_topk", "complete"
    )
    stream = {
        (r.window_start, r.rnk): (r.event_type, r.n)
        for r in ops.rank_topk(sink).collect()
    }
    assert stream == batch


def test_stream_stream_left_join(spark, ev_stream, ev_batch):
    """Left-outer stream-stream join: matched rows equal batch; null-padded
    rows appear only for clicks whose join window closed before the final
    watermark (streaming can't emit nulls for the tail — a match could
    still arrive), and every emitted null row is a true batch null row."""
    batch_rows = ops.stream_stream_left_join(ev_batch).collect()
    batch_matched = {
        (r.click_id, r.purchase_id)
        for r in batch_rows
        if r.purchase_id is not None
    }
    batch_nulls = {r.click_id for r in batch_rows if r.purchase_id is None}
    out = _run(
        spark, ops.stream_stream_left_join(ev_stream), "t_sslj", "append"
    ).collect()
    stream_matched = {
        (r.click_id, r.purchase_id) for r in out if r.purchase_id is not None
    }
    stream_nulls = {r.click_id for r in out if r.purchase_id is None}
    assert stream_matched == batch_matched
    assert stream_nulls <= batch_nulls
    assert len(batch_matched) > 0


def test_sessionize_with_state_matches_batch_sessions(spark, ev_stream, ev_batch):
    """The EventTimeTimeout sessionizer emits exactly the batch session
    set (st03's session_window semantics) for sessions closed before the
    final watermark; later sessions stay open in state (a real stream
    would flush them as the watermark advances)."""
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in ops.session_counts(ev_batch).collect()
    }
    out = _run(
        spark, ops.sessionize_with_state(ev_stream), "t_state_sess", "append"
    ).collect()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in out
    }
    assert got, "no sessions flushed — event-time timeout never fired"
    assert got <= batch, sorted(got - batch)[:3]
    # the un-emitted remainder must be exactly the watermark tail
    max_ts = max(r.session_end for r in out)
    missing = batch - got
    closed_missing = {
        s for s in missing if s[2] < max_ts
    }
    assert not closed_missing, sorted(closed_missing)[:3]


def test_anomaly_windows_stream_equals_batch(spark, ev_stream, ev_batch):
    """The alerting pipeline (windowed counts + stream-static broadcast
    baseline join) produces identical rows batch vs readStream."""
    baseline = ops.type_window_baseline(ev_batch)
    batch = {
        (r.window_start, r.event_type, r.n, r.is_anomaly)
        for r in ops.anomaly_windows(ev_batch, baseline).collect()
    }
    stream = {
        (r.window_start, r.event_type, r.n, r.is_anomaly)
        for r in _run(
            spark,
            ops.anomaly_windows(ev_stream, baseline),
            "t_anom",
            "complete",
        ).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_idempotent_sink_survives_batch_replay(spark, ev_stream, ev_batch, tmp_path):
    """Exactly-once under at-least-once replay: every micro-batch is
    delivered to the sink TWICE (simulating a post-write/pre-checkpoint
    crash retry); the committed output still equals the batch-exact
    result with zero duplicate rows."""
    base = str(tmp_path / "xopsink")
    import os

    os.makedirs(base, exist_ok=True)
    inner = ops.idempotent_batch_sink(base)
    deliveries = []

    def replaying(df, batch_id):
        df.persist()
        inner(df, batch_id)
        inner(df, batch_id)  # replay of an already-committed epoch
        deliveries.append(batch_id)
        df.unpersist()

    q = (
        ops.curation_map(ev_stream.selectExpr(
            "event_id AS doc_id",
            "concat(event_type, ' ', repeat('tok ', 40)) AS text",
            "'en' AS lang", "'ev' AS source",
            "length(event_type) AS n_chars",
        ))
        .writeStream.outputMode("append")
        .foreachBatch(replaying)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert deliveries, "no micro-batches delivered"
    got = ops.read_committed_batches(spark, base)
    expected = ops.curation_map(ev_batch.selectExpr(
        "event_id AS doc_id",
        "concat(event_type, ' ', repeat('tok ', 40)) AS text",
        "'en' AS lang", "'ev' AS source",
        "length(event_type) AS n_chars",
    ))
    # no duplicates despite double delivery, and content matches batch
    assert got.count() == expected.count()
    assert got.select("doc_id").distinct().count() == got.count()


def test_scd2_with_state_matches_batch_closed_intervals(spark, ev_stream, sf_dir):
    """The stateful streaming SCD2 fold emits exactly the batch
    history build's CLOSED intervals (st11's oracle-checked set); open
    versions stay in the state store."""
    import ekati_spark.queries as Q

    batch = {
        (r.user_id, r.version, r.state, r.valid_from, r.valid_to)
        for r in Q.REGISTRY["st11_stream_scd2"].fn(spark, sf_dir).collect()
    }
    out = _run(spark, ops.scd2_with_state(ev_stream), "t_scd2", "append").collect()
    got = {
        (r.user_id, r.version, r.state, r.valid_from, r.valid_to) for r in out
    }
    assert got == batch


def test_restart_resumes_from_checkpoint_no_loss_no_dup(spark, tmp_path):
    """Stop a file-source stream, land new data, restart with the SAME
    checkpoint: the second run must process only the new files and the
    sink must equal the batch union exactly once — the recovery
    contract a long-running 100 TB ingest pipeline depends on."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    a.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id long, v string")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    b = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
    b.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_dedup_ingest_drops_cross_batch_dups_and_is_replay_safe(spark, tmp_path):
    """Batch 2's duplicate of a batch-1 document must be dropped by the
    anti-join against the landed digest set; re-running with the same
    checkpoint must land nothing new (idempotent replay)."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    cols = "doc_id long, text string, lang string, source string, n_chars long"
    a = spark.createDataFrame(
        [(1, "alpha  beta", "en", "s0", 10), (2, "Gamma", "en", "s0", 5)], cols
    )
    a.coalesce(1).write.mode("append").parquet(src)
    first = ops.dedup_ingest(spark, src, out, ck)
    assert first.count() == 2
    # batch 2: id 3 normalizes identically to id 1 ("alpha beta"); id 4 new
    b = spark.createDataFrame(
        [(3, "ALPHA BETA", "en", "s1", 10), (4, "delta", "en", "s1", 5)], cols
    )
    b.coalesce(1).write.mode("append").parquet(src)
    second = ops.dedup_ingest(spark, src, out, ck)
    got = sorted(r.doc_id for r in second.collect())
    assert got == [1, 2, 4]  # 3 deduped against batch 1's digest
    third = ops.dedup_ingest(spark, src, out, ck)  # no new files: no-op
    assert sorted(r.doc_id for r in third.collect()) == [1, 2, 4]


def test_stream_stream_full_join(spark, ev_stream, ev_batch):
    """Full-outer stream-stream join: matched rows equal batch; each
    side's null-padded rows appear only when its join window closed
    before the final watermark, and every emitted null row is a true
    batch null row on the same side."""
    batch_rows = ops.stream_stream_full_join(ev_batch).collect()
    batch_matched = {
        (r.click_id, r.purchase_id)
        for r in batch_rows
        if r.click_id is not None and r.purchase_id is not None
    }
    batch_null_clicks = {
        r.click_id for r in batch_rows if r.purchase_id is None
    }
    batch_null_buys = {r.purchase_id for r in batch_rows if r.click_id is None}
    out = _run(
        spark, ops.stream_stream_full_join(ev_stream), "t_ssfj", "append"
    ).collect()
    stream_matched = {
        (r.click_id, r.purchase_id)
        for r in out
        if r.click_id is not None and r.purchase_id is not None
    }
    stream_null_clicks = {r.click_id for r in out if r.purchase_id is None}
    stream_null_buys = {r.purchase_id for r in out if r.click_id is None}
    assert stream_matched == batch_matched
    assert stream_null_clicks <= batch_null_clicks
    assert stream_null_buys <= batch_null_buys
    assert len(batch_matched) > 0
    # full-outer accounts for BOTH sides: batch row-identity check
    assert len(batch_null_buys) > 0 and len(batch_null_clicks) > 0


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas driver worker requires the "
    "protobuf package (absent in this container); the batch twin "
    "spend_alerts_batch is oracle-checked via st14",
)
def test_transform_with_state_spend_alerts(spark, ev_stream, ev_batch):
    """NEW Spark 4 stateful API (transformWithStateInPandas): the
    streaming alert feed must equal the batch window replay exactly —
    same crossings, same levels, same integer cum_cents."""
    expect = {
        (r.user_id, r.event_id, r.level, r.cum_cents)
        for r in ops.spend_alerts_batch(ev_batch).collect()
    }
    out = _run(spark, ops.spend_alerts(ev_stream), "t_tws", "update")
    got = {
        (r.user_id, r.event_id, r.level, r.cum_cents)
        for r in out.collect()
    }
    assert got == expect
    assert len(expect) > 100


def test_spend_alerts_batch_crossing_semantics(spark):
    """Unit semantics of the alert feed (runs regardless of protobuf):
    crossings emit exactly at the event that passes each multiple, with
    the integer cum at that point; multi-level jumps emit once at the
    highest level reached."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", 300.0),   # cum 300   -> no alert
        (1, 2, "2024-01-01 00:01:00", 250.0),   # cum 550   -> level 1
        (1, 3, "2024-01-01 00:02:00", 1100.0),  # cum 1650  -> level 3
        (2, 4, "2024-01-01 00:00:30", 499.99),  # cum 499.99-> no alert
        (2, 5, "2024-01-01 00:00:45", 0.01),    # cum 500.00-> level 1
    ]
    df = spark.createDataFrame(
        [(u, e, t, v) for u, e, t, v in rows],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.user_id, r.event_id): (r.level, r.cum_cents)
        for r in ops.spend_alerts_batch(df).collect()
    }
    assert got == {
        (1, 2): (1, 55000),
        (1, 3): (3, 165000),
        (2, 5): (1, 50000),
    }


def test_kmv_stream_multibatch_and_replay_idempotent(spark, tmp_path):
    """kmv_distinct_stream must actually run multiple micro-batches
    (one partial per batch in the state dir) and absorb a full replay
    (fresh checkpoint, same state dir) with zero drift."""
    import glob

    from ekati_spark.streaming.ops import kmv_distinct_stream

    rows = [(i, i % 40) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    src = tmp_path / "src"
    src.mkdir()
    for m in range(3):
        part = tmp_path / f"c{m}"
        df.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        pq = next(part.glob("*.parquet"))
        pq.rename(src / f"part-{m}.parquet")

    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    out1 = kmv_distinct_stream(
        spark, str(src), state, ck, "event_id long, user_id long", k=16
    ).collect()[0]
    # 40 distinct users > k=16 -> estimator regime; 3 partials appended
    assert out1.sketch_size == 16
    partials = glob.glob(f"{state}/*.parquet")
    assert len(partials) >= 3
    # replay everything with a FRESH checkpoint into the SAME state dir:
    # duplicate partials must not change the merged sketch
    out2 = kmv_distinct_stream(
        spark, str(src), state, str(tmp_path / "ck2"),
        "event_id long, user_id long", k=16,
    ).collect()[0]
    assert (out2.sketch_size, out2.kth_min, out2.est_kmv) == (
        out1.sketch_size, out1.kth_min, out1.est_kmv
    )


def test_countmin_stream_replay_exactly_once(spark, tmp_path):
    """CM partials are keyed by batch id: replaying the whole stream
    with a fresh checkpoint into the same state dir must NOT
    double-count (addition is not idempotent — the epoch-keyed dedup
    is what makes it exactly-once)."""
    from ekati_spark.streaming.ops import countmin_stream

    rows = [(i, i % 10) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    src = tmp_path / "src"
    src.mkdir()
    for m in range(2):
        part = tmp_path / f"c{m}"
        df.filter(F.col("event_id") % 2 == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        next(part.glob("*.parquet")).rename(src / f"part-{m}.parquet")

    state = str(tmp_path / "state")
    g1 = {
        (r.d, r.bucket): r.c
        for r in countmin_stream(
            spark, str(src), state, str(tmp_path / "ck1"),
            "event_id long, user_id long",
        ).collect()
    }
    assert sum(g1.values()) == 4 * 300  # depth x events, exactly once
    g2 = {
        (r.d, r.bucket): r.c
        for r in countmin_stream(
            spark, str(src), state, str(tmp_path / "ck2"),
            "event_id long, user_id long",
        ).collect()
    }
    assert g2 == g1


def test_compact_committed_batches_preserves_state(spark, tmp_path):
    """Counter-delta store: compaction with a re-sum merge must leave
    read_committed_batches' merged view IDENTICAL, fold every source
    batch, and survive a crash between the compacted marker landing
    and source removal (sentinel-driven recovery)."""
    import json
    import os

    from pyspark.sql import functions as F

    from ekati_spark.streaming import ops

    store = str(tmp_path / "partials")
    os.makedirs(store)
    sink = ops.idempotent_batch_sink(store)
    for b in range(4):
        df = spark.createDataFrame(
            [(p, 1) for p in range(b, b + 8)], "pos long, d long"
        )
        sink(df, b)

    def merged_view():
        return {
            r["pos"]: r["cnt"]
            for r in ops.read_committed_batches(spark, store)
            .groupBy("pos")
            .agg(F.sum("d").alias("cnt"))
            .collect()
        }

    before = merged_view()
    n = ops.compact_committed_batches(
        spark, store, merge=lambda df: df.groupBy("pos").agg(
            F.sum("d").alias("d")
        )
    )
    assert n == 4
    assert merged_view() == before
    markers = [f for f in os.listdir(store) if f.startswith("_committed_")]
    assert len(markers) == 1 and markers[0].startswith("_committed_-")

    # append more epochs, compact again: the new id must go below the
    # previous compaction's, never collide with stream epochs
    sink(spark.createDataFrame([(99, 5)], "pos long, d long"), 7)
    before2 = merged_view()
    assert ops.compact_committed_batches(spark, store) == 2
    assert merged_view() == before2

    # crash window: sentinel present, compacted marker present, sources
    # not yet removed -> re-run finishes removal without re-reading
    ids = sorted(
        int(f.rsplit("_", 1)[1])
        for f in os.listdir(store)
        if f.startswith("_committed_")
    )
    sink(spark.createDataFrame([(100, 1)], "pos long, d long"), 9)
    all_ids = ids + [9]
    cid = min(-(max(all_ids) + 1), min(all_ids) - 1)
    with open(os.path.join(store, "_compact_inprogress"), "w") as fh:
        json.dump({"ids": all_ids, "cid": cid}, fh)
    ops.read_committed_batches(spark, store).write.mode(
        "overwrite"
    ).parquet(os.path.join(store, f"batch_id={cid}"))
    with open(os.path.join(store, f"_committed_{cid}"), "w"):
        pass
    want = merged_view()  # double-visible window: cid + sources
    assert ops.compact_committed_batches(spark, store) == len(all_ids)
    got = merged_view()
    # recovery removed the doubled sources; cid's contents alone remain
    assert set(got) == set(want)


def test_compaction_high_water_mark_blocks_folded_replays(spark, tmp_path):
    """Compaction deletes the per-epoch _committed_<n> markers — the
    sink's only replay-dedup evidence. The _compacted_through_<max>
    high-water mark must make the sink skip a replay of any folded
    epoch (crash-after-sink-commit + offline compaction scenario),
    while epochs above the mark still land."""
    import os

    from pyspark.sql import functions as F

    from ekati_spark.streaming import ops

    store = str(tmp_path / "hwm")
    os.makedirs(store)
    sink = ops.idempotent_batch_sink(store)
    for b in range(3):
        sink(spark.createDataFrame([(b, 1)], "pos long, d long"), b)
    assert ops.compact_committed_batches(spark, store) == 3
    hwms = [f for f in os.listdir(store)
            if f.startswith("_compacted_through_")]
    assert hwms == ["_compacted_through_2"]

    def total():
        return (
            ops.read_committed_batches(spark, store)
            .agg(F.sum("d")).collect()[0][0]
        )

    before = total()
    # replay of folded epoch 1: marker gone, HWM must block the re-land
    sink(spark.createDataFrame([(1, 100)], "pos long, d long"), 1)
    assert total() == before
    assert not os.path.exists(os.path.join(store, "_committed_1"))
    # a NEW epoch above the mark still lands
    sink(spark.createDataFrame([(9, 7)], "pos long, d long"), 3)
    assert total() == before + 7
    # second compaction advances the mark and retires the old one
    assert ops.compact_committed_batches(spark, store) == 2
    hwms = sorted(f for f in os.listdir(store)
                  if f.startswith("_compacted_through_"))
    assert hwms == ["_compacted_through_3"]
    sink(spark.createDataFrame([(3, 50)], "pos long, d long"), 2)
    assert total() == before + 7
