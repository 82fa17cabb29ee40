"""Bloom-filter operator tests: no-false-negative guarantee, bounded
false positives, word-table/bitmap equivalence, and the substring
scrub rewrite."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

import ekati_spark.operators.bloom as BL
from ekati_spark.operators.dedup import scrub_duplicate_spans


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], "v string"
    )


def _ref_pos(v: str, j: int, m: int) -> int:
    return int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16) % m


def test_bloom_position_matches_reference_md5(spark, members):
    m = 1024
    got = {
        r["v"]: (r["p0"], r["p1"])
        for r in members.select(
            "v",
            BL.bloom_position(F.col("v"), 0, m).alias("p0"),
            BL.bloom_position(F.col("v"), 1, m).alias("p1"),
        ).collect()
    }
    for v, (p0, p1) in got.items():
        assert p0 == _ref_pos(v, 0, m) and p1 == _ref_pos(v, 1, m)


def test_bloom_no_false_negatives(spark, members):
    m, k = 1024, 3
    bitmap = BL.bloom_bitmap(members, "v", m, k)
    probed = BL.bloom_probe(members, "v", bitmap, m, k)
    assert probed.filter(~F.col("is_candidate")).count() == 0


def test_bloom_false_positives_bounded_and_deterministic(spark, members):
    # 200 members * 3 hashes in 1024 bits -> fill ~44%, fp ~8.7%;
    # assert the measured rate sits under 4x theory and replays exactly.
    m, k = 1024, 3
    bitmap = BL.bloom_bitmap(members, "v", m, k)
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "v string"
    )
    fp1 = sorted(
        r["v"]
        for r in BL.bloom_probe(others, "v", bitmap, m, k)
        .filter("is_candidate")
        .collect()
    )
    fill = (
        sum(bin(int(w) & 0xFFFFFFFFFFFFFFFF).count("1") for w in bitmap) / m
    )
    assert 0 < len(fp1) < 500  # some fps at this sizing, never all
    assert len(fp1) / 500 < 4 * fill**k
    fp2 = sorted(
        r["v"]
        for r in BL.bloom_probe(others, "v", bitmap, m, k)
        .filter("is_candidate")
        .collect()
    )
    assert fp1 == fp2


def test_bloom_word_table_matches_bitmap(spark, members):
    m, k = 1024, 2
    bitmap = BL.bloom_bitmap(members, "v", m, k)
    words = {
        r["word_idx"]: r["word"]
        for r in BL.bloom_word_table(members, "v", m, k).collect()
    }
    for idx in range(m // 64):
        assert int(bitmap[idx]) == words.get(idx, 0)


def test_scrub_removes_exactly_duplicated_spans(spark):
    shared = " ".join(f"s{i}" for i in range(8))  # one duplicated 8-gram
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma delta {shared}"),
            (3, "unique words only here"),
            (4, shared),  # fully duplicated -> scrubs to empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(docs, n=8, min_count=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_removed"] == 8 and out[1]["n_tokens"] == 10
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 8
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert out[4]["scrubbed_digest"] == empty_md5
    assert (
        out[1]["scrubbed_digest"] == hashlib.md5(b"alpha beta").hexdigest()
    )
    assert (
        out[3]["scrubbed_digest"]
        == hashlib.md5(b"unique words only here").hexdigest()
    )


def test_scrub_merges_overlapping_spans(spark):
    # 10 shared tokens -> three overlapping dup 8-grams in doc 1 must
    # merge into ONE 10-token cut, not 24 removals.
    run = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"head {run} tail"), (2, run)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(docs, n=8, min_count=2).collect()
    }
    assert out[1]["n_removed"] == 10
    assert (
        out[1]["scrubbed_digest"] == hashlib.md5(b"head tail").hexdigest()
    )


def test_bpe_encode_greedy_semantics(spark):
    """Hand-checked greedy single-pass semantics: run-alternation on
    repeated pairs, no cascade onto merged symbols, digest equals the
    md5 of the expected symbol stream."""
    import hashlib

    from ekati_spark.operators.text import bpe_encode_greedy

    rules = spark.createDataFrame(
        [("a", "a"), ("b", "c"), ("x", "y")],
        "tok_a string, tok_b string",
    )
    docs = spark.createDataFrame(
        [
            (1, "a a a"),        # run of 3: merge (0,1), emit a
            (2, "a a a a"),      # run of 4: two merges
            (3, "b c d"),        # plain pair merge
            (4, "x b c y"),      # x_y must NOT fire across the merge
            (5, "q r s"),        # no rules apply
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in bpe_encode_greedy(docs, rules).collect()
    }

    def dg(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert (out[1]["n_tokens"], out[1]["n_merges"]) == (3, 1)
    assert out[1]["encoded_digest"] == dg("a_a a")
    assert (out[2]["n_tokens"], out[2]["n_merges"]) == (4, 2)
    assert out[2]["encoded_digest"] == dg("a_a a_a")
    assert out[3]["encoded_digest"] == dg("b_c d")
    # b_c consumed c, so (x,y) never becomes adjacent: x b_c y
    assert out[4]["n_merges"] == 1
    assert out[4]["encoded_digest"] == dg("x b_c y")
    assert out[5]["n_merges"] == 0
    assert out[5]["encoded_digest"] == dg("q r s")


def test_counting_bloom_delete_preserves_survivors(spark):
    """The counting-filter contract: after deleting any subset of what
    was added, every SURVIVOR still probes candidate (no false
    negatives through GC), and a deleted value whose counters aren't
    aliased probes absent."""
    from ekati_spark.operators.bloom import (
        counting_bloom_counts,
        counting_bloom_probe,
    )

    m, k = 4096, 3
    adds = spark.createDataFrame(
        [(f"v{i}",) for i in range(120)], "v string"
    )
    dels = spark.createDataFrame(
        [(f"v{i}",) for i in range(0, 120, 2)], "v string"  # evens out
    )
    counts = counting_bloom_counts(adds, dels, "v", m, k)
    probed = {
        r["v"]: r["is_candidate"]
        for r in counting_bloom_probe(adds, "v", counts, m, k).collect()
    }
    survivors = [f"v{i}" for i in range(1, 120, 2)]
    assert all(probed[v] for v in survivors)  # NEVER a false negative
    # at 360 add-positions in 4096 bits, alias fp on deleted values is
    # rare: most evens must now probe absent
    deleted = [f"v{i}" for i in range(0, 120, 2)]
    absent = sum(1 for v in deleted if not probed[v])
    assert absent > len(deleted) * 0.8


def test_counting_bloom_multiset_semantics(spark):
    """Add twice, delete once -> still a member (counters track
    multiplicity, the property a plain bitmap cannot provide)."""
    from ekati_spark.operators.bloom import (
        counting_bloom_counts,
        counting_bloom_probe,
    )

    m, k = 1024, 3
    adds = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    dels = spark.createDataFrame([("x",)], "v string")
    counts = counting_bloom_counts(adds, dels, "v", m, k)
    probe = spark.createDataFrame([("x",), ("y",)], "v string")
    got = {
        r["v"]: r["is_candidate"]
        for r in counting_bloom_probe(probe, "v", counts, m, k).collect()
    }
    assert got == {"x": True, "y": True}
    # delete the second x: now absent (y's 3 counters can alias at
    # most 3 of x's; with distinct positions x drops to 0)
    dels2 = spark.createDataFrame([("x",), ("x",)], "v string")
    counts2 = counting_bloom_counts(adds, dels2, "v", m, k)
    got2 = {
        r["v"]: r["is_candidate"]
        for r in counting_bloom_probe(probe, "v", counts2, m, k).collect()
    }
    assert got2["y"] is True
    assert got2["x"] is False


def test_winnowing_shared_run_guarantee(spark):
    """The winnowing guarantee: two documents sharing a run of
    >= w+k-1 = 8 tokens MUST share at least one fingerprint; disjoint
    docs share none; selection density ~ 2/(w+1)."""
    import random

    from ekati_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(3)
    shared = " ".join(f"s{i}" for i in range(8))
    noise = lambda n: " ".join(  # noqa: E731
        f"n{rng.randint(0, 10**9)}" for _ in range(n)
    )
    docs = spark.createDataFrame(
        [
            (1, f"{noise(15)} {shared} {noise(15)}"),
            (2, f"{noise(20)} {shared}"),
            (3, noise(40)),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=4, w=5)
    by_doc = {
        i: {r["fph"] for r in fp.filter(F.col("id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared 8-token run must collide"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: doc 3 has 37 grams, expect ~2/(w+1)=1/3 selected
    assert 4 <= len(by_doc[3]) <= 25


def test_bloom_auto_sizing(spark, members):
    """m=None applies the integer sizing rule (13 bits/member, word
    aligned), the probe derives m from the bitmap itself, and the fp
    rate lands near the ~0.9% design point instead of fixture-m luck."""
    bitmap = BL.bloom_bitmap(members, "v")  # 200 members
    assert bitmap.size * 64 == BL.bloom_params(200) == 2624
    probed = BL.bloom_probe(members, "v", bitmap)  # m from bitmap
    assert probed.filter(~F.col("is_candidate")).count() == 0
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], "v string"
    )
    fp = (
        BL.bloom_probe(others, "v", bitmap)
        .filter("is_candidate")
        .count()
    )
    assert fp <= 2000 * 0.03  # ~0.9% design fp, 3x headroom


def test_bloom_m_sql_matches_python(spark):
    """The oracle-side sizing expression reproduces bloom_params for
    counts spanning word boundaries."""
    import duckdb

    for n in (1, 2, 4, 5, 63, 64, 65, 200, 4921, 65536):
        (got,) = duckdb.sql(
            "SELECT " + BL.BLOOM_M_SQL.format(n=n)
        ).fetchone()
        assert got == BL.bloom_params(n), n


def test_winnow_rejects_oversized_docs(spark):
    """Positions >= 2^21 would silently corrupt the packed winnowing
    key; the guard must abort the job instead."""
    from ekati_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "w " * (2097152 + 16))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds 2\\^21 grams"):
        winnow_fingerprints(docs, k=4, w=5).collect()


def test_l94_confirm_join_survives_unbroadcastable_reference(spark, sf_dir):
    """Round-11 verdict item 4: l94's stated reason to exist is a
    reference set too large to broadcast-join exactly, so the exact
    confirm must NOT hard-hint broadcast on the reference grams. With
    autoBroadcastJoinThreshold forced below the reference-gram size,
    the confirm join must plan (and run) as a shuffle join and produce
    the same result as the unconstrained run."""
    from ekati_spark.queries import REGISTRY

    fn = REGISTRY["l94_bloom_decontaminate"].fn
    baseline = {
        (r.doc_id, r.n_hit_ngrams, r.n_fp_grams)
        for r in fn(spark, sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        got = {
            (r.doc_id, r.n_hit_ngrams, r.n_fp_grams) for r in df.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == baseline
