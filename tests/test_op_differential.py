"""Randomized differential tests: run the distributed operator ONCE
over a seeded random corpus and compare every row against a pure-Python
reference implementation — the l02/l55-style exactness pin, applied to
the round-10 rewrite operators (BPE encode, substring scrub), whose
window/island formulations are easy to get subtly wrong at run
boundaries."""

from __future__ import annotations

import hashlib
import random

import pytest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_bpe(tokens: list[str], rules: set[tuple[str, str]]):
    """Reference greedy left-to-right single-pass encode."""
    syms = []
    merges = 0
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and (tokens[i], tokens[i + 1]) in rules:
            syms.append(tokens[i] + "_" + tokens[i + 1])
            merges += 1
            i += 2
        else:
            syms.append(tokens[i])
            i += 1
    return len(tokens), merges, _md5(" ".join(syms))


def test_bpe_encode_matches_python_reference(spark):
    from ekati_spark.operators.text import bpe_encode_greedy

    rng = random.Random(42)
    alpha = [f"w{i}" for i in range(6)]
    docs = [
        (i, " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 30))))
        for i in range(200)
    ]
    pairs = set()
    while len(pairs) < 8:
        pairs.add((rng.choice(alpha), rng.choice(alpha)))
    rules_df = spark.createDataFrame(
        sorted(pairs), "tok_a string, tok_b string"
    )
    docs_df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_merges"], r["encoded_digest"])
        for r in bpe_encode_greedy(docs_df, rules_df).collect()
    }
    assert len(got) == 200
    for i, text in docs:
        assert got[i] == _ref_bpe(text.split(" "), pairs), (i, text)


def _ref_scrub(corpus: dict[int, list[str]], n: int):
    """Reference corpus-duplicated-span scrub."""
    from collections import Counter

    counts = Counter()
    for toks in corpus.values():
        for i in range(len(toks) - n + 1):
            counts[tuple(toks[i : i + n])] += 1
    out = {}
    for did, toks in corpus.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            if counts[tuple(toks[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (len(toks), len(covered), _md5(" ".join(kept)))
    return out


def test_scrub_matches_python_reference(spark):
    from ekati_spark.operators.dedup import scrub_duplicate_spans

    rng = random.Random(7)
    alpha = [f"t{i}" for i in range(5)]  # small alphabet -> dense dups
    corpus = {
        i: [rng.choice(alpha) for _ in range(rng.randint(1, 25))]
        for i in range(150)
    }
    docs_df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_digest"])
        for r in scrub_duplicate_spans(docs_df, n=3, min_count=2).collect()
    }
    ref = _ref_scrub(corpus, 3)
    assert got == ref


def test_video_shingle_jaccard_matches_reference(spark, sf_dir):
    """l99's pair Jaccard against a per-pair Python recomputation on a
    doc subset — pins the inverted-index join + ppm arithmetic."""
    from ekati_spark.queries.base import REGISTRY

    rows = REGISTRY["l99_video_neardup"].fn(spark, sf_dir).collect()

    # rebuild signatures in Python for the observed pairs
    def frames(doc_id):
        dur = 900 + (doc_id * 37) % 9000
        key = doc_id % 250
        hs = []
        for t in range(0, dur, 1000):
            h = int(hashlib.md5(f"vf:{key}:{t}".encode()).hexdigest()[:15], 16)
            hs.append(h)
        return hs

    def shingles(doc_id):
        hs = frames(doc_id)
        return {
            f"{hs[i]}-{hs[i+1]}-{hs[i+2]}" for i in range(len(hs) - 2)
        }

    assert rows, "expected near-dup pairs at this sf"
    for r in rows[:50]:
        sa, sb = shingles(r["id_a"]), shingles(r["id_b"])
        shared = len(sa & sb)
        ppm = (1000000 * shared) // (len(sa) + len(sb) - shared)
        assert ppm == r["jaccard_ppm"], (r["id_a"], r["id_b"])
        assert ppm >= 200000


def test_winnowing_matches_python_reference(spark):
    """Winnowing selection (k=4, w=5) against a positionally-faithful
    Python reference over a seeded random corpus — pins the integer-key
    encoding (min hash, rightmost position), the full-window rule, and
    the distinct-fingerprint semantics."""
    import random

    from ekati_spark.operators.dedup import MERSENNE_31, winnow_fingerprints

    rng = random.Random(13)
    alpha = [f"w{i}" for i in range(7)]
    corpus = {
        i: [rng.choice(alpha) for _ in range(rng.randint(1, 40))]
        for i in range(120)
    }
    docs_df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {}
    for r in winnow_fingerprints(docs_df, k=4, w=5).collect():
        got.setdefault(r["id"], set()).add(r["fph"])

    def ref(toks, k=4, w=5):
        hs = [
            int(
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[
                    :15
                ],
                16,
            )
            % MERSENNE_31
            for i in range(len(toks) - k + 1)
        ]
        out = set()
        for e in range(w - 1, len(hs)):  # full windows only
            win = hs[e - w + 1 : e + 1]
            m = min(win)
            # rightmost occurrence of the min
            j = max(idx for idx, h in enumerate(win) if h == m)
            out.add(win[j])
        return out

    for i, toks in corpus.items():
        want = ref(toks)
        assert got.get(i, set()) == want, i
