"""Adversarial-corpus robustness: the driver's synthetic documents are
uniformly well-formed (non-null, tokenful, ASCII). Real corpora are not.
Every text/dedup/curation query must complete — no crash, no dropped
doc_id duplication, no null leakage into key output columns — on a
corpus of the classic nasties: empty string, whitespace-only, NULL
text, a single huge token, unicode (CJK/emoji/combining), control
characters, and a 1-token doc.

This is a crash-free/shape contract, not a value oracle (the DuckDB
differential already covers values on the driver corpus).
"""

from __future__ import annotations

import pytest

import ekati_spark.queries as Q

# Representative coverage: every text-pipeline family that tokenizes,
# hashes, or aggregates per-document.
QUERIES = [
    "l01_dedup_exact",
    "l03_minhash_lsh_pairs",
    "l04_simhash_pairs",
    "l08_text_stats",
    "l10_quality_filter",
    "l14_top_bigrams",
    "l21_stratified_sample",
    "l27_unigram_logprob",
    "l38_chunk_dedup_rewrite",
    "l48_quality_classifier",
    "l49_dsir_importance",
    "l52_bigram_interp_logprob",
    "l55_lsh_recall_audit",
    "l56_ngram_novelty",
]

ROWS = [
    (1, "en", "src0", ""),                       # empty
    (2, "en", "src0", "   \t  \n "),             # whitespace-only
    (3, "de", "src1", None),                     # NULL text
    (4, "en", "src1", "x" * 50_000),             # one huge token
    (5, "zh", "src2", "汉字 漢字 かな カナ 한글"),  # CJK
    (6, "en", "src2", "👩‍👩‍👧‍👦 🦄 é é"),  # emoji/ZWJ/combining
    (7, "en", "src3", "a\x00b \x07control \x1fchars"),
    (8, "fr", "src3", "seul"),                   # single token
    (9, "en", "src4", "the the the the the"),    # degenerate repetition
    (10, "en", "src4", "normal words appear here for baseline behavior"),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    df = spark.createDataFrame(
        [(i, lg, s, t, len(t) if t else 0) for i, lg, s, t in ROWS],
        ["doc_id", "lang", "source", "text", "n_chars"],
    )
    df.write.parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_completes(spark, edge_dir, name):
    rows = Q.REGISTRY[name].fn(spark, edge_dir).collect()
    # shape contracts: collect() itself proves no crash / no Arrow
    # serialization failure; additionally no null in any *_id output
    # column (a null key would corrupt downstream joins).
    for r in rows:
        d = r.asDict()
        for k, v in d.items():
            if k.endswith("doc_id") or k in ("id_a", "id_b", "kept_id"):
                assert v is not None, (name, d)
