"""Text-analysis operators for training-data pipelines: tokenization,
language ID, quality scoring, fingerprinting.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every helper returns Columns or
DataFrames so they compose into larger declarative plans; at 100 TB these
are embarrassingly parallel per-row maps with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Minimal per-language stopword lists (deterministic, self-contained).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "para"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai"],
}


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization (split on runs of spaces)."""
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(t), " +")


def word_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: alphabetic runs (portable across engines)."""
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def stopword_hits(text: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens(text)),
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of distinct-stopword hits, ties broken
    by language code ascending; 'und' when nothing matches.

    Implemented as ``least`` over (-hits, lang) structs — lexicographic
    struct comparison is portable to the DuckDB oracle verbatim."""
    structs = [
        F.struct(
            (-stopword_hits(text, lg)).alias("neg_hits"),
            F.lit(lg).alias("lang"),
        )
        for lg in sorted(STOPWORDS)
    ]
    best = F.least(*structs)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + distinct-token
    ratio + alpha-character ratio (the usual pretraining-filter features)."""
    n_tok = token_count(text)
    len_score = F.when((n_tok >= 10) & (n_tok <= 200), 1.0).otherwise(0.5)
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("double")
        / F.greatest(F.length(text), F.lit(1))
    )
    return F.round(
        (len_score + distinct_token_ratio(text) + alpha_ratio) / 3.0, 6
    )


def content_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set. Identical token multiset ⇒ identical fingerprint; robust to
    token reordering (a cheap SQL-portable cousin of winnowing)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard per-document stats block (used by the quality queries)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.size(F.array_distinct(tokens(t))).alias("n_distinct_tokens"),
        F.round(distinct_token_ratio(t), 6).alias("distinct_ratio"),
        F.length(t).alias("n_chars_measured"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        content_fingerprint(t).alias("fingerprint"),
    )


BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_ish_tokens(text: Column) -> Column:
    """GPT-2-style pre-tokenization (contractions, space-prefixed word /
    number / punctuation runs) via one regexp_extract_all — the standard
    first stage of BPE token counting for training-data budgeting. The
    ASCII-class pattern is portable between Java regex (Spark) and RE2
    (DuckDB), which keeps it oracle-checkable."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))
