"""N-Triples loader (reference: grammar ``src/cli-grammer/NTRIPLES.g4``,
listener ``src/parser/NtriplesListener.cs:30-56``, streaming chunked
ingest ``src/server/Services/WatService.cs:97-300``).

Semantics preserved:
- one props row per triple: subject node, predicate key;
- IRI objects → ref (edge); plain literal → str; typed literal
  ``"..."^^<t>`` → value + meta_type=t (the listener puts the type IRI in
  MetaData.Nodeid); lang literal ``"..."@en`` → meta_lang (listener's
  ``"lang:@en"`` marker, NtriplesListener.cs:44-49);
- blank nodes relabel to ``blank:<runid>:<label>`` (NtriplesListener.cs:18-29).

Spark-first: ``spark.read.text`` + regexp extraction — fully distributed,
so unlike the reference's 81920-byte driver-side buffer loop this scales
to arbitrarily large .nt files; the reference's micro-batch-of-600
group-by-subject (WatService.cs:142-153) is replaced by Spark
partitioning (grouping is implicit in the long format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# subject: IRI or blank; predicate: IRI; object: IRI | blank | literal
_TRIPLE = (
    r"^\s*"
    r"(?:<([^>]*)>|_:(\S+))\s+"  # 1 subj iri | 2 subj blank
    r"<([^>]*)>\s+"  # 3 predicate
    r"(?:<([^>]*)>"  # 4 obj iri
    r"|_:(\S+)"  # 5 obj blank
    r"|\"((?:[^\"\\]|\\.)*)\""  # 6 literal body
    r"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?"  # 7 type iri | 8 lang
    r")\s*\.\s*$"
)


def load_ntriples(
    spark: SparkSession, path: str, run_id: str = "run", ts: int = 0
) -> DataFrame:
    lines = spark.read.text(path)
    m = lambda g: F.regexp_extract(F.col("value"), _TRIPLE, g)  # noqa: E731
    parsed = (
        lines.filter(
            (F.trim("value") != "") & ~F.trim(F.col("value")).startswith("#")
        )
        .select(
            m(1).alias("s_iri"),
            m(2).alias("s_blank"),
            m(3).alias("pred"),
            m(4).alias("o_iri"),
            m(5).alias("o_blank"),
            m(6).alias("o_lit"),
            m(7).alias("o_type"),
            m(8).alias("o_lang"),
        )
        .filter(F.col("pred") != "")
    )
    blank = lambda c: F.concat(F.lit(f"blank:{run_id}:"), c)  # noqa: E731
    subj = F.when(F.col("s_iri") != "", F.col("s_iri")).otherwise(
        blank(F.col("s_blank"))
    )
    is_ref = (F.col("o_iri") != "") | (F.col("o_blank") != "")
    ref_target = F.when(F.col("o_iri") != "", F.col("o_iri")).otherwise(
        blank(F.col("o_blank"))
    )
    # Escape-sequence order matters: protect escaped backslashes behind a
    # sentinel FIRST, or '\\n' (backslash + letter n) decodes as a
    # newline. \uXXXX escapes are left verbatim (documented limitation).
    sentinel = "\ue000"  # private-use char, cannot occur in valid N-Triples
    unescape = F.col("o_lit")
    for pat, rep in (
        (r"\\\\", sentinel),
        (r'\\"', '"'),
        (r"\\n", "\n"),
        (r"\\t", "\t"),
        (r"\\r", "\r"),
        (sentinel, "\\\\"),
    ):
        unescape = F.regexp_replace(unescape, pat, rep)
    return parsed.select(
        subj.alias("node_id"),
        F.lit("").alias("remote"),
        F.col("pred").alias("key"),
        F.lit(ts).cast("long").alias("ts"),
        F.when(is_ref, "ref").otherwise("str").alias("dtype"),
        F.when(~is_ref, unescape).alias("str"),
        F.lit(None).cast("long").alias("i64"),
        F.lit(None).cast("double").alias("dbl"),
        F.lit(None).cast("boolean").alias("bool"),
        F.when(is_ref, ref_target).alias("ref"),
        F.lit(None).cast("binary").alias("bytes"),
        F.when(F.col("o_type") != "", F.col("o_type")).alias("meta_type"),
        F.when(F.col("o_lang") != "", F.col("o_lang")).alias("meta_lang"),
    )
