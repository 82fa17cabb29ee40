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

import time
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ekati_spark.checkpoint import cut_lineage

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


_SENTINEL = "\ue000"  # stands in for escaped backslashes mid-unescape


@F.pandas_udf(T.StringType())
def _decode_unicode_escapes(s: pd.Series) -> pd.Series:
    """Decode ``\\uXXXX`` / ``\\UXXXXXXXX`` escapes (surrogate pairs
    first, so emoji round-trip) AND restore sentineled backslashes, in
    ONE left-to-right pass — a decoded char is never reprocessed, so a
    literal ``\\uE000`` (which decodes to the sentinel code point) comes
    through intact instead of being rewritten to a backslash. Runs only
    on rows that still contain an escape — the rlike gate keeps the
    common path JVM-side."""
    import re

    pat = re.compile(
        r"(\ue000)"
        r"|\\u([Dd][89ABab][0-9A-Fa-f]{2})\\u([Dd][C-Fc-f][0-9A-Fa-f]{2})"
        r"|\\u([0-9A-Fa-f]{4})"
        r"|\\U([0-9A-Fa-f]{8})"
    )

    def sub(m: "re.Match") -> str:
        if m.group(1):
            return "\\"
        if m.group(2):
            return chr(
                0x10000
                + ((int(m.group(2), 16) - 0xD800) << 10)
                + (int(m.group(3), 16) - 0xDC00)
            )
        cp = int(m.group(4) or m.group(5), 16)
        # an UNPAIRED surrogate escape (\uD800 with no low half — the
        # pair branch above didn't match) would chr() into a lone
        # surrogate that Arrow's UTF-8 serializer rejects, crashing the
        # whole load on one malformed literal; map it to U+FFFD like
        # every tolerant decoder does
        if 0xD800 <= cp <= 0xDFFF:
            return "�"
        return chr(cp)

    return s.map(lambda v: None if v is None else pat.sub(sub, v))


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
    # newline. \uXXXX decoding happens while real backslashes are still
    # sentineled (so '\\\\u0041' stays literal), via an Arrow UDF gated to
    # the rare rows that actually contain the pattern.
    unescape = F.col("o_lit")
    for pat, rep in (
        (r"\\\\", _SENTINEL),
        (r'\\"', '"'),
        (r"\\n", "\n"),
        (r"\\t", "\t"),
        (r"\\r", "\r"),
    ):
        unescape = F.regexp_replace(unescape, pat, rep)
    # the UDF branch decodes escapes AND restores sentinels in one pass
    # (a second restore would corrupt a decoded U+E000); the plain branch
    # only needs the restore
    unescape = F.when(
        unescape.rlike(r"\\[uU]"), _decode_unicode_escapes(unescape)
    ).otherwise(F.regexp_replace(unescape, _SENTINEL, "\\\\"))
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


def load_ntriples_url(
    spark: SparkSession,
    url: str,
    run_id: str = "run",
    ts: int = 0,
    progress: Callable[[dict], None] | None = None,
    chunk_bytes: int = 81920,
    progress_interval_s: float = 1.0,
    spool_dir: str | None = None,
) -> DataFrame:
    """Streaming NT ingest from a URL with a progress surface (reference
    ``src/server/Services/WatService.cs:97-300``: HTTP source, 81920-byte
    chunked reads, >=1 s progress responses).

    Spark-first split of responsibilities: the *fetch* is a driver-side
    chunked spool to a local file (the only part that is inherently
    sequential — one socket), emitting ``progress({"bytes_read", "total_bytes",
    "elapsed_s", "done"})`` callbacks at ``progress_interval_s``; the
    *parse* is the fully distributed ``load_ntriples`` over the spooled
    file. For data already in a shared filesystem / object store, call
    ``load_ntriples`` directly — the spool is only for single-URL pulls.
    Supports any urllib scheme (http/https/file — file:// is the test
    path; the container has no network).

    CLUSTER CONSTRAINT: the spool target must be readable by the
    EXECUTORS. With the default ``spool_dir=None`` it lands in the
    driver's local tempdir — correct only for ``local[*]`` masters, so
    any other master raises unless ``spool_dir`` points at a shared
    filesystem (NFS/HDFS-fuse/object-store mount) all executors see.
    """
    import os
    import tempfile
    import urllib.request

    master = spark.conf.get("spark.master", "")
    if spool_dir is None and not master.startswith("local"):
        raise ValueError(
            "load_ntriples_url with spool_dir=None spools to the "
            f"driver-local tempdir, which executors on master={master!r} "
            "cannot read; pass spool_dir on a shared filesystem"
        )

    t0 = time.monotonic()
    last_emit = t0
    bytes_read = 0
    fd, spool = tempfile.mkstemp(suffix=".nt", dir=spool_dir)
    try:
        # claim the fd under a context manager BEFORE the fallible
        # urlopen, or a connection error leaks the descriptor
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
            total = resp.headers.get("Content-Length") if resp.headers else None
            total_bytes = int(total) if total else None
            while True:
                chunk = resp.read(chunk_bytes)
                if not chunk:
                    break
                out.write(chunk)
                bytes_read += len(chunk)
                now = time.monotonic()
                if progress and now - last_emit >= progress_interval_s:
                    last_emit = now
                    progress(
                        {
                            "bytes_read": bytes_read,
                            "total_bytes": total_bytes,
                            "elapsed_s": now - t0,
                            "done": False,
                        }
                    )
        if progress:
            progress(
                {
                    "bytes_read": bytes_read,
                    "total_bytes": total_bytes,
                    "elapsed_s": time.monotonic() - t0,
                    "done": True,
                }
            )
        df = load_ntriples(spark, spool, run_id=run_id, ts=ts)
        # the spool must outlive the returned (lazy) DataFrame's first
        # action: materialize eagerly, then the file can go.
        df = df.transform(cut_lineage)
        return df
    finally:
        try:
            os.unlink(spool)
        except OSError:
            pass
