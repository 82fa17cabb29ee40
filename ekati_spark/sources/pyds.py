"""`ntriples` as a first-class Spark data source (the Spark 4 Python
DataSource API): ``spark.read.format("ntriples").load(path)``.

The reference parses N-Triples with an ANTLR grammar into a stream of
single-attribute nodes (`/root/reference/src/cli-grammer/NTRIPLES.g4`,
`src/parser/NtriplesListener.cs:30-56`), pulled through an 81920-byte
sliding buffer that scans for the last complete line
(`src/server/Services/WatService.cs:82-96`). This module re-expresses
that as an idiomatic Spark source: the file set is split into
byte-range input partitions that ALIGN TO NEWLINES the same way every
distributed text reader does (a partition starting mid-line skips the
partial first line — its owner is the previous partition, which reads
one line past its end), so a single multi-GB .nt file parallelizes
across executors without any coordination.

Emits the RAW triple table — ``subj, pred, obj, obj_kind (iri | blank
| literal), dtype_iri, lang`` — the uninterpreted form; the props-row
interpretation (blank-node relabeling, escape decoding, variant typing)
stays in ``sources/ntriples.py::load_ntriples``, which remains the
loader for the graph model. A deployment picks per use: raw triples for
RDF analytics, props rows for the property-graph surface.

Scale notes: partition count = ceil(bytes / chunk_bytes) per file
(``chunk_bytes`` option, default 32 MiB); each task reads only its
range + one line of overshoot — no driver-side parsing, no whole-file
buffering. The line parser is the same regex family the distributed
`load_ntriples` uses, applied per-partition in plain Python (this is a
Python data source; the JVM regexp path in load_ntriples remains the
high-throughput choice when the triple file is already splittable —
documented, not hidden).
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

NT_SCHEMA = (
    "subj string, pred string, obj string, obj_kind string, "
    "dtype_iri string, lang string"
)

# <iri> | _:blank for subject; predicate always <iri>; object adds
# "literal"(^^<dtype> | @lang)?
_LINE = re.compile(
    r'^\s*(?:<([^>]*)>|_:(\S+))\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|_:(\S+)|"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)\s*\.\s*$"
)


def parse_nt_line(line: str):
    """One N-Triples line → (subj, pred, obj, obj_kind, dtype_iri, lang)
    or None for blank/comment/malformed lines (the reference's listener
    silently skips what the grammar rejects)."""
    if not line.strip() or line.lstrip().startswith("#"):
        return None
    m = _LINE.match(line)
    if not m:
        return None
    s_iri, s_blank, pred, o_iri, o_blank, o_lit, o_type, o_lang = m.groups()
    subj = s_iri if s_iri is not None else f"_:{s_blank}"
    if o_iri is not None:
        return (subj, pred, o_iri, "iri", None, None)
    if o_blank is not None:
        return (subj, pred, f"_:{o_blank}", "blank", None, None)
    return (subj, pred, o_lit, "literal", o_type, o_lang)


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class NTriplesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples source requires a path")
        self.chunk_bytes = int(options.get("chunk_bytes", 32 * 1024 * 1024))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".nt")
            )
        return [self.path]

    def partitions(self):
        parts = []
        for f in self._files():
            size = os.path.getsize(f)
            n = max(1, -(-size // self.chunk_bytes))
            for i in range(n):
                parts.append(
                    _RangePartition(
                        f, i * self.chunk_bytes,
                        min((i + 1) * self.chunk_bytes, size),
                    )
                )
        return parts

    def read(self, partition: _RangePartition):
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                # mid-line start: the previous partition owns this line
                # (it reads one line past its end); skip to the next one
                fh.readline()
            while fh.tell() <= partition.end:
                raw = fh.readline()
                if not raw:
                    break
                row = parse_nt_line(raw.decode("utf-8", errors="replace"))
                if row is not None:
                    yield row


class NTriplesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ntriples"

    def schema(self) -> str:
        return NT_SCHEMA

    def reader(self, schema) -> NTriplesReader:
        return NTriplesReader(self.options)


def register(spark) -> None:
    """Register the format on a session:
    ``pyds.register(spark); spark.read.format("ntriples").load(p)``."""
    spark.dataSource.register(NTriplesDataSource)
