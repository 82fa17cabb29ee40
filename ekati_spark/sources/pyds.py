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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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


_PAIR = re.compile(r"\\u([Dd][89AaBb][0-9a-fA-F]{2})\\u([Dd][C-Fc-f][0-9a-fA-F]{2})")
_ESC = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")
_SIMPLE = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "b": "\b", "f": "\f"}


def _unescape_literal(s: str) -> str:
    """Decode N-Triples literal escapes into the actual string value.
    Surrogate PAIRS combine into one code point first; a lone surrogate
    maps to U+FFFD (Arrow's UTF-8 serializer rejects lone surrogates —
    same guard as sources/ntriples.py)."""
    s = _PAIR.sub(
        lambda m: chr(
            0x10000
            + ((int(m.group(1), 16) - 0xD800) << 10)
            + (int(m.group(2), 16) - 0xDC00)
        ),
        s,
    )

    def one(m: "re.Match") -> str:
        t = m.group(1)
        if t[0] in "uU":
            cp = int(t[1:], 16)
            # lone surrogates AND out-of-range \UXXXXXXXX (> 0x10FFFF,
            # where chr() raises) both map to U+FFFD — one malformed
            # literal must not fail the partition
            if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                return "�"
            return chr(cp)
        return _SIMPLE.get(t, "\\" + t)

    return _ESC.sub(one, s)


def parse_nt_line(line: str):
    """One N-Triples line → (subj, pred, obj, obj_kind, dtype_iri, lang)
    or None for blank/comment/malformed lines (the reference's listener
    silently skips what the grammar rejects). Literal objects come back
    UNESCAPED — ``obj`` holds the actual string value, so writer+reader
    round-trip cleanly."""
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
    return (subj, pred, _unescape_literal(o_lit), "literal", o_type, o_lang)


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

    def writer(self, schema, overwrite: bool) -> "NTriplesWriter":
        return NTriplesWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> "NTriplesStreamReader":
        return NTriplesStreamReader(self.options)


def register(spark) -> None:
    """Register the format on a session:
    ``pyds.register(spark); spark.read.format("ntriples").load(p)``."""
    spark.dataSource.register(NTriplesDataSource)


def _fmt_term(value: str, kind: str, dtype: str | None, lang: str | None) -> str:
    if kind == "iri":
        return f"<{value}>"
    if kind == "blank":
        return value if value.startswith("_:") else f"_:{value}"
    lit = (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if dtype:
        return f'"{lit}"^^<{dtype}>'
    if lang:
        return f'"{lit}"@{lang}'
    return f'"{lit}"'


class _NTCommit(WriterCommitMessage):
    def __init__(self, file: str, count: int):
        self.file = file
        self.count = count


class NTriplesWriter(DataSourceWriter):
    """Task-side writer: each partition lands one part-<uuid>.nt file,
    then commit() publishes them by moving the staged directory into
    place — the same tmp-then-rename contract every Spark file sink
    uses, so a failed job leaves no partial output visible. abort()
    removes the staging directory."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.nt")
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for row in iterator:
                subj = (
                    row.subj
                    if row.subj.startswith("_:")
                    else f"<{row.subj}>"
                )
                obj = _fmt_term(
                    row.obj, row.obj_kind, row.dtype_iri, row.lang
                )
                fh.write(f"{subj} <{row.pred}> {obj} .\n")
                n += 1

        return _NTCommit(fname, n)

    def commit(self, messages):
        import shutil

        staging = os.path.join(self.path, "_staging")
        if self.overwrite:
            # publish-time swap: drop the previously published part
            # files only once every task has staged successfully
            for f in os.listdir(self.path):
                if f.endswith(".nt") and f != "_staging":
                    os.remove(os.path.join(self.path, f))
        # Publish ONLY the files named by the task commit messages: a
        # retried/speculated task attempt or a crashed prior job leaves
        # orphan part files in _staging that must never become visible
        # (one committed attempt per task, the FileOutputCommitter rule).
        committed = {m.file for m in messages if m is not None}
        for f in list(os.listdir(staging)):
            src = os.path.join(staging, f)
            if src in committed:
                shutil.move(src, os.path.join(self.path, f))
            else:
                os.remove(src)
        os.rmdir(staging)

    def abort(self, messages):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class NTriplesStreamReader(SimpleDataSourceStreamReader):
    """Tail the .nt file(s) under ``path`` as a stream: offsets are
    per-file byte positions, each micro-batch parses exactly the bytes
    appended since the last committed offset (aligned to the last
    complete line — a partial trailing line stays unconsumed until its
    newline arrives, the reference's sliding-buffer rule,
    WatService.cs:82-96). New files appearing in a directory join the
    offset map at 0. Replays are exact: readBetweenOffsets re-reads the
    same byte range, so recovery re-emits identical rows."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ntriples stream source requires a path")

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".nt")
            )
        return [self.path] if os.path.exists(self.path) else []

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _complete_prefix_end(self, f: str, start: int) -> int:
        size = os.path.getsize(f)
        if size <= start:
            return start
        with open(f, "rb") as fh:
            fh.seek(start)
            data = fh.read(size - start)
        # last newline at-or-after start bounds the complete prefix
        nl = data.rfind(b"\n")
        return start + nl + 1 if nl >= 0 else start

    def read(self, start: dict):
        offsets = dict(start.get("files", {}))
        rows: list[tuple] = []
        for f in self._files():
            s = int(offsets.get(f, 0))
            e = self._complete_prefix_end(f, s)
            if e > s:
                rows.extend(self._parse_range(f, s, e))
            offsets[f] = e
        return iter(rows), {"files": offsets}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for f, e in end.get("files", {}).items():
            s = int(start.get("files", {}).get(f, 0))
            if int(e) > s and os.path.exists(f):
                rows.extend(self._parse_range(f, s, int(e)))
        return iter(rows)

    @staticmethod
    def _parse_range(f: str, start: int, end: int) -> list[tuple]:
        out = []
        with open(f, "rb") as fh:
            fh.seek(start)
            data = fh.read(end - start)
        for raw in data.decode("utf-8", errors="replace").splitlines():
            row = parse_nt_line(raw)
            if row is not None:
                out.append(row)
        return out

    def commit(self, end: dict) -> None:
        pass
