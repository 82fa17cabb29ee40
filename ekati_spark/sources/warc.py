"""`warc` as a first-class Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("warc").load(path)`` over
ISO 28500 WARC files — the container format web-scale pretraining
corpora (Common Crawl) ship in.

The reference's ingestion surface is line/record readers pulled through
a sliding buffer (`src/server/Services/WatService.cs:82-96` reads WAT —
WARC-derived — archives the same way); this module re-expresses
record-framed archive ingestion Spark-first, same design as
``sources/pyds.py``'s N-Triples source:

- **Plain ``.warc``** files split into byte-range input partitions: a
  partition owns every record whose START offset lies in its range. A
  mid-file partition aligns forward to the next record boundary by
  scanning for the ``\\r\\n\\r\\nWARC/`` delimiter and VALIDATING the
  candidate (version line + parseable header block with a
  Content-Length) so payload bytes that merely contain the marker are
  skipped. Each task reads its range plus one record of overshoot — no
  driver parsing, no whole-file buffering.
- **``.warc.gz``** (the Common Crawl layout: one gzip member per
  record, members concatenated) reads as one partition per FILE —
  gzip streams aren't byte-splittable; archive collections get their
  parallelism from file counts (a CC crawl is ~64k files of ~1 GB),
  which is exactly how production WARC pipelines schedule.
- The **writer** mirrors the N-Triples sink's commit discipline: tasks
  stage ``part-<uuid>.warc[.gz]`` files, ``commit()`` publishes ONLY
  files named in task commit messages and removes orphans from
  retried/speculated attempts (one committed attempt per task).
  ``compression=gzip`` writes one gzip member per record (mtime=0 for
  deterministic bytes).

Schema: ``record_id, warc_type, target_uri, warc_date, content_type``
(strings; warc_date stays the ISO-8601 string the header carries),
``content_length bigint, payload binary`` — payload is opaque bytes
per the multimodal-column contract; HTTP-response splitting, charset
decode, and text extraction are downstream operators, not the source's
job.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length bigint, "
    "payload binary"
)

_MARKER = b"\r\n\r\nWARC/"


def _parse_headers(fh) -> dict | None:
    """Read the header block after the version line; None if malformed."""
    headers: dict[str, str] = {}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n"):
            return headers
        if not line or len(line) > 8192:
            return None
        k, sep, v = line.decode("utf-8", "replace").partition(":")
        if not sep:
            return None
        headers[k.strip().lower()] = v.strip()


def _read_record(fh):
    """Parse one record at the current position. Returns the row tuple
    or None at EOF. Raises ValueError on a non-WARC byte stream."""
    line = fh.readline()
    while line in (b"\r\n", b"\n"):  # inter-record blank lines
        line = fh.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
    headers = _parse_headers(fh)
    if headers is None:
        raise ValueError("malformed WARC header block")
    if "content-length" not in headers:
        # mandatory per ISO 28500 — defaulting to 0 would silently
        # mis-frame every later record in the stream
        raise ValueError("WARC record missing Content-Length")
    length = int(headers["content-length"])
    payload = fh.read(length)
    if len(payload) < length:
        raise ValueError(
            f"truncated WARC record: expected {length} payload bytes, "
            f"got {len(payload)} (partial upload / torn write)"
        )
    return (
        headers.get("warc-record-id"),
        headers.get("warc-type"),
        headers.get("warc-target-uri"),
        headers.get("warc-date"),
        headers.get("content-type"),
        length,
        bytearray(payload),
    )


def _align_to_record(fh, file_size: int) -> int:
    """From the current position, advance to the next VALIDATED record
    boundary; returns its offset (file_size if none). A candidate
    marker inside a payload fails header validation and is skipped."""
    base = fh.tell()
    window = b""
    win_start = base
    while True:
        chunk = fh.read(1 << 20)
        if not chunk:
            return file_size
        window += chunk
        at = 0
        while True:
            hit = window.find(_MARKER, at)
            if hit < 0:
                break
            cand = win_start + hit + 4  # start of "WARC/"
            save = fh.tell()
            fh.seek(cand)
            try:
                ver = fh.readline()
                ok = ver.startswith(b"WARC/") and _parse_headers(fh)
                ok = bool(ok) and "content-length" in ok
            except Exception:
                ok = False
            fh.seek(save)
            if ok:
                return cand
            at = hit + 1
        # keep a tail big enough to hold a split marker
        keep = len(_MARKER) - 1
        win_start += len(window) - keep
        window = window[-keep:]


class _WarcPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, is_gzip: bool):
        self.path = path
        self.start = start
        self.end = end
        self.is_gzip = is_gzip


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")
        self.chunk_bytes = int(options.get("chunk_bytes", 32 * 1024 * 1024))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".warc", ".warc.gz"))
            )
        return [self.path]

    def partitions(self):
        parts = []
        for f in self._files():
            size = os.path.getsize(f)
            if f.endswith(".gz"):
                # gzip members aren't byte-splittable: one partition
                # per file; archive sets parallelize across files
                parts.append(_WarcPartition(f, 0, size, True))
                continue
            n = max(1, -(-size // self.chunk_bytes))
            for i in range(n):
                parts.append(
                    _WarcPartition(
                        f,
                        i * self.chunk_bytes,
                        min((i + 1) * self.chunk_bytes, size),
                        False,
                    )
                )
        return parts

    def read(self, partition: _WarcPartition):
        if partition.is_gzip:
            with open(partition.path, "rb") as raw:
                # GzipFile over concatenated members streams them all
                fh = gzip.GzipFile(fileobj=raw)
                while True:
                    row = _read_record(fh)
                    if row is None:
                        return
                    yield row
        size = os.path.getsize(partition.path)
        with open(partition.path, "rb") as fh:
            if partition.start == 0:
                pos = 0
            else:
                fh.seek(partition.start)
                pos = _align_to_record(fh, size)
            # records whose start offset lies in [start, end) are ours
            while pos < partition.end:
                fh.seek(pos)
                row = _read_record(fh)
                if row is None:
                    return
                yield row
                pos = fh.tell()


class _WarcCommit(WriterCommitMessage):
    def __init__(self, file: str, count: int):
        self.file = file
        self.count = count


class WarcWriter(DataSourceWriter):
    """Stage part files per task; publish only committed attempts."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a path")
        self.overwrite = overwrite
        self.gz = options.get("compression", "").lower() == "gzip"

    def write(self, iterator):
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        ext = ".warc.gz" if self.gz else ".warc"
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}{ext}")
        n = 0
        with open(fname, "wb") as fh:
            for row in iterator:
                payload = bytes(row.payload or b"")
                head = (
                    "WARC/1.0\r\n"
                    f"WARC-Record-ID: {row.record_id}\r\n"
                    f"WARC-Type: {row.warc_type}\r\n"
                    f"WARC-Target-URI: {row.target_uri}\r\n"
                    f"WARC-Date: {row.warc_date}\r\n"
                    f"Content-Type: {row.content_type}\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode("utf-8")
                rec = head + payload + b"\r\n\r\n"
                if self.gz:
                    rec = gzip.compress(rec, mtime=0)
                fh.write(rec)
                n += 1
        return _WarcCommit(fname, n)

    def commit(self, messages):
        import shutil

        staging = os.path.join(self.path, "_staging")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith((".warc", ".warc.gz")) and f != "_staging":
                    os.remove(os.path.join(self.path, f))
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

        shutil.rmtree(
            os.path.join(self.path, "_staging"), ignore_errors=True
        )


def _parse_whole_file(path: str) -> list[tuple]:
    rows: list[tuple] = []
    if path.endswith(".gz"):
        with open(path, "rb") as raw:
            fh = gzip.GzipFile(fileobj=raw)
            while True:
                row = _read_record(fh)
                if row is None:
                    return rows
                rows.append(row)
    with open(path, "rb") as fh:
        while True:
            row = _read_record(fh)
            if row is None:
                return rows
            rows.append(row)


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Tail a WARC archive DIRECTORY as a stream: each micro-batch
    consumes the archive files that appeared since the last committed
    offset, WHOLE — file-granular offsets, not byte-granular, because
    archives are immutable once published (this module's writer renames
    staged parts into place atomically; Common Crawl's bucket layout has
    the same land-then-never-mutate contract — a new crawl lands new
    files). The offset is the consumed-file map ``{path: size}``;
    ``readBetweenOffsets`` re-reads exactly the files recorded in the
    end offset, so replay after restart re-emits identical rows. This
    is the streaming front door of a continuous pretraining-ingest
    pipeline: archives land, each is processed exactly once.

    Driver sizing: a SimpleDataSourceStreamReader materializes each
    micro-batch's rows ON THE DRIVER (Spark buffers ``read()``'s
    iterator to make the batch replayable), so an unbounded batch over
    a large landing (a backfill dropping hundreds of archives at once)
    buffers every record of every new file in driver memory. Cap it
    with ``maxFilesPerBatch``: at most that many new archives are
    consumed per micro-batch and the rest are picked up by subsequent
    batches (the offset only advances past files actually read, so
    nothing is skipped). Size it so
    ``maxFilesPerBatch × max archive size`` fits comfortably in driver
    memory; the uncapped default is only safe when archives land in
    small numbers per trigger."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream source requires a path")
        raw = options.get("maxFilesPerBatch") or options.get(
            "maxfilesperbatch"
        )
        self.max_files_per_batch = int(raw) if raw is not None else None
        if self.max_files_per_batch is not None and (
            self.max_files_per_batch < 1
        ):
            raise ValueError("maxFilesPerBatch must be >= 1")

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".warc", ".warc.gz"))
            )
        return [self.path] if os.path.exists(self.path) else []

    def initialOffset(self) -> dict:
        return {"files": {}}

    def read(self, start: dict):
        done = dict(start.get("files", {}))
        rows: list[tuple] = []
        n_new = 0
        for f in self._files():
            if f in done:
                continue
            if (
                self.max_files_per_batch is not None
                and n_new >= self.max_files_per_batch
            ):
                break  # leave for the next micro-batch (offset
                # excludes it, so it is re-discovered, not skipped)
            rows.extend(_parse_whole_file(f))
            done[f] = os.path.getsize(f)
            n_new += 1
        return iter(rows), {"files": done}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = start.get("files", {})
        rows: list[tuple] = []
        for f in end.get("files", {}):
            if f not in seen and os.path.exists(f):
                rows.extend(_parse_whole_file(f))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def writer(self, schema, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    """``warc.register(spark); spark.read.format("warc").load(p)``."""
    spark.dataSource.register(WarcDataSource)
