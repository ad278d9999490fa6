"""Upload-inbox data source — the reference's client upload endpoint
(`/root/reference/app/main/routes.py:27-133`: clients POST page images,
the server lands them in a per-request directory and tracks each page)
re-expressed as a first-class Spark TABLE via the Spark 4 Python
DataSource API: an upload directory becomes relational rows
(page_id, ext, valid, size_bytes, payload) readable with

    register_upload_source(spark)
    spark.read.format("pero_uploads").option("path", d).load()
    spark.readStream.format("pero_uploads").option("path", d).load()

Batch semantics: one row per regular file present at planning time.
Streaming semantics: the offset is a monotone watermark over the
(mtime_ns, name) total order — ``{"m": <max committed mtime_ns>,
"names": [names already committed AT that mtime]}`` — and each
micro-batch selects files strictly beyond it, so each batch sees
exactly the files that landed since the last one — the inbox-drain
loop the reference runs per HTTP request, as an incremental source.
A positional cursor would shift under deletions (the reference cleans
up processed uploads) or mtime ties; the watermark is content-
addressed, so deletions never skip/duplicate, same-mtime arrivals are
disambiguated by name, and ``latestOffset`` never regresses even if
the whole inbox is emptied — INCLUDING across query restarts: the
planned frontier is persisted to a dotfile sidecar in the inbox at
batch-planning time (Spark WALs the offset range before executing, so
the sidecar never runs ahead of the engine's own durable state) and
re-seeds the guard on construction.

Scale notes: listing happens once on the driver (exactly like Spark's
built-in file sources — at 10^9 files you front this with a manifest
table instead, same rows); payload bytes are read EXECUTOR-side, one
partition per file batch, so ingest bandwidth scales with the cluster,
and the driver never holds file contents.  The extension whitelist
(S6, config-example.py:8) is evaluated in the reader so invalid
uploads surface as valid=false rows (the 422 branch of routes.py:99),
not silent drops.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.ingest import ALLOWED_IMAGE_EXTENSIONS

UPLOAD_SCHEMA = StructType(
    [
        StructField("page_id", StringType()),
        StructField("ext", StringType()),
        StructField("valid", BooleanType()),
        StructField("size_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)

# files per input partition: small enough to parallelize a burst of
# uploads, large enough that a partition amortizes task overhead
FILES_PER_PARTITION = 64


def _list_uploads(path: str) -> list[tuple[str, int, int]]:
    """(name, size, mtime_ns) for every regular file, ordered by
    (mtime_ns, name) — a total order that is stable under appends, so a
    streaming cursor into it never re-reads or skips.  Dotfiles are not
    uploads (clients POST named page images) and are reserved for
    source state (the persisted stream frontier below)."""
    out = []
    with os.scandir(path) as it:
        for e in it:
            if e.is_file() and not e.name.startswith("."):
                st = e.stat()
                out.append((e.name, st.st_size, st.st_mtime_ns))
    out.sort(key=lambda t: (t[2], t[0]))
    return out


def _row(path: str, name: str, size: int):
    stem, dot, ext = name.rpartition(".")
    ext = ext.lower() if dot else ""
    page_id = stem if dot else name
    with open(os.path.join(path, name), "rb") as f:
        payload = f.read()
    return (page_id, ext, ext in ALLOWED_IMAGE_EXTENSIONS, size, payload)


@dataclass
class _FilesPartition(InputPartition):
    names_sizes: list  # [(name, size), ...]


class UploadBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path
        self.files = [(n, s) for n, s, _ in _list_uploads(path)]

    def partitions(self):
        chunks = [
            self.files[i : i + FILES_PER_PARTITION]
            for i in range(0, len(self.files), FILES_PER_PARTITION)
        ]
        return [_FilesPartition(c) for c in chunks] or [_FilesPartition([])]

    def read(self, partition: _FilesPartition):
        for name, size in partition.names_sizes:
            yield _row(self.path, name, size)


_FRONTIER_NAME = ".pero_uploads_frontier.json"


def _read_frontier(path: str) -> dict | None:
    """The last committed offset, persisted across query restarts."""
    import json

    fp = os.path.join(path, _FRONTIER_NAME)
    try:
        with open(fp) as f:
            off = json.load(f)
        if isinstance(off, dict) and "m" in off and "names" in off:
            return off
    except (OSError, ValueError):
        pass
    return None


def _advance_frontier(path: str, off: dict) -> None:
    """Monotonically advance the persisted frontier to cover ``off``
    (crash-atomic: tmp + rename).  Single-writer contract — one
    streaming query per inbox, the same contract the checkpoint plane
    pins: the read-merge-write is not a CAS, so two concurrent queries
    planning over one inbox could each persist a same-mtime name set
    missing the other's names.  (Their own Spark checkpoints stay
    correct either way; only the restart-seed could lose a name.)"""
    import json

    cur = _read_frontier(path)
    if cur is not None:
        if off["m"] < cur["m"]:
            return
        if off["m"] == cur["m"]:
            merged = sorted(set(off["names"]) | set(cur["names"]))
            if merged == sorted(cur["names"]):
                return
            off = {"m": off["m"], "names": merged}
    fp = os.path.join(path, _FRONTIER_NAME)
    tmp = fp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(off, f)
    os.replace(tmp, fp)


def _beyond(offset: dict, mtime_ns: int, name: str) -> bool:
    """True iff a file at (mtime_ns, name) is NOT yet covered by the
    watermark offset {"m": ..., "names": [...]}."""
    if mtime_ns != offset["m"]:
        return mtime_ns > offset["m"]
    return name not in offset["names"]


class UploadStreamReader(DataSourceStreamReader):
    """Incremental inbox reader with a monotone, content-addressed
    offset (see module docstring).  The offset is the max committed
    (mtime_ns, name) frontier plus the set of names already committed
    at that exact mtime — O(files-per-timestamp) state, not O(files),
    and immune to position shifts from deletions or mtime ties."""

    def __init__(self, path: str, reset_frontier: bool = False):
        self.path = path
        # latestOffset monotonicity guard.  Seeded from the persisted
        # frontier sidecar: an in-memory-only guard resets on query
        # RESTART, and a restart over a cleaned-out inbox would then
        # emit an offset below the checkpointed frontier — a re-landed
        # old file (mv preserves mtime; the reference re-uploads failed
        # requests under the same name) would be read twice.
        #
        # The sidecar is deliberately PER-INBOX, not per-checkpoint:
        # an upload processed once is processed (the reference never
        # re-OCRs a request), so a brand-new query over a used inbox
        # continues rather than reprocessing.  To genuinely reprocess,
        # pass .option("resetFrontier", "true") (deletes the sidecar)
        # — or point the new pipeline at a fresh inbox.
        if reset_frontier:
            try:
                os.remove(os.path.join(path, _FRONTIER_NAME))
            except FileNotFoundError:
                pass
        self._last: dict | None = _read_frontier(path)

    def initialOffset(self) -> dict:
        return {"m": -1, "names": []}

    def latestOffset(self) -> dict:
        files = _list_uploads(self.path)
        last = self._last or self.initialOffset()
        if not files:
            self._last = last
            return last
        max_m = max(t[2] for t in files)
        names = sorted(n for n, _s, m in files if m == max_m)
        if max_m > last["m"]:
            off = {"m": max_m, "names": names}
        elif max_m == last["m"]:
            off = {"m": max_m, "names": sorted(set(names) | set(last["names"]))}
        else:
            # the inbox was drained/cleaned below the committed frontier;
            # never regress (a regressing offset re-reads or aborts)
            off = last
        self._last = off
        return off

    def partitions(self, start: dict, end: dict):
        # Persist the planned end as the durable frontier.  Spark WALs
        # the batch's offset range BEFORE executing it, so by the time
        # partitions() runs, `end` is already the engine's own durable
        # frontier — a restart replays exactly [start, end] and then
        # moves past it, so seeding latestOffset's monotonicity guard
        # with `end` can never skip a file.  (commit() would be the
        # natural home but the Python DataSource runner does not
        # invoke it.)
        _advance_frontier(self.path, end)
        files = [
            (n, s)
            for n, s, m in _list_uploads(self.path)
            if _beyond(start, m, n) and not _beyond(end, m, n)
        ]
        chunks = [
            files[i : i + FILES_PER_PARTITION]
            for i in range(0, len(files), FILES_PER_PARTITION)
        ]
        return [_FilesPartition(c) for c in chunks] or [_FilesPartition([])]

    def read(self, partition: _FilesPartition):
        for name, size in partition.names_sizes:
            yield _row(self.path, name, size)

    def commit(self, end: dict) -> None:
        # the frontier is persisted in partitions() (the Python
        # DataSource runner does not reliably invoke commit); nothing
        # left to clean up here
        pass


class UploadDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pero_uploads"

    def schema(self) -> StructType:
        return UPLOAD_SCHEMA

    def reader(self, schema: StructType) -> UploadBatchReader:
        return UploadBatchReader(self.options["path"])

    def streamReader(self, schema: StructType) -> UploadStreamReader:
        reset = str(
            self.options.get("resetFrontier", "false")
        ).lower() in ("true", "1", "yes")
        return UploadStreamReader(self.options["path"], reset_frontier=reset)


def register_upload_source(spark) -> None:
    spark.dataSource.register(UploadDataSource)
