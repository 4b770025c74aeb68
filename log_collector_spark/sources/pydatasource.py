"""`logdir` — a Spark 4 Python DataSource for log directories.

The reference's file reader walks a directory, filters + lexicographically
sorts the files (SugoFileFilter.java:10-34, DefaultFileReader.java:196-203),
and tails each file from a persisted byte offset
(DefaultFileReader.java:212-241). The repo's batch pipeline reproduces that
behavior over `spark.read.text` + the checkpoint table
(plans/checkpoint.py); THIS module exposes the same contract as a
first-class `spark.read.format("logdir")` source built on the Spark 4
Python DataSource API — the idiomatic way to graft a custom tailing
protocol into Catalyst when no JVM connector exists.

Layout:

- one InputPartition per file → each executor core tails a different file
  (the reference's per-source reader-thread parallelism, S8, mapped onto
  Spark's scheduler; 10⁵ files → 10⁵ independently schedulable splits),
- rows are ``(filename string, offset bigint, line string)`` where
  ``offset`` is the byte offset of the line START — exactly the value the
  checkpoint table persists, so a consumer can resume any file by passing
  ``offsets={filename: next_offset}``,
- file selection = full-name regex ``pattern`` (SugoFileFilter parity) and
  lexicographic order (stable across runs; order only affects partition
  numbering, not content),
- a file that shrank below its resume offset yields nothing (the
  tail-truncate tombstone path, plans/checkpoint.py, owns that case).

The reader is driver-light: the directory listing happens once at
planning time; file BYTES never touch the driver. UTF-8 decode errors are
replaced, not thrown (never-throw F3 invariant).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamWriter, DataSourceWriter,
                                    InputPartition, WriterCommitMessage)
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

SCHEMA = StructType([
    StructField("filename", StringType()),
    StructField("offset", LongType()),
    StructField("line", StringType()),
])


class _FilePartition(InputPartition):
    def __init__(self, path: str, start: int):
        self.path = path
        self.start = start


class LogDirectoryReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logdir source requires a 'path' option")
        self.pattern = options.get("pattern", r".*\.log")
        self.offsets = json.loads(options.get("offsets", "{}"))

    def partitions(self):
        rx = re.compile(self.pattern)
        names = sorted(
            n for n in os.listdir(self.path)
            if rx.fullmatch(n) and os.path.isfile(os.path.join(self.path, n))
        )
        return [
            _FilePartition(os.path.join(self.path, n),
                           int(self.offsets.get(n, 0)))
            for n in names
        ]

    def read(self, partition):
        name = os.path.basename(partition.path)
        with open(partition.path, "rb") as f:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            if partition.start >= size:
                return  # fully consumed (or truncated — checkpoint owns it)
            f.seek(partition.start)
            offset = partition.start
            for raw in f:
                line = raw.rstrip(b"\r\n")
                yield (name, offset,
                       line.decode("utf-8", errors="replace"))
                offset += len(raw)


class LogDirectorySource(DataSource):
    """``spark.read.format("logdir").option("path", dir).load()``.

    Options: ``path`` (required), ``pattern`` (full-name regex, default
    ``.*\\.log``), ``offsets`` (JSON map filename → resume byte offset).
    """

    @classmethod
    def name(cls):
        return "logdir"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return LogDirectoryReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(LogDirectorySource)


# ---------------------------------------------------------------------------
# `spoolsink` — the WRITE side of the connector story: a Spark 4 Python
# DataSource sink with the reference's write-then-commit file protocol
# ---------------------------------------------------------------------------
#
# The reference's file-ish sinks write to a temp name and only expose the
# final name after a durable write (the same effectively-once discipline
# plans/checkpoint.py implements over spark-native writers). This sink is
# that protocol as a FIRST-CLASS connector:
#
#   df.write.format("spoolsink").option("path", dir)
#     .option("column", "line").mode("append").save()
#
# - each task spools its partition to `_tmp_part-<pid>` (executor-side),
# - task success returns a WriterCommitMessage (tmp name + row count),
# - the DRIVER commit renames every tmp to `part-<pid>.log` and writes a
#   `_SUCCESS.json` manifest with per-file row counts — readers treat the
#   directory as committed iff the manifest exists,
# - abort deletes the tmps; a re-run overwrites them idempotently.
#
# On a cluster `path` must be shared storage (same contract as every file
# sink); rename-as-commit assumes a rename-atomic filesystem — for object
# stores swap the rename for a manifest-only commit (the manifest already
# carries the file list, so readers need no change).
#
# The streaming flavor (`writeStream.format("spoolsink")`) suffixes files
# with the batch id (`part-<batch>-<pid>.log`) and commits per micro-batch
# — replaying a batch rewrites the same names (idempotent, the streaming
# twin of the batch protocol).

SPOOL_MANIFEST = "_SUCCESS.json"


class _SpoolCommit(WriterCommitMessage):
    def __init__(self, tmp: str, pid: int, rows: int):
        self.tmp = tmp
        self.pid = pid
        self.rows = rows


class SpoolSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool, batch_id: int | None = None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("spoolsink requires a 'path' option")
        self.column = options.get("column", "line")
        self.overwrite = overwrite
        self.batch_id = batch_id

    # -- executor side ------------------------------------------------
    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt-unique tmp: two speculative attempts of one partition
        # never clobber each other; only the attempt whose message reaches
        # commit() gets renamed into place
        tmp = os.path.join(
            self.path, f"_tmp_part-{pid:05d}-{ctx.taskAttemptId()}")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "wb") as f:
            for row in iterator:
                v = row[self.column]
                f.write((v if v is not None else "").encode("utf-8"))
                f.write(b"\n")
                n += 1
            f.flush()
            os.fsync(f.fileno())
        return _SpoolCommit(tmp, pid, n)

    def _final(self, pid: int) -> str:
        stem = (f"part-{pid:05d}" if self.batch_id is None
                else f"part-{self.batch_id:010d}-{pid:05d}")
        return os.path.join(self.path, f"{stem}.log")

    # -- driver side ---------------------------------------------------
    def commit(self, messages, *args):
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".log") or name == SPOOL_MANIFEST:
                    os.remove(os.path.join(self.path, name))
        counts = {}
        for m in messages:
            if m is None:
                continue
            final = self._final(m.pid)
            os.replace(m.tmp, final)
            counts[os.path.basename(final)] = m.rows
        manifest = os.path.join(self.path, SPOOL_MANIFEST)
        previous = {}
        if os.path.exists(manifest) and not self.overwrite:
            with open(manifest) as f:
                previous = json.load(f)
        previous.update(counts)
        tmp_manifest = manifest + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(previous, f, sort_keys=True)
        os.replace(tmp_manifest, manifest)

    def abort(self, messages, *args):
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class SpoolStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch spool commits: same task write protocol; the final
    ``part-<batch>-<pid>.log`` names are assigned at COMMIT time (where
    the engine hands over batchId), so a replayed batch idempotently
    rewrites exactly its own files."""

    def __init__(self, options):
        self.options = options

    def write(self, iterator):
        return SpoolSinkWriter(self.options, overwrite=False).write(iterator)

    def commit(self, messages, batchId):
        SpoolSinkWriter(self.options, overwrite=False,
                        batch_id=batchId).commit(messages)

    def abort(self, messages, batchId):
        SpoolSinkWriter(self.options, overwrite=False,
                        batch_id=batchId).abort(messages)


class SpoolSink(DataSource):
    """``df.write.format("spoolsink")`` / ``writeStream.format("spoolsink")``.

    Options: ``path`` (required), ``column`` (string column to spool,
    default ``line``)."""

    @classmethod
    def name(cls):
        return "spoolsink"

    def schema(self):
        return SCHEMA  # unused for sinks; required by the API

    def writer(self, schema, overwrite):
        return SpoolSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return SpoolStreamWriter(self.options)


def register_sink(spark) -> None:
    """Idempotently register the sink on a session."""
    spark.dataSource.register(SpoolSink)
