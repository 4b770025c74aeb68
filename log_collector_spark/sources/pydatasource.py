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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
