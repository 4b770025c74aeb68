"""`logdir` Python DataSource: partition-per-file layout, byte-offset
values and resume, full-name pattern filtering, and decode-never-throws —
the reference file reader contract through spark.read.format()."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.sources import pydatasource as DS


def _mkfiles(tmp_path):
    (tmp_path / "b.log").write_bytes(b"b-one\nb-two\n")
    (tmp_path / "a.log").write_bytes(b"a-one\r\na-two\n")   # CRLF line
    (tmp_path / "skip.txt").write_bytes(b"nope\n")
    (tmp_path / "c.log").write_bytes(b"")                    # empty file
    return str(tmp_path)


def _read(spark, path, **opts):
    DS.register(spark)
    r = spark.read.format("logdir").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rows_offsets_and_pattern(spark, tmp_path):
    d = _mkfiles(tmp_path)
    rows = sorted(tuple(r) for r in _read(spark, d).collect())
    assert rows == [
        ("a.log", 0, "a-one"),      # CRLF stripped, offset of line START
        ("a.log", 7, "a-two"),
        ("b.log", 0, "b-one"),
        ("b.log", 6, "b-two"),
    ]


def test_partition_per_file(spark, tmp_path):
    d = _mkfiles(tmp_path)
    df = _read(spark, d)
    # one split per matched file (a, b, c), lexicographic
    assert df.rdd.getNumPartitions() == 3


def test_offset_resume_and_truncation(spark, tmp_path):
    d = _mkfiles(tmp_path)
    offsets = json.dumps({"a.log": 7, "b.log": 999})   # b shrank below 999
    rows = sorted(tuple(r) for r in
                  _read(spark, d, offsets=offsets).collect())
    # a resumes mid-file; b is beyond EOF (truncated) -> yields nothing,
    # the checkpoint tombstone path owns recovery; c is empty
    assert rows == [("a.log", 7, "a-two")]


def test_decode_never_throws(spark, tmp_path):
    (tmp_path / "x.log").write_bytes(b"ok\n\xff\xfe broken\n")
    rows = sorted(tuple(r) for r in _read(spark, str(tmp_path)).collect())
    assert rows[0] == ("x.log", 0, "ok")
    assert rows[1][1] == 3 and "broken" in rows[1][2]


def test_missing_path_rejected(spark):
    DS.register(spark)
    import pytest
    with pytest.raises(Exception):
        spark.read.format("logdir").load().collect()
