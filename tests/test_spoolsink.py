"""spoolsink — the Python DataSource WRITE side: batch temp→rename commit
with manifest, overwrite semantics, abort cleanup, and the per-micro-batch
streaming flavor (batch-suffixed names, idempotent replay)."""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.sources import pydatasource as PD


def _lines(path):
    out = {}
    for n in sorted(os.listdir(path)):
        if n.endswith(".log"):
            with open(os.path.join(path, n), "rb") as f:
                out[n] = f.read().decode().splitlines()
    return out


def test_batch_write_commit_and_manifest(spark, tmp_path):
    PD.register_sink(spark)
    out = str(tmp_path / "spool")
    df = (spark.range(0, 6, 1, 3)
          .select(F.concat(F.lit("row-"), F.col("id")).alias("line")))
    df.write.format("spoolsink").option("path", out).mode("append").save()
    files = _lines(out)
    assert sorted(sum(files.values(), [])) == [f"row-{i}" for i in range(6)]
    assert not any(n.startswith("_tmp_") for n in os.listdir(out))
    man = json.load(open(os.path.join(out, PD.SPOOL_MANIFEST)))
    assert sum(man.values()) == 6 and set(man) == set(files)


def test_batch_overwrite_replaces_previous_commit(spark, tmp_path):
    PD.register_sink(spark)
    out = str(tmp_path / "spool")
    one = spark.range(0, 3, 1, 1).select(
        F.concat(F.lit("a-"), F.col("id")).alias("line"))
    two = spark.range(0, 2, 1, 1).select(
        F.concat(F.lit("b-"), F.col("id")).alias("line"))
    one.write.format("spoolsink").option("path", out).mode("append").save()
    two.write.format("spoolsink").option("path", out).mode("overwrite").save()
    files = _lines(out)
    assert sorted(sum(files.values(), [])) == ["b-0", "b-1"]
    man = json.load(open(os.path.join(out, PD.SPOOL_MANIFEST)))
    assert sum(man.values()) == 2


def test_abort_removes_tmps(tmp_path):
    # driver-side unit test of the protocol itself (no Spark task needed)
    out = str(tmp_path / "spool")
    os.makedirs(out)
    w = PD.SpoolSinkWriter({"path": out}, overwrite=False)
    tmp = os.path.join(out, "_tmp_part-00000-1")
    open(tmp, "w").write("x\n")
    w.abort([PD._SpoolCommit(tmp, 0, 1)])
    assert os.listdir(out) == []


def test_stream_writer_batch_suffixed_idempotent(spark, tmp_path):
    PD.register_sink(spark)
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.txt").write_text("s-0\ns-1\n")
    stream = (spark.readStream.format("text")
              .schema("value string").load(str(src))
              .select(F.col("value").alias("line")))
    q = (stream.writeStream.format("spoolsink")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    files = _lines(out)
    assert sorted(sum(files.values(), [])) == ["s-0", "s-1"]
    # batch-suffixed names: part-<batch>-<pid>.log
    assert all(len(n.split("-")) == 3 for n in files)
    man = json.load(open(os.path.join(out, PD.SPOOL_MANIFEST)))
    assert sum(man.values()) == 2


def test_fanout_spool_matches_sink_tallies(spark, tmp_path):
    from log_collector_spark.operators import route as R
    from log_collector_spark.plans import pipeline as pl
    routed = pl.full_pipeline(spark, "/root/testdata/sf0.001")
    want = {r["sink"]: r["n"] for r in R.sink_tallies(routed).collect()}
    got = R.fanout_spool(routed, str(tmp_path / "sinks"))
    assert got == want                       # effectively-once, per sink
    # committed line files only — no temps anywhere
    for s in got:
        names = os.listdir(os.path.join(str(tmp_path / "sinks"), s))
        assert not any(n.startswith("_tmp_") for n in names)
