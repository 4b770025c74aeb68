"""Spark 4 state-store data source: read streaming operator state back
from a checkpoint (format "statestore" / "state-metadata") — the
operational introspection surface for the streaming pipeline: debugging
stuck aggregations, auditing state size, and verifying exactly what a
restart will resume from, WITHOUT replaying the stream."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.plans import pipeline as pl

SF_DIR = "/root/testdata/sf0.001"


def test_statestore_agg_state_equals_batch_counts(spark, tmp_path):
    # a streaming count per key; after an availableNow drain the
    # statestore source must expose EXACTLY the batch groupBy counts
    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.json").write_text(
        "\n".join(json.dumps({"k": k}) for k in ["a", "b", "a"]))
    (src / "f2.json").write_text(
        "\n".join(json.dumps({"k": k}) for k in ["a", "c"]))
    ckpt = str(tmp_path / "ck")
    agg = (spark.readStream.schema("k string").json(str(src))
           .groupBy("k").agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName("sst_agg")
         .outputMode("complete").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    state = {r["k"]: r["cnt"] for r in
             spark.read.format("statestore").load(ckpt)
                  .selectExpr("key.k AS k", "value.count AS cnt").collect()}
    assert state == {"a": 3, "b": 1, "c": 1}

    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert len(md) == 1
    assert md[0]["operatorName"] == "stateStoreSave"
    # one state store per shuffle partition — what a restart reloads
    assert md[0]["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions"))


def test_statestore_exposes_minute_bucket_stream_state(spark, tmp_path):
    # the project's own watermarked minute-bucket stream: after a drain,
    # the checkpoint's state rows are per-window counts; every state row
    # must agree with the batch ground truth for its window (watermark
    # may have EVICTED closed windows — containment, not equality)
    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "wck")
    out = str(tmp_path / "wout")
    q = sp.start_minute_bucket_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(300)

    st = (spark.read.format("statestore").load(ckpt)
          .selectExpr("key.window.start AS bucket_start",
                      "value.count AS n_state"))
    state = {r["bucket_start"]: r["n_state"] for r in st.collect()}
    assert len(state) > 0

    truth = {r["bucket_start"]: r["n_true"] for r in
             (spark.read.parquet(input_dir)
              .groupBy(F.window("ts", "1 minute").alias("w"))
              .agg(F.count(F.lit(1)).alias("n_true"))
              .select(F.col("w.start").alias("bucket_start"), "n_true")
              .collect())}
    assert all(state[b] == truth[b] for b in state)

    md = {r["operatorName"] for r in
          spark.read.format("state-metadata").load(ckpt).collect()}
    assert "stateStoreSave" in md
