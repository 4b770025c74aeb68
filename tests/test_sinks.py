"""Sink adapters (W1-W3): console, gateway spool, kafka instruction."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import sinks
from log_collector_spark.plans import pipeline as pl

SF_DIR = "/root/testdata/sf0.001"


def test_gateway_sink_spools_newline_joined_batches(spark, tmp_path):
    routed = pl.full_pipeline(spark, SF_DIR)
    ok = routed.filter(F.col("parse_ok") & ~F.col("is_oversize")) \
               .select("parsed_json").limit(500).coalesce(2)
    out = str(tmp_path / "gw")
    sinks.gateway_sink(ok, out)
    bodies = [open(os.path.join(out, f)).read()
              for f in os.listdir(out) if f.endswith(".body")]
    assert bodies
    lines = [ln for b in bodies for ln in b.split("\n")]
    assert len(lines) == 500
    assert all(ln.startswith("{") and ln.endswith("}") for ln in lines)


def test_console_sink_runs(spark, capsys):
    df = spark.range(3).select(F.col("id").cast("string").alias("msg"))
    sinks.console_sink(df, 3)


def test_kafka_sink_raises_with_instruction(spark):
    df = spark.createDataFrame([("t_etl", '{"a":1}')],
                               "sink string, parsed_json string")
    with pytest.raises(NotImplementedError, match="kafka"):
        sinks.kafka_sink(df, "broker:9092")


# --- Kafka config mapping (S7/W1, connector-gated) -------------------------

def test_kafka_reader_option_mapping():
    from log_collector_spark.sources import kafka as K
    conf = {
        "reader.kafka.topics": "logs",
        "reader.kafka.frombeginning": "true",
        "reader.kafka.bootstrap.servers": "b1:9092,b2:9092",
        "reader.kafka.max.poll.records": "500",
        "reader.kafka.zookeeper.server": "zk:2181",  # engine key, not client
        "writer.kafka.topic": "out",
    }
    opts = K.reader_kafka_options(conf)
    assert opts == {"kafka.bootstrap.servers": "b1:9092,b2:9092",
                    "kafka.max.poll.records": "500"}


def test_kafka_starting_offsets_seek_semantics():
    import json
    from log_collector_spark.sources import kafka as K
    # stored offset o → seek o+1 (CustomKafkaConsumer.java:140-146)
    s = json.loads(K.starting_offsets("logs", {0: 41, 1: -1, 2: 0},
                                      from_beginning=False))
    assert s == {"logs": {"0": 42, "1": -1, "2": 1}}
    # no offsets at all → beginning/end switch (frombeginning)
    assert K.starting_offsets("logs", {}, from_beginning=True) == "earliest"
    assert K.starting_offsets("logs", {}, from_beginning=False) == "latest"
    # -1 partitions honor frombeginning via the -2 sentinel
    s2 = json.loads(K.starting_offsets("logs", {3: -1}, from_beginning=True))
    assert s2 == {"logs": {"3": -2}}


def test_kafka_topic_diff_rewrite_matches_route_suffix():
    from log_collector_spark.grok.oracle import SINK_OK_SUFFIX
    from log_collector_spark.sources import kafka as K
    assert K.resume_topic("logs", True) == "logs" + SINK_OK_SUFFIX
    assert K.resume_topic("logs", False) == "logs"


def test_kafka_stream_reader_gated_without_connector(spark):
    from log_collector_spark.sources import kafka as K
    conf = {"reader.kafka.topics": "logs",
            "reader.kafka.bootstrap.servers": "b:9092"}
    with pytest.raises(NotImplementedError, match="kafka"):
        K.kafka_stream_reader(spark, conf, offset_map={0: 10})


def test_kafka_writer_registered_in_config(spark):
    from log_collector_spark.plans.config import WRITERS
    w = WRITERS["io.sugo.collect.writer.kafka.KafkaWriter"](
        {"kafka.bootstrap.servers": "b:9092", "kafka.retries": "5"})
    df = spark.createDataFrame([("t_etl", "{}")],
                               "sink string, parsed_json string")
    with pytest.raises(NotImplementedError, match="kafka"):
        w(df)
