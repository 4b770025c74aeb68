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
    df = spark.range(1)
    with pytest.raises(NotImplementedError, match="kafka"):
        sinks.kafka_sink(df, "broker:9092")
