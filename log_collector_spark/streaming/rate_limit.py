"""Streaming token-bucket rate-limiter replay on ``transformWithState``.

The batch op (``operators/behavior.token_bucket``) replays a per-user
token bucket over HISTORY in one ``applyInPandas`` pass — fine for a
bounded table, but the capacity-planning question is live: "is the
limiter we are about to ship rejecting traffic RIGHT NOW". The batch
recurrence (clamped refill, spend on allow) couples every step to the
previous one, so per-user history must fit one Arrow batch; this module
is the unbounded-stream twin the batch docstring promises — state is the
bucket itself (token-millis + last event time), 32 bytes per user in
RocksDB, and each micro-batch advances the recurrence from wherever the
previous one stopped, so no history accumulates anywhere.

Semantics are IDENTICAL to the batch op (integer token-millis, start
full, refill ``dt_us * 1000 DIV refill_us`` clamped to cap, allow iff
>= 1000): the pytest contract drives the kernel across arbitrary
micro-batch splits of the events table and requires the final per-user
row to equal ``token_bucket``'s output exactly.

Ordering contract: rows must arrive time-ordered per user ACROSS
micro-batches (the same in-order contract the stateful multiline
assembler and ``SftExampleBuilder`` document — true for a file stream of
time-partitioned event logs); within a batch the kernel sorts.

Reference parity: log-collector holds exactly this shape of per-source
mutable reader state (AbstractReader.java keeps counters + offsets per
file); the bucket is the same pattern keyed by user instead of file.

ENVIRONMENT GATE: like the sessionizer, the live wire needs
``google.protobuf`` (absent in this container); the KERNEL is pure
pandas and fully tested against a fake handle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from log_collector_spark.operators.behavior import TB_CAP, TB_REFILL_US

TB_OUT_SCHEMA = ("user_id BIGINT, n_events BIGINT, n_allowed BIGINT, "
                 "n_rejected BIGINT, tokens_milli BIGINT")
_TB_STATE_SCHEMA = ("tokens_milli BIGINT, last_us BIGINT, n_events BIGINT, "
                    "n_allowed BIGINT")

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


class TokenBucketLimiter(StatefulProcessor):
    """Per-user token bucket advanced one micro-batch at a time.

    Emits ONE row per (user, batch) with the RUNNING tallies after the
    batch — an update-stream of the limiter's view; the latest row per
    user equals the batch replay over everything seen so far (the
    pytest-pinned equality). No timers: the bucket refills lazily at the
    next event, so absence of traffic needs no close-out."""

    def __init__(self, cap: int = TB_CAP, refill_us: int = TB_REFILL_US):
        self.cap_milli = cap * 1000
        self.refill_us = refill_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("bucket", _TB_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        parts = [df[["us", "event_id"]] for df in rows]
        batch = pd.concat(parts).sort_values(["us", "event_id"])
        cur = self.state.get()
        if cur is not None:
            t, prev, n, allowed = cur
        else:
            t, prev, n, allowed = self.cap_milli, None, 0, 0
        # the same genuinely-sequential recurrence as the batch kernel
        # (operators/behavior.token_bucket): clamp couples each step to
        # the last, so the loop runs per user inside the Arrow batch
        for us in batch["us"]:
            us = int(us)
            if prev is not None:
                t = min(self.cap_milli,
                        t + (us - prev) * 1000 // self.refill_us)
            if t >= 1000:
                t -= 1000
                allowed += 1
            prev = us
        n += len(batch)
        self.state.update((int(t), int(prev), int(n), int(allowed)))
        yield pd.DataFrame({"user_id": [int(key[0])], "n_events": [n],
                            "n_allowed": [allowed],
                            "n_rejected": [n - allowed],
                            "tokens_milli": [t]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def start_token_bucket_stream(spark: SparkSession, input_dir: str,
                              checkpoint_loc: str, out_dir: str, *,
                              cap: int = TB_CAP,
                              refill_us: int = TB_REFILL_US,
                              max_files_per_trigger: int | None = 1):
    """Run the limiter replay over an events file stream; append each
    per-batch running row to ``out_dir`` (latest row per user = current
    limiter state). protobuf-gated like the sessionizer."""
    try:
        import google.protobuf  # noqa: F401  (state API wire format)
    except ImportError as e:  # pragma: no cover - environment gate
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package for "
            "its state API client: pip install protobuf") from e
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    r = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    src = (r.parquet(input_dir)
           .select(F.col("user_id").cast("long").alias("user_id"),
                   F.expr("unix_micros(cast(ts as timestamp))")
                    .cast("long").alias("us"),
                   F.col("event_id").cast("long").alias("event_id")))
    out = (src.groupBy("user_id")
              .transformWithStateInPandas(
                  TokenBucketLimiter(cap, refill_us),
                  outputStructType=TB_OUT_SCHEMA,
                  outputMode="append",
                  timeMode="none"))
    return (out.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_loc)
            .trigger(availableNow=True)
            .format("parquet").option("path", out_dir).start())
