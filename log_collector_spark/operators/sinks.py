"""Sink adapters (W1-W4) beyond the per-sink parquet fan-out.

The reference's writers are all "serialize batch → push somewhere"
(writer/AbstractWriter.java:10-18); in Spark each becomes a terminal action
on the routed frame:

- **console** (W3, writer/console/ConsoleWriter.java:17-23): ``df.show`` in
  batch, ``format("console")`` in streaming.
- **gateway** (W2, writer/gateway/GatewayWriter.java:28-46 +
  util/HttpUtil.java:14-33): newline-join each partition's serialized
  records and POST. Modeled with a pluggable ``post`` callable so tests can
  capture bodies; the sandbox has no network, so the default spools request
  bodies to files (one per partition — same batching shape a real POST
  would have). Executed with ``foreachPartition`` — records never gather on
  the driver.
- **kafka** (W1, writer/kafka/KafkaWriter.java:96-147): on a real cluster
  ``df.selectExpr("sink AS topic", "parsed_json AS value")
  .write.format("kafka")`` — the connector jar is absent here, so this
  raises with that exact instruction; retry semantics map to Spark task
  retries (KafkaWriter's 5×1s loop, :125-139).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def console_sink(df: DataFrame, n: int = 20) -> None:
    """W3: println each record."""
    df.show(n, truncate=False)


def gateway_sink(df: DataFrame, out_dir: str, *,
                 value_col: str = "parsed_json") -> None:
    """W2: newline-joined POST body per partition, spooled to ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)

    def send(it):
        import uuid

        rows = [r[value_col] for r in it if r[value_col] is not None]
        if not rows:
            return
        body = "\n".join(rows)
        path = os.path.join(out_dir, f"post-{uuid.uuid4().hex}.body")
        with open(path, "w", encoding="utf-8") as f:
            f.write(body)

    df.select(value_col).foreachPartition(send)


def kafka_sink(df: DataFrame, brokers: str, topic_col: str = "sink",
               value_col: str = "parsed_json",
               options: dict | None = None) -> None:
    """W1: per-topic Kafka producer fan-out (KafkaWriter.java:96-147).

    The ``topic_col`` routing column doubles as the per-row topic — with the
    reference's ``wirter.kafka.topic.diff`` rewrite the ok-sink is already
    named ``<topic>_etl`` (KafkaReader.java:86-89 == route SINK_OK_SUFFIX).
    Retry semantics (KafkaWriter's 5×1s loop, :125-139) map to Spark task
    retries + the producer's own ``kafka.retries``. Raises
    ``NotImplementedError`` with the exact fix when the connector jar is
    absent (this sandbox has none).
    """
    from pyspark.sql import functions as F

    from log_collector_spark.sources.kafka import sink_options

    writer = (df.filter(F.col(topic_col).isNotNull() &
                        F.col(value_col).isNotNull())
                .select(F.col(topic_col).alias("topic"),
                        F.col(value_col).cast("string").alias("value"))
                .write.format("kafka"))
    opts = sink_options(brokers)
    opts.update(options or {})
    for k, v in opts.items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:
        msg = str(e)
        if "kafka" in msg.lower() and ("Failed to find" in msg
                                       or "ClassNotFound" in msg
                                       or "DataSource" in msg):
            raise NotImplementedError(
                "Kafka connector not on the classpath; on a cluster add "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
                "<spark version> and re-run. Underlying error: " + msg) from e
        raise


# ---------------------------------------------------------------------------
# W7: metric sender with failed-batch retry
# ---------------------------------------------------------------------------

READ_LINE_METRIC_NAME = "collector.line.read.success"   # AbstractReader.java:38-39
READ_ERROR_METRIC_NAME = "collector.line.read.error"    # AbstractReader.java:40


def kairos_metrics(lineage_rows, host: str = "spark",
                   timestamp_ms: int = 0) -> list[dict]:
    """Shape per-source lineage counters into the reference's KairosDB
    metric records (AbstractReader.java:83-114: one success + one error
    metric per source, tagged ``{from, host}``, type long)."""
    out = []
    for r in lineage_rows:
        tags = {"from": r["src_file"], "host": host}
        out.append({"name": READ_LINE_METRIC_NAME, "tags": tags,
                    "type": "long", "value": int(r["success"]),
                    "timestamp": timestamp_ms})
        out.append({"name": READ_ERROR_METRIC_NAME, "tags": tags,
                    "type": "long", "value": int(r["error"]),
                    "timestamp": timestamp_ms})
    return out


class MetricSender:
    """W7 metric push with the reference's failed-batch retry
    (AbstractReader.java:107-131): a metric batch whose POST fails is kept
    and re-sent at the next tick BEFORE that tick's fresh batch, so a
    transient metric-server outage loses nothing.

    Documented deviation: the reference never empties its ``failMetrics``
    list — every later tick re-posts ALL previously-failed metrics again
    (duplicate datapoints + unbounded growth; AbstractReader.java:118-123
    has no ``clear()``). Here a successful resend clears the backlog, and
    the backlog is capped (oldest dropped first) so a long outage cannot
    exhaust driver memory.

    ``post`` is a callable taking the JSON body (same pluggable shape as
    :func:`gateway_sink`); failures are signaled by raising.
    """

    def __init__(self, post, max_backlog: int = 100_000):
        self._post = post
        self._fail: list[dict] = []
        self.max_backlog = max_backlog

    @property
    def backlog(self) -> list[dict]:
        return list(self._fail)

    def send(self, metrics: list[dict]) -> None:
        import json as _json

        if self._fail:
            try:
                self._post(_json.dumps(self._fail))
                self._fail = []
            except Exception:
                pass  # keep for the next tick (reference logs and moves on)
        if not metrics:
            return
        try:
            self._post(_json.dumps(list(metrics)))
        except Exception:
            self._fail.extend(metrics)
            if len(self._fail) > self.max_backlog:
                del self._fail[:len(self._fail) - self.max_backlog]
