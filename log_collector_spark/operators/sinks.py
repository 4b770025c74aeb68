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

    writer = (df.filter(F.col(topic_col).isNotNull() &
                        F.col(value_col).isNotNull())
                .select(F.col(topic_col).alias("topic"),
                        F.col(value_col).cast("string").alias("value"))
                .write.format("kafka")
                .option("kafka.bootstrap.servers", brokers))
    for k, v in (options or {}).items():
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
