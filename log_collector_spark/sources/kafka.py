"""Kafka source/sink config mapping (S7 + W1), cluster-gated.

The sandbox has no Kafka connector jar or broker, but the full code path a
cluster needs is here and unit-tested at the config-mapping level:

- **reader** (reference reader/kafka/KafkaReader.java:24-32 +
  CustomKafkaConsumer.java:97-148): the reference assigns explicit
  partitions and seeks each to ``stored_offset + 1``; a partition with no
  stored offset (-1) seeks to the beginning when
  ``reader.kafka.frombeginning=true``, else to the end. Structured
  Streaming expresses exactly this via the ``startingOffsets`` JSON
  (per-partition offsets; -2 = earliest, -1 = latest); after the first
  batch the streaming checkpoint takes over the offset bookkeeping the
  reference does with its ``.kafka_offset/<topic>/<partition>`` files.
- **pass-through properties** (CustomKafkaConsumer.java:97-104): every
  ``reader.kafka.<k>`` property becomes a ``kafka.<k>`` DataSource option
  (Spark hands options with that prefix to the underlying consumer the same
  way the reference strips the prefix into its Properties).
- **writer** (writer/kafka/KafkaWriter.java:23-43 + KafkaReader.java:86-89):
  ``kafka.<k>`` properties pass through; with
  ``wirter.kafka.topic.diff=true`` [sic — reference typo kept verbatim] the
  producer topic is ``<source topic>_etl``, which is exactly the routing
  engine's ``SINK_OK_SUFFIX`` sink name — so routed frames publish with
  ``sink`` as the per-row topic column.

Zookeeper broker discovery (CustomKafkaConsumer.java:57-95) is NOT ported:
Spark's Kafka source takes ``kafka.bootstrap.servers`` directly; resolving
brokers from ZooKeeper is a pre-KIP-500 deployment detail, documented here
instead of re-implemented.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

# property keys, verbatim from the reference (including its 'wirter' typo)
READER_KAFKA_TOPICS = "reader.kafka.topics"          # KafkaReader.java:25
FROM_BEGINNING = "reader.kafka.frombeginning"        # CustomKafkaConsumer.java:28
WRITER_TO_DIFF_TOPIC = "wirter.kafka.topic.diff"     # KafkaReader.java:24
WRITER_KAFKA_TOPIC = "writer.kafka.topic"            # KafkaWriter.java:24
READER_PREFIX = "reader.kafka."                      # CustomKafkaConsumer.java:27
WRITER_PREFIX = "kafka."                             # KafkaWriter.java:23

# reader.kafka.* keys that are engine config, not Kafka client config
_READER_NON_CLIENT = {
    READER_KAFKA_TOPICS, FROM_BEGINNING,
    "reader.kafka.zookeeper.server", "reader.kafka.zookeeper.timeout",
    "reader.kafka.zookeeper.hosts.path",
}


def reader_kafka_options(conf: dict) -> dict[str, str]:
    """``reader.kafka.<k>`` → ``kafka.<k>`` DataSource options
    (CustomKafkaConsumer.newConsumer pass-through, :97-104)."""
    out = {}
    for k, v in conf.items():
        if k.startswith(READER_PREFIX) and k not in _READER_NON_CLIENT:
            out["kafka." + k[len(READER_PREFIX):]] = str(v)
    return out


def writer_kafka_options(conf: dict) -> dict[str, str]:
    """``kafka.<k>`` → ``kafka.<k>`` writer options (KafkaWriter.java:40-44;
    Spark's sink wants the same ``kafka.`` prefix the reference strips)."""
    return {k: str(v) for k, v in conf.items()
            if k.startswith(WRITER_PREFIX)}


def starting_offsets(topic: str, offset_map: dict[int, int],
                     from_beginning: bool = False) -> str:
    """The reference's per-partition seek (CustomKafkaConsumer.java:125-147)
    as a ``startingOffsets`` value.

    ``offset_map[p] == -1`` means "no stored offset": the reference then
    seeks the whole assignment to beginning/end depending on
    ``reader.kafka.frombeginning`` — Spark's sentinels are -2 (earliest) and
    -1 (latest). A stored offset ``o`` means "o was processed": seek o+1.
    """
    if not offset_map:
        return "earliest" if from_beginning else "latest"
    none_sentinel = -2 if from_beginning else -1
    return json.dumps({topic: {
        str(p): (none_sentinel if o == -1 else o + 1)
        for p, o in sorted(offset_map.items())}})


def resume_topic(topic: str, diff: bool) -> str:
    """KafkaReader.java:86-89: with topic.diff the writer publishes to
    ``<topic>_etl`` — the same name route_stage assigns to the ok-sink."""
    return topic + "_etl" if diff else topic


def kafka_stream_reader(spark: SparkSession, conf: dict,
                        offset_map: dict[int, int] | None = None
                        ) -> DataFrame:
    """``readStream.format("kafka")`` wired from reference properties.

    Returns a streaming DataFrame of ``(text string, topic, partition,
    offset)`` — the engine's parse stage applies unchanged (the reference
    feeds consumer record values through the same GrokParser,
    CustomKafkaConsumer.java:171-183). Raises ``NotImplementedError`` with
    the exact fix when the connector jar is absent (this sandbox).
    """
    topics = conf[READER_KAFKA_TOPICS]
    from_beginning = str(conf.get(FROM_BEGINNING, "false")) == "true"
    reader = (spark.readStream.format("kafka")
              .option("subscribe", topics)
              .option("startingOffsets",
                      starting_offsets(topics.split(",")[0], offset_map or {},
                                       from_beginning)
                      if offset_map is not None
                      else ("earliest" if from_beginning else "latest"))
              .option("failOnDataLoss", "false"))
    for k, v in reader_kafka_options(conf).items():
        reader = reader.option(k, v)
    try:
        df = reader.load()
    except Exception as e:  # connector jar absent → actionable gate
        raise NotImplementedError(
            "Kafka connector not on the classpath; on a cluster add "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark "
            "version> and re-run. Underlying error: " + str(e)) from e
    from pyspark.sql import functions as F
    return df.select(F.col("value").cast("string").alias("text"),
                     "topic", "partition", "offset")
