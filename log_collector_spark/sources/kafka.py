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


def starting_offsets(topics: str | list[str],
                     offset_map: dict | None,
                     from_beginning: bool = False) -> str:
    """The reference's per-partition seek (CustomKafkaConsumer.java:125-147)
    as a ``startingOffsets`` value.

    ``topics`` is the subscribe list (comma-joined string or list).
    ``offset_map`` is either ``{partition: offset}`` (single-topic shorthand)
    or ``{topic: {partition: offset}}``. Spark's Kafka source requires a
    specific-offset JSON to cover EVERY subscribed TopicPartition, so a
    multi-topic subscription demands the nested form covering every topic —
    a flat map with several topics raises instead of producing a resume
    that fails at runtime. (The reference keeps one offset file per
    (topic, partition) — ``.kafka_offset/<topic>/<partition>`` — so callers
    always have the full nested map.)

    ``offset_map[t][p] == -1`` means "no stored offset": the reference then
    seeks that assignment to beginning/end depending on
    ``reader.kafka.frombeginning`` — Spark's sentinels are -2 (earliest) and
    -1 (latest). A stored offset ``o`` means "o was processed": seek o+1.
    """
    if isinstance(topics, str):
        topics = [t.strip() for t in topics.split(",") if t.strip()]
    if not offset_map:
        return "earliest" if from_beginning else "latest"
    nested = all(isinstance(v, dict) for v in offset_map.values())
    if not nested:
        if len(topics) != 1:
            raise ValueError(
                "multi-topic subscription %r needs per-topic offset maps "
                "({topic: {partition: offset}}); a flat {partition: offset} "
                "map is ambiguous and Spark requires specific-offset JSON "
                "to cover every subscribed TopicPartition" % (topics,))
        offset_map = {topics[0]: offset_map}
    missing = set(topics) - set(offset_map)
    if missing:
        raise ValueError(
            "startingOffsets JSON must cover every subscribed topic; "
            "missing offsets for %s" % sorted(missing))
    unknown = set(offset_map) - set(topics)
    if unknown:
        raise ValueError(
            "offset_map names topics not in the subscription: %s"
            % sorted(unknown))
    none_sentinel = -2 if from_beginning else -1
    return json.dumps({t: {
        str(p): (none_sentinel if o == -1 else o + 1)
        for p, o in sorted(m.items())}
        for t, m in sorted(offset_map.items())})


def sink_options(brokers: str, conf: dict | None = None) -> dict[str, str]:
    """The COMPLETE option dict a ``write.format("kafka")`` receives
    (pure, golden-testable twin of :func:`reader_options`)."""
    opts = {"kafka.bootstrap.servers": brokers}
    opts.update(writer_kafka_options(conf or {}))
    return opts


def resume_topic(topic: str, diff: bool) -> str:
    """KafkaReader.java:86-89: with topic.diff the writer publishes to
    ``<topic>_etl`` — the same name route_stage assigns to the ok-sink."""
    return topic + "_etl" if diff else topic


def reader_options(conf: dict, offset_map: dict | None = None
                   ) -> dict[str, str]:
    """The COMPLETE option dict a ``readStream.format("kafka")`` receives —
    a pure function so tests can pin the exact contract (an option-name typo
    here would otherwise only surface against a live broker).

    ``failOnDataLoss=false`` mirrors the reference's behavior when stored
    offsets have been compacted/expired away: it seeks to the earliest
    available rather than aborting (CustomKafkaConsumer.java:125-147 always
    seeks, never validates retention)."""
    topics = conf[READER_KAFKA_TOPICS]
    from_beginning = str(conf.get(FROM_BEGINNING, "false")) == "true"
    opts = {
        "subscribe": topics,
        "startingOffsets":
            starting_offsets(topics, offset_map, from_beginning)
            if offset_map is not None
            else ("earliest" if from_beginning else "latest"),
        "failOnDataLoss": "false",
    }
    opts.update(reader_kafka_options(conf))
    return opts


def kafka_stream_reader(spark: SparkSession, conf: dict,
                        offset_map: dict | None = None
                        ) -> DataFrame:
    """``readStream.format("kafka")`` wired from reference properties.

    Returns a streaming DataFrame of ``(text string, topic, partition,
    offset)`` — the engine's parse stage applies unchanged (the reference
    feeds consumer record values through the same GrokParser,
    CustomKafkaConsumer.java:171-183). Raises ``NotImplementedError`` with
    the exact fix when the connector jar is absent (this sandbox).
    """
    reader = spark.readStream.format("kafka")
    for k, v in reader_options(conf, offset_map).items():
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
