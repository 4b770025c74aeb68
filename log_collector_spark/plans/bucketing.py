"""Bucketed (co-located) joins — the big×big join strategy at 100 TB.

Broadcast joins cover small dimensions (operators/enrich.py); when BOTH
sides are large (fact×fact — e.g. joining a parsed-events table back to a
conversation-features table on conv_id), the scale answer is to bucket both
tables by the join key at WRITE time: Spark then plans a SortMergeJoin with
NO shuffle exchange on either side — the join cost collapses from two
full-data shuffles to a per-bucket merge, and it amortizes across every
downstream join on the same key.

This is the DataFrame-API analog of the reference's per-partition Kafka
consumer alignment (partition-key affinity between producer and consumer,
CustomKafkaConsumer.java:118-124): co-partitioning is decided once at
layout time, not per query.

Notes for real deployments:
- bucket counts must MATCH (or divide) across tables joined together,
- ``spark.sql.sources.bucketing.enabled`` (default true) and
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` control usage,
- on Iceberg the same layout is ``PARTITIONED BY (bucket(N, key))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int, *,
                   path: str | None = None, sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table; sorting by
    the key lets SortMergeJoin skip the per-task sort too."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The ``merge`` hint
    pins SortMergeJoin (a broadcast would hide the co-location evidence);
    with aligned buckets the plan has ZERO shuffle exchanges."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, key)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed plan (plan-audit
    helper: a co-located join must report 0 before the aggregate)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange hashpartitioning" in line)
