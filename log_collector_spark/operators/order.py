"""Stable turn ordering under skew (north_rule requirement).

The reference's analog is the lexicographic file sort + sequential line read
(DefaultFileReader.java:196-203 + the readLine loop). At 10^12-turn scale the
pitfall is hot conversations: a plain ``repartition(conv_id)`` puts a whole
hot conversation in one task. Strategy:

- ``ordered_salted``: repartition on (conv_id, salt) where salt spreads rows
  of the SAME conversation across S partitions, then
  ``sortWithinPartitions(conv_id, turn_idx)``. Correct for any per-turn map
  (parse/enrich/route are row-local), and turn order is still recoverable
  within each (conv_id, salt) slice; use when no whole-conversation state is
  needed — maximum balance.
- ``ordered_by_conversation``: repartition on conv_id only +
  sortWithinPartitions — required when an operator needs the WHOLE
  conversation in order (multiline assembly, session windows). AQE skew
  handling is on as belt-and-braces for the shuffle itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 8


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS,
              col: str = "salt") -> DataFrame:
    # deterministic: same row → same salt (hash of turn_idx), so re-runs are
    # stable and resume-safe (no rand())
    return df.withColumn(col, F.pmod(F.hash("turn_idx"), F.lit(buckets)))


def ordered_salted(df: DataFrame, num_partitions: int | None = None,
                   buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    d = with_salt(df, buckets)
    parts = [F.col("conv_id"), F.col("salt")]
    d = d.repartition(num_partitions, *parts) if num_partitions else \
        d.repartition(*parts)
    return d.sortWithinPartitions("conv_id", "turn_idx").drop("salt")


def ordered_by_conversation(df: DataFrame,
                            num_partitions: int | None = None) -> DataFrame:
    d = df.repartition(num_partitions, "conv_id") if num_partitions else \
        df.repartition("conv_id")
    return d.sortWithinPartitions("conv_id", "turn_idx")


def globally_ordered(df: DataFrame) -> DataFrame:
    """Total order (range partitioned) — for golden-file equality dumps only;
    a full sort is a range-exchange, don't use it mid-pipeline."""
    return df.orderBy("conv_id", "turn_idx")
