"""Table-format isolation layer (SURVEY §7.0): Iceberg when available,
parquet otherwise — nothing else in the engine mentions a format.

The production design targets Iceberg tables (atomic commits back the
checkpoint protocol in plans/checkpoint.py; partition pruning backs S2).
This sandbox ships no Iceberg runtime jar, so :func:`iceberg_available`
detects the catalog and every caller transparently gets parquet with the
same API. On a real cluster, set::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hive|hadoop|rest

and pass ``lake.db.table`` names instead of paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _is_table_name(target: str) -> bool:
    return "/" not in target and "." in target


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read an Iceberg table name (``catalog.db.table``) or a parquet path."""
    if _is_table_name(target) and iceberg_available(spark):
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, *, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Append/overwrite an Iceberg table or parquet path (same semantics the
    checkpoint protocol relies on: Iceberg commits are atomic; the parquet
    fallback uses directory-overwrite staging instead)."""
    spark = df.sparkSession
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if _is_table_name(target) and iceberg_available(spark):
        w.format("iceberg").saveAsTable(target)
    else:
        w.parquet(target)
