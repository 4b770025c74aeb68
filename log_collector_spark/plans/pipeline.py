"""End-to-end pipeline composition: scan → parse → enrich → route → aggregate.

Stages are pure functions ``DataFrame → DataFrame`` (the Spark-native echo of
the reference's reflection wiring, reader/ReaderFactory.java:18-23) so the
same chain runs in batch, under ``foreachBatch`` in streaming, and inside
tests. The transcripts table for a scale factor is generated deterministically
(sources/transcripts.py) and cached under /tmp — TESTDATA parquet stays
read-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_collector_spark.grok.compiler import GrokCompiler, CompiledGrok
from log_collector_spark.operators import aggregate as agg_ops
from log_collector_spark.operators import enrich as enrich_ops
from log_collector_spark.operators import parse as parse_ops
from log_collector_spark.operators import route as route_ops
from log_collector_spark.sources import transcripts as tx

TRANSCRIPTS_CACHE = os.environ.get("SPARK_GRAFT_TX_CACHE",
                                   "/tmp/spark_graft_transcripts")
# turns per unit scale factor: sf0.001→12k, sf0.01→120k, sf0.1→1.2M
TURNS_PER_SF = 12_000_000

_COMPILED: CompiledGrok | None = None


def compiled_transcript_grok() -> CompiledGrok:
    global _COMPILED
    if _COMPILED is None:
        _COMPILED = GrokCompiler().compile(tx.GROK_EXPR)
    return _COMPILED


def sf_of_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


def transcripts_path(sf_dir: str, n_turns: int | None = None) -> str:
    sf = sf_of_dir(sf_dir)
    n = n_turns or max(1000, int(TURNS_PER_SF * sf))
    # an explicit n_turns gets its own cache dir — write_transcripts is
    # idempotent per (n, seed) marker and would otherwise regenerate (and
    # delete) the default-sized cache on every alternation
    suffix = f"sf{sf}" if n_turns is None else f"sf{sf}_n{n_turns}"
    path = os.path.join(TRANSCRIPTS_CACHE, suffix)
    return tx.write_transcripts(path, n)


def load_transcripts(spark: SparkSession, sf_dir: str,
                     n_turns: int | None = None) -> DataFrame:
    return spark.read.parquet(transcripts_path(sf_dir, n_turns))


_LOOKUP_CACHE: dict[str, tuple[DataFrame, DataFrame]] = {}


def lookups(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Role/tool lookup DataFrames, built once per session — they are static
    dimension tables; rebuilding them per query adds serial driver time.
    Keyed on applicationId (stable, unlike id(spark): a stopped session's
    id() can be reused by a new one, handing out dead DataFrames)."""
    key = spark.sparkContext.applicationId
    if key not in _LOOKUP_CACHE:
        _LOOKUP_CACHE.clear()
        _LOOKUP_CACHE[key] = (spark.createDataFrame(tx.role_lookup_df()),
                              spark.createDataFrame(tx.tool_lookup_df()))
    return _LOOKUP_CACHE[key]


def parse_stage(df: DataFrame, source: str = "transcripts",
                host: str = "spark", max_size: int = tx.DEFAULT_MAX_SIZE
                ) -> DataFrame:
    """Vectorized grok parse with reference provenance + routing predicates."""
    out = parse_ops.grok_parse(
        df, compiled_transcript_grok(),
        provenance={"directory": source, "host": host, "filename": source},
        max_size=max_size)
    return enrich_ops.with_provenance(out, directory=source, host=host,
                                      filename=source)


def enrich_stage(df: DataFrame, spark: SparkSession) -> DataFrame:
    role_lut, tool_lut = lookups(spark)
    return enrich_ops.enrich_roles_tools(df, role_lut, tool_lut)


def route_stage(df: DataFrame, source: str = "transcripts") -> DataFrame:
    return route_ops.route(df, constant_source=source)


def full_pipeline(spark: SparkSession, sf_dir: str,
                  n_turns: int | None = None,
                  source: str = "transcripts") -> DataFrame:
    """scan → parse → enrich → route (one narrow chain + two broadcast joins;
    zero shuffles until an aggregate is requested)."""
    df = load_transcripts(spark, sf_dir, n_turns)
    df = parse_stage(df, source=source)
    df = enrich_stage(df, spark)
    return route_stage(df, source=source)


def pipeline_aggregates(routed: DataFrame) -> dict[str, DataFrame]:
    """The reference's metric surface over a routed frame."""
    return {
        "sink_tallies": route_ops.sink_tallies(routed),
        "success_error": agg_ops.success_error_counts(routed, "directory"),
        "minute_buckets": agg_ops.minute_buckets(routed, "logtime"),
        "conversation_stats": agg_ops.conversation_stats(routed),
        "tool_usage": agg_ops.tool_usage(routed),
    }
