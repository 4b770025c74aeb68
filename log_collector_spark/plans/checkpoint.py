"""Checkpoint / lineage / idempotent resume (W6 + W7 + north_rule).

Reference protocol: write batch → persist ``filename:offset``
(reader/file/DefaultFileReader.java:306-310) — at-least-once, duplicates on
crash between the two steps. This engine upgrades to EFFECTIVELY-ONCE:

- unit of work = source file (the analog of the reference's per-file offset;
  Parquet/Iceberg files are immutable so "file processed" replaces byte
  offsets),
- each run processes the files NOT yet in the checkpoint table, writes
  outputs to a staging directory keyed by a DETERMINISTIC batch id (md5 of
  the sorted pending-file list) with ``mode=overwrite``, then appends
  checkpoint rows. A crash between write and commit simply overwrites the
  same staging dir on re-run — no duplicates,
- lineage granularity: per (run, batch, source file, physical partition)
  row counts + success/error metrics, one checkpoint table row each
  (north_rule: "every stage emits per-partition lineage records and
  metrics to a checkpoint table"),
- at cluster scale the same protocol runs against an Iceberg table with
  atomic commits instead of a directory rename; the DataFrame code is
  identical (the table format is isolated behind the write calls).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_collector_spark.operators import aggregate as agg_ops
from log_collector_spark.plans import pipeline as pl

CKPT_TABLE = "checkpoint"


def _ckpt_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, CKPT_TABLE)


def _table_exists(path: str) -> bool:
    """The checkpoint tables legitimately don't exist on a first run —
    check before spark.read so Spark's datasource doesn't log a scary
    (but caught) FileNotFoundException at ERROR level."""
    return os.path.isdir(path)


def committed_files(spark: SparkSession, ckpt_dir: str) -> set[str]:
    path = _ckpt_path(ckpt_dir)
    if not _table_exists(path):
        return set()
    try:
        rows = spark.read.parquet(path).select("src_file").distinct().collect()
    except Exception:
        return set()
    return {r["src_file"] for r in rows}


def committed_batches(spark: SparkSession, ckpt_dir: str) -> set[str]:
    path = _ckpt_path(ckpt_dir)
    if not _table_exists(path):
        return set()
    try:
        rows = spark.read.parquet(path).select("batch_id").distinct().collect()
    except Exception:
        return set()
    return {r["batch_id"] for r in rows}


def clean_orphan_staging(spark: SparkSession, out_dir: str,
                         ckpt_dir: str) -> list[str]:
    """Delete staging dirs whose batch_id never committed.

    Closes the effectively-once hole when the pending set CHANGES between a
    crash-before-commit and the retry: the retry's batch_id differs (it is
    the md5 of the pending-file list), so the orphaned ``batch=<old>`` dir
    would never be overwritten and ``read_output`` would double-count every
    row of the crashed batch. Run this before each batch (run_resumable does).
    """
    import shutil

    if not os.path.isdir(out_dir):
        return []
    done = committed_batches(spark, ckpt_dir)
    removed = []
    for d in os.listdir(out_dir):
        if d.startswith("batch=") and d.split("=", 1)[1] not in done:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
            removed.append(d)
    return removed


def pending_files(spark: SparkSession, input_dir: str,
                  ckpt_dir: str, *,
                  filename_regex: str | None = None,
                  last_file: str | None = None) -> list[str]:
    """Files to process: regex/skip-before pruning (S3, SugoFileFilter
    semantics — see sources/file_filter.py) minus the committed set.

    The committed set is subtracted with a LEFT ANTI join (candidate listing
    ⟕ checkpoint table) — the committed set is never materialized on the
    driver, so this works unchanged when the checkpoint table holds 10^8
    rows. Only the (small) pending result is collected."""
    from log_collector_spark.sources.file_filter import filtered_files

    all_files = [f for f in filtered_files(input_dir, filename_regex,
                                           last_file)
                 if filename_regex is not None or f.endswith(".parquet")]
    if not all_files:
        return []
    if not _table_exists(_ckpt_path(ckpt_dir)):
        return all_files
    try:
        done = spark.read.parquet(_ckpt_path(ckpt_dir)).select("src_file")
    except Exception:
        return all_files
    cand = spark.createDataFrame([(f,) for f in all_files],
                                 "src_file string")
    pend = {r["src_file"]
            for r in cand.join(done, "src_file", "left_anti").collect()}
    return [f for f in all_files if f in pend]


def batch_id(files: list[str]) -> str:
    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()[:16]


def lineage_stats(routed: DataFrame, run_id: str, bid: str,
                  stage: str) -> DataFrame:
    """Per (source file, physical partition) lineage + metric counters."""
    return (routed
            .withColumn("_pid", F.spark_partition_id())
            .groupBy(F.col("_src_file").alias("src_file"), F.col("_pid"))
            .agg(F.count(F.lit(1)).alias("lines"),
                 F.sum(agg_ops.success_expr().cast("long")).alias("success"),
                 F.sum(agg_ops.error_expr().cast("long")).alias("error"))
            .select(F.lit(run_id).alias("run_id"),
                    F.lit(bid).alias("batch_id"),
                    F.lit(stage).alias("stage"),
                    "src_file",
                    F.col("_pid").alias("partition_id"),
                    "lines", "success", "error",
                    F.current_timestamp().alias("committed_at")))


FILESTATE_TABLE = "filestate"


def _filestate_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, FILESTATE_TABLE)


def record_filestate(spark: SparkSession, ckpt_dir: str,
                     files: list[str]) -> None:
    """Commit-time sidecar: (src_file, bytes) per processed file — the analog
    of the reference's stored byte offset (DefaultFileReader.java:306-310)."""
    rows = [(f, os.path.getsize(f)) for f in files if os.path.exists(f)]
    if not rows:
        return
    spark.createDataFrame(rows, "src_file string, bytes long") \
        .coalesce(1).write.mode("append").parquet(_filestate_path(ckpt_dir))


def truncated_files(spark: SparkSession, ckpt_dir: str) -> list[str]:
    """S5 tail-truncate detection (DefaultFileReader.java:217-219: stored
    offset > current length → restart from 0). File-granularity analog: a
    committed file whose on-disk size SHRANK was truncated/rotated in place
    — its checkpoint entry is stale."""
    if not _table_exists(_filestate_path(ckpt_dir)):
        return []
    try:
        rows = (spark.read.parquet(_filestate_path(ckpt_dir))
                .groupBy("src_file")
                .agg(F.max("bytes").alias("bytes")).collect())
    except Exception:
        return []
    return [r["src_file"] for r in rows
            if os.path.exists(r["src_file"])
            and os.path.getsize(r["src_file"]) < r["bytes"]]


TRUNCATED_TOMBSTONE = "truncated://"


def recover_truncated(spark: SparkSession, ckpt_dir: str) -> list[str]:
    """Invalidate checkpoint rows of truncated files so the next run re-reads
    them from the start (the reference's ``currentByteOffset = 0``,
    DefaultFileReader.java:217-219).

    Checkpoint rows are TOMBSTONED, not dropped: ``src_file`` is rewritten to
    ``truncated://<path>`` — it no longer matches the real path (so the file
    becomes pending again) but the row, and crucially its ``batch_id``, stays
    in the table. Dropping the rows would make a batch that consisted only of
    truncated files vanish from ``committed_batches``, and the next
    ``clean_orphan_staging`` would then rmtree that batch's COMMITTED output
    dir — retracting rows the reference semantics (re-emit, never retract)
    say must stay. Filestate rows ARE dropped (keeping the stale larger size
    would re-flag the file as truncated forever).

    The rewrite is driver-side (the checkpoint table is metadata — one row
    per file×partition, ~10^6 rows at 100 TB); on an Iceberg-backed
    checkpoint this is an ``UPDATE ... WHERE src_file IN (...)``. Like the
    reference's restart-from-0, truncate recovery is at-least-once for the
    affected file: rows its pre-truncate content already emitted stay in the
    output (the reference re-emits to its topic the same way).
    """
    bad = truncated_files(spark, ckpt_dir)
    if not bad:
        return []
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pac
    import pyarrow.parquet as pq
    badset = set(bad)

    ckpt = _ckpt_path(ckpt_dir)
    if os.path.isdir(ckpt):
        tbl = pq.read_table(ckpt)
        idx = tbl.schema.get_field_index("src_file")
        col = [TRUNCATED_TOMBSTONE + v if v in badset else v
               for v in tbl.column("src_file").to_pylist()]
        tbl = tbl.set_column(idx, "src_file", pa.array(col, pa.string()))
        shutil.rmtree(ckpt)
        os.makedirs(ckpt)
        pq.write_table(tbl, os.path.join(ckpt, "part-0000.parquet"))

    fs = _filestate_path(ckpt_dir)
    if os.path.isdir(fs):
        tbl = pq.read_table(fs)
        keep = tbl.filter(pac.invert(pac.is_in(
            tbl.column("src_file"), value_set=pa.array(bad))))
        shutil.rmtree(fs)
        os.makedirs(fs)
        pq.write_table(keep, os.path.join(fs, "part-0000.parquet"))
    return bad


def run_resumable(spark: SparkSession, input_dir: str, ckpt_dir: str,
                  out_dir: str, run_id: str, *,
                  crash_before_commit: bool = False,
                  filename_regex: str | None = None,
                  last_file: str | None = None,
                  detect_truncate: bool = False) -> dict:
    """One resumable pipeline run over the files not yet checkpointed.

    Returns {"batch_id", "files", "rows"}; with ``crash_before_commit`` the
    sink data is written but the checkpoint append is skipped (simulates the
    reference's crash window — re-running must NOT duplicate output).
    """
    clean_orphan_staging(spark, out_dir, ckpt_dir)
    if detect_truncate:
        recover_truncated(spark, ckpt_dir)
    files = pending_files(spark, input_dir, ckpt_dir,
                          filename_regex=filename_regex, last_file=last_file)
    if not files:
        return {"batch_id": None, "files": [], "rows": 0}
    bid = batch_id(files)
    df = spark.read.parquet(*files).withColumn(
        "_src_file", F.input_file_name())
    # input_file_name() yields file:// URIs; normalize to the plain paths the
    # checkpoint table stores
    df = df.withColumn("_src_file",
                       F.regexp_replace("_src_file", "^file:(//)?", ""))
    routed = pl.route_stage(pl.enrich_stage(pl.parse_stage(df), spark))
    staging = os.path.join(out_dir, f"batch={bid}")
    (routed.filter(F.col("sink").isNotNull())
           .write.mode("overwrite").partitionBy("sink").parquet(staging))
    if crash_before_commit:
        return {"batch_id": bid, "files": files, "rows": -1,
                "crashed": True}
    stats = lineage_stats(routed, run_id, bid, "route")
    stats.write.mode("append").parquet(_ckpt_path(ckpt_dir))
    record_filestate(spark, ckpt_dir, files)
    n = spark.read.parquet(staging).count()
    return {"batch_id": bid, "files": files, "rows": n}


def _empty_output(spark: SparkSession) -> DataFrame:
    """Zero-row frame with the REAL fan-out output schema (derived by
    analyzing the stage chain over an empty transcripts-shaped input — plan
    analysis only, nothing executes), so callers of the no-committed-batches
    case can still select/filter the columns they would get from data."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, _src_file string")
    routed = pl.route_stage(pl.enrich_stage(pl.parse_stage(empty), spark))
    # partitionBy("sink") read-back ordering: data columns first, the
    # partition column last
    cols = [c for c in routed.columns if c != "sink"] + ["sink"]
    return routed.select(*cols).limit(0)


def read_output(spark: SparkSession, out_dir: str,
                ckpt_dir: str | None = None) -> DataFrame:
    """Read the fanned-out sink data. With ``ckpt_dir``, read ONLY batches
    recorded in the checkpoint table — a reader running inside another run's
    write-to-commit window then never sees uncommitted staging data."""
    if ckpt_dir is not None:
        done = committed_batches(spark, ckpt_dir)
        paths = [os.path.join(out_dir, f"batch={b}") for b in sorted(done)
                 if os.path.isdir(os.path.join(out_dir, f"batch={b}"))]
        if not paths:
            return _empty_output(spark)
        return spark.read.option("basePath", out_dir).parquet(*paths)
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*"))


# ---------------------------------------------------------------------------
# Iceberg-backed checkpoint table (SQL emitters; jar-gated)
# ---------------------------------------------------------------------------
# The parquet checkpoint above is the executable backend in this sandbox
# (no iceberg-spark-runtime jar ships with it). On a cluster the same
# metadata lives in an Iceberg table, where the driver-side
# rewrite-the-whole-table dance collapses to single transactional
# statements. These emitters ARE that path: run them verbatim through
# spark.sql() once the catalog exists; iceberg_available() is the gate.

CKPT_TABLE_COLS = "run_id STRING, batch_id STRING, src_file STRING, " \
                  "n_rows BIGINT, n_error BIGINT, committed_at TIMESTAMP"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def iceberg_create_checkpoint_sql(table: str = "ckpt.checkpoint") -> str:
    """Checkpoint table DDL: partitioned by run for cheap per-run listing,
    ordered within files by src_file so the pending-set anti-join's
    build side scans sorted row groups."""
    return (f"CREATE TABLE IF NOT EXISTS {table} ({CKPT_TABLE_COLS}) "
            f"USING iceberg PARTITIONED BY (run_id)")


def iceberg_recover_truncated_sql(bad_files: list[str],
                                  table: str = "ckpt.checkpoint") -> str:
    """The transactional form of :func:`recover_truncated`'s tombstone
    rewrite — one UPDATE, snapshot-isolated, no table rewrite. batch_id
    survives (same retraction-safety argument as the parquet path)."""
    quoted = ", ".join("'" + f.replace("'", "''") + "'" for f in bad_files)
    return (f"UPDATE {table} "
            f"SET src_file = concat('{TRUNCATED_TOMBSTONE}', src_file) "
            f"WHERE src_file IN ({quoted})")


def iceberg_commit_batch_sql(table: str = "ckpt.checkpoint") -> str:
    """MERGE form of the commit append: idempotent on (run_id, batch_id,
    src_file) so a retried driver commit cannot double-insert — the Iceberg
    analog of the parquet path's write-once batch files."""
    return (f"MERGE INTO {table} t USING batch_rows s "
            f"ON t.run_id = s.run_id AND t.batch_id = s.batch_id "
            f"AND t.src_file = s.src_file "
            f"WHEN NOT MATCHED THEN INSERT *")


def compact_checkpoint(spark: SparkSession, ckpt_dir: str) -> dict:
    """Compact the checkpoint metadata tables in place — the maintenance
    pass a long-lived resumable pipeline must run: every committed batch
    appends one small parquet file to each table (`coalesce(1).append`),
    so after 10^5 batches a resume pays 10^5 file opens just to learn
    what is already done.

    Semantics preserved EXACTLY:
    - checkpoint table: rows are already per (src_file x partition) facts
      (including ``truncated://`` tombstones, whose batch_ids must keep
      protecting committed output from clean_orphan_staging) — they are
      rewritten verbatim into one file, only the file count changes;
    - filestate table: collapsed to per-file MAX(bytes) — the only
      reading anyone does (truncated_files' groupBy-max), so dropping
      superseded smaller rows changes no answer.

    Driver-side pyarrow (metadata scale, same as recover_truncated), and
    crash-safe the same way resume itself is: the new file is fully
    written into a staging dir first and the swap is two renames — a
    crash between them leaves either the old or the new table readable,
    and re-running compaction is idempotent. Returns per-table
    (files_before, files_after, rows)."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    report = {}

    def _swap(path: str, tbl) -> None:
        stage = path + ".compact-staging"
        if os.path.isdir(stage):
            shutil.rmtree(stage)
        os.makedirs(stage)
        pq.write_table(tbl, os.path.join(stage, "part-0000.parquet"))
        old = path + ".compact-old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(stage, path)
        shutil.rmtree(old)

    ckpt = _ckpt_path(ckpt_dir)
    if os.path.isdir(ckpt):
        files = glob.glob(os.path.join(ckpt, "*.parquet"))
        tbl = pq.read_table(ckpt)
        _swap(ckpt, tbl)
        report["checkpoint"] = {"files_before": len(files),
                                "files_after": 1, "rows": tbl.num_rows}

    fs = _filestate_path(ckpt_dir)
    if os.path.isdir(fs):
        files = glob.glob(os.path.join(fs, "*.parquet"))
        tbl = pq.read_table(fs)
        agg = (pa.table({"src_file": tbl.column("src_file"),
                         "bytes": tbl.column("bytes")})
               .group_by("src_file").aggregate([("bytes", "max")])
               .rename_columns(["src_file", "bytes"]))
        agg = agg.sort_by("src_file")
        _swap(fs, agg)
        report["filestate"] = {"files_before": len(files),
                               "files_after": 1, "rows": agg.num_rows}
    return report
