"""Resumability (checkpoint/lineage) + Structured Streaming variant tests.

North_rule coverage: idempotent mid-pipeline resume with per-partition
lineage rows, streaming offsets (second run processes nothing), watermarked
metric buckets, and stateful multiline assembly across micro-batches.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.plans import checkpoint as ck
from log_collector_spark.plans import pipeline as pl

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tx_files():
    path = pl.transcripts_path(SF_DIR)
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet"))


def _expected_routed_count(spark):
    routed = pl.full_pipeline(spark, SF_DIR)
    return routed.filter(F.col("sink").isNotNull()).count()


def test_resume_incremental_and_idempotent(spark, tmp_path, tx_files):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)

    half = len(tx_files) // 2
    for f in tx_files[:half]:
        shutil.copy(f, input_dir)
    r1 = ck.run_resumable(spark, input_dir, ckpt, out, "run1")
    assert len(r1["files"]) == half and r1["rows"] > 0

    # crash window: write sinks but skip the checkpoint commit, then re-run —
    # the deterministic staging dir overwrite must leave no duplicates
    for f in tx_files[half:]:
        shutil.copy(f, input_dir)
    r2 = ck.run_resumable(spark, input_dir, ckpt, out, "run2",
                          crash_before_commit=True)
    assert r2.get("crashed")
    r3 = ck.run_resumable(spark, input_dir, ckpt, out, "run3")
    assert sorted(r3["files"]) == sorted(r2["files"])
    assert len(r3["files"]) == len(tx_files) - half

    # nothing pending afterwards
    r4 = ck.run_resumable(spark, input_dir, ckpt, out, "run4")
    assert r4["files"] == []

    total = ck.read_output(spark, out).count()
    assert total == _expected_routed_count(spark)

    # lineage: per (file, partition) rows cover every input file, and the
    # metric counters reconcile with the input row count
    lineage = spark.read.parquet(os.path.join(ckpt, "checkpoint"))
    files_in_ckpt = {os.path.basename(r["src_file"])
                     for r in lineage.select("src_file").distinct().collect()}
    assert files_in_ckpt == {os.path.basename(f) for f in tx_files}
    n_lines = lineage.agg(F.sum("lines")).collect()[0][0]
    n_input = spark.read.parquet(*tx_files).count()
    assert n_lines == n_input
    assert {"run_id", "batch_id", "stage", "src_file", "partition_id",
            "lines", "success", "error", "committed_at"} <= set(lineage.columns)


def test_resume_after_crash_with_new_files(spark, tmp_path, tx_files):
    """Crash-before-commit, then NEW input files arrive before the retry: the
    retry's pending set (and hence batch_id) differs, so the orphaned staging
    dir must be cleaned, not double-counted (ADVICE round 1)."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)

    third = max(1, len(tx_files) // 3)
    for f in tx_files[:third]:
        shutil.copy(f, input_dir)
    r1 = ck.run_resumable(spark, input_dir, ckpt, out, "run1",
                          crash_before_commit=True)
    assert r1.get("crashed")
    orphan = os.path.join(out, f"batch={r1['batch_id']}")
    assert os.path.isdir(orphan)

    # new files arrive → different pending set → different batch_id
    for f in tx_files[third:]:
        shutil.copy(f, input_dir)
    r2 = ck.run_resumable(spark, input_dir, ckpt, out, "run2")
    assert r2["batch_id"] != r1["batch_id"]
    assert not os.path.isdir(orphan), "orphaned staging dir not cleaned"

    total = ck.read_output(spark, out).count()
    assert total == _expected_routed_count(spark)
    # committed-only read sees the same rows
    assert ck.read_output(spark, out, ckpt).count() == total


def test_read_output_committed_only_hides_crash_window(spark, tmp_path,
                                                       tx_files):
    """A reader inside another run's write-to-commit window must not see the
    uncommitted staging rows when reading committed-only."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)
    for f in tx_files[:2]:
        shutil.copy(f, input_dir)
    ck.run_resumable(spark, input_dir, ckpt, out, "run1")
    committed = ck.read_output(spark, out, ckpt).count()
    assert committed > 0

    shutil.copy(tx_files[2], input_dir)
    r = ck.run_resumable(spark, input_dir, ckpt, out, "run2",
                         crash_before_commit=True)
    assert r.get("crashed")
    # raw glob sees the staging rows; committed-only does not
    assert ck.read_output(spark, out).count() > committed
    assert ck.read_output(spark, out, ckpt).count() == committed


def test_truncate_recovery_reprocesses_shrunk_file(spark, tmp_path, tx_files):
    """S5 (DefaultFileReader.java:217-219): a committed file whose size
    shrank is re-read from the start — its checkpoint entry is invalidated
    and the next run picks it up again."""
    import pyarrow.parquet as pq

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)
    for f in tx_files[:2]:
        shutil.copy(f, input_dir)
    r1 = ck.run_resumable(spark, input_dir, ckpt, out, "run1",
                          detect_truncate=True)
    assert len(r1["files"]) == 2

    # nothing truncated yet → second run is a no-op
    r2 = ck.run_resumable(spark, input_dir, ckpt, out, "run2",
                          detect_truncate=True)
    assert r2["files"] == []

    # truncate one committed file in place (half the rows → smaller file)
    victim = sorted(os.path.join(input_dir, f) for f in os.listdir(input_dir)
                    if f.endswith(".parquet"))[0]
    orig_size = os.path.getsize(victim)
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(0, tbl.num_rows // 2), victim)
    assert os.path.getsize(victim) < orig_size  # sanity: it shrank

    r3 = ck.run_resumable(spark, input_dir, ckpt, out, "run3",
                          detect_truncate=True)
    assert r3["files"] == [victim]
    # and afterwards the checkpoint is consistent again
    r4 = ck.run_resumable(spark, input_dir, ckpt, out, "run4",
                          detect_truncate=True)
    assert r4["files"] == []


def test_truncate_of_batch_only_file_keeps_committed_output(spark, tmp_path,
                                                            tx_files):
    """Regression (round-2 ADVICE): when a truncated file was a batch's ONLY
    file, recovery must not erase that batch_id from committed_batches —
    otherwise the next run's clean_orphan_staging rmtree's the batch's
    COMMITTED output dir, retracting rows (the reference re-emits, never
    retracts). Recovery tombstones the checkpoint rows instead of dropping
    them, so the batch survives and the file is still re-processed."""
    import pyarrow.parquet as pq

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)

    # batch 1: exactly one file
    shutil.copy(tx_files[0], input_dir)
    r1 = ck.run_resumable(spark, input_dir, ckpt, out, "run1",
                          detect_truncate=True)
    assert len(r1["files"]) == 1
    batch1_dir = os.path.join(out, f"batch={r1['batch_id']}")
    c1 = ck.read_output(spark, out, ckpt).count()
    assert c1 == r1["rows"] > 0

    # truncate the batch's only file in place; a new file arrives too
    victim = r1["files"][0]
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(0, tbl.num_rows // 2), victim)
    shutil.copy(tx_files[1], input_dir)

    r2 = ck.run_resumable(spark, input_dir, ckpt, out, "run2",
                          detect_truncate=True)
    # the truncated file is re-processed together with the new one
    assert sorted(os.path.basename(f) for f in r2["files"]) == \
        sorted(os.path.basename(f) for f in [victim,
               os.path.join(input_dir, os.path.basename(tx_files[1]))])
    # batch 1's id survived recovery → its committed output was NOT cleaned
    assert r1["batch_id"] in ck.committed_batches(spark, ckpt)
    assert os.path.isdir(batch1_dir), \
        "clean_orphan_staging deleted a committed batch after truncate recovery"
    # output = pre-truncate rows (kept, at-least-once) + batch 2 rows
    assert ck.read_output(spark, out, ckpt).count() == c1 + r2["rows"]

    # steady state afterwards: nothing pending, nothing re-flagged
    r3 = ck.run_resumable(spark, input_dir, ckpt, out, "run3",
                          detect_truncate=True)
    assert r3["files"] == []


def test_read_output_empty_has_real_schema(spark, tmp_path):
    """ADVICE round 2: the no-committed-batches frame must carry the real
    fan-out schema (not a one-column stub) so callers can select columns."""
    df = ck.read_output(spark, str(tmp_path / "nothing"),
                        str(tmp_path / "no_ckpt"))
    assert df.count() == 0
    cols = set(df.columns)
    assert "sink" in cols and {"conv_id", "turn_idx", "role"} <= cols
    assert df.columns[-1] == "sink"  # partition column reads back last
    df.filter(F.col("sink").isNotNull()).select("conv_id").count()


def test_filename_regex_filter_semantics():
    """SugoFileFilter.accept parity (S3): full regex match on the basename +
    lexicographic skip-before-lastFileName with equality accepted."""
    from log_collector_spark.sources.file_filter import accept
    assert accept("app.2024-01-02.log", r"app\..*\.log")
    assert not accept("app.2024-01-02.log.gz", r"app\..*\.log")  # fullmatch
    assert not accept("other.log", r"app\..*\.log")
    # skip-before: compareTo > 0 rejects, equality accepted
    assert not accept("app.2024-01-01.log", r"app\..*\.log",
                      "app.2024-01-02.log")
    assert accept("app.2024-01-02.log", r"app\..*\.log",
                  "app.2024-01-02.log")
    assert accept("app.2024-01-03.log", r"app\..*\.log",
                  "app.2024-01-02.log")
    assert accept("anything", None)  # no regex configured → all pass


def test_filename_regex_prunes_before_scan(spark, tmp_path, tx_files):
    """Excluded files must never be scanned: the lineage table (one row per
    scanned source file) shows only accepted files, and the excluded file's
    rows are absent from the output."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)
    for f in tx_files[:2]:
        shutil.copy(f, input_dir)
    # a decoy that would parse fine but must be pruned by name
    shutil.copy(tx_files[2], os.path.join(input_dir, "skipme-0002.parquet"))

    r = ck.run_resumable(spark, input_dir, ckpt, out, "run1",
                         filename_regex=r"part-\d+\.parquet")
    assert len(r["files"]) == 2
    lineage = spark.read.parquet(os.path.join(ckpt, "checkpoint"))
    scanned = {os.path.basename(x["src_file"])
               for x in lineage.select("src_file").distinct().collect()}
    assert scanned == {os.path.basename(f) for f in tx_files[:2]}
    n_expected = (pl.parse_stage(spark.read.parquet(*tx_files[:2]))
                  .filter(F.col("is_blank") == False)  # noqa: E712
                  .count())
    assert ck.read_output(spark, out).count() == n_expected

    # skip-before-checkpoint: last_file prunes lexicographically-earlier names
    r2 = ck.run_resumable(spark, input_dir, ckpt, out, "run2",
                          filename_regex=r".*\.parquet",
                          last_file="skipme-0000.parquet")
    assert [os.path.basename(f) for f in r2["files"]] == ["skipme-0002.parquet"]


def test_stream_pipeline_matches_batch_and_tracks_offsets(spark, tmp_path):
    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "sck")
    out = str(tmp_path / "sout")
    q = sp.start_pipeline_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 == _expected_routed_count(spark)

    # second run over the same directory: offsets in the checkpoint say
    # everything is processed — no new rows (S4/S7 resume semantics)
    q2 = sp.start_pipeline_stream(spark, input_dir, ckpt, out)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_stream_processing_time_trigger_ingests_new_files(spark, tmp_path):
    """Trigger.ProcessingTime mode (the reference's scan loop,
    DefaultFileReader.java:107): a continuously-running query picks up files
    that arrive AFTER start, then stops cleanly."""
    from log_collector_spark.streaming import pipeline as sp

    src_files = sorted(
        os.path.join(pl.transcripts_path(SF_DIR), f)
        for f in os.listdir(pl.transcripts_path(SF_DIR))
        if f.endswith(".parquet"))
    input_dir = str(tmp_path / "tin")
    os.makedirs(input_dir)
    shutil.copy(src_files[0], input_dir)
    ckpt = str(tmp_path / "tck")
    out = str(tmp_path / "tout")
    q = sp.start_pipeline_stream(spark, input_dir, ckpt, out,
                                 available_now=False,
                                 processing_time="1 second")
    try:
        deadline = time.time() + 120
        n0 = None
        while time.time() < deadline:
            try:
                n0 = spark.read.parquet(out).count()
                if n0 > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert n0 and n0 > 0, "first file never processed"
        # a NEW file arrives while the query is running
        shutil.copy(src_files[1], input_dir)
        while time.time() < deadline:
            n1 = spark.read.parquet(out).count()
            if n1 > n0:
                break
            time.sleep(1)
        assert spark.read.parquet(out).count() > n0, \
            "late-arriving file not ingested by the processing-time trigger"
    finally:
        q.stop()
        q.awaitTermination(60)


def test_stream_minute_buckets_watermarked(spark, tmp_path):
    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "wck")
    out = str(tmp_path / "wout")
    q = sp.start_minute_bucket_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # every emitted bucket matches the batch ground truth
    src = spark.read.parquet(input_dir)
    truth = (src.groupBy(F.window("ts", "1 minute").alias("w"))
                .agg(F.count(F.lit(1)).alias("n_true"))
                .select(F.col("w.start").alias("bucket_start"),
                        F.col("n_true")))
    joined = got.join(truth, "bucket_start", "left")
    bad = joined.filter((F.col("n_true").isNull()) |
                        (F.col("n") != F.col("n_true"))).count()
    assert bad == 0


def test_streaming_multiline_stateful(spark, tmp_path):
    from log_collector_spark.operators.multiline import assemble
    from log_collector_spark.streaming.multiline import assemble_stream

    # three chunked line files (cross-batch record continuation: chunk
    # boundaries fall INSIDE records)
    rows = []
    for i in range(9):
        rows.append(("fA", i * 2, f"[rec] head{i}"))
        rows.append(("fA", i * 2 + 1, f" cont{i}"))
    in_dir = tmp_path / "mlin"
    in_dir.mkdir()
    for c in range(2):
        chunk = rows[c * 9:(c + 1) * 9]
        df = spark.createDataFrame(chunk, "file string, line_no long, text string")
        df.coalesce(1).write.parquet(str(in_dir / f"chunk{c}"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    src = (spark.readStream
           .schema("file string, line_no long, text string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(in_dir) + "/chunk*"))
    recs = assemble_stream(src, r"\[.*")
    q = (recs.writeStream.outputMode("append").format("memory")
         .queryName("ml_out").option("checkpointLocation", str(tmp_path / "mlck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {r["record"] for r in spark.sql("select * from ml_out").collect()}

    batch_df = spark.createDataFrame(rows, "filename string, line_no long, text string")
    expected = {r["record"] for r in assemble(batch_df, r"\[.*").collect()}
    # streaming emits a record when the NEXT first-line arrives; the final
    # pending buffer awaits the timeout flush (reference EOF analog)
    assert got, "no records emitted across micro-batches"
    assert got <= expected
    assert len(got) >= len(expected) - 1


def test_stream_dedup_across_batches_and_restarts(spark, tmp_path):
    """Streaming exact dedup: duplicate fingerprints are dropped within a
    run AND across a restart (seen-set persists in the state store)."""
    from datetime import datetime
    from log_collector_spark.streaming import pipeline as sp

    in_dir = tmp_path / "din"
    in_dir.mkdir()
    ckpt = str(tmp_path / "dck")
    out = str(tmp_path / "dout")
    t = datetime(2023, 11, 15, 12, 0, 0)
    mk = lambda conv, idx, text: (conv, idx, "user", text, None, t)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    # file 1: one in-file duplicate pair + two unique rows
    spark.createDataFrame(
        [mk("c1", 0, "hello"), mk("c1", 0, "hello"),
         mk("c1", 1, "world"), mk("c2", 0, "hey")], schema) \
        .coalesce(1).write.parquet(str(in_dir / "f1"))
    q = sp.start_dedup_stream(spark, str(in_dir) + "/f*", ckpt, out)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out)
    assert got1.count() == 3
    assert got1.select("fp").distinct().count() == 3

    # file 2 arrives later: a dup of a row emitted in run 1 + a fresh row
    spark.createDataFrame(
        [mk("c1", 1, "world"), mk("c3", 0, "fresh")], schema) \
        .coalesce(1).write.parquet(str(in_dir / "f2"))
    q2 = sp.start_dedup_stream(spark, str(in_dir) + "/f*", ckpt, out)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert got2.count() == 4  # only the fresh row was appended
    assert got2.filter(F.col("conv_id") == "c3").count() == 1
    assert got2.select("fp").distinct().count() == 4


def test_stream_session_windows_match_batch(spark, tmp_path):
    """Streaming session_window aggregation equals the batch session_window
    ground truth on the same input (every emitted session, exact bounds and
    counts) once availableNow drains."""
    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "sck")
    out = str(tmp_path / "sout")
    q = sp.start_session_window_stream(spark, input_dir, ckpt, out,
                                       gap="30 minutes")
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() > 0
    src = spark.read.parquet(input_dir)
    truth = (src.groupBy("conv_id",
                         F.session_window("ts", "30 minutes").alias("w"))
                .agg(F.count(F.lit(1)).alias("n_true"))
                .select("conv_id", F.col("w.start").alias("session_start"),
                        F.col("n_true")))
    joined = got.join(truth, ["conv_id", "session_start"], "left")
    bad = joined.filter((F.col("n_true").isNull()) |
                        (F.col("n_turns") != F.col("n_true"))).count()
    assert bad == 0


def test_iceberg_checkpoint_sql_emitters(spark):
    """The Iceberg checkpoint backend is jar-gated in this sandbox; pin the
    emitted SQL (the UPDATE keeps batch_id — the retraction-safety invariant
    — and the MERGE key makes commits idempotent)."""
    from log_collector_spark.plans import checkpoint as cp

    assert cp.iceberg_available(spark) in (True, False)  # never raises
    ddl = cp.iceberg_create_checkpoint_sql()
    assert "USING iceberg" in ddl and "PARTITIONED BY (run_id)" in ddl
    up = cp.iceberg_recover_truncated_sql(["/a/x.log", "/b/it's.log"])
    assert up == ("UPDATE ckpt.checkpoint SET src_file = "
                  "concat('truncated://', src_file) "
                  "WHERE src_file IN ('/a/x.log', '/b/it''s.log')")
    mg = cp.iceberg_commit_batch_sql()
    assert "WHEN NOT MATCHED THEN INSERT *" in mg
    assert "t.run_id = s.run_id" in mg and "t.src_file = s.src_file" in mg


def test_stream_metered_pipeline_emits_kairos_batches(spark, tmp_path):
    """W7 end-to-end under foreachBatch: routed fan-out AND one KairosDB
    DTO batch per micro-batch — deltas across batches, tags/type per the
    reference DTOs, and the metric totals reconcile with the routed rows."""
    import json

    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "mck")
    out = str(tmp_path / "mout")
    bodies: list[str] = []
    q = sp.start_metered_pipeline_stream(
        spark, input_dir, ckpt, out,
        post=bodies.append, clock=lambda: 1_700_000_000_000)
    q.awaitTermination(300)

    assert spark.read.parquet(out).count() == _expected_routed_count(spark)
    assert bodies, "no metric batch posted"
    metrics = [m for b in bodies for m in json.loads(b)]
    for m in metrics:
        assert m["type"] == "long"
        assert set(m["tags"]) == {"from", "host"}
        assert m["name"] in ("collector.line.read.success",
                             "collector.line.read.error")
    ok_total = sum(m["value"] for m in metrics
                   if m["name"].endswith("success"))
    err_total = sum(m["value"] for m in metrics
                    if m["name"].endswith("error"))
    df = pl.parse_stage(spark.read.parquet(input_dir))
    n_ok = df.filter(F.col("parse_ok") & ~F.col("is_oversize")).count()
    n_err = df.filter(~F.col("parse_ok") | F.col("is_oversize")).count()
    assert ok_total == n_ok and err_total == n_err

    # a second availableNow run sees no new files -> no new metric batch
    # grows the totals (delta semantics: nothing changed, deltas are 0)
    bodies2: list[str] = []
    q2 = sp.start_metered_pipeline_stream(
        spark, input_dir, ckpt, out,
        post=bodies2.append, clock=lambda: 1_700_000_060_000)
    q2.awaitTermination(300)
    extra = sum(m["value"] for b in bodies2 for m in json.loads(b))
    assert extra == 0


def test_stream_stream_tool_pair_join_matches_batch(spark, tmp_path):
    """Stream-stream interval self-join (call ↔ result) equals the same
    join run in batch over the identical input."""
    from log_collector_spark.streaming import pipeline as sp

    input_dir = pl.transcripts_path(SF_DIR)
    ckpt = str(tmp_path / "jck")
    out = str(tmp_path / "jout")
    q = sp.start_tool_pair_join_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(300)
    got = spark.read.parquet(out)

    src = spark.read.parquet(input_dir)
    calls = (src.filter((F.col("role") == "assistant")
                        & F.col("tool").isNotNull())
                .select(F.col("conv_id").alias("c_conv"),
                        F.col("tool").alias("c_tool"),
                        F.col("turn_idx").alias("call_turn"),
                        F.col("ts").alias("call_ts")))
    results = (src.filter(F.col("role") == "tool")
                  .select(F.col("conv_id").alias("r_conv"),
                          F.col("tool").alias("r_tool"),
                          F.col("turn_idx").alias("result_turn"),
                          F.col("ts").alias("result_ts")))
    want = calls.join(
        results,
        F.expr("""
            c_conv = r_conv AND c_tool = r_tool
            AND result_ts >= call_ts
            AND result_ts <= call_ts + INTERVAL 10 minutes
            AND result_turn > call_turn
        """))
    assert got.count() == want.count() > 0
    g = {tuple(r) for r in got.select(
        "conv_id", "tool", "call_turn", "result_turn").collect()}
    w = {(r["c_conv"], r["c_tool"], r["call_turn"], r["result_turn"])
         for r in want.collect()}
    assert g == w


def test_stream_cms_cells_merge_equals_batch(spark, tmp_path):
    """Mergeability made executable: the cell-wise SUM of per-micro-batch
    count-min partials must equal the one-shot batch sketch EXACTLY —
    batch boundaries (forced to 1 file per trigger) must be invisible."""
    from log_collector_spark.streaming import pipeline as sp
    from log_collector_spark.textops.analysis import cms_cells
    from pyspark.sql import functions as F

    input_dir = pl.transcripts_path(SF_DIR)
    out = str(tmp_path / "cms_out")
    q = sp.start_cms_stream(spark, input_dir, str(tmp_path / "cms_ck"),
                            out, max_files_per_trigger=1)
    q.awaitTermination(300)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() > 1  # real merge
    merged = (partials.groupBy("row", "col")
              .agg(F.sum("cell").cast("long").alias("cell")))

    batch = cms_cells(spark.read.parquet(input_dir).filter(
        F.coalesce(F.col("text"), F.lit("")) != ""))
    diff = (merged.join(batch.withColumnRenamed("cell", "bcell"),
                        ["row", "col"], "full")
            .filter((F.col("cell").isNull()) | (F.col("bcell").isNull())
                    | (F.col("cell") != F.col("bcell"))))
    assert diff.count() == 0


def test_compact_checkpoint_preserves_resume_and_truncation(
        spark, tmp_path, tx_files):
    """Compaction must change FILE COUNTS only: committed sets identical,
    resume a no-op, truncation detection still fires, tombstoned batches
    still protect their output, and re-compaction is idempotent."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(input_dir)

    # three separate commits -> three appended files per metadata table
    for i, f in enumerate(tx_files[:3]):
        shutil.copy(f, input_dir)
        ck.run_resumable(spark, input_dir, ckpt, out, f"run{i}")
    before_files = ck.committed_files(spark, ckpt)
    before_batches = ck.committed_batches(spark, ckpt)

    rep = ck.compact_checkpoint(spark, ckpt)
    assert rep["checkpoint"]["files_before"] >= 3
    assert rep["checkpoint"]["files_after"] == 1
    assert rep["filestate"]["files_after"] == 1
    assert ck.committed_files(spark, ckpt) == before_files
    assert ck.committed_batches(spark, ckpt) == before_batches

    # resume over the same input: nothing pending
    r = ck.run_resumable(spark, input_dir, ckpt, out, "post")
    assert r["files"] == []

    # truncation detection still works on the compacted filestate
    victim = os.path.join(input_dir, os.path.basename(tx_files[0]))
    size = os.path.getsize(victim)
    with open(victim, "r+b") as fh:
        fh.truncate(size // 2)
    assert ck.truncated_files(spark, ckpt) == [victim]

    # idempotent: second compaction is a no-op rewrite
    rep2 = ck.compact_checkpoint(spark, ckpt)
    assert rep2["checkpoint"]["files_before"] == 1
    assert ck.committed_batches(spark, ckpt) == before_batches


def test_stream_hll_registers_merge_equals_batch(spark, tmp_path):
    """The MAX-merge counterpart of the CMS test: register-wise MAX of
    per-micro-batch HLL partials == the one-shot batch registers exactly
    (and MAX is idempotent, so replayed batches cannot corrupt it)."""
    from log_collector_spark.streaming import pipeline as sp
    from pyspark.sql import functions as F

    input_dir = pl.transcripts_path(SF_DIR)
    out = str(tmp_path / "hll_out")
    q = sp.start_hll_stream(spark, input_dir, str(tmp_path / "hll_ck"),
                            out, max_files_per_trigger=1)
    q.awaitTermination(300)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() > 1
    merged = (partials.groupBy("hour_idx", "idx")
              .agg(F.max("m_reg").alias("m_reg")))
    batch = sp.transcript_hll_registers(
        spark.read.parquet(input_dir).filter(
            F.coalesce(F.col("text"), F.lit("")) != ""))
    diff = (merged.join(batch.withColumnRenamed("m_reg", "b_reg"),
                        ["hour_idx", "idx"], "full")
            .filter((F.col("m_reg").isNull()) | (F.col("b_reg").isNull())
                    | (F.col("m_reg") != F.col("b_reg"))))
    assert diff.count() == 0


def _write_day_slices(spark, tmp_path) -> str:
    """Slice the sf transcript fixture into per-day parquet files written
    in ascending mtime order — the event-time-ordered arrival shape real
    log files have. The raw fixture files EACH span the whole week, so
    feeding them one-per-trigger makes the watermark leap to the end after
    batch 0 and every later file's rows are (correctly) dropped as late
    data; watermark-frontier tests need ordered arrival to be meaningful."""
    import datetime as dt
    import glob as _glob

    raw = spark.read.parquet(pl.transcripts_path(SF_DIR))
    lo, hi = raw.agg(F.min("ts"), F.max("ts")).collect()[0]
    input_dir = str(tmp_path / "tin")
    os.makedirs(input_dir)
    day, i = lo.date(), 0
    while day <= hi.date():
        sl = raw.filter(F.to_date("ts") == F.lit(day.isoformat()))
        tmp_out = str(tmp_path / f"slice{i}")
        sl.coalesce(1).write.parquet(tmp_out)
        part = _glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        dst = os.path.join(input_dir, f"slice_{i:03d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        day += dt.timedelta(days=1)
        i += 1
    return input_dir


def _final_watermark(q):
    """The event-time watermark the query's LAST batch ran with (UTC,
    tz-naive to match collected timestamps under the UTC session)."""
    import datetime as dt

    wm_str = q.lastProgress["eventTime"]["watermark"]
    return (dt.datetime.fromisoformat(wm_str.replace("Z", "+00:00"))
            .replace(tzinfo=None))


def test_stream_stream_tool_timeout_left_outer(spark, tmp_path):
    """LEFT-OUTER stream-stream join: unanswered tool calls streamed ==
    the batch anti-join, restricted to calls whose timeout frontier
    (call_ts + max_lag) the final watermark actually passed."""
    import datetime as dt

    from log_collector_spark.streaming import pipeline as sp

    input_dir = _write_day_slices(spark, tmp_path)
    ckpt = str(tmp_path / "tck")
    out = str(tmp_path / "tout")
    q = sp.start_tool_timeout_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(600)
    got = spark.read.parquet(out)

    src = spark.read.parquet(input_dir)
    calls = (src.filter((F.col("role") == "assistant")
                        & F.col("tool").isNotNull())
                .select(F.col("conv_id").alias("c_conv"),
                        F.col("tool").alias("c_tool"),
                        F.col("turn_idx").alias("call_turn"),
                        F.col("ts").alias("call_ts")))
    results = (src.filter(F.col("role") == "tool")
                  .select(F.col("conv_id").alias("r_conv"),
                          F.col("tool").alias("r_tool"),
                          F.col("turn_idx").alias("result_turn"),
                          F.col("ts").alias("result_ts")))
    matched = calls.join(
        results,
        F.expr("""
            c_conv = r_conv AND c_tool = r_tool
            AND result_ts >= call_ts
            AND result_ts <= call_ts + INTERVAL 2 minutes
        """), "left_semi")
    unanswered = calls.join(matched, ["c_conv", "c_tool", "call_turn"],
                            "left_anti")
    # a call is provably emitted once the watermark the LAST batch ran
    # with passed its timeout frontier (call_ts + max_lag).  Recomputing
    # that watermark from the data is fragile (it is the MIN across both
    # input sides and lags one micro-batch), so read it from the query's
    # own final progress instead.
    frontier = _final_watermark(q) - dt.timedelta(minutes=2)
    want = {(r["c_conv"], r["c_tool"], r["call_turn"])
            for r in unanswered.filter(
                F.col("call_ts") < F.lit(frontier)).collect()}
    g = {(r["conv_id"], r["tool"], r["call_turn"])
         for r in got.collect()}
    assert len(g) > 0
    # streamed set must contain every provably-timed-out call, and may
    # additionally hold calls in the one-trigger slack around the frontier
    assert want <= g
    superset = {(r["c_conv"], r["c_tool"], r["call_turn"])
                for r in unanswered.collect()}
    assert g <= superset


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


class _FakeValueState:
    def __init__(self):
        self.v = None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None

    def exists(self):
        return self.v is not None


class _FakeHandle:
    """Minimal StatefulProcessorHandle double: one ValueState + a timer
    registry, enough to drive the sessionizer kernel without the JVM."""

    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


class _FakeExpired:
    def __init__(self, ms):
        self.ms = ms

    def getExpiryTimeInMs(self):
        return self.ms


def _mk_batch(ts_ms, tools):
    import pandas as pd
    return pd.DataFrame({
        "ts": pd.to_datetime(ts_ms, unit="ms"),
        "tool": tools,
    })


def test_sessionizer_kernel_gap_splits_and_timers():
    """Pure-Python kernel check (no JVM): intra-batch gap splits emit
    closed sessions immediately; the trailing open session is held in
    state with a timer at last_ts + gap; a new batch re-opens and
    re-arms; the timer close emits the final session and clears state."""
    from log_collector_spark.streaming.conversation_state import (
        ConversationSessionizer)

    p = ConversationSessionizer(gap_ms=120_000)
    h = _FakeHandle()
    p.init(h)
    key = ("conv_x",)

    # batch 1: three turns, a 10-minute hole after the second →
    # one closed session (2 turns, 1 tool call) emitted inline
    b1 = _mk_batch([0, 60_000, 660_000], [None, "bash", None])
    out1 = list(p.handleInputRows(key, iter([b1]), None))
    assert len(out1) == 1
    r = out1[0].iloc[0]
    assert (r["n_turns"], r["n_tool_calls"], r["first_ms"], r["last_ms"],
            r["duration_ms"]) == (2, 1, 0, 60_000, 60_000)
    # trailing open session (1 turn) in state, timer armed at +gap
    assert h.states["open_session"].get() == (1, 0, 660_000, 660_000, 780_000)
    assert h.timers == {780_000}

    # batch 2: a turn 30s later continues the open session; the old
    # timer must be deleted and a new one armed
    b2 = _mk_batch([690_000], ["edit"])
    out2 = list(p.handleInputRows(key, iter([b2]), None))
    assert out2 == []
    assert h.states["open_session"].get() == (2, 1, 660_000, 690_000, 810_000)
    assert h.timers == {810_000}

    # timer fires → final session emitted, state cleared
    out3 = list(p.handleExpiredTimer(key, None, _FakeExpired(810_000)))
    assert len(out3) == 1
    r3 = out3[0].iloc[0]
    assert (r3["n_turns"], r3["n_tool_calls"], r3["first_ms"],
            r3["last_ms"]) == (2, 1, 660_000, 690_000)
    assert h.states["open_session"].get() is None

    # stale timer (state already cleared, or expiry != armed) → no emit
    assert list(p.handleExpiredTimer(key, None, _FakeExpired(810_000))) == []


def test_sessionizer_kernel_stale_timer_guard():
    """A timer whose expiry is NOT the armed one (conversation re-opened
    with a later frontier before the old timer fired) must not close the
    session."""
    from log_collector_spark.streaming.conversation_state import (
        ConversationSessionizer)

    p = ConversationSessionizer(gap_ms=120_000)
    h = _FakeHandle()
    p.init(h)
    key = ("conv_y",)
    list(p.handleInputRows(key, iter([_mk_batch([0], [None])]), None))
    list(p.handleInputRows(key, iter([_mk_batch([60_000], [None])]), None))
    assert list(p.handleExpiredTimer(key, None, _FakeExpired(120_000))) == []
    assert h.states["open_session"].get() == (2, 0, 0, 60_000, 180_000)


def test_sessionizer_kernel_drained_equals_batch_oracle(spark):
    """Drive the sessionizer kernel through per-day micro-batches in pure
    Python (grouped by conv, timers fired on drain) and require EXACT set
    equality with the batch window sessionization — the full determinism
    contract, minus only Spark's wire transport."""
    import pandas as pd

    from log_collector_spark.streaming.conversation_state import (
        ConversationSessionizer, batch_sessionize_oracle)

    raw = (spark.read.parquet(pl.transcripts_path(SF_DIR))
           .select("conv_id", "ts", "tool").toPandas()
           .sort_values(["ts"]))
    # the fake handle holds ONE state cell; emulate Spark's per-key state
    # by swapping each key's (state, timer) in before its call
    p2 = ConversationSessionizer(gap_ms=120_000)
    h2 = _FakeHandle()
    p2.init(h2)
    state_by_key, timer_by_key, emitted = {}, {}, []
    for _, day_rows in raw.groupby(raw["ts"].dt.date, sort=True):
        for conv, g in day_rows.groupby("conv_id", sort=False):
            h2.states["open_session"].v = state_by_key.get(conv)
            h2.timers = ({timer_by_key[conv]} if conv in timer_by_key
                         else set())
            emitted.extend(p2.handleInputRows(
                (conv,), iter([g[["ts", "tool"]]]), None))
            state_by_key[conv] = h2.states["open_session"].v
            timer_by_key[conv] = state_by_key[conv][4]
    # drain: fire every armed timer
    for conv, tm in timer_by_key.items():
        h2.states["open_session"].v = state_by_key.get(conv)
        out = list(p2.handleExpiredTimer((conv,), None, _FakeExpired(tm)))
        emitted.extend(out)

    got = pd.concat(emitted, ignore_index=True)
    want = batch_sessionize_oracle(
        spark, pl.transcripts_path(SF_DIR)).toPandas()
    key = ["conv_id", "n_turns", "n_tool_calls",
           "first_ms", "last_ms", "duration_ms"]
    gset = {tuple(r) for r in got[key].itertuples(index=False)}
    wset = {tuple(r) for r in want[key].itertuples(index=False)}
    assert len(got) == len(want)
    assert gset == wset


@pytest.mark.skipif(not _has_protobuf(), reason=(
    "transformWithStateInPandas's state API client needs google.protobuf, "
    "not shipped in this container (pip install protobuf to enable)"))
def test_transform_with_state_sessionizer_matches_batch(spark, tmp_path):
    """transformWithStateInPandas gap-rule sessionizer == batch window
    sessionization, restricted to sessions whose close frontier
    (last_ts + gap) the final watermark passed. Exercises typed keyed
    state, event-time timers, intra-batch session splits, and the
    RocksDB state store across micro-batches."""
    import datetime as dt

    from log_collector_spark.streaming import conversation_state as cs

    input_dir = _write_day_slices(spark, tmp_path)
    ckpt = str(tmp_path / "sck")
    out = str(tmp_path / "sout")
    q = cs.start_conversation_sessionizer_stream(spark, input_dir, ckpt, out)
    q.awaitTermination(600)
    got = spark.read.parquet(out)

    sessions = cs.batch_sessionize_oracle(spark, input_dir).cache()
    key = ("conv_id", "n_turns", "n_tool_calls",
           "first_ms", "last_ms", "duration_ms")
    frontier = _final_watermark(q)
    frontier_ms = int(frontier.replace(
        tzinfo=dt.timezone.utc).timestamp() * 1000)
    want = {tuple(r[k] for k in key)
            for r in sessions.filter(
                F.col("last_ms") + 120_000 < frontier_ms).collect()}
    g = {tuple(r[k] for k in key) for r in got.collect()}
    allsess = {tuple(r[k] for k in key) for r in sessions.collect()}
    assert len(g) > 0
    assert want <= g
    assert g <= allsess
    # every emitted (conv, first_ms) is emitted exactly once
    assert got.count() == got.select("conv_id", "first_ms").distinct().count()


def test_sft_builder_kernel_matches_batch_across_splits(spark):
    """The streaming SFT builder (fake handle, no JVM state) must emit
    exactly the batch sft_examples rows even when a conversation is
    split mid-stream across micro-batches."""
    import pandas as pd

    from log_collector_spark.operators import tx_stats as TX
    from log_collector_spark.streaming.conversation_state import (
        SftExampleBuilder)

    turns = [  # (turn_idx, role, tokens)
        (1, "user", 10), (2, "assistant", 20), (3, "tool", 5),
        (4, "assistant", 40), (5, "user", 7), (6, "assistant", 30),
    ]
    budget = 70

    p = SftExampleBuilder(budget=budget)
    h = _FakeHandle()
    p.init(h)
    key = ("conv_s",)

    def _b(rows):
        return pd.DataFrame(rows, columns=["turn_idx", "role", "tok"])

    emitted = []
    # batch 1 carries turns 1-2, batch 2 (shuffled within) carries 3-6
    emitted += list(p.handleInputRows(key, iter([_b(turns[:2])]), None))
    emitted += list(p.handleInputRows(
        key, iter([_b(turns[4:]), _b(turns[2:4])]), None))
    got = pd.concat(emitted).sort_values("turn_idx")

    routed = (spark.createDataFrame(
        [("conv_s", i, r, '{"tokens":%d}' % t) for i, r, t in turns],
        "conv_id string, turn_idx int, role string, payload string")
        .withColumn("parse_ok", F.lit(True))
        .withColumn("is_oversize", F.lit(False)))
    want = (TX.sft_examples(routed, budget=budget)
            .orderBy("turn_idx").toPandas())

    assert list(got["turn_idx"]) == list(want["turn_idx"])
    for col in ("prompt_turns", "prompt_tokens", "completion_tokens",
                "fits_budget"):
        assert list(got[col]) == list(want[col]), col
    # state carries the FULL prefix for any later batch
    assert h.states["prompt_acc"].get() == (6, 112)

# ---------------------------------------------------------------------------
# Streaming token-bucket limiter (streaming/rate_limit.py) — the
# transformWithState twin operators/behavior.token_bucket promises
# ---------------------------------------------------------------------------


def test_token_bucket_kernel_refill_clamp_and_reject():
    """Handcrafted sequence (cap 5, 1 token/min): spend to empty, reject
    when dry, fractional refill, clamp at cap after a long gap — and the
    batch split must not change any of it."""
    import pandas as pd

    from log_collector_spark.streaming.rate_limit import TokenBucketLimiter

    # 6 events 1s apart (refill 16 milli-tokens/s): 5 allowed, 6th dry;
    # then a 10-minute hole refills past cap → clamped, allowed again
    us = [0, 1, 2, 3, 4, 5, 605]
    rows = pd.DataFrame({"us": [u * 1_000_000 for u in us],
                         "event_id": range(len(us))})

    def drive(splits):
        p = TokenBucketLimiter()
        h = _FakeHandle()
        p.init(h)
        out = []
        for lo, hi in splits:
            out += list(p.handleInputRows(
                ("7",), iter([rows.iloc[lo:hi]]), None))
        return pd.concat(out, ignore_index=True)

    one = drive([(0, 7)])
    r = one.iloc[-1]
    assert (r["n_events"], r["n_allowed"], r["n_rejected"]) == (7, 6, 1)
    # after the clamp-refill the 7th spend leaves cap-1000=4000 milli
    assert r["tokens_milli"] == 4000
    # same final state under any micro-batch split (incl. mid-burst)
    split = drive([(0, 4), (4, 6), (6, 7)])
    assert tuple(split.iloc[-1]) == tuple(one.iloc[-1])
    # running rows are cumulative: n_events strictly increases
    assert list(split["n_events"]) == [4, 6, 7]


def test_token_bucket_kernel_matches_batch_across_splits(spark):
    """Drive the streaming kernel over the real events fixture in three
    time-ordered micro-batches (fake handle, per-user state swapped in
    like Spark's keyed store) and require the final per-user row to
    EQUAL the batch replay — the full determinism contract, minus only
    the wire transport."""
    import pandas as pd

    from log_collector_spark.operators.behavior import token_bucket
    from log_collector_spark.streaming.rate_limit import TokenBucketLimiter

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    raw = (ev.select(F.col("user_id").cast("long").alias("user_id"),
                     F.expr("unix_micros(cast(ts as timestamp))")
                      .cast("long").alias("us"),
                     F.col("event_id").cast("long").alias("event_id"))
             .toPandas().sort_values(["us", "event_id"]))
    cuts = raw["us"].quantile([0.33, 0.66]).astype("int64").tolist()
    batches = [raw[raw["us"] <= cuts[0]],
               raw[(raw["us"] > cuts[0]) & (raw["us"] <= cuts[1])],
               raw[raw["us"] > cuts[1]]]

    p = TokenBucketLimiter()
    h = _FakeHandle()
    p.init(h)
    state_by_user, last_row = {}, {}
    for b in batches:
        for uid, g in b.groupby("user_id", sort=False):
            h.states["bucket"].v = state_by_user.get(uid)
            out = list(p.handleInputRows(
                (uid,), iter([g[["us", "event_id"]]]), None))
            state_by_user[uid] = h.states["bucket"].v
            last_row[uid] = out[-1].iloc[0]

    want = token_bucket(ev).toPandas().set_index("user_id")
    assert set(last_row) == set(want.index)
    for uid, r in last_row.items():
        w = want.loc[uid]
        assert (r["n_events"], r["n_allowed"], r["n_rejected"],
                r["tokens_milli"]) == (
            w["n_events"], w["n_allowed"], w["n_rejected"],
            w["tokens_milli_final"]), uid


@pytest.mark.skipif(not _has_protobuf(), reason=(
    "transformWithStateInPandas's state API client needs google.protobuf, "
    "not shipped in this container (pip install protobuf to enable)"))
def test_transform_with_state_token_bucket_matches_batch(spark, tmp_path):
    """Live transformWithStateInPandas run (when protobuf exists): the
    latest appended row per user equals the batch replay."""
    from log_collector_spark.operators.behavior import token_bucket
    from log_collector_spark.streaming import rate_limit as rl

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    input_dir = str(tmp_path / "evin")
    (ev.select("event_id", "user_id", "ts")
       .repartitionByRange(3, "ts").write.parquet(input_dir))
    ckpt, out = str(tmp_path / "tbck"), str(tmp_path / "tbout")
    q = rl.start_token_bucket_stream(spark, input_dir, ckpt, out,
                                     max_files_per_trigger=None)
    q.awaitTermination(600)
    got = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    latest = (got.withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1").drop("rn"))
    want = token_bucket(ev).withColumnRenamed("tokens_milli_final",
                                              "tokens_milli")
    assert latest.exceptAll(want).count() == 0
    assert want.exceptAll(latest).count() == 0
