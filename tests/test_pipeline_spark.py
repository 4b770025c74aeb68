"""End-to-end Spark pipeline tests: per-turn text equality against the
pure-Python oracle under stable turn ordering, plus exact routed-row and
aggregate-count equality (north_rule requirements)."""

import pandas as pd
import pytest

from log_collector_spark.grok import oracle as okr
from log_collector_spark.plans import pipeline as pl
from log_collector_spark.sources import transcripts as tx

N_TURNS = 4000
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def routed(spark):
    df = pl.full_pipeline(spark, SF_DIR, n_turns=N_TURNS)
    df.cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def oracle_results():
    """Run the same rows through the single-row oracle."""
    pdf = tx.generate_transcripts(N_TURNS)
    compiled = pl.compiled_transcript_grok()
    outcomes, counts = okr.process_lines(
        compiled, pdf["text"].tolist(), source="transcripts", host="spark",
        filename="transcripts", max_size=tx.DEFAULT_MAX_SIZE,
        metric_time_field="logtime")
    return pdf, outcomes, counts


def test_per_turn_text_equality(routed, oracle_results):
    """Byte-exact parsed_json equality per (conv_id, turn_idx)."""
    pdf, outcomes, _ = oracle_results
    expected = {}
    for (cid, tidx), o in zip(zip(pdf["conv_id"], pdf["turn_idx"]), outcomes):
        expected[(cid, int(tidx))] = o.record_json
    got = routed.select("conv_id", "turn_idx", "parsed_json", "parse_ok",
                        "is_blank", "is_oversize").toPandas()
    assert len(got) == len(pdf)
    mismatches = 0
    for row in got.itertuples():
        key = (row.conv_id, int(row.turn_idx))
        exp = expected[key]
        if row.is_blank or row.is_oversize:
            continue  # reference never parses these
        g = row.parsed_json if row.parse_ok else None
        if g != exp:
            mismatches += 1
            if mismatches <= 3:
                print("MISMATCH", key, "\n got:", g, "\n exp:", exp)
    assert mismatches == 0


def test_routed_row_equality(routed, oracle_results):
    """Per-sink routed-row counts exactly match the oracle decision table."""
    _, _, counts = oracle_results
    got = {r["sink"]: r["n"] for r in
           pl.route_ops.sink_tallies(routed).collect()}
    assert got == counts.sink_counts


def test_success_error_counts(routed, oracle_results):
    _, _, counts = oracle_results
    row = pl.agg_ops.success_error_counts(routed, "directory").collect()[0]
    assert row["success"] == counts.success
    assert row["error"] == counts.error
    assert row["lines"] == counts.lines == N_TURNS


def test_minute_buckets(routed, oracle_results):
    _, _, counts = oracle_results
    got = {r["bucket_ms"]: r["n"] for r in
           pl.agg_ops.minute_buckets(routed, "logtime").collect()}
    assert got == counts.minute_buckets


def test_enrichment_joins(routed):
    """Broadcast joins hit and preserve row count (left joins)."""
    pdf = routed.groupBy("role_class").count().toPandas()
    classes = set(pdf["role_class"].dropna())
    assert classes == {"human", "model", "control", "machine"}
    # unknown roles survive with null role_class
    assert pdf["role_class"].isna().any()


def test_broadcast_in_plan(routed):
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_stable_ordering(spark, routed):
    """ordered_salted keeps (conv_id, turn_idx) sorted within partitions."""
    from log_collector_spark.operators.order import ordered_salted
    d = ordered_salted(routed.select("conv_id", "turn_idx"), num_partitions=8)

    def check(it):
        import pandas as _pd
        for b in it:
            ok = bool((b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
                       == b.reset_index(drop=True)).all().all())
            yield _pd.DataFrame({"ok": [ok]})

    res = d.mapInPandas(check, "ok boolean").toPandas()
    assert res["ok"].all()
