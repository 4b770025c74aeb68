"""Plan-shape audits for continuations XX-XXI: the scale contracts the
docstrings claim, asserted on the executed plan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_order_advisor_stats_only_no_smj(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["join_order_advisor"](spark, SF_DIR))
    # decision table from 1-row stat frames: the only joins are the
    # broadcast nested-loop crossJoins of those singletons — never a
    # sort-merge of the base tables
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_selectivity_audit_marginals_broadcast(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["selectivity_correlation"](spark, SF_DIR))
    # marginal frames (|types|, |bands| rows) join back as broadcasts
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_column_profile_no_joins_per_column(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["column_profile_events"](spark, SF_DIR))
    # per-column value-keyed aggs + a constant-size agg — no join shape
    # at all (the modal value rides an argmin struct, never a sort)
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan.replace(
        "Exchange rangepartitioning(col_name", ""), plan


def test_hourly_gap_census_single_distinct_exchange_no_join(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["hourly_gap_census"](spark, SF_DIR))
    assert "Join" not in plan, plan
    # the (type, hour) distinct agg and the per-type window/final agg
    # share the event_type hash key; no other corpus-wide exchange
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_good_turing_single_vocab_exchange(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["good_turing_vocab"](spark, SF_DIR))
    assert "Join" not in plan, plan
    # one token-keyed partial agg + a constant-size single-partition agg
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_jl_distortion_queries_broadcast_corpus_never_shuffles(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["jl_distortion"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
