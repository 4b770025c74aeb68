"""Plan-shape audits for continuation VI-VIII: the scale contracts the
docstrings claim, asserted on the executed plan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_topk_takeordered_no_global_sort(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["bm25_topk_documents"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    # the top-k must NOT be a full range-exchange sort
    assert "Exchange rangepartitioning" not in plan, plan


def test_shard_rebalance_is_zero_shuffle_no_join(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["shard_rebalance_audit"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "Join" not in plan, plan        # literal vnode arrays, no dim join


def test_quality_calibration_decile_map_broadcasts(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["quality_calibration_documents"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_prefix_cache_single_conv_exchange(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["tx_prefix_cache"](spark, SF_DIR))
    # one parse pass, one conv_id exchange shared by window + agg
    assert plan.count("ArrowEvalPython") == 1, plan
    conv_ex = [m for m in plan.split("Exchange hashpartitioning")
               if False] or plan.count("Exchange hashpartitioning(conv_id")
    assert conv_ex == 1, plan


def test_zonemap_audit_single_file_agg(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["zonemap_audit_tx"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan  # fname agg
    assert "SortMergeJoin" not in plan, plan


def test_udaf_and_arrow_map_nodes_present(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["tx_latency_mad_udaf"](spark, SF_DIR))
    # Spark 4 names the GROUPED_AGG pandas-UDF node ArrowAggregatePython
    assert ("ArrowAggregatePython" in plan
            or "AggregateInPandas" in plan), plan
    plan2 = _plan(E.queries()["tx_conv_stats_arrow"](spark, SF_DIR))
    assert "FlatMapGroupsInArrow" in plan2 or "MapGroupsInArrow" in plan2, \
        plan2


def test_winnowing_fingerprint_selection_is_narrow(spark):
    import __spark_entry__ as E
    plan = _plan(E.queries()["winnowing_pairs_documents"](spark, SF_DIR))
    # fingerprint selection happens before the FIRST exchange: the only
    # shuffles are the fp groupBy and the pair-count groupBy
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "EvalPython" not in plan, plan  # pure Catalyst
