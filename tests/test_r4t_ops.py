"""Continuation-XXI ops: System-R join-order advisor (hand-computed
estimates incl. the cross-product plan), Neyman stratified allocation
(zero-variance vs spread strata), selectivity-correlation audit
(perfectly correlated predicates → maximal estimator error)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import analytics as AN
from log_collector_spark.operators import seasonal as SE
from log_collector_spark.operators import order as OR
from log_collector_spark.textops import analysis as A


# ---------------------------------------------------------------------------
# join_order_advisor
# ---------------------------------------------------------------------------

def test_join_order_advisor_hand_estimates(spark):
    cust = spark.createDataFrame([(i,) for i in range(1, 5)],
                                 "c_custkey long")
    # 6 orders over 3 customers; 6 distinct orderkeys
    orders = spark.createDataFrame(
        [(ok, ok % 3 + 1) for ok in range(1, 7)],
        "o_orderkey long, o_custkey long")
    # 2 lines per order → 12 rows, 6 distinct orderkeys
    line = spark.createDataFrame(
        [(ok, ln) for ok in range(1, 7) for ln in (1, 2)],
        "l_orderkey long, l_linenumber int")
    out = {r["join_order"]: r for r in
           AN.join_order_advisor(cust, orders, line).collect()}
    # System-R: |c⋈o| = 4*6 // max(4,3) = 6 ; |o⋈l| = 6*12 // 6 = 12 ;
    # keyless c×l = 4*12 = 48
    assert out["customer*orders->lineitem"]["est_step1_rows"] == 6
    assert out["orders*lineitem->customer"]["est_step1_rows"] == 12
    assert out["customer*lineitem->orders"]["est_step1_rows"] == 48
    assert out["customer*orders->lineitem"]["recommended"] is True
    assert out["orders*lineitem->customer"]["recommended"] is False
    assert out["customer*lineitem->orders"]["recommended"] is False


# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    """rows: (doc_id, source, n_chars)."""
    return spark.createDataFrame(
        [(i, "t" * c, "en", s, c) for i, s, c in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_neyman_allocation_spread_beats_uniform(spark):
    # stratum A: 4 docs, all length 10 → sd 0, weight 0
    # stratum B: 2 docs, lengths 0 and 20 → popvar 100, sd 10, weight 20
    rows = [(1, "A", 10), (2, "A", 10), (3, "A", 10), (4, "A", 10),
            (5, "B", 0), (6, "B", 20)]
    out = {r["stratum"]: r for r in
           A.neyman_allocation(_docs(spark, rows)).collect()}
    a, b = out["A"], out["B"]
    assert (a["n_docs"], a["sd_chars"]) == (4, 0)
    assert (b["n_docs"], b["sd_chars"]) == (2, 10)
    # Neyman: all budget to the spread stratum, capped at its size
    assert a["neyman_alloc"] == 0 and b["neyman_alloc"] == 2
    # proportional: 1000*4//6 = 666 → cap 4 ; 1000*2//6 = 333 → cap 2
    assert a["prop_alloc"] == 4 and b["prop_alloc"] == 2


def test_neyman_allocation_all_uniform_falls_back_to_zero(spark):
    rows = [(1, "A", 5), (2, "A", 5), (3, "B", 7)]
    out = {r["stratum"]: r for r in
           A.neyman_allocation(_docs(spark, rows)).collect()}
    assert all(r["sd_chars"] == 0 for r in out.values())
    assert all(r["neyman_alloc"] == 0 for r in out.values())


# ---------------------------------------------------------------------------
# selectivity_correlation_audit
# ---------------------------------------------------------------------------

def test_selectivity_correlation_perfectly_correlated(spark):
    # type 'a' only in band 0, type 'b' only in band 1 (value 5.00+)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 6.0), ("b", 7.0)],
        "event_type string, value double")
    out = {(r["event_type"], r["value_band"]): r for r in
           OR.selectivity_correlation_audit(df).collect()}
    assert set(out) == {("a", 0), ("b", 1)}
    for r in out.values():
        # actual 2, independence estimate 2*2//4 = 1 → 100% underestimate
        assert r["n_actual"] == 2 and r["n_expected"] == 1
        assert r["err_permille"] == 1000
        assert r["underestimated"] is True


def test_selectivity_correlation_excludes_negative_and_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", -3.0), ("a", None)],
        "event_type string, value double")
    out = OR.selectivity_correlation_audit(df).collect()
    assert len(out) == 1
    assert out[0]["n_actual"] == 1       # only the non-negative row


# ---------------------------------------------------------------------------
# hourly_gap_census
# ---------------------------------------------------------------------------

def _events_hours(spark, rows):
    """rows: (hour_idx, event_type)."""
    import datetime as dt
    data = [(dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), t)
            for h, t in rows]
    return spark.createDataFrame(data, "ts timestamp, event_type string")


def test_hourly_gap_census_hand_gaps(spark):
    # type 'a': hours 0,1,5 → span 6, present 3, missing 3,
    #           longest gap = hours 2-4 = 3
    # type 'b': hours 2,3 → span 2, complete, no gap
    rows = [(0, "a"), (0, "a"), (1, "a"), (5, "a"), (2, "b"), (3, "b")]
    out = {r["event_type"]: r for r in
           SE.hourly_gap_census(_events_hours(spark, rows)).collect()}
    a = out["a"]
    assert (a["span_hours"], a["present_hours"], a["missing_hours"]) == \
        (6, 3, 3)
    assert a["missing_permille"] == 500
    assert a["longest_gap_hours"] == 3
    b = out["b"]
    assert (b["span_hours"], b["missing_hours"],
            b["longest_gap_hours"]) == (2, 0, 0)
