"""Round-4 continuation operators: interval-union coverage, Bloom pre-join
pruning, KMV overlap, grouping sets / pivot — kernel edge cases on tiny
frames; the DuckDB oracle covers them at sf0.01."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators.enrich import bloom_prejoin_summary
from log_collector_spark.operators.interval import interval_coverage


def _coverage_brute(rows, length):
    """Reference union-of-intervals per key, plain Python."""
    from collections import defaultdict
    by_key = defaultdict(list)
    for k, s in rows:
        by_key[k].append((s, s + length))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (len(islands), sum(e - s for s, e in islands), len(ivs))
    return out


def test_interval_coverage_contained_interval_trap(spark):
    # u1: [0,100) and [10,30) (contained — ends EARLY) then [90,190):
    # lag(end) would see prev_end=30 at s=90 and wrongly open an island;
    # running MAX(end) sees 100 and merges. u2: two disjoint islands.
    rows = [("u1", 0), ("u1", 10), ("u1", 90), ("u2", 0), ("u2", 500)]
    length = 100
    df = spark.createDataFrame(rows, "k string, s long")
    got = {r["k"]: (r["n_islands"], r["covered_ms"], r["n_intervals"])
           for r in interval_coverage(df, "k", F.col("s"),
                                      length_ms=length).collect()}
    # hand-check u1: [0,100),[10,110)?? no — length=100: [0,100),[10,110),
    # [90,190) all chain into ONE island [0,190) = 190 covered.
    assert got == _coverage_brute(rows, length)
    assert got["u1"] == (1, 190, 3)
    assert got["u2"] == (2, 200, 2)


def test_interval_coverage_matches_bruteforce_random(spark):
    import random
    rnd = random.Random(42)
    rows = [(f"k{rnd.randrange(5)}", rnd.randrange(0, 3000))
            for _ in range(300)]
    length = 137
    df = spark.createDataFrame(rows, "k string, s long")
    got = {r["k"]: (r["n_islands"], r["covered_ms"], r["n_intervals"])
           for r in interval_coverage(df, "k", F.col("s"),
                                      length_ms=length).collect()}
    assert got == _coverage_brute(rows, length)


def test_bloom_prejoin_never_false_negative(spark):
    # every dim key must pass the filter: n_exact == |dim ∩ fact keys|
    fact = spark.createDataFrame([(i,) for i in range(500)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(0, 500, 7)], "k long")
    row = bloom_prejoin_summary(fact, dim, "k", m=256, nhash=3).collect()[0]
    n_members = len(range(0, 500, 7))
    assert row["n_fact_keys"] == 500
    assert row["n_exact"] == n_members          # no false negatives, ever
    assert row["n_bloom_pass"] >= n_members
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_exact"]
    # m=256 bits for ~215 set positions — the FP column must be exercised
    assert row["n_false_pos"] > 0


def test_grouping_sets_has_no_day_marginal(spark):
    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    out = E.queries()["grouping_sets_events"](spark, sf).collect()
    # (type, day) cells + per-type marginals + grand total — and NOT the
    # per-day marginal a cube would add
    types = {r["event_type"] for r in out}
    assert "(all)" in types
    day_marginals = [r for r in out
                     if r["event_type"] == "(all)" and r["day_ms"] != -1]
    assert day_marginals == []
    grand = [r for r in out
             if r["event_type"] == "(all)" and r["day_ms"] == -1]
    assert len(grand) == 1
    total = sum(r["n"] for r in out
                if r["event_type"] != "(all)" and r["day_ms"] != -1)
    assert grand[0]["n"] == total


def test_pivot_row_sums_match_day_totals(spark):
    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    wide = E.queries()["pivot_event_types"](spark, sf)
    ncols = [c for c in wide.columns if c.startswith("n_")]
    got = {r["day_ms"]: sum(r[c] for c in ncols) for r in wide.collect()}
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    day = F.expr(
        "unix_micros(date_trunc('day', cast(ts as timestamp))) div 1000")
    want = {r["d"]: r["n"] for r in
            ev.groupBy(day.alias("d")).count()
              .withColumnRenamed("count", "n").collect()}
    assert got == want


def test_kmv_overlap_identical_sources_estimate_1000(spark):
    # two sources with IDENTICAL token sets → sketch Jaccard exactly 1000;
    # a third disjoint source → 0 against both.
    rows = ([("a", f"tok{i} tok{i+1}") for i in range(50)]
            + [("b", f"tok{i} tok{i+1}") for i in range(50)]
            + [("c", f"zzz{i}") for i in range(80)])
    df = spark.createDataFrame(rows, "source string, text string")
    from log_collector_spark.textops.analysis import kmv_overlap
    out = {(r["s1"], r["s2"]): r for r in kmv_overlap(df, k=16).collect()}
    assert out[("a", "b")]["jaccard_est_permille"] == 1000
    assert out[("a", "b")]["jaccard_exact_permille"] == 1000
    assert out[("a", "c")]["jaccard_est_permille"] == 0
    assert out[("b", "c")]["n_common"] == 0
    # union sketch is capped at k
    assert all(r["k_used"] <= 16 for r in out.values())


def test_last_touch_attribution_micro(spark):
    import datetime as dt

    def t(s):
        return dt.datetime(2020, 1, 1) + dt.timedelta(seconds=s)

    day = 86_400
    rows = [
        # u1: click then purchase 10s later -> credit click
        (1, t(0), 1, "click"), (2, t(10), 1, "purchase"),
        # u1: second purchase 8 days after the click -> outside window
        (3, t(10 + 8 * day), 1, "purchase"),
        # u2: view, then click, then purchase -> LAST touch (click) wins
        (4, t(0), 2, "view"), (5, t(5), 2, "click"), (6, t(9), 2, "purchase"),
        # u3: purchase with no touch at all
        (7, t(3), 3, "purchase"),
        # u4: touch AFTER the purchase must not credit
        (8, t(1), 4, "purchase"), (9, t(2), 4, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    from log_collector_spark.operators.behavior import last_touch_attribution
    got = {r["touch_type"]: r["n_conversions"]
           for r in last_touch_attribution(df).collect()}
    assert got == {"click": 2, "none": 3}


def test_ewma_equals_recursion_on_short_series(spark):
    # for a series shorter than EWMA_TERMS starting at t0, the truncated
    # geometric form IS the exact alpha=1/2 integer recursion unrolled
    import datetime as dt
    # all counts >= 1: an empty hour has no row, so the lag series (which
    # runs over OBSERVED hourly points — documented) would skip it and the
    # dense reference below would misalign
    ns = [100, 40, 3, 8, 300, 7, 7, 7, 1000, 2]
    rows = []
    eid = 0
    for i, n in enumerate(ns):
        for _ in range(n):
            rows.append((eid, dt.datetime(2020, 1, 1, i), 1, "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    from pyspark.sql import functions as F
    from log_collector_spark.operators.aggregate import ewma_hour_counts
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    out = sorted(
        ewma_hour_counts(df, F.col("event_type"), ts_ms).collect(),
        key=lambda r: r["hour_ms"])
    got = [r["ewma16"] for r in out]
    want = [sum(ns[t - i] // (1 << (i + 1)) for i in range(t + 1))
            for t in range(len(ns))]
    assert got == want


def test_stratified_sample_exact_quotas(spark):
    rows = ([("big", i) for i in range(100)]
            + [("small", i + 1000) for i in range(3)])
    df = spark.createDataFrame(rows, "source string, doc_id long")
    from log_collector_spark.textops.analysis import stratified_sample
    out = stratified_sample(df, quota=20).collect()
    from collections import Counter
    c = Counter(r["source"] for r in out)
    assert c == {"big": 20, "small": 3}
    # deterministic under re-run and under input reordering
    out2 = stratified_sample(df.orderBy(F.rand(7)), quota=20).collect()
    assert sorted((r["source"], r["doc_id"]) for r in out) == \
        sorted((r["source"], r["doc_id"]) for r in out2)


def test_zorder_shrinks_day_spans(spark):
    import __spark_entry__ as E
    out = {r["layout"]: r for r in
           E.queries()["zorder_audit_events"](
               spark, "/root/testdata/sf0.001").collect()}
    lin, zo = out["linear_user_day"], out["zorder"]
    assert lin["n_files"] == zo["n_files"]
    # the whole point: z-order prunes the SECONDARY dimension too
    assert zo["sum_day_span"] < lin["sum_day_span"]


def test_dead_stock_plans_left_anti(spark):
    import __spark_entry__ as E
    plan = E.queries()["tpch_dead_stock"](
        spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LeftAnti" in plan, plan


def _hours(ns, typ="click"):
    """One event row per count unit, hour i gets ns[i] rows."""
    import datetime as dt
    rows = []
    eid = 0
    for i, n in enumerate(ns):
        for _ in range(n):
            rows.append((eid, dt.datetime(2020, 1, 1) +
                         dt.timedelta(hours=i), 1, typ))
            eid += 1
    return rows


_EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"
_TS_MS = ("unix_micros(date_trunc('second', cast(ts as timestamp)))"
          " div 1000")


def test_trend_slope_exact_on_linear_series(spark):
    from log_collector_spark.operators.aggregate import trend_slope_counts
    # y = 2x + 5 → slope exactly 2.000/hour; y = 90 - 3x → exactly -3.000
    up = _hours([2 * x + 5 for x in range(20)], "up")
    down = _hours([90 - 3 * x for x in range(20)], "down")
    df = spark.createDataFrame(up + down, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           trend_slope_counts(df, F.col("event_type"),
                              F.expr(_TS_MS)).collect()}
    assert out["up"]["slope_permille"] == 2000
    assert out["down"]["slope_permille"] == -3000
    # exact rational slope: num/den == 2 and -3
    assert out["up"]["slope_num"] == 2 * out["up"]["slope_den"]
    assert out["down"]["slope_num"] == -3 * out["down"]["slope_den"]


def test_rolling_median_matches_python(spark):
    import statistics
    from log_collector_spark.operators.aggregate import rolling_median_counts
    ns = [((i * 37) % 11) + 1 for i in range(40)]  # all >= 1 (dense hours)
    df = spark.createDataFrame(_hours(ns), _EV_SCHEMA)
    out = sorted(rolling_median_counts(df, F.col("event_type"),
                                       F.expr(_TS_MS), width=8).collect(),
                 key=lambda r: r["hour_ms"])
    got = [r["med24"] for r in out]
    want = [sorted(ns[i - 7:i + 1])[3]  # lower median of 8
            for i in range(7, len(ns))]
    assert got == want


def test_skew_report_buckets_and_shares(spark):
    from log_collector_spark.operators.aggregate import skew_report
    # 10 keys × 3 rows (bitlen(3)=2) + 1 hot key × 70 rows (bitlen(70)=7)
    rows = [(k,) for k in range(10) for _ in range(3)] + [(99,)] * 70
    df = spark.createDataFrame(rows, "k long")
    out = {r["cnt_bucket"]: r for r in skew_report(df, F.col("k")).collect()}
    assert set(out) == {2, 7}
    assert out[2]["n_keys"] == 10 and out[2]["n_rows"] == 30
    assert out[7]["n_keys"] == 1 and out[7]["max_cnt"] == 70
    assert out[7]["rows_permille"] == 700
    assert out[2]["rows_permille"] == 300


def test_triangle_count_on_crafted_clique(spark):
    from log_collector_spark.textops.evalops import triangle_count
    base = " ".join(f"w{i}" for i in range(30))
    rows = [(1, base), (2, base + " x"), (3, base + " y"),
            (4, " ".join(f"z{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = triangle_count(df).collect()[0]
    # docs 1-3 are pairwise near-identical → one triangle over 3 edges
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 3
    assert row["n_nodes"] == 3
