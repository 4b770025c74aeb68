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
