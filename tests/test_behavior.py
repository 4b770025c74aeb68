"""Behavior analytics (funnel / retention / anomaly), interval join, and
token-budget sampling — edge cases on tiny frames; the DuckDB oracle covers
them at sf0.01."""

from __future__ import annotations

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators.behavior import (
    funnel_counts, hour_anomaly_flags, retention_cohorts)
from log_collector_spark.operators.interval import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_funnel_order_matters(spark):
    # u1 completes in order; u2 purchases BEFORE clicking (must not reach
    # step 4); u3 only signs up; u4 never signs up (invisible to the funnel)
    rows = [
        (1, "signup", "2024-01-01T00:00"), (1, "view", "2024-01-01T01:00"),
        (1, "click", "2024-01-01T02:00"), (1, "purchase", "2024-01-01T03:00"),
        (2, "signup", "2024-01-01T00:00"), (2, "view", "2024-01-01T01:00"),
        (2, "purchase", "2024-01-01T01:30"), (2, "click", "2024-01-01T02:00"),
        (3, "signup", "2024-01-01T00:00"),
        (4, "view", "2024-01-01T00:00"), (4, "click", "2024-01-01T01:00"),
    ]
    df = spark.createDataFrame(
        [(u, t, _ts(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["users"] for r in funnel_counts(df).collect()}
    assert got == {"signup": 3, "view": 2, "click": 2, "purchase": 1}


def test_funnel_equal_timestamp_counts(spark):
    # >= tie rule: a view at exactly the signup instant reaches step 2
    df = spark.createDataFrame(
        [(1, "signup", _ts("2024-01-01T00:00")),
         (1, "view", _ts("2024-01-01T00:00"))],
        "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["users"] for r in funnel_counts(df).collect()}
    assert got["view"] == 1
    permille = {r["step"]: r["permille"] for r in funnel_counts(df).collect()}
    assert permille["signup"] == 1000


def test_retention_cohorts_offsets(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T05:00")),   # cohort day d0
         (1, _ts("2024-01-01T23:00")),   # same day -> offset 0 (dedup'd)
         (1, _ts("2024-01-03T00:00")),   # offset 2
         (2, _ts("2024-01-03T01:00"))],  # cohort d0+2, offset 0
        "user_id long, ts timestamp")
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    got = {(r["cohort_day"], r["day_offset"]): r["users"]
           for r in retention_cohorts(df).collect()}
    assert got == {(d0, 0): 1, (d0, 2): 1, (d0 + 2, 0): 1}


def test_hour_anomaly_integer_zscore(spark):
    # 10 steady hours at n=4, then a spike hour: m=10, S=40, Q=160,
    # variance term m*Q - S^2 = 0 -> any deviation flags (x=40:
    # (10*40-40)^2 = 129600 > 0). The steady hours never flag and hours
    # before min_obs=8 baseline rows never flag.
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(10):
        for i in range(4):
            rows.append(("a", base + dt.timedelta(hours=h, minutes=i)))
    rows += [("a", base + dt.timedelta(hours=10, minutes=i))
             for i in range(40)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["hour_ms"]: (r["n"], r["m"], r["flagged"])
           for r in hour_anomaly_flags(df).collect()}
    spike_ms = int((base + dt.timedelta(hours=10)).replace(
        tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out[spike_ms] == (40, 10, True)
    flagged = [v for v in out.values() if v[2]]
    assert flagged == [(40, 10, True)]
    # first hour has an empty baseline window
    first_ms = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out[first_ms] == (4, 0, False)


def test_interval_join_boundaries_and_bucket_straddle(spark):
    # bucket_us=100; window [95, 195) straddles two buckets; containment is
    # half-open and each matching pair appears exactly once
    events = spark.createDataFrame(
        [(1, 94), (2, 95), (3, 150), (4, 194), (5, 195)],
        "event_id long, t_us long")
    windows = spark.createDataFrame(
        [(7, 95, 195)], "window_id long, start_us long, end_us long")
    out = interval_join(events, windows, bucket_us=100)
    got = sorted((r["window_id"], r["event_id"]) for r in out.collect())
    assert got == [(7, 2), (7, 3), (7, 4)]


def test_interval_join_window_aligned_to_bucket(spark):
    # window exactly one bucket wide and aligned: [100, 200) covers only
    # bucket 1 (end-1 keeps bucket 2 out), no duplicate pairs
    events = spark.createDataFrame(
        [(1, 100), (2, 199), (3, 200)], "event_id long, t_us long")
    windows = spark.createDataFrame(
        [(9, 100, 200)], "window_id long, start_us long, end_us long")
    out = interval_join(events, windows, bucket_us=100)
    got = sorted((r["window_id"], r["event_id"]) for r in out.collect())
    assert got == [(9, 1), (9, 2)]


def test_token_budget_sample_greedy_whole_docs(spark):
    from log_collector_spark.textops.analysis import token_budget_sample
    docs = spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "d e"), (3, "s", "f g h i"),
         (4, "t", "x " * 50)],
        "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["tok_n"], r["kept"])
           for r in token_budget_sample(docs, budget=6).collect()}
    assert out[4] == (50, False)          # oversize doc alone busts budget
    kept_tokens = sum(n for n, k in out.values() if k)
    assert kept_tokens <= 6
    # greedy: exactly the prefix of the hash order is kept — recompute order
    rows = token_budget_sample(docs, budget=6).collect()
    s_rows = sorted((r["cum_tokens"], r["kept"]) for r in rows
                    if r["source"] == "s")
    seen_false = False
    for _, kept in s_rows:
        assert not (kept and seen_false)  # no kept row after a dropped one
        seen_false = seen_false or not kept


def test_ohlc_hours_first_last_by_time_then_id(spark):
    from log_collector_spark.operators.behavior import ohlc_hours
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # same timestamp -> event_id breaks the tie for open
        (1, "a", base, 5.0), (2, "a", base, 7.0),
        (3, "a", base + dt.timedelta(minutes=30), 1.25),
        (4, "a", base + dt.timedelta(minutes=59), 9.0),
        (5, "a", base + dt.timedelta(hours=1), 2.0),  # next bucket
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    out = {r["hour_ms"]: r for r in ohlc_hours(df).collect()}
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    r = out[h0]
    assert (r["open"], r["close"], r["high"], r["low"], r["n"]) == \
        (5000, 9000, 9000, 1250, 4)
    assert out[h0 + 3_600_000]["open"] == 2000


def test_tfidf_rare_token_outranks_common(spark):
    from log_collector_spark.textops.analysis import tfidf_topk
    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common other")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rk"]): (r["token"], r["score"])
           for r in tfidf_topk(docs, topk=2).collect()}
    # every token here scores tf * 1e6 // df = 1_000_000 (common: 2//2,
    # rare/other: 1//1) -> ties everywhere, broken by token asc
    assert out[(1, 1)][0] == "common"
    assert out[(1, 2)] == ("rare", 1_000_000)
    assert out[(2, 1)][0] == "common"
    assert out[(2, 2)] == ("other", 1_000_000)


def test_source_overlap_counts_distinct_shared_shingles(spark):
    from log_collector_spark.textops.analysis import source_overlap
    # 2-gram shingles; "a b" shared by s1/s2 (duplicated in s1 -> distinct
    # still counts once); "x y" only in s3
    docs = spark.createDataFrame(
        [(1, "s1", "a b"), (2, "s1", "a b"), (3, "s2", "a b c"),
         (4, "s3", "x y")],
        "doc_id long, source string, text string")
    got = {(r["src_a"], r["src_b"]): r["shared"]
           for r in source_overlap(docs, k=2).collect()}
    assert got == {("s1", "s2"): 1}


def test_source_overlap_max_groups_guard(spark):
    from log_collector_spark.textops.analysis import source_overlap
    docs = spark.createDataFrame(
        [(1, "s1", "a b"), (2, "s2", "a b"), (3, "s3", "a b"),
         (4, "s1", "p q"), (5, "s2", "p q")],
        "doc_id long, source string, text string")
    got = {(r["src_a"], r["src_b"]): r["shared"]
           for r in source_overlap(docs, k=2,
                                   max_groups_per_shingle=2).collect()}
    # "a b" is in 3 sources -> dropped by the guard; only "p q" survives
    assert got == {("s1", "s2"): 1}


def test_transition_counts_orders_per_user(spark):
    from log_collector_spark.operators.behavior import transition_counts
    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: a -> b -> b ; u2: b -> a; first events emit no transition
        (1, 1, "a", base), (2, 1, "b", base + dt.timedelta(minutes=1)),
        (3, 1, "b", base + dt.timedelta(minutes=2)),
        (4, 2, "b", base), (5, 2, "a", base + dt.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    got = {(r["prev_type"], r["event_type"]): r["n"]
           for r in transition_counts(df).collect()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_transition_counts_tie_broken_by_event_id(spark):
    from log_collector_spark.operators.behavior import transition_counts
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(2, 1, "x", base), (1, 1, "y", base)],  # same ts -> id order: y,x
        "event_id long, user_id long, event_type string, ts timestamp")
    got = {(r["prev_type"], r["event_type"]): r["n"]
           for r in transition_counts(df).collect()}
    assert got == {("y", "x"): 1}


def test_winsorized_stats_clamps_outliers(spark):
    from log_collector_spark.operators.behavior import winsorized_stats
    # 21 values 0..19 plus one huge outlier; p05 bound = v[floor(.05*21)]=v[1]
    vals = list(range(20)) + [10_000]
    df = spark.createDataFrame([(i, "g", v) for i, v in enumerate(vals)],
                               "i long, g string, v long")
    [r] = winsorized_stats(df, "g", F.col("v")).collect()
    # sorted vals; n=21: lo = idx floor(.05*20)=1 -> 1, hi = floor(.95*20)=19 -> 19
    assert (r["n"], r["min_w"], r["max_w"]) == (21, 1, 19)
    expected_sum = sum(min(19, max(1, v)) for v in vals)
    assert r["sum_w"] == expected_sum


def test_quality_sample_deterministic_and_bounded(spark):
    from log_collector_spark.textops.analysis import quality_sample
    docs = spark.createDataFrame(
        [(1, "clean words only here"), (2, "9999 #### $$$$ 1234")],
        "doc_id long, text string")
    a = {r["doc_id"]: (r["quality_permille"], r["draw"], r["kept"])
         for r in quality_sample(docs).collect()}
    b = {r["doc_id"]: (r["quality_permille"], r["draw"], r["kept"])
         for r in quality_sample(docs).collect()}
    assert a == b                       # RNG-free
    assert a[1][0] == 1000              # all-alpha doc
    assert a[2][0] == 0 and not a[2][2]  # zero quality can never be kept
    for q, draw, kept in a.values():
        assert kept == (draw < q)


def test_keyword_search_requires_all_terms(spark):
    from log_collector_spark.textops.analysis import keyword_search
    docs = spark.createDataFrame(
        [(1, "data model training loop"), (2, "data model"),
         (3, "training data data data model")],
        "doc_id long, text string")
    got = sorted(r["doc_id"] for r in keyword_search(
        docs, keywords=["data", "model", "training"]).collect())
    assert got == [1, 3]  # doc 2 misses 'training'; dup tokens count once


def test_rolling_active_users_window_and_observed_days(spark):
    from log_collector_spark.operators.behavior import rolling_active_users
    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, d), (2, d),                          # day 0: users 1,2
        (1, d + dt.timedelta(days=2)),           # day 2: user 1
        (3, d + dt.timedelta(days=9)),           # day 9: user 3 (day 0+7 gap)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    got = {r["report_day"]: r["users"]
           for r in rolling_active_users(df, days=7).collect()}
    # only observed days report: 0, 2, 9
    assert set(got) == {d0, d0 + 2, d0 + 9}
    assert got[d0] == 2          # users 1,2
    assert got[d0 + 2] == 2      # users 1,2 still in 7-day window; 1 deduped
    assert got[d0 + 9] == 1      # old activity aged out


def test_snapshot_diff_classifies_all_states(spark):
    from log_collector_spark.operators.behavior import snapshot_diff
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long")
    new = spark.createDataFrame(
        [(1, 10), (2, 99), (4, 40)], "k long, v long")
    h = F.concat(F.col("k").cast("string"), F.lit("|"),
                 F.col("v").cast("string"))
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, "k", h).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_mad_outliers_planted(spark):
    """mad_outliers: lower-median rank selection for both the median and
    the MAD; a zero-MAD group flags every nonzero deviation; a clean
    even-count group flags nothing."""
    from pyspark.sql import functions as F
    from log_collector_spark.operators import behavior as B
    rows = ([("spike", v) for v in [10, 10, 10, 10, 1000]] +
            [("clean", v) for v in [1, 2, 3, 4]])
    df = spark.createDataFrame(rows, "event_type string, v long")
    out = {r["event_type"]: r.asDict()
           for r in B.mad_outliers(df, value=F.col("v")).collect()}
    assert out["spike"] == {"event_type": "spike", "n": 5, "median_v": 10,
                            "mad_v": 0, "n_outliers": 1}
    # sorted [1,2,3,4]: median at idx floor(0.5*3)=1 -> 2; d=[1,0,1,2],
    # sorted [0,1,1,2] -> mad 1; outlier needs d > 5 -> none
    assert out["clean"] == {"event_type": "clean", "n": 4, "median_v": 2,
                            "mad_v": 1, "n_outliers": 0}


def test_new_vs_returning_planted(spark):
    """new_vs_returning: first-ever-day users are new, later days count
    them returning; event totals ride along."""
    from datetime import datetime
    from log_collector_spark.operators import behavior as B
    d0, d1 = datetime(2026, 1, 1, 10), datetime(2026, 1, 2, 10)
    df = spark.createDataFrame(
        [(1, 100, d0), (2, 100, d0), (3, 200, d0), (4, 100, d1)],
        "event_id long, user_id long, ts timestamp")
    out = {r["day_num"]: r.asDict()
           for r in B.new_vs_returning(df).collect()}
    day0 = 20454  # 2026-01-01 epoch days
    assert out[day0]["n_events"] == 3
    assert out[day0]["n_active"] == 2 and out[day0]["n_new"] == 2
    assert out[day0]["n_returning"] == 0
    assert out[day0 + 1] == {"day_num": day0 + 1, "n_events": 1,
                             "n_active": 1, "n_new": 0, "n_returning": 1}


def test_debounce_events_planted(spark):
    """debounce: first per key survives (NULL gap), < 1s gap drops,
    >= 1s keeps; keys never interfere."""
    from datetime import datetime
    from log_collector_spark.operators import behavior as B
    t = datetime(2026, 1, 1, 10, 0, 0)
    mk = lambda ms: datetime.fromtimestamp(t.timestamp() + ms / 1000.0)
    df = spark.createDataFrame(
        [(1, 7, "click", mk(0)), (2, 7, "click", mk(500)),
         (3, 7, "click", mk(2000)), (4, 8, "click", mk(600))],
        "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["event_id"]: (r["gap_us"], r["keep"])
           for r in B.debounce_events(df).collect()}
    assert out[1] == (None, True)
    assert out[2] == (500_000, False)
    assert out[3] == (1_500_000, True)
    assert out[4] == (None, True)


def test_scd2_intervals_planted(spark):
    """scd2_intervals: consecutive same states collapse; each change row
    closes at the next change; the last interval is open (NULL)."""
    from datetime import datetime, timezone
    from log_collector_spark.operators import behavior as B
    base = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()
    mk = lambda s: datetime.utcfromtimestamp(base + s)
    df = spark.createDataFrame(
        [(1, 7, "A", mk(0)), (2, 7, "A", mk(10)),
         (3, 7, "B", mk(20)), (4, 7, "A", mk(30))],
        "event_id long, user_id long, event_type string, ts timestamp")
    rows = sorted((r["state"], r["valid_from_us"], r["valid_to_us"])
                  for r in B.scd2_intervals(df).collect())
    us0 = int(base) * 1_000_000
    assert rows == [
        ("A", us0, us0 + 20_000_000),
        ("A", us0 + 30_000_000, None),
        ("B", us0 + 20_000_000, us0 + 30_000_000),
    ]


def test_pct_rank_planted(spark):
    """pct_rank: ties share a rank; permille spans 0..1000; singleton
    groups pin to 0."""
    from pyspark.sql import functions as F
    from log_collector_spark.operators import behavior as B
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 30),
            (5, "b", 7)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, v long")
    out = {r["event_id"]: r["pct_permille"]
           for r in B.pct_rank_events(df, value=F.col("v")).collect()}
    assert out == {1: 0, 2: 333, 3: 333, 4: 1000, 5: 0}


def test_activity_grid_dow_hour(spark):
    """activity_grid: epoch arithmetic lands known instants in the right
    (dow, hour) cells; distinct users counted per cell."""
    from log_collector_spark.operators import behavior as B
    # 1970-01-01 00:xx was a Thursday -> dow (0=Sun) = 4
    rows = [(1, 7, "a", dt.datetime(1970, 1, 1, 0, 5)),
            (2, 8, "a", dt.datetime(1970, 1, 1, 0, 50)),
            (3, 7, "a", dt.datetime(1970, 1, 4, 23, 1))]  # Sunday 23h
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {(r["dow"], r["hour"]): (r["n"], r["n_users"])
           for r in B.activity_grid(df).collect()}
    assert out == {(4, 0): (2, 2), (0, 23): (1, 1)}


def test_basket_pairs_distinct_collapse(spark):
    """basket_pairs: repeats inside a basket don't inflate counts; pairs
    are ordered (a < b); support is over distinct (user, day) baskets."""
    from log_collector_spark.operators import behavior as B
    d = dt.datetime(2026, 1, 1, 9)
    rows = [(1, 7, "view", d), (2, 7, "view", d), (3, 7, "click", d),
            (4, 8, "view", d), (5, 8, "click", d), (6, 8, "buy", d),
            (7, 9, "view", d)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {(r["type_a"], r["type_b"]): (r["n_baskets"], r["support_permille"])
           for r in B.basket_pairs(df).collect()}
    # 3 baskets total; (click, view) in baskets of users 7 and 8
    assert out[("click", "view")] == (2, 666)
    assert out[("buy", "click")] == (1, 333)
    assert out[("buy", "view")] == (1, 333)
    assert len(out) == 3


def test_bigram_surprisal_orders_junk_above_common(spark):
    """A doc made of the corpus's dominant bigram scores near the floor;
    a doc of unique junk scores the ceiling; <2-token docs report 0."""
    from log_collector_spark.textops.lm_proxy import bigram_surprisal
    common = "the cat " * 20          # "the cat"/"cat the" dominate
    docs = spark.createDataFrame(
        [(1, common), (2, "zq xv qj vk wx"), (3, "single"), (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in bigram_surprisal(docs).collect()}
    assert out[3]["n_bigrams"] == 0 and out[3]["surprisal_millibits"] == 0
    assert out[4]["n_bigrams"] == 0
    assert out[1]["n_bigrams"] == 39
    assert out[2]["n_bigrams"] == 4
    assert out[2]["surprisal_millibits"] > out[1]["surprisal_millibits"]


def test_mean_shift_detects_level_change(spark):
    """A flat 5/hour series that jumps to 50/hour: the shift score peaks
    exactly at the boundary hour and the windows count observed hours."""
    import datetime as _dt

    from log_collector_spark.operators.changepoint import mean_shift_hours
    base = _dt.datetime(2024, 1, 1)
    rows = []
    for h in range(12):
        per = 5 if h < 6 else 50
        rows += [(f"e{h}_{i}", base + _dt.timedelta(hours=h, seconds=i),
                  "deploy") for i in range(per)]
    df = spark.createDataFrame(rows, "event_id string, ts timestamp, "
                                     "event_type string")
    out = {r["hour_idx"]: r.asDict()
           for r in mean_shift_hours(df, w=6).collect()}
    h0 = min(out)
    boundary = h0 + 6
    assert out[boundary]["sum_left"] == 30    # 6 x 5
    assert out[boundary]["sum_right"] == 300  # 6 x 50
    assert out[boundary]["shift_score"] == 270
    assert out[boundary]["n_left"] == 6 and out[boundary]["n_right"] == 6
    assert max(out.values(), key=lambda r: r["shift_score"])["hour_idx"] \
        == boundary
    # first hour has an empty left window
    assert out[h0]["sum_left"] == 0 and out[h0]["n_left"] == 0
