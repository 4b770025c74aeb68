"""Containment pairs (quote/subset detection) + unpivot reshape."""

from log_collector_spark.operators import reshape as RS
from log_collector_spark.textops import containment as CN
from log_collector_spark.textops import dedup as TD


def test_containment_subset_detected_both_not_jaccard(spark):
    # doc 1 is a strict subset of doc 0 (a quote): containment(1→0) = 1.0
    # but Jaccard is diluted by doc 0's extra text.
    base = " ".join(f"w{i}" for i in range(30))
    docs = [
        (0, base + " " + " ".join(f"extra{i}" for i in range(60))),
        (1, base),
        (2, " ".join(f"z{i}" for i in range(40))),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        rows = {(r.doc_sub, r.doc_sup): r
                for r in CN.containment_pairs(df).collect()}
    finally:
        TD.unpersist_shingles()
    assert (1, 0) in rows                      # quote flagged
    assert rows[(1, 0)].cont_permille == 1000  # fully contained
    assert (0, 1) not in rows                  # big doc NOT contained in quote
    assert not any(2 in k for k in rows)       # unrelated stays out
    # the same pair is below the 0.6 Jaccard bar (union-diluted)
    r = rows[(1, 0)]
    assert r.inter * 10 < 6 * (r.size_sub + 88 - r.inter + 1)


def test_containment_maxdf_guard_never_emits_false_pairs(spark):
    # a shingle shared by MANY docs is dropped by the guard: intersections
    # only shrink, so no pair can be wrongly emitted.
    common = "the same boiler plate line"
    docs = [(i, common + f" unique{i} tail{i} end{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = CN.containment_pairs(df, max_df=3).collect()
    finally:
        TD.unpersist_shingles()
    assert got == []  # overlap was only the hot boilerplate shingles


def test_unpivot_round_trips_the_wide_frame(spark):
    events = spark.createDataFrame(
        [(1, "click", 3.7, "2024-01-01 10:00:00"),
         (2, "click", 1.2, "2024-01-01 10:01:00"),
         (2, "view", 9.9, "2024-01-01 10:02:00")],
        "user_id long, event_type string, value double, ts string",
    ).selectExpr("user_id", "event_type", "value", "cast(ts as timestamp) ts")
    long = RS.unpivot_event_metrics(events).collect()
    got = {(r.event_type, r.metric): r.metric_value for r in long}
    assert got == {
        ("click", "n_rows"): 2, ("click", "n_users"): 2,
        ("click", "value_floor_sum"): 4,
        ("view", "n_rows"): 1, ("view", "n_users"): 1,
        ("view", "value_floor_sum"): 9,
    }
    # every metric appears exactly once per type (melt is lossless)
    assert len(long) == len(got) == 2 * len(RS.METRICS)
