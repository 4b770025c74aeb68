"""Continuation-XVIII ops: integer nDCG@k (perfect-retrieval exactness +
discount-table math), k-core peel (constructed triangle + whisker graph),
link-Jaccard edge strength (triangle edge vs isolated edge), CUSUM
changepoint (hand-computed level shift), Bloom FPR sizing curve
(disjoint member/probe invariants + theoretical constants)."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import enrich as EN
from log_collector_spark.operators import seasonal as SE
from log_collector_spark.textops import evalops as EV


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _events(spark, rows):
    """rows: (hour_idx, event_type, user_id) → minimal events frame."""
    data = [(dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), t, int(u))
            for h, t, u in rows]
    return spark.createDataFrame(
        data, "ts timestamp, event_type string, user_id long")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, start=1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


# triangle family (docs 1-3 identical), whisker pair (4-5 identical),
# loner (6) — token vocabularies disjoint across groups so MinHash can
# only pair within a group.
_GRAPH_TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "alpha beta gamma delta epsilon zeta",
    "alpha beta gamma delta epsilon zeta",
    "omicron pi rho sigma tau upsilon",
    "omicron pi rho sigma tau upsilon",
    "one two three four five six seven",
]


# ---------------------------------------------------------------------------
# ann_ndcg
# ---------------------------------------------------------------------------

def test_ndcg_tables_math():
    disc, prefix = EV._ndcg_tables(5)
    assert disc[0] == 1_000_000                       # 1/log2(2)
    assert disc[1] == round(1_000_000 / math.log2(3))
    assert prefix == [sum(disc[:i + 1]) for i in range(5)]
    assert disc == sorted(disc, reverse=True)


def test_ann_ndcg_perfect_retrieval(spark):
    # identical vectors → one LSH bucket, one IVF cell, ties broken by
    # cand_id identically in truth and both approx paths → nDCG == 1000.
    vec = [0.5] * 64
    df = spark.createDataFrame(
        [(i, vec, 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int")
    rows = {r["ann_path"]: r for r in EV.ann_ndcg(df).collect()}
    assert set(rows) == {"ivf", "lsh"}
    _, prefix = EV._ndcg_tables(5)
    for r in rows.values():
        assert r["n_queries"] == 1
        assert r["idcg_micro"] == prefix[4]           # k_truth = 5
        assert r["dcg_micro"] == r["idcg_micro"]
        assert r["ndcg_permille"] == 1000


def test_ann_ndcg_bounds_on_spread_vectors(spark):
    # spread vectors: nDCG may be < 1000 but never exceeds it, and DCG
    # can never exceed IDCG (discounts are positive and decreasing).
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) / 5 for j in range(64)], 0)
         for i in range(40)],
        "vec_id long, embedding array<float>, label int")
    for r in EV.ann_ndcg(df).collect():
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]
        assert 0 <= r["ndcg_permille"] <= 1000


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------

def test_kcore_peel_triangle_and_whisker(spark):
    out = {r["doc_id"]: r for r in
           EV.kcore_peel(_docs(spark, _GRAPH_TEXTS)).collect()}
    # loner (6) has no edges → not a graph node at all
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (1, 2, 3):                               # triangle survives
        assert (out[d]["deg0"], out[d]["removed"], out[d]["deg1"]) == \
            (2, False, 2)
    for d in (4, 5):                                  # whisker peeled
        assert (out[d]["deg0"], out[d]["removed"], out[d]["deg1"]) == \
            (1, True, 0)


# ---------------------------------------------------------------------------
# link_jaccard
# ---------------------------------------------------------------------------

def test_link_jaccard_triangle_vs_isolated_edge(spark):
    out = {(r["doc_a"], r["doc_b"]): r for r in
           EV.link_jaccard(_docs(spark, _GRAPH_TEXTS)).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3), (4, 5)}
    for e in ((1, 2), (1, 3), (2, 3)):
        r = out[e]
        # N(a)∩N(b) = the third triangle vertex; union also size 1
        assert (r["deg_a"], r["deg_b"], r["common_n"], r["union_n"]) == \
            (2, 2, 1, 1)
        assert r["jaccard_permille"] == 1000
    r = out[(4, 5)]
    # isolated edge: no neighbors besides each other → 0/0 guarded to 0
    assert (r["deg_a"], r["deg_b"], r["common_n"], r["union_n"]) == \
        (1, 1, 0, 0)
    assert r["jaccard_permille"] == 0


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------

def test_cusum_level_shift_hand_computed(spark):
    # type "a": hours 0-3 one event, hours 4-7 five events. T=8, C=24;
    # d_t = 8*cum - t*24 peaks in |.| at t=4 (d=-64) → change_hour = 3.
    rows = [(h, "a", 1) for h in range(4)]
    rows += [(h, "a", 1) for h in range(4, 8) for _ in range(5)]
    out = SE.cusum_changepoint(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    base_h = int(dt.datetime(2024, 1, 1,
                             tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert (r["n_hours"], r["total_events"]) == (8, 24)
    assert r["change_hour"] == base_h + 3
    assert r["d_abs_max"] == 64
    assert r["shift_permille"] == 64 * 1000 // (8 * 24)


def test_cusum_stationary_is_zero_at_tie_break(spark):
    # constant series: every d_t = 0; tie breaks to the EARLIEST hour.
    rows = [(h, "b", 1) for h in range(6)]
    r = SE.cusum_changepoint(_events(spark, rows)).collect()[0]
    base_h = int(dt.datetime(2024, 1, 1,
                             tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert r["d_abs_max"] == 0
    assert r["shift_permille"] == 0
    assert r["change_hour"] == base_h


# ---------------------------------------------------------------------------
# bloom_fpr_curve
# ---------------------------------------------------------------------------

def test_bloom_theo_constants():
    assert EN._bloom_theo_permille(8, 6) == \
        round(1000 * (1 - math.exp(-6 / 8)) ** 6)
    # more bits per key → strictly lower theoretical FPR down the ladder
    theos = [EN._bloom_theo_permille(b, k) for b, k in EN.BLOOM_LADDER]
    assert theos == sorted(theos, reverse=True)


def test_bloom_fpr_curve_invariants(spark):
    rows = [(h % 24, "e", u) for h, u in enumerate(range(100))]
    out = EN.bloom_fpr_curve(_events(spark, rows)).collect()
    assert [r["bits_per_key"] for r in out] == \
        [b for b, _ in EN.BLOOM_LADDER]
    for r, (b, k) in zip(out, EN.BLOOM_LADDER):
        assert r["k_hashes"] == k
        assert r["n_keys"] == 50 and r["n_probes"] == 50   # even/odd split
        assert 0 <= r["n_fp"] <= r["n_probes"]
        assert r["fpr_permille"] == r["n_fp"] * 1000 // 50
        assert r["theo_fpr_permille"] == EN._bloom_theo_permille(b, k)


# ---------------------------------------------------------------------------
# isqrt primitive
# ---------------------------------------------------------------------------

def test_isqrt_exact_over_tricky_values(spark):
    import math as m
    from log_collector_spark.textops import common as CM
    vals = [0, 1, 2, 3, 4, 8, 9, 10, 15, 16, 17,
            10**12, 10**12 - 1, (10**6) ** 2, (10**6) ** 2 - 1,
            (2**26) ** 2, (2**26) ** 2 - 1, 2**52]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    out = {r["n"]: r["s"] for r in
           df.select("n", CM.isqrt(F.col("n")).alias("s")).collect()}
    for v in vals:
        assert out[v] == m.isqrt(v), v


# ---------------------------------------------------------------------------
# temperature_mixture
# ---------------------------------------------------------------------------

def test_temperature_mixture_hand_values(spark):
    from log_collector_spark.textops import analysis as A
    rows = [(1, " ".join(["t"] * 100), "en", "s1", 0),
            (2, " ".join(["t"] * 400), "en", "s2", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r["source"]: r for r in A.temperature_mixture(df).collect()}
    assert (out["s1"]["n_tokens"], out["s2"]["n_tokens"]) == (100, 400)
    assert (out["s1"]["sqrt_tokens"], out["s2"]["sqrt_tokens"]) == (10, 20)
    assert (out["s1"]["w_t1_permille"], out["s2"]["w_t1_permille"]) == \
        (200, 800)
    assert (out["s1"]["w_t2_permille"], out["s2"]["w_t2_permille"]) == \
        (333, 666)
    assert out["s1"]["w_uniform_permille"] == 500


# ---------------------------------------------------------------------------
# rouge_pairs
# ---------------------------------------------------------------------------

def test_rouge_pairs_hand_values(spark):
    from log_collector_spark.textops import analysis as A
    rows = [(2, "a b c a", "en", "s", 0), (3, "a b d", "en", "s", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = A.rouge_pairs(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_ref"], r["doc_cand"]) == (2, 3)
    # ref multiset {a:2,b:1,c:1}, cand {a:1,b:1,d:1} → clipped match 2/4
    assert (r["r1_match"], r["r1_total"], r["rouge1_permille"]) == \
        (2, 4, 500)
    # ref bigrams {a b, b c, c a}, cand {a b, b d} → match 1/3
    assert (r["r2_match"], r["r2_total"], r["rouge2_permille"]) == \
        (1, 3, 333)


# ---------------------------------------------------------------------------
# dedup_roi_curve
# ---------------------------------------------------------------------------

def test_dedup_roi_curve_hand_values(spark):
    from log_collector_spark.textops import dedup as D
    t1 = "w1 w2 w3 w4 w5 w6"
    t3 = "w1 w2 w3 w4 x y"        # shares 2 of 4 shingles with t1 → 333
    df = spark.createDataFrame(
        [(1, t1, "en", "s", 0), (2, t1, "en", "s", 0),
         (3, t3, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    try:
        out = {r["threshold_permille"]: r
               for r in D.dedup_roi_curve(df).collect()}
    finally:
        D.unpersist_shingles()
    # at 300: (1,2)@1000, (1,3)@333, (2,3)@333
    assert (out[300]["n_pairs"], out[300]["n_docs_touched"],
            out[300]["n_docs_removed"]) == (3, 3, 2)
    for t in (500, 700, 800, 900):
        assert (out[t]["n_pairs"], out[t]["n_docs_touched"],
                out[t]["n_docs_removed"]) == (1, 2, 1)


# ---------------------------------------------------------------------------
# sq8_recall
# ---------------------------------------------------------------------------

def test_sq8_recall_lossless_on_flat_dims(spark):
    from log_collector_spark.textops import evalops as EVx
    vec = [0.5] * 64
    df = spark.createDataFrame(
        [(i, vec, 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int")
    r = EVx.sq8_recall(df).collect()[0]
    # flat dims reconstruct exactly → identical ranking
    assert (r["n_queries"], r["n_truth"], r["n_hits"]) == (1, 5, 5)
    assert r["recall_permille"] == 1000
    assert r["top1_preserved"] == 1


def test_sq8_recall_bounds_on_spread_vectors(spark):
    from log_collector_spark.textops import evalops as EVx
    df = spark.createDataFrame(
        [(i, [float((i * 5 + j * 7) % 13 - 6) / 6 for j in range(64)], 0)
         for i in range(30)],
        "vec_id long, embedding array<float>, label int")
    r = EVx.sq8_recall(df).collect()[0]
    assert r["n_queries"] == 1
    assert 0 <= r["n_hits"] <= r["n_truth"] == 5
    assert 0 <= r["top1_preserved"] <= r["n_queries"]


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

def test_benford_audit_hand_values(spark):
    from log_collector_spark.operators import behavior as BH
    import datetime as dtt
    vals = [1.00, 0.02, 25.00, 0.00]   # cents: 100→1, 2→2, 2500→2, dropped
    df = spark.createDataFrame(
        [(dtt.datetime(2024, 1, 1), "e", 1, v) for v in vals],
        "ts timestamp, event_type string, user_id long, value double")
    out = {r["digit"]: r for r in BH.benford_audit(df).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["n_obs"] == 1 and out[2]["n_obs"] == 2
    assert sum(r["n_obs"] for r in out.values()) == 3
    assert out[1]["share_permille"] == 333
    assert out[2]["share_permille"] == 666
    assert out[1]["benford_permille"] == BH.BENFORD_PERMILLE[0] == 301
    assert out[1]["dev_permille"] == abs(333 - 301)
    assert out[9]["n_obs"] == 0 and out[9]["share_permille"] == 0


# ---------------------------------------------------------------------------
# mann_whitney_u
# ---------------------------------------------------------------------------

def test_mann_whitney_hand_values(spark):
    from log_collector_spark.operators import behavior as BH
    import datetime as dtt
    rows = [("view", 3.0), ("view", 1.0), ("click", 2.0), ("click", 2.0)]
    df = spark.createDataFrame(
        [(dtt.datetime(2024, 1, 1), t, 1, v) for t, v in rows],
        "ts timestamp, event_type string, user_id long, value double")
    r = BH.mann_whitney_u(df).collect()[0]
    # doubled midranks: 100→2, 200/200→5 each, 300→8; R2_a = 2+8 = 10;
    # U2 = 10 − 2·3 = 4 (U = 2: the 3.0 beats both 2.0s); AUC = 500
    assert (r["n_a"], r["n_b"], r["r2_sum_a"], r["u2"]) == (2, 2, 10, 4)
    assert r["auc_permille"] == 500


# ---------------------------------------------------------------------------
# theil_sen_slope
# ---------------------------------------------------------------------------

def test_theil_sen_ignores_outlier_hour(spark):
    from log_collector_spark.operators import seasonal as SEx
    # counts 1,2,3,10 over hours 0-3: median pairwise slope is the clean
    # +1/hour trend; the outlier hour only shifts the tail of the slope
    # distribution, not the median.
    rows = []
    for h, n in enumerate([1, 2, 3, 10]):
        rows += [(h, "a", 1)] * n
    out = SEx.theil_sen_slope(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_hours"], r["n_pairs"]) == (4, 6)
    assert r["slope_milli"] == 1000


# ---------------------------------------------------------------------------
# token_bucket
# ---------------------------------------------------------------------------

def test_token_bucket_hand_replay(spark):
    from log_collector_spark.operators import behavior as BH
    import datetime as dtt
    base = dtt.datetime(2024, 1, 1)
    rows = [(base, "e", 1, float(i), i) for i in range(7)]          # burst
    rows.append((base + dtt.timedelta(seconds=120), "e", 1, 7.0, 7))
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, "
              "value double, event_id long")
    r = BH.token_bucket(df).collect()[0]
    # cap 5: burst of 7 → 5 allowed, 2 rejected, bucket empty; +120 s
    # refills 2000 milli → 8th allowed, 1000 milli left.
    assert (r["n_events"], r["n_allowed"], r["n_rejected"]) == (8, 6, 2)
    assert r["tokens_milli_final"] == 1000


def test_token_bucket_refill_clamps_at_cap(spark):
    from log_collector_spark.operators import behavior as BH
    import datetime as dtt
    base = dtt.datetime(2024, 1, 1)
    rows = [(base, "e", 2, 0.0, 1),
            (base + dtt.timedelta(hours=10), "e", 2, 0.0, 2)]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, "
              "value double, event_id long")
    r = BH.token_bucket(df).collect()[0]
    # 10 h would refill 600 tokens; the bucket clamps at cap before the
    # second spend: 5000 − 1000 + clamp → 5000 − 1000 = 4000 after.
    assert (r["n_allowed"], r["tokens_milli_final"]) == (2, 4000)


# ---------------------------------------------------------------------------
# wilson_rates
# ---------------------------------------------------------------------------

def test_wilson_rates_hand_values(spark):
    from log_collector_spark.operators import behavior as BH
    import datetime as dtt
    rows = [(dtt.datetime(2024, 1, 1), "t", 1,
             150.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, value double")
    r = BH.wilson_rates(df).collect()[0]
    # x=50, n=100: inner = (50e6//100)*50 + 1e6 = 26e6; isqrt = 5099;
    # lb = (52*1000 − 2*5099) // 104 = 401 (true Wilson z=2: 0.4019)
    assert (r["n"], r["x"], r["p_milli"]) == (100, 50, 500)
    assert r["wilson_lb_milli"] == 401
    # the bound must sit strictly below the point estimate
    assert r["wilson_lb_milli"] < r["p_milli"]


# ---------------------------------------------------------------------------
# crosscorr_types
# ---------------------------------------------------------------------------

def test_crosscorr_identical_series_peaks_at_lag_zero(spark):
    from log_collector_spark.operators import seasonal as SEx
    # both types get counts [1,3,1,3] over 4 hours: dx = 4·20−64 = 16
    # (perfect square) → corr at lag 0 exactly 1000.
    rows = []
    for h, n in enumerate([1, 3, 1, 3]):
        for t in ("error", "purchase"):
            rows += [(h, t, 1)] * n
    out = {r["lag"]: r for r in
           SEx.crosscorr_types(_events(spark, rows)).collect()}
    assert set(out) == set(range(-6, 7))
    assert out[0]["n_overlap"] == 4
    assert out[0]["corr_permille"] == 1000
    # alternating series anti-correlates at |lag| = 1
    assert out[1]["corr_permille"] < 0 and out[-1]["corr_permille"] < 0
    assert all(-1000 <= r["corr_permille"] <= 1000 for r in out.values())


# ---------------------------------------------------------------------------
# ann_map
# ---------------------------------------------------------------------------

def test_ann_map_perfect_retrieval(spark):
    from log_collector_spark.textops import evalops as EVx
    vec = [0.5] * 64
    df = spark.createDataFrame(
        [(i, vec, 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int")
    rows = {r["ann_path"]: r for r in EVx.ann_map(df).collect()}
    assert set(rows) == {"ivf", "lsh"}
    for r in rows.values():
        # hits at ranks 1..5: AP = (Σ i·1000//i)//5 = 1000
        assert (r["n_queries"], r["map_milli"]) == (1, 1000)


# ---------------------------------------------------------------------------
# rake_phrases
# ---------------------------------------------------------------------------

def test_rake_phrases_hand_values(spark):
    from log_collector_spark.textops import analysis as A
    texts = ["aa red apple aa green pear", "aa red apple", "aa solo"]
    df = spark.createDataFrame(
        [(i, t, "en", "s", 0) for i, t in enumerate(texts, 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = A.rake_phrases(df, stop_k=1).collect()
    rows = {r["phrase"]: r for r in out}
    # stoplist = {aa} (df 3, strictly top); words red/apple/green/pear all
    # score degree·1000/freq = 2000, solo scores 1000
    assert (rows["red apple"]["n_occurrences"],
            rows["red apple"]["score_milli"]) == (2, 4000)
    assert (rows["green pear"]["n_occurrences"],
            rows["green pear"]["score_milli"]) == (1, 4000)
    assert rows["solo"]["score_milli"] == 1000
    # ordering: ties by phrase ASC
    assert [r["phrase"] for r in out] == ["green pear", "red apple", "solo"]


# ---------------------------------------------------------------------------
# dict_encoding_advisor
# ---------------------------------------------------------------------------

def test_dict_encoding_advisor_hand_bytes(spark):
    from log_collector_spark.operators import order as ORx
    import datetime as dtt
    rows = [(dtt.datetime(2024, 1, 1), t, 1, 0.0, "xxxxxxxxxx")
            for t in ["aa", "aa", "bb", "bb"]]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id long, "
              "value double, props string")
    out = {r["col_name"]: r for r in
           ORx.dict_encoding_advisor(df).collect()}
    et = out["event_type"]
    # plain 8 B; dict = 4 B distinct + 4·1 B idx = 8 B → not worth it
    assert (et["n_rows"], et["n_distinct"], et["plain_bytes"],
            et["dict_bytes"]) == (4, 2, 8, 8)
    assert not et["recommend_dict"]
    pr = out["props"]
    # plain 40 B; dict = 10 + 4 = 14 B → clear win
    assert (pr["plain_bytes"], pr["dict_bytes"]) == (40, 14)
    assert pr["recommend_dict"] and pr["ratio_permille"] == 350
