"""Continuation-XX ops: Good-Turing/Chao1 vocabulary advisor (hand-built
frequency spectrum), source-concentration HHI (hand-computed shares),
JL sign-projection distortion (exact single-pair identity + histogram
invariants), column value profile (nulls/mode/candidate-key verdicts)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import order as OR
from log_collector_spark.textops import analysis as A
from log_collector_spark.textops import evalops as EV


def _docs(spark, rows):
    """rows: (doc_id, text, source)."""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


# ---------------------------------------------------------------------------
# good_turing_vocab
# ---------------------------------------------------------------------------

def test_good_turing_hand_spectrum(spark):
    # freqs: a=4, b=2, c=2, d=1, e=1, f=1  →  N=11, V=6, N1=3, N2=2
    df = _docs(spark, [(1, "a a a a b b", "s"),
                       (2, "c c d e f", "s")])
    r = A.good_turing_vocab(df).collect()[0]
    assert (r["n_tokens"], r["n_types"]) == (11, 6)
    assert (r["n_singletons"], r["n_doubletons"]) == (3, 2)
    assert r["unseen_mass_permille"] == 3 * 1000 // 11      # 272
    assert r["coverage_permille"] == 1000 - 272
    # bias-corrected Chao1: V + N1(N1-1)/(2(N2+1)) = 6 + 6//6 = 7
    assert r["chao1_vocab"] == 7


def test_good_turing_no_doubletons(spark):
    # all singletons: N1=N=V, N2=0 → chao1 = V + V(V-1)//2
    df = _docs(spark, [(1, "p q r s", "s")])
    r = A.good_turing_vocab(df).collect()[0]
    assert (r["n_singletons"], r["n_doubletons"]) == (4, 0)
    assert r["chao1_vocab"] == 4 + 4 * 3 // 2


# ---------------------------------------------------------------------------
# source_concentration
# ---------------------------------------------------------------------------

def test_source_concentration_hand_shares(spark):
    # srcA: 6 tokens, srcB: 2 tokens → shares 750/250,
    # HHI = 750² + 250² = 625000, effective = 1e9 // 625000 = 1600
    df = _docs(spark, [(1, "a b c", "srcA"), (2, "d e f", "srcA"),
                       (3, "g h", "srcB")])
    r = A.source_concentration(df).collect()[0]
    assert r["n_sources"] == 2
    assert r["hhi_micro"] == 750 ** 2 + 250 ** 2
    assert r["top_share_permille"] == 750
    assert r["eff_sources_milli"] == 1600


def test_source_concentration_monoculture(spark):
    df = _docs(spark, [(1, "a b c d", "only")])
    r = A.source_concentration(df).collect()[0]
    assert (r["hhi_micro"], r["eff_sources_milli"]) == (1_000_000, 1000)
    assert r["top_share_permille"] == 1000


# ---------------------------------------------------------------------------
# jl_distortion
# ---------------------------------------------------------------------------

def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs],
        "vec_id long, embedding array<float>")


def test_jl_distortion_single_pair_exact(spark):
    # one query (id 0) vs one candidate (id 1): recompute the ratio in
    # python from the module's own sign matrix and quantized vectors.
    qa = [0.001 * ((j * 13) % 7 - 3) for j in range(64)]
    qb = [0.001 * ((j * 5) % 9 - 4) for j in range(64)]
    ia = [round(x * 1000) for x in qa]
    ib = [round(x * 1000) for x in qb]
    d2 = sum((x - y) ** 2 for x, y in zip(ia, ib))
    p2 = sum((sum(r[j] * ia[j] for j in range(64))
              - sum(r[j] * ib[j] for j in range(64))) ** 2
             for r in EV.JL_SIGNS)
    want = p2 * 1000 // (EV.JL_K * d2)
    rows = EV.jl_distortion(_embs(spark, [(0, qa), (1, qb)])).collect()
    assert len(rows) == 1
    assert rows[0]["ratio_bucket"] == want // 100
    assert rows[0]["n_pairs"] == 1
    assert rows[0]["mean_ratio_pm"] == want


def test_jl_distortion_histogram_invariants(spark):
    # 30 spread vectors + 1 query duplicate pair (d2=0 → excluded):
    # pair count = |queries| * (n-1) - zero-distance pairs, and every
    # bucket's mean sits inside the bucket's permille decile.
    vecs = [(i, [float((i * 7 + j * 3) % 11 - 5) / 5 for j in range(64)])
            for i in range(30)]
    vecs.append((100, vecs[0][1]))        # query 100 duplicates vec 0
    out = EV.jl_distortion(_embs(spark, vecs)).collect()
    # python ground truth for the pair count (the spread formula has
    # period-11 vector collisions — count the surviving d2>0 pairs)
    want = sum(1 for qid, qv in vecs if qid % 100 == 0
               for cid, cv in vecs if cid != qid and qv != cv)
    assert sum(r["n_pairs"] for r in out) == want
    for r in out:
        lo = r["ratio_bucket"] * 100
        assert lo <= r["mean_ratio_pm"] < lo + 100
    assert [r["ratio_bucket"] for r in out] == sorted(
        r["ratio_bucket"] for r in out)


def test_jl_signs_shape_and_determinism():
    assert len(EV.JL_SIGNS) == EV.JL_K
    assert all(len(r) == 64 for r in EV.JL_SIGNS)
    assert all(x in (-1, 1) for r in EV.JL_SIGNS for x in r)
    # seeded: regenerating with the same seed reproduces the matrix
    import random
    rng = random.Random(424242)
    assert EV.JL_SIGNS == [[rng.choice((-1, 1)) for _ in range(64)]
                           for _ in range(EV.JL_K)]


# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------

def test_column_profile_hand_values(spark):
    df = spark.createDataFrame(
        [(1, "click", None), (2, "view", "x"), (3, "click", "x"),
         (4, None, "y")],
        "event_id long, event_type string, props string")
    out = {r["col_name"]: r for r in
           OR.column_profile(df, cols=("event_id", "event_type",
                                       "props")).collect()}
    k = out["event_id"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 4)
    assert k["is_candidate_key"] is True
    assert k["top_n"] == 1 and k["top_share_permille"] == 250
    assert k["top_value"] == "1"          # tie → smallest value
    t = out["event_type"]
    assert (t["n_nulls"], t["n_distinct"]) == (1, 2)
    assert (t["top_value"], t["top_n"]) == ("click", 2)
    assert t["top_share_permille"] == 2 * 1000 // 3
    assert t["is_candidate_key"] is False
    p = out["props"]
    assert (p["n_nulls"], p["n_distinct"], p["top_value"]) == (1, 2, "x")


def test_column_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)],
                               "event_id long, dead string")
    r = OR.column_profile(df, cols=("dead",)).collect()[0]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (2, 2, 0)
    assert (r["top_value"], r["top_n"], r["top_share_permille"]) == \
        ("", 0, 0)
    assert r["is_candidate_key"] is False


# ---------------------------------------------------------------------------
# readability_census
# ---------------------------------------------------------------------------

def test_readability_hand_score(spark):
    # "go now. stop it." → words 4, sentences 2, vowel groups: o,o,o,i
    # = 4 → syl = max(4, 4) = 4
    # score = 206835 - 1015*4/2 - 84600*4/4 = 206835 - 2030 - 84600
    #       = 120205 → very_easy
    df = _docs(spark, [(1, "go now. stop it.", "s")])
    r = A.readability_census(df).collect()
    assert len(r) == 1
    assert r[0]["band"] == "very_easy"
    assert r[0]["min_milli"] == r[0]["max_milli"] == 120205


def test_readability_no_punctuation_single_sentence(spark):
    # no terminators → sentences floor to 1; long polysyllabic words
    # push the score down into the confusing band
    df = _docs(spark, [(1, "onomatopoeia audiovisualization "
                           "bureaucratization", "s")])
    r = A.readability_census(df).collect()
    assert len(r) == 1
    assert r[0]["band"] == "very_confusing"
