"""Continuation-XVII ops: padding-waste buckets (exact bucket math),
data-order fingerprint (md5-replayed rank checksum + order sensitivity),
late-interaction MaxSim top-k (numpy brute-force equality, in-row plan),
DP noise advisor (rule math on constructed daily counts)."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import behavior as BH
from log_collector_spark.textops import analysis as A
from log_collector_spark.textops import similarity as S
from log_collector_spark.textops.common import EMB_SCALE


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, lens):
    rows = [(i, " ".join(f"t{j}" for j in range(n)), "en", "s", 0)
            for i, n in enumerate(lens)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


# ---------------------------------------------------------------------------
# padding_waste
# ---------------------------------------------------------------------------

def test_padding_waste_buckets(spark):
    out = {r["bucket"]: r for r in
           A.padding_waste(_docs(spark, [1, 2, 3, 5, 8])).collect()}
    # buckets: 1->1, 2->2, 3->4, 5->8, 8->8
    assert set(out) == {1, 2, 4, 8}
    assert (out[1]["n_docs"], out[1]["token_sum"],
            out[1]["padded_sum"], out[1]["waste_permille"]) == (1, 1, 1, 0)
    assert (out[4]["n_docs"], out[4]["token_sum"],
            out[4]["padded_sum"]) == (1, 3, 4)
    assert out[4]["waste_permille"] == 1000 // 4
    assert (out[8]["n_docs"], out[8]["token_sum"],
            out[8]["padded_sum"]) == (2, 13, 16)
    assert out[8]["waste_permille"] == 3 * 1000 // 16


# ---------------------------------------------------------------------------
# data_order_fingerprint
# ---------------------------------------------------------------------------

def _fp_expected(ids, n_shards=8):
    per = defaultdict(list)
    for i in ids:
        per[h60(f"{i}:shard") % n_shards].append((h60(f"{i}:ord"), i))
    out = {}
    for sh, lst in per.items():
        lst.sort()
        fp = sum((r + 1) * (h60(str(i)) % A.FP_P1) % A.FP_P2
                 for r, (_, i) in enumerate(lst))
        out[sh] = (len(lst), fp)
    return out


def test_order_fingerprint_matches_md5_replay(spark):
    ids = list(range(50))
    got = {r["shard"]: (r["n_docs"], r["order_fingerprint"])
           for r in A.data_order_fingerprint(_docs(spark, [2] * 50)
                                             ).collect()}
    assert got == _fp_expected(ids)


def test_order_fingerprint_detects_membership_change(spark):
    a = {r["shard"]: r["order_fingerprint"]
         for r in A.data_order_fingerprint(_docs(spark, [2] * 30)).collect()}
    b = {r["shard"]: r["order_fingerprint"]
         for r in A.data_order_fingerprint(_docs(spark, [2] * 31)).collect()}
    assert a != b   # adding doc 30 changes at least its shard's checksum


# ---------------------------------------------------------------------------
# latesim_topk
# ---------------------------------------------------------------------------

def _maxsim_numpy(qv, cv):
    q = qv.reshape(8, 8).astype(np.int64)
    c = cv.reshape(8, 8).astype(np.int64)
    dots = q @ c.T
    return int(dots.max(axis=1).sum())


def test_latesim_matches_numpy_bruteforce(spark):
    rng = np.random.RandomState(11)
    vecs = (rng.rand(12, 64) * 2 - 1).round(3)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist(), 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int")
    out = S.latesim_topk(df, k=3).collect()   # query = vec 0 only
    assert len(out) == 3 and all(r["query_id"] == 0 for r in out)
    qz = np.round(vecs * EMB_SCALE).astype(np.int64)
    scores = {i: _maxsim_numpy(qz[0], qz[i]) for i in range(1, 12)}
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["cand_id"], r["maxsim"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == exp


def test_latesim_plan_has_no_explode(spark):
    df = spark.createDataFrame(
        [(i, [0.1] * 64, 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int")
    plan = S.latesim_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan      # MaxSim is in-row, no explode
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# dp_noise_advisor
# ---------------------------------------------------------------------------

def test_dp_noise_advisor_math(spark):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # day 0: user 1 x8 (capped 5), user 2 x2 -> kept 7
    for _ in range(8):
        rows.append((eid, base, 1, "a", 1.0, "{}")); eid += 1
    for _ in range(2):
        rows.append((eid, base, 2, "a", 1.0, "{}")); eid += 1
    # day 1: user 1 x3 -> kept 3 ; mean daily kept = (7+3)//2 = 5
    for _ in range(3):
        rows.append((eid, base + dt.timedelta(days=1), 1, "a", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["eps_milli"]: r for r in
           BH.dp_noise_advisor(df, eps_milli=[500, 1000]).collect()}
    r = out[500]
    assert (r["sensitivity"], r["n_days"], r["mean_daily_kept"]) == (5, 2, 5)
    assert r["noise_b_milli"] == 5 * 1_000_000 // 500      # b = 10.0
    assert r["rel_error_permille"] == r["noise_b_milli"] // 5
    assert out[1000]["noise_b_milli"] == 5000
