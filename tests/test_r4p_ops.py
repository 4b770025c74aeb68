"""Continuation-XVI ops: FIM split accounting (exact md5-replayed cuts +
segment invariants), Chinchilla budget advisor (rule math), epoch shuffle
audit (md5-replayed shard assignment), in-batch negative collisions
(brute-force pair counting), A/B SRM (chi-square corners + headroom
flag)."""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys
from collections import Counter

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import behavior as BH
from log_collector_spark.textops import analysis as A
from log_collector_spark.textops import similarity as S


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# fim_split
# ---------------------------------------------------------------------------

def _fim_expected(docs):
    """docs: list of (doc_id, n_tokens, source). Returns per-source dict."""
    out = {}
    for did, n, src in docs:
        d = out.setdefault(src, Counter())
        d["n_docs"] += 1
        if n >= 3:
            cut1 = 1 + h60(f"{did}:fim1") % (n - 2)
            cut2 = cut1 + 1 + h60(f"{did}:fim2") % (n - 1 - cut1)
            assert 1 <= cut1 < cut2 <= n - 1
            d["n_eligible"] += 1
            d["prefix"] += cut1
            d["middle"] += cut2 - cut1
            d["suffix"] += n - cut2
    return out


def test_fim_split_exact_cuts_and_ineligible(spark):
    docs = [(0, 10, "s1"), (1, 3, "s1"), (2, 2, "s1"),   # 2-token: skipped
            (3, 7, "s2"), (4, 1, "s2")]
    rows = [(did, " ".join(f"t{i}" for i in range(n)), "en", src, 0)
            for did, n, src in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r["source"]: r for r in A.fim_split(df).collect()}
    exp = _fim_expected(docs)
    for src in ("s1", "s2"):
        g, e = got[src], exp[src]
        assert g["n_docs"] == e["n_docs"]
        assert g["n_eligible"] == e["n_eligible"]
        assert g["prefix_tokens"] == e["prefix"]
        assert g["middle_tokens"] == e["middle"]
        assert g["suffix_tokens"] == e["suffix"]
        tot = e["prefix"] + e["middle"] + e["suffix"]
        assert g["middle_share_permille"] == (
            e["middle"] * 1000 // tot if tot else 0)
    # segment sums reconstruct eligible token mass exactly
    assert (got["s1"]["prefix_tokens"] + got["s1"]["middle_tokens"]
            + got["s1"]["suffix_tokens"]) == 10 + 3


# ---------------------------------------------------------------------------
# scaling_budget_advisor
# ---------------------------------------------------------------------------

def test_scaling_budget_rule_math(spark):
    # corpus: 3 docs x 4 tokens = 12 tokens
    df = spark.createDataFrame([("a b c d",)] * 3, "text string")
    out = {r["params"]: r for r in
           A.scaling_budget_advisor(df, model_sizes=[1, 100]).collect()}
    r1, r100 = out[1], out[100]
    assert (r1["tokens_needed"], r1["corpus_tokens"]) == (20, 12)
    assert r1["epochs_milli"] == 20 * 1000 // 12
    assert r1["deficit_tokens"] == 8
    assert (r100["tokens_needed"], r100["epochs_milli"],
            r100["deficit_tokens"]) == (2000, 2000 * 1000 // 12, 1988)


def test_scaling_budget_empty_corpus(spark):
    df = spark.createDataFrame([], "text string")
    r = A.scaling_budget_advisor(df, model_sizes=[10]).collect()[0]
    assert (r["corpus_tokens"], r["epochs_milli"],
            r["deficit_tokens"]) == (0, 0, 200)


# ---------------------------------------------------------------------------
# epoch_shuffle_audit
# ---------------------------------------------------------------------------

def test_epoch_shuffle_matches_md5_replay(spark):
    ids = list(range(40))
    df = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in ids],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    s0 = [h60(f"{i}:e0") % 8 for i in ids]
    s1 = [h60(f"{i}:e1") % 8 for i in ids]
    same = sum(a == b for a, b in zip(s0, s1))
    sizes = Counter(s0)
    r = A.epoch_shuffle_audit(df).collect()[0]
    assert (r["n_docs"], r["same_shard_docs"]) == (40, same)
    assert r["same_shard_permille"] == same * 1000 // 40
    assert r["expected_permille"] == 125
    assert (r["shard_max"], r["shard_min"]) == (
        max(sizes.values()), min(sizes.values()))


# ---------------------------------------------------------------------------
# inbatch_negatives
# ---------------------------------------------------------------------------

def test_inbatch_negatives_bruteforce(spark):
    n = 24
    labels = [i % 3 for i in range(n)]
    df = spark.createDataFrame(
        [(i, [1.0], l) for i, l in enumerate(labels)],
        "vec_id long, embedding array<float>, label int")
    B = 4
    nb = max(1, n // B)
    batches = {}
    for i, l in zip(range(n), labels):
        batches.setdefault(h60(str(i)) % nb, []).append(l)
    total = sum(len(v) * (len(v) - 1) // 2 for v in batches.values())
    same = sum(c * (c - 1) // 2
               for v in batches.values()
               for c in Counter(v).values())
    r = S.inbatch_negatives(df, batch_sizes=[B]).collect()[0]
    assert (r["batch_size"], r["n_batches"]) == (B, nb)
    assert (r["total_pairs"], r["same_label_pairs"]) == (total, same)
    assert r["false_neg_permille"] == (same * 1000 // total if total else 0)


def test_inbatch_negatives_single_batch_all_same_label(spark):
    # fewer vecs than batch size -> one batch; all same label -> 1000
    df = spark.createDataFrame(
        [(i, [1.0], 7) for i in range(5)],
        "vec_id long, embedding array<float>, label int")
    r = S.inbatch_negatives(df, batch_sizes=[16]).collect()[0]
    assert (r["n_batches"], r["total_pairs"],
            r["same_label_pairs"], r["false_neg_permille"]) == (1, 10, 10,
                                                                1000)


# ---------------------------------------------------------------------------
# ab_srm
# ---------------------------------------------------------------------------

def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_ab_srm_balanced_and_chi2(spark):
    base = dt.datetime(2024, 1, 1)
    users = list(range(60))
    rows = [(i, base, u, "click", 1.0, "{}")
            for i, u in enumerate(users)]
    r = {x["event_type"]: x for x in
         BH.ab_srm(_events_df(spark, rows)).collect()}["click"]
    arms = Counter(h60(str(u)) % 2 for u in users)
    uc, ut = arms[0], arms[1]
    assert (r["users_control"], r["users_treatment"]) == (uc, ut)
    assert (r["events_control"], r["events_treatment"]) == (uc, ut)
    assert r["srm_chi2_milli"] == abs(uc - ut) ** 2 * 1000 // (uc + ut)
    assert bool(r["srm_flag"]) == (r["srm_chi2_milli"] > 3841)


def test_ab_srm_gross_imbalance_flags(spark):
    # pick user ids that all hash to arm 0 -> chi2 = n*1000 -> flag
    arm0 = [u for u in range(4000) if h60(str(u)) % 2 == 0][:8]
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, u, "buy", 1.0, "{}") for i, u in enumerate(arm0)]
    r = BH.ab_srm(_events_df(spark, rows)).collect()[0]
    assert (r["users_control"], r["users_treatment"]) == (8, 0)
    assert r["srm_chi2_milli"] == 8 * 1000
    assert bool(r["srm_flag"]) is True


def test_ab_srm_repeat_events_count_users_once(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "view", 1.0, "{}") for i in range(5)]
    r = BH.ab_srm(_events_df(spark, rows)).collect()[0]
    assert r["users_control"] + r["users_treatment"] == 1
    assert r["events_control"] + r["events_treatment"] == 5
