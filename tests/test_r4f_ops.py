"""Continuation-VI ops: integer BM25 top-k, winnowing fingerprints (MOSS),
consistent-hash shard rebalance audit, per-source quality calibration.
Each checked Spark-vs-DuckDB on a crafted corpus plus the operator's own
structural guarantee (BM25 rare-term ranking, the winnowing detection
window, ring movement << mod movement, decile mass placement)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import order as OO
from log_collector_spark.textops import analysis as TA
from log_collector_spark.textops import dedup as TD


def _duck(texts, extra=None):
    con = duckdb.connect()
    frame = {"doc_id": range(len(texts)), "text": texts}
    if extra:
        frame.update(extra)
    con.register("documents", pd.DataFrame(frame))
    return con


def test_bm25_matches_duckdb_and_ranks_rare_term(spark):
    texts = [
        "data data data data table scan engine rows",   # all 3 terms, hot tf
        "data table scan",                               # all 3, short
        "data and more data but nothing else relevant aa bb cc dd ee ff",
        "completely unrelated text body here",           # no query term
        "table scan table scan table scan",              # 2 of 3 terms
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [tuple(r) for r in TA.bm25_topk(df).collect()]
    want = [tuple(r) for r in
            _duck(texts).execute(TA.sql_bm25_topk()).fetchall()]
    assert got == want
    ids = [r[0] for r in got]
    assert 3 not in ids                     # no query term → never ranked
    assert ids[0] in (0, 1)                 # all-terms docs outrank partial
    # rarest-term weighting: doc 2 (only 'data', the most common term)
    # scores below every all-terms doc
    scores = {r[0]: r[1] for r in got}
    assert scores[2] < min(scores[0], scores[1])


def test_quality_calibration_matches_duckdb_and_places_mass(spark):
    clean = "the quick brown fox jumps over the lazy dog again and again"
    junk = "@@@ ### 123 456 $$$ %%% 789 000 !!! ???"
    texts = [clean] * 4 + [junk] * 4
    sources = ["good"] * 4 + ["bad"] * 4
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(texts, sources))],
        "doc_id long, text string, source string")
    got = [tuple(r) for r in TA.quality_calibration(df).collect()]
    want = [tuple(r) for r in _duck(
        texts, {"source": sources}).execute(
        TA.sql_quality_calibration()).fetchall()]
    assert got == want
    by_src = {(r[0], r[1]): r[3] for r in got}
    # every clean doc shares one (higher) decile, every junk doc one (lower);
    # within-source share is therefore 1000
    good_dec = [d for (s, d) in by_src if s == "good"]
    bad_dec = [d for (s, d) in by_src if s == "bad"]
    assert len(good_dec) == 1 and len(bad_dec) == 1
    assert good_dec[0] > bad_dec[0]
    assert by_src[("good", good_dec[0])] == 1000


def test_winnowing_detection_window_and_duckdb(spark):
    # docs 0 and 1 share a run of w+k-1 = 6 tokens → the winnowing guarantee
    # says they MUST share at least one fingerprint (k=3 shingles, w=4)
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"intro words {shared} tail one two three",
        f"{shared} completely different ending here now",
        "no overlap with anything else at all in this document body",
        "tiny doc",                                  # < k tokens → 0 shingles
        "four tokens exactly here",                  # n_shingles=1 < w
        "four tokens exactly here",                  # dup of 4 → short-doc pair
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    # min_shared=1 exposes the raw guarantee
    got = sorted(tuple(r) for r in
                 TD.winnowing_pairs(df, min_shared=1).collect())
    want = sorted(tuple(r) for r in _duck(texts).execute(
        TD.sql_winnowing_pairs(min_shared=1)).fetchall())
    assert got == want
    pairs = {(a, b) for a, b, _ in got}
    assert (0, 1) in pairs          # the detection-window guarantee
    assert (4, 5) in pairs          # short docs still fingerprint
    assert all(3 not in p for p in pairs)   # zero-shingle doc never pairs


def test_shard_rebalance_ring_beats_mod(spark):
    df = spark.range(0, 2000).select(
        (OO.F.col("id")).alias("doc_id"),
        OO.F.lit("x").alias("text"))
    got = {r["scheme"]: (r["n_docs"], r["n_moved"], r["moved_permille"])
           for r in OO.shard_rebalance_audit(df).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(2000)}))
    want = {r[0]: (r[1], r[2], r[3]) for r in
            con.execute(OO.sql_shard_rebalance_audit()).fetchall()}
    assert got == want
    assert got["mod"][0] == got["ring"][0] == 2000
    # mod-N remaps ~8/9 of keys; the ring remaps ~1/9 — the audit must
    # show the gap decisively (ring under 1/4, mod over 1/2)
    assert got["ring"][2] < 250 < 500 < got["mod"][2]
