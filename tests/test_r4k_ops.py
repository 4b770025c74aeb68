"""Continuation-XI ops: watermark green-list screen, embedding isotropy
histogram, multiwindow SLO burn alerts."""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib

from log_collector_spark.operators import behavior as B
from log_collector_spark.textops import analysis as TA
from log_collector_spark.textops import similarity as TS


def _green(tok: str) -> bool:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2 == 0


def test_watermark_bias_chi2_closed_form(spark):
    words = "aa bb cc dd ee ff gg hh ii jj kk ll".split()
    greens = [w for w in words if _green(w)][:3]
    reds = [w for w in words if not _green(w)][:3]
    assert len(greens) == 3 and len(reds) == 3
    texts = [(" ".join(greens), "wm"),          # all-green: maximal bias
             (" ".join(greens + reds), "ok")]   # balanced: zero bias
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(texts)],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in TA.watermark_bias(df).collect()}
    wm, ok = out["wm"], out["ok"]
    assert (wm["n_green"], wm["green_permille"]) == (3, 1000)
    assert wm["chi2_milli"] == (2 * 3 - 3) ** 2 * 1000 // 3   # 3000
    assert (ok["green_permille"], ok["chi2_milli"]) == (500, 0)


def test_embedding_isotropy_bins(spark):
    # stride-17 pairs: (0,17) parallel -> cos2 1000 -> bin 20;
    # (1,18) orthogonal -> bin 10; (2,19) anti-parallel -> bin 0
    vecs = {0: [1.0, 0.0], 17: [2.0, 0.0],
            1: [1.0, 0.0], 18: [0.0, 1.0],
            2: [1.0, 0.0], 19: [-1.0, 0.0]}
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id long, embedding array<float>")
    out = {r["cos2_bin"]: r["n_pairs"]
           for r in TS.embedding_isotropy(df).collect()}
    assert out == {20: 1, 10: 1, 0: 1}


def test_slo_burn_requires_both_windows(spark):
    # hour 0: every 5-min bucket hot (50% errors) -> alerts fire
    # hour 1: one hot 5-min bucket inside a cold hour -> suppressed
    rows = []
    eid = 0
    for b in range(12):                     # hour 0, buckets 0..11
        for i in range(4):
            rows.append((eid, datetime(2024, 1, 1, 0, b * 5, i),
                         1, "error" if i < 2 else "view"))
            eid += 1
    for b in range(12):                     # hour 1: only bucket 12 is hot
        for i in range(4):
            et = "error" if (b == 0 and i < 2) else "view"
            rows.append((eid, datetime(2024, 1, 1, 1, b * 5, i), 1, et))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = B.slo_burn_alerts(df).collect()
    assert len(out) == 12                       # all of hour 0, none of hour 1
    assert all(r["burn_short_milli"] == 2000 for r in out)  # 500/250 budget
    assert all(r["burn_long_milli"] == 2000 for r in out)
