"""Continuation-X ops: LSH probe-budget curve, delete-impact audit,
cross-source boilerplate-line matrix."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators import order as OO
from log_collector_spark.textops import dedup as TD
from log_collector_spark.textops import evalops as EV


def test_lsh_probe_curve_monotone_and_full_budget_matches_ann(spark):
    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    out = EV.lsh_probe_curve(df).collect()
    assert [r["n_flips"] for r in out] == [0, 2, 4, 8]
    rec = [r["recall_permille"] for r in out]
    # probe sets are nested -> recall is monotone non-decreasing
    assert rec == sorted(rec)
    assert all(r["n_truth"] == out[0]["n_truth"] for r in out)


def test_delete_impact_amplification_closed_form(spark, tmp_path):
    import pandas as pd
    p = tmp_path / "di"
    p.mkdir()
    # file f0: keys 0..9 (some hit h60%20==0), file f1: crafted no-hit keys
    import hashlib
    def hit(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 20 == 0
    miss_keys = [k for k in range(1000) if not hit(k)][:10]
    hit_keys = [k for k in range(1000) if hit(k)][:2]
    pd.DataFrame({"conv_id": [str(k) for k in miss_keys[:5] + hit_keys]}) \
        .to_parquet(p / "f0.parquet")
    pd.DataFrame({"conv_id": [str(k) for k in miss_keys[5:]]}) \
        .to_parquet(p / "f1.parquet")
    df = spark.read.parquet(str(p))
    got = {r["fname"]: (r["rows"], r["del_rows"], r["touched"],
                        r["amp_permille"])
           for r in OO.delete_impact_audit(df).collect()}
    assert got["f0.parquet"] == (7, 2, True, 3500)   # 7*1000//2
    assert got["f1.parquet"] == (5, 0, False, 0)


def test_boilerplate_source_matrix_counts_shared_segments(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s1"),  # segs: abg, dez
        (1, "alpha beta gamma other words here", "s2"),    # shares abg
        (2, "delta epsilon zeta trailing bits xx", "s2"),  # shares dez
        (3, "nothing in common at all here", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["src_a"], r["src_b"]): r["shared"]
           for r in TD.boilerplate_source_matrix(df).collect()}
    assert got == {("s1", "s2"): 2}
