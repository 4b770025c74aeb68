"""Correctness AT scale: exact 10× identities on the sf1.0 replica set.

The stress fixture (scripts/make_sf.py) is built so several queries have
provable exact answers at sf1.0 in terms of their sf0.1 answers: the
per-replica alphabet rotation is a BIJECTION on texts (dup structure and
Jaccard similarities are invariant under any injective token map), key
spaces are disjoint, and facts replicate row-for-row. So:

- exact_dedup_documents: every count is exactly 10×,
- tpch_pricing_summary: same 6 groups, every sum/count exactly 10×,
- line_dedup_documents: corpus-wide first-occurrence selection happens
  independently per replica (rotated segments never collide across
  replicas on this corpus), so total segments/kept are exactly 10×.

This is the correctness face of the stress sweep (BASELINE.md): the
timing table shows the plans stay sub-12×; this shows the ANSWERS stay
exact when the input grows 10× — overflow, hash truncation, or
partition-order sensitivity anywhere in these paths would break the
identity. Data lives in /tmp and regenerates deterministically if absent.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/spark_graft_testdata/sf1.0"


@pytest.fixture(scope="module")
def sf10_dir():
    if not os.path.exists(os.path.join(SF10, "_GENERATED_10")):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "make_sf.py")],
            check=True, timeout=600)
    return SF10


def test_exact_dedup_counts_scale_exactly_10x(spark, sf10_dir):
    import __spark_entry__ as E
    q = E.queries()["exact_dedup_documents"]
    a = q(spark, SF01).collect()[0].asDict()
    b = q(spark, sf10_dir).collect()[0].asDict()
    assert a["n_dup_groups"] > 0  # non-vacuous: there ARE dups to count
    assert b == {k: 10 * v for k, v in a.items()}, (a, b)


def test_pricing_summary_scales_exactly_10x(spark, sf10_dir):
    import __spark_entry__ as E
    q = E.queries()["tpch_pricing_summary"]
    keys = ("l_returnflag", "l_linestatus")

    def by_group(sf):
        return {tuple(r[k] for k in keys): r.asDict()
                for r in q(spark, sf).collect()}
    a, b = by_group(SF01), by_group(sf10_dir)
    assert set(a) == set(b) and len(a) >= 4
    for g in a:
        for c, v in a[g].items():
            want = v if c in keys else 10 * v
            assert b[g][c] == want, (g, c, v, b[g][c])


def test_line_dedup_totals_scale_exactly_10x(spark, sf10_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    q = E.queries()["line_dedup_documents"]

    def totals(sf):
        return tuple(q(spark, sf).agg(
            F.sum("n_segments"), F.sum("n_kept")).collect()[0])
    a, b = totals(SF01), totals(sf10_dir)
    assert a[1] < a[0]  # non-vacuous: dedup actually dropped segments
    assert b == tuple(10 * x for x in a), (a, b)
