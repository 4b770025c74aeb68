"""Nearest-as-of join: tolerance cut-offs, tie->backward preference,
equal-ord inclusivity, and Spark-vs-DuckDB agreement of the union-tag
double sweep on the same crafted frames."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.operators.asof_nearest import (asof_nearest,
                                                        sql_asof_nearest)

L_ROWS = [(1, 10, "a"), (1, 14, "b"), (1, 25, "c"), (1, 12, "tie"),
          (1, 8, "eq"), (2, 5, "d")]
R_ROWS = [(1, 8, "r8"), (1, 16, "r16"), (2, 100, "far")]


def _spark_out(spark, tolerance=5):
    l = spark.createDataFrame(L_ROWS, "k int, t long, ev string")
    r = spark.createDataFrame(R_ROWS, "k int, t long, v string")
    out = asof_nearest(l, r, on="k", left_ord="t", right_ord="t",
                       value_cols=["v"], tolerance=tolerance)
    return sorted([(x["k"], x["ev"], x["v"], x["asof_dist"])
                   for x in out.collect()])


def _duck_out(tolerance=5):
    con = duckdb.connect()
    con.execute("CREATE TABLE lt(k INT, t BIGINT, ev VARCHAR)")
    con.executemany("INSERT INTO lt VALUES (?,?,?)", L_ROWS)
    con.execute("CREATE TABLE rt(k INT, t BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO rt VALUES (?,?,?)", R_ROWS)
    q = sql_asof_nearest("SELECT k, t, ev FROM lt", "SELECT k, t, v FROM rt",
                         on="k", left_ord="t", right_ord="t",
                         value_cols=["v"], tolerance=tolerance)
    return sorted([(k, ev, v, d) for k, _, ev, v, d in
                   con.execute(f"SELECT k, t, ev, v, asof_dist FROM ({q})")
                      .fetchall()])


def test_nearest_semantics(spark):
    got = dict(((k, ev), (v, d)) for k, ev, v, d in _spark_out(spark))
    assert got[(1, "a")] == ("r8", 2)      # prev 2 beats next 6(>tol)
    assert got[(1, "b")] == ("r16", 2)     # prev 6(>tol), next 2
    assert got[(1, "tie")] == ("r8", 4)    # 12: prev 4 == next 4 -> backward
    assert got[(1, "eq")] == ("r8", 0)     # equal ord matches inclusively
    assert got[(1, "c")] == (None, None)   # nothing within 5
    assert got[(2, "d")] == (None, None)   # key-local: far marker only


def test_spark_matches_duckdb_oracle(spark):
    for tol in (0, 2, 5, 100):
        assert _spark_out(spark, tol) == _duck_out(tol)


def test_clash_rejected(spark):
    l = spark.createDataFrame([(1, 1, "x")], "k int, t long, v string")
    r = spark.createDataFrame([(1, 1, "y")], "k int, t long, v string")
    with pytest.raises(ValueError):
        asof_nearest(l, r, on="k", left_ord="t", right_ord="t",
                     value_cols=["v"], tolerance=1)
