"""Driver-style Spark-vs-DuckDB equality for every textops query.

Mirrors the correctness gate: run queries()[name] and oracle_sql()[name] on
the same parquet tables, sort columns by name and rows by value, compare
exactly (None-safe).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_CHECKED = [
    "json_flatten_events",
    "csv_parse_lineitem",
    "multiline_assemble_events",
    "delta_minute_metrics",
    "quality_score_documents",
    "lang_id_documents",
    "fingerprint_documents",
    "exact_dedup_documents",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup",
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ngram_jaccard_maxdf",
    "multimodal_features",
    "token_topk_documents",
    "sessionize_events",
    "scan_prune_recent",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in data]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_textops_oracle(name, spark, duck):
    import __spark_entry__ as E

    q = E.queries()[name]
    sql = E.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    a, b = _rows(scols, srows), _rows(dcols, drows)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert len(a) > 0, f"{name}: empty result is a vacuous test"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
