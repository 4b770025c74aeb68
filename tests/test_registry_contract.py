"""Registry-wide driver-contract audit: every queries() entry must (a)
build a plan, (b) emit only hash-stable dtypes (the driver's value-hash
is type-sensitive: BIGINT/VARCHAR/BOOLEAN/DECIMAL only — raw doubles are
the one family that has ever failed a driver hash), and (c) carry a
matching oracle_sql() entry. Schema-only: plans are analyzed, never
executed, so the whole 258-query sweep stays cheap."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
ALLOWED = {"bigint", "int", "smallint", "tinyint", "string", "boolean",
           "decimal"}


def test_every_query_builds_with_hash_stable_schema_and_oracle(spark):
    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    bad_types, missing_oracle, broken = [], [], []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF)
        except Exception as ex:      # noqa: BLE001 — report, don't abort
            broken.append((name, str(ex)[:200]))
            continue
        for f, t in df.dtypes:
            if t.split("(")[0] not in ALLOWED:
                bad_types.append((name, f, t))
        if name not in oracles:
            missing_oracle.append(name)
    assert not broken, broken
    assert not bad_types, bad_types
    assert not missing_oracle, missing_oracle


def test_every_oracle_has_a_query(spark):
    import __spark_entry__ as E

    extra = set(E.oracle_sql()) - set(E.queries())
    assert not extra, extra
