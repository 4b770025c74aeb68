"""Co-located (bucketed) big×big join: plan-audited zero-shuffle evidence."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_collector_spark.plans import bucketing as bk

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))

    bk.write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                      "b_orders", "o_orderkey", 8,
                      path=str(tmp_path / "b_orders"))
    bk.write_bucketed(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey"),
                        "l_quantity"),
        "b_lineitem", "o_orderkey", 8,
        path=str(tmp_path / "b_lineitem"))
    try:
        joined = bk.bucketed_join(spark, "b_orders", "b_lineitem",
                                  "o_orderkey")
        # the join itself reads both bucketed layouts in place
        assert bk.exchange_count(joined) == 0, \
            "bucketed join must not shuffle either side"

        # correctness: equals the plain (shuffling) join
        plain = (orders.select("o_orderkey").hint("merge")
                 .join(lineitem.select(
                     F.col("l_orderkey").alias("o_orderkey")), "o_orderkey"))
        assert joined.count() == plain.count()
        assert bk.exchange_count(plain) > 0  # the contrast: unbucketed shuffles
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
