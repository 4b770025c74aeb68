"""Multi-way join analytics over the TPC-H-shaped tables.

The reference has no join engine beyond the IP range lookup (SURVEY §2.11) —
these are engine extensions (§2.12) proving the Catalyst side of the graft:
star-schema plans where the optimizer must broadcast every dimension, keep
the single fact×fact shuffle on the join key, and push the date/segment
filters into the parquet scans.

Cross-engine determinism: every money column is cast from DOUBLE to DECIMAL
before any arithmetic (the `broadcast_enrich_revenue` convention — double→
decimal rounding is half-up in both Spark and DuckDB for these non-negative
values), and all subsequent math is exact decimal, so the driver's typed
value-hash matches. Timestamps leave as epoch millis BIGINT.

Reference parity anchor: the reference's only aggregation surface is
counters (reference/src/main/java/io/sugo/collect/metrics/*); these queries
are additive coverage, cited in SURVEY §2.12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Filter constants sized for the synthetic sf tables (dates span 1995-2001).
PRICING_CUTOFF = "2000-01-01"
SHIP_SEGMENT = "BUILDING"
SHIP_DATE = "1998-01-01"
VOLUME_REGION = "ASIA"
VOLUME_FROM = "1996-01-01"
VOLUME_TO = "1997-01-01"
TOPK_ORDERS = 10


def _dec(col: str | Column, spec: str = "decimal(18,2)") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(spec)


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = PRICING_CUTOFF) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one partial-aggregating shuffle on
    the (returnflag, linestatus) key — 6 groups at any scale, so the reduce
    side is trivially small and the scan reads only 7 of 11 columns
    (column pruning) with the shipdate predicate pushed to parquet."""
    disc = _dec("l_discount", "decimal(5,4)")
    tax = _dec("l_tax", "decimal(5,4)")
    price = _dec("l_extendedprice")
    disc_price = price * (F.lit(1).cast("decimal(5,4)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(5,4)") + tax)
    return (lineitem
            .filter(F.col("l_shipdate") <= _ts(cutoff))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_dec("l_quantity")).cast("decimal(38,2)")
                  .alias("sum_qty"),
                 F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
                 F.sum(disc_price).cast("decimal(38,6)")
                  .alias("sum_disc_price"),
                 F.sum(charge).cast("decimal(38,10)").alias("sum_charge"),
                 F.count(F.lit(1)).alias("count_order")))


def sql_pricing_summary(table: str = "lineitem",
                        cutoff: str = PRICING_CUTOFF) -> str:
    return f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DECIMAL(38,2)) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(5,4))
                           - CAST(l_discount AS DECIMAL(5,4))))
                   AS DECIMAL(38,6)) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(5,4))
                           - CAST(l_discount AS DECIMAL(5,4)))
                        * (CAST(1 AS DECIMAL(5,4))
                           + CAST(l_tax AS DECIMAL(5,4))))
                   AS DECIMAL(38,10)) AS sum_charge,
               COUNT(*) AS count_order
        FROM {table}
        WHERE l_shipdate <= TIMESTAMP '{cutoff}'
        GROUP BY l_returnflag, l_linestatus
    """


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, segment: str = SHIP_SEGMENT,
                      date: str = SHIP_DATE, k: int = TOPK_ORDERS) -> DataFrame:
    """TPC-H Q3-shaped top-k revenue orders: the segment-filtered customer
    dim broadcasts into orders (no shuffle of the fact), the orders×lineitem
    join is the single key shuffle, and the top-k plans as
    TakeOrderedAndProject (per-partition heap + k·P driver merge — never a
    global sort). Ties break on o_orderkey so the k-set is deterministic."""
    c = customer.filter(F.col("c_mktsegment") == segment)
    o = orders.filter(F.col("o_orderdate") < _ts(date))
    li = lineitem.filter(F.col("l_shipdate") > _ts(date))
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast("decimal(5,4)") - _dec("l_discount", "decimal(5,4)")))
    j = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
          .join(li, li["l_orderkey"] == o["o_orderkey"]))
    # NTZ → session-UTC timestamp → epoch ms (the repo's ts convention)
    odate_ms = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000")
    return (j.groupBy("o_orderkey",
                      odate_ms.alias("o_orderdate_ms"),
                      "o_orderpriority")
             .agg(F.sum(rev).cast("decimal(38,6)").alias("revenue"))
             .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
             .limit(k))


def sql_shipping_priority(segment: str = SHIP_SEGMENT, date: str = SHIP_DATE,
                          k: int = TOPK_ORDERS) -> str:
    return f"""
        SELECT o.o_orderkey,
               CAST(epoch_ms(o.o_orderdate) AS BIGINT) AS o_orderdate_ms,
               o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(5,4))
                           - CAST(l.l_discount AS DECIMAL(5,4))))
                   AS DECIMAL(38,6)) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{segment}'
          AND o.o_orderdate < TIMESTAMP '{date}'
          AND l.l_shipdate > TIMESTAMP '{date}'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT {k}
    """


def local_supplier_volume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          region_name: str = VOLUME_REGION,
                          date_from: str = VOLUME_FROM,
                          date_to: str = VOLUME_TO) -> DataFrame:
    """TPC-H Q5-shaped per-nation revenue: a 6-way star where every
    dimension chain (region→nation→customer, supplier) broadcasts and the
    only shuffle is orders×lineitem on the orderkey. The local-supplier
    predicate (c_nationkey = s_nationkey) rides the supplier broadcast as a
    join condition, so no extra exchange appears."""
    r = region.filter(F.col("r_name") == region_name)
    o = orders.filter((F.col("o_orderdate") >= _ts(date_from))
                      & (F.col("o_orderdate") < _ts(date_to)))
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast("decimal(5,4)") - _dec("l_discount", "decimal(5,4)")))
    cdim = (customer
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey", "c_nationkey", "n_name"))
    j = (o.join(F.broadcast(cdim), F.col("o_custkey") == F.col("c_custkey"))
          .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
          .join(F.broadcast(supplier),
                (F.col("l_suppkey") == F.col("s_suppkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey"))))
    return (j.groupBy("n_name")
             .agg(F.sum(rev).cast("decimal(38,6)").alias("revenue"),
                  F.count(F.lit(1)).alias("n_items")))


def sql_local_supplier_volume(region_name: str = VOLUME_REGION,
                              date_from: str = VOLUME_FROM,
                              date_to: str = VOLUME_TO) -> str:
    return f"""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(5,4))
                           - CAST(l.l_discount AS DECIMAL(5,4))))
                   AS DECIMAL(38,6)) AS revenue,
               COUNT(*) AS n_items
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = '{region_name}'
          AND o.o_orderdate >= TIMESTAMP '{date_from}'
          AND o.o_orderdate < TIMESTAMP '{date_to}'
        GROUP BY n.n_name
    """
