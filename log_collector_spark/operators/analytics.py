"""Multi-way join analytics over the TPC-H-shaped tables.

The reference has no join engine beyond the IP range lookup (SURVEY §2.11) —
these are engine extensions (§2.12) proving the Catalyst side of the graft:
star-schema plans where the optimizer must broadcast every dimension, keep
the single fact×fact shuffle on the join key, and push the date/segment
filters into the parquet scans.

Cross-engine determinism (round-4 revision): every money value becomes an
exact INTEGER at the scan edge and stays integer through the whole plan —
cents for prices (double → DECIMAL(18,2) → ×100 → BIGINT; the double→decimal
cast is half-up in both Spark and DuckDB for these non-negative values) and
basis points for rates (double → DECIMAL(6,4) → ×10000 → BIGINT).  Derived
money lands in micro-dollars (1e-6 $):

    disc_price_micros = price_cents * (10000 - disc_bp)            -- exact
    charge_micros     = disc_price_micros*(10000+tax_bp) DIV 10000 -- floor

The per-row floor (Spark `DIV` truncates, DuckDB `//` floors — identical on
these non-negative values) trades the last 1e-10-dollar digit for a BIGINT
surface the driver's type-sensitive value-hash can never misread; both
engines apply the same floor so equality is bit-exact.  All outputs carry a
deterministic total ORDER BY.

Scale note (100 TB): per-row micros ≤ ~1.1e11, so a BIGINT sum holds ~8e7
rows per group; beyond that widen the SUM operand to DECIMAL(38,0) (still
integer-valued, still hash-stable) — the plan shape is unchanged.

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


def _cents(col: str) -> Column:
    """Exact integer cents from a 2-decimal money double."""
    return (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")


def _bp(col: str) -> Column:
    """Exact integer basis points from a 4-decimal rate double."""
    return (F.col(col).cast("decimal(6,4)") * 10000).cast("bigint")


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


# SQL fragments mirroring _cents/_bp for the DuckDB oracles.
def _sql_cents(col: str) -> str:
    return f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _sql_bp(col: str) -> str:
    return f"CAST(CAST({col} AS DECIMAL(6,4)) * 10000 AS BIGINT)"


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = PRICING_CUTOFF) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one partial-aggregating shuffle on
    the (returnflag, linestatus) key — 6 groups at any scale, so the reduce
    side is trivially small and the scan reads only 7 of 11 columns
    (column pruning) with the shipdate predicate pushed to parquet."""
    base = (lineitem
            .filter(F.col("l_shipdate") <= _ts(cutoff))
            .select("l_returnflag", "l_linestatus",
                    F.col("l_quantity").cast("bigint").alias("qty"),
                    _cents("l_extendedprice").alias("price_c"),
                    _bp("l_discount").alias("disc_bp"),
                    _bp("l_tax").alias("tax_bp"))
            .withColumn("disc_u", F.col("price_c") * (10000 - F.col("disc_bp")))
            # `div` truncates toward zero == floor on these non-negatives,
            # matching DuckDB `//` exactly (per-row, so BIGINT never widens)
            .withColumn("charge_u",
                        F.expr("(disc_u * (10000 + tax_bp)) div 10000")))
    return (base
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("qty").alias("sum_qty"),
                 F.sum("price_c").alias("sum_base_price_cents"),
                 F.sum("disc_u").alias("sum_disc_price_micros"),
                 F.sum("charge_u").alias("sum_charge_micros"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def sql_pricing_summary(table: str = "lineitem",
                        cutoff: str = PRICING_CUTOFF) -> str:
    return f"""
        WITH base AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS BIGINT) AS qty,
                   {_sql_cents('l_extendedprice')} AS price_c,
                   {_sql_bp('l_discount')} AS disc_bp,
                   {_sql_bp('l_tax')} AS tax_bp
            FROM {table}
            WHERE l_shipdate <= TIMESTAMP '{cutoff}'
        )
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(qty) AS BIGINT) AS sum_qty,
               CAST(SUM(price_c) AS BIGINT) AS sum_base_price_cents,
               CAST(SUM(price_c * (10000 - disc_bp)) AS BIGINT)
                   AS sum_disc_price_micros,
               CAST(SUM((price_c * (10000 - disc_bp) * (10000 + tax_bp))
                        // 10000) AS BIGINT) AS sum_charge_micros,
               COUNT(*) AS count_order
        FROM base
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
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
    rev_u = _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))
    j = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
          .join(li, li["l_orderkey"] == o["o_orderkey"]))
    # NTZ → session-UTC timestamp → epoch ms (the repo's ts convention)
    odate_ms = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000")
    return (j.groupBy("o_orderkey",
                      odate_ms.alias("o_orderdate_ms"),
                      "o_orderpriority")
             .agg(F.sum(rev_u).alias("revenue_micros"))
             .orderBy(F.col("revenue_micros").desc(), F.col("o_orderkey"))
             .limit(k))


def sql_shipping_priority(segment: str = SHIP_SEGMENT, date: str = SHIP_DATE,
                          k: int = TOPK_ORDERS) -> str:
    rev_u = (f"{_sql_cents('l.l_extendedprice')}"
             f" * (10000 - {_sql_bp('l.l_discount')})")
    return f"""
        SELECT o.o_orderkey,
               CAST(epoch_ms(o.o_orderdate) AS BIGINT) AS o_orderdate_ms,
               o.o_orderpriority,
               CAST(SUM({rev_u}) AS BIGINT) AS revenue_micros
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{segment}'
          AND o.o_orderdate < TIMESTAMP '{date}'
          AND l.l_shipdate > TIMESTAMP '{date}'
        GROUP BY 1, 2, 3
        ORDER BY revenue_micros DESC, o.o_orderkey
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
    rev_u = _cents("l_extendedprice") * (F.lit(10000) - _bp("l_discount"))
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
             .agg(F.sum(rev_u).alias("revenue_micros"),
                  F.count(F.lit(1)).alias("n_items"))
             .orderBy("n_name"))


def sql_local_supplier_volume(region_name: str = VOLUME_REGION,
                              date_from: str = VOLUME_FROM,
                              date_to: str = VOLUME_TO) -> str:
    rev_u = (f"{_sql_cents('l.l_extendedprice')}"
             f" * (10000 - {_sql_bp('l.l_discount')})")
    return f"""
        SELECT n.n_name,
               CAST(SUM({rev_u}) AS BIGINT) AS revenue_micros,
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
        ORDER BY n.n_name
    """
