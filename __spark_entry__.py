"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→enrich→route→aggregate pipeline on
sf0.001 transcripts. ``queries()`` exposes one entry per implemented operator
from SURVEY.md §2; DuckDB-checkable ones have a matching ``oracle_sql()``
(same column names — the driver hashes values under sorted column names).

Conventions for oracle-checked queries: outputs use only BIGINT / VARCHAR /
BOOLEAN / DECIMAL columns (no raw doubles — float last-ulp differences across
engines would break value hashing); timestamps are returned as epoch millis.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log_collector_spark.grok.oracle import IpRangeLookup
from log_collector_spark.operators import aggregate as agg_ops
from log_collector_spark.operators import enrich as enrich_ops
from log_collector_spark.operators import parse as parse_ops
from log_collector_spark.operators import route as route_ops
from log_collector_spark.plans import pipeline as pl

MAX_SIZE = 8192


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcripts pipeline at sf0.001 → per-sink tallies
    joined with success/error counters (north_rule metric surface)."""
    routed = pl.full_pipeline(spark, "/root/testdata/sf0.001")
    return agg_ops.pipeline_metrics(routed, "directory")


# ---------------------------------------------------------------------------
# events-table helpers: synthesize DEMO-1-shaped log lines so the grok path
# is checkable against an independent DuckDB implementation
# ---------------------------------------------------------------------------

_NORMAL_LINE = None


def _event_line_col(ev: DataFrame):
    return F.concat(
        F.lit("["), ev["event_type"], F.lit("] ["),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit('] {"u":'), ev["user_id"].cast("string"), F.lit("}"))


def _event_line_with_faults(ev: DataFrame):
    """Deterministic malformation rules, mirrored in the oracle SQL:
    %211 → oversize, %97 → blank, %50 → malformed, else parseable."""
    return (
        F.when(ev["event_id"] % 211 == 0,
               F.concat(F.lit('[big] [2023-11-15 00:00:00] {"pad":"'),
                        F.repeat(F.lit("x"), 9000), F.lit('"}')))
        .when(ev["event_id"] % 97 == 0, F.lit(""))
        .when(ev["event_id"] % 50 == 0,
              F.concat(F.lit("corrupt#"), ev["event_id"].cast("string")))
        .otherwise(_event_line_col(ev))
    )


def _parse_events(spark: SparkSession, sf_dir: str, faults: bool) -> DataFrame:
    ev = _events(spark, sf_dir)
    line = _event_line_with_faults(ev) if faults else _event_line_col(ev)
    df = ev.select("event_id", "event_type", "user_id", "ts",
                   line.alias("text"))
    return parse_ops.grok_parse(df, pl.compiled_transcript_grok(),
                                max_size=MAX_SIZE)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_grok_parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6: vectorized grok parse (typed captures incl. date→epoch-ms)."""
    parsed = _parse_events(spark, sf_dir, faults=False)
    return parsed.select(
        F.col("event_id"),
        F.col("logtype"),
        F.col("logtime"),
        F.col("payload"),
    )


def q_route_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W4/F2/F3 + A6: sink decision table + per-sink tallies."""
    parsed = _parse_events(spark, sf_dir, faults=True)
    routed = route_ops.route(parsed, constant_source="events")
    return route_ops.sink_tallies(routed)


def q_success_error_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-source success/error counters (source = event_type)."""
    parsed = _parse_events(spark, sf_dir, faults=True)
    return agg_ops.success_error_counts(parsed, "event_type")


def q_minute_buckets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: ceil-minute event-time buckets over parsed logtime."""
    parsed = _parse_events(spark, sf_dir, faults=False)
    return agg_ops.minute_buckets(parsed, "logtime")


def q_broadcast_enrich_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: broadcast-join enrichment chain (orders→customer→nation→region)."""
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    r = _tbl(spark, sf_dir, "region")
    j = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
          .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
          .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]))
    return (j.groupBy(r["r_name"].alias("region_name"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("decimal(38,2)").alias("revenue")))


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shaped pricing summary: one 6-group partial-agg shuffle."""
    from log_collector_spark.operators import analytics as an
    return an.pricing_summary(_tbl(spark, sf_dir, "lineitem"))


def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped top-10 revenue orders: broadcast dim + TakeOrdered top-k."""
    from log_collector_spark.operators import analytics as an
    return an.shipping_priority(_tbl(spark, sf_dir, "customer"),
                                _tbl(spark, sf_dir, "orders"),
                                _tbl(spark, sf_dir, "lineitem"))


def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped 6-way star join: all dims broadcast, one fact shuffle."""
    from log_collector_spark.operators import analytics as an
    return an.local_supplier_volume(_tbl(spark, sf_dir, "region"),
                                    _tbl(spark, sf_dir, "nation"),
                                    _tbl(spark, sf_dir, "customer"),
                                    _tbl(spark, sf_dir, "supplier"),
                                    _tbl(spark, sf_dir, "orders"),
                                    _tbl(spark, sf_dir, "lineitem"))


def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped scan-bound revenue: all predicates pushed, no join."""
    from log_collector_spark.operators import analytics as an
    return an.forecast_revenue(_tbl(spark, sf_dir, "lineitem"))


def q_tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped promo permille per ship month: broadcast part dim."""
    from log_collector_spark.operators import analytics as an
    return an.promo_revenue_share(_tbl(spark, sf_dir, "lineitem"),
                                  _tbl(spark, sf_dir, "part"))


def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS via left-semi join with non-equi lateness check."""
    from log_collector_spark.operators import analytics as an
    return an.order_priority_counts(_tbl(spark, sf_dir, "orders"),
                                    _tbl(spark, sf_dir, "lineitem"))


def q_tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped HAVING-collapsed fact agg then dim joins, top-k."""
    from log_collector_spark.operators import analytics as an
    return an.large_order_customers(_tbl(spark, sf_dir, "customer"),
                                    _tbl(spark, sf_dir, "orders"),
                                    _tbl(spark, sf_dir, "lineitem"))


def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-revenue customer ranking: dims join ABOVE the
    custkey aggregation, top-k via TakeOrderedAndProject."""
    from log_collector_spark.operators import analytics as an
    return an.returned_item_customers(_tbl(spark, sf_dir, "customer"),
                                      _tbl(spark, sf_dir, "orders"),
                                      _tbl(spark, sf_dir, "lineitem"),
                                      _tbl(spark, sf_dir, "nation"))


def q_tpch_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped global-share filter: 1-row scalar broadcast, exact
    cross-multiplied threshold (no AVG/DIV rounding)."""
    from log_collector_spark.operators import analytics as an
    return an.supplier_revenue_share(_tbl(spark, sf_dir, "supplier"),
                                     _tbl(spark, sf_dir, "lineitem"))


def q_tpch_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped high/low-priority CASE-sum over late lines."""
    from log_collector_spark.operators import analytics as an
    return an.priority_class_lines(_tbl(spark, sf_dir, "orders"),
                                   _tbl(spark, sf_dir, "lineitem"))


def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped max-of-sums with tie surfacing (scalar MAX broadcast)."""
    from log_collector_spark.operators import analytics as an
    return an.top_supplier(_tbl(spark, sf_dir, "supplier"),
                           _tbl(spark, sf_dir, "lineitem"))


def q_tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped OR-of-ANDs residual predicate over a broadcast dim join."""
    from log_collector_spark.operators import analytics as an
    return an.disjunctive_revenue(_tbl(spark, sf_dir, "lineitem"),
                                  _tbl(spark, sf_dir, "part"))


def q_tpch_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped above-average-balance anti-join prospect report."""
    from log_collector_spark.operators import analytics as an
    return an.prospect_customers(_tbl(spark, sf_dir, "customer"),
                                 _tbl(spark, sf_dir, "orders"),
                                 _tbl(spark, sf_dir, "nation"))


def q_tpch_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped order-count distribution with the zero bucket preserved
    (LEFT OUTER + COUNT(col), double aggregation)."""
    from log_collector_spark.operators import analytics as an
    return an.order_count_distribution(_tbl(spark, sf_dir, "customer"),
                                       _tbl(spark, sf_dir, "orders"))


def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped decorrelated per-part average threshold (cross-multiplied
    — no division) over the brand-pruned fact."""
    from log_collector_spark.operators import analytics as an
    return an.small_quantity_revenue(_tbl(spark, sf_dir, "lineitem"),
                                     _tbl(spark, sf_dir, "part"))


def q_tpch_two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped symmetric two-nation trade volume per year."""
    from log_collector_spark.operators import analytics as an
    return an.two_nation_volume(_tbl(spark, sf_dir, "nation"),
                                _tbl(spark, sf_dir, "customer"),
                                _tbl(spark, sf_dir, "supplier"),
                                _tbl(spark, sf_dir, "orders"),
                                _tbl(spark, sf_dir, "lineitem"))


def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped unique-laggard suppliers: EXISTS + NOT EXISTS both
    decorrelated into aggregates (n_supps >= 2, n_at_max == 1)."""
    from log_collector_spark.operators import analytics as an
    return an.waiting_suppliers(_tbl(spark, sf_dir, "supplier"),
                                _tbl(spark, sf_dir, "orders"),
                                _tbl(spark, sf_dir, "lineitem"))


def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped national market share per year: the nation filter lives
    in a CASE inside the aggregate (the denominator keeps everyone)."""
    from log_collector_spark.operators import analytics as an
    return an.market_share(_tbl(spark, sf_dir, "region"),
                           _tbl(spark, sf_dir, "nation"),
                           _tbl(spark, sf_dir, "customer"),
                           _tbl(spark, sf_dir, "supplier"),
                           _tbl(spark, sf_dir, "orders"),
                           _tbl(spark, sf_dir, "lineitem"))


def q_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-frequency spectrum of the documents corpus (Zipf health)."""
    from log_collector_spark.textops import analysis as A
    return A.freq_spectrum(_docs(spark, sf_dir))


def q_churn_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retained/churned/acquired counts (set algebra as one
    shifted full-outer self-join of the distinct user-day frame)."""
    from log_collector_spark.operators import behavior as B
    return B.churn_matrix(_tbl(spark, sf_dir, "events"))


def q_top_users_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-rank top users WITH ties — the leaderboard cut LIMIT-k gets
    wrong (tied peers must all surface)."""
    from log_collector_spark.operators import behavior as B
    return B.top_users_with_ties(_tbl(spark, sf_dir, "events"))


def q_gmd_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini mean difference per event type via the sorted-weight
    closed form (O(n log n), never the pair join)."""
    from log_collector_spark.operators import behavior as B
    return B.gini_mean_difference(_tbl(spark, sf_dir, "events"))


def q_day_bitmask_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra: per-type-pair co-active days via
    bit_count over 63-bit day-presence words."""
    from log_collector_spark.operators import aggregate as agg
    return agg.day_bitmask_overlap(_tbl(spark, sf_dir, "events"))


def q_rle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE-compressibility audit: run counts of event_type under the
    clustered vs ingest orderings (the encoding-size decision)."""
    from log_collector_spark.operators.order import rle_audit
    return rle_audit(_tbl(spark, sf_dir, "events"))


def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile lift table: per-activity-decile conversion lift in
    permille (cross-multiplied — no rate division)."""
    from log_collector_spark.operators import behavior as B
    return B.decile_lift(_tbl(spark, sf_dir, "events"))


def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session bounce rate (1-event sessions permille, 30-min
    gap sessionization rule)."""
    from log_collector_spark.operators import behavior as B
    return B.bounce_rate(_tbl(spark, sf_dir, "events"))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted bottom-k sample (integer Efraimidis-
    Spirakis rank keys — RNG-free, append-stable)."""
    from log_collector_spark.textops import analysis as A
    return A.weighted_sample(_docs(spark, sf_dir))


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token-rate movers between two deterministic corpus halves
    (the snapshot-drift freshness monitor)."""
    from log_collector_spark.textops import analysis as A
    return A.vocab_drift(_docs(spark, sf_dir))


def q_sliding_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24h distinct-user gauge per hour from slid HLL registers
    (dense hour×register grid + range window — never rescans raw rows)."""
    from log_collector_spark.textops import analysis as A
    return A.sliding_hll_users(_tbl(spark, sf_dir, "events"))


IP_RANGE_ROWS = [
    # contiguous /16-ish ranges inside 10.0.0.0/8 (16 pipe-separated columns)
    "10.0.0.0|10.0.63.255|ZoneA|P1|C1|d|op|0|0|tz|tz|adm|1|A|AS|area1",
    "10.0.64.0|10.0.127.255|ZoneB|P2|C2|d|op|0|0|tz|tz|adm|2|B|EU|area2",
    "10.0.128.0|10.0.191.255|ZoneC|P3|C3|d|op|0|0|tz|tz|adm|3|C|NA|area3",
    "10.0.192.0|10.0.255.255|ZoneD|P4|C4|d|op|0|0|tz|tz|adm|4|D|SA|area4",
]


def q_ip_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: range-lookup join (searchsorted over broadcast sorted ranges)."""
    ev = _events(spark, sf_dir)
    ip = F.concat(F.lit("10.0."),
                  F.expr("user_id % 256").cast("string"),
                  F.lit("."), F.expr("event_id % 256").cast("string"))
    df = ev.select("event_id", ip.alias("ip"))
    lut = IpRangeLookup(IP_RANGE_ROWS, need_fields={"sugo_nation"})
    out = enrich_ops.ip_range_enrich(df, lut, "ip", fields=["sugo_nation"])
    return out.groupBy("sugo_nation").agg(F.count(F.lit(1)).alias("n"))


def q_window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 window funcs: per-user ordered lag + rank (stable ordering)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id", "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
    )


def q_conversation_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-ish per-'conversation' (user) aggregates with epoch-ms extrema."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.expr("unix_micros(cast(ts as timestamp)) div 1000")).alias("first_ms"),
        F.max(F.expr("unix_micros(cast(ts as timestamp)) div 1000")).alias("last_ms"),
        F.countDistinct("event_type").alias("n_types"),
    )

_ROUTED_SLIM_CACHE: dict = {}


def _routed_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-once / aggregate-many for the tx_* suite: the routed
    transcripts frame MINUS the two wide string columns (`text`,
    `parsed_json`), persisted per (session, sf_dir). This is the
    100-TB architecture (the parse lands once in a table; every
    aggregate reads it) made safe in-session: the slim frame caches at
    ~130 MB/1.2M turns and every downstream agg is sub-second, where
    persisting the FULL frame (wide strings included) cost more than
    each query's own column-pruned fresh parse (measured; see working
    notes). The two queries that need `text`/`parsed_json`
    (tx_redundancy, tx_per_turn_json) keep the fresh full plan, as do
    the flagship `entry()` and the bench throughput job.

    Keyed by (applicationId, sf_dir) — NOT id(spark): CPython reuses
    object ids, and keying by id also pinned dead sessions alive
    (VERDICT/ADVICE r4). Entries whose SparkContext has stopped are
    evicted on every access; `clear_routed_slim()` unpersists everything
    (call between scale factors or at session teardown)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    for k in [k for k, (s, _) in _ROUTED_SLIM_CACHE.items()
              if s.sparkContext._jsc is None or s.sparkContext._jsc.sc().isStopped()]:
        del _ROUTED_SLIM_CACHE[k]
    hit = _ROUTED_SLIM_CACHE.get(key)
    if hit is None:
        df = (pl.full_pipeline(spark, sf_dir)
              .drop("text", "parsed_json").persist())
        _ROUTED_SLIM_CACHE[key] = (spark, df)
        return df
    return hit[1]


def clear_routed_slim() -> None:
    """Unpersist and drop every cached slim frame (live sessions only);
    the eviction hook the r4 ADVICE asked for — mirrors
    dedup.unpersist_shingles / evalops.unpersist_eval."""
    for spark, df in _ROUTED_SLIM_CACHE.values():
        try:
            if spark.sparkContext._jsc is not None and \
                    not spark.sparkContext._jsc.sc().isStopped():
                df.unpersist()
        except Exception:
            pass  # a dead JVM during teardown must not mask the clear
    _ROUTED_SLIM_CACHE.clear()


def q_tx_sink_tallies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transcripts pipeline routed-row tallies (pytest holds the strong
    byte-equality oracle; driver records rows-only here)."""
    routed = _routed_slim(spark, sf_dir)
    return route_ops.sink_tallies(routed)


def q_tx_tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool latency profile over the ROUTED frame (full parse→enrich→
    route path under the hash): one hash agg, JVM json-path extraction."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tool_latency(_routed_slim(spark, sf_dir))


def q_tx_role_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation same-role-adjacency report under stable
    (conv_id, turn_idx) order — dialog-structure QA, one shuffle."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.role_alternation(_routed_slim(spark, sf_dir))


def q_tx_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation turn counts / span / role mix over routed rows."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.conversation_stats_ms(_routed_slim(spark, sf_dir))


def q_tx_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule conversation sessionization (batch twin of the
    transformWithState streaming sessionizer): sessions split where the
    inter-turn gap exceeds 2 minutes; per-session turn/tool-call counts
    and epoch-ms bounds."""
    from log_collector_spark.streaming.conversation_state import gap_sessions
    return gap_sessions(pl.load_transcripts(spark, sf_dir))


def q_tx_tokens_by_role_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token totals per role CLASS — exercises the role broadcast lookup
    (left-join misses surface as a NULL class group)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tokens_by_role_class(_routed_slim(spark, sf_dir))


def q_tx_response_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant response-latency per conversation (user→assistant adjacent
    pairs under stable turn order) over the routed frame."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.response_gaps(_routed_slim(spark, sf_dir))


def q_tx_tool_chain_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-call transition counts on adjacent tool turns (workflow mining
    over agent transcripts)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tool_chain_bigrams(_routed_slim(spark, sf_dir))


def q_tx_tool_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation tool mix: distinct tools + dominant-tool permille
    (loop detection) over the routed frame."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tool_diversity(_routed_slim(spark, sf_dir))


def q_tx_role_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role→role transition matrix over stable turn order (structure
    fingerprint of the dialog corpus)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.role_matrix(_routed_slim(spark, sf_dir))


def q_tx_first_response_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-first-assistant-response per conversation (SLA metric)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.first_response_ms(_routed_slim(spark, sf_dir))


def q_tx_latency_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation latency inversion count: O(n log n) BIT kernel in
    applyInPandas, verified against the O(n^2) pair-join oracle."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.latency_inversions(_routed_slim(spark, sf_dir))


def q_tx_peak_inflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max-overlap: peak concurrent tool calls per conversation
    (half-open intervals; -1 sorts before +1 at equal instants)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.peak_inflight(_routed_slim(spark, sf_dir))


def q_tx_slow_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max consecutive-slow-turn run per conversation (gaps-and-islands,
    one conv_id exchange) over the routed frame."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.slow_streaks(_routed_slim(spark, sf_dir))


def q_tx_context_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation point per conversation: running token
    prefix sums in stable turn order, budget overflow turn."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.context_cutoff(_routed_slim(spark, sf_dir))


def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram per user stream (power-of-2 µs buckets) —
    the evidence behind the sessionize/watermark threshold choice."""
    from log_collector_spark.operators import behavior as B
    return B.gap_histogram(_tbl(spark, sf_dir, "events"))


def q_ri_audit_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over five FK edges (star schema +
    events→customer + transcript role→lookup, the last with real ~1%
    orphans from unknown roles)."""
    from log_collector_spark.operators import behavior as B
    li = _tbl(spark, sf_dir, "lineitem")
    od = _tbl(spark, sf_dir, "orders")
    cu = _tbl(spark, sf_dir, "customer")
    pt = _tbl(spark, sf_dir, "part")
    role_lut, _ = pl.lookups(spark)
    edges = [
        ("events_user_customer",
         _tbl(spark, sf_dir, "events").select("user_id"),
         cu.select("c_custkey")),
        ("lineitem_orders", li.select("l_orderkey"),
         od.select("o_orderkey")),
        ("lineitem_part", li.select("l_partkey"), pt.select("p_partkey")),
        ("orders_customer", od.select("o_custkey"), cu.select("c_custkey")),
        ("tx_role_lookup",
         pl.load_transcripts(spark, sf_dir).select("role"),
         role_lut.select("role")),
    ]
    return B.ri_audit(edges)


def q_compaction_plan_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan over the transcripts directory:
    cumulative-quota packing of name-ordered files into ~target-byte
    output groups (metadata-scale window over per-file stats)."""
    from log_collector_spark.operators.order import compaction_plan
    return compaction_plan(pl.load_transcripts(spark, sf_dir))


def q_join_forecast_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact output-size + skew forecast for the transcripts conv_id
    self-join — the pre-flight that justifies ordered_salted's salting
    (the hot conversation shows up as max_key_permille)."""
    from log_collector_spark.operators import aggregate as agg
    tx_df = pl.load_transcripts(spark, sf_dir)
    return agg.join_size_forecast(tx_df, F.col("conv_id"),
                                  tx_df, F.col("conv_id"))


def q_fingerprint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day row-multiset fingerprint of the events table (count + XOR +
    modular sum of 60-bit row hashes) — the replica-drift detector."""
    from log_collector_spark.operators import behavior as B
    ev = _tbl(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    day = (us - us % 86_400_000_000) / 86_400_000_000
    row = F.concat_ws("|", "event_id", "user_id", "event_type",
                      us.cast("string"))
    return B.table_fingerprint(ev, day, row)


def q_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gini of events-per-user via the histogram form (no
    global sort — ranks from the tiny distinct-count-value frame)."""
    from log_collector_spark.operators import behavior as B
    return B.activity_gini(_tbl(spark, sf_dir, "events"))


def q_tx_per_turn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn Gson-equal serialized records under stable ordering."""
    routed = pl.full_pipeline(spark, sf_dir)   # needs parsed_json (wide)
    from log_collector_spark.operators.order import ordered_salted
    return ordered_salted(
        routed.filter(F.col("parse_ok") & ~F.col("is_oversize"))
              .select("conv_id", "turn_idx", "parsed_json"))


def q_per_file_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-file line/error totals (DefaultFileReader.java:246-248) over
    the real scanned file identity (input_file_name), basename-normalized so
    the DuckDB oracle (read_parquet filename=true) can mirror it."""
    df = pl.load_transcripts(spark, sf_dir).withColumn(
        "fname", F.element_at(F.split(F.input_file_name(), "/"), -1))
    parsed = parse_ops.grok_parse(df, pl.compiled_transcript_grok(),
                                  max_size=MAX_SIZE)
    return agg_ops.per_file_totals(parsed, "fname")


def q_ngram_jaccard_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with the hot-shingle guard ON (max_df): the web-scale
    configuration — ubiquitous shingles are dropped from the inverted index
    before the self-join, capping per-key join fan-out at max_df²."""
    from log_collector_spark.textops import dedup as D
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), max_df=D.NGRAM_MAX_DF)


def q_scan_prune_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: partition/row-group pruning — time-range predicate pushed to the
    scan (the reference's directory-expiry skip, DefaultFileReader.java:
    117-134, expressed declaratively; test_plans asserts PushedFilters)."""
    ev = _events(spark, sf_dir)
    cutoff = "2023-11-17 00:00:00"
    return (ev.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min(F.expr(
                       "unix_micros(date_trunc('second', ts)) div 1000"))
                   .cast("long").alias("first_ms")))


def q_json_flatten_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: ``;json``-typed capture — Gson parse + one-level flatten into the
    record (Converter.java:235-270, Match.java:185-187; JSON numbers become
    Doubles, so u=42 serializes as 42.0). Exercises the parser's dynamic-key
    slow path; equality is on the Gson-serialized record."""
    from log_collector_spark.grok.compiler import GrokCompiler
    from log_collector_spark.operators import parse as p_ops
    ev = _events(spark, sf_dir)
    line = F.concat(
        F.lit("["), ev["event_type"], F.lit("] ["),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit('] {"u":'), ev["user_id"].cast("string"), F.lit(',"k":"v"}'))
    df = ev.select("event_id", line.alias("text"))
    expr = (r"\[%{NOTSPACE:logtype}\] "
            r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
            r"%{JSON:payload;json}")
    parsed = p_ops.grok_parse(df, GrokCompiler().compile(expr),
                              max_size=MAX_SIZE)
    return parsed.select("event_id", "parsed_json")


def q_csv_parse_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: CSV split + typed dimensions with defaults (CSVParser.java:57-78).

    Lines are synthesized from lineitem columns (orderkey,lineno,flag,ship);
    %5 rows carry a blank flag (→ default 'X'), %13 rows are truncated to two
    fields (absent → default/dropped). The oracle recomputes the expected
    typed values straight from the source columns (generation ground truth).
    """
    from log_collector_spark.operators.csv import CsvDimension, csv_parse
    li = _tbl(spark, sf_dir, "lineitem")
    flag = F.when(F.col("l_linenumber") % 5 == 0, F.lit("")) \
            .otherwise(F.col("l_returnflag"))
    full = F.concat_ws(
        ",", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"), flag,
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"))
    short = F.concat_ws(",", F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"))
    line = F.when(F.col("l_orderkey") % 13 == 0, short).otherwise(full)
    df = li.select(F.col("l_orderkey").alias("src_key"),
                   F.col("l_linenumber").alias("src_line"),
                   line.alias("text"))
    dims = [CsvDimension("okey", "long"),
            CsvDimension("lineno", "int"),
            CsvDimension("flag", "string", default="X"),
            CsvDimension("ship", "date", format="yyyy-MM-dd HH:mm:ss")]
    out = csv_parse(df, dims)
    return out.select("src_key", "src_line", "okey",
                      F.col("lineno").cast("int").alias("lineno"),
                      "flag", "ship", "csv_ok")


def q_multiline_assemble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: multi-line record assembly (window-sum record ids, no-separator
    concat — MultiLineFileReader.java:309-358). Lines synthesized from
    events: every event is a first line; %5 events add two continuation
    lines; %11 events add a blank line (skipped)."""
    from log_collector_spark.operators.multiline import assemble
    ev = _events(spark, sf_dir)
    first = F.concat(F.lit("["), ev["event_type"], F.lit("] e"),
                     ev["event_id"].cast("string"))
    cont1 = F.when(ev["event_id"] % 5 == 0,
                   F.concat(F.lit("  at frame/"), ev["event_id"].cast("string")))
    cont2 = F.when(ev["event_id"] % 5 == 0, F.lit("  at deeper/frame"))
    blank = F.when(ev["event_id"] % 11 == 0, F.lit(""))
    lines = ev.select(
        F.concat(F.lit("f"), (ev["event_id"] % 4).cast("string")).alias("filename"),
        F.explode(F.array(
            F.struct((ev["event_id"] * 4).alias("line_no"), first.alias("text")),
            F.struct((ev["event_id"] * 4 + 1).alias("line_no"), cont1.alias("text")),
            F.struct((ev["event_id"] * 4 + 2).alias("line_no"), cont2.alias("text")),
            F.struct((ev["event_id"] * 4 + 3).alias("line_no"), blank.alias("text")),
        )).alias("l"),
    ).select("filename", "l.line_no", "l.text").filter(F.col("text").isNotNull())
    return assemble(lines, r"\[.*")


def q_delta_minute_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: delta (incremental) metric emission — current minus previous
    bucket (ReaderMetrics.java:41-83), batch analog via lag window."""
    ev = _events(spark, sf_dir)
    bucket = (F.ceil(F.unix_micros(F.date_trunc("second",
                                                F.col("ts").cast("timestamp"))) /
                     F.lit(60000000.0)) * 60000).cast("long")
    counts = (ev.groupBy(bucket.alias("bucket_ms"))
                .agg(F.count(F.lit(1)).alias("n"))
                .withColumn("day_id", (F.col("bucket_ms") /
                                       F.lit(86_400_000)).cast("long")))
    # Scale-safe lag: partition the window by day (bounded partitions at any
    # time range) and carry the previous bucket across day boundaries via a
    # tiny per-day-last table (one row per day-with-data, broadcast).
    per_day_last = counts.groupBy("day_id").agg(
        F.max(F.struct("bucket_ms", "n")).alias("m"))
    # pmod(hash,1): constant-valued, non-foldable partition key (see
    # token_topk — lit(0) and col*0 both get optimized to an empty spec)
    wl = Window.partitionBy(F.pmod(F.xxhash64("day_id"), F.lit(1))) \
        .orderBy("day_id")
    prevs = per_day_last.select(
        "day_id", F.lag(F.col("m.n")).over(wl).alias("prev_last_n"))
    w = Window.partitionBy("day_id").orderBy("bucket_ms")
    return (counts.join(F.broadcast(prevs), "day_id", "left")
            .select("bucket_ms", "n",
                    (F.col("n") - F.coalesce(F.lag("n").over(w),
                                             F.col("prev_last_n"), F.lit(0)))
                    .cast("long").alias("delta")))


# ---------------------------------------------------------------------------
# training-data operators over documents/embeddings (textops package)
# ---------------------------------------------------------------------------

def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan yields fewer partitions than cores.

    The sandbox tables are single parquet files (one split → every textops
    query runs as one task, wasting 31 cores). A real 100 TB corpus arrives
    as thousands of files, the guard is false, and no shuffle happens — this
    is a small-input fix, not a pipeline stage.
    """
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")))


def q_quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality features + keep/drop flag (pretraining filter)."""
    from log_collector_spark.textops import analysis as A
    return A.quality_features(_docs(spark, sf_dir))


def q_lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/CJK language-ID heuristic."""
    from log_collector_spark.textops import analysis as A
    return A.lang_id(_docs(spark, sf_dir))


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang-ID heuristic vs the gold lang label
    (diagonal row_permille = per-language recall)."""
    from log_collector_spark.textops import analysis as A
    return A.lang_id_confusion(_docs(spark, sf_dir))


def q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 + 60-bit document fingerprints."""
    from log_collector_spark.textops import analysis as A
    return A.fingerprint(_docs(spark, sf_dir))


def q_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by salted id hash —
    stable under corpus growth, shuffle-free (unlike randomSplit)."""
    from log_collector_spark.textops import analysis as A
    return A.split_assign(_docs(spark, sf_dir)).select(
        "doc_id", "split_bucket", "split")


def q_domain_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap by salted-hash rank (domain mixing): deterministic
    uniform sample within each domain, one shuffle on source."""
    from log_collector_spark.textops import analysis as A
    return A.domain_cap(_docs(spark, sf_dir), cap=10).select(
        "doc_id", "source", "rk", "kept")


def q_decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag train docs (doc_id % 50 != 0) sharing
    any 8-gram with the synthetic eval slice (doc_id % 50 == 0)."""
    from pyspark.sql import functions as F
    from log_collector_spark.textops import dedup as D
    docs = _docs(spark, sf_dir)
    return D.decontaminate(docs.filter(F.col("doc_id") % 50 != 0),
                           docs.filter(F.col("doc_id") % 50 == 0))


def q_repetition_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition: duplicate/top bigram permille."""
    from log_collector_spark.textops import analysis as A
    return A.repetition_signals(_docs(spark, sf_dir))


def q_vocab_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary stats: docs, tokens, vocab size, TTR permille."""
    from log_collector_spark.textops import analysis as A
    return A.vocab_stats(_docs(spark, sf_dir))


def q_pii_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PII-class regex counts over the props payload."""
    from log_collector_spark.textops import analysis as A
    return A.pii_scan(_events(spark, sf_dir))


def q_boilerplate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus boilerplate: 3-word segments in >= 3 distinct docs."""
    from log_collector_spark.textops import dedup as D
    return D.boilerplate_segments(_docs(spark, sf_dir))


def q_kmv_distinct_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV distinct-token sketch vs exact, with error permille."""
    from log_collector_spark.textops import analysis as A
    return A.kmv_distinct(_docs(spark, sf_dir))


def q_kmv_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source Jaccard from KMV union sketches (k longs per source
    shuffle, then driver-scale pair algebra) vs the exact baseline."""
    from log_collector_spark.textops import analysis as A
    return A.kmv_overlap(_docs(spark, sf_dir))


def q_top_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 tokens: (group, token) partial agg + rank window."""
    from log_collector_spark.textops import analysis as A
    return A.top_terms_per_source(_docs(spark, sf_dir))


def q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary via fingerprint hash-groupBy."""
    from log_collector_spark.textops import dedup as D
    return D.exact_dedup_summary(_docs(spark, sf_dir))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: 3-gram shingle Jaccard >= 0.3, inverted-index join."""
    from log_collector_spark.textops import dedup as D
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms) + LSH(4 bands) candidates, exactly verified."""
    from log_collector_spark.textops import dedup as D
    return D.minhash_lsh_pairs(_docs(spark, sf_dir))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over MinHash near-dup pairs → one canonical
    doc per component (min-label propagation to fixpoint)."""
    from log_collector_spark.textops import dedup as D
    return D.dedup_clusters(_docs(spark, sf_dir))


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(log n)-round connected components (large-star/small-star) — the
    diameter-robust CC; same output contract as dedup_clusters."""
    from log_collector_spark.textops import dedup as D
    return D.dedup_clusters_star(_docs(spark, sf_dir))


def q_keep_best_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST canonicalization per near-dup cluster (keep-longest rule,
    packed-int64 argmax — engine-order-free)."""
    from log_collector_spark.textops import dedup as D
    return D.keep_best_per_cluster(_docs(spark, sf_dir))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 pairs within hamming<=3 via lossless 15-bit-band blocking
    (4 bands × 32,768 keys — the Manku-et-al web-corpus configuration)."""
    from log_collector_spark.textops import dedup as D
    return D.simhash_pairs(_docs(spark, sf_dir))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH bucket + integer-cosine verify.
    The scale-safe GUARDED variant (overfull buckets sub-split with the full
    8-plane key — the max_df analog for the embedding family) is the public
    default; the unguarded 4-plane form is a pytest-only oracle baseline."""
    from log_collector_spark.textops import dedup as D
    return D.embedding_neardup_pairs(_embs(spark, sf_dir))


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling the train/val/test hash split — the
    eval-contamination audit run after splitting, before training."""
    from log_collector_spark.textops import dedup as D
    return D.split_leakage(_embs(spark, sf_dir))


def q_cluster_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free splitting: hash split at near-dup cluster granularity —
    duplicate families never straddle train/val/test (the remedy for
    what split_leakage audits)."""
    from log_collector_spark.textops import dedup as D
    return D.cluster_split_assign(_embs(spark, sf_dir))


def q_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-label vs own label: mislabeled-example screen."""
    from log_collector_spark.textops import similarity as S
    return S.knn_label_consistency(_embs(spark, sf_dir))


def q_ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (broadcast queries, windowed rank)."""
    from log_collector_spark.textops import similarity as S
    return S.brute_force_topk(_embs(spark, sf_dir))


def q_ann_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the LSH ANN index vs brute-force ground truth
    (textops/evalops.py — the published quality metric of the index)."""
    from log_collector_spark.textops import evalops as EV
    return EV.ann_recall(_embs(spark, sf_dir))


def q_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash sketch calibration: estimated vs exact Jaccard per LSH
    candidate pair (threshold-free — rejected pairs included)."""
    from log_collector_spark.textops import evalops as EV
    return EV.minhash_estimate_error(_docs(spark, sf_dir))


def q_ivf_balance_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-population skew report (hot cell = hot partition at scale)."""
    from log_collector_spark.textops import evalops as EV
    return EV.ivf_balance(_embs(spark, sf_dir))


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chars-per-token fertility (tokenizer-change gate)."""
    from log_collector_spark.textops import evalops as EV
    return EV.tokenizer_fertility(_docs(spark, sf_dir))


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, shard) sequence-packing waste report."""
    from log_collector_spark.textops import evalops as EV
    return EV.packing_efficiency(_docs(spark, sf_dir))


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k with Hamming-1 multiprobe."""
    from log_collector_spark.textops import similarity as S
    return S.lsh_ann_topk(_embs(spark, sf_dir))


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-k: fixed coarse-quantizer cells + nprobe probing,
    exact integer-dot re-rank (partition-prunable corpus layout at scale)."""
    from log_collector_spark.textops import similarity as S
    return S.ivf_ann_topk(_embs(spark, sf_dir))


def q_ann_topk_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the LSH and IVF ANN paths — union recall
    at top-k cost, integer-micros scores, no cross-ranker calibration."""
    from log_collector_spark.textops import similarity as S
    return S.rrf_fusion_topk(_embs(spark, sf_dir))


def q_ann_topk_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: PQ-compressed ANN scan — probed coarse cells, candidates
    scored from the packed 8-byte PQ code via a per-query 128-entry LUT
    (asymmetric distance); full vectors never touched on the corpus side."""
    from log_collector_spark.textops import similarity as S
    return S.ivfadc_ann_topk(_embs(spark, sf_dir))


def q_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k decomposition of the compressed IVFADC scan: exact-L2
    ground truth vs probed-cells ceiling vs ADC ranking — isolates
    coarse-quantizer loss from PQ compression loss per query."""
    from log_collector_spark.textops import evalops as EV
    return EV.ivfadc_recall(_embs(spark, sf_dir))


def q_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve: micro-averaged recall@k at nprobe = 1, 2, 3 vs
    the exact brute-force top-k (what each extra probe buys)."""
    from log_collector_spark.textops import evalops as EV
    return EV.ivf_nprobe_curve(_embs(spark, sf_dir))


def q_token_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: exact top-20 corpus tokens (explode → count → rank,
    ties broken lexicographically). The map-side partial aggregation makes
    this one small shuffle of (token, count) partials at any corpus size."""
    from log_collector_spark.textops import common as C
    docs = _docs(spark, sf_dir)
    counts = (docs.select(F.explode(C.tokens(F.col("text"))).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    # orderBy+limit plans as TakeOrderedAndProject: per-partition top-20 then
    # a 20*P-row driver merge — never a single-partition sort of the whole
    # vocabulary (10^8-10^9 rows at corpus scale). Rank is then assigned over
    # the 20 survivors; the partition key is a constant-valued but
    # NON-FOLDABLE zero (pmod(hash,1)) — lit(0) is constant-folded (and n*0
    # zero-propagated) away, and WindowExec then takes the warned
    # unpartitioned-global-window path.
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(20)
    w = Window.partitionBy(F.pmod(F.xxhash64("token"), F.lit(1))) \
        .orderBy(F.desc("n"), F.asc("token"))
    return (top.withColumn("rank", F.row_number().over(w))
               .select("token", "n", F.col("rank").cast("int").alias("rank")))


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (30-minute inactivity gap): lag +
    running sum of session-starts — the conversation-analytics op a
    transcript pipeline needs; one shuffle on user_id."""
    ev = _events(spark, sf_dir)
    ts_s = F.unix_micros(F.date_trunc("second", F.col("ts").cast("timestamp"))) \
        .cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1000000), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0))
    base = ev.select("user_id", "event_id", "ts", sess.alias("session_id"))
    return (base.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event"))
            .withColumn("session_id", F.col("session_id").cast("long")))


def q_session_depth_histogram(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Power-of-2 histogram of session depths (events per 30-min-gap
    session): the engagement-shape distribution — how much of the stream
    sits in drive-by singleton sessions vs deep sessions. Reuses the
    sessionize frame; the histogram rollup runs on |sessions| rows."""
    from log_collector_spark.textops import common as TC
    sess = q_sessionize_events(spark, sf_dir)
    bucket = F.length(F.bin(F.col("n_events"))).cast("long")
    per = (sess.groupBy(bucket.alias("depth_bucket"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
                F.sum("n_events").cast("long").alias("n_events")))
    tot = per.agg(F.sum("n_events").alias("t"))
    return (per.crossJoin(F.broadcast(tot))
            .select("depth_bucket", "n_sessions", "n_events",
                    TC.permille(F.col("n_events"), F.col("t"))
                    .alias("event_share_permille"))
            .orderBy("depth_bucket"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → mapInPandas feature extraction (stub decode)."""
    from log_collector_spark.textops import multimodal as M
    return M.fake_features(M.media_from_documents(_docs(spark, sf_dir)))


def q_twa_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event_type (step interpolation,
    integer cents x ms weights — the billing/SLO statistic)."""
    from log_collector_spark.operators import behavior as B
    return B.twa_value(_tbl(spark, sf_dir, "events"))


def q_inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token inverted-index dictionary rows: exact df/postings counts
    for every token; posting-list fingerprint only under max_df (the hot
    stop-word posting list never materializes as one shuffle value)."""
    from log_collector_spark.textops import indexing as IX
    return IX.inverted_index_stats(_docs(spark, sf_dir))


def q_neardup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two degree histogram of the MinHash near-dup graph (the
    dedup blast-radius / mega-cluster early-warning report)."""
    from log_collector_spark.textops import evalops as EV
    return EV.neardup_degree_histogram(_docs(spark, sf_dir))


def q_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One damped PageRank power iteration over the near-dup graph in
    fixed-point integers (template/hub-document centrality)."""
    from log_collector_spark.textops import evalops as EV
    return EV.pagerank_step(_docs(spark, sf_dir))


def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability: hourly distinct-user registers MAXed up to daily
    estimates (sketches merged, never rebuilt from raw rows)."""
    from log_collector_spark.textops import analysis as A
    return A.hll_user_rollup(_tbl(spark, sf_dir, "events"))


def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-proxy quality score: mean corpus-bigram surprisal in millibits
    (bit-length log — identical bin() semantics both engines)."""
    from log_collector_spark.textops import lm_proxy as LM
    return LM.bigram_surprisal(_docs(spark, sf_dir))


def q_mean_shift_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-window CUSUM volume-shift score per (event_type, hour) — RANGE
    frames over the epoch-hour index, gaps count as zero volume."""
    from log_collector_spark.operators import changepoint as CP
    return CP.mean_shift_hours(_tbl(spark, sf_dir, "events"))


def q_decode_wav_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pure-Python WAV codec: encode(doc_id) → binary column →
    mapInPandas RIFF/PCM parse → integer sample stats. The oracle recomputes
    the stats from doc_id arithmetic, so encoder/decoder byte-layout
    disagreement fails the value hash (VERDICT r3 item 8)."""
    from log_collector_spark.textops import multimodal as M
    return M.decode_wav_features(
        M.media_wav_from_documents(_docs(spark, sf_dir)))


def q_decode_ppm_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pure-Python PPM (P6) codec: encode → binary → header-tokenizing
    parse → integer pixel stats, oracle-checked from doc_id arithmetic."""
    from log_collector_spark.textops import multimodal as M
    return M.decode_ppm_features(
        M.media_ppm_from_documents(_docs(spark, sf_dir)))


def q_decode_png_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pure-Python PNG codec (stdlib zlib only): encode(doc_id) with
    per-row cycling filter types → binary column → mapInPandas chunk
    walk + CRC check + inflate + 5-filter reconstruction → integer pixel
    stats. Oracle recomputes from doc_id arithmetic, codec-free — a
    filter/inflate bug anywhere fails the value hash (VERDICT r4 #3:
    the last multimodal stub retired)."""
    from log_collector_spark.textops import multimodal as M
    return M.decode_png_features(
        M.media_png_from_documents(_docs(spark, sf_dir))).orderBy("media_id")


def q_png_ahash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aHash over the decoded PNG column — bit-identical to the PPM
    path's hash for the same image (the re-encode-dedup property),
    oracle from pixel arithmetic."""
    from log_collector_spark.textops import multimodal as M
    return M.ahash_png_features(
        M.media_png_from_documents(_docs(spark, sf_dir))).orderBy("media_id")


def q_asof_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the most recent prior 'profile update'
    (markers = every 101st event) of the SAME user — union-tag + one window
    sweep, a single shuffle on user_id (operators/asof.py; DuckDB oracle uses
    its native ASOF JOIN as the independent implementation)."""
    from log_collector_spark.operators.asof import asof_join
    ev = _events(spark, sf_dir)
    markers = (ev.filter(F.col("event_id") % 101 == 0)
                 .select("user_id", F.col("event_id").alias("upd_id"),
                         F.col("event_type").alias("upd_type")))
    out = asof_join(ev.select("event_id", "user_id"), markers,
                    on="user_id", left_ord="event_id", right_ord="upd_id",
                    value_cols=["upd_id", "upd_type"])
    return out.select("event_id", "user_id", "upd_id", "upd_type")


def q_rollup_time_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute→hour→day→total rollup in one Expand+hash-agg pass (the
    hypertable continuous-aggregate ladder; -1 marks collapsed levels)."""
    ev = _events(spark, sf_dir)
    ts_ms = (F.unix_micros(F.date_trunc("second", F.col("ts").cast("timestamp")))
             / F.lit(1000)).cast("long")
    return agg_ops.rollup_time_counts(ev, ts_ms)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_trend_slope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form integer least-squares slope per type over hourly counts
    (permille/hour + exact num/den)."""
    ev = _events(spark, sf_dir)
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    return agg_ops.trend_slope_counts(ev, F.col("event_type"), ts_ms)


def q_rolling_median_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 24h median of hourly counts (full-window contract)."""
    ev = _events(spark, sf_dir)
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    return agg_ops.rolling_median_counts(ev, F.col("event_type"), ts_ms)


def q_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew histogram (bitlen buckets + permille shares) for
    user_id — the pre-shuffle salting decision report."""
    ev = _events(spark, sf_dir)
    return agg_ops.skew_report(ev, F.col("user_id"))


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the near-dup graph:
    clique members (collapse-safe) vs chain hubs (over-merge risk)."""
    from log_collector_spark.textops import evalops as EV
    return EV.clustering_coefficient(_docs(spark, sf_dir))


def q_triangle_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph (template family vs chain)."""
    from log_collector_spark.textops import evalops as EV
    return EV.triangle_count(_docs(spark, sf_dir))


def q_zorder_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout: sum of per-file (user, day) min-max spans
    — the file-skipping quality metric behind OPTIMIZE ZORDER BY."""
    from log_collector_spark.operators import order as od
    ev = _events(spark, sf_dir)
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    return od.zorder_layout_audit(ev, "user_id", ts_ms)


def q_tpch_dead_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join audit: parts with NO sales in 1996Q1, per brand (the
    NOT-EXISTS dual of tpch_order_priority's EXISTS)."""
    from log_collector_spark.operators import analytics as an
    return an.dead_stock(_tbl(spark, sf_dir, "part"),
                         _tbl(spark, sf_dir, "lineitem"))


def q_stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source quotas via hash-rank (RNG-free, unlike sampleBy)."""
    from log_collector_spark.textops import analysis as A
    return A.stratified_sample(_docs(spark, sf_dir))


def q_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: linear carry-forward window, not
    the events×events range self-join."""
    from log_collector_spark.operators import behavior as bh
    return bh.last_touch_attribution(_events(spark, sf_dir))


def q_ewma_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA (alpha=1/2, 16-term exact unrolling) over per-type
    hourly counts — aggregate to the grain first, window over the grain."""
    ev = _events(spark, sf_dir)
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    return agg_ops.ewma_hour_counts(ev, F.col("event_type"), ts_ms)


def q_coverage_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union of 10-min activity intervals (gaps-and-islands via
    running-MAX(end), robust to contained intervals): islands + covered ms."""
    from log_collector_spark.operators import interval as iv
    ev = _events(spark, sf_dir)
    ts_ms = F.expr(
        "unix_micros(date_trunc('second', cast(ts as timestamp))) div 1000")
    return iv.interval_coverage(ev, "user_id", ts_ms)


def q_bloom_prejoin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom runtime-filter audit: prune the events fact by the
    purchase-event keyset before any join shuffle; one summary row with the
    FP price (event_id keeps the dim selective — ~20% of the keyspace — so
    the false-positive column is non-vacuous at every sf)."""
    from log_collector_spark.operators import enrich as en
    ev = _events(spark, sf_dir)
    dim = ev.filter(F.col("event_type") == "purchase").select("event_id")
    return en.bloom_prejoin_summary(ev, dim, "event_id")


def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric GROUPING SETS ((type,day),(type),()) — one Expand pass,
    no per-day marginal (not expressible as rollup/cube)."""
    ev = _events(spark, sf_dir)
    day_ms = F.expr(
        "unix_micros(date_trunc('day', cast(ts as timestamp))) div 1000")
    return agg_ops.grouping_sets_counts(ev, F.col("event_type"), day_ms)


def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day×type count matrix via native pivot with an EXPLICIT value list
    (skips the pre-planning distinct scan — one fact pass saved at scale)."""
    ev = _events(spark, sf_dir)
    day_ms = F.expr(
        "unix_micros(date_trunc('day', cast(ts as timestamp))) div 1000")
    return agg_ops.pivot_counts(ev, day_ms, F.col("event_type"), EVENT_TYPES)


def q_percentile_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type latency percentiles by rank selection (p50/p95/p99),
    integer-only: latency is synthesized as h60(event_id) % 5000 so both
    engines derive identical values from md5."""
    from log_collector_spark.textops.common import h60
    ev = _events(spark, sf_dir)
    lat = h60(F.col("event_id").cast("string")) % 5000
    return agg_ops.exact_percentiles(
        ev, "event_type", lat, {"p50": 0.5, "p95": 0.95, "p99": 0.99})


def q_hist_exact_percentile_latency(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Same percentile spec as percentile_latency but via the (group,
    value)-histogram form — EXACT with no row-level sort (the 100-TB
    path for integer metrics)."""
    from log_collector_spark.textops.common import h60
    ev = _events(spark, sf_dir)
    lat = h60(F.col("event_id").cast("string")) % 5000
    return agg_ops.histogram_exact_percentiles(
        ev, "event_type", lat, {"p50": 0.5, "p95": 0.95, "p99": 0.99})


def q_token_rarity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token fraction per doc (corpus count <= 2): the gibberish/OCR
    screen; vocab-side join, shuffle carries (token, count) partials."""
    from log_collector_spark.textops import analysis as A
    return A.token_rarity(_docs(spark, sf_dir))


def q_hist_percentile_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-sketch percentiles (bin lower bounds, width 100)
    over the same synthetic latency as percentile_latency — the scale path
    validated against the exact rank-selection baseline."""
    from log_collector_spark.textops.common import h60
    ev = _events(spark, sf_dir)
    lat = h60(F.col("event_id").cast("string")) % 5000
    return agg_ops.histogram_percentiles(
        ev, "event_type", lat,
        {"p50_lo": 0.5, "p95_lo": 0.95, "p99_lo": 0.99})


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-committed-corpus dedup: anti-join of new-batch fingerprints
    (doc_id % 7 != 0) against the committed set (% 7 == 0); within-batch
    min-id canonical pick. Only (fp, id) pairs shuffle."""
    from log_collector_spark.textops import dedup as D
    docs = _docs(spark, sf_dir)
    seen = (docs.filter(F.col("doc_id") % 7 == 0)
                .select(F.md5(D._norm_text(F.col("text"))).alias("fp")))
    new = docs.filter(F.col("doc_id") % 7 != 0)
    return D.incremental_dedup(new, seen)


def _props_with_drift(ev: DataFrame):
    """Deterministic payload drift, mirrored in the oracle SQL: %7 → a new
    schema with extra keys, %13 → invalid JSON, else the original props."""
    return (F.when(ev["event_id"] % 7 == 0,
                   F.concat(F.lit('{"k":'),
                            (ev["event_id"] % 100).cast("string"),
                            F.lit(',"extra":"x","u":'),
                            ev["user_id"].cast("string"), F.lit("}")))
             .when(ev["event_id"] % 13 == 0, F.lit("not json"))
             .otherwise(ev["props"]))


def q_schema_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema drift profile: per event_type, frequency of each
    top-level JSON payload key (count + permille); invalid payloads count
    rows but no keys."""
    ev = _events(spark, sf_dir)
    src = ev.select("event_type", _props_with_drift(ev).alias("props"))
    return agg_ops.json_schema_profile(src)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows / 48-token stride per doc —
    a pure narrow explode (no shuffle at any corpus size)."""
    from log_collector_spark.textops import chunking as K
    return K.chunk_documents(_docs(spark, sf_dir))


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate-then-split the token stream
    every 512 tokens in salted-hash order, shard-local windows."""
    from log_collector_spark.textops import chunking as K
    return K.pack_sequences(_docs(spark, sf_dir))


def q_locf_backfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill: a synthetic reading (event_id % 1000, nulled on every
    7th event) is carried forward per user under (ts, event_id) order —
    one shuffle on user_id, running last(ignorenulls) per sorted group."""
    ev = _events(spark, sf_dir)
    raw = (F.when(ev["event_id"] % 7 == 0, F.lit(None))
            .otherwise(ev["event_id"] % 1000)).cast("long")
    base = ev.select("event_id", "user_id", "ts", raw.alias("raw_v"))
    return agg_ops.locf_backfill(
        base, "user_id", ["ts", "event_id"], F.col("raw_v")
    ).select("event_id", "user_id", "raw_v", "filled_v")


def q_normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization audit: canonical form lengths, control-char count,
    changed flag, 60-bit hash of the normalized text (narrow, no shuffle)."""
    from log_collector_spark.textops import analysis as A
    return A.normalize_profile(_docs(spark, sf_dir))


def q_cooccur_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed token co-occurrence: top-30 pairs within 3 tokens, with
    integer lift score — collocation mining, linear in corpus tokens."""
    from log_collector_spark.textops import analysis as A
    return A.cooccur_topk(_docs(spark, sf_dir))


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4x512, mergeable cells) probed for the exact top-20
    tokens; est >= exact by construction, overcount is the audit column."""
    from log_collector_spark.textops import analysis as A
    return A.cms_heavy_hitters(_docs(spark, sf_dir))


def q_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered similarity self-join — provably the same
    pairs as the brute-force inverted-index join (the oracle), generating
    candidates from rarest-first shingle prefixes only."""
    from log_collector_spark.textops import dedup as D
    return D.ngram_jaccard_prefix(_docs(spark, sf_dir))


def q_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered first-touch funnel signup→view→click→purchase: per-step user
    reach + permille vs step 1 — a chain of per-user min-aggregates, every
    join co-partitioned on user_id (operators/behavior.py)."""
    from log_collector_spark.operators import behavior as B
    return B.funnel_counts(_events(spark, sf_dir))


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: distinct active users per (first-seen
    epoch-day cohort, day offset) — one user-keyed join + one hash agg."""
    from log_collector_spark.operators import behavior as B
    return B.retention_cohorts(_events(spark, sf_dir))


def q_anomaly_hours_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact trailing z-score volume anomalies per (event_type,
    hour): flag when (m*x-S)^2 > 9*(m*Q-S^2) over the prior 24 observed
    buckets — no float mean/stddev, so the flags hash identically across
    engines."""
    from log_collector_spark.operators import behavior as B
    return B.hour_anomaly_flags(_events(spark, sf_dir))


def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval join as a bucketized equi-join: every 97th event opens
    a 10-minute window; events inside any window pair with it via a shuffle
    equi-join on the time bucket (<= 2 buckets per window, lossless) instead
    of the O(|W|*|E|) BroadcastNestedLoop a raw range predicate plans. The
    DuckDB oracle runs the plain inequality join (IEJoin) to prove the pair
    set is exact."""
    from log_collector_spark.operators.interval import interval_join
    ev = _events(spark, sf_dir)
    t_us = F.unix_micros(F.col("ts").cast("timestamp")).cast("long")
    evs = ev.select(F.col("event_id"), t_us.alias("t_us"))
    wins = (ev.filter(F.col("event_id") % 97 == 0)
              .select(F.col("event_id").alias("window_id"),
                      t_us.alias("start_us"),
                      (t_us + 600_000_000).alias("end_us")))
    out = interval_join(evs, wins)
    return out.select("window_id", "event_id")


def q_token_budget_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source token-budget sampling in salted-hash order (the
    pretraining mixture op: hit a token target per domain, whole docs only,
    append-stable) — one shuffle on source + a per-group running sum."""
    from log_collector_spark.textops import analysis as A
    return A.token_budget_sample(_docs(spark, sf_dir))


def q_ohlc_hours_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup per (event_type, hour): open/close by
    (event-time, event_id) order via min_by/max_by partials — one hash agg,
    no window over raw events; value quantized to 0.001 for the hash-stable
    oracle (which uses DuckDB's ordered FIRST/LAST as the independent
    formulation)."""
    from log_collector_spark.operators import behavior as B
    return B.ohlc_hours(_events(spark, sf_dir))


def q_tfidf_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 keywords by integer TF-IDF (tf * 1e6 // df) — token
    shuffle join (vocab not broadcastable at corpus scale) + per-doc top-k
    window."""
    from log_collector_spark.textops import analysis as A
    return A.tfidf_topk(_docs(spark, sf_dir))


def q_source_overlap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: distinct shared 8-gram shingles
    per source pair — join fan-out bounded by (#sources choose 2) per
    shingle, independent of corpus size."""
    from log_collector_spark.textops import analysis as A
    return A.source_overlap(_docs(spark, sf_dir))


def q_quality_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic subsampling: keep a doc iff
    h60(salt||id) % 1000 < alpha-token permille — the soft quality filter,
    RNG-free and append-stable; pure narrow projection, zero shuffle."""
    from log_collector_spark.textops import analysis as A
    return A.quality_sample(_docs(spark, sf_dir))


def q_keyword_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search (AND over the token set): distinct-token
    semi-join + count == k; the shuffle carries at most |docs|*k rows."""
    from log_collector_spark.textops import analysis as A
    return A.keyword_search(_docs(spark, sf_dir))


def q_transition_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user stream
    (lag window on user_id, then a tiny (prev, curr) hash agg)."""
    from log_collector_spark.operators import behavior as B
    return B.transition_counts(_events(spark, sf_dir))


def q_winsorized_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust stats: clamp the synthetic latency into the exact
    per-type [p05, p95] rank-selection bounds, then aggregate — outliers
    saturate instead of distorting the sum; the bounds frame is a tiny
    broadcast."""
    from log_collector_spark.operators import behavior as B
    from log_collector_spark.textops.common import h60
    ev = _events(spark, sf_dir)
    lat = h60(F.col("event_id").cast("string")) % 5000
    return B.winsorized_stats(ev, "event_type", lat)


def q_semantic_dedup_embeddings(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: connected components over the
    guarded embedding near-dup pairs → one kept representative (min vec_id)
    per semantic cluster. Composes the two scale-safe primitives: sign-LSH
    bucketed pair generation (bounded per-bucket work) + min-label
    propagation (shuffles only (id, label) pairs)."""
    from log_collector_spark.textops import dedup as D
    embs = _embs(spark, sf_dir)
    pairs = (D.embedding_neardup_guarded(embs)
              .select(F.col("vec_a").alias("doc_a"),
                      F.col("vec_b").alias("doc_b")))
    return D.dedup_clusters(embs, pairs=pairs)


def q_rolling_wau_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day: distinct
    (day, user) pairs explode into <= 7 report days (bounded narrow
    duplication) — exact WAU with no sketch and no window over raw
    events."""
    from log_collector_spark.operators import behavior as B
    return B.rolling_active_users(_events(spark, sf_dir))


def q_snapshot_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: events vs a deterministically drifted copy
    (%13 removed, %7 value-changed, %101 re-keyed as added) classified by a
    full-outer join on (key, h60-row-hash) — only (key, hash) pairs
    shuffle, never the payload."""
    from log_collector_spark.operators import behavior as B
    from log_collector_spark.textops.common import h60
    ev = _events(spark, sf_dir)
    vq = F.round(F.col("value").cast("double") * 1000, 0).cast("long")
    base = ev.select("event_id", "event_type", "user_id", vq.alias("vq"))
    changed_vq = (F.col("vq") +
                  F.when(F.col("event_id") % 7 == 0, 1).otherwise(0))
    new = (base.filter(F.col("event_id") % 13 != 0)
               .select("event_id", "event_type", "user_id",
                       changed_vq.alias("vq")))
    added = (base.filter(F.col("event_id") % 101 == 0)
                 .select((F.col("event_id") + 10_000_000).alias("event_id"),
                         "event_type", "user_id", "vq"))
    row_hash = h60(F.concat_ws(
        "|", F.col("event_id").cast("string"), F.col("event_type"),
        F.col("user_id").cast("string"), F.col("vq").cast("string")))
    return B.snapshot_diff(base, new.unionByName(added), "event_id",
                           row_hash)


def q_label_centroid_embeddings(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-(label, dim) centroid sums over quantized embeddings: narrow
    posexplode + one map-side-combined hash agg — exact, mergeable class
    statistics (#labels x dims output rows at any corpus size)."""
    from log_collector_spark.textops import similarity as S
    return S.label_centroid_stats(_embs(spark, sf_dir))


def q_trigram_paths_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step behavioral paths per user stream: both lags in one
    WindowExec pass, trigram hash agg, TakeOrderedAndProject top-k."""
    from log_collector_spark.operators import behavior as B
    return B.trigram_paths(_events(spark, sf_dir))


def q_dq_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validity profile in one aggregate pass (nulls, invalid
    JSON, non-positive values, out-of-range timestamps per event_type);
    runs over the same deterministically drifted payload as
    schema_profile_events so the invalid-JSON counter is non-trivial."""
    from log_collector_spark.operators import behavior as B
    ev = _events(spark, sf_dir)
    src = ev.select("event_id", "ts", "user_id", "event_type", "value",
                    _props_with_drift(ev).alias("props"))
    return B.dq_profile(src)


def q_line_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/CCNet-style first-occurrence line dedup: repeated 3-word
    segments survive only at their corpus-wide min (doc_id, pos); one
    window shuffle over the 60-bit segment hash (packed-int64 canonical
    key), per-doc kept/total rollup."""
    from log_collector_spark.textops import dedup as D
    return D.line_dedup(_docs(spark, sf_dir))


def q_normalized_dedup_documents(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Gopher-style fuzzy-exact dedup: strip all non-alphanumerics +
    lowercase, hash-groupBy the normalized fingerprint, emit per-doc
    canonical-survivor decisions."""
    from log_collector_spark.textops import dedup as D
    return D.normalized_dedup(_docs(spark, sf_dir))


def q_mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-style robust outliers: |v - median| > 5 * MAD per event
    type, exact rank-selection medians (two shuffles) + broadcast clamp."""
    from log_collector_spark.operators import behavior as B
    return B.mad_outliers(_events(spark, sf_dir))


def q_pq_codes_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: 8 x 4-bit nearest-centroid codes
    packed into one int64 + squared reconstruction error — pure Catalyst,
    zero shuffle."""
    from log_collector_spark.textops import similarity as S
    return S.pq_codes(_embs(spark, sf_dir))


def q_dsir_importance_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """DSIR importance resampling (hashed-bigram importance weights vs a
    target domain, Xie et al.): top-50 raw docs that look most like the
    target slice. The 1024-bucket feature table is constant-size at any
    corpus scale (broadcast score join, never a vocab shuffle); log
    ratios in whole bits via the bit-length log, no products, overflow-
    free by construction."""
    from log_collector_spark.textops import lm_proxy as LM
    return LM.dsir_importance(_docs(spark, sf_dir))


def q_kcenter_select_embeddings(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez farthest-first) coreset selection over
    the embedding space: 8 mutually-farthest exemplars + the maxmin
    radius curve + final coverage d2 — per round one narrow scan +
    TakeOrdered(1) with the chosen centers inlined as literals (no
    shuffle, no join, stateless per-round plans)."""
    from log_collector_spark.textops import similarity as S
    return S.k_center_select(_embs(spark, sf_dir))


def q_mixture_weights_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Data-mixing rates: per-source token shares vs hash-derived target
    weights -> clamped sampling permille; one hash agg + broadcast
    totals."""
    from log_collector_spark.textops import analysis as A
    return A.mixture_weights(_docs(spark, sf_dir))


def q_basket_pairs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket event-type pairs per (user, day): distinct-collapsed
    baskets, within-basket self-join bounded by the type vocabulary."""
    from log_collector_spark.operators import behavior as B
    return B.basket_pairs(_events(spark, sf_dir))


def q_corpus_yield_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-funnel yield per source: quality filter -> dedup
    canonical -> decontamination, applied sequentially; flags join on
    doc_id only, one final hash agg."""
    from log_collector_spark.textops import dedup as D
    return D.corpus_yield(_docs(spark, sf_dir))


def q_activity_grid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour traffic heatmap per event type — integer epoch
    arithmetic, one hash agg, <= 168 cells per group."""
    from log_collector_spark.operators import behavior as B
    return B.activity_grid(_events(spark, sf_dir))


def q_length_histogram_documents(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-source token-length histogram over power-of-2 buckets — one
    map-side-combined hash agg; buckets merge across shards."""
    from log_collector_spark.textops import analysis as A
    return A.length_histogram(_docs(spark, sf_dir))


def q_centroid_outliers_embeddings(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """OOD embedding screen: exact squared distance to the assigned IVF
    centroid; flagged when the origin explains the vector better than its
    own nearest centroid. Pure Catalyst, zero shuffle."""
    from log_collector_spark.textops import similarity as S
    return S.centroid_outliers(_embs(spark, sf_dir))


def q_novelty_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc marginal-diversity score: permille of distinct 3-gram
    shingles first introduced (min doc_id corpus-wide) by this doc — one
    window shuffle over the shingle hash."""
    from log_collector_spark.textops import dedup as D
    return D.novelty_score(_docs(spark, sf_dir))


def q_hll_distinct_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principles HyperLogLog distinct-token sketch per source: 64
    integer registers, fixed-point harmonic mean, linear-counting table —
    register MAX agg shuffles <= 64 rows per group."""
    from log_collector_spark.textops import analysis as A
    return A.hll_distinct(_docs(spark, sf_dir))


def q_pct_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type percentile-rank (permille) normalization of the value
    column — one window pass, rank ties share a rank."""
    from log_collector_spark.operators import behavior as B
    return B.pct_rank_events(_events(spark, sf_dir))


def q_new_vs_returning_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: active users split into new (first-ever
    day) vs returning, plus event totals — two hash aggs, no windows."""
    from log_collector_spark.operators import behavior as B
    return B.new_vs_returning(_events(spark, sf_dir))


def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotency debounce: drop events < 1s after the previous event of
    the same (user, type) key — one window pass, one shuffle."""
    from log_collector_spark.operators import behavior as B
    return B.debounce_events(_events(spark, sf_dir))


def q_scd2_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: per-user state-change rows with [valid_from,
    valid_to) epoch-us intervals; lag+lead share one shuffle+sort."""
    from log_collector_spark.operators import behavior as B
    return B.scd2_intervals(_events(spark, sf_dir))


def q_kmeans_step_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd k-means iteration vs the IVF centroids: pure-Catalyst
    argmin assignment + one (cell, dim) hash agg -> exact sums, floored
    new centroids, per-coordinate drift."""
    from log_collector_spark.textops import similarity as S
    return S.kmeans_step(_embs(spark, sf_dir))


def q_bpe_pair_counts_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """BPE merge-step statistic: corpus-wide adjacent char-pair counts,
    narrow nested transform + hash agg + TakeOrderedAndProject top-20."""
    from log_collector_spark.textops import analysis as A
    return A.bpe_pair_counts(_docs(spark, sf_dir))


def q_contamination_score_documents(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Graded eval-contamination: permille of each train doc's distinct
    8-grams found in the eval slice (doc_id %% 50 == 0) — broadcast eval
    membership join, per-doc map-side-combined counts."""
    from log_collector_spark.textops import dedup as D
    docs = _docs(spark, sf_dir)
    return D.contamination_score(docs.filter(F.col("doc_id") % 50 != 0),
                                 docs.filter(F.col("doc_id") % 50 == 0))


def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped min-cost supplier over the DERIVED partsupp (distinct
    lineitem key pairs + deterministic integer attrs): the correlated MIN
    subquery decorrelated into groupBy-min + equi-join back, ties kept."""
    from log_collector_spark.operators import analytics_ps as ps
    return ps.min_cost_supplier(_tbl(spark, sf_dir, "part"),
                                _tbl(spark, sf_dir, "supplier"),
                                _tbl(spark, sf_dir, "nation"),
                                _tbl(spark, sf_dir, "region"),
                                _tbl(spark, sf_dir, "lineitem"))


def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped product-type profit by (nation, order-year): 6-way join,
    profit = disc_price − supplycost·qty in exact integer micros."""
    from log_collector_spark.operators import analytics_ps as ps
    return ps.product_type_profit(_tbl(spark, sf_dir, "part"),
                                  _tbl(spark, sf_dir, "supplier"),
                                  _tbl(spark, sf_dir, "nation"),
                                  _tbl(spark, sf_dir, "orders"),
                                  _tbl(spark, sf_dir, "lineitem"))


def q_tpch_supplier_relationship(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Q16-shaped supplier-relationship count: DISTINCT suppliers per
    (brand, type, size) with the NOT-IN exclusion as a broadcast
    anti-join."""
    from log_collector_spark.operators import analytics_ps as ps
    return ps.supplier_relationship(_tbl(spark, sf_dir, "part"),
                                    _tbl(spark, sf_dir, "supplier"),
                                    _tbl(spark, sf_dir, "lineitem"))


def q_tpch_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped excess-stock suppliers: nested IN-chain as
    aggregate → join → semi-join; 0.5·qty comparison kept integer."""
    from log_collector_spark.operators import analytics_ps as ps
    return ps.excess_stock_suppliers(_tbl(spark, sf_dir, "supplier"),
                                     _tbl(spark, sf_dir, "nation"),
                                     _tbl(spark, sf_dir, "part"),
                                     _tbl(spark, sf_dir, "lineitem"))


def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup: banded Levenshtein (shingle-blocked
    candidates, length prefilter, JVM levenshtein verify)."""
    from log_collector_spark.textops import editdist as E
    return E.edit_distance_pairs(_docs(spark, sf_dir))


def q_autocorr_hours_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer lag-k autocorrelation (k=1..48) of the zero-filled
    hourly count series — the seasonality detector."""
    from log_collector_spark.operators import seasonal as S
    return S.autocorr_hourly(_events(spark, sf_dir))


def q_dow_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour load profile with permille shares and peak-hour
    flags; calendar keys from epoch-ms arithmetic (cross-engine safe)."""
    from log_collector_spark.operators import seasonal as S
    return S.dow_hour_profile(_events(spark, sf_dir))


def q_token_coverage_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Token-weighted length quantiles: smallest length cutoff retaining
    each target permille of corpus tokens (max-seq-len curation stat)."""
    from log_collector_spark.textops import analysis as A
    return A.token_coverage_cutoff(_docs(spark, sf_dir))


def q_substring_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup: longest shared contiguous token span
    per candidate pair via positional shingle anchors on one diagonal
    (gaps-and-islands) — position-aware where the set-similarity family
    is not."""
    from log_collector_spark.textops import dedup as D
    return D.substring_span_pairs(_docs(spark, sf_dir))


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level train↔eval decontamination: sign-LSH buckets +
    exact integer-cosine verify; the eval slice (vec_id % 50 == 0) is the
    broadcast side."""
    from log_collector_spark.textops import dedup as D
    embs = _embs(spark, sf_dir)
    return D.semantic_decontaminate(
        embs.filter(F.col("vec_id") % 50 != 0),
        embs.filter(F.col("vec_id") % 50 == 0))


def q_tx_turn_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation dropped-turn audit: hole counts + first hole index
    in the routed turn sequence (the per-conv view of the failure
    tallies)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.turn_holes(_routed_slim(spark, sf_dir))


def q_tx_tool_latency_percentiles(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-tool EXACT p50/p90/p99 latency by rank selection — the SLA
    table; value-deterministic under latency ties."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tool_latency_percentiles(_routed_slim(spark, sf_dir))


def q_tx_retry_storms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs of >= 3 consecutive same-tool calls per conversation — the
    agent retry-loop pathology, gaps-and-islands on the clean sequence."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.retry_storms(_routed_slim(spark, sf_dir))


def q_ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest exact binned Kolmogorov-Smirnov distance per event
    type — the distribution-drift screen, integer cross-multiplied CDFs."""
    from log_collector_spark.operators import behavior as B
    return B.ks_drift(_tbl(spark, sf_dir, "events"))


def q_neardup_label_confusion(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Near-dup pairs grouped by label pair — off-diagonal cells are the
    label-noise review queue; one label join over the guarded pair graph."""
    from log_collector_spark.textops import dedup as D
    return D.neardup_label_confusion(_embs(spark, sf_dir))


def q_funnel_latency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel transition: exact p50/p90 of the
    first-touch step deltas over converting users."""
    from log_collector_spark.operators import behavior as B
    return B.funnel_latency(_tbl(spark, sf_dir, "events"))


def q_value_jackknife_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife table for the corpus mean —
    deterministic hash buckets, exact integer leave-one-out means."""
    from log_collector_spark.operators import behavior as B
    return B.value_jackknife(_tbl(spark, sf_dir, "events"))


def q_broadcast_advisor_tables(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Join-strategy advisor: measured rows + decoded bytes per dim table
    vs the broadcast threshold, as an auditable relation."""
    from log_collector_spark.operators import order as O
    names = ("region", "nation", "supplier", "customer", "part")
    return O.broadcast_advisor({n: _tbl(spark, sf_dir, n) for n in names})


def q_simpson_diversity_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-user Gini-Simpson behavioral diversity — exact integer where
    entropy would float-drift; two stacked hash aggs."""
    from log_collector_spark.operators import behavior as B
    return B.simpson_diversity(_tbl(spark, sf_dir, "events"))


def q_tx_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly exact p50/p95 latency bands over the routed frame — the
    dashboard time series, rank selection within hour partitions."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.latency_bands_hourly(_routed_slim(spark, sf_dir))


def q_tx_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation pooled TTR + repeated 3-gram share — the
    multi-turn self-repetition signal; text moves only as 60-bit hashes."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.conversation_redundancy(
        pl.full_pipeline(spark, sf_dir))       # needs text (wide)


def q_resize_ppm_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize kernel: 2×2 box-filter (floor mean) over the decoded
    PPM pixels in mapInPandas; odd edges cropped, thin images resize to
    empty with guarded stats. Oracle from doc_id arithmetic."""
    from log_collector_spark.textops import multimodal as M
    return M.resize_ppm_features(
        M.media_ppm_from_documents(_docs(spark, sf_dir)))


def q_framesample_wav_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Frame-sampling stage: stride-4 decimation over decoded PCM frames
    in mapInPandas (the audio/video frame-sample path)."""
    from log_collector_spark.textops import multimodal as M
    return M.framesample_wav_features(
        M.media_wav_from_documents(_docs(spark, sf_dir)))


def q_corpus_token_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-funnel yield in TOKEN MASS per source (quality → dedup →
    decontamination) — the tokens-kept accounting of a corpus release."""
    from log_collector_spark.textops import dedup as D
    return D.corpus_token_yield(_docs(spark, sf_dir))


def q_fano_factor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type burstiness: exact integer Fano factor (variance/mean of
    zero-filled hourly counts) — 1000 ≈ Poisson, higher = bursty."""
    from log_collector_spark.operators import behavior as B
    return B.fano_factor(_tbl(spark, sf_dir, "events"))


def q_token_tvd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise exact total-variation distance between source unigram
    distributions — inner-join-only closed form, no dense vocab grid."""
    from log_collector_spark.textops import analysis as A
    return A.token_tvd_sources(_docs(spark, sf_dir))


def q_tx_parse_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly parse-health series over the RAW routed frame: blanks,
    oversize, parse failures, clean rows, ok share — the reference's
    counters unrolled into a time series."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.parse_health_hourly(_routed_slim(spark, sf_dir))


def q_log_templates_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-lite log-template mining: digit-masked token-prefix templates,
    one hash agg + TakeOrdered top-k (textops/mining.py)."""
    from log_collector_spark.textops import mining as MI
    return MI.log_templates(_docs(spark, sf_dir))


def q_vocab_growth_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: token first-occurrence buckets +
    running vocabulary size (one token-level shuffle)."""
    from log_collector_spark.textops import mining as MI
    return MI.vocab_growth(_docs(spark, sf_dir))


def q_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event predictability per antecedent type
    (modal successor + hit rate, lexicographic tie-break)."""
    from log_collector_spark.textops import mining as MI
    return MI.markov_next_event(_events(spark, sf_dir))


def q_tx_markov_next_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-TOOL predictability over clean transcript turns —
    the workflow-automation screen on the flagship routed frame (adjacency
    over non-null-tool turns, same discipline as tx_tool_chain_bigrams)."""
    from log_collector_spark.textops import mining as MI
    routed = _routed_slim(spark, sf_dir)
    clean = (routed.filter(F.col("parse_ok") & ~F.col("is_oversize"))
                   .filter(F.col("tool").isNotNull())
                   .select("conv_id", "turn_idx", "tool"))
    return MI.markov_next_event(clean, key_col="conv_id",
                                seq_col="turn_idx", type_col="tool")


def q_simhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming × exact-Jaccard cross-tab over simhash band candidates —
    the threshold-selection evidence for SIMHASH_HAMMING_MAX."""
    from log_collector_spark.textops import evalops as EV
    return EV.simhash_calibration(_docs(spark, sf_dir))


def q_tx_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload stats via Spark 4 VARIANT (try_parse_json once +
    try_variant_get per field) grouped by the payload's embedded tool."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.variant_payload_stats(_routed_slim(spark, sf_dir))


def q_ann_mrr_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer MRR of the true nearest neighbor inside each ANN path's
    top-k — rank quality, sharing one brute-force truth scan."""
    from log_collector_spark.textops import evalops as EV
    return EV.ann_mrr(_embs(spark, sf_dir))


def q_ann_ndcg_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-averaged integer nDCG@k per ANN path vs the exact top-k —
    grades the whole returned ranking, not just the best hit."""
    from log_collector_spark.textops import evalops as EV
    return EV.ann_ndcg(_embs(spark, sf_dir))


def q_kcore_peel_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-core peel round (k=2) over the MinHash near-dup graph:
    whisker removal report (deg0, removed, surviving degree)."""
    from log_collector_spark.textops import evalops as EV
    return EV.kcore_peel(_docs(spark, sf_dir))


def q_link_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard strength per near-dup edge: family-internal
    edges vs bridges the clustering step must not merge across."""
    from log_collector_spark.textops import evalops as EV
    return EV.link_jaccard(_docs(spark, sf_dir))


def q_cusum_changepoint_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """CUSUM single-changepoint scan per event type on the hourly count
    series (exact integer, T-scaled deviations)."""
    from log_collector_spark.operators import seasonal as SE
    return SE.cusum_changepoint(_events(spark, sf_dir))


def q_bloom_fpr_curve_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom sizing curve: measured vs theoretical FPR per bits/key
    budget, members = even keys, probes = odd keys (disjoint)."""
    from log_collector_spark.operators import enrich as en
    return en.bloom_fpr_curve(_events(spark, sf_dir))


def q_temperature_mixture_documents(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Temperature-scaled per-source sampling shares (T=1 / T=2 via exact
    integer sqrt / uniform) — the multilingual mixing knob."""
    from log_collector_spark.textops import analysis as TA
    return TA.temperature_mixture(_docs(spark, sf_dir))


def q_rouge_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped ROUGE-1/2 recall over deterministic (even, even+1) doc
    pairs — the summarization-eval primitive as a corpus op."""
    from log_collector_spark.textops import analysis as TA
    return TA.rouge_pairs(_docs(spark, sf_dir))


def q_dedup_roi_curve_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Pairs fired / docs touched / docs removed per Jaccard threshold —
    the evidence curve for picking the dedup cut before a 100-TB run."""
    from log_collector_spark.textops import dedup as TD
    return TD.dedup_roi_curve(_docs(spark, sf_dir))


def q_sq8_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric SQ8 retrieval audit: recall@k + top-1 preservation of
    reconstructed candidates vs the exact brute-force truth."""
    from log_collector_spark.textops import evalops as EV
    return EV.sq8_recall(_embs(spark, sf_dir))


def q_benford_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of value-cents vs Benford's
    law — the fabricated/synthetic-value data-quality screen."""
    from log_collector_spark.operators import behavior as BH
    return BH.benford_audit(_events(spark, sf_dir))


def q_mann_whitney_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Mann-Whitney U ('view' vs 'click' values)
    with integer AUC effect size — the nonparametric A/B test."""
    from log_collector_spark.operators import behavior as BH
    return BH.mann_whitney_u(_events(spark, sf_dir))


def q_theil_sen_slope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-pairwise-slopes robust trend per event type over the
    hourly count series (exact fixed-point, abs-split DIV)."""
    from log_collector_spark.operators import seasonal as SE
    return SE.theil_sen_slope(_events(spark, sf_dir))


def q_token_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user token-bucket limiter replay (sequential applyInPandas
    kernel; DuckDB replays the recurrence via WITH RECURSIVE)."""
    from log_collector_spark.operators import behavior as BH
    return BH.token_bucket(_events(spark, sf_dir))


def q_wilson_rates_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value rate per event type with exact-integer Wilson lower
    bound (z=2) — ranking that resists small-n flukes."""
    from log_collector_spark.operators import behavior as BH
    return BH.wilson_rates(_events(spark, sf_dir))


def q_crosscorr_types_events(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation between 'error' and 'purchase' hourly
    series at lags ±6 (exact integer Pearson, isqrt-factor permille)."""
    from log_collector_spark.operators import seasonal as SE
    return SE.crosscorr_types(_events(spark, sf_dir))


def q_ann_map_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-averaged integer mAP@k per ANN path — the front-loadedness
    metric completing recall/MRR/nDCG."""
    from log_collector_spark.textops import evalops as EV
    return EV.ann_map(_embs(spark, sf_dir))


def q_rake_phrases_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrases with data-derived stoplist: degree/frequency word
    scores, top-20 phrases by summed integer score."""
    from log_collector_spark.textops import analysis as TA
    return TA.rake_phrases(_docs(spark, sf_dir))


def q_dict_encoding_advisor_events(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Dictionary-vs-plain storage advisor per string column (exact
    bytes, parquet dictionary model)."""
    from log_collector_spark.operators import order as OR
    return OR.dict_encoding_advisor(_events(spark, sf_dir))


def q_wav_energy_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow flavor of the WAV energy stage (no pandas boxing of the
    binary column); row-identical to the mapInPandas stage's oracle."""
    from log_collector_spark.textops import multimodal as TM
    media = TM.media_wav_from_documents(_docs(spark, sf_dir))
    return TM.wav_energy_features_arrow(media)


def q_watermark_bias_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Statistical-watermark screen per source: green-list token share +
    integer chi-square score; one narrow hash pass, zero joins."""
    from log_collector_spark.textops import analysis as A
    return A.watermark_bias(_docs(spark, sf_dir))


def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise signed-cos² histogram over deterministic stride pairs —
    the anisotropy/representation-collapse audit (sqrt-free, int64-safe
    by Cauchy-Schwarz)."""
    from log_collector_spark.textops import similarity as S
    return S.embedding_isotropy(_embs(spark, sf_dir))



def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc permille of token positions covered by a corpus-duplicated
    k-gram (interval-union coverage, the Lee et al. 2022 dedup report
    metric); shingle-hash agg + one lead() window over hit positions."""
    from log_collector_spark.textops import dedup as D
    return D.dup_ngram_coverage(_docs(spark, sf_dir))


def q_pca_power_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two integer power-iteration steps toward the dominant principal
    direction of the embedding Gram matrix — Aᵀ(A·v) without
    materializing the d×d Gram, 64-key dim aggs, one-row broadcast of
    the direction between steps."""
    from log_collector_spark.textops import similarity as S
    return S.pca_power_step(_embs(spark, sf_dir))



def q_pca_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared-cosine histogram against the power-iteration
    principal direction — the "all-but-the-top" collapse report; per-row
    bounded integer chain, 11-key agg."""
    from log_collector_spark.textops import similarity as S
    return S.pca_alignment(_embs(spark, sf_dir))


def q_ann_topk_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-expansion ANN: offline degree-bounded kNN graph from
    multiprobe LSH candidates; queries probe one bucket + one graph hop
    (the NSW/HNSW index-effort-for-query-latency trade)."""
    from log_collector_spark.textops import similarity as S
    return S.graph_ann_topk(_embs(spark, sf_dir))



def q_tx_context_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-time context depth histogram: per-turn count of trailing
    turns visible under the token budget — one fixed-offset RANGE frame
    over the conv token cumsum, no self-join."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.context_depth(_routed_slim(spark, sf_dir))



def q_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette (centroid form, integer permille):
    label-coherence audit before trusting labels for splits/sampling;
    one (label,dim) agg + in-row distance transforms, no n×L shuffle."""
    from log_collector_spark.textops import similarity as S
    return S.silhouette_labels(_embs(spark, sf_dir))



def q_tx_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT dataset assembly: one example per clean assistant turn with
    prompt/completion token accounting (loss-mask boundary) and a
    context-budget fit flag; one conv-keyed window, no join."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.sft_examples(_routed_slim(spark, sf_dir))


def q_tx_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair assembly: chosen/rejected assistant turn per
    conversation by integer token-throughput reward with deterministic
    symmetric tie-breaks and the reward margin; one conv-keyed exchange
    (two row_number orders + one agg on the same key)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.dpo_pairs(_routed_slim(spark, sf_dir))


def q_tx_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward length-bias audit: exact Kendall tau-a between completion
    length and per-token latency per tool category, computed on a 16x16
    banded grid (constant-size pair join — no global sort, no O(n^2))."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.length_bias(_routed_slim(spark, sf_dir))


def q_curriculum_stages_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Curriculum staging: TTR-difficulty value histogram cut into 5
    equal-population stages with per-stage doc/token accounting — stage
    assignment on the <= 1001-row histogram, no global sort."""
    return _ta().curriculum_stages(_tbl(spark, sf_dir, "documents"))


def q_judge_agreement_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cohen's kappa (permille, exact integer) between the stopword-rate
    and word-length quality judges — one scan to a 3x3 contingency grid,
    margins and kappa on the constant-size grid."""
    return _ta().judge_agreement(_tbl(spark, sf_dir, "documents"))


def q_sq8_recon_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization audit: exact integer reconstruction error
    per label against corpus-wide per-dim ranges — dim stats fold to one
    broadcast row, error is in-row zip_with (no join-back shuffle)."""
    return _ts().sq8_recon_error(_embs(spark, sf_dir))


def q_tx_bestofn_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n sampling gain curve: mean best reward among the first n
    assistant turns (n in 1/2/4/8, same-population prefix max) — one
    conv-keyed exchange + a constant-size explode."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.bestofn_gain(_routed_slim(spark, sf_dir))


def q_contribution_cap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-style per-user contribution capping audit: events removed and
    users clipped per day at cap=5 — two count-only hash aggs, no
    window."""
    from log_collector_spark.operators import behavior as BH
    return BH.contribution_cap(_events(spark, sf_dir))


def q_dataset_card_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card row: docs/tokens/mean length/langs/exact
    dup rate/vocab size — the datasheet header block, two aggs over one
    projection."""
    return _ta().dataset_card(_tbl(spark, sf_dir, "documents"))


def q_triplet_mining_embeddings(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """FaceNet-taxonomy triplet report per label (hard / semi-hard /
    easy / no-positive anchors) on exact signed-cos2 integer similarity;
    corpus side broadcast, IVF-cell candidates at scale."""
    return _ts().triplet_mining(_embs(spark, sf_dir))


def q_index_plan_advisor_embeddings(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """ANN index capacity plan from one stats row: IVF nlist/nprobe,
    PQ subspaces, per-encoding footprints, rule-based recommendation."""
    return _ts().index_plan_advisor(_embs(spark, sf_dir))


def q_fim_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM preprocessing accounting: per-source prefix/middle/suffix
    token sums at deterministic h60 cut points; one scan, one agg."""
    return _ta().fim_split(_tbl(spark, sf_dir, "documents"))


def q_scaling_budget_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chinchilla budget advisor: per model size, token budget,
    milli-epochs over this corpus, unique-token deficit."""
    return _ta().scaling_budget_advisor(_tbl(spark, sf_dir, "documents"))


def q_epoch_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-loader reshuffle audit: cross-epoch same-shard rate vs
    chance + epoch-0 shard balance, salted h60 assignment."""
    return _ta().epoch_shuffle_audit(_tbl(spark, sf_dir, "documents"))


def q_inbatch_negatives_embeddings(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """In-batch false-negative collision permille per candidate batch
    size (hash batching, pair counts from the (batch,label) histogram)."""
    return _ts().inbatch_negatives(_embs(spark, sf_dir))


def q_ab_srm_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-ratio-mismatch guardrail per event_type: exposed-user
    chi-square (milli) on the deterministic 50/50 hash assignment."""
    from log_collector_spark.operators import behavior as BH
    return BH.ab_srm(_events(spark, sf_dir))


def q_padding_waste_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length-bucket padding-waste table (dynamic-batching
    ladder audit); constant-size agg, bit-length bucketing."""
    return _ta().padding_waste(_tbl(spark, sf_dir, "documents"))


def q_order_fingerprint_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-shard order-sensitive data-order checksum over the salted
    stream order — the loader's reproducibility receipt."""
    return _ta().data_order_fingerprint(_tbl(spark, sf_dir, "documents"))


def q_latesim_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction MaxSim top-k (8x8 sub-vectors,
    in-row nested max/sum — brute-ANN plan shape)."""
    return _ts().latesim_topk(_embs(spark, sf_dir))


def q_dp_noise_advisor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace noise calibration table per candidate epsilon against the
    capped mean daily count — contribution_cap's companion."""
    from log_collector_spark.operators import behavior as BH
    return BH.dp_noise_advisor(_events(spark, sf_dir))


def q_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerts (5-min AND 1-hour conjunction,
    integer milli burn); hour rolls up the 5-min partials, one scan."""
    from log_collector_spark.operators import behavior as B
    return B.slo_burn_alerts(_events(spark, sf_dir))


def q_lsh_probe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k vs LSH multiprobe budget (0/2/4/8 plane flips) against one
    shared brute-force truth scan — the LSH twin of ivf_nprobe_curve."""
    from log_collector_spark.textops import evalops as EV
    return EV.lsh_probe_curve(_embs(spark, sf_dir))


def q_delete_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE planning: per-file rows touched / write
    amplification for a deterministic ~5% key deletion list."""
    from log_collector_spark.operators.order import delete_impact_audit
    return delete_impact_audit(pl.load_transcripts(spark, sf_dir))


def q_boilerplate_source_matrix(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Cross-source boilerplate-LINE matrix: distinct shared k-word
    segments (the line-dedup unit) per source pair."""
    from log_collector_spark.textops import dedup as D
    return D.boilerplate_source_matrix(_docs(spark, sf_dir))


def q_tx_cube_tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(role_class, tool_category) turn/token rollup — all four
    grouping combos in one partial-agg pass, grouping_id-disambiguated."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.cube_tool_usage(_routed_slim(spark, sf_dir))


def q_tx_latency_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency by conversation-depth decile — the context-length cost
    curve; one conv window + a 10-row agg."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.latency_by_depth(_routed_slim(spark, sf_dir))


def q_tx_cold_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool first-call vs later-call latency ratio (cold-start cost);
    one (conv, tool) window + bounded agg."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.cold_start_ratio(_routed_slim(spark, sf_dir))


def q_len_quality_grid_documents(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Joint global length-decile × quality-decile histogram — the
    cut-line interaction grid; bounded value histograms broadcast back."""
    from log_collector_spark.textops import analysis as A
    return A.len_quality_grid(_docs(spark, sf_dir))


def q_tx_shape_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level dedup on the interaction SHAPE (ordered
    role/tool sequence): scripted/replayed sessions collapse onto few
    shapes; two hash aggs, text never moves."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.shape_dupes(_routed_slim(spark, sf_dir))


def q_tx_latency_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool latency lower-median + MAD via pandas GROUPED_AGG UDAFs
    (the §2.10 aggregate row); bounded-cardinality keys only — unbounded
    keys use the histogram form."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.tool_latency_mad_udaf(_routed_slim(spark, sf_dir))


def q_tx_conv_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation token stats via applyInArrow — the Arrow-native
    grouped map (pyarrow.compute on columnar buffers, no pandas boxing)."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.conv_stats_arrow(_routed_slim(spark, sf_dir))


def q_zonemap_audit_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max zone-map prunability for a one-day probe —
    manifest-scale per-file agg; the file-skipping companion of
    compaction_plan/rle_audit."""
    from log_collector_spark.operators.order import zonemap_audit
    return zonemap_audit(pl.load_transcripts(spark, sf_dir))


def q_tx_prefix_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation prefix-cache hit rate (cachable vs processed token
    mass) — the serving-cost multiplier a prefix cache removes; one
    conv_id window + agg."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.prefix_cache_rate(_routed_slim(spark, sf_dir))


def q_tx_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload JSON key census per logtype (schema-drift monitor): regex
    key extraction on the parsed capture, one (logtype, key) agg."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.json_schema_drift(_routed_slim(spark, sf_dir))


def q_bigram_coherence_documents(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Model-free fluency proxy: per-doc share of bigrams the rest of the
    corpus uses (df >= 5); hash-keyed vocab join, never broadcast."""
    from log_collector_spark.textops import analysis as A
    return A.bigram_coherence(_docs(spark, sf_dir))


def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized squared-L2 histogram vs corpus max — the pre-ANN sanity
    gate for mixed/un-normalized embedding versions."""
    from log_collector_spark.textops import similarity as S
    return S.embedding_norm_audit(_embs(spark, sf_dir))


def q_tx_token_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass pacing histogram: decile of the turn position where half
    the conversation's tokens have arrived."""
    from log_collector_spark.operators import tx_stats as TX
    return TX.token_midpoint_histogram(_routed_slim(spark, sf_dir))


def q_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF lateral join emitting the chunk plan — pinned
    to the declarative chunk_documents oracle (same rows, same hashes)."""
    from log_collector_spark.textops import chunking as CH
    return CH.chunk_documents_udtf(_docs(spark, sf_dir))


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (quote/subset detection) — ordered
    (contained, container) pairs with C(A→B) >= 0.6."""
    from log_collector_spark.textops import containment as CN
    return CN.containment_pairs(_docs(spark, sf_dir))


def q_unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataFrame.unpivot (melt) of the per-event-type metric frame
    — the long-form twin of pivot_event_types."""
    from log_collector_spark.operators import reshape as RS
    return RS.unpivot_event_metrics(_events(spark, sf_dir))


def q_k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk table on the (type, hour-of-day, value-decade)
    quasi-identifier — the release audit."""
    from log_collector_spark.operators import behavior as BH
    return BH.k_anonymity(_events(spark, sf_dir))


def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup component-size distribution over MinHash-LSH CC labels."""
    from log_collector_spark.textops import dedup as DD
    return DD.cluster_size_histogram(_docs(spark, sf_dir))


def q_wav_zcr_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed zero-crossing counts over the WAV binary column
    (mapInPandas), oracle-checked from doc_id arithmetic."""
    from log_collector_spark.textops import multimodal as TM
    media = TM.media_wav_from_documents(_docs(spark, sf_dir))
    return TM.wav_zcr_features(media)


def q_ppm_channel_stats_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-channel R/G/B pixel sums + dominant channel over the PPM binary
    column (mapInPandas), oracle-checked from doc_id arithmetic."""
    from log_collector_spark.textops import multimodal as TM
    media = TM.media_ppm_from_documents(_docs(spark, sf_dir))
    return TM.ppm_channel_stats_features(media)


def q_ahash_neardup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: decode PPM → 60-bit average hash (8×8 grid,
    mean threshold) → 4×15-bit band join → exact hamming verify. The pair
    search touches only 8-byte hashes, never the images."""
    from log_collector_spark.textops import multimodal as TM
    return TM.ahash_neardup_pairs(_docs(spark, sf_dir))


def q_l_diversity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release audit (distinct sensitive users per QI class)
    — the companion gate to k_anonymity_events."""
    from log_collector_spark.operators import behavior as BH
    return BH.l_diversity(_events(spark, sf_dir))


def q_t_closeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit: permille-EMD between each QI class's
    ordered value-decade distribution and the global one — completes the
    k-anonymity / l-diversity / t-closeness trio."""
    from log_collector_spark.operators import behavior as BH
    return BH.t_closeness(_events(spark, sf_dir))


def q_pii_redact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction transform: email → IP → digit-run masking chained so
    each stage counts replacements actually performed; pure JVM-side
    regexp projection, scan-speed at any corpus size."""
    from log_collector_spark.textops import analysis as A
    return A.pii_redact(_events(spark, sf_dir))


def q_replayed_sequences_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Bot/replay detection: user-days sharing a byte-identical ordered
    event-type sequence, grouped by 60-bit sequence fingerprint."""
    from log_collector_spark.operators import behavior as BH
    return BH.replayed_sequences(_events(spark, sf_dir))


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation eval: recall@k of a 16-dim-prefix brute scan
    against the full 64-dim exact top-k (the Matryoshka serving bet)."""
    from log_collector_spark.textops import evalops as EV
    return EV.matryoshka_recall(_embs(spark, sf_dir))


def q_ivm_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: committed-aggregate ⊎ delta-batch
    partials re-aggregated == the view recomputed from raw rows (the
    oracle recomputes from scratch; equality is the IVM claim)."""
    from log_collector_spark.operators import aggregate as AG
    return AG.ivm_merge_counts(_events(spark, sf_dir))


def q_wav_energy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM frame energy over the WAV binary column (mapInPandas),
    oracle-checked from doc_id arithmetic."""
    from log_collector_spark.textops import multimodal as TM
    media = TM.media_wav_from_documents(_docs(spark, sf_dir))
    return TM.wav_energy_features(media)


def q_seasonal_naive_error_events(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Week-over-week seasonal-naive backtest per complete day (the MASE
    denominator for any fancier forecaster)."""
    from log_collector_spark.operators import seasonal as SE
    return SE.seasonal_naive_error(_events(spark, sf_dir))


def q_quality_vs_dup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate share per stopword-ratio decile — filter-ordering
    evidence (dedup before vs after the quality gate)."""
    from log_collector_spark.textops import analysis as A
    return A.quality_vs_dup(_docs(spark, sf_dir))


ASOF_NEAREST_TOL_US = 86_400_000_000  # 1 day
ASOF_MARKER_MOD = 101


def q_asof_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of (tolerance-bounded, both directions): every event is
    matched to the closest per-user marker event (event_id % 101 == 0)
    within 1 day — the pandas merge_asof(direction='nearest') contract as
    a single union-tag exchange (operators/asof_nearest.py)."""
    from log_collector_spark.operators import asof_nearest as AN
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ parquet; UTC tz
    left = ev.select("user_id", "event_id", "event_type",
                     us.alias("t_us"))
    right = (ev.filter(F.col("event_id") % ASOF_MARKER_MOD == 0)
               .select("user_id", us.alias("m_us"),
                       F.col("event_type").alias("marker_type")))
    out = AN.asof_nearest(left, right, on="user_id", left_ord="t_us",
                          right_ord="m_us", value_cols=["marker_type"],
                          tolerance=ASOF_NEAREST_TOL_US)
    return (out.select("event_id", "user_id", "event_type",
                       "marker_type", "asof_dist")
               .orderBy("event_id"))


def q_bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer BM25 top-10 for the fixed keyword query — rational IDF
    surrogate (no transcendentals), fixed-point k1/b, tf shuffle filtered
    to query terms pre-agg, TakeOrderedAndProject top-k."""
    from log_collector_spark.textops import analysis as A
    return A.bm25_topk(_docs(spark, sf_dir))


def q_quality_calibration_documents(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Per-source quality mass across GLOBAL histogram deciles — drift
    monitor; the cumulative window runs over a bounded <=1001-row value
    histogram, never over docs."""
    from log_collector_spark.textops import analysis as A
    return A.quality_calibration(_docs(spark, sf_dir))


def q_winnowing_pairs_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MOSS winnowing: min-hash of every 4-shingle window (narrow per-row
    selection, ~2/(w+1) of shingles kept), inverted-index pair join with
    the max_df boilerplate guard."""
    from log_collector_spark.textops import dedup as D
    return D.winnowing_pairs(_docs(spark, sf_dir))


def q_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-N vs consistent-hash-ring key movement when adding a shard
    (8→9, 16 vnodes/shard): zero-shuffle narrow argmin over a literal
    vnode array per key, one 2-row agg."""
    from log_collector_spark.operators.order import shard_rebalance_audit
    return shard_rebalance_audit(_docs(spark, sf_dir))


def q_hourly_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly feed-completeness census per event type: present/missing
    hour buckets over the type's own span + longest silent stretch."""
    from log_collector_spark.operators import seasonal as SE
    return SE.hourly_gap_census(_events(spark, sf_dir))


def q_readability_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Flesch reading-ease band histogram (vowel-group syllable
    proxy) — the no-model prose-vs-legalese curation screen."""
    return _ta().readability_census(_docs(spark, sf_dir))


def q_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-R left-deep join-order decision table from measured
    count/distinct stats over customer–orders–lineitem (CBO parity)."""
    return _an().join_order_advisor(_tbl(spark, sf_dir, "customer"),
                                    _tbl(spark, sf_dir, "orders"),
                                    _tbl(spark, sf_dir, "lineitem"))


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-variance (Neyman) stratified sample allocation across
    sources vs proportional allocation — integer moments + exact isqrt."""
    return _ta().neyman_allocation(_docs(spark, sf_dir))


def q_selectivity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence-assumption selectivity error per (event_type,
    value-band) cell — the multi-column-stats evidence table."""
    return _or().selectivity_correlation_audit(_events(spark, sf_dir))


def q_good_turing_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass + bias-corrected Chao1 vocabulary-size
    estimate from the token frequency-of-frequencies (one row)."""
    return _ta().good_turing_vocab(_docs(spark, sf_dir))


def q_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl concentration of per-source token shares + effective
    source count — the corpus-monoculture dashboard (one row)."""
    return _ta().source_concentration(_docs(spark, sf_dir))


def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 sign-projection (64→16) distance
    distortion histogram over query×corpus pairs, permille deciles."""
    return _te().jl_distortion(_embs(spark, sf_dir))


def q_column_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column value-distribution profile of the events feed (nulls,
    distincts, modal value/share, candidate-key verdict)."""
    return _or().column_profile(_events(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hourly_gap_census": q_hourly_gap_census,
        "readability_census": q_readability_census,
        "join_order_advisor": q_join_order_advisor,
        "neyman_allocation": q_neyman_allocation,
        "selectivity_correlation": q_selectivity_correlation,
        "good_turing_vocab": q_good_turing_vocab,
        "source_concentration": q_source_concentration,
        "jl_distortion": q_jl_distortion,
        "column_profile_events": q_column_profile_events,
        "bm25_topk_documents": q_bm25_topk_documents,
        "quality_calibration_documents": q_quality_calibration_documents,
        "winnowing_pairs_documents": q_winnowing_pairs_documents,
        "shard_rebalance_audit": q_shard_rebalance_audit,
        "log_templates_documents": q_log_templates_documents,
        "vocab_growth_documents": q_vocab_growth_documents,
        "markov_next_event": q_markov_next_event,
        "tx_markov_next_tool": q_tx_markov_next_tool,
        "asof_nearest_events": q_asof_nearest_events,
        "simhash_calibration": q_simhash_calibration,
        "tx_variant_stats": q_tx_variant_stats,
        "ann_mrr_embeddings": q_ann_mrr_embeddings,
        "ann_ndcg_embeddings": q_ann_ndcg_embeddings,
        "kcore_peel_documents": q_kcore_peel_documents,
        "link_jaccard_documents": q_link_jaccard_documents,
        "cusum_changepoint_events": q_cusum_changepoint_events,
        "bloom_fpr_curve_events": q_bloom_fpr_curve_events,
        "temperature_mixture_documents": q_temperature_mixture_documents,
        "rouge_pairs_documents": q_rouge_pairs_documents,
        "dedup_roi_curve_documents": q_dedup_roi_curve_documents,
        "sq8_recall_embeddings": q_sq8_recall_embeddings,
        "benford_audit_events": q_benford_audit_events,
        "mann_whitney_events": q_mann_whitney_events,
        "theil_sen_slope_events": q_theil_sen_slope_events,
        "token_bucket_events": q_token_bucket_events,
        "wilson_rates_events": q_wilson_rates_events,
        "crosscorr_types_events": q_crosscorr_types_events,
        "ann_map_embeddings": q_ann_map_embeddings,
        "rake_phrases_documents": q_rake_phrases_documents,
        "dict_encoding_advisor_events": q_dict_encoding_advisor_events,
        "wav_energy_arrow": q_wav_energy_arrow,
        "watermark_bias_documents": q_watermark_bias_documents,
        "embedding_isotropy": q_embedding_isotropy,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "pca_power_step": q_pca_power_step,
        "pca_alignment": q_pca_alignment,
        "ann_topk_graph": q_ann_topk_graph,
        "silhouette_labels": q_silhouette_labels,
        "slo_burn_alerts": q_slo_burn_alerts,
        "lsh_probe_curve": q_lsh_probe_curve,
        "delete_impact_audit": q_delete_impact_audit,
        "boilerplate_source_matrix": q_boilerplate_source_matrix,
        "tx_cube_tool_usage": q_tx_cube_tool_usage,
        "tx_latency_by_depth": q_tx_latency_by_depth,
        "tx_cold_start": q_tx_cold_start,
        "len_quality_grid_documents": q_len_quality_grid_documents,
        "tx_shape_dupes": q_tx_shape_dupes,
        "tx_latency_mad_udaf": q_tx_latency_mad_udaf,
        "tx_conv_stats_arrow": q_tx_conv_stats_arrow,
        "zonemap_audit_tx": q_zonemap_audit_tx,
        "tx_prefix_cache": q_tx_prefix_cache,
        "tx_schema_drift": q_tx_schema_drift,
        "bigram_coherence_documents": q_bigram_coherence_documents,
        "embedding_norm_audit": q_embedding_norm_audit,
        "tx_token_midpoint": q_tx_token_midpoint,
        "quality_vs_dup_documents": q_quality_vs_dup_documents,
        "seasonal_naive_error_events": q_seasonal_naive_error_events,
        "k_anonymity_events": q_k_anonymity_events,
        "udtf_chunk_documents": q_udtf_chunk_documents,
        "containment_pairs": q_containment_pairs,
        "unpivot_event_metrics": q_unpivot_event_metrics,
        "cluster_size_histogram": q_cluster_size_histogram,
        "wav_energy_documents": q_wav_energy_documents,
        "wav_zcr_documents": q_wav_zcr_documents,
        "ppm_channel_stats_documents": q_ppm_channel_stats_documents,
        "ahash_neardup_documents": q_ahash_neardup_documents,
        "l_diversity_events": q_l_diversity_events,
        "t_closeness_events": q_t_closeness_events,
        "pii_redact_events": q_pii_redact_events,
        "replayed_sequences_events": q_replayed_sequences_events,
        "matryoshka_recall": q_matryoshka_recall,
        "ivm_merge_events": q_ivm_merge_events,
        "corpus_token_yield": q_corpus_token_yield,
        "session_depth_histogram": q_session_depth_histogram,
        "fano_factor_events": q_fano_factor_events,
        "token_tvd_sources": q_token_tvd_sources,
        "tx_parse_health": q_tx_parse_health,
        "resize_ppm_documents": q_resize_ppm_documents,
        "framesample_wav_documents": q_framesample_wav_documents,
        "simpson_diversity_events": q_simpson_diversity_events,
        "tx_latency_bands": q_tx_latency_bands,
        "tx_redundancy": q_tx_redundancy,
        "funnel_latency_events": q_funnel_latency_events,
        "value_jackknife_events": q_value_jackknife_events,
        "broadcast_advisor_tables": q_broadcast_advisor_tables,
        "ks_drift_events": q_ks_drift_events,
        "neardup_label_confusion": q_neardup_label_confusion,
        "tx_tool_latency_percentiles": q_tx_tool_latency_percentiles,
        "tx_retry_storms": q_tx_retry_storms,
        "substring_span_pairs": q_substring_span_pairs,
        "semantic_decontaminate_embeddings": q_semantic_decontaminate,
        "tx_turn_holes": q_tx_turn_holes,
        "tpch_min_cost_supplier": q_tpch_min_cost_supplier,
        "tpch_product_profit": q_tpch_product_profit,
        "tpch_supplier_relationship": q_tpch_supplier_relationship,
        "tpch_excess_stock": q_tpch_excess_stock,
        "edit_distance_pairs": q_edit_distance_pairs,
        "autocorr_hours_events": q_autocorr_hours_events,
        "dow_profile_events": q_dow_profile_events,
        "token_coverage_documents": q_token_coverage_documents,
        "grok_parse_events": q_grok_parse_events,
        "route_events": q_route_events,
        "success_error_events": q_success_error_events,
        "minute_buckets_events": q_minute_buckets_events,
        "broadcast_enrich_revenue": q_broadcast_enrich_revenue,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_shipping_priority": q_tpch_shipping_priority,
        "tpch_local_supplier_volume": q_tpch_local_supplier_volume,
        "tpch_forecast_revenue": q_tpch_forecast_revenue,
        "tpch_promo_share": q_tpch_promo_share,
        "tpch_order_priority": q_tpch_order_priority,
        "tpch_large_orders": q_tpch_large_orders,
        "tpch_returned_items": q_tpch_returned_items,
        "tpch_supplier_share": q_tpch_supplier_share,
        "tpch_priority_class": q_tpch_priority_class,
        "tpch_top_supplier": q_tpch_top_supplier,
        "tpch_disjunctive_revenue": q_tpch_disjunctive_revenue,
        "tpch_prospects": q_tpch_prospects,
        "tpch_order_count_dist": q_tpch_order_count_dist,
        "tpch_small_qty_revenue": q_tpch_small_qty_revenue,
        "tpch_two_nation_volume": q_tpch_two_nation_volume,
        "tpch_waiting_suppliers": q_tpch_waiting_suppliers,
        "tpch_market_share": q_tpch_market_share,
        "freq_spectrum_documents": q_freq_spectrum,
        "sliding_hll_users_events": q_sliding_hll_users,
        "churn_matrix_events": q_churn_matrix,
        "vocab_drift_documents": q_vocab_drift,
        "weighted_sample_documents": q_weighted_sample,
        "decile_lift_events": q_decile_lift,
        "bounce_rate_events": q_bounce_rate,
        "day_bitmask_overlap_events": q_day_bitmask_overlap,
        "rle_audit_events": q_rle_audit,
        "top_users_ties_events": q_top_users_ties,
        "gmd_value_events": q_gmd_value,
        "ip_range_lookup": q_ip_range_lookup,
        "window_lag_events": q_window_lag_events,
        "conversation_stats_events": q_conversation_stats_events,
        "tx_sink_tallies": q_tx_sink_tallies,
        "tx_tool_latency": q_tx_tool_latency,
        "tx_role_alternation": q_tx_role_alternation,
        "tx_conversation_stats": q_tx_conversation_stats,
        "tx_sessions": q_tx_sessions,
        "tx_tokens_by_role_class": q_tx_tokens_by_role_class,
        "tx_response_gaps": q_tx_response_gaps,
        "tx_tool_chain_bigrams": q_tx_tool_chain_bigrams,
        "tx_tool_diversity": q_tx_tool_diversity,
        "tx_role_matrix": q_tx_role_matrix,
        "tx_first_response_ms": q_tx_first_response_ms,
        "tx_slow_streaks": q_tx_slow_streaks,
        "tx_context_cutoff": q_tx_context_cutoff,
        "tx_context_depth": q_tx_context_depth,
        "tx_sft_examples": q_tx_sft_examples,
        "tx_dpo_pairs": q_tx_dpo_pairs,
        "tx_length_bias": q_tx_length_bias,
        "curriculum_stages_documents": q_curriculum_stages_documents,
        "judge_agreement_documents": q_judge_agreement_documents,
        "sq8_recon_embeddings": q_sq8_recon_embeddings,
        "tx_bestofn_gain": q_tx_bestofn_gain,
        "contribution_cap_events": q_contribution_cap_events,
        "dataset_card_documents": q_dataset_card_documents,
        "triplet_mining_embeddings": q_triplet_mining_embeddings,
        "index_plan_advisor_embeddings": q_index_plan_advisor_embeddings,
        "fim_split_documents": q_fim_split_documents,
        "scaling_budget_documents": q_scaling_budget_documents,
        "epoch_shuffle_documents": q_epoch_shuffle_documents,
        "inbatch_negatives_embeddings": q_inbatch_negatives_embeddings,
        "ab_srm_events": q_ab_srm_events,
        "padding_waste_documents": q_padding_waste_documents,
        "order_fingerprint_documents": q_order_fingerprint_documents,
        "latesim_topk_embeddings": q_latesim_topk_embeddings,
        "dp_noise_advisor_events": q_dp_noise_advisor_events,
        "tx_peak_inflight": q_tx_peak_inflight,
        "tx_latency_inversions": q_tx_latency_inversions,
        "gap_histogram_events": q_gap_histogram,
        "ri_audit_tables": q_ri_audit_tables,
        "compaction_plan_tx": q_compaction_plan_tx,
        "join_forecast_tx": q_join_forecast_tx,
        "fingerprint_events_daily": q_fingerprint_events,
        "activity_gini_events": q_activity_gini,
        "tx_per_turn_json": q_tx_per_turn_json,
        "per_file_totals": q_per_file_totals,
        "ngram_jaccard_maxdf": q_ngram_jaccard_maxdf,
        "scan_prune_recent": q_scan_prune_recent,
        "json_flatten_events": q_json_flatten_events,
        "csv_parse_lineitem": q_csv_parse_lineitem,
        "multiline_assemble_events": q_multiline_assemble_events,
        "delta_minute_metrics": q_delta_minute_metrics,
        "quality_score_documents": q_quality_score_documents,
        "lang_id_documents": q_lang_id_documents,
        "lang_id_confusion": q_lang_id_confusion,
        "fingerprint_documents": q_fingerprint_documents,
        "split_documents": q_split_documents,
        "domain_cap_documents": q_domain_cap_documents,
        "decontaminate_documents": q_decontaminate_documents,
        "repetition_documents": q_repetition_documents,
        "vocab_stats_documents": q_vocab_stats_documents,
        "pii_scan_events": q_pii_scan_events,
        "boilerplate_documents": q_boilerplate_documents,
        "kmv_distinct_documents": q_kmv_distinct_documents,
        "kmv_overlap_sources": q_kmv_overlap_sources,
        "top_terms_documents": q_top_terms_documents,
        "exact_dedup_documents": q_exact_dedup_documents,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "keep_best_dedup_documents": q_keep_best_dedup,
        "dedup_clusters_star": q_dedup_clusters_star,
        "simhash_pairs": q_simhash_pairs,
        "embedding_neardup": q_embedding_neardup,
        "split_leakage": q_split_leakage,
        "cluster_split_assign": q_cluster_split_assign,
        "knn_label_consistency": q_knn_label_consistency,
        "ann_topk_brute": q_ann_topk_brute,
        "ann_recall_embeddings": q_ann_recall_embeddings,
        "minhash_estimate_error": q_minhash_estimate_error,
        "ivf_balance_embeddings": q_ivf_balance_embeddings,
        "tokenizer_fertility": q_tokenizer_fertility,
        "packing_efficiency": q_packing_efficiency,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_rrf": q_ann_topk_rrf,
        "ann_topk_ivfadc": q_ann_topk_ivfadc,
        "ivfadc_recall": q_ivfadc_recall,
        "ivf_nprobe_curve": q_ivf_nprobe_curve,
        "multimodal_features": q_multimodal_features,
        "decode_wav_documents": q_decode_wav_documents,
        "bigram_surprisal_documents": q_bigram_surprisal,
        "hll_user_rollup_events": q_hll_user_rollup,
        "mean_shift_hours_events": q_mean_shift_hours,
        "twa_value_events": q_twa_value_events,
        "inverted_index_stats": q_inverted_index_stats,
        "neardup_degree_histogram": q_neardup_degree_histogram,
        "pagerank_step_documents": q_pagerank_step,
        "decode_ppm_documents": q_decode_ppm_documents,
        "decode_png_documents": q_decode_png_documents,
        "png_ahash_documents": q_png_ahash_documents,
        "token_topk_documents": q_token_topk_documents,
        "sessionize_events": q_sessionize_events,
        "asof_enrich_events": q_asof_enrich_events,
        "rollup_time_counts": q_rollup_time_counts,
        "grouping_sets_events": q_grouping_sets_events,
        "bloom_prejoin_events": q_bloom_prejoin_events,
        "coverage_intervals_events": q_coverage_intervals_events,
        "tpch_dead_stock": q_tpch_dead_stock,
        "stratified_sample_documents": q_stratified_sample_documents,
        "attribution_events": q_attribution_events,
        "ewma_hour_counts": q_ewma_hour_counts,
        "zorder_audit_events": q_zorder_audit_events,
        "trend_slope_events": q_trend_slope_events,
        "rolling_median_events": q_rolling_median_events,
        "skew_report_events": q_skew_report_events,
        "triangle_count_documents": q_triangle_count_documents,
        "clustering_coefficient": q_clustering_coefficient,
        "pivot_event_types": q_pivot_event_types,
        "percentile_latency": q_percentile_latency,
        "hist_exact_percentile_latency": q_hist_exact_percentile_latency,
        "incremental_dedup": q_incremental_dedup,
        "chunk_documents": q_chunk_documents,
        "pack_documents": q_pack_documents,
        "schema_profile_events": q_schema_profile_events,
        "hist_percentile_latency": q_hist_percentile_latency,
        "token_rarity_documents": q_token_rarity_documents,
        "locf_backfill_events": q_locf_backfill_events,
        "normalize_documents": q_normalize_documents,
        "cooccur_topk_documents": q_cooccur_topk_documents,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "ngram_jaccard_prefix": q_ngram_jaccard_prefix,
        "funnel_events": q_funnel_events,
        "retention_cohorts": q_retention_cohorts,
        "anomaly_hours_events": q_anomaly_hours_events,
        "interval_join_events": q_interval_join_events,
        "token_budget_documents": q_token_budget_documents,
        "ohlc_hours_events": q_ohlc_hours_events,
        "tfidf_topk_documents": q_tfidf_topk_documents,
        "source_overlap_documents": q_source_overlap_documents,
        "quality_sample_documents": q_quality_sample_documents,
        "keyword_search_documents": q_keyword_search_documents,
        "transition_counts_events": q_transition_counts_events,
        "winsorized_latency": q_winsorized_latency,
        "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
        "rolling_wau_events": q_rolling_wau_events,
        "snapshot_diff_events": q_snapshot_diff_events,
        "label_centroid_embeddings": q_label_centroid_embeddings,
        "trigram_paths_events": q_trigram_paths_events,
        "dq_profile_events": q_dq_profile_events,
        "line_dedup_documents": q_line_dedup_documents,
        "normalized_dedup_documents": q_normalized_dedup_documents,
        "contamination_score_documents": q_contamination_score_documents,
        "mad_outliers_events": q_mad_outliers_events,
        "pq_codes_embeddings": q_pq_codes_embeddings,
        "kcenter_select_embeddings": q_kcenter_select_embeddings,
        "dsir_importance_documents": q_dsir_importance_documents,
        "mixture_weights_documents": q_mixture_weights_documents,
        "kmeans_step_embeddings": q_kmeans_step_embeddings,
        "bpe_pair_counts_documents": q_bpe_pair_counts_documents,
        "new_vs_returning_events": q_new_vs_returning_events,
        "debounce_events": q_debounce_events,
        "scd2_intervals_events": q_scd2_intervals_events,
        "hll_distinct_documents": q_hll_distinct_documents,
        "pct_rank_events": q_pct_rank_events,
        "novelty_score_documents": q_novelty_score_documents,
        "centroid_outliers_embeddings": q_centroid_outliers_embeddings,
        "length_histogram_documents": q_length_histogram_documents,
        "activity_grid_events": q_activity_grid_events,
        "corpus_yield_documents": q_corpus_yield_documents,
        "basket_pairs_events": q_basket_pairs_events,
    }


def oracle_sql() -> dict[str, str]:
    # The transcripts table is engine-generated but fully deterministic
    # (sources/transcripts.py, fixed seed). Generate it here (pure
    # pandas/pyarrow, no JVM; idempotent cache) and hand DuckDB the parquet
    # glob so the tx_* pipeline queries get real value-hash oracles. The
    # malformation markers are plain text predicates: octet_length >= 8192 →
    # oversize, trim = '' → blank, 'corrupt#' prefix → parse failure.
    tx_sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    tx_glob = os.path.join(pl.transcripts_path(tx_sf_dir), "*.parquet")
    tx_view = f"read_parquet('{tx_glob}')"
    tx_sink_case = """
        CASE WHEN strlen(text) >= 8192 THEN 'errors'
             WHEN trim(coalesce(text, '')) = '' THEN NULL
             WHEN text LIKE 'corrupt#%' THEN 'failures'
             ELSE 'transcripts_etl' END
    """
    # Gson record for GROK_EXPR captures + provenance constants, keys in
    # TreeMap order: directory, filename, host, logtime, logtype, payload.
    # payload is a plain string capture (no ;json) whose only
    # escape-relevant characters in the generated corpus are double quotes.
    tx_json = r"""
        '{"directory":"transcripts","filename":"transcripts","host":"spark"'
        || ',"logtime":' || CAST(CAST(epoch_ms(strptime(
               regexp_extract(text, '^\[(\S+)\] \[([^\]]+)\] (.*)$', 2),
               '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS VARCHAR)
        || ',"logtype":"'
        || regexp_extract(text, '^\[(\S+)\] \[([^\]]+)\] (.*)$', 1)
        || '","payload":"'
        || replace(regexp_extract(text, '^\[(\S+)\] \[([^\]]+)\] (.*)$', 3),
                   '"', '\"')
        || '"}'
    """
    line_sql = ("'[' || event_type || '] [' || strftime(ts, '%Y-%m-%d %H:%M:%S')"
                " || '] {\"u\":' || CAST(user_id AS VARCHAR) || '}'")
    sink_case = """
        CASE WHEN event_id % 211 = 0 THEN 'errors'
             WHEN event_id % 97 = 0 THEN NULL
             WHEN event_id % 50 = 0 THEN 'failures'
             ELSE 'events_etl' END
    """
    return {
        "hourly_gap_census": __import__(
            "log_collector_spark.operators.seasonal",
            fromlist=["seasonal"]).sql_hourly_gap_census(),
        "readability_census": _ta().sql_readability_census(),
        "join_order_advisor": _an().sql_join_order_advisor(),
        "neyman_allocation": _ta().sql_neyman_allocation(),
        "selectivity_correlation":
            _or().sql_selectivity_correlation_audit(),
        "good_turing_vocab": _ta().sql_good_turing_vocab(),
        "source_concentration": _ta().sql_source_concentration(),
        "jl_distortion": _te().sql_jl_distortion(),
        "column_profile_events": _or().sql_column_profile(),
        "bm25_topk_documents": _ta().sql_bm25_topk(),
        "quality_calibration_documents": _ta().sql_quality_calibration(),
        "winnowing_pairs_documents": _td().sql_winnowing_pairs(),
        "shard_rebalance_audit": _or().sql_shard_rebalance_audit(),
        "grok_parse_events": f"""
            SELECT event_id,
                   event_type AS logtype,
                   CAST(epoch_ms(date_trunc('second', ts)) AS BIGINT) AS logtime,
                   '{{"u":' || CAST(user_id AS VARCHAR) || '}}' AS payload
            FROM events
        """,
        "route_events": f"""
            SELECT sink, COUNT(*) AS n FROM (
                SELECT {sink_case} AS sink FROM events
            ) WHERE sink IS NOT NULL GROUP BY sink
        """,
        "success_error_events": """
            SELECT event_type,
                   CAST(SUM(CASE WHEN event_id % 211 <> 0 AND event_id % 97 <> 0
                                 AND event_id % 50 <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS success,
                   CAST(SUM(CASE WHEN event_id % 211 = 0
                                 OR (event_id % 97 <> 0 AND event_id % 50 = 0)
                            THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   COUNT(*) AS lines
            FROM events GROUP BY event_type
        """,
        "minute_buckets_events": """
            SELECT CAST(CEIL(epoch_ms(date_trunc('second', ts)) / 60000.0) * 60000
                        AS BIGINT) AS bucket_ms,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "broadcast_enrich_revenue": """
            SELECT r.r_name AS region_name,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "tpch_pricing_summary": _an().sql_pricing_summary(),
        "tpch_shipping_priority": _an().sql_shipping_priority(),
        "tpch_local_supplier_volume": _an().sql_local_supplier_volume(),
        "tpch_forecast_revenue": _an().sql_forecast_revenue(),
        "tpch_promo_share": _an().sql_promo_revenue_share(),
        "tpch_order_priority": _an().sql_order_priority_counts(),
        "tpch_large_orders": _an().sql_large_order_customers(),
        "tpch_dead_stock": _an().sql_dead_stock(),
        "tpch_returned_items": _an().sql_returned_item_customers(),
        "tpch_supplier_share": _an().sql_supplier_revenue_share(),
        "tpch_priority_class": _an().sql_priority_class_lines(),
        "tpch_top_supplier": _an().sql_top_supplier(),
        "tpch_disjunctive_revenue": _an().sql_disjunctive_revenue(),
        "tpch_prospects": _an().sql_prospect_customers(),
        "tpch_order_count_dist": _an().sql_order_count_distribution(),
        "tpch_small_qty_revenue": _an().sql_small_quantity_revenue(),
        "tpch_two_nation_volume": _an().sql_two_nation_volume(),
        "tpch_waiting_suppliers": _an().sql_waiting_suppliers(),
        "tpch_market_share": _an().sql_market_share(),
        "freq_spectrum_documents": _ta().sql_freq_spectrum(),
        "sliding_hll_users_events": _ta().sql_sliding_hll_users(),
        "churn_matrix_events": _bh().sql_churn_matrix(),
        "vocab_drift_documents": _ta().sql_vocab_drift(),
        "weighted_sample_documents": _ta().sql_weighted_sample(),
        "decile_lift_events": _bh().sql_decile_lift(),
        "bounce_rate_events": _bh().sql_bounce_rate(),
        "day_bitmask_overlap_events": _ag().sql_day_bitmask_overlap(),
        "rle_audit_events": _or().sql_rle_audit(),
        "top_users_ties_events": _bh().sql_top_users_with_ties(),
        "gmd_value_events": _bh().sql_gini_mean_difference(),
        "stratified_sample_documents": _ta().sql_stratified_sample(),
        "attribution_events": _bh().sql_last_touch_attribution(),
        "ewma_hour_counts": agg_ops.sql_ewma_hour_counts(),
        "zorder_audit_events": _od().sql_zorder_layout_audit(),
        "trend_slope_events": agg_ops.sql_trend_slope_counts(),
        "rolling_median_events": agg_ops.sql_rolling_median_counts(),
        "skew_report_events": agg_ops.sql_skew_report(),
        "triangle_count_documents": _te().sql_triangle_count(),
        "clustering_coefficient": _te().sql_clustering_coefficient(),
        "ip_range_lookup": """
            WITH ranges AS (
                SELECT * FROM (VALUES
                    (CAST(167772160 AS BIGINT), CAST(167788543 AS BIGINT), 'ZoneA'),
                    (167788544, 167804927, 'ZoneB'),
                    (167804928, 167821311, 'ZoneC'),
                    (167821312, 167837695, 'ZoneD')
                ) AS t(startn, endn, sugo_nation)
            ), ips AS (
                SELECT event_id,
                       167772160
                       + (user_id % 256) * 256
                       + (event_id % 256) AS ipn
                FROM events
            )
            SELECT r.sugo_nation, COUNT(*) AS n
            FROM ips i JOIN ranges r ON i.ipn >= r.startn AND i.ipn <= r.endn
            GROUP BY r.sugo_nation
        """,
        "window_lag_events": """
            SELECT event_id, user_id,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                       AS prev_type,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
                       AS INT) AS rn
            FROM events
        """,
        "conversation_stats_events": """
            SELECT user_id,
                   COUNT(*) AS n_events,
                   CAST(epoch_ms(MIN(ts)) AS BIGINT) AS first_ms,
                   CAST(epoch_ms(MAX(ts)) AS BIGINT) AS last_ms,
                   COUNT(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id
        """,
        # tx_* queries: strong byte-equality oracle also lives in
        # tests/test_pipeline_spark.py; these SQL oracles are independent
        # reconstructions from the deterministic transcripts parquet.
        "tx_sink_tallies": f"""
            SELECT sink, COUNT(*) AS n FROM (
                SELECT {tx_sink_case} AS sink FROM {tx_view}
            ) WHERE sink IS NOT NULL GROUP BY sink
        """,
        "tx_tool_latency": _tx().sql_tool_latency(tx_view),
        "tx_role_alternation": _tx().sql_role_alternation(tx_view),
        "tx_conversation_stats": _tx().sql_conversation_stats_ms(tx_view),
        "tx_sessions": _cstate().sql_gap_sessions(tx_view),
        "tx_tokens_by_role_class": _tx().sql_tokens_by_role_class(tx_view),
        "tx_response_gaps": _tx().sql_response_gaps(tx_view),
        "tx_tool_chain_bigrams": _tx().sql_tool_chain_bigrams(tx_view),
        "tx_tool_diversity": _tx().sql_tool_diversity(tx_view),
        "tx_role_matrix": _tx().sql_role_matrix(tx_view),
        "tx_first_response_ms": _tx().sql_first_response_ms(tx_view),
        "tx_slow_streaks": _tx().sql_slow_streaks(tx_view),
        "tx_context_cutoff": _tx().sql_context_cutoff(tx_view),
        "tx_context_depth": _tx().sql_context_depth(tx_view),
        "tx_sft_examples": _tx().sql_sft_examples(tx_view),
        "tx_dpo_pairs": _tx().sql_dpo_pairs(tx_view),
        "tx_length_bias": _tx().sql_length_bias(tx_view),
        "curriculum_stages_documents": _ta().sql_curriculum_stages(),
        "judge_agreement_documents": _ta().sql_judge_agreement(),
        "sq8_recon_embeddings": _ts().sql_sq8_recon_error(),
        "tx_bestofn_gain": _tx().sql_bestofn_gain(tx_view),
        "contribution_cap_events": _bh().sql_contribution_cap(),
        "dataset_card_documents": _ta().sql_dataset_card(),
        "triplet_mining_embeddings": _ts().sql_triplet_mining(),
        "index_plan_advisor_embeddings": _ts().sql_index_plan_advisor(),
        "fim_split_documents": _ta().sql_fim_split(),
        "scaling_budget_documents": _ta().sql_scaling_budget_advisor(),
        "epoch_shuffle_documents": _ta().sql_epoch_shuffle_audit(),
        "inbatch_negatives_embeddings": _ts().sql_inbatch_negatives(),
        "ab_srm_events": _bh().sql_ab_srm(),
        "padding_waste_documents": _ta().sql_padding_waste(),
        "order_fingerprint_documents": _ta().sql_data_order_fingerprint(),
        "latesim_topk_embeddings": _ts().sql_latesim_topk(),
        "dp_noise_advisor_events": _bh().sql_dp_noise_advisor(),
        "tx_peak_inflight": _tx().sql_peak_inflight(tx_view),
        "tx_latency_inversions": _tx().sql_latency_inversions(tx_view),
        "gap_histogram_events": _bh().sql_gap_histogram("events"),
        "ri_audit_tables": _bh().sql_ri_audit([
            ("events_user_customer", "user_id", "events",
             "c_custkey", "customer"),
            ("lineitem_orders", "l_orderkey", "lineitem",
             "o_orderkey", "orders"),
            ("lineitem_part", "l_partkey", "lineitem",
             "p_partkey", "part"),
            ("orders_customer", "o_custkey", "orders",
             "c_custkey", "customer"),
            ("tx_role_lookup", "role", tx_view, "role",
             "(VALUES ('user'), ('assistant'), ('system'), ('tool'))"
             " AS rl(role)"),
        ]),
        "compaction_plan_tx": _or().sql_compaction_plan(tx_glob),
        "join_forecast_tx": _ag().sql_join_size_forecast(
            tx_view, "conv_id", tx_view, "conv_id"),
        "fingerprint_events_daily": _bh().sql_table_fingerprint(
            "events",
            "(epoch_us(ts) - epoch_us(ts) % 86400000000) / 86400000000",
            "concat_ws('|', event_id, user_id, event_type, "
            "CAST(epoch_us(ts) AS VARCHAR))"),
        "activity_gini_events": _bh().sql_activity_gini(),
        "tx_per_turn_json": f"""
            SELECT conv_id, turn_idx, {tx_json} AS parsed_json
            FROM {tx_view}
            WHERE strlen(text) < 8192
              AND trim(coalesce(text, '')) <> ''
              AND text NOT LIKE 'corrupt#%'
        """,
        "per_file_totals": f"""
            SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
                   COUNT(*) AS lines,
                   CAST(SUM(CASE WHEN strlen(text) >= 8192
                                   OR text LIKE 'corrupt#%'
                            THEN 1 ELSE 0 END) AS BIGINT) AS error
            FROM read_parquet('{tx_glob}', filename=true)
            GROUP BY 1
        """,
        "ngram_jaccard_maxdf": _td().sql_ngram_jaccard_pairs_maxdf(),
        "scan_prune_recent": """
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(MIN(epoch_ms(date_trunc('second', ts))) AS BIGINT)
                       AS first_ms
            FROM events
            WHERE ts >= TIMESTAMP '2023-11-17 00:00:00'
            GROUP BY event_type
        """,
        "json_flatten_events": """
            SELECT event_id,
                   '{"k":"v","logtime":'
                   || CAST(CAST(epoch_ms(date_trunc('second', ts)) AS BIGINT)
                           AS VARCHAR)
                   || ',"logtype":"' || event_type || '","u":'
                   || CAST(user_id AS VARCHAR) || '.0}' AS parsed_json
            FROM events
        """,
        "csv_parse_lineitem": """
            SELECT l_orderkey AS src_key,
                   l_linenumber AS src_line,
                   l_orderkey AS okey,
                   CAST(l_linenumber AS INT) AS lineno,
                   CASE WHEN l_orderkey % 13 = 0 THEN 'X'
                        WHEN l_linenumber % 5 = 0 THEN 'X'
                        ELSE l_returnflag END AS flag,
                   CASE WHEN l_orderkey % 13 = 0 THEN NULL
                        ELSE CAST(epoch_ms(date_trunc('second', l_shipdate))
                                  AS BIGINT) END AS ship,
                   TRUE AS csv_ok
            FROM lineitem
        """,
        "multiline_assemble_events": """
            WITH lines AS (
                SELECT 'f' || CAST(event_id % 4 AS VARCHAR) AS filename,
                       event_id * 4 AS line_no,
                       '[' || event_type || '] e' || CAST(event_id AS VARCHAR) AS text
                FROM events
                UNION ALL
                SELECT 'f' || CAST(event_id % 4 AS VARCHAR),
                       event_id * 4 + 1,
                       '  at frame/' || CAST(event_id AS VARCHAR)
                FROM events WHERE event_id % 5 = 0
                UNION ALL
                SELECT 'f' || CAST(event_id % 4 AS VARCHAR),
                       event_id * 4 + 2, '  at deeper/frame'
                FROM events WHERE event_id % 5 = 0
                UNION ALL
                SELECT 'f' || CAST(event_id % 4 AS VARCHAR),
                       event_id * 4 + 3, ''
                FROM events WHERE event_id % 11 = 0
            ), nb AS (
                SELECT * FROM lines WHERE trim(text) <> ''
            ), recs AS (
                SELECT *, SUM(CASE WHEN regexp_full_match(text, '\\[.*')
                                   THEN 1 ELSE 0 END)
                          OVER (PARTITION BY filename ORDER BY line_no) AS rec
                FROM nb
            )
            SELECT filename AS file,
                   CAST(rec AS BIGINT) AS record_id,
                   MIN(line_no) AS first_line_no,
                   COUNT(*) AS n_lines,
                   string_agg(text, '' ORDER BY line_no) AS record
            FROM recs GROUP BY filename, rec
        """,
        "delta_minute_metrics": """
            WITH counts AS (
                SELECT CAST(CEIL(epoch_ms(date_trunc('second', ts)) / 60000.0)
                            * 60000 AS BIGINT) AS bucket_ms,
                       COUNT(*) AS n
                FROM events GROUP BY 1
            )
            SELECT bucket_ms, n,
                   CAST(n - COALESCE(LAG(n) OVER (ORDER BY bucket_ms), 0)
                        AS BIGINT) AS delta
            FROM counts
        """,
        "quality_score_documents": _ta().sql_quality_features(),
        "lang_id_documents": _ta().sql_lang_id(),
        "lang_id_confusion": _ta().sql_lang_id_confusion(),
        "fingerprint_documents": _ta().sql_fingerprint(),
        "split_documents": _ta().sql_split_assign(),
        "domain_cap_documents": _ta().sql_domain_cap(cap=10),
        "decontaminate_documents": _td().sql_decontaminate(),
        "repetition_documents": _ta().sql_repetition_signals(),
        "vocab_stats_documents": _ta().sql_vocab_stats(),
        "pii_scan_events": _ta().sql_pii_scan(),
        "boilerplate_documents": _td().sql_boilerplate_segments(),
        "kmv_distinct_documents": _ta().sql_kmv_distinct(),
        "kmv_overlap_sources": _ta().sql_kmv_overlap(),
        "top_terms_documents": _ta().sql_top_terms_per_source(),
        "exact_dedup_documents": _td().sql_exact_dedup_summary(),
        "ngram_jaccard_pairs": _td().sql_ngram_jaccard_pairs(),
        "minhash_lsh_pairs": _td().sql_minhash_lsh_pairs(),
        "dedup_clusters": _td().sql_dedup_clusters(),
        "keep_best_dedup_documents": _td().sql_keep_best_per_cluster(),
        # same closure oracle as dedup_clusters — the algorithms must agree
        "dedup_clusters_star": _td().sql_dedup_clusters(),
        "simhash_pairs": _td().sql_simhash_pairs(),
        "embedding_neardup": _td().sql_embedding_neardup_pairs(),
        "split_leakage": _td().sql_split_leakage(),
        "cluster_split_assign": _td().sql_cluster_split_assign(),
        "knn_label_consistency": _ts().sql_knn_label_consistency(),
        "ann_topk_brute": _ts().sql_brute_force_topk(),
        "ann_recall_embeddings": _te().sql_ann_recall(),
        "minhash_estimate_error": _te().sql_minhash_estimate_error(),
        "ivf_balance_embeddings": _te().sql_ivf_balance(),
        "tokenizer_fertility": _te().sql_tokenizer_fertility(),
        "packing_efficiency": _te().sql_packing_efficiency(),
        "ann_topk_lsh": _ts().sql_lsh_ann_topk(),
        "ann_topk_ivf": _ts().sql_ivf_ann_topk(),
        "ann_topk_rrf": _ts().sql_rrf_fusion_topk(),
        "ann_topk_ivfadc": _ts().sql_ivfadc_ann_topk(),
        "ivfadc_recall": _te().sql_ivfadc_recall(),
        "ivf_nprobe_curve": _te().sql_ivf_nprobe_curve(),
        "multimodal_features": _tm().sql_fake_features(),
        "decode_wav_documents": _tm().sql_decode_wav_features(),
        "bigram_surprisal_documents": _lm().sql_bigram_surprisal(),
        "hll_user_rollup_events": _ta().sql_hll_user_rollup(),
        "mean_shift_hours_events": _cp().sql_mean_shift_hours(),
        "twa_value_events": _bh().sql_twa_value(),
        "inverted_index_stats": _tix().sql_inverted_index_stats(),
        "neardup_degree_histogram": _te().sql_neardup_degree_histogram(),
        "pagerank_step_documents": _te().sql_pagerank_step(),
        "decode_ppm_documents": _tm().sql_decode_ppm_features(),
        "decode_png_documents": _tm().sql_decode_png_features(),
        "png_ahash_documents": _tm().sql_ahash_png_features(),
        "token_topk_documents": """
            WITH counts AS (
                SELECT t AS token, COUNT(*) AS n
                FROM (SELECT unnest(list_filter(
                        string_split_regex(text, '\\s+'), x -> x <> '')) AS t
                      FROM documents)
                GROUP BY 1
            )
            SELECT token, n, CAST(rank AS INT) AS rank FROM (
                SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
                FROM counts
            ) WHERE rank <= 20
        """,
        "sessionize_events": """
            WITH base AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(date_trunc('second', ts))
                                    - epoch_us(date_trunc('second',
                                               lag(ts) OVER w))
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_id
                FROM base
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events,
                   MIN(event_id) AS first_event,
                   MAX(event_id) AS last_event
            FROM s GROUP BY 1, 2
        """,
        "asof_enrich_events": """
            WITH markers AS (
                SELECT user_id, event_id AS upd_id, event_type AS upd_type
                FROM events WHERE event_id % 101 = 0
            )
            SELECT e.event_id, e.user_id, m.upd_id, m.upd_type
            FROM events e
            ASOF LEFT JOIN markers m
              ON e.user_id = m.user_id AND e.event_id >= m.upd_id
        """,
        "rollup_time_counts": """
            WITH keyed AS (
                SELECT ms - ms % 86400000 AS day_ms,
                       ms - ms % 3600000 AS hour_ms,
                       ms - ms % 60000 AS minute_ms
                FROM (SELECT CAST(epoch_ms(date_trunc('second', ts)) AS BIGINT)
                          AS ms FROM events)
            )
            SELECT COALESCE(day_ms, -1) AS day_ms,
                   COALESCE(hour_ms, -1) AS hour_ms,
                   COALESCE(minute_ms, -1) AS minute_ms,
                   COUNT(*) AS n
            FROM keyed GROUP BY ROLLUP(day_ms, hour_ms, minute_ms)
        """,
        "grouping_sets_events": agg_ops.sql_grouping_sets_counts(),
        "bloom_prejoin_events": _en().sql_bloom_prejoin_summary(
            "SELECT event_id FROM events",
            "SELECT event_id FROM events WHERE event_type = 'purchase'",
            "event_id"),
        "pivot_event_types": agg_ops.sql_pivot_counts(EVENT_TYPES),
        "percentile_latency": f"""
            WITH lat AS (
                SELECT event_type,
                       {_tc().sql_h60("CAST(event_id AS VARCHAR)")} % 5000 AS v
                FROM events
            ), ranked AS (
                SELECT event_type, v,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                           AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS cnt
                FROM lat
            )
            SELECT event_type,
                   CAST(MAX(cnt) AS BIGINT) AS n,
                   CAST(MAX(CASE WHEN rn = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT) + 1
                                 THEN v END) AS BIGINT) AS p50,
                   CAST(MAX(CASE WHEN rn = CAST(FLOOR(0.95 * (cnt - 1)) AS BIGINT) + 1
                                 THEN v END) AS BIGINT) AS p95,
                   CAST(MAX(CASE WHEN rn = CAST(FLOOR(0.99 * (cnt - 1)) AS BIGINT) + 1
                                 THEN v END) AS BIGINT) AS p99
            FROM ranked GROUP BY event_type
        """,
        "incremental_dedup": _td().sql_incremental_dedup(
            new_pred="doc_id % 7 <> 0", seen_pred="doc_id % 7 = 0"),
        "chunk_documents": _tk().sql_chunk_documents(),
        "udtf_chunk_documents": _tk().sql_chunk_documents(),
        "pack_documents": _tk().sql_pack_sequences(),
        "token_rarity_documents": _ta().sql_token_rarity(),
        "locf_backfill_events": """
            WITH src AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN event_id % 7 = 0 THEN NULL
                            ELSE event_id % 1000 END AS raw_v
                FROM events
            )
            SELECT event_id, user_id,
                   CAST(raw_v AS BIGINT) AS raw_v,
                   CAST(LAST_VALUE(raw_v IGNORE NULLS) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS filled_v
            FROM src
        """,
        "normalize_documents": _ta().sql_normalize_profile(),
        "cooccur_topk_documents": _ta().sql_cooccur_topk(),
        "cms_heavy_hitters": _ta().sql_cms_heavy_hitters(),
        # the brute-force all-pairs SQL doubles as the losslessness proof of
        # the prefix-filtered candidate generation (identical pair set)
        "ngram_jaccard_prefix": _td().sql_ngram_jaccard_pairs(),
        "hist_exact_percentile_latency":
            _ag().sql_histogram_exact_percentiles(
                "events", "event_type",
                f"{_tc().sql_h60('CAST(event_id AS VARCHAR)')} % 5000",
                {"p50": 0.5, "p95": 0.95, "p99": 0.99}),
        "hist_percentile_latency": f"""
            WITH lat AS (
                SELECT event_type,
                       {_tc().sql_h60("CAST(event_id AS VARCHAR)")} % 5000 AS v
                FROM events
            ), bins AS (
                SELECT event_type, (v // 100) * 100 AS bin, COUNT(*) AS c
                FROM lat GROUP BY event_type, bin
            ), cum AS (
                SELECT event_type, bin,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY bin)
                           AS cum,
                       SUM(c) OVER (PARTITION BY event_type) AS n
                FROM bins
            )
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(MIN(CASE WHEN cum >= FLOOR(0.5 * (n - 1)) + 1
                                 THEN bin END) AS BIGINT) AS p50_lo,
                   CAST(MIN(CASE WHEN cum >= FLOOR(0.95 * (n - 1)) + 1
                                 THEN bin END) AS BIGINT) AS p95_lo,
                   CAST(MIN(CASE WHEN cum >= FLOOR(0.99 * (n - 1)) + 1
                                 THEN bin END) AS BIGINT) AS p99_lo
            FROM cum GROUP BY event_type
        """,
        "schema_profile_events": f"""
            WITH src AS (
                SELECT event_type,
                       CASE WHEN event_id % 7 = 0 THEN
                                '{{"k":' || CAST(event_id % 100 AS VARCHAR)
                                || ',"extra":"x","u":'
                                || CAST(user_id AS VARCHAR) || '}}'
                            WHEN event_id % 13 = 0 THEN 'not json'
                            ELSE props END AS props
                FROM events
            ), ex AS (
                SELECT event_type,
                       unnest(CASE WHEN json_valid(props)
                                   AND json_type(props) = 'OBJECT'
                              THEN json_keys(props)
                              ELSE [] END) AS key
                FROM src
            ), per AS (
                SELECT event_type, key, CAST(COUNT(*) AS BIGINT) AS n
                FROM ex GROUP BY event_type, key
            ), totals AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
                FROM src GROUP BY event_type
            )
            SELECT p.event_type, p.key, p.n, t.n_rows,
                   {_tc().sql_permille("p.n", "t.n_rows")} AS permille
            FROM per p JOIN totals t USING (event_type)
        """,
        "funnel_events": _bh().sql_funnel_counts(),
        "retention_cohorts": _bh().sql_retention_cohorts(),
        "anomaly_hours_events": _bh().sql_hour_anomaly_flags(),
        # plain inequality join — DuckDB's IEJoin is the independent
        # implementation proving the bucketized equi-join is lossless
        "coverage_intervals_events": _iv().sql_interval_coverage(
            "events", "user_id",
            "epoch_ms(date_trunc('second', ts))"),
        "interval_join_events": """
            WITH wins AS (
                SELECT event_id AS window_id,
                       epoch_us(ts) AS start_us,
                       epoch_us(ts) + 600000000 AS end_us
                FROM events WHERE event_id % 97 = 0
            )
            SELECT w.window_id, e.event_id
            FROM wins w JOIN events e
              ON epoch_us(e.ts) >= w.start_us
             AND epoch_us(e.ts) < w.end_us
        """,
        "token_budget_documents": _ta().sql_token_budget_sample(),
        "ohlc_hours_events": _bh().sql_ohlc_hours(),
        "tfidf_topk_documents": _ta().sql_tfidf_topk(),
        "source_overlap_documents": _ta().sql_source_overlap(),
        "quality_sample_documents": _ta().sql_quality_sample(),
        "keyword_search_documents": _ta().sql_keyword_search(),
        "transition_counts_events": _bh().sql_transition_counts(),
        "winsorized_latency": f"""
            WITH lat AS (
                SELECT event_type,
                       {_tc().sql_h60("CAST(event_id AS VARCHAR)")} % 5000 AS v
                FROM events
            ), ranked AS (
                SELECT event_type, v,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                           AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS cnt
                FROM lat
            ), bounds AS (
                SELECT event_type,
                       MAX(CASE WHEN rn = CAST(FLOOR(0.05 * (cnt - 1)) AS BIGINT) + 1
                                THEN v END) AS lo,
                       MAX(CASE WHEN rn = CAST(FLOOR(0.95 * (cnt - 1)) AS BIGINT) + 1
                                THEN v END) AS hi
                FROM ranked GROUP BY event_type
            )
            SELECT l.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(GREATEST(b.lo, LEAST(b.hi, l.v))) AS BIGINT)
                       AS sum_w,
                   CAST(MIN(GREATEST(b.lo, LEAST(b.hi, l.v))) AS BIGINT)
                       AS min_w,
                   CAST(MAX(GREATEST(b.lo, LEAST(b.hi, l.v))) AS BIGINT)
                       AS max_w
            FROM lat l JOIN bounds b USING (event_type)
            GROUP BY 1
        """,
        "semantic_dedup_embeddings": _td().sql_clusters_over(
            _td().sql_embedding_neardup_guarded(), "vec_a", "vec_b"),
        "rolling_wau_events": _bh().sql_rolling_active_users(),
        "snapshot_diff_events": f"""
            WITH base AS (
                SELECT event_id, event_type, user_id,
                       CAST(ROUND(value * 1000) AS BIGINT) AS vq
                FROM events
            ), newsnap AS (
                SELECT event_id, event_type, user_id,
                       vq + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS vq
                FROM base WHERE event_id % 13 <> 0
                UNION ALL
                SELECT event_id + 10000000, event_type, user_id, vq
                FROM base WHERE event_id % 101 = 0
            ), o AS (
                SELECT event_id AS k,
                       {_tc().sql_h60("CAST(event_id AS VARCHAR) || '|' || event_type || '|' || CAST(user_id AS VARCHAR) || '|' || CAST(vq AS VARCHAR)")} AS h_old
                FROM base
            ), n AS (
                SELECT event_id AS k,
                       {_tc().sql_h60("CAST(event_id AS VARCHAR) || '|' || event_type || '|' || CAST(user_id AS VARCHAR) || '|' || CAST(vq AS VARCHAR)")} AS h_new
                FROM newsnap
            )
            SELECT COALESCE(o.k, n.k) AS event_id,
                   CASE WHEN o.h_old IS NULL THEN 'added'
                        WHEN n.h_new IS NULL THEN 'removed'
                        WHEN o.h_old <> n.h_new THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM o FULL OUTER JOIN n ON o.k = n.k
        """,
        "label_centroid_embeddings": _ts().sql_label_centroid_stats(),
        "trigram_paths_events": _bh().sql_trigram_paths(),
        "dq_profile_events": f"""
            WITH src AS (
                SELECT event_id, ts, user_id, event_type, value,
                       CASE WHEN event_id % 7 = 0 THEN
                                '{{"k":' || CAST(event_id % 100 AS VARCHAR)
                                || ',"extra":"x","u":'
                                || CAST(user_id AS VARCHAR) || '}}'
                            WHEN event_id % 13 = 0 THEN 'not json'
                            ELSE props END AS props
                FROM events
            )
            {_bh().sql_dq_profile("src")}
        """,
        "line_dedup_documents": _td().sql_line_dedup(),
        "normalized_dedup_documents": _td().sql_normalized_dedup(),
        "contamination_score_documents": _td().sql_contamination_score(),
        "mad_outliers_events": _bh().sql_mad_outliers(),
        "pq_codes_embeddings": _ts().sql_pq_codes(),
        "kcenter_select_embeddings": _ts().sql_k_center_select(),
        "dsir_importance_documents": _lm().sql_dsir_importance(),
        "mixture_weights_documents": _ta().sql_mixture_weights(),
        "kmeans_step_embeddings": _ts().sql_kmeans_step(),
        "bpe_pair_counts_documents": _ta().sql_bpe_pair_counts(),
        "new_vs_returning_events": _bh().sql_new_vs_returning(),
        "debounce_events": _bh().sql_debounce_events(),
        "scd2_intervals_events": _bh().sql_scd2_intervals(),
        "hll_distinct_documents": _ta().sql_hll_distinct(),
        "pct_rank_events": _bh().sql_pct_rank_events(),
        "novelty_score_documents": _td().sql_novelty_score(),
        "centroid_outliers_embeddings": _ts().sql_centroid_outliers(),
        "length_histogram_documents": _ta().sql_length_histogram(),
        "activity_grid_events": _bh().sql_activity_grid(),
        "corpus_yield_documents": _td().sql_corpus_yield(),
        "basket_pairs_events": _bh().sql_basket_pairs(),
        "tpch_min_cost_supplier": _aps().sql_min_cost_supplier(),
        "tpch_product_profit": _aps().sql_product_type_profit(),
        "tpch_supplier_relationship": _aps().sql_supplier_relationship(),
        "tpch_excess_stock": _aps().sql_excess_stock_suppliers(),
        "edit_distance_pairs": _ted().sql_edit_distance_pairs(),
        "autocorr_hours_events": _se().sql_autocorr_hourly(),
        "seasonal_naive_error_events": _se().sql_seasonal_naive_error(),
        "k_anonymity_events": _bh().sql_k_anonymity(),
        "containment_pairs": _tcn().sql_containment_pairs(),
        "unpivot_event_metrics": _rs().sql_unpivot_event_metrics(),
        "cluster_size_histogram": _td().sql_cluster_size_histogram(),
        "wav_energy_documents": _tm().sql_wav_energy_features(),
        "wav_zcr_documents": _tm().sql_wav_zcr_features(),
        "ppm_channel_stats_documents": _tm().sql_ppm_channel_stats_features(),
        "ahash_neardup_documents": _tm().sql_ahash_neardup_pairs(),
        "l_diversity_events": _bh().sql_l_diversity(),
        "t_closeness_events": _bh().sql_t_closeness(),
        "pii_redact_events": _ta().sql_pii_redact(),
        "replayed_sequences_events": _bh().sql_replayed_sequences(),
        "matryoshka_recall": _te().sql_matryoshka_recall(),
        "ivm_merge_events": _ag().sql_ivm_merge_counts(),
        "dow_profile_events": _se().sql_dow_hour_profile(),
        "token_coverage_documents": _ta().sql_token_coverage_cutoff(),
        "substring_span_pairs": _td().sql_substring_span_pairs(),
        "semantic_decontaminate_embeddings":
            _td().sql_semantic_decontaminate(),
        "tx_turn_holes": _tx().sql_turn_holes(tx_view),
        "tx_tool_latency_percentiles":
            _tx().sql_tool_latency_percentiles(tx_view),
        "tx_retry_storms": _tx().sql_retry_storms(tx_view),
        "ks_drift_events": _bh().sql_ks_drift(),
        "neardup_label_confusion": _td().sql_neardup_label_confusion(),
        "funnel_latency_events": _bh().sql_funnel_latency(),
        "value_jackknife_events": _bh().sql_value_jackknife(),
        "broadcast_advisor_tables": _or().sql_broadcast_advisor({
            "region": (["r_name"], 1),
            "nation": (["n_name"], 2),
            "supplier": (["s_name"], 3),
            "customer": (["c_name", "c_mktsegment"], 3),
            "part": (["p_name", "p_brand", "p_type"], 3),
        }),
        "simpson_diversity_events": _bh().sql_simpson_diversity(),
        "tx_latency_bands": _tx().sql_latency_bands_hourly(tx_view),
        "tx_redundancy": _tx().sql_conversation_redundancy(tx_view),
        "resize_ppm_documents": _tm().sql_resize_ppm_features(),
        "framesample_wav_documents": _tm().sql_framesample_wav_features(),
        "fano_factor_events": _bh().sql_fano_factor(),
        "token_tvd_sources": _ta().sql_token_tvd_sources(),
        "tx_parse_health": _tx().sql_parse_health_hourly(tx_view),
        "log_templates_documents": _mi().sql_log_templates(),
        "vocab_growth_documents": _mi().sql_vocab_growth(),
        "markov_next_event": _mi().sql_markov_next_event(),
        "tx_markov_next_tool": _mi().sql_markov_next_event(
            table=f"(SELECT conv_id, turn_idx, tool FROM {tx_view} "
                  f"WHERE {_tx().SQL_CLEAN} AND tool IS NOT NULL)",
            key_col="conv_id", seq_col="turn_idx", type_col="tool"),
        "asof_nearest_events": _sql_asof_nearest_events(),
        "simhash_calibration": _te().sql_simhash_calibration(),
        "tx_variant_stats": _tx().sql_variant_payload_stats(tx_view),
        "ann_mrr_embeddings": _te().sql_ann_mrr(),
        "ann_ndcg_embeddings": _te().sql_ann_ndcg(),
        "kcore_peel_documents": _te().sql_kcore_peel(),
        "link_jaccard_documents": _te().sql_link_jaccard(),
        "cusum_changepoint_events": _se().sql_cusum_changepoint(),
        "bloom_fpr_curve_events": _en().sql_bloom_fpr_curve(),
        "temperature_mixture_documents": _ta().sql_temperature_mixture(),
        "rouge_pairs_documents": _ta().sql_rouge_pairs(),
        "dedup_roi_curve_documents": _td().sql_dedup_roi_curve(),
        "sq8_recall_embeddings": _te().sql_sq8_recall(),
        "benford_audit_events": _bh().sql_benford_audit(),
        "mann_whitney_events": _bh().sql_mann_whitney_u(),
        "theil_sen_slope_events": _se().sql_theil_sen_slope(),
        "token_bucket_events": _bh().sql_token_bucket(),
        "wilson_rates_events": _bh().sql_wilson_rates(),
        "crosscorr_types_events": _se().sql_crosscorr_types(),
        "ann_map_embeddings": _te().sql_ann_map(),
        "rake_phrases_documents": _ta().sql_rake_phrases(),
        "dict_encoding_advisor_events": _od().sql_dict_encoding_advisor(),
        "wav_energy_arrow": _tm().sql_wav_energy_features(),
        "watermark_bias_documents": _ta().sql_watermark_bias(),
        "embedding_isotropy": _ts().sql_embedding_isotropy(),
        "dup_ngram_coverage": _td().sql_dup_ngram_coverage(),
        "pca_power_step": _ts().sql_pca_power_step(),
        "pca_alignment": _ts().sql_pca_alignment(),
        "ann_topk_graph": _ts().sql_graph_ann_topk(),
        "silhouette_labels": _ts().sql_silhouette_labels(),
        "slo_burn_alerts": _bh().sql_slo_burn_alerts(),
        "lsh_probe_curve": _te().sql_lsh_probe_curve(),
        "delete_impact_audit": _or().sql_delete_impact_audit(tx_glob),
        "boilerplate_source_matrix": _td().sql_boilerplate_source_matrix(),
        "tx_cube_tool_usage": _tx().sql_cube_tool_usage(tx_view),
        "tx_latency_by_depth": _tx().sql_latency_by_depth(tx_view),
        "tx_cold_start": _tx().sql_cold_start_ratio(tx_view),
        "len_quality_grid_documents": _ta().sql_len_quality_grid(),
        "tx_shape_dupes": _tx().sql_shape_dupes(tx_view),
        "tx_latency_mad_udaf": _tx().sql_tool_latency_mad(tx_view),
        "tx_conv_stats_arrow": _tx().sql_conv_stats_arrow(tx_view),
        "zonemap_audit_tx": _or().sql_zonemap_audit(tx_glob),
        "tx_prefix_cache": _tx().sql_prefix_cache_rate(tx_view),
        "tx_schema_drift": _tx().sql_json_schema_drift(tx_view),
        "bigram_coherence_documents": _ta().sql_bigram_coherence(),
        "embedding_norm_audit": _ts().sql_embedding_norm_audit(),
        "tx_token_midpoint": _tx().sql_token_midpoint_histogram(tx_view),
        "quality_vs_dup_documents": _ta().sql_quality_vs_dup(),
        "corpus_token_yield": _td().sql_corpus_token_yield(),
        "session_depth_histogram": """
            WITH base AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(date_trunc('second', ts))
                                    - epoch_us(date_trunc('second',
                                               lag(ts) OVER w))
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_id
                FROM base
            ), sess AS (
                SELECT user_id, session_id, COUNT(*) AS n_events
                FROM s GROUP BY 1, 2
            ), per AS (
                SELECT CAST(length(bin(n_events)) AS BIGINT)
                           AS depth_bucket,
                       CAST(COUNT(*) AS BIGINT) AS n_sessions,
                       CAST(SUM(n_events) AS BIGINT) AS n_events
                FROM sess GROUP BY 1
            ), tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM per)
            SELECT depth_bucket, n_sessions, n_events,
                   CAST(n_events * 1000 // t AS BIGINT)
                       AS event_share_permille
            FROM per CROSS JOIN tot
            ORDER BY depth_bucket
        """,
    }


def _aps():
    from log_collector_spark.operators import analytics_ps
    return analytics_ps


def _se():
    from log_collector_spark.operators import seasonal
    return seasonal


def _ted():
    from log_collector_spark.textops import editdist
    return editdist


def _bh():
    from log_collector_spark.operators import behavior
    return behavior


def _an():
    from log_collector_spark.operators import analytics
    return analytics


def _or():
    from log_collector_spark.operators import order
    return order


def _en():
    from log_collector_spark.operators import enrich
    return enrich


def _iv():
    from log_collector_spark.operators import interval
    return interval


def _od():
    from log_collector_spark.operators import order
    return order


def _ta():
    from log_collector_spark.textops import analysis
    return analysis


def _td():
    from log_collector_spark.textops import dedup
    return dedup


def _tc():
    from log_collector_spark.textops import common
    return common


def _ts():
    from log_collector_spark.textops import similarity
    return similarity


def _tm():
    from log_collector_spark.textops import multimodal
    return multimodal


def _tk():
    from log_collector_spark.textops import chunking
    return chunking


def _te():
    from log_collector_spark.textops import evalops
    return evalops


def _tcn():
    from log_collector_spark.textops import containment
    return containment


def _rs():
    from log_collector_spark.operators import reshape
    return reshape


def _tx():
    from log_collector_spark.operators import tx_stats
    return tx_stats


def _cstate():
    from log_collector_spark.streaming import conversation_state
    return conversation_state


def _lm():
    from log_collector_spark.textops import lm_proxy
    return lm_proxy


def _cp():
    from log_collector_spark.operators import changepoint
    return changepoint


def _tix():
    from log_collector_spark.textops import indexing
    return indexing


def _mi():
    from log_collector_spark.textops import mining
    return mining


def _sql_asof_nearest_events() -> str:
    from log_collector_spark.operators import asof_nearest as AN
    q = AN.sql_asof_nearest(
        "SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type "
        "FROM events",
        f"SELECT user_id, epoch_us(ts) AS m_us, event_type AS marker_type "
        f"FROM events WHERE event_id % {ASOF_MARKER_MOD} = 0",
        on="user_id", left_ord="t_us", right_ord="m_us",
        value_cols=["marker_type"], tolerance=ASOF_NEAREST_TOL_US)
    return (f"SELECT event_id, user_id, event_type, marker_type, asof_dist "
            f"FROM ({q}) ORDER BY event_id")


def _ag():
    from log_collector_spark.operators import aggregate
    return aggregate
