"""Time-interval join as a bucketized equi-join.

A naive events×windows range join (``t >= start AND t < end``) has no
equality predicate, so Catalyst plans BroadcastNestedLoopJoin — O(|W|·|E|)
and a non-starter when the window table itself is large (10^12 events ×
10^7 maintenance/incident windows). The scale-correct shape quantizes time
into fixed buckets of the maximum window length: each window explodes into
the <= 2 buckets it overlaps, each event computes its single bucket, and the
join becomes a shuffle hash/sort-merge EQUI-join on ``bucket`` followed by
the exact containment filter.

Losslessness: a window of length <= bucket_us overlaps at most 2 buckets and
every event inside it lands in one of them; an event's bucket is unique, so
each (window, event) pair can meet at most once — no post-join dedup.
Duplication factor of the window side is bounded by 2 (vs exploding windows
into per-unit rows). Event-time skew (a hot bucket) is an AQE skew-join
split; with longer windows raise ``bucket_us`` (duplication stays
ceil(len/bucket)+1).

Reference parity: the reference has no join engine at all (SURVEY §2.11);
this is a §2.12 engine extension. The DuckDB oracle runs the plain
inequality join (its IEJoin), proving the bucketization is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_US = 600_000_000  # 10 minutes — equals the demo window length


def interval_join(events: DataFrame, windows: DataFrame, *,
                  event_ts: str = "t_us", win_start: str = "start_us",
                  win_end: str = "end_us",
                  bucket_us: int = BUCKET_US) -> DataFrame:
    """Join each event to every window with start <= t < end (half-open).

    ``events`` carries an exact integer event-time column ``event_ts`` (epoch
    µs) plus payload columns; ``windows`` carries ``win_start``/``win_end``
    (epoch µs) plus payload. Windows of ANY length are joined losslessly:
    the explode below emits every bucket from bucket(start) to
    bucket(end-1), so a long window simply covers more buckets. ``bucket_us``
    is purely a fan-out/skew knob — it should stay >= the typical window
    length so most windows land in 1-2 buckets (a window of length L
    replicates into ceil(L/bucket_us)+1 rows at most).

    Returns the inner-join of the two payloads (all columns of both inputs).
    """
    def bucket_of(c):
        # subtract-mod then divide: the quotient is an exact integer, so the
        # double division is exact (no floor-at-boundary hazard)
        return ((c - c % bucket_us) / bucket_us).cast("long")

    ev = events.withColumn("_bucket", bucket_of(F.col(event_ts)))
    # covered buckets: bucket(start) .. bucket(end - 1)  (end exclusive)
    wn = windows.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket_of(F.col(win_start)),
                             bucket_of(F.col(win_end) - 1))))
    joined = ev.join(wn, "_bucket").filter(
        (F.col(event_ts) >= F.col(win_start)) &
        (F.col(event_ts) < F.col(win_end)))
    return joined.drop("_bucket")
