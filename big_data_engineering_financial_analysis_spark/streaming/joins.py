"""Stream-stream joins: watermark-bounded event-time interval joins.

The reference enriches one stream against static lookups; a complete
streaming engine also needs stream x stream correlation — the canonical
case is trades x quotes: attach to each trade the quotes observed in the
``tolerance`` window leading up to it.

Structured Streaming executes this as a symmetric hash join whose buffered
state is bounded by the watermark + the event-time range condition: a
buffered row is dropped as soon as no future input can match it.  That is
the 100 TB design point — state is O(key cardinality x watermark horizon x
arrival rate), never O(stream length).  Without the time-range condition
Spark would have to buffer both streams forever (and rejects outer joins
outright), so the condition is mandatory here, not an optimization.

Inner matches emit as soon as both sides arrive; outer null-extensions
emit only once the watermark passes the row's horizon (a row could still
match until then) — batch parity tests must flush the watermark forward
before asserting the null-extended rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "stock_symbol",
    left_time: str = "local_time",
    right_time: str = "quote_time",
    tolerance: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same key whose timestamp
    falls in ``(left_time - tolerance, left_time]``.

    Works identically on static frames (no watermark applied there), so
    batch == stream parity is directly testable.  ``how`` may be
    ``inner`` or ``leftOuter`` (outer requires the watermark, enforced by
    Spark itself).
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_time, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_time, watermark)
    cond: Column = (
        (l[key] == r[key])
        & (r[right_time] > l[left_time] - F.expr(f"INTERVAL {tolerance}"))
        & (r[right_time] <= l[left_time])
    )
    # drop the right key AFTER the join (the condition references it)
    return l.join(r, cond, how).drop(r[key])
