"""Timezone / epoch helpers (SURVEY §2.9 F2-F4).

The reference works in naive Asia/Tehran local time end-to-end: the poller
converts exchange epoch-seconds to Tehran wall-clock strings
(services/data-ingestion/app/ingest.py:34-38), Django strips tzinfo after
computing ``now(Tehran) - period`` (aggregator/views.py:136-149), and the
ILP writer re-derives epoch nanos from the naive string
(kafka-to-questdb/consumer.py:78).

The engine keeps the same discipline: timestamps are stored naive (session
timezone pinned UTC for storage/oracle comparability) and these helpers do
the explicit edge conversions.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

TEHRAN = "Asia/Tehran"
WIRE_FORMAT = "yyyy-MM-dd HH:mm:ss"


def epoch_to_local_string(epoch_s: Column, tz: str = TEHRAN) -> Column:
    """F2: unix seconds -> naive local wall-clock string.

    Mirrors ingest.py:34-38 (utcfromtimestamp -> astimezone(Tehran) ->
    strftime('%Y-%m-%d %H:%M:%S')).
    """
    return F.date_format(
        F.from_utc_timestamp(F.timestamp_seconds(epoch_s), tz), WIRE_FORMAT
    )


def local_string_to_epoch_ns(local_str: Column, tz: str = TEHRAN) -> Column:
    """F3: naive local wall-clock string -> epoch nanoseconds.

    Mirrors kafka-to-questdb/consumer.py:78 — except the reference treats
    the naive string as if it were UTC (int(pd.to_datetime(t).timestamp())),
    a latent bug we do NOT copy: the local time is converted back through
    its zone.
    """
    return F.unix_micros(
        F.to_utc_timestamp(F.to_timestamp(local_str, WIRE_FORMAT), tz)
    ) * 1000


def local_string_to_epoch_ns_compat(local_str: Column) -> Column:
    """F3, reference-compatible: naive string interpreted as UTC
    (reproduces the consumer.py:78 behavior behind an explicit name)."""
    return F.unix_micros(F.to_timestamp(local_str, WIRE_FORMAT)) * 1000


def trailing_window(now: datetime, period_minutes: int) -> tuple[datetime, datetime]:
    """F4: the serving API's ``[now - period, now]`` naive window
    (views.py:136-149).  Pure driver-side parameter computation."""
    return now - timedelta(minutes=period_minutes), now
