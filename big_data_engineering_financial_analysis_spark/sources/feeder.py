"""Candle feeder — the engine-side stand-in for the reference's REST poller.

The reference's ingress (S1) is an infinite loop GETting the exchange API
per symbol every 60 s and producing the last 1-minute candle to Kafka
(services/data-ingestion/app/ingest.py:60-121).  That is an outside-engine
concern; the engine's ingress contract is "candle rows arrive".  This
module provides a deterministic candle generator (per-symbol random walk
derived from md5, FIXTURES.md A1 shape) that can

* emit batch DataFrames (test fixtures),
* append parquet files into a directory consumed by a file-source stream —
  the broker-free way to drive the streaming pipeline end-to-end.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA, SYMBOLS


def _unit(s: str) -> float:
    """Deterministic uniform [0,1) from md5."""
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) / float(1 << 48)


def candle_rows(
    symbols: list[str] | None = None,
    start: datetime | None = None,
    minutes: int = 60,
    base_price: float = 100.0,
) -> list[tuple]:
    symbols = symbols or SYMBOLS
    start = start or datetime(2024, 1, 1)
    rows = []
    for sym in symbols:
        px = base_price * (1.0 + _unit(f"{sym}-base"))
        for i in range(minutes):
            t = start + timedelta(minutes=i)
            drift = (_unit(f"{sym}-{i}") - 0.5) * 0.02
            o = px
            px = px * (1.0 + drift)
            hi = max(o, px) * (1.0 + _unit(f"{sym}-{i}-h") * 0.005)
            lo = min(o, px) * (1.0 - _unit(f"{sym}-{i}-l") * 0.005)
            vol = float(int(_unit(f"{sym}-{i}-v") * 10_000))
            rows.append((sym, t, o, hi, lo, px, vol))
    return rows


def candles_df(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(candle_rows(**kwargs), CANDLE_SCHEMA)


def feed_parquet_batches(
    spark: SparkSession,
    out_dir: str,
    n_batches: int = 3,
    minutes_per_batch: int = 20,
    symbols: list[str] | None = None,
) -> DataFrame:
    """Write n sequential candle batches as separate parquet files.

    With ``maxFilesPerTrigger=1`` a file-source readStream replays them as
    distinct micro-batches; FileStreamSource orders by modification time
    (oldest first), so mtimes are bumped explicitly per batch to make the
    replay order deterministic.  Returns the full union for oracle
    comparison.
    """
    start = datetime(2024, 1, 1)
    all_rows = []
    seen: set[str] = set()
    for b in range(n_batches):
        rows = candle_rows(
            symbols=symbols,
            start=start + timedelta(minutes=b * minutes_per_batch),
            minutes=minutes_per_batch,
        )
        all_rows.extend(rows)
        df = spark.createDataFrame(rows, CANDLE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(out_dir)
        base = 1_700_000_000 + b * 60
        for name in os.listdir(out_dir):
            path = os.path.join(out_dir, name)
            if name.endswith(".parquet") and path not in seen:
                os.utime(path, (base, base))
                seen.add(path)
    return spark.createDataFrame(all_rows, CANDLE_SCHEMA)
