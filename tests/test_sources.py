"""Sources: REST poller frame (injected fetch), timezone helpers, JDBC
builder wiring, batch pipeline CLI."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from big_data_engineering_financial_analysis_spark.functions import timeutil
from big_data_engineering_financial_analysis_spark.sources import rest_poller


def fake_fetch(symbol, from_s, to_s):
    # two candles in the window; poller must keep the LAST (ingest.py:84-88)
    return [
        {"t": to_s - 120, "o": 1, "h": 2, "l": 0.5, "c": 1.5, "v": 10},
        {"t": to_s - 60, "o": 1.5, "h": 2.5, "l": 1.0, "c": 2.0, "v": 20},
    ]


def test_poll_once_keeps_last_candle():
    rows = rest_poller.poll_once(fake_fetch, symbols=["BTCIRT", "ETHIRT"], now_s=1_700_000_000)
    assert len(rows) == 2
    assert all(r["close"] == 2.0 and r["volume"] == 20.0 for r in rows)


def test_poll_forever_bounded_cycles():
    batches = []
    cycles = list(
        rest_poller.poll_forever(
            fake_fetch, batches.append, symbols=["BTCIRT"], interval_s=0, max_cycles=3
        )
    )
    assert cycles == [1, 2, 3]
    assert len(batches) == 3 and all(len(b) == 1 for b in batches)


def test_poll_skips_empty_responses():
    rows = rest_poller.poll_once(lambda s, a, b: [], symbols=["BTCIRT"], now_s=1)
    assert rows == []


def test_tehran_conversion_roundtrip(spark):
    from pyspark.sql import functions as F

    # 2024-01-01 00:00:00 UTC == 2024-01-01 03:30:00 Tehran (UTC+3:30, no DST)
    df = spark.range(1).select(F.lit(1704067200).alias("epoch_s"))
    out = df.select(
        timeutil.epoch_to_local_string(F.col("epoch_s")).alias("local_str")
    )
    row = out.collect()[0]
    assert row.local_str == "2024-01-01 03:30:00"
    # and back: local string -> epoch ns
    back = out.select(timeutil.local_string_to_epoch_ns(F.col("local_str")).alias("ns")).collect()[0]
    assert back.ns == 1704067200 * 1_000_000_000
    # the reference-compat variant treats the naive string as UTC (off by +3:30)
    compat = out.select(
        timeutil.local_string_to_epoch_ns_compat(F.col("local_str")).alias("ns")
    ).collect()[0]
    assert compat.ns - back.ns == int(3.5 * 3600) * 1_000_000_000


def test_trailing_window():
    start, end = timeutil.trailing_window(datetime(2024, 1, 1, 12, 0), 90)
    assert (end - start).total_seconds() == 90 * 60


def test_jdbc_builder_wiring(spark):
    from big_data_engineering_financial_analysis_spark.sources import jdbc

    df = spark.range(3).toDF("x")
    w = jdbc.jdbc_writer(df, jdbc.questdb_url(), "stock_data", num_partitions=2)
    # builder is configured but never .save()d (no DB in container)
    assert w is not None
    r = jdbc.jdbc_reader(
        spark, jdbc.questdb_url(), "stock_data",
        partition_column="x", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert r is not None


def test_pipeline_cli_batch(spark, tmp_path, capsys):
    from big_data_engineering_financial_analysis_spark.pipeline import run_batch

    # sf0.01: the panels' pinned symbol '42' exists there (sf0.001 only has
    # users 0-14, so panel results would be legitimately empty)
    counts = run_batch(spark, sf_dir="/root/testdata/sf0.01", out_dir=str(tmp_path))
    assert set(counts) == set(
        __import__("big_data_engineering_financial_analysis_spark.plans.dashboard", fromlist=["PANEL_SQL"]).PANEL_SQL
    )
    assert counts["panel_price_series"] > 0
    # enriched store written date-partitioned
    stored = spark.read.parquet(str(tmp_path / "stock_data"))
    assert "dt" in stored.columns and stored.count() > 0
