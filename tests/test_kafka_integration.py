"""Opt-in Kafka broker integration (K1/K2/S2/S4 wire path).

The engine's Kafka wire expressions (JSON encode/decode, key/topic
routing) are oracle- and round-trip-tested without a broker in
``test_sources.py``/``test_streaming.py``.  This module exercises the
actual broker path — batch produce then batch consume through Spark's
kafka source — and is SKIPPED unless a broker is reachable:

    KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py

Requires the ``spark-sql-kafka`` package on the session classpath (add
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``
when launching against a real cluster; not bundled in this container).
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="set KAFKA_BOOTSTRAP=host:port to run broker integration"
)


def test_candle_roundtrip_through_broker(spark):
    from pyspark.sql import functions as F

    from big_data_engineering_financial_analysis_spark.sources import kafka as k

    topic = f"it_{uuid.uuid4().hex[:8]}"
    candles = spark.createDataFrame(
        [("BTCIRT", datetime(2024, 1, 1, 0, 0), 1.0, 2.0, 0.5, 1.5, 10.0)],
        "stock_symbol string, local_time timestamp, open double, high double, "
        "low double, close double, volume double",
    )
    wire = k.candle_to_json(candles)
    (
        wire.select("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    parsed = k.parse_candle_json(raw.select(F.col("value").cast("string")))
    rows = parsed.collect()
    assert len(rows) == 1
    assert rows[0].stock_symbol == "BTCIRT" and rows[0].close == 1.5
