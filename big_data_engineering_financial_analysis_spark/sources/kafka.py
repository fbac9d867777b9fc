"""Kafka source/sink builders for the candle pipeline.

Mirrors the reference's wiring (all built-in Spark operators):

* multi-topic subscribe + fixed-schema JSON parse — reference
  services/stream-processing/app/consumer.py:246-256;
* keyed JSON producer with per-row topic routing
  (``{symbol.lower()}_topic``) — reference
  services/data-ingestion/app/ingest.py:16-21,99-105;
* enriched-row JSON sink — reference consumer.py:211-220.

The JSON encode/decode expressions are pure columns, so they are unit-
tested round-trip on batch DataFrames without a broker; the readStream/
writeStream builders need a live Kafka and are exercised only when
``kafka.bootstrap.servers`` is reachable (not in this container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_financial_analysis_spark.schemas import CANDLE_SCHEMA, ENRICHED_SCHEMA, SYMBOLS

TIME_FORMAT = "yyyy-MM-dd HH:mm:ss"


def topic_for_symbol(symbol: Column) -> Column:
    """Per-symbol topic routing: ``f"{symbol.lower()}_topic"`` (ingest.py:101)."""
    return F.concat(F.lower(symbol), F.lit("_topic"))


def candle_to_json(df: DataFrame) -> DataFrame:
    """Candle rows -> Kafka-producible (key, value, topic) columns.

    Timestamps serialize as ``%Y-%m-%d %H:%M:%S`` strings, the wire format
    the reference produces (ingest.py:34-38, json.dumps default=str).
    """
    payload = F.to_json(
        F.struct(
            F.col("stock_symbol"),
            F.date_format("local_time", TIME_FORMAT).alias("local_time"),
            F.col("open"),
            F.col("high"),
            F.col("low"),
            F.col("close"),
            F.col("volume"),
        )
    )
    return df.select(
        F.col("stock_symbol").cast("string").alias("key"),
        payload.alias("value"),
        topic_for_symbol(F.col("stock_symbol")).alias("topic"),
    )


def parse_candle_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka bytes -> typed candle rows (consumer.py:254-256 semantics).

    Wire schema carries local_time as a string; parsed with the declared
    7-column schema, then the timestamp is cast.  Malformed JSON -> NULL
    columns (from_json default), matching the reference.
    """
    # wire schema derives from CANDLE_SCHEMA (local_time widened to the
    # string wire format) so a schema change cannot silently drift
    wire = ", ".join(
        f"{f.name} {'string' if f.name == 'local_time' else f.dataType.simpleString()}"
        for f in CANDLE_SCHEMA.fields
    )
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), wire).alias("data")
    ).select("data.*")
    return parsed.withColumn("local_time", F.to_timestamp("local_time", TIME_FORMAT))


def enriched_to_json(df: DataFrame) -> DataFrame:
    """Enriched 17-column rows -> (key, value) for the output topic."""
    cols = [F.col("stock_symbol")] + [
        F.date_format("local_time", TIME_FORMAT).alias("local_time")
    ] + [F.col(f.name) for f in ENRICHED_SCHEMA.fields if f.name not in ("stock_symbol", "local_time")]
    return df.select(
        F.col("stock_symbol").cast("string").alias("key"),
        F.to_json(F.struct(*cols)).alias("value"),
    )


def read_candle_stream(
    spark: SparkSession,
    bootstrap: str,
    symbols: list[str] | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming scan of the per-symbol candle topics (S2+S3)."""
    topics = ",".join(f"{s.lower()}_topic" for s in (symbols or SYMBOLS))
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_candle_json(raw)


def write_kafka(df: DataFrame, bootstrap: str, topic: str | None, checkpoint: str):
    """Kafka sink builder (K1/K2).  If ``topic`` is None the frame must
    carry a ``topic`` column (per-row routing)."""
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        w = w.option("topic", topic)
    return w
